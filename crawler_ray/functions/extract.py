"""Structured content extraction — the byte-identical contract.

Reimplements the reference extractor's algorithms over the stdlib mini-DOM
(:mod:`crawler_ray.htmlmini`).  Every branch cites the span of
``/root/reference/core/content_extractor.py`` (or ``utils/text.py`` /
``core/structure_discovery.py``) whose behaviour it reproduces.  The
serial oracle and the Ray ``map_batches`` stage both call
:func:`extract_page`, which is what makes "byte-identical extracted text
per url" (BASELINE.json ``input_hint``) a checkable invariant.

The reference runs title/content/date/author extraction in a per-page
ThreadPool(4) (``core/content_extractor.py:182-199``); the results are
order-independent, so here they run sequentially inside one batch task and
Ray provides the parallelism across pages.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlparse

from crawler_ray.htmlmini import Element, parse_html
from crawler_ray.functions.text import normalize_persian_text

__all__ = [
    "clean_soup", "extract_main_content", "extract_title", "extract_date",
    "extract_author", "extract_list_items", "extract_related_links",
    "extract_links", "extract_page", "detect_page_type", "extract_entities",
    "RealNerExtractor", "FakeNerExtractor", "extract_with_selectors",
]

# -- pre-compiled patterns (compiled once at import; the map_batches stage
#    pays no per-batch compile cost) --------------------------------------

# ``core/content_extractor.py:344`` ad/side-content class substrings.
_AD_CLASSES = ["ads", "advertisement", "banner", "popup", "social",
               "sharing", "footer", "menu"]

# ``core/content_extractor.py:366,368`` detail-page candidate selectors.
_DETAIL_DIV_RE = re.compile(r"(content|article|post|body|text|main)")
_DETAIL_SECTION_RE = re.compile(r"(content|article)")

# ``core/content_extractor.py:429-430`` site-name suffix strippers.
_TITLE_PIPE_RE = re.compile(r"\s*[|]\s*.+$")
_TITLE_DASH_RE = re.compile(r"\s*[-]\s*.+$")

# ``core/content_extractor.py:441`` title class candidates.
_TITLE_CLASS_RES = [re.compile(c, re.I) for c in
                    ["title", "heading", "post-title", "article-title",
                     "main-title"]]

# ``core/content_extractor.py:474-480`` date meta tags, in priority order.
_DATE_META_TAGS = [
    ("meta", {"property": "article:published_time"}),
    ("meta", {"property": "article:modified_time"}),
    ("meta", {"name": "date"}),
    ("meta", {"name": "pubdate"}),
    ("meta", {"name": "publish_date"}),
]

# ``core/content_extractor.py:488`` date class candidates.
_DATE_CLASS_RES = [re.compile(c, re.I) for c in
                   ["date", "time", "published", "pubdate", "timestamp"]]

# ``core/content_extractor.py:496-500`` in-text date patterns.
_DATE_TEXT_RES = [re.compile(p) for p in [
    r"تاریخ(?:\s*انتشار)?[:]\s*(\d{4}/\d{1,2}/\d{1,2}|\d{1,2}/\d{1,2}/\d{4}|\d{1,2}\s+[آ-یa-zA-Z]+\s+\d{4})",
    r"(\d{4}/\d{1,2}/\d{1,2}|\d{1,2}/\d{1,2}/\d{4})",
    r"(\d{1,2}\s+[آ-یa-zA-Z]+\s+\d{4})",
]]

# ``core/content_extractor.py:526`` author class candidates.
_AUTHOR_CLASS_RES = [re.compile(c, re.I) for c in
                     ["author", "writer", "byline", "by"]]
# ``core/content_extractor.py:534`` author prefix stripper.
_AUTHOR_PREFIX_RE = re.compile(r"^(?:نویسنده|نگارنده|نوشته)[:]\s*", re.I)
# ``core/content_extractor.py:539-543`` in-text author patterns.
_AUTHOR_TEXT_RES = [re.compile(p) for p in [
    r"نویسنده[:]\s*([آ-یA-Za-z\s]+)",
    r"نگارنده[:]\s*([آ-یA-Za-z\s]+)",
    r"نوشته[:]\s*([آ-یA-Za-z\s]+)",
]]

# ``core/content_extractor.py:619-629`` list container / item selectors.
_LIST_CONTAINER_RE = re.compile(r"(list|items|posts|articles)")
_LIST_ITEM_RE = re.compile(r"(item|post|article)")
# ``core/content_extractor.py:655`` summary selector.
_SUMMARY_RE = re.compile(r"(summary|excerpt|desc)")
# ``core/content_extractor.py:681-683`` related-links containers.
_RELATED_RE = re.compile(r"(related|similar|suggested)")

# ``core/structure_discovery.py:225-228`` URL-based list-page patterns.
_LIST_URL_RES = [re.compile(p) for p in [
    r"/category/", r"/tag/", r"/archive/", r"/blog/", r"/articles/",
    r"/questions/", r"/list/", r"/search/", r"/page/\d+", r"/\?page=\d+",
]]
# ``core/structure_discovery.py:238-240`` repeated-item selectors.
_ITEM_CARD_RE = re.compile(r"(post|article|item|card)s?")
# ``core/structure_discovery.py:249-253`` detail indicators.
_DETAIL_IND_ARTICLE_RE = re.compile(r"(post|article|content)")
_DETAIL_IND_DETAIL_RE = re.compile(r"(post|article|content)-detail")
_DETAIL_IND_SINGLE_RE = re.compile(r"single")
_CONTENT_TEXT_RE = re.compile(r"(content|text|body)")

_SKIP_HREF_PREFIXES = ("javascript:", "mailto:", "tel:", "#")


_CLEAN_TAGS = frozenset(["script", "style", "iframe", "noscript",
                         "header", "footer", "nav", "aside"])


def clean_soup(root: Element) -> None:
    """Boilerplate removal — parity with ``core/content_extractor.py:328-347``.

    Removes script/style/iframe/noscript, header/footer/nav/aside, and any
    tag whose class contains one of the ad-class substrings
    (case-insensitive).  The reference runs ~10 sequential find_all+
    decompose passes; one pre-order walk that detaches a matching subtree
    and skips descending into it produces the IDENTICAL final tree (the
    kept set is the complement of the union of matched subtrees, and no
    later pass can resurrect a detached node), at one traversal instead
    of ten.  The per-class lambda of the reference (`c in x.lower()` over
    class tokens and the joined string) reduces to a substring test on
    the full class attribute, since any matching token substring is also
    a substring of the joined string."""
    stack = list(reversed(root.children))
    while stack:
        node = stack.pop()
        if not isinstance(node, Element):
            continue
        if node.tag in _CLEAN_TAGS:
            node.decompose()
            continue
        cls = node.attrs.get("class")
        if cls:
            low = cls.lower()
            if any(c in low for c in _AD_CLASSES):
                node.decompose()
                continue
        stack.extend(reversed(node.children))


def extract_main_content(root: Element, job_type: str | None = None) -> str:
    """Scored main-content selection (``core/content_extractor.py:349-412``).

    Detail fast path, then score every article/div/section:
    ``len(text) + 50*p_count (if >2 <p>) + 100 (has h1-h3)
    - 200 (link-text ratio > 0.5)``; ties break on the text string
    descending because the reference sorts ``(score, text)`` tuples with
    ``reverse=True`` (``:406-409``).
    """
    if job_type == "detail":
        candidates = [
            root.find("article"),
            root.find("div", class_=_DETAIL_DIV_RE),
            root.find("main"),
            root.find("section", class_=_DETAIL_SECTION_RE),
        ]
        for candidate in candidates:
            if candidate is not None and len(candidate.get_text(strip=True)) > 200:
                return candidate.get_text(separator=" ", strip=True)

    # One O(n) post-order pass replaces the reference's per-candidate
    # subtree re-walks (get_text + three find_alls per article/div/
    # section — O(n*depth) on nested divs).  Every scoring input is
    # additive bottom-up:
    #   len(get_text(" ", strip=True)) = S + max(K-1, 0) where S sums
    #     stripped text-part lengths and K counts nonempty parts;
    #   p-count / h1-h3 presence sum/or over children (+ self tag);
    #   a_text = sum over descendant <a> of len(a.get_text(strip=True))
    #     — each <a> contributes its own S, nested <a> double-count
    #     exactly as the reference's find_all("a") loop does.
    # Candidates are article/div/section, so their own tag never
    # contributes, and include-self subtree stats equal the
    # descendants-only queries the reference runs.  Only the winning
    # text materializes; ties on score still compare the text strings
    # descending, matching the (score, text) reverse sort.
    stats = _subtree_content_stats(root)
    candidates = root.find_all(["article", "div", "section"])
    if candidates:
        scored: list[tuple[int, Element]] = []
        for candidate in candidates:
            s_chars, k_parts, n_p, has_h, a_chars = stats[id(candidate)]
            tlen = s_chars + (k_parts - 1 if k_parts > 0 else 0)
            score = tlen
            if n_p > 2:
                score += n_p * 50
            if has_h:
                score += 100
            if a_chars / max(1, tlen) > 0.5:
                score -= 200
            scored.append((score, candidate))
        best = max(s for s, _ in scored)
        return max(c.get_text(separator=" ", strip=True)
                   for s, c in scored if s == best)
    return root.get_text(separator=" ", strip=True)


def _subtree_content_stats(root: Element) -> dict[int, tuple]:
    """id(element) -> (stripped char sum, nonempty part count, p count,
    has h1-h3, a-subtree char sum), include-self, for every element —
    the additive scoring inputs of ``extract_main_content``."""
    stats: dict[int, tuple] = {}
    stack: list[tuple[Element, bool]] = [(root, False)]
    while stack:
        node, done = stack.pop()
        if not done:
            stack.append((node, True))
            for c in node.children:
                if isinstance(c, Element):
                    stack.append((c, False))
            continue
        s_chars = k_parts = n_p = a_chars = 0
        has_h = False
        for c in node.children:
            if isinstance(c, Element):
                cs, ck, cp, ch, ca = stats[id(c)]
                s_chars += cs
                k_parts += ck
                n_p += cp
                has_h = has_h or ch
                a_chars += ca
            else:
                ln = len(c.text.strip())
                if ln:
                    s_chars += ln
                    k_parts += 1
        tag = node.tag
        if tag == "p":
            n_p += 1
        elif tag in ("h1", "h2", "h3"):
            has_h = True
        elif tag == "a":
            a_chars += s_chars
        stats[id(node)] = (s_chars, k_parts, n_p, has_h, a_chars)
    return stats


def extract_title(root: Element) -> str:
    """Title strategies 1-4 (``core/content_extractor.py:414-452``)."""
    title_el = root.find("title")
    if title_el is not None and title_el.string:
        title = title_el.string.strip()
        title = _TITLE_PIPE_RE.sub("", title)
        title = _TITLE_DASH_RE.sub("", title)
        return title
    for h1 in root.find_all("h1"):
        text = h1.get_text(strip=True)
        if text:
            return text
    for cls_re in _TITLE_CLASS_RES:
        el = root.find(class_=cls_re)
        if el is not None and el.get_text(strip=True):
            return el.get_text(strip=True)
    h2 = root.find("h2")
    if h2 is not None and h2.get_text(strip=True):
        return h2.get_text(strip=True)
    return ""


def extract_date(root: Element) -> str:
    """Date strategies 1-4 (``core/content_extractor.py:454-507``)."""
    for tag in root.find_all("time"):
        if tag.has_attr("datetime"):
            return tag["datetime"].strip()
        txt = tag.get_text(strip=True)
        if txt:
            return txt
    for tag_name, attrs in _DATE_META_TAGS:
        tag = root.find(tag_name, attrs=attrs)
        if tag is not None and tag.get("content"):
            return tag["content"].strip()
    for cls_re in _DATE_CLASS_RES:
        el = root.find(class_=cls_re)
        if el is not None:
            txt = el.get_text(strip=True)
            if txt:
                return txt
    html_text = root.get_text()
    for pattern in _DATE_TEXT_RES:
        match = pattern.search(html_text)
        if match:
            return match.group(1).strip()
    return ""


def extract_author(root: Element) -> str:
    """Author strategies 1-3 (``core/content_extractor.py:509-553``)."""
    meta = root.find("meta", attrs={"name": "author"})
    if meta is not None and meta.get("content"):
        return meta["content"].strip()
    for cls_re in _AUTHOR_CLASS_RES:
        el = root.find(class_=cls_re)
        if el is not None:
            txt = el.get_text(strip=True)
            if txt:
                return _AUTHOR_PREFIX_RE.sub("", txt)
    html_text = root.get_text()
    for pattern in _AUTHOR_TEXT_RES:
        match = pattern.search(html_text)
        if match:
            author = match.group(1).strip()
            if 2 < len(author) < 50:
                return author
    return ""


def extract_list_items(root: Element) -> list[dict]:
    """List-page items (``core/content_extractor.py:604-663``)."""
    containers = [
        root.find("ul", class_=_LIST_CONTAINER_RE),
        root.find("div", class_=_LIST_CONTAINER_RE),
        root.find("section", class_=_LIST_CONTAINER_RE),
    ]
    container = next((c for c in containers if c is not None), None)
    if container is None:
        item_elements = root.find_all(["article", "div", "li"],
                                      class_=_LIST_ITEM_RE)
    else:
        item_elements = container.find_all(["article", "div", "li"])

    items = []
    for item in item_elements:
        item_data: dict = {}
        title_elem = item.find(["h2", "h3", "h4", "a"])
        if title_elem is not None:
            item_data["title"] = title_elem.get_text(strip=True)
            link = None
            if title_elem.tag == "a" and title_elem.has_attr("href"):
                link = title_elem["href"]
            else:
                a_tag = title_elem.find("a")
                if a_tag is not None and a_tag.has_attr("href"):
                    link = a_tag["href"]
            item_data["link"] = link
        summary = item.find(["p", "div"], class_=_SUMMARY_RE)
        if summary is not None:
            item_data["summary"] = summary.get_text(strip=True)
        if item_data.get("title") or item_data.get("link"):
            items.append(item_data)
    return items


def extract_related_links(root: Element, current_url: str) -> list[dict]:
    """Detail-page related links (``core/content_extractor.py:665-751``)."""
    containers = [
        root.find("div", class_=_RELATED_RE),
        root.find("section", class_=_RELATED_RE),
        root.find("ul", class_=_RELATED_RE),
    ]
    container = next((c for c in containers if c is not None), None)

    related: list[dict] = []
    if container is not None:
        for a_tag in container.find_all("a", href=True):
            href = a_tag["href"]
            if href.startswith(_SKIP_HREF_PREFIXES):
                continue
            if not href.startswith(("http://", "https://")):
                parsed = urlparse(current_url)
                href = urljoin(f"{parsed.scheme}://{parsed.netloc}", href)
            related.append({"title": a_tag.get_text(strip=True), "url": href})

    if not related:
        body = root.find("body")
        if body is not None:
            all_elements = body.find_all()
            for element in all_elements[len(all_elements) // 2:]:
                if element.tag == "a" and element.has_attr("href"):
                    href = element["href"]
                    if href.startswith(_SKIP_HREF_PREFIXES):
                        continue
                    if not href.startswith(("http://", "https://")):
                        parsed = urlparse(current_url)
                        href = urljoin(f"{parsed.scheme}://{parsed.netloc}",
                                       href)
                    if element.get_text(strip=True):
                        related.append({"title": element.get_text(strip=True),
                                        "url": href})

    unique: list[dict] = []
    seen: set[str] = set()
    for link in related:
        if link["url"] not in seen:
            seen.add(link["url"])
            unique.append(link)
            if len(unique) >= 10:
                break
    return unique


def extract_links(html: str | bytes | Element, base_url: str | None = None,
                  internal_only: bool = False) -> list[str]:
    """All ``<a href>`` links in document order (``utils/text.py:411-458``).

    Skips javascript:/mailto:/tel:/# links, resolves relative hrefs against
    ``base_url`` and optionally drops external hosts.  NB: the reference
    calls this on the *raw* HTML (``core/crawler.py:856``), before any
    boilerplate removal — nav/footer links are frontier candidates.
    """
    root = html if isinstance(html, Element) else parse_html(html)
    base_domain = urlparse(base_url).netloc if base_url else None
    links = []
    for a in root.find_all("a", href=True):
        href = a["href"]
        if href.startswith(_SKIP_HREF_PREFIXES):
            continue
        if base_url and not href.startswith(("http://", "https://")):
            href = urljoin(base_url, href)
        if internal_only and base_url:
            href_domain = urlparse(href).netloc
            if href_domain and href_domain != base_domain:
                continue
        links.append(href)
    return links


def detect_page_type(url: str, root: Element | None) -> str:
    """'list' / 'detail' / 'generic' (``core/structure_discovery.py:213-267``)."""
    for pattern in _LIST_URL_RES:
        if pattern.search(url):
            return "list"
    if root is None:
        return "generic"
    for candidates in (root.find_all("div", class_=_ITEM_CARD_RE),
                       root.find_all("li", class_=_ITEM_CARD_RE),
                       root.find_all("article")):
        if len(candidates) >= 3:
            return "list"
    detail_indicators = [
        root.find("article", class_=_DETAIL_IND_ARTICLE_RE),
        root.find("div", class_=_DETAIL_IND_DETAIL_RE),
        root.find("div", id=_DETAIL_IND_DETAIL_RE),
        root.find("div", class_=_DETAIL_IND_SINGLE_RE),
        root.find("section", class_=_DETAIL_IND_ARTICLE_RE),
    ]
    if any(ind is not None for ind in detail_indicators):
        return "detail"
    h1_tags = root.find_all("h1")
    if h1_tags and len(h1_tags) == 1:
        content_tags = root.find_all(["p", "div"], class_=_CONTENT_TEXT_RE)
        if content_tags and any(len(t.get_text()) > 500 for t in content_tags):
            return "detail"
    return "generic"


# Deterministic stand-in for the spaCy NER stage: the reference loads
# ``fa_core_news_sm`` once per process and returns {} when the model is
# unavailable (``core/content_extractor.py:117-140,202``).  spaCy is not in
# this container, so the default path (entities={}) IS reference parity;
# this regex extractor exists to exercise the actor-pool plumbing with a
# deterministic fake and is clearly marked as such.
_FAKE_ENT_RE = re.compile(r"\b([A-Z][a-z]{2,})\b")


def extract_entities(text: str, enabled: bool = False) -> dict[str, list[str]]:
    """NER contract (``core/content_extractor.py:555-602``): input truncated
    to 10k chars, normalized, entities deduped and sorted per label.
    ``enabled=False`` (the parity default, no model) returns {}."""
    if not enabled or not text:
        return {}
    if len(text) > 10000:
        text = text[:10000]
    normalized = normalize_persian_text(text)
    ents = sorted(set(_FAKE_ENT_RE.findall(normalized)))
    return {"FAKE_PROPN": ents} if ents else {}


class RealNerExtractor:
    """The integration point for a real NER model — same contract as
    ``ops/multimodal.RealImageDecode``.  The reference loads spaCy's
    ``fa_core_news_sm`` once per process and batch-applies it
    (``core/content_extractor.py:117-140,555-602``); spaCy is not in
    this container, so instantiating this raises — by design.  To plug a
    model: load it ONCE in ``__init__`` (actor-pool pattern F5), apply
    per batch in ``__call__`` over the ``content`` column following the
    ``FakeNerExtractor`` shape below (truncate to 10k chars, normalize,
    dedupe + sort entities per label, emit ``entities_json``), then pass
    the class to ``map_batches(RealNerExtractor, concurrency=N)`` as a
    post-extract stage."""

    def __init__(self, model_name: str = "fa_core_news_sm"):
        raise NotImplementedError(
            "no NER model libraries are available in this environment; "
            "plug a real model here (load it ONCE in __init__, tag per "
            "batch in __call__) and swap it for FakeNerExtractor — see "
            "the class docstring for the exact contract")


class FakeNerExtractor:
    """Deterministic NER actor stand-in: the regex 'model' is bound once
    per actor in ``__init__``; ``__call__`` rewrites ``entities_json``
    for each batch exactly as the inline ``extract_entities`` path does,
    so swapping a real model in changes ONLY the tagger."""

    def __init__(self):
        self._model = _FAKE_ENT_RE  # "model" loaded once per actor

    def __call__(self, t):
        import json

        import pyarrow as pa
        out = []
        for text in t["content"].to_pylist():
            ents = extract_entities(text or "", enabled=True)
            out.append(json.dumps(ents, ensure_ascii=False,
                                  sort_keys=True))
        return t.set_column(t.column_names.index("entities_json"),
                            "entities_json", pa.array(out, pa.string()))


def extract_page(html: str | bytes | None, url: str,
                 job_type: str | None = None,
                 ner_enabled: bool = False,
                 root: Element | None = None) -> dict:
    """Full structured extraction (``core/content_extractor.py:142-239``).

    Returns the reference's extracted-record shape: url/title/content/date/
    author/entities (+ ``list_items`` for list pages, ``related_links`` for
    detail pages; empty-field error shape for empty HTML).

    ``root``: optionally a pre-parsed tree for this html (parse-once
    optimization — callers that also run ``extract_links`` share one
    parse).  The tree is MUTATED (boilerplate decompose), so run raw-tree
    consumers first.
    """
    if not html:
        return {"url": url, "title": "", "content": "", "date": "",
                "author": "", "entities": {}, "job_type": job_type,
                "list_items": [], "related_links": [],
                "error": "empty html"}
    if root is None:
        root = parse_html(html)
    clean_soup(root)
    title = extract_title(root)
    content = extract_main_content(root, job_type)
    date = extract_date(root)
    author = extract_author(root)
    entities = extract_entities(content, enabled=ner_enabled)
    record = {
        "url": url, "title": title, "content": content, "date": date,
        "author": author, "entities": entities, "job_type": job_type,
        "list_items": [], "related_links": [], "error": "",
    }
    if job_type == "list":
        record["list_items"] = extract_list_items(root)
    elif job_type == "detail":
        record["related_links"] = extract_related_links(root, url)
    return record


def extract_with_selectors(html: str | bytes | None, url: str,
                           job_type: str | None,
                           selectors: dict[str, str | None] | None,
                           root: Element | None = None) -> dict:
    """Selector-driven extraction (M14) — the reference's legacy path
    used when the heuristic extractor is unavailable
    (``core/crawler.py:1158-1276`` ``_extract_page_data``): generic
    title/date/author always, then the discovered selector map drives the
    page-type-specific fields.  Consumes the ``tag.class`` selector maps
    ``ops/discovery.py`` produces (M22) / ``match_selectors`` joins (J5).

    - list pages: container/item selectors -> per-item title / absolute
      link / summary, items_count, pagination flag + links
      (``:1185-1240``).
    - detail pages: content selector -> text + ``content_html``
      re-serialization; date/author selector fallbacks fire only when the
      generic extractors found nothing (``:1243-1272``).
    - anything else (or no selectors): generic main-content extraction
      (``:1273-1275``).
    """
    if not html:
        return {"url": url, "type": job_type, "title": "", "date": "",
                "author": "", "content": "", "error": "empty html"}
    if root is None:
        root = parse_html(html)
    sel = selectors or {}
    data: dict = {
        "url": url, "type": job_type,
        "title": extract_title(root),
        "date": extract_date(root),
        "author": extract_author(root),
    }

    if job_type == "list":
        items: list[dict] = []
        if sel.get("container") and sel.get("item"):
            container = root.select_one(sel["container"])
            if container is not None:
                for item_el in container.select(sel["item"]):
                    item: dict = {}
                    if sel.get("title"):
                        t = item_el.select_one(sel["title"])
                        if t is not None:
                            item["title"] = t.get_text().strip()
                    if sel.get("link"):
                        a = item_el.select_one(sel["link"])
                        if a is not None and "href" in a.attrs:
                            item["link"] = urljoin(url, a.attrs["href"])
                    if sel.get("summary"):
                        s = item_el.select_one(sel["summary"])
                        if s is not None:
                            item["summary"] = s.get_text().strip()
                    items.append(item)
        data["items"] = items
        data["items_count"] = len(items)
        pagination = (root.select_one(sel["pagination"])
                      if sel.get("pagination") else None)
        if pagination is not None:
            data["has_pagination"] = True
            links = []
            if sel.get("pagination_links"):
                for a in pagination.select(sel["pagination_links"]):
                    if "href" in a.attrs:
                        links.append(urljoin(url, a.attrs["href"]))
            data["pagination_links"] = links
        else:
            data["has_pagination"] = False
    elif job_type == "detail":
        content_el = (root.select_one(sel["content"])
                      if sel.get("content") else None)
        if content_el is not None:
            data["content"] = content_el.get_text().strip()
            data["content_html"] = content_el.to_html()
        else:
            data["content"] = extract_main_content(root, job_type)
        if sel.get("date") and not data.get("date"):
            d = root.select_one(sel["date"])
            if d is not None:
                data["date"] = d.get_text().strip()
        if sel.get("author") and not data.get("author"):
            a = root.select_one(sel["author"])
            if a is not None:
                data["author"] = a.get_text().strip()
    else:
        data["content"] = extract_main_content(root, job_type)
    return data
