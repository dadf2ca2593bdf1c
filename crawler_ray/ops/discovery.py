"""URL-structure discovery: feature vectors -> cosine DBSCAN clusters ->
glob patterns (SURVEY §2 M24, A7, A8, A9).

Mirrors the reference's offline discovery job
(``core/structure_discovery.py:856-944`` DBSCAN eps=0.3 min_samples=2 over
URL feature vectors; ``:910-944`` per-URL features;
``:978-1027`` position-wise common-pattern derivation; ``:1095-1139``
group-by-fixed-parts).  The reference runs sklearn's DBSCAN driver-side on
the collected (small) matrix; sklearn is not available here, so the same
algorithm is a ~30-line exact numpy DBSCAN — identical eps/min_samples
semantics, deterministic label order (clusters numbered by first member
index).

Scale shape: featurization is a vectorized ``map_batches`` over the URL
table; only the fixed-width feature matrix (n_urls x max_depth+1 doubles)
is collected to the driver — the reference does exactly this collect, and
discovery corpora are bounded (≤ tens of thousands of URLs) by design.
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlparse

import numpy as np
import pyarrow as pa

__all__ = ["url_features_batch", "dbscan_cosine", "derive_pattern",
           "discover_url_patterns", "url_pattern_table",
           "save_patterns", "load_patterns", "discover_selectors",
           "match_selectors"]

_MAX_SEGS = 6


def _rd():
    import ray.data as rd
    return rd


def _hash1e6(s: str) -> float:
    # stable stand-in for the reference's ``hash(part) % 1e6``
    # (``core/structure_discovery.py:926-939``; Python's hash() is
    # per-process salted, so use sha1 for determinism)
    return int.from_bytes(hashlib.sha1(s.encode()).digest()[:8],
                          "big") % 1_000_000


def url_features_batch(urls: list[str],
                       max_segs: int = _MAX_SEGS) -> np.ndarray:
    """Fixed-width per-URL feature vectors (M24): [hash(domain), then per
    path segment -1 (all digits) / -2 (hyphenated slug) / hash%1e6],
    zero-padded to ``max_segs`` segments."""
    out = np.zeros((len(urls), max_segs + 1), dtype=np.float64)
    for i, url in enumerate(urls):
        p = urlparse(url)
        out[i, 0] = _hash1e6(p.netloc)
        segs = [s for s in p.path.split("/") if s][:max_segs]
        for j, seg in enumerate(segs):
            if seg.isdigit():
                out[i, j + 1] = -1.0
            elif "-" in seg:
                out[i, j + 1] = -2.0
            else:
                out[i, j + 1] = _hash1e6(seg)
    return out


def dbscan_cosine(mat: np.ndarray, eps: float = 0.3,
                  min_samples: int = 2) -> np.ndarray:
    """Exact DBSCAN with cosine distance (1 - cos) — the reference's
    configuration (``core/structure_discovery.py:884-887``).  O(n^2)
    distance matrix; labels -1 for noise, clusters numbered in order of
    first core point encountered (deterministic)."""
    n = len(mat)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    unit = mat / np.maximum(norms, 1e-12)
    dist = 1.0 - unit @ unit.T
    neighbors = dist <= eps  # includes self
    n_neighbors = neighbors.sum(axis=1)
    core = n_neighbors >= min_samples
    labels = np.full(n, -1, dtype=np.int64)
    cluster = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        # BFS expand from core point i
        labels[i] = cluster
        frontier = [i]
        while frontier:
            j = frontier.pop()
            if not core[j]:
                continue
            for k in np.nonzero(neighbors[j])[0]:
                if labels[k] == -1:
                    labels[k] = cluster
                    if core[k]:
                        frontier.append(int(k))
        cluster += 1
    return labels


def derive_pattern(urls: list[str]) -> str:
    """Position-wise common glob pattern for one cluster (A8,
    ``core/structure_discovery.py:978-1027``): per path position, keep the
    literal if all members agree, else '*'; pattern length = max member
    depth."""
    split = [[s for s in urlparse(u).path.split("/") if s] for u in urls]
    depth = max((len(s) for s in split), default=0)
    parts = []
    for pos in range(depth):
        vals = {s[pos] if pos < len(s) else "" for s in split}
        parts.append(vals.pop() if len(vals) == 1 else "*")
    host = urlparse(urls[0]).netloc
    return f"{urlparse(urls[0]).scheme}://{host}/" + "/".join(parts)


def discover_url_patterns(urls: list[str], eps: float = 0.3,
                          min_samples: int = 2,
                          max_sample_urls: int = 5) -> list[dict]:
    """Full discovery over a URL list: featurize -> DBSCAN -> one pattern
    per cluster, plus a group-by-fixed-parts refinement key (A9).  Noise
    URLs get no pattern (the reference falls back to heuristics for them,
    ``core/structure_discovery.py:893-906``)."""
    if not urls:
        return []
    mat = url_features_batch(urls)
    labels = dbscan_cosine(mat, eps=eps, min_samples=min_samples)
    out = []
    for c in range(labels.max() + 1 if labels.size else 0):
        members = [urls[i] for i in np.nonzero(labels == c)[0]]
        pattern = derive_pattern(members)
        out.append({
            "cluster": int(c),
            "pattern": pattern,
            "url_count": len(members),
            "sample_urls": sorted(members)[:max_sample_urls],
            "is_list": "*" not in pattern.rsplit("/", 1)[-1],
            "n_wildcards": pattern.count("*"),
        })
    return out


def url_pattern_table(sf_dir: str):
    """queries() entry: synthesize the deterministic URL set from the
    documents table (same construction as ``ops/urls_jobs``), featurize
    distributed, cluster driver-side, return one row per discovered
    pattern (rows-only check; clustering is engine-internal but
    deterministic — pytest pins behavior on planted structures)."""
    from crawler_ray.ops.urls_jobs import synth_url_batch

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])

    def make_urls(t: pa.Table) -> pa.Table:
        urls = synth_url_batch(t["doc_id"].to_pylist())
        return pa.table({"url": pa.array(urls, pa.string())})

    urls = ds.map_batches(make_urls, batch_format="pyarrow").to_pandas()
    pats = discover_url_patterns(sorted(set(urls["url"])))
    return pa.table({
        "cluster": pa.array([p["cluster"] for p in pats], pa.int64()),
        "pattern": pa.array([p["pattern"] for p in pats], pa.string()),
        "url_count": pa.array([p["url_count"] for p in pats], pa.int64()),
        "n_wildcards": pa.array([p["n_wildcards"] for p in pats],
                                pa.int64()),
    })


# ---------------------------------------------------------------------------
# pattern persistence (S9/S10) — JSON artifact is the single source of truth
# ---------------------------------------------------------------------------

def save_patterns(patterns: list[dict], path: str) -> str:
    """Persist discovered URL patterns (S9,
    ``core/structure_discovery.py:1185-1241``; the reference's DB variant
    S10 stores the same JSON in a column — one artifact here)."""
    import json
    import os
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "w") as f:
        json.dump({"version": 1, "patterns": patterns}, f,
                  ensure_ascii=False, indent=2)
    os.replace(tmp, path)
    return path


def load_patterns(path: str) -> list[dict]:
    import json
    with open(path) as f:
        return json.load(f)["patterns"]


# -- S10: the DB variant — one row per domain in a keyed table -------------

_PATTERN_DB_SCHEMA = None


def pattern_store(root: str):
    """S10 pattern-DB persistence: the reference keeps one ``Domain``
    row per site whose ``keywords`` column carries the discovered
    structure as JSON, updated-or-created by domain id
    (``core/structure_discovery.py:1533-1575`` save,
    ``:1350-1414`` load).  Here the MySQL table is the keyed
    ``TableStore`` (hash-partitioned parquet, partition-local upserts)
    — same row shape, same update-or-create semantics, distributed
    mutation path."""
    global _PATTERN_DB_SCHEMA
    if _PATTERN_DB_SCHEMA is None:
        _PATTERN_DB_SCHEMA = pa.schema([
            ("domain_id", pa.int64()), ("name", pa.string()),
            ("keywords_json", pa.string()),
            ("auto_detected", pa.bool_())])
    from crawler_ray.state.tablestore import TableStore
    return TableStore.create(root, "domain_id", _PATTERN_DB_SCHEMA,
                             num_partitions=4)


def save_patterns_to_store(store, domain_id: int, name: str,
                           patterns: list[dict],
                           important_sections: list | None = None,
                           html_patterns: dict | None = None) -> dict:
    """Update-or-create the domain's pattern row (the reference's
    ``_save_patterns_to_db``); returns the upsert counts — ``updated``
    == 1 replays the reference's update branch, ``inserted`` == 1 its
    create branch."""
    import json

    import ray.data as rd
    blob = json.dumps({"patterns": patterns,
                       "important_sections": important_sections or [],
                       "html_patterns": html_patterns or {}},
                      ensure_ascii=False, sort_keys=True)
    row = pa.table({
        "domain_id": pa.array([domain_id], pa.int64()),
        "name": pa.array([name], pa.string()),
        "keywords_json": pa.array([blob], pa.string()),
        "auto_detected": pa.array([True], pa.bool_())})
    # one row: the hint routes it through the store's raw-task merge
    # instead of a full groupby execution
    return store.upsert(rd.from_arrow(row), rows_hint=1)


def load_patterns_from_store(store, domain_id: int) -> dict | None:
    """Point-get the domain's structure blob (the reference's
    ``_load_patterns_from_db``): ``None`` when the domain row is
    absent — callers fall back to the file artifacts, as the
    reference does."""
    import json
    t = store.get([domain_id])
    if t.num_rows == 0:
        return None
    return json.loads(t["keywords_json"][0].as_py())


# ---------------------------------------------------------------------------
# HTML selector discovery (M22) + URL -> selector similarity join (J5)
# ---------------------------------------------------------------------------

_LISTY_CLASS = ("list", "posts", "items", "archive", "results")
_SUMMARY_CLASS = ("summary", "excerpt", "desc")


def _class_selector(el) -> str:
    cls = el.classes
    return f"{el.tag}.{cls[0]}" if cls else el.tag


def discover_selectors(html, page_type: str) -> dict[str, str | None]:
    """Derive a CSS selector map from one example page (M22,
    ``core/structure_discovery.py:279-492`` semantics): list pages get
    {container, item, title, link, summary, pagination}; detail pages get
    {container, title, content, date, author}.  Selectors are
    ``tag.first-class`` strings (the reference keeps CSS selectors too;
    ``selectors_to_xpaths`` below is its naive XPath conversion M23)."""
    from crawler_ray.htmlmini import parse_html
    root = html if hasattr(html, "find_all") else parse_html(html)

    def sel(el):
        return _class_selector(el) if el is not None else None

    if page_type == "list":
        container = None
        for el in root.find_all("div"):
            if any(c for c in el.classes
                   if any(k in c.lower() for k in _LISTY_CLASS)):
                container = el
                break
        scope = container or root
        item = next(iter(scope.find_all("div")), None)
        first_item = item or scope
        title = (first_item.find("h3") or first_item.find("h2")
                 or first_item.find("a"))
        link = first_item.find("a", href=True)
        summary = None
        for el in first_item.find_all(["p", "div"]):
            if any(k in c.lower() for c in el.classes
                   for k in _SUMMARY_CLASS):
                summary = el
                break
        pagination = None
        for el in root.find_all("div"):
            if any("pagination" in c.lower() or "pager" in c.lower()
                   for c in el.classes):
                pagination = el
                break
        return {"container": sel(container), "item": sel(item),
                "title": sel(title), "link": sel(link),
                "summary": sel(summary), "pagination": sel(pagination)}

    # detail / generic
    container = (root.find("article") or root.find("main")
                 or root.find("div"))
    title = root.find("h1") or root.find("h2")
    content = root.find("article") or container
    date = None
    for el in root.find_all(["time", "span", "p"]):
        if el.tag == "time" or any(
                k in c.lower() for c in el.classes
                for k in ("date", "time", "pubdate", "published")):
            date = el
            break
    author = None
    for el in root.find_all(["span", "p", "div"]):
        if any(k in c.lower() for c in el.classes
               for k in ("author", "writer", "byline")):
            author = el
            break
    return {"container": sel(container), "title": sel(title),
            "content": sel(content), "date": sel(date),
            "author": sel(author)}


def _path_segments(url: str) -> list[str]:
    from urllib.parse import urlparse
    return [s for s in urlparse(url).path.split("/") if s]


def match_selectors(url: str, stored: dict[str, dict],
                    threshold: float = 0.7):
    """J5: similarity join of a URL against stored per-URL selector maps
    (``core/structure_discovery.py:1638-1709``): best path-segment overlap
    ratio > threshold wins; ties broken by stored-key order then
    lexicographic key.  Overlap = |position-wise equal or both-numeric
    segments| / max(len).  Small side broadcast — callers pass ``stored``
    as a plain dict into map fns."""
    segs = _path_segments(url)
    best = None
    best_score = threshold
    for key in sorted(stored):
        ksegs = _path_segments(key)
        if not segs and not ksegs:
            score = 1.0
        else:
            n = max(len(segs), len(ksegs))
            eq = sum(
                1 for a, b in zip(segs, ksegs)
                if a == b or (a.isdigit() and b.isdigit()))
            score = eq / n
        if score > best_score:
            best = key
            best_score = score
    return (best, stored.get(best)) if best is not None else (None, None)


def css_to_xpath(css_selector: str | None, strip_xpath: bool = False) -> str:
    """M23: naive ``tag.class`` CSS selector → XPath
    (``core/structure_discovery.py:616-642``): ``tag.cls`` becomes
    ``//tag[contains(@class, 'cls')]``, a bare ``tag`` becomes
    ``//tag``; ``strip_xpath`` drops the leading ``//`` (used when the
    caller nests the path under a parent).  Empty/None → ""."""
    if not css_selector:
        return ""
    parts = css_selector.split(".")
    tag = parts[0]
    xpath = (f"//{tag}[contains(@class, '{parts[1]}')]"
             if len(parts) > 1 else f"//{tag}")
    return xpath[2:] if strip_xpath else xpath


def selectors_to_xpaths(selectors: dict[str, str | None],
                        page_type: str) -> dict[str, str]:
    """M23: convert a discovered selector map (M22) to XPath paths
    (``core/structure_discovery.py:550-614``).  List pages nest
    item/title/link/summary under the container path and
    pagination_links under pagination; detail pages nest
    content/date/author under the container but keep title absolute —
    exactly the reference's branch structure.  ``None`` selector values
    are treated as absent keys (discover_selectors emits every key;
    the reference only stores found ones)."""
    sel = {k: v for k, v in selectors.items() if v}
    xpaths: dict[str, str] = {}
    if page_type == "list":
        if "container" in sel:
            xpaths["container"] = css_to_xpath(sel["container"])
            if "item" in sel:
                xpaths["item"] = (f"{xpaths['container']}//"
                                  f"{css_to_xpath(sel['item'], True)}")
                for k in ("title", "link", "summary"):
                    if k in sel:
                        xpaths[k] = (f"{xpaths['item']}//"
                                     f"{css_to_xpath(sel[k], True)}")
        if "pagination" in sel:
            xpaths["pagination"] = css_to_xpath(sel["pagination"])
            if "pagination_links" in sel:
                xpaths["pagination_links"] = (
                    f"{xpaths['pagination']}//"
                    f"{css_to_xpath(sel['pagination_links'], True)}")
    elif page_type == "detail":
        if "container" in sel:
            xpaths["container"] = css_to_xpath(sel["container"])
            if "title" in sel:
                xpaths["title"] = css_to_xpath(sel["title"])
            for k in ("content", "date", "author"):
                if k in sel:
                    xpaths[k] = (f"{xpaths['container']}//"
                                 f"{css_to_xpath(sel[k], True)}")
    return xpaths
