"""Extraction contract tests: hand-built HTML with hand-derived expected
outputs for every strategy branch of the reference extractor
(core/content_extractor.py:328-553 semantics), plus link extraction and
page-type detection."""

from crawler_ray.functions.extract import (
    extract_page, extract_links, detect_page_type, extract_title,
    extract_date, extract_author, extract_main_content, clean_soup,
)
from crawler_ray.htmlmini import parse_html


def test_title_pipe_strip():
    root = parse_html("<html><head><title>Real Title | My Site</title>"
                      "</head><body></body></html>")
    assert extract_title(root) == "Real Title"


def test_title_dash_strip_then_h1_fallback():
    root = parse_html("<title>A - B - C</title>")
    assert extract_title(root) == "A"
    root = parse_html("<body><h1></h1><h1>Second H1</h1></body>")
    assert extract_title(root) == "Second H1"


def test_title_class_fallback():
    root = parse_html('<body><div class="post-title">From Class</div></body>')
    assert extract_title(root) == "From Class"


def test_date_time_tag_priority():
    html = ('<body><time datetime="2020-01-02">Jan 2</time>'
            '<meta name="date" content="1999-09-09"></body>')
    assert extract_date(parse_html(html)) == "2020-01-02"


def test_date_meta_order():
    html = ('<head><meta name="pubdate" content="B">'
            '<meta property="article:published_time" content="A"></head>')
    assert extract_date(parse_html(html)) == "A"


def test_date_text_pattern():
    root = parse_html("<body><p>تاریخ انتشار: 2021/3/4</p></body>")
    assert extract_date(root) == "2021/3/4"


def test_author_meta_then_class():
    root = parse_html('<head><meta name="author" content="Jane Q"></head>')
    assert extract_author(root) == "Jane Q"
    root = parse_html('<body><span class="byline">نویسنده: علی رضایی</span>'
                      "</body>")
    assert extract_author(root) == "علی رضایی"


def test_main_content_scoring_prefers_paragraph_rich():
    html = """
    <body>
      <div class="a"><p>one</p><p>two</p><p>three</p><p>four</p>
        <h2>head</h2>words words words words words</div>
      <div class="b">short link farm
        <a href="/1">lots of linked text here</a>
        <a href="/2">more linked text content</a></div>
    </body>"""
    root = parse_html(html)
    content = extract_main_content(root)
    assert "one two three four" in content.replace("  ", " ")


def test_detail_fast_path():
    long_text = "z " * 150  # > 200 chars
    html = f"<body><article>{long_text}</article><div>tiny</div></body>"
    content = extract_main_content(parse_html(html), job_type="detail")
    assert content == ("z " * 150).strip()


def test_clean_soup_removes_boilerplate_and_ads():
    html = ("<body><header>H</header><nav>N</nav><aside>S</aside>"
            '<script>x</script><div class="banner-ads">AD</div>'
            "<div><p>keep me here please</p></div><footer>F</footer></body>")
    root = parse_html(html)
    clean_soup(root)
    text = root.get_text(separator=" ", strip=True)
    assert text == "keep me here please"


def test_extract_page_empty_html():
    rec = extract_page(None, "https://x/")
    assert rec["error"] and rec["content"] == ""


def test_extract_page_list_items():
    html = ("<body><div class='posts-list'>"
            "<div><h3><a href='/post/1-a'>P1</a></h3>"
            "<p class='summary'>s1</p></div>"
            "<div><h3><a href='/post/2-b'>P2</a></h3></div>"
            "</div></body>")
    rec = extract_page(html, "https://h/category/c/", job_type="list")
    links = [i["link"] for i in rec["list_items"]]
    assert "/post/1-a" in links and "/post/2-b" in links


def test_extract_page_related_links_cap10_dedup():
    links = "".join(f'<a href="/r/{i % 4}">t{i}</a>' for i in range(12))
    html = f'<body><div class="related-box">{links}</div></body>'
    rec = extract_page(html, "https://h/post/1-x", job_type="detail")
    urls = [r["url"] for r in rec["related_links"]]
    assert len(urls) == len(set(urls)) == 4
    assert urls[0] == "https://h/r/0"


def test_extract_links_distractors_and_relative():
    html = ('<a href="javascript:void(0)">j</a><a href="#x">f</a>'
            '<a href="mailto:a@b">m</a><a href="tel:1">t</a>'
            '<a href="/rel">r</a><a href="https://ext.example/e">e</a>')
    links = extract_links(html, "https://h.example/base/")
    assert links == ["https://h.example/rel", "https://ext.example/e"]
    internal = extract_links(html, "https://h.example/base/",
                             internal_only=True)
    assert internal == ["https://h.example/rel"]


def test_detect_page_type():
    assert detect_page_type("https://h/category/x/", None) == "list"
    assert detect_page_type("https://h/blog/page/3", None) == "list"
    items = "".join(f'<div class="post-item">i{k}</div>' for k in range(3))
    assert detect_page_type("https://h/x", parse_html(items)) == "list"
    detail = '<article class="post-content">x</article>'
    assert detect_page_type("https://h/x", parse_html(detail)) == "detail"
    assert detect_page_type("https://h/x", parse_html("<p>hi</p>")) == "generic"


def test_tie_break_on_text_descending():
    # two candidates with equal score: reference sorts (score, text) tuples
    # reverse=True, so the lexicographically larger text wins
    html = "<body><div>bbb</div><div>aaa</div></body>"
    assert extract_main_content(parse_html(html)) == "bbb"
    html = "<body><div>aaa</div><div>bbb</div></body>"
    assert extract_main_content(parse_html(html)) == "bbb"


def test_ner_actor_stage_plumbing(ray_session):
    """The pluggable NER stage: FakeNerExtractor rewrites entities_json
    per batch through map_batches (actor-pool shape); RealNerExtractor
    is the documented raising integration point."""
    import json

    import pyarrow as pa
    import pytest
    import ray.data as rd

    from crawler_ray.functions.extract import (FakeNerExtractor,
                                               RealNerExtractor)

    with pytest.raises(NotImplementedError):
        RealNerExtractor()

    t = pa.table({"content": ["Alice met Bob in Tehran", "", "no caps"],
                  "entities_json": ["{}", "{}", "{}"]})
    out = (rd.from_arrow(t)
           .map_batches(FakeNerExtractor, batch_format="pyarrow",
                        concurrency=1)
           .to_pandas())
    ents = [json.loads(e) for e in out["entities_json"]]
    assert ents[0] == {"FAKE_PROPN": ["Alice", "Bob", "Tehran"]}
    assert ents[1] == {} and ents[2] == {}


def test_main_content_matches_literal_reference_loop():
    """The O(n) aggregated scoring must equal a literal replay of the
    reference's per-candidate loop (get_text + three find_alls per
    article/div/section, (score, text) reverse sort) on random trees,
    including headings, heavy link ratios and deep nesting."""
    import random

    def literal(root):
        scored = []
        for candidate in root.find_all(["article", "div", "section"]):
            text = candidate.get_text(separator=" ", strip=True)
            score = len(text)
            p_tags = candidate.find_all("p")
            if p_tags and len(p_tags) > 2:
                score += len(p_tags) * 50
            if candidate.find_all(["h1", "h2", "h3"]):
                score += 100
            a_tags = candidate.find_all("a")
            if a_tags:
                a_text = sum(len(a.get_text(strip=True)) for a in a_tags)
                if a_text / max(1, len(text)) > 0.5:
                    score -= 200
            scored.append((score, text))
        if scored:
            scored.sort(reverse=True)
            return scored[0][1]
        return root.get_text(separator=" ", strip=True)

    rng = random.Random(77)
    tags = ["div", "p", "span", "a", "article", "section",
            "h1", "h2", "h3", "ul"]

    def gen(depth):
        n = rng.randint(1, 4 if depth < 3 else 1)
        out = []
        for _ in range(n):
            if depth >= 5 or rng.random() < 0.35:
                out.append(rng.choice(["text", " ", "", "x y  z",
                                       f"w{rng.randint(0, 9)}"]))
                continue
            tag = rng.choice(tags)
            attr = ' href="/x"' if tag == "a" and rng.random() < 0.5 else ""
            out.append(f"<{tag}{attr}>")
            out.extend(gen(depth + 1))
            out.append(f"</{tag}>")
        return out

    for trial in range(300):
        root = parse_html("".join(gen(0)))
        assert extract_main_content(root) == literal(root), trial
    # degenerate shapes
    for html in ("", "<div></div>", "<p>only p</p>",
                 "<div><a href='/x'>all link text here</a></div>",
                 "<article><h1>h</h1><p>a</p><p>b</p><p>c</p></article>",
                 "<div><div><div>nested</div></div></div>"):
        root = parse_html(html)
        assert extract_main_content(root) == literal(root), html
