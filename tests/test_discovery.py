"""URL-structure discovery (M24/A7/A8): featurize -> numpy DBSCAN ->
pattern derivation, pinned on planted URL structures."""

from __future__ import annotations

import numpy as np

from crawler_ray.ops.discovery import (dbscan_cosine, derive_pattern,
                                       discover_url_patterns,
                                       url_features_batch)


def test_features_shape_and_codes():
    urls = ["https://a.example/post/123",
            "https://a.example/tag/some-slug",
            "https://a.example/about"]
    m = url_features_batch(urls)
    assert m.shape == (3, 7)
    assert m[0, 2] == -1.0      # digit segment
    assert m[1, 2] == -2.0      # hyphenated slug
    assert m[0, 0] == m[1, 0]   # same host hash
    assert m[2, 2] == 0.0       # padding


def test_dbscan_groups_same_shape_urls():
    urls = ([f"https://a.example/post/{i}" for i in range(10)]
            + [f"https://a.example/tag/t-{i}" for i in range(10)]
            + ["https://a.example/lonely/one/off/xyz9"])
    m = url_features_batch(urls)
    # reference parity: at eps=0.3 the host-hash dimension dominates the
    # cosine, so same-host 2-segment URLs merge into one cluster and the
    # 4-segment outlier is noise (core/structure_discovery.py:884-906
    # behavior with its raw feature vectors)
    coarse = dbscan_cosine(m)
    assert len(set(coarse[:20])) == 1
    assert coarse[20] == -1
    # a tighter radius separates the /post/ and /tag/ shapes
    fine = dbscan_cosine(m, eps=0.005)
    post, tag = set(fine[:10]), set(fine[10:20])
    assert len(post) == 1 and len(tag) == 1 and post != tag
    assert all(l != -1 for l in fine[:20])


def test_derive_pattern_wildcards_variable_positions():
    urls = [f"https://a.example/post/{i}" for i in (1, 2, 77)]
    assert derive_pattern(urls) == "https://a.example/post/*"
    urls2 = ["https://a.example/tag/x", "https://a.example/tag/x"]
    assert derive_pattern(urls2) == "https://a.example/tag/x"


def test_discover_end_to_end_deterministic():
    urls = ([f"https://a.example/post/{i}" for i in range(20)]
            + [f"https://a.example/category/c{i}/page/{i}"
               for i in range(20)])
    p1 = discover_url_patterns(urls, eps=0.005)
    p2 = discover_url_patterns(list(urls), eps=0.005)
    assert p1 == p2
    by_pat = {p["pattern"]: p for p in p1}
    assert by_pat["https://a.example/post/*"]["url_count"] == 20
    cat = [p for p in p1
           if p["pattern"].startswith("https://a.example/category/")]
    # per-category segment hashes vary, so a stray member may fall
    # outside the tight radius — the cluster must still be dominant
    assert cat and cat[0]["url_count"] >= 15
    for p in p1:
        assert len(p["sample_urls"]) == 5


def test_pattern_save_load_round_trip(tmp_path):
    from crawler_ray.ops.discovery import (discover_url_patterns,
                                           load_patterns, save_patterns)
    pats = discover_url_patterns(
        [f"https://a.example/post/{i}" for i in range(6)])
    path = str(tmp_path / "patterns.json")
    save_patterns(pats, path)
    assert load_patterns(path) == pats


def test_discover_selectors_list_and_detail():
    from crawler_ray.ops.discovery import discover_selectors
    list_html = (
        '<html><body><div class="posts-list">'
        '<div class="post-item"><h3><a href="/post/1">T</a></h3>'
        '<p class="summary">s</p></div></div>'
        '<div class="pagination"><a class="next" href="/page/2">n</a></div>'
        '</body></html>')
    sels = discover_selectors(list_html, "list")
    assert sels["container"] == "div.posts-list"
    assert sels["item"] == "div.post-item"
    assert sels["title"] == "h3"
    assert sels["link"] == "a"
    assert sels["summary"] == "p.summary"
    assert sels["pagination"] == "div.pagination"

    detail_html = (
        '<html><body><article><h1>T</h1>'
        '<span class="pubdate">2020/1/1</span>'
        '<span class="author-name">X</span><p>body</p></article>'
        '</body></html>')
    sels = discover_selectors(detail_html, "detail")
    assert sels["container"] == "article"
    assert sels["title"] == "h1"
    assert sels["date"] == "span.pubdate"
    assert sels["author"] == "span.author-name"


def test_match_selectors_similarity_join():
    from crawler_ray.ops.discovery import match_selectors
    stored = {
        "https://a.example/post/1": {"container": "article"},
        "https://a.example/category/x/": {"container": "div.posts-list"},
    }
    key, sels = match_selectors("https://a.example/post/999", stored)
    assert key == "https://a.example/post/1"
    assert sels == {"container": "article"}
    # below-threshold overlap -> no match
    key, sels = match_selectors("https://a.example/totally/other/path",
                                stored)
    assert key is None and sels is None


def test_selector_driven_extraction_list_and_detail():
    """M14 end-to-end: discovery's selector maps drive extraction
    (reference core/crawler.py:1158-1276 semantics — container/item
    iteration, urljoin'd links, pagination, content selector with
    generic fallback, date/author selector fallbacks)."""
    from crawler_ray.functions.extract import extract_with_selectors
    from crawler_ray.ops.discovery import discover_selectors

    list_html = """
    <html><body>
      <div class="post-list">
        <div class="item"><h3>First</h3><a href="/a/1">go</a>
          <p class="summary">sum one</p></div>
        <div class="item"><h3>Second</h3><a href="/a/2">go</a>
          <p class="summary">sum two</p></div>
      </div>
      <div class="pagination"><a href="/page/2">2</a>
        <a href="/page/3">3</a></div>
    </body></html>"""
    sel = discover_selectors(list_html, "list")
    assert sel["container"] and sel["item"]
    data = extract_with_selectors(list_html, "https://s.example/list",
                                  "list", sel)
    assert data["items_count"] == 2
    assert data["items"][0]["title"] == "First"
    assert data["items"][0]["link"] == "https://s.example/a/1"
    assert data["items"][1]["summary"] == "sum two"
    assert data["has_pagination"] is True
    # pagination links need a pagination_links selector (reference
    # behavior: empty list without one)
    assert data["pagination_links"] == []
    sel["pagination_links"] = "a"
    data = extract_with_selectors(list_html, "https://s.example/list",
                                  "list", sel)
    assert data["pagination_links"] == ["https://s.example/page/2",
                                        "https://s.example/page/3"]

    detail_html = """
    <html><body>
      <article class="post-body"><p>Main body text that is long enough
      to be the content.</p></article>
      <span class="date-line">1402/01/01</span>
      <span class="author-name">N. Writer</span>
    </body></html>"""
    sel = discover_selectors(detail_html, "detail")
    data = extract_with_selectors(detail_html, "https://s.example/d/9",
                                  "detail", sel)
    assert "Main body text" in data["content"]
    assert data["content_html"].startswith('<article class="post-body">')
    # no selectors at all -> generic main-content fallback
    data2 = extract_with_selectors(detail_html, "https://s.example/d/9",
                                   "detail", {})
    assert "Main body text" in data2["content"]
    assert "content_html" not in data2


def test_css_to_xpath_branches():
    from crawler_ray.ops.discovery import css_to_xpath
    # reference core/structure_discovery.py:616-642 branch-by-branch
    assert css_to_xpath("div.card") == "//div[contains(@class, 'card')]"
    assert css_to_xpath("h3") == "//h3"
    assert css_to_xpath("h3", strip_xpath=True) == "h3"
    assert (css_to_xpath("span.byline", strip_xpath=True)
            == "span[contains(@class, 'byline')]")
    assert css_to_xpath("") == ""
    assert css_to_xpath(None) == ""
    # only the FIRST class is used (reference splits on '.' and takes
    # parts[1])
    assert css_to_xpath("div.a.b") == "//div[contains(@class, 'a')]"


def test_selectors_to_xpaths_list_nesting():
    from crawler_ray.ops.discovery import selectors_to_xpaths
    sel = {"container": "div.news-list", "item": "div.card",
           "title": "h3", "link": "a", "summary": None,
           "pagination": "div.pager", "pagination_links": "a.page"}
    xp = selectors_to_xpaths(sel, "list")
    c = "//div[contains(@class, 'news-list')]"
    item = f"{c}//div[contains(@class, 'card')]"
    assert xp == {
        "container": c,
        "item": item,
        "title": f"{item}//h3",
        "link": f"{item}//a",
        "pagination": "//div[contains(@class, 'pager')]",
        "pagination_links": ("//div[contains(@class, 'pager')]"
                             "//a[contains(@class, 'page')]"),
    }
    # no container -> only pagination branch fires
    assert selectors_to_xpaths({"pagination": "div.pager"}, "list") == {
        "pagination": "//div[contains(@class, 'pager')]"}
    # item absent -> children never emitted (reference nests them
    # strictly under item)
    assert "title" not in selectors_to_xpaths(
        {"container": "div.l", "title": "h3"}, "list")


def test_selectors_to_xpaths_detail_and_generic():
    from crawler_ray.ops.discovery import selectors_to_xpaths
    xp = selectors_to_xpaths(
        {"container": "article", "title": "h1", "content": "article",
         "date": "time", "author": "span.author"}, "detail")
    assert xp["title"] == "//h1"  # absolute, not nested (reference)
    assert xp["content"] == "//article//article"
    assert xp["author"] == "//article//span[contains(@class, 'author')]"
    # generic page type -> reference returns {}
    assert selectors_to_xpaths({"container": "div"}, "generic") == {}


def test_discovered_selectors_convert_round_trip():
    """End-to-end: discover a selector map from HTML (M22), convert to
    XPath (M23)."""
    from crawler_ray.ops.discovery import (discover_selectors,
                                           selectors_to_xpaths)
    html = ("<html><body><div class='news-list'>"
            "<div class='card'><h3>T</h3><a href='/x'>m</a>"
            "<p class='summary'>s</p></div></div>"
            "<div class='pagination'><a>2</a></div></body></html>")
    sel = discover_selectors(html, "list")
    xp = selectors_to_xpaths(sel, "list")
    assert xp["container"].startswith("//div[contains(@class, ")
    assert xp["item"].startswith(xp["container"] + "//")
    assert "pagination" in xp


def test_pattern_db_store_roundtrip(ray_session, tmp_path):
    """S10 DB-variant persistence over the TableStore: update-or-create
    by domain id, point-get load, None for absent domains (the
    reference's file fallback trigger)."""
    from crawler_ray.ops.discovery import (load_patterns_from_store,
                                           pattern_store,
                                           save_patterns_to_store)
    store = pattern_store(str(tmp_path / "domains"))
    pats = [{"pattern": "/post/*", "job_type": "detail"}]
    counts = save_patterns_to_store(store, 7, "example.com", pats,
                                    important_sections=["/blog/"])
    assert counts == {"inserted": 1, "updated": 0}  # create branch
    got = load_patterns_from_store(store, 7)
    assert got["patterns"] == pats
    assert got["important_sections"] == ["/blog/"]
    # update branch: same domain id replaces the blob
    counts = save_patterns_to_store(store, 7, "example.com",
                                    pats + [{"pattern": "/tag/*",
                                             "job_type": "list"}])
    assert counts == {"inserted": 0, "updated": 1}
    assert len(load_patterns_from_store(store, 7)["patterns"]) == 2
    # absent domain -> None (callers fall back to the file artifacts)
    assert load_patterns_from_store(store, 8) is None
    # a second domain lands in its own row
    save_patterns_to_store(store, 8, "other.com", [])
    assert load_patterns_from_store(store, 8)["patterns"] == []
    assert store.count() == 2
