"""Unit tests for the stdlib mini-DOM (bs4-subset semantics)."""

import re

from crawler_ray.htmlmini import parse_html


HTML = """
<html><head><title>My Title | Site</title>
<meta name="author" content="Jane">
<script>junk();</script></head>
<body>
<header><h2>SiteHeaderText</h2></header>
<nav class="main-menu"><a href="/a">A</a></nav>
<div class="post-content extra">
  <h1>Heading</h1>
  <p>first para</p>
  <p>second <b>bold</b> para</p>
  <a href="/x">link</a>
</div>
<div class="banner-ads">Buy!</div>
<img src="x.png">
<footer>foot</footer>
</body></html>
"""


def test_parse_and_find():
    root = parse_html(HTML)
    assert root.find("title").string == "My Title | Site"
    assert root.find("h1").get_text() == "Heading"
    assert len(root.find_all("p")) == 2
    assert root.find("meta", attrs={"name": "author"})["content"] == "Jane"


def test_class_regex_and_tokens():
    root = parse_html(HTML)
    # regex must match individual class tokens of a multi-class attribute
    el = root.find("div", class_=re.compile(r"(content|article)"))
    assert el is not None and "post-content" in el.classes
    # callable filter receives each token (and None for classless tags)
    ads = root.find_all(class_=lambda x: x is not None and "ads" in x.lower())
    assert len(ads) == 1 and ads[0].get_text() == "Buy!"


def test_get_text_semantics():
    root = parse_html("<div> a <b>b</b>\n c </div>")
    div = root.find("div")
    # strip=True: per-string strip, empties dropped, then join
    assert div.get_text(separator=" ", strip=True) == "a b c"
    # no strip: raw strings joined
    assert div.get_text(separator="|") == " a |b|\n c "


def test_decompose():
    root = parse_html(HTML)
    for tag in root.find_all(["script", "header", "footer", "nav"]):
        tag.decompose()
    text = root.get_text(separator=" ", strip=True)
    assert "junk" not in text and "foot" not in text
    assert "SiteHeaderText" not in text  # header removed (title text stays)
    assert "first para" in text


def test_void_and_unclosed():
    root = parse_html("<div><br><img src='a'><p>x</div>")
    assert root.find("div").get_text() == "x"
    assert root.find("img") is not None


def test_string_none_for_nested():
    root = parse_html("<title>a <b>c</b></title>")
    assert root.find("title").string is None


def test_href_filter():
    root = parse_html('<a href="/x">x</a><a name="anchor">y</a>')
    assert [a["href"] for a in root.find_all("a", href=True)] == ["/x"]


def test_document_order():
    root = parse_html("<div><p>1</p><section><p>2</p></section></div><p>3</p>")
    assert [p.get_text() for p in root.find_all("p")] == ["1", "2", "3"]


# --- index-vs-walk equivalence (the parse-time query index must be
#     indistinguishable from a full descendant scan, including after
#     decompose() mutations and on detached subtrees) -------------------

import random
import re as _re


def _random_html(rng: random.Random) -> str:
    tags = ["div", "p", "span", "a", "ul", "li", "article", "section"]
    classes = ["content", "nav menu", "post-date", "author-name", ""]
    out = []

    def emit(depth: int):
        n = rng.randint(1, 4 if depth < 3 else 1)
        for _ in range(n):
            if depth >= 4 or rng.random() < 0.3:
                out.append(f"text{rng.randint(0, 9)} ")
                continue
            tag = rng.choice(tags)
            cls = rng.choice(classes)
            attr = f' class="{cls}"' if cls else ""
            if tag == "a" and rng.random() < 0.7:
                attr += f' href="/x{rng.randint(0, 5)}"'
            out.append(f"<{tag}{attr}>")
            emit(depth + 1)
            out.append(f"</{tag}>")

    emit(0)
    return "".join(out)


def _walk_find_all(el, **kw):
    """Ground truth: force the descendant-scan path by hiding the index."""
    top = el
    while top.parent is not None:
        top = top.parent
    saved = top._tag_index
    top._tag_index = None
    try:
        return el.find_all(**kw)
    finally:
        top._tag_index = saved


QUERIES = [
    dict(name="p"),
    dict(name="a", href=True),
    dict(name=["p", "li", "article"]),
    dict(class_=_re.compile(r"post|author")),
    dict(name="div", class_="content"),
    dict(attrs={"class": "nav"}),
    dict(name="span", limit=2),
    # callable class filters may accept None (classless elements), so
    # they must bypass the class index — regression for the indexed
    # tree returning a strict subset of the walk
    dict(class_=lambda c: c is None),
    dict(class_=lambda c: c is not None and "post" in c),
    dict(attrs={"class": lambda c: c is None or "nav" in c}),
]


def test_index_matches_walk_under_mutation():
    rng = random.Random(1234)
    for trial in range(30):
        root = parse_html(_random_html(rng))
        for step in range(6):
            for kw in QUERIES:
                assert root.find_all(**kw) == _walk_find_all(root, **kw), \
                    (trial, step, kw)
                assert root.find(**{k: v for k, v in kw.items()
                                    if k != "limit"}) == next(
                    iter(_walk_find_all(root, **{k: v for k, v in kw.items()
                                                 if k != "limit"})), None)
            # subtree queries (self is not the indexed root)
            divs = root.find_all("div")
            if divs:
                sub = rng.choice(divs)
                for kw in QUERIES:
                    assert sub.find_all(**kw) == _walk_find_all(sub, **kw)
            # mutate: decompose a random element, then re-check
            els = root.find_all(["div", "span", "ul", "section"])
            if els:
                victim = rng.choice(els)
                victim.decompose()
                # queries on the detached subtree must also agree
                for kw in QUERIES[:3]:
                    assert victim.find_all(**kw) == _walk_find_all(
                        victim, **kw)


def test_select_multi_class_uses_first_class():
    # 'div.a.b' selects by the FIRST class only, matching the
    # reference's _css_to_xpath parts[1]
    root = parse_html("<div class='a b'>1</div><div class='a.b'>2</div>"
                      "<div class='b'>3</div><p class='a'>4</p>")
    assert [e.get_text() for e in root.select("div.a")] == ["1"]
    assert [e.get_text() for e in root.select("div.a.b")] == ["1"]
    assert [e.get_text() for e in root.select(".a.b")] == ["1", "4"]


def test_index_select_matches_walk():
    rng = random.Random(99)
    for _ in range(10):
        root = parse_html(_random_html(rng))
        for el in root.find_all("nav"):
            el.decompose()
        for sel in ["p", ".content", "div.content", "a", ".post-date"]:
            got = root.select(sel)
            top_saved = root._tag_index
            root._tag_index = None
            try:
                want = root.select(sel)
            finally:
                root._tag_index = top_saved
            assert got == want, sel


# --- fast tokenizer vs stdlib incremental parser ----------------------

from crawler_ray.htmlmini import parse_html_stdlib, TextNode


def _tree_repr(node, out):
    if isinstance(node, TextNode):
        out.append(("T", node.text))
        return
    out.append(("E", node.tag, tuple(sorted(node.attrs.items()))))
    for c in node.children:
        _tree_repr(c, out)
    out.append(("/E", node.tag))


def _trees_equal(html):
    a, b = [], []
    _tree_repr(parse_html(html), a)
    _tree_repr(parse_html_stdlib(html), b)
    return a == b


ADVERSARIAL = [
    "", "plain", "a &amp; b &lt;c&gt; &#65; &#x42; &unknown; &",
    "<!DOCTYPE html><p>x</p>", "<!doctype junk\nhere><p>y</p>",
    "<!-- c --><p>z</p>", "<!-- unterminated", "<!-->", "<!--a--!>t",
    "<?pi ?>x", "<?unterminated", "<!weird>w", "<!unterminated",
    "<script>if (a < b && c > d) '&amp;'</script>after",
    "<script>'</scr' + 'ipt>'</script>ok", "<script>unterminated",
    "<script>x</script", "<script>a</script x>", "<style>b</style",
    "<script>c</scriptx></script>d", "<script></ script>e",
    "<style>.a > .b {}</style>t", "<SCRIPT>X</SCRIPT>t",
    "<script></scripts></script>done", "<script></ script >done",
    "a < b text", "tail <", "<", "<>", "</>", "</ >", "</123>x",
    "</bogus attr='>'>after", "</div junk>after",
    "<p/>s", "<div / >o", "<div/x>o2", "<p unterminated attr='",
    "<tag attr=>e", "<tag =w>x", "<tag 'q'>x", "<p a='1'b='2'>s</p>",
    "<input value='a > b'>t", '<input value="<tag>">t',
    "<A HREF='X' CLASS=Y>u</A>", "<p attr attr=1 attr=2>d</p>",
    "<td:x ns:a=1>x</td:x>", "&#65 n", "&amp n", "text &#; b",
    "<p title='&quot;q&quot;'>a</p>", "<p><!---></p>", "<p><!----></p>",
    "<![CDATA[raw]]>via-stdlib-path",
]


def test_fast_tokenizer_matches_stdlib_adversarial():
    for h in ADVERSARIAL:
        assert _trees_equal(h), repr(h)


def test_fast_tokenizer_matches_stdlib_fuzz():
    rng = random.Random(20260817)
    frags = ["<div>", "</div>", "<p class='x'>", "</p>", "text ", "&amp;",
             "&#65;", "<br>", "<!--c-->", "<!-", "<script>", "</script>",
             "< ", "<", ">", "<a href='u'>", "</a>", "'", '"',
             "<!doctype h>", "<?pi?>", "&", "</", "<tag a=1 b", "=",
             "/>", "--", "<style>", "</style>", "\n", "<em", "<em>",
             "x;", "&unknown;", "</bogus", "<b/>"]
    for _ in range(800):
        h = "".join(rng.choice(frags)
                    for _ in range(rng.randint(1, 25)))
        assert _trees_equal(h), repr(h)


def test_fast_tokenizer_matches_stdlib_on_corpus(small_corpus):
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{small_corpus}/pages/*.parquet"))
    for f in files:
        for h in pq.read_table(f, columns=["html"])["html"].to_pylist():
            assert _trees_equal(h)
