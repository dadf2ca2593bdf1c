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
