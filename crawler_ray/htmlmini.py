"""Minimal HTML DOM built on the stdlib ``html.parser``.

The reference crawler does all of its HTML work through BeautifulSoup with
the ``html.parser`` tree builder (e.g. ``core/content_extractor.py:176``,
``utils/text.py:66``).  Neither ``bs4`` nor ``lxml`` is available in this
environment, so this module provides a small DOM with the *subset* of the
bs4 query API the reference's extraction algorithms rely on:

- ``find_all(name(s), class_=..., attrs=...)`` / ``find(...)`` over
  descendants in document (pre-) order;
- ``get_text(separator=..., strip=...)`` with bs4 join semantics;
- ``decompose()`` subtree removal;
- ``Element.string`` (single-text-child accessor, used for ``<title>``);
- multi-valued ``class`` matching: a regex / callable / plain-string
  ``class_`` filter is tried against each individual class token and
  against the full attribute string, mirroring bs4's
  ``SoupStrainer._matches`` behaviour for multi-valued attributes.

Both the serial conformance oracle and the Ray ``map_batches`` stages parse
through this module, which is what makes the "byte-identical extracted text
per url" contract (BASELINE.json ``input_hint``) well-defined and testable.
"""

from __future__ import annotations

import re
import sys
from html.parser import HTMLParser
from typing import Callable, Iterable, Iterator, Optional, Union

__all__ = ["Element", "TextNode", "parse_html"]

# HTML void elements never take children (WHATWG list).
_VOID_ELEMENTS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

_WS_RE = re.compile(r"\s+")

ClassFilter = Union[str, re.Pattern, Callable[[Optional[str]], bool], None]
NameFilter = Union[str, Iterable[str], None]


class TextNode:
    __slots__ = ("text", "parent")

    def __init__(self, text: str, parent: "Element | None" = None):
        self.text = text
        self.parent = parent

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"TextNode({self.text!r})"


class Element:
    __slots__ = ("tag", "attrs", "children", "parent", "seq",
                 "_tag_index", "_class_index", "_mutated")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None,
                 parent: "Element | None" = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list[Union["Element", TextNode]] = []
        self.parent = parent
        # query-acceleration state (see _TreeBuilder): ``seq`` is the
        # document pre-order number; the root of a parsed document carries
        # ``_tag_index`` (tag -> elements in document order) and
        # ``_class_index`` (elements with a class attribute, in order).
        # ``_mutated`` flips on the first decompose() so index candidates
        # get an attachment check only once the tree can disagree.
        self.seq = 0
        self._tag_index: dict[str, list["Element"]] | None = None
        self._class_index: list["Element"] | None = None
        self._mutated = False

    # -- tree construction -------------------------------------------------
    def _append_element(self, el: "Element") -> None:
        el.parent = self
        self.children.append(el)

    def _append_text(self, text: str) -> None:
        if self.children and isinstance(self.children[-1], TextNode):
            # merge adjacent data chunks (html.parser may split on charrefs)
            self.children[-1].text += text
        else:
            self.children.append(TextNode(text, self))

    # -- attribute access --------------------------------------------------
    def has_attr(self, name: str) -> bool:
        return name in self.attrs

    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    def __getitem__(self, name: str) -> str:
        return self.attrs[name]

    @property
    def classes(self) -> list[str]:
        raw = self.attrs.get("class")
        return raw.split() if raw else []

    @property
    def string(self) -> Optional[str]:
        """bs4 ``.string``: the text if this element has exactly one child
        and that child is a text node; otherwise None."""
        if len(self.children) == 1 and isinstance(self.children[0], TextNode):
            return self.children[0].text
        return None

    # -- traversal ---------------------------------------------------------
    def iter_descendants(self) -> Iterator["Element"]:
        """All descendant elements in document (pre-) order, self excluded
        (bs4 ``find_all`` searches descendants only)."""
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, Element):
                yield node
                stack.extend(reversed(node.children))

    def _iter_text(self) -> Iterator[str]:
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, TextNode):
                yield node.text
            else:
                stack.extend(reversed(node.children))

    # -- bs4-compatible queries -------------------------------------------
    def get_text(self, separator: str = "", strip: bool = False) -> str:
        """bs4 semantics: join descendant strings with ``separator``;
        with ``strip=True`` each string is stripped and empty ones are
        skipped before joining."""
        if strip:
            parts = [s for s in (t.strip() for t in self._iter_text()) if s]
        else:
            parts = list(self._iter_text())
        return separator.join(parts)

    def _index_candidates(self, name: NameFilter, attrs: dict | None,
                          class_: ClassFilter
                          ) -> Optional[list["Element"]]:
        """Document-ordered superset of the elements a descendant scan
        would visit, drawn from the parse-time indexes — or None when the
        query shape (or a detached/unindexed tree) requires a full walk.

        Valid because the tree only ever shrinks after parse (decompose;
        no element is constructed or re-attached post-parse — attrs are
        read-only too), so index order == current pre-order and a
        parent-chain check decides membership under ``self`` exactly as
        ``iter_descendants`` would."""
        top = self
        while top.parent is not None:
            top = top.parent
        idx = top._tag_index
        if idx is None:
            return None
        if isinstance(name, str):
            cand = idx.get(name, [])
        elif name is not None:
            lists = [idx.get(n, []) for n in name]
            lists = [l for l in lists if l]
            if len(lists) == 1:
                cand = lists[0]
            else:
                cand = sorted((el for lst in lists for el in lst),
                              key=lambda e: e.seq)
        elif class_ is not None or (attrs and "class" in attrs):
            # the class index only holds elements that HAD a class
            # attribute at parse time; a callable filter may accept
            # None (_value_matches tries matcher(None)), so only
            # str/regex filters — which can never match a missing
            # attribute — may use it
            filters = [class_] if class_ is not None else []
            if attrs and "class" in attrs:
                filters.append(attrs["class"])
            if any(callable(f) and not isinstance(f, re.Pattern)
                   for f in filters):
                return None
            cand = top._class_index or []
        else:
            return None  # unconstrained scan: index buys nothing
        if self is top and not top._mutated:
            return cand
        out = []
        for el in cand:
            p = el.parent
            while p is not None:
                if p is self:
                    out.append(el)
                    break
                p = p.parent
        return out

    def find_all(self, name: NameFilter = None, attrs: dict | None = None,
                 class_: ClassFilter = None, id: ClassFilter = None,
                 href: bool | None = None, limit: int | None = None,
                 ) -> list["Element"]:
        cand = self._index_candidates(name, attrs, class_)
        if cand is not None:
            if (attrs is None and class_ is None and id is None
                    and href is None):
                return cand[:limit] if limit is not None else list(cand)
            out = []
            for el in cand:
                if _matches(el, name, attrs, class_, id, href):
                    out.append(el)
                    if limit is not None and len(out) >= limit:
                        break
            return out
        # fast path for the dominant query shape (single tag name, no
        # other filters): inline the tag test instead of a _matches call
        # per descendant — identical semantics, ~2x on deep documents
        if (attrs is None and class_ is None and id is None
                and href is None and isinstance(name, str)):
            out = [el for el in self.iter_descendants() if el.tag == name]
            return out[:limit] if limit is not None else out
        out = []
        for el in self.iter_descendants():
            if _matches(el, name, attrs, class_, id, href):
                out.append(el)
                if limit is not None and len(out) >= limit:
                    break
        return out

    def find(self, name: NameFilter = None, attrs: dict | None = None,
             class_: ClassFilter = None, id: ClassFilter = None,
             href: bool | None = None) -> Optional["Element"]:
        cand = self._index_candidates(name, attrs, class_)
        if cand is not None:
            for el in cand:
                if _matches(el, name, attrs, class_, id, href):
                    return el
            return None
        if (attrs is None and class_ is None and id is None
                and href is None and isinstance(name, str)):
            for el in self.iter_descendants():
                if el.tag == name:
                    return el
            return None
        for el in self.iter_descendants():
            if _matches(el, name, attrs, class_, id, href):
                return el
        return None

    def decompose(self) -> None:
        """Detach this subtree from its parent (no-op if already detached)."""
        if self.parent is not None:
            top = self
            while top.parent is not None:
                top = top.parent
            top._mutated = True  # index candidates now need parent checks
            try:
                self.parent.children.remove(self)
            except ValueError:
                pass
            self.parent = None

    # -- simple CSS selectors (the grammar discovery emits: ``tag``,
    #    ``.class``, ``tag.class`` — M14 consumes these; full CSS is out
    #    of scope, mirroring the reference's select_one/select use over
    #    its own discovered selectors, ``core/crawler.py:1191-1276``) ---
    @staticmethod
    def _parse_selector(sel: str) -> tuple[Optional[str], Optional[str]]:
        sel = sel.strip()
        if "." in sel:
            # multi-class selectors use the FIRST class, matching the
            # reference's _css_to_xpath parts[1] (extra segments are
            # ignored there too)
            parts = sel.split(".")
            return (parts[0] or None), (parts[1] or None)
        return (sel or None), None

    def select(self, sel: str, limit: int | None = None
               ) -> list["Element"]:
        """Descendants matching a ``tag`` / ``.class`` / ``tag.class``
        selector (CSS class semantics: whitespace-token equality)."""
        tag, cls = self._parse_selector(sel)
        cand = self._index_candidates(
            tag, None, cls if tag is None else None)
        nodes = cand if cand is not None else self.iter_descendants()
        out = []
        for el in nodes:
            if tag is not None and el.tag != tag:
                continue
            if cls is not None and cls not in el.classes:
                continue
            out.append(el)
            if limit is not None and len(out) >= limit:
                break
        return out

    def select_one(self, sel: str) -> Optional["Element"]:
        found = self.select(sel, limit=1)
        return found[0] if found else None

    def to_html(self) -> str:
        """Deterministic re-serialization of this subtree (the analog of
        bs4 ``str(element)`` the reference stores as ``content_html``;
        like bs4's, it is a re-serialization, not the source bytes)."""
        from html import escape
        parts: list[str] = []

        def emit(node) -> None:
            if isinstance(node, TextNode):
                parts.append(escape(node.text, quote=False))
                return
            attrs = "".join(f' {k}="{escape(v or "")}"'
                            for k, v in node.attrs.items())
            parts.append(f"<{node.tag}{attrs}>")
            for child in node.children:
                emit(child)
            parts.append(f"</{node.tag}>")

        emit(self)
        return "".join(parts)

    # -- convenience -------------------------------------------------------
    @property
    def name(self) -> str:
        """bs4 compatibility alias for the tag name."""
        return self.tag

    @property
    def title(self) -> Optional["Element"]:
        return self.find("title")

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<{self.tag} {self.attrs}>"


_VALUE_MATCH_MEMO: dict = {}


def _value_matches(value: Optional[str], matcher: ClassFilter,
                   split_tokens: bool) -> bool:
    """Match one attribute value against a string / regex / callable filter.

    For multi-valued attributes (class) the filter is tried against each
    whitespace token and against the full attribute string, mirroring bs4.

    Regex filters memoize per (pattern, value): template pages repeat
    the same class strings across thousands of elements, so the regex
    runs once per distinct string instead of once per element.  Pure
    function of its key (patterns and strings are immutable); the memo
    is bounded and process-local (Ray workers each build their own)."""
    if isinstance(matcher, re.Pattern) and value is not None:
        key = (matcher, split_tokens, value)
        hit = _VALUE_MATCH_MEMO.get(key)
        if hit is None:
            hit = _value_matches_impl(value, matcher, split_tokens)
            if len(_VALUE_MATCH_MEMO) > 200_000:
                _VALUE_MATCH_MEMO.clear()
            _VALUE_MATCH_MEMO[key] = hit
        return hit
    return _value_matches_impl(value, matcher, split_tokens)


def _value_matches_impl(value: Optional[str], matcher: ClassFilter,
                        split_tokens: bool) -> bool:
    candidates: list[Optional[str]]
    if value is None:
        candidates = [None]
    elif split_tokens:
        toks = value.split()
        candidates = list(toks)
        if len(toks) != 1:
            candidates.append(value)  # bs4 also tries the joined string
        if not toks:
            candidates = [value]
    else:
        candidates = [value]

    for cand in candidates:
        if callable(matcher) and not isinstance(matcher, re.Pattern):
            if matcher(cand):
                return True
        elif isinstance(matcher, re.Pattern):
            if cand is not None and matcher.search(cand):
                return True
        else:  # plain string
            if cand == matcher:
                return True
    return False


def _matches(el: Element, name: NameFilter, attrs: dict | None,
             class_: ClassFilter, id: ClassFilter,
             href: bool | None) -> bool:
    if name is not None:
        if isinstance(name, str):
            if el.tag != name:
                return False
        else:
            if el.tag not in name:
                return False
    if class_ is not None:
        if not _value_matches(el.attrs.get("class"), class_, split_tokens=True):
            return False
    if id is not None:
        if not _value_matches(el.attrs.get("id"), id, split_tokens=False):
            return False
    if href is True and "href" not in el.attrs:
        return False
    if attrs:
        for k, v in attrs.items():
            if not _value_matches(el.attrs.get(k), v,
                                  split_tokens=(k == "class")):
                return False
    return True


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]")
        self.root._tag_index = {}
        self.root._class_index = []
        self._seq = 0
        self._stack: list[Element] = [self.root]

    def _new_element(self, tag: str, attr_dict: dict[str, str]) -> Element:
        # interned tag names: one shared string object per tag across the
        # whole corpus — identity-fast comparisons in the find fast path
        # and far fewer small allocations in the parse storm
        el = Element(sys.intern(tag), attr_dict)
        self._seq += 1
        el.seq = self._seq  # parse order == document pre-order
        idx = self.root._tag_index
        lst = idx.get(el.tag)
        if lst is None:
            idx[el.tag] = [el]
        else:
            lst.append(el)
        if "class" in attr_dict:
            self.root._class_index.append(el)
        return el

    def handle_starttag(self, tag, attrs):
        attr_dict: dict[str, str] = {}
        for k, v in attrs:
            if k not in attr_dict:  # keep first occurrence like bs4
                attr_dict[sys.intern(k)] = "" if v is None else v
        el = self._new_element(tag, attr_dict)
        self._stack[-1]._append_element(el)
        if tag not in _VOID_ELEMENTS:
            self._stack.append(el)

    def handle_startendtag(self, tag, attrs):
        attr_dict: dict[str, str] = {}
        for k, v in attrs:
            if k not in attr_dict:
                attr_dict[k] = "" if v is None else v
        self._stack[-1]._append_element(self._new_element(tag, attr_dict))

    def handle_endtag(self, tag):
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return
        # unmatched end tag: ignore

    def handle_data(self, data):
        self._stack[-1]._append_text(data)


# ---------------------------------------------------------------------------
# Fast single-shot tokenizer
#
# ``html.parser`` is built for incremental feeding: every token pays for
# buffer management, source-position tracking and handler dispatch.  A
# crawler parses each complete document exactly once, so ``_fast_feed``
# re-runs the SAME tokenization — it imports html.parser's own compiled
# regexes (tagfind/attrfind/locatestarttagend/endtagfind/commentclose),
# so token boundaries are identical by construction — in one tight loop
# that builds the tree directly.  Replicated behaviours (against CPython
# 3.11 ``html/parser.py`` with ``convert_charrefs=True`` and a single
# ``feed(...); close()``):
#
# - text runs charref-unescaped, raw inside script/style CDATA content;
# - start tags via locatestarttagend + tagfind + attrfind (names
#   lowercased, first duplicate attr wins, quoted values stripped and
#   unescaped), ``/>`` -> start+end, bogus tag tails re-emitted as data;
# - end tags via endtagfind with the bogus-comment and ``</>`` branches;
# - comments / doctype / processing instructions / bogus comments
#   consumed exactly as parse_comment / parse_html_declaration /
#   parse_pi / parse_bogus_comment do;
# - the end-of-input recovery goahead applies when a construct never
#   terminates (emit through the next ``>`` / ``<`` unescaped-as-text);
# - unterminated CDATA content is dropped, a trailing text run is
#   flushed.
#
# Marked sections (``<![``) go through the stdlib incremental path — the
# only construct not replicated (parse_marked_section lives in
# _markupbase).  ``tests/test_htmlmini.py`` pins fast == stdlib over the
# generated corpus and an adversarial fuzz set.
# ---------------------------------------------------------------------------

# stdlib ``starttagopen`` is ``<[a-zA-Z]``; a set lookup on the single
# already-sliced char replaces a C regex call per '<' occurrence
_ASCII_LETTERS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")


def _fast_feed(builder: "_TreeBuilder", rawdata: str) -> None:
    from html import unescape
    from html.parser import (attrfind_tolerant, commentclose, endtagfind,
                             locatestarttagend_tolerant, tagfind_tolerant)

    n = len(rawdata)
    i = 0
    cdata_elem: str | None = None
    cdata_close = None
    find = rawdata.find
    startswith = rawdata.startswith
    stack = builder._stack
    new_element = builder._new_element
    handle_endtag = builder.handle_endtag
    void = _VOID_ELEMENTS
    alnum_eq_slash = ("abcdefghijklmnopqrstuvwxyz=/"
                      "ABCDEFGHIJKLMNOPQRSTUVWXYZ")

    def emit_text(s: str) -> None:
        parent = stack[-1]
        kids = parent.children
        if kids and isinstance(kids[-1], TextNode):
            kids[-1].text += s
        else:
            kids.append(TextNode(s, parent))

    def recover(i: int) -> int:
        """goahead's end-of-input branch for a construct returning -1."""
        k = find(">", i + 1)
        if k < 0:
            k = find("<", i + 1)
            if k < 0:
                k = i + 1
        else:
            k += 1
        chunk = rawdata[i:k]
        if cdata_elem is None and "&" in chunk:
            chunk = unescape(chunk)
        if chunk:
            emit_text(chunk)
        return k

    while i < n:
        if cdata_elem is None:
            j = find("<", i)
            if j < 0:
                j = n
            if i < j:
                chunk = rawdata[i:j]
                emit_text(unescape(chunk) if "&" in chunk else chunk)
            i = j
            if i == n:
                break
        else:
            m = cdata_close.search(rawdata, i)
            if m is None:
                return  # unterminated CDATA content is dropped
            j = m.start()
            if i < j:
                emit_text(rawdata[i:j])
            i = j
        c = rawdata[i + 1:i + 2]
        if cdata_elem is not None:
            # only "</elem...>" reaches here (the cdata_close pattern
            # includes the '>', mirroring stdlib's interesting_cdata)
            gt = find(">", i + 1)
            if gt < 0:
                return  # unreachable with the '>' pattern; stdlib breaks
            gtpos = gt + 1
            m = endtagfind.match(rawdata, i)
            if m is None or m.group(1).lower() != cdata_elem:
                emit_text(rawdata[i:gtpos])
                i = gtpos
                continue
            handle_endtag(cdata_elem)
            cdata_elem = None
            i = gtpos
            continue
        if c in _ASCII_LETTERS:  # < + letter (stdlib starttagopen)
            m = locatestarttagend_tolerant.match(rawdata, i)
            j = m.end()
            nxt = rawdata[j:j + 1]
            if nxt == ">":
                endpos = j + 1
            elif nxt == "/":
                if startswith("/>", j):
                    endpos = j + 2
                else:
                    endpos = -1  # '/' at end of input
            elif nxt == "" or nxt in alnum_eq_slash:
                endpos = -1  # end of input mid-tag
            elif j > i:
                endpos = j
            else:
                endpos = i + 1
            if endpos < 0:
                i = recover(i)
                continue
            tm = tagfind_tolerant.match(rawdata, i + 1)
            k = tm.end()
            tag = tm.group(1).lower()
            attr_dict: dict[str, str] = {}
            while k < endpos:
                am = attrfind_tolerant.match(rawdata, k)
                if am is None:
                    break
                attrname, rest, attrvalue = am.group(1, 2, 3)
                if not rest:
                    attrvalue = None
                elif (attrvalue[:1] == "'" == attrvalue[-1:]
                      or attrvalue[:1] == '"' == attrvalue[-1:]):
                    attrvalue = attrvalue[1:-1]
                if attrvalue and "&" in attrvalue:
                    attrvalue = unescape(attrvalue)
                attrname = attrname.lower()
                if attrname not in attr_dict:  # first occurrence wins
                    attr_dict[sys.intern(attrname)] = (
                        "" if attrvalue is None else attrvalue)
                k = am.end()
            end = rawdata[k:endpos].strip()
            if end not in (">", "/>"):
                chunk = rawdata[i:endpos]
                emit_text(unescape(chunk) if "&" in chunk else chunk)
                i = endpos
                continue
            el = new_element(tag, attr_dict)
            parent = stack[-1]
            el.parent = parent
            parent.children.append(el)
            if end != "/>":  # plain start tag
                if tag not in void:
                    stack.append(el)
                if tag == "script" or tag == "style":
                    cdata_elem = tag
                    # the installed 3.11.7 parser's set_cdata_mode
                    # pattern: the close must include the '>' — a bare
                    # "</script" at EOF never matches, so the whole
                    # CDATA run is dropped (goahead's `break`)
                    cdata_close = re.compile(r"</\s*%s\s*>" % tag,
                                             re.IGNORECASE)
            i = endpos
        elif c == "/":  # end tag
            gt = find(">", i + 1)  # stdlib piclose is a literal '>'
            if gt < 0:
                i = recover(i)
                continue
            gtpos = gt + 1
            m = endtagfind.match(rawdata, i)
            if m is not None:
                handle_endtag(m.group(1).lower())
                i = gtpos
                continue
            nm = tagfind_tolerant.match(rawdata, i + 2)
            if nm is None:
                if startswith("</>", i):
                    i = i + 3
                else:  # bogus comment: consume to '>'
                    pos = find(">", i + 2)
                    i = recover(i) if pos == -1 else pos + 1
                continue
            handle_endtag(nm.group(1).lower())
            i = find(">", nm.end()) + 1
        elif startswith("<!--", i):
            m = commentclose.search(rawdata, i + 4)
            i = recover(i) if m is None else m.end()
        elif c == "?":
            gt = find(">", i + 2)  # stdlib piclose is a literal '>'
            i = recover(i) if gt < 0 else gt + 1
        elif c == "!":
            if rawdata[i:i + 9].lower() == "<!doctype":
                gtpos = find(">", i + 9)
                i = recover(i) if gtpos == -1 else gtpos + 1
            else:  # bogus comment
                pos = find(">", i + 2)
                i = recover(i) if pos == -1 else pos + 1
        elif i + 1 < n:
            emit_text("<")
            i += 1
        else:
            break  # lone '<' at EOF: flushed below
    if i < n and cdata_elem is None:
        chunk = rawdata[i:n]
        emit_text(unescape(chunk) if "&" in chunk else chunk)


def parse_html(html: Union[str, bytes]) -> Element:
    """Parse an HTML document into a mini-DOM root element."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    builder = _TreeBuilder()
    if "<![" in html:  # marked sections: stdlib incremental path
        builder.feed(html)
        builder.close()
    else:
        _fast_feed(builder, html)
    return builder.root


def parse_html_stdlib(html: Union[str, bytes]) -> Element:
    """Reference parse through the stdlib incremental parser — the
    ground truth ``_fast_feed`` is differential-tested against."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root
