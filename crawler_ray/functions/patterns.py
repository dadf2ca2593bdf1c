"""URL -> job_type pattern classification.

The reference assigns job types from *learned* URL patterns
(``core/structure_discovery.py:1243-1289`` regex match, first wins) with a
URL-heuristic bootstrap (``core/structure_discovery.py:225-228``).  Our
engine makes the pattern table explicit config: ordered (regex, job_type)
rules, first match wins, default 'page' (mirroring
``core/crawler.py:719-730`` where a URL with no pattern is 'page').

The default rule set = the reference's list-URL heuristics plus a
``/post/<id>`` detail convention used by the synthetic corpus.
"""

from __future__ import annotations

import re

__all__ = ["URLPatternClassifier", "default_url_classifier"]

# ``core/structure_discovery.py:225-228``
_LIST_URL_PATTERNS = [
    r"/category/", r"/tag/", r"/archive/", r"/blog/", r"/articles/",
    r"/questions/", r"/list/", r"/search/", r"/page/\d+", r"/\?page=\d+",
]
_DETAIL_URL_PATTERNS = [r"/post/\d+", r"/article/\d+", r"/question/\d+"]


class URLPatternClassifier:
    """Ordered first-match-wins regex rules (small side; broadcast into
    map fns as a plain object per SURVEY §2 J4)."""

    def __init__(self, rules: list[tuple[str, str]] | None = None):
        if rules is None:
            rules = ([(p, "list") for p in _LIST_URL_PATTERNS]
                     + [(p, "detail") for p in _DETAIL_URL_PATTERNS])
        self.rules = [(re.compile(p), jt) for p, jt in rules]

    def job_type(self, url: str) -> str:
        for pattern, jt in self.rules:
            if pattern.search(url):
                return jt
        return "page"

    def job_type_batch(self, urls) -> list[str]:
        jt = self.job_type
        return [jt(u) for u in urls]


_DEFAULT = None


def default_url_classifier() -> URLPatternClassifier:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = URLPatternClassifier()
    return _DEFAULT
