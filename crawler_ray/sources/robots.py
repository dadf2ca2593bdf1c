"""robots.txt rules + sitemap document parsing.

The reference consumes robots through ``urllib.robotparser`` singletons
(``utils/http.py:40-113``: ``can_fetch``, ``crawl_delay``) and scrapes
``Sitemap:`` lines itself (``core/crawler.py:640-669``); sitemap XML /
index recursion / plain-text fallback is ``core/crawler.py:1278-1365``.

Here robots rules are a small broadcastable table (FIXTURES.md §3): one
``HostRules`` per host with allow/disallow path prefixes, crawl delay and
advertised sitemaps.  Longest-prefix-wins evaluation matches
``urllib.robotparser`` semantics for the prefix-only rule subset the
fixture corpus uses (no wildcards).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

__all__ = ["HostRules", "RobotsTable", "parse_robots_txt", "parse_sitemap"]

_SM_NS = {"sm": "http://www.sitemaps.org/schemas/sitemap/0.9"}


@dataclass
class HostRules:
    host: str
    disallow: list[str] = field(default_factory=list)
    allow: list[str] = field(default_factory=list)
    crawl_delay: float | None = None
    sitemaps: list[str] = field(default_factory=list)

    def can_fetch(self, path: str) -> bool:
        """Longest-matching-prefix wins; allow beats disallow on ties
        (robotparser tie semantics for equal-length rules)."""
        best_len, best_allow = -1, True
        for rule in self.disallow:
            if rule and path.startswith(rule) and len(rule) > best_len:
                best_len, best_allow = len(rule), False
        for rule in self.allow:
            if rule and path.startswith(rule) and len(rule) >= best_len:
                best_len, best_allow = len(rule), True
        return best_allow


class RobotsTable:
    """Per-host rules; built from the robots parquet table (FIXTURES.md §3)
    or from raw robots.txt bodies.  Small — broadcast via ``ray.put`` once
    and read inside stages, never re-shipped per batch."""

    def __init__(self, rules: dict[str, HostRules] | None = None,
                 default_delay: float = 1.0):
        self.rules = rules or {}
        self.default_delay = default_delay

    @classmethod
    def from_arrow(cls, table, default_delay: float = 1.0) -> "RobotsTable":
        rules = {}
        for row in table.to_pylist():
            rules[row["host"]] = HostRules(
                host=row["host"],
                disallow=list(row.get("disallow") or []),
                allow=list(row.get("allow") or []),
                crawl_delay=row.get("crawl_delay"),
                sitemaps=list(row.get("sitemaps") or []),
            )
        return cls(rules, default_delay)

    def can_fetch(self, host: str, path: str) -> bool:
        rules = self.rules.get(host)
        return True if rules is None else rules.can_fetch(path)

    def delay(self, host: str) -> float:
        rules = self.rules.get(host)
        if rules is None or rules.crawl_delay is None:
            return self.default_delay
        # robots crawl-delay can only *raise* the politeness delay
        # (``utils/http.py:213-216``)
        return max(self.default_delay, rules.crawl_delay)

    def sitemaps(self, host: str) -> list[str]:
        rules = self.rules.get(host)
        return rules.sitemaps if rules else []


def parse_robots_txt(host: str, body: str | bytes) -> HostRules:
    """Parse a raw robots.txt body (``*`` user-agent section only, which is
    all the reference's parser consults; Sitemap lines are global, matching
    ``core/crawler.py:657-665``)."""
    if isinstance(body, (bytes, bytearray)):
        body = bytes(body).decode("utf-8", errors="replace")
    rules = HostRules(host=host)
    applies = False
    for raw_line in body.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key, value = key.strip().lower(), value.strip()
        if key == "sitemap":
            rules.sitemaps.append(value)
        elif key == "user-agent":
            applies = value == "*"
        elif applies and key == "disallow" and value:
            rules.disallow.append(value)
        elif applies and key == "allow" and value:
            rules.allow.append(value)
        elif applies and key == "crawl-delay":
            try:
                rules.crawl_delay = float(value)
            except ValueError:
                pass
    return rules


def parse_sitemap(body: bytes | str) -> tuple[str, list[str]]:
    """Parse one sitemap document.

    Returns ``(kind, urls)`` where kind is 'index' (urls are child sitemap
    URLs), 'xml' (urls are page URLs) or 'text' (line-per-URL fallback on
    XML parse error, '#' comments skipped) — parity with
    ``core/crawler.py:1302-1352``.
    """
    if isinstance(body, (bytes, bytearray)):
        text = bytes(body).decode("utf-8", errors="replace")
    else:
        text = body
    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        urls = [ln.strip() for ln in text.splitlines()
                if ln.strip() and not ln.strip().startswith("#")]
        return "text", urls
    child_sitemaps = [el.text.strip()
                      for el in root.findall(".//sm:sitemap/sm:loc", _SM_NS)
                      if el.text]
    if child_sitemaps:
        return "index", child_sitemaps
    page_urls = [el.text.strip()
                 for el in root.findall(".//sm:url/sm:loc", _SM_NS)
                 if el.text]
    return "xml", page_urls
