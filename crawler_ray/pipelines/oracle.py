"""Serial reference oracle — defines the crawl semantics the Ray engine
must reproduce.

The reference repo has no tests (SURVEY.md §5), so conformance is defined
by this single-threaded, deterministic executor of the reference's
frontier algorithm:

- admission (``core/crawler.py:685-749``): normalize, reject if seen /
  depth > max_depth / external host; sitemap jobs bypass the checks
  (``:702-717``).  *Deliberate deviation*: the reference checks
  ``visited ∪ in_progress`` which under thread races can visit a URL
  twice; we define seen-at-admission (every admitted URL is visited
  exactly once) — the standard frontier-dedup semantics the north rule's
  URL-seen filter implies.
- priority (``core/crawler.py:470-545``): weighted-mean policy scores,
  ``int()`` truncation.
- ordering: priority queue on ``(priority, seq)`` where ``seq`` is the
  global admission counter — the deterministic tie-break the reference's
  ``queue.PriorityQueue`` leaves to heap internals (``:54-65``).
- expansion (``core/crawler.py:855-901``): raw-HTML link extraction in
  document order, internal-only, pattern-based job_type, depth+1.
- sitemap handling (``core/crawler.py:1278-1365``): XML / index recursion
  (children depth+1, job_type sitemap) / text fallback; discovered page
  URLs admitted at depth=0 with job_type='page' (``:1327``).
- politeness: per-host virtual-time stamps, delay = max(default, robots
  crawl-delay) (``utils/http.py:200-226``), stamped at visit time (the
  reference waits *after* popping, so politeness never reorders).
- dedup-upsert (``core/storage.py:103-211``): first similarity_hash wins
  the insert (keeps its id/url/created), later duplicates update
  title/content/content_type/meta.
- robots enforcement is OFF by default — the reference hard-disables it
  (``core/crawler.py:602``); ``respect_robots=True`` enables
  longest-prefix rules at admission time.

``ordering='priority'`` is the reference-faithful global priority queue;
``ordering='bfs'`` is the wave semantics of the relaxed distributed mode
(visit order = wave-major, then (priority, url_norm) within a wave;
minimal-depth admission).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field
from urllib.parse import urlparse

import pyarrow.parquet as pq

from crawler_ray.functions.classify import classify_text
from crawler_ray.functions.extract import extract_links, extract_page
from crawler_ray.functions.patterns import (URLPatternClassifier,
                                            default_url_classifier)
from crawler_ray.functions.priority import (PriorityPolicyManager,
                                            default_policy_manager)
from crawler_ray.functions.text import similarity_hash
from crawler_ray.functions.urls import normalize_url
from crawler_ray.sources.robots import RobotsTable, parse_sitemap

__all__ = ["OracleResult", "oracle_crawl", "load_corpus_tables"]


@dataclass
class OracleResult:
    trace: list[dict] = field(default_factory=list)
    extracted: list[dict] = field(default_factory=list)
    content_items: list[dict] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    failed: list[dict] = field(default_factory=list)
    stats: dict = field(default_factory=dict)


def load_corpus_tables(corpus_dir: str):
    """Load the generator's tables into plain dicts (oracle scale)."""
    import os
    pages = pq.read_table(os.path.join(corpus_dir, "pages"))
    page_map = {u: h for u, h in zip(pages["url"].to_pylist(),
                                     pages["html"].to_pylist())}
    robots = RobotsTable.from_arrow(
        pq.read_table(os.path.join(corpus_dir, "robots.parquet")))
    sm = pq.read_table(os.path.join(corpus_dir, "sitemaps.parquet"))
    sitemap_map = {u: b for u, b in zip(sm["url"].to_pylist(),
                                        sm["body"].to_pylist())}
    seeds = pq.read_table(os.path.join(corpus_dir, "seeds.parquet"))
    seed_urls = seeds["url"].to_pylist()
    return page_map, robots, sitemap_map, seed_urls


def oracle_crawl(corpus_dir: str, ordering: str = "priority",
                 max_depth: int = 5, max_pages: int | None = None,
                 respect_robots: bool = False, use_sitemaps: bool = True,
                 default_delay: float = 1.0,
                 policies: PriorityPolicyManager | None = None,
                 patterns: URLPatternClassifier | None = None,
                 ner_enabled: bool = False) -> OracleResult:
    page_map, robots, sitemap_map, seed_urls = load_corpus_tables(corpus_dir)
    policies = policies or default_policy_manager()
    patterns = patterns or default_url_classifier()
    res = OracleResult()
    seen = res.seen
    heap: list[tuple] = []
    seq = 0
    last_vts: dict[str, float] = {}
    hash_store: dict[str, dict] = {}  # similarity_hash -> content_item row
    stats = {"admitted": 0, "skipped": 0, "robots_denied": 0,
             "fetch_misses": 0, "dup_updates": 0}

    def admit(url: str, depth: int, job_type: str | None,
              parent: str | None, parent_host: str | None) -> bool:
        nonlocal seq
        norm = normalize_url(url)
        is_sitemap = job_type == "sitemap"
        if not is_sitemap:
            if norm in seen:
                stats["skipped"] += 1
                return False
            if depth > max_depth:
                stats["skipped"] += 1
                return False
            host = urlparse(norm).netloc
            if parent_host is not None and host != parent_host:
                stats["skipped"] += 1
                return False
            if respect_robots and not robots.can_fetch(
                    host, urlparse(norm).path):
                stats["robots_denied"] += 1
                return False
        if job_type is None:
            job_type = patterns.job_type(norm)
        priority = policies.calculate_priority(norm, depth, job_type)
        seen.add(norm)
        heapq.heappush(heap, (priority, seq, norm, depth, job_type, parent))
        seq += 1
        stats["admitted"] += 1
        return True

    # -- seeding (core/crawler.py:1006-1022): sitemaps from robots if
    #    advertised, else the base URL ------------------------------------
    for seed in seed_urls:
        host = urlparse(seed).netloc
        sitemaps = robots.sitemaps(host) if use_sitemaps else []
        if sitemaps:
            for sm_url in sitemaps:
                admit(sm_url, 0, "sitemap", None, None)
        else:
            admit(seed, 0, "page", None, None)

    def visit(norm: str, depth: int, job_type: str, priority: int,
              parent: str | None) -> list[tuple]:
        """Process one popped job; returns new admissions as argument
        tuples (url, depth, job_type, parent, parent_host).  Visit order
        is assigned at trace-append time (failed fetches consume no
        order slot)."""
        order = len(res.trace)
        host = urlparse(norm).netloc
        last = last_vts.get(host)
        vts = 0.0 if last is None else last + robots.delay(host)
        last_vts[host] = vts

        if job_type == "sitemap":
            body = sitemap_map.get(norm)
            if body is None:
                res.failed.append({"url_norm": norm, "error": "fetch miss",
                                   "job_type": job_type})
                stats["fetch_misses"] += 1
                return []
            kind, urls = parse_sitemap(body)
            res.trace.append({"order": order, "url_norm": norm,
                              "depth": depth, "job_type": job_type,
                              "priority": priority, "parent_url": parent,
                              "fetch_vts": vts})
            if kind == "index":
                return [(u, depth + 1, "sitemap", norm, None) for u in urls]
            return [(u, 0, "page", norm, None) for u in urls]

        html = page_map.get(norm)
        if html is None:
            res.failed.append({"url_norm": norm, "error": "fetch miss",
                               "job_type": job_type})
            stats["fetch_misses"] += 1
            return []
        res.trace.append({"order": order, "url_norm": norm, "depth": depth,
                          "job_type": job_type, "priority": priority,
                          "parent_url": parent, "fetch_vts": vts})
        rec = extract_page(html, norm, job_type, ner_enabled=ner_enabled)
        cls = classify_text(rec["content"])
        rec["content_type"] = cls["content_type"]["content_type"]
        rec["domains"] = cls["domains"]["domains"]
        rec["order"] = order
        res.extracted.append(rec)

        # dedup-upsert (core/storage.py:128-211)
        if rec["content"]:
            h = similarity_hash(rec["content"])
            existing = hash_store.get(h)
            meta = {"date": rec["date"], "author": rec["author"],
                    "entities": rec["entities"]}
            if existing is None:
                hash_store[h] = {
                    "id": len(hash_store) + 1, "url": norm,
                    "title": rec["title"], "content": rec["content"],
                    "content_type": rec["content_type"],
                    "similarity_hash": h, "meta_data": meta,
                    "domains": rec["domains"], "status": "active",
                    "first_order": order, "last_order": order,
                }
            else:
                existing.update(title=rec["title"], content=rec["content"],
                                content_type=rec["content_type"],
                                meta_data=meta, domains=rec["domains"],
                                last_order=order)
                stats["dup_updates"] += 1

        if depth < max_depth:
            links = extract_links(html, norm, internal_only=True)
            return [(u, depth + 1, None, norm, host) for u in links]
        return []

    if ordering == "priority":
        while heap:
            if max_pages is not None and len(res.trace) >= max_pages:
                break
            priority, _, norm, depth, job_type, parent = heapq.heappop(heap)
            for args in visit(norm, depth, job_type, priority, parent):
                admit(*args)
    elif ordering == "bfs":
        wave = sorted(heap)  # wave 0
        heap.clear()
        budget_hit = False
        while wave and not budget_hit:
            wave.sort(key=lambda e: (e[0], e[2]))  # (priority, url_norm)
            next_args: list[tuple] = []
            for priority, _, norm, depth, job_type, parent in wave:
                if max_pages is not None and len(res.trace) >= max_pages:
                    budget_hit = True
                    break
                next_args.extend(
                    visit(norm, depth, job_type, priority, parent))
            for args in next_args:
                admit(*args)
            wave = heap[:]
            heap.clear()
    else:
        raise ValueError(f"unknown ordering {ordering!r}")

    res.content_items = sorted(hash_store.values(),
                               key=lambda r: r["first_order"])
    stats["visited"] = len(res.trace)
    res.stats = stats
    return res
