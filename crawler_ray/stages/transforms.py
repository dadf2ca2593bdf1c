"""map_batches stage functions for the crawl pipeline.

All stages are Arrow-native (``batch_format="pyarrow"``): zero-copy from
the object store, hash/priority work vectorized with numpy, HTML parsing
per row (inherently row-wise, the cost driver — everything around it stays
columnar).  Stateless stages are plain functions (elastic Ray tasks);
stages with meaningful per-worker state (a model, a seen-pool handle) are
callable classes for ``map_batches(Cls, concurrency=N)`` actor pools.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from crawler_ray.functions.classify import classify_text
from crawler_ray.functions.extract import extract_links, extract_page
from crawler_ray.functions.patterns import URLPatternClassifier
from crawler_ray.functions.priority import PriorityPolicyManager
from crawler_ray.functions.text import (normalize_persian_text,
                                        similarity_hash)
from crawler_ray.functions.urls import (host_hash64_batch,
                                        normalize_url_batch, url_sha1_batch)

__all__ = ["canonicalize_batch", "frontier_candidate_batch",
           "extract_classify_batch", "EXTRACTED_FIELDS"]


def canonicalize_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """URL canonicalization (M1): reference-parity normalize
    (``utils/http.py:512-531``) + SHA-1 host/url hashes per the
    north-star.  Adds url_norm / host / host_hash / url_digest."""
    urls = batch[url_col].to_pylist()
    norm = normalize_url_batch(urls)
    hosts = [u.split("/", 3)[2] if "//" in u else "" for u in norm]
    return (batch
            .append_column("url_norm", pa.array(norm, pa.string()))
            .append_column("host", pa.array(hosts, pa.string()))
            .append_column("host_hash",
                           pa.array(host_hash64_batch(hosts), pa.uint64()))
            .append_column("url_digest",
                           pa.array(url_sha1_batch(norm), pa.binary())))


def frontier_candidate_batch(batch: pa.Table,
                             patterns: URLPatternClassifier,
                             policies: PriorityPolicyManager,
                             max_depth: int) -> pa.Table:
    """Link rows -> admissible frontier candidates.

    Input columns: link (raw href, absolute), parent_url, parent_host,
    depth (candidate depth).  Applies the admission filters that need no
    shared state (same-host, depth ≤ max — ``core/crawler.py:705-717``),
    assigns job_type from the pattern config and the vectorized priority.
    Seen-filtering happens later against the URL-seen shards.
    """
    links = batch["link"].to_pylist()
    norm = normalize_url_batch(links)
    hosts = [u.split("/", 3)[2] if "//" in u else "" for u in norm]
    parent_hosts = batch["parent_host"].to_pylist()
    depths = batch["depth"].to_numpy(zero_copy_only=False)
    keep = np.array([h == p for h, p in zip(hosts, parent_hosts)],
                    dtype=bool) & (depths <= max_depth)

    out = (batch
           .append_column("url_norm", pa.array(norm, pa.string()))
           .append_column("host", pa.array(hosts, pa.string()))
           .filter(pa.array(keep)))
    if out.num_rows == 0:
        return _empty_candidates()

    norm_k = out["url_norm"].to_pylist()
    hosts_k = out["host"].to_pylist()
    depths_k = out["depth"].to_numpy(zero_copy_only=False)
    job_types = patterns.job_type_batch(norm_k)
    priorities = policies.calculate_priority_batch(norm_k, depths_k,
                                                   job_types)
    return pa.table({
        "url_norm": pa.array(norm_k, pa.string()),
        "host": pa.array(hosts_k, pa.string()),
        "host_hash": pa.array(host_hash64_batch(hosts_k), pa.uint64()),
        "url_digest": pa.array(url_sha1_batch(norm_k), pa.binary()),
        "depth": pa.array(depths_k.astype(np.int32), pa.int32()),
        "job_type": pa.array(job_types, pa.string()),
        "priority": pa.array(priorities, pa.int32()),
        "parent_url": out["parent_url"],
    })


def _empty_candidates() -> pa.Table:
    return pa.table({
        "url_norm": pa.array([], pa.string()),
        "host": pa.array([], pa.string()),
        "host_hash": pa.array([], pa.uint64()),
        "url_digest": pa.array([], pa.binary()),
        "depth": pa.array([], pa.int32()),
        "job_type": pa.array([], pa.string()),
        "priority": pa.array([], pa.int32()),
        "parent_url": pa.array([], pa.string()),
    })


EXTRACTED_FIELDS = [
    ("url_norm", pa.string()),
    ("job_type", pa.string()),
    ("title", pa.string()),
    ("content", pa.large_string()),
    ("date", pa.string()),
    ("author", pa.string()),
    ("entities_json", pa.string()),
    ("similarity_hash", pa.string()),
    ("content_type", pa.string()),
    ("domains", pa.list_(pa.string())),
    ("links", pa.list_(pa.string())),
    ("n_list_items", pa.int32()),
    ("n_related_links", pa.int32()),
    ("fetch_ok", pa.bool_()),
    ("sm_kind", pa.string()),
]


def extract_classify_batch(batch: pa.Table, ner_enabled: bool = False,
                           classify: bool = True,
                           with_links: bool = True) -> pa.Table:
    """The core extraction stage (M5-M13) + keyword classification + raw
    link extraction (M2) in one pass over each page's HTML.  The page is
    parsed ONCE and the tree shared: link extraction (which only reads)
    runs before the mutating ``extract_page`` — byte-identical to the
    reference's two separate parses (``core/crawler.py:856`` raw link soup
    vs ``core/content_extractor.py:176`` cleaned extraction soup) at half
    the parse cost.  html may be null (fetch miss -> fetch_ok False,
    empty fields)."""
    import json

    urls = batch["url_norm"].to_pylist()
    htmls = batch["html"].to_pylist()
    job_types = (batch["job_type"].to_pylist()
                 if "job_type" in batch.column_names else [None] * len(urls))

    from crawler_ray.sources.robots import parse_sitemap

    cols = {name: [] for name, _ in EXTRACTED_FIELDS}
    for url, html, jt in zip(urls, htmls, job_types):
        cols["url_norm"].append(url)
        cols["job_type"].append(jt)
        if jt == "sitemap":
            # sitemap rows ride the same fetch join; "extraction" is the
            # sitemap parse (core/crawler.py:1302-1352) with discovered
            # URLs in the links column
            kind, found = parse_sitemap(html) if html is not None else ("", [])
            for name in ("title", "content", "date", "author"):
                cols[name].append("")
            cols["entities_json"].append("{}")
            cols["similarity_hash"].append(None)
            cols["content_type"].append("other")
            cols["domains"].append([])
            cols["links"].append(found)
            cols["n_list_items"].append(0)
            cols["n_related_links"].append(0)
            cols["fetch_ok"].append(html is not None)
            cols["sm_kind"].append(kind)
            continue
        if html is None:
            rec = None
            raw_links = []
        else:
            # parse ONCE per page: the reference parses twice (raw link
            # soup vs cleaned extraction soup, ``core/crawler.py:856`` vs
            # ``core/content_extractor.py:176``), but link extraction only
            # READS the raw tree, so running it before the mutating
            # extraction on a shared tree is byte-identical and saves a
            # full HTML parse per page
            from crawler_ray.htmlmini import parse_html
            root = parse_html(html)
            raw_links = (extract_links(root, url, internal_only=True)
                         if with_links else [])
            rec = extract_page(html, url, jt, ner_enabled=ner_enabled,
                               root=root)
        cols["sm_kind"].append("")
        if rec is None:
            for name in ("title", "content", "date", "author"):
                cols[name].append("")
            cols["entities_json"].append("{}")
            cols["similarity_hash"].append(None)
            cols["content_type"].append("other")
            cols["domains"].append([])
            cols["links"].append([])
            cols["n_list_items"].append(0)
            cols["n_related_links"].append(0)
            cols["fetch_ok"].append(False)
            continue
        cols["title"].append(rec["title"])
        cols["content"].append(rec["content"])
        cols["date"].append(rec["date"])
        cols["author"].append(rec["author"])
        cols["entities_json"].append(json.dumps(rec["entities"],
                                                ensure_ascii=False,
                                                sort_keys=True))
        if classify:
            # normalize ONCE per page and share: the similarity hash and
            # both classifier score families consume the same normalized
            # text (identical results — see similarity_hash's docstring
            # for the prefix/full equivalence argument)
            normed = normalize_persian_text(rec["content"])
            cols["similarity_hash"].append(
                similarity_hash(rec["content"], normalized=normed))
            cls = classify_text(rec["content"], normalized=normed)
            cols["content_type"].append(cls["content_type"]["content_type"])
            cols["domains"].append(cls["domains"]["domains"])
        else:
            # no classification -> the cheaper prefix-normalize path
            cols["similarity_hash"].append(similarity_hash(rec["content"]))
            cols["content_type"].append("other")
            cols["domains"].append([])
        cols["links"].append(raw_links)
        cols["n_list_items"].append(len(rec["list_items"]))
        cols["n_related_links"].append(len(rec["related_links"]))
        cols["fetch_ok"].append(True)

    arrays = [pa.array(cols[name], type=typ)
              for name, typ in EXTRACTED_FIELDS]
    out = pa.Table.from_arrays(arrays,
                               names=[n for n, _ in EXTRACTED_FIELDS])
    # carry through frontier metadata columns (depth, priority, parent...);
    # all-None columns degrade to Arrow null type through pandas blocks —
    # pin them back to string so per-wave part schemas unify
    for name in batch.column_names:
        if name not in out.column_names and name not in ("html", "url"):
            col = batch[name]
            if pa.types.is_null(col.type):
                col = col.cast(pa.string())
            out = out.append_column(name, col)
    return out
