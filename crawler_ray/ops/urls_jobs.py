"""Crawl-function operators made SQL-checkable: URL canonicalization,
priority scoring, URL-part statistics — run over URLs synthesized
deterministically from the documents table (no external data; the oracle
SQL constructs the identical URLs).

These exercise the *engine* code paths (``functions/urls.py``,
``functions/priority.py`` vectorized batch calc, A5 url-part stats) on
driver-checkable inputs; the crawl pipeline itself is verified against the
serial oracle in pytest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from crawler_ray.functions.priority import default_policy_manager
from crawler_ray.functions.urls import normalize_url_batch

__all__ = ["synth_urls", "url_normalize", "job_priorities",
           "url_part_stats"]

_SEGS = ["category", "post", "tag", "page", "about", "item", "archive"]


def _rd():
    import ray.data as rd
    return rd


def synth_url_batch(doc_ids) -> list[str]:
    """Deterministic URL per doc_id.  The SQL twin (see oracle) is::

        'https://site' || (doc_id % 7) || '.example/' ||
        seg1 || '/' || (doc_id % 97) || '-x' ||
        CASE WHEN doc_id % 3 = 0 THEN '?ref=feed' ELSE '' END ||
        CASE WHEN doc_id % 5 = 0 THEN '#frag'    ELSE '' END

    with seg1 = _SEGS[doc_id % 7].
    """
    out = []
    for i in doc_ids:
        i = int(i)
        url = (f"https://site{i % 7}.example/{_SEGS[i % 7]}/"
               f"{i % 97}-x")
        if i % 3 == 0:
            url += "?ref=feed"
        if i % 5 == 0:
            url += "#frag"
        out.append(url)
    return out


def synth_urls(sf_dir: str):
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])

    def make(t: pa.Table) -> pa.Table:
        urls = synth_url_batch(t["doc_id"].to_pylist())
        return t.append_column("url", pa.array(urls, pa.string()))

    return ds.map_batches(make, batch_format="pyarrow")


def url_normalize(sf_dir: str):
    """M1 canonicalization (``utils/http.py:512-531`` parity): strip
    query/params/fragment, keep scheme://netloc/path.
    Output: (doc_id, url, url_norm)."""
    ds = synth_urls(sf_dir)

    def norm(t: pa.Table) -> pa.Table:
        normed = normalize_url_batch(t["url"].to_pylist())
        return t.append_column("url_norm", pa.array(normed, pa.string()))

    return ds.map_batches(norm, batch_format="pyarrow")


def job_priorities(sf_dir: str):
    """Vectorized default-policy priority (``core/crawler.py:470-545``
    parity: weighted mean, int() truncation) over synthesized jobs:
    depth = doc_id % 6, job_type by doc_id % 4.
    Output: (doc_id, depth, job_type, priority)."""
    mgr = default_policy_manager()
    jt_map = ["page", "list", "detail", "sitemap"]
    ds = url_normalize(sf_dir)

    def prio(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_pylist())
        depths = (ids % 6).astype(np.int64)
        job_types = [jt_map[i % 4] for i in ids]
        urls = t["url_norm"].to_pylist()
        p = mgr.calculate_priority_batch(urls, depths, job_types)
        return pa.table({"doc_id": t["doc_id"],
                         "depth": pa.array(depths, pa.int64()),
                         "job_type": pa.array(job_types, pa.string()),
                         "priority": pa.array(p.astype(np.int64),
                                              pa.int64())})

    return ds.map_batches(prio, batch_format="pyarrow")


def url_part_stats(sf_dir: str):
    """A5 URL-part distinct stats (``core/structure_discovery.py:750-854``
    semantics): per path position, count distinct values; classify the
    position fixed (<10 distinct) vs variable, numeric when >70% of
    values are digit-leading.  Output: (position, n_distinct, n_urls,
    part_kind)."""
    from ray.data.aggregate import Count

    ds = url_normalize(sf_dir)

    def explode(t: pa.Table) -> pa.Table:
        pos_l, val_l = [], []
        for u in t["url_norm"].to_pylist():
            path = u.split(".example", 1)[1]
            parts = [p for p in path.split("/") if p]
            for i, p in enumerate(parts):
                pos_l.append(i)
                val_l.append(p)
        return pa.table({"position": pa.array(pos_l, pa.int64()),
                         "value": pa.array(val_l, pa.string())})

    parts = ds.map_batches(explode, batch_format="pyarrow")
    import pandas as pd

    def per_position(g: pd.DataFrame) -> pd.DataFrame:
        distinct = g["value"].nunique()
        n = len(g)
        numeric = (g["value"].str[:1].str.isdigit()).mean()
        if distinct < 10:
            kind = "fixed"
        elif numeric > 0.7:
            kind = "numeric"
        else:
            kind = "variable"
        return pd.DataFrame([{"position": g["position"].iloc[0],
                              "n_distinct": distinct, "n_urls": n,
                              "part_kind": kind}])

    return parts.groupby("position").map_groups(per_position,
                                                batch_format="pandas")
