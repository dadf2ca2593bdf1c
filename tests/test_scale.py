"""Skewed-corpus scale validation — env-gated (minutes-long).

``GRAFT_SCALE_TEST=1 python -m pytest tests/test_scale.py`` runs a
Zipf-skewed corpus (mega-host far above the forced commit range-split
threshold) through wave mode in BOTH seen modes and asserts full
admissions parity: identical trace row counts and an identical
order-independent value digest over (url, wave, priority, vts) — the
vts term pins the split path's politeness stamps too.  The full-size
evidence run (1.34M pages / 50k hosts) is ``tools/scale_run.py``; its
results are recorded in BASELINE.md.
"""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("GRAFT_SCALE_TEST"),
    reason="minutes-long skewed-scale run; set GRAFT_SCALE_TEST=1")


def _trace_digest(trace_path: str) -> tuple[int, int]:
    import duckdb
    return duckdb.sql(f"""
        SELECT count(*),
               sum(hash(url_norm || '|' || wave || '|' || priority
                        || '|' || round(fetch_vts, 6)))
        FROM read_parquet('{trace_path}/*.parquet')
    """).fetchone()


def test_skewed_bloom_exact_parity(ray_session, tmp_path):
    from crawler_ray.corpus import generate_corpus
    from crawler_ray.pipelines.crawl import CrawlConfig, CrawlEngine

    corpus = str(tmp_path / "corpus")
    # 5k Zipf hosts => mega-host ~13k pages, far above the forced
    # split threshold; bloom sized as in production defaults
    generate_corpus(corpus, n_pages=120_000, n_hosts=5_000, seed=42,
                    use_ray=True, page_scale=1)
    digests = {}
    for mode in ("exact", "bloom"):
        work = str(tmp_path / f"work_{mode}")
        eng = CrawlEngine(corpus, work,
                          CrawlConfig(seen_mode=mode,
                                      host_split_threshold=2_000))
        summary = eng.run(mode="wave")
        digests[mode] = _trace_digest(summary["trace_path"])
    assert digests["exact"][0] > 50_000        # the crawl really ran
    assert digests["exact"] == digests["bloom"]
