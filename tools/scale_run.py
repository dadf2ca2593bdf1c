"""Large skewed-corpus validation run (round-3 evidence item).

Generates a ~1.34M-page corpus over 50k Zipf hosts (mega-host ~88k
pages), crawls it in wave mode with the host commit range-split FORCED
(host_split_threshold=20_000 — the mega-host's sitemap wave admits far
more than that in one commit), and reports the summary plus a
value-digest of the full trace (wave, priority, url, vts) so the bloom
and exact seen-mode legs can be compared for admissions parity.

Usage:  PYTHONPATH=/root/repo python tools/scale_run.py bloom|exact
Output: one JSON line.  Scratch under /tmp (corpus is reused between
legs via the generator's manifest cache).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

N_PAGES = int(os.environ.get("GRAFT_SCALE_PAGES", "1000000"))
N_HOSTS = int(os.environ.get("GRAFT_SCALE_HOSTS", "50000"))
SPLIT = int(os.environ.get("GRAFT_SCALE_SPLIT", "20000"))


def trace_digest(trace_path: str) -> dict:
    """Order-independent value digest over the full trace."""
    import duckdb
    row = duckdb.sql(f"""
        SELECT count(*) AS n,
               sum(hash(url_norm || '|' || wave || '|' || priority
                        || '|' || round(fetch_vts, 6))) AS digest
        FROM read_parquet('{trace_path}/*.parquet')
    """).fetchone()
    return {"trace_rows": int(row[0]), "trace_digest": int(row[1]) % (1 << 63)}


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "bloom"
    assert mode in ("bloom", "exact")
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")

    from crawler_ray.corpus import generate_corpus
    from crawler_ray.pipelines.crawl import CrawlConfig, CrawlEngine

    corpus = "/tmp/scale_corpus"
    t0 = time.time()
    info = generate_corpus(corpus, n_pages=N_PAGES, n_hosts=N_HOSTS,
                           seed=42, use_ray=True, page_scale=1)
    t_gen = time.time() - t0

    work = f"/tmp/scale_work_{mode}"
    shutil.rmtree(work, ignore_errors=True)
    cfg = CrawlConfig(seen_mode=mode, host_split_threshold=SPLIT)
    eng = CrawlEngine(corpus, work, cfg)
    t0 = time.time()
    summary = eng.run(mode="wave")
    t_crawl = time.time() - t0

    stats = summary["stats"]
    out = {
        "mode": mode, "n_pages_param": N_PAGES, "n_hosts": N_HOSTS,
        "corpus_pages": info.get("n_plans"),
        "host_split_threshold": SPLIT,
        "sec_generate": round(t_gen, 1), "sec_crawl": round(t_crawl, 1),
        "visited": stats["visited"], "admitted": stats["admitted"],
        "seen": stats.get("seen"), "waves": stats["waves"],
        "urls_per_sec": round(stats["visited"] / max(t_crawl, 1e-9), 1),
        **trace_digest(summary["trace_path"]),
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
