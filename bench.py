"""Benchmark harness.

Runs the headline crawl pipeline (wave mode over a cached ~10k-page
synthetic corpus — the BASELINE.json workload shape) plus the operator
suite over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1), and prints
ONE JSON line:

    {"metric": "...", "value": <headline crawl sec>, "unit": "sec",
     "queries": {...per-stage sec...}, "sf": ..., "num_cpus": N,
     "crawl": {...}}

``--scaling`` runs the same bench twice in fresh processes at N and 4N
CPUs (default 4 and 16 — on this single node, 32 workers saturate the
shared memory bus, which 4N independent nodes would not; see
BASELINE.md) and reports throughput at both plus the scaling
efficiency (the sandbox substitute for the N vs 4N node criterion,
SURVEY.md §4.3).  Override with GRAFT_SCALE_CPUS="8,32".

Env: RAY_GRAFT_CPUS (default 32), GRAFT_SF_DIR, GRAFT_BENCH_PAGES
(default 10000).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

def _bench_dirs(n_pages: int, scale: int) -> tuple[str, str]:
    # per-(size, scale) cache dirs: switching GRAFT_BENCH_PAGES or
    # GRAFT_PAGE_SCALE must not mix corpora
    return (f"/tmp/crawler_ray_bench/corpus_{n_pages}_s{scale}",
            f"/tmp/crawler_ray_bench/work_{n_pages}_s{scale}")


def run_bench() -> dict:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_pages = int(os.environ.get("GRAFT_BENCH_PAGES", "40000"))
    # scale 8 puts post HTML at ~10-15 KB — Common-Crawl-like page sizes,
    # so the crawl benchmark is extraction-bound the way production is
    page_scale = int(os.environ.get("GRAFT_PAGE_SCALE", "8"))

    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from crawler_ray.corpus import generate_corpus
    from crawler_ray.pipelines.crawl import CrawlConfig, CrawlEngine
    from crawler_ray.ops import crud, dedup, filtering, relational
    from crawler_ray.ops import similarity, textstats

    bench_corpus, bench_work = _bench_dirs(n_pages, page_scale)
    # corpus generation is cached across runs (not part of the measurement)
    generate_corpus(bench_corpus, n_pages=n_pages, n_hosts=4, seed=42,
                    use_ray=True, page_scale=page_scale)

    # warm the OS page cache so we measure compute+shuffle, not cold disk
    import pyarrow.dataset as pads
    for t in ("lineitem", "events", "documents", "embeddings"):
        pads.dataset(f"{sf_dir}/{t}.parquet").to_table()
    pads.dataset(os.path.join(bench_corpus, "pages")).to_table()

    timings: dict[str, float] = {}

    # -- headline: the crawl pipeline --------------------------------------
    # keep the cached corpus store (one-time bucketize); the engine wipes
    # its own wave/ output at start
    shutil.rmtree(os.path.join(bench_work, "wave"), ignore_errors=True)
    cfg = CrawlConfig(seen_shards=max(2, num_cpus // 4))
    t0 = time.time()
    engine = CrawlEngine(bench_corpus, bench_work, cfg)
    t_prep = time.time() - t0  # corpus store bucketize (one-time, resumable)
    t0 = time.time()
    summary = engine.run(mode="wave")
    crawl_sec = time.time() - t0
    visited = summary["stats"]["visited"]
    timings["crawl_wave"] = round(crawl_sec, 3)
    timings["corpus_bucketize"] = round(t_prep, 3)

    # -- operator suite over the driver tables -----------------------------
    suite = {
        "pricing_summary": lambda: relational.pricing_summary(sf_dir),
        "brand_revenue": lambda: relational.brand_revenue(sf_dir),
        "tumbling_window": lambda: relational.events_tumbling_window(sf_dir),
        "sessionize": lambda: relational.sessionize(sf_dir),
        "clicks_asof_views": lambda: relational.clicks_asof_views(sf_dir),
        "error_recent_activity":
            lambda: relational.error_recent_activity(sf_dir),
        "exact_dedup": lambda: dedup.exact_dedup(sf_dir),
        # ngram_jaccard_pairs is oracle-gated at sf0.01 but excluded here:
        # exact n-gram Jaccard is intentionally quadratic in docs-per-gram
        # and the low-entropy sf0.1 corpus makes that blow up (the
        # documented hot-gram cost; MinHash below is the scale path)
        "minhash_pairs": lambda: dedup.minhash_lsh_pairs(sf_dir),
        # full dedup decision: LSH pairs -> distributed min-label
        # propagation (includes Dataset.join rounds)
        "minhash_dedup_keep": lambda: dedup.minhash_dedup_keep(sf_dir),
        "simhash_pairs": lambda: dedup.simhash_pairs(sf_dir),
        "simhash_dedup_keep": lambda: dedup.simhash_dedup_keep(sf_dir),
        "embedding_dup_pairs": lambda: dedup.embedding_dup_pairs(sf_dir),
        "knn_bruteforce": lambda: similarity.knn_bruteforce(sf_dir),
        # both ANN paths build-or-reuse their persisted bucket index
        # (first run pays the one-time build; the manifest memoizes)
        "knn_ivf": lambda: similarity.knn_ivf(sf_dir),
        "knn_lsh": lambda: similarity.knn_lsh(sf_dir),
        "token_counts": lambda: textstats.token_counts(sf_dir),
        "lang_id": lambda: textstats.lang_id(sf_dir),
        "fingerprints": lambda: textstats.fingerprints(sf_dir),
        # model-backed classification (trains the seeded artifact on
        # first use into /tmp; subsequent runs only score)
        "classify_docs_model":
            lambda: textstats.classify_docs_model(sf_dir),
        # scored expert<->domain link table (two hash joins + aggregates)
        "expert_domain_links":
            lambda: relational.expert_domain_links(sf_dir),
        # keyed-store CRUD cycle: seed insert + mixed upsert + delete +
        # scan, all partition-local rewrites (state/tablestore.py)
        "table_crud": lambda: crud.table_crud(sf_dir),
        # curation passes (round 3): Arrow-RE2 PII scrub, repetition
        # signals, packing manifest (two-level prefix sum), train-vs-test
        # 3-gram decontamination (dedup + broadcast membership)
        "pii_scrub": lambda: textstats.pii_scrub(sf_dir),
        "repetition_stats": lambda: textstats.repetition_stats(sf_dir),
        "pack_manifest": lambda: textstats.pack_manifest(sf_dir),
        "contamination_check":
            lambda: textstats.contamination_check(sf_dir),
        # selection layer (round 4): CCNet line dedup (count pass +
        # broadcast rebuild), Gopher quality gate, exact percentiles
        "line_dedup": lambda: filtering.line_dedup(sf_dir),
        "quality_filter": lambda: filtering.quality_filter(sf_dir),
        "incremental_dedup":
            lambda: filtering.incremental_dedup(sf_dir),
        "shuffle_corpus": lambda: filtering.shuffle_corpus(sf_dir),
        "length_percentiles":
            lambda: filtering.length_percentiles(sf_dir),
        # the fused five-stage chain (round 5) — the driver query's
        # relaxed gate constants (Gopher defaults keep zero word-soup
        # docs, making the timing vacuous)
        "curate_pipeline": lambda: filtering.curate_pipeline(
            sf_dir, min_words=20, max_dup_frac_milli=600),
        # exact-substring (token-span) dedup scoring (round 5)
        "span_dedup": lambda: filtering.span_dedup(sf_dir,
                                                   span_tokens=20),
        # nearest-centroid assignment (round 5)
        "embedding_assign": lambda: similarity.embedding_assign(sf_dir),
        # GPT-2-style pre-tokenizer count (round 5)
        "bpe_token_counts": lambda: textstats.bpe_token_counts(sf_dir),
    }
    for name, fn in suite.items():
        t0 = time.time()
        result = fn()
        # consume the lazy pipeline (small results: to_pandas is the sink)
        n = len(result.to_pandas())
        timings[name] = round(time.time() - t0, 3)

    ray.shutdown()
    total_ops = round(sum(v for k, v in timings.items()
                          if k not in ("crawl_wave", "corpus_bucketize")), 3)
    return {
        "metric": "crawl_pipeline_sec",
        "value": round(crawl_sec, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "crawl": {"pages": n_pages, "page_scale": page_scale,
                  "visited": visited,
                  "urls_per_sec": round(visited / crawl_sec, 2),
                  "ops_suite_sec": total_ops},
    }


def run_scaling() -> dict:
    """Same job at N and 4N CPUs in fresh processes; efficiency =
    (rate@4N / rate@N) / 4.  Pair via GRAFT_SCALE_CPUS="N,4N"
    (default "4,16": on this single node all workers share one memory
    bus, and 32-way runs of the allocation-heavy extract stage are
    measurably bandwidth-bound — see BASELINE.md's variance analysis —
    which 4N independent nodes, bringing 4x the bandwidth, would not
    exhibit; the 4→16 pair stays under the saturation knee)."""
    lo, hi = (int(x) for x in
              os.environ.get("GRAFT_SCALE_CPUS", "4,16").split(","))
    assert hi == 4 * lo, "scaling pair must be N,4N"
    results = {}
    for ncpu in (lo, hi):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True)
        results[ncpu] = json.loads(out.stdout.strip().splitlines()[-1])
    r_lo, r_hi = results[lo], results[hi]
    rate_lo = r_lo["crawl"]["urls_per_sec"]
    rate_hi = r_hi["crawl"]["urls_per_sec"]
    return {
        "metric": "scaling_efficiency",
        "cpus": [lo, hi],
        f"sec_{lo}": r_lo["value"], f"sec_{hi}": r_hi["value"],
        f"urls_per_sec_{lo}": rate_lo, f"urls_per_sec_{hi}": rate_hi,
        "scaling_efficiency": round((rate_hi / rate_lo) / 4, 3),
        f"ops_suite_sec_{lo}": r_lo["crawl"]["ops_suite_sec"],
        f"ops_suite_sec_{hi}": r_hi["crawl"]["ops_suite_sec"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
