"""CLI entry point — the reference's ``main.py`` / ``scripts/`` surface
(``main.py:48-167``, ``scripts/incremental_crawl.py``,
``scripts/smart_crawler.py``) re-expressed over the Ray engine:

    python -m crawler_ray crawl   --corpus DIR --work DIR [--mode wave|strict]
                                  [--resume] [--max-pages N] [--max-depth N]
                                  [--respect-robots] [--no-sitemaps]
    python -m crawler_ray daemon  --corpus DIR --work DIR [--cycles N]
                                  [--minute-seconds S]
    python -m crawler_ray discover --corpus DIR [--out FILE]
    python -m crawler_ray gen     --out DIR [--pages N] [--hosts N]
                                  [--seed N] [--page-scale N]
    python -m crawler_ray curate  --sf-dir DIR --out DIR [--passes a,b,...]

Owns the Ray session when none is running (guarded init; library code
never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init() -> bool:
    """Guarded init; returns True when THIS call created the session (the
    CLI then owns shutdown — an already-running session, e.g. pytest's
    shared one, is left alone)."""
    import ray
    owned = not ray.is_initialized()
    if owned:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    return owned


def _shutdown(owned: bool = True):
    import ray
    if owned and ray.is_initialized():
        ray.shutdown()


def cmd_crawl(args) -> int:
    from crawler_ray.pipelines.crawl import CrawlConfig, CrawlEngine
    owned = _ray_init()
    try:
        cfg = CrawlConfig(max_depth=args.max_depth,
                          max_pages=args.max_pages,
                          respect_robots=args.respect_robots,
                          use_sitemaps=not args.no_sitemaps)
        engine = CrawlEngine(args.corpus, args.work, cfg)
        summary = engine.run(mode=args.mode, resume=args.resume)
        print(json.dumps(summary["stats"], default=str))
        return 0
    finally:
        _shutdown(owned)


def cmd_daemon(args) -> int:
    import os

    from crawler_ray.pipelines.crawl import CrawlConfig, CrawlEngine
    from crawler_ray.pipelines.daemon import SmartCrawlDaemon
    owned = _ray_init()
    try:
        engine = CrawlEngine(args.corpus, args.work, CrawlConfig())
        daemon = SmartCrawlDaemon(
            engine, os.path.join(args.work, "daemon_state.json"),
            minute_seconds=args.minute_seconds)
        out = daemon.run(max_cycles=args.cycles)
        print(json.dumps({"phase": out["phase"],
                          "state": out["state"]}, default=str))
        return 0
    finally:
        _shutdown(owned)


def cmd_discover(args) -> int:
    import pyarrow.parquet as pq

    from crawler_ray.ops.discovery import (discover_url_patterns,
                                           save_patterns)
    import os
    urls = pq.read_table(os.path.join(args.corpus, "pages"),
                         columns=["url"])["url"].to_pylist()
    pats = discover_url_patterns(sorted(set(urls)))
    if args.out:
        save_patterns(pats, args.out)
    print(json.dumps(pats, ensure_ascii=False))
    return 0


def cmd_gen(args) -> int:
    from crawler_ray.corpus import generate_corpus
    use_ray = args.pages > 5000
    if use_ray:
        owned = _ray_init()
    try:
        info = generate_corpus(args.out, n_pages=args.pages,
                               n_hosts=args.hosts, seed=args.seed,
                               use_ray=use_ray, page_scale=args.page_scale)
        print(json.dumps(info))
        return 0
    finally:
        if use_ray:
            _shutdown(owned)


_CURATE_PASSES = ("pii_scrub", "repetition_stats", "dataset_split",
                  "chunk_documents", "pack_manifest", "curate_corpus",
                  "contamination_check",
                  # selection layer (ops/filtering.py)
                  "line_dedup", "quality_filter", "source_quota",
                  "stratified_sample", "incremental_dedup",
                  "normalize_text", "shuffle_corpus",
                  # the fused five-stage chain (ONE plan, one sink —
                  # subsumes line_dedup/normalize/quality/exact-dedup/
                  # split when only the final survivor set is wanted)
                  "curate_pipeline")


def cmd_curate(args) -> int:
    """Run the training-data curation passes over a documents table and
    write each result as partitioned parquet under --out/<pass>/ — one
    directory per pass, so a failed run reruns only the missing passes
    (directories with a _SUCCESS marker are skipped; a directory left
    behind by a crashed pass — files but no marker — is cleared before
    the rewrite so the appending parquet writer cannot duplicate rows)."""
    import os
    import shutil

    from crawler_ray.ops import filtering, textstats
    owned = _ray_init()
    try:
        passes = (args.passes.split(",") if args.passes
                  else list(_CURATE_PASSES))
        unknown = [s for s in passes if s not in _CURATE_PASSES]
        if unknown:
            raise SystemExit(f"unknown curation pass(es): {unknown}; "
                             f"choose from {list(_CURATE_PASSES)}")
        done = {}
        for name in passes:
            out_dir = os.path.join(args.out, name)
            marker = os.path.join(out_dir, "_SUCCESS")
            if os.path.exists(marker):
                done[name] = "skipped (already complete)"
                continue
            # no marker but files present => a previous run died mid-write.
            # write_parquet APPENDS (per-run UUID filenames), so rerunning
            # over the partial output would duplicate rows — clear it first.
            if os.path.isdir(out_dir):
                shutil.rmtree(out_dir)
            fn = getattr(textstats, name, None) \
                or getattr(filtering, name)
            ds = fn(args.sf_dir)
            ds.write_parquet(out_dir)
            # a zero-row result writes NO files (and no directory —
            # the marker write below would crash); leave a typed empty
            # parquet so the pass directory is always readable
            os.makedirs(out_dir, exist_ok=True)
            import glob as _glob
            if not _glob.glob(os.path.join(out_dir, "*.parquet")):
                import pyarrow as pa
                import pyarrow.parquet as pq
                s = ds.schema(fetch_if_missing=True)
                if s is not None:
                    pq.write_table(
                        pa.schema(list(zip(s.names,
                                           s.types))).empty_table(),
                        os.path.join(out_dir, "empty-0.parquet"))
            with open(marker, "w"):
                pass
            done[name] = "written"
        print(json.dumps({"out": args.out, "passes": done}))
        return 0
    finally:
        _shutdown(owned)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="crawler_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl")
    c.add_argument("--corpus", required=True)
    c.add_argument("--work", required=True)
    c.add_argument("--mode", default="wave", choices=["wave", "strict"])
    c.add_argument("--resume", action="store_true")
    c.add_argument("--max-pages", type=int, default=None)
    c.add_argument("--max-depth", type=int, default=5)
    c.add_argument("--respect-robots", action="store_true")
    c.add_argument("--no-sitemaps", action="store_true")
    c.set_defaults(fn=cmd_crawl)

    d = sub.add_parser("daemon")
    d.add_argument("--corpus", required=True)
    d.add_argument("--work", required=True)
    d.add_argument("--cycles", type=int, default=1)
    d.add_argument("--minute-seconds", type=float, default=1.0)
    d.set_defaults(fn=cmd_daemon)

    v = sub.add_parser("discover")
    v.add_argument("--corpus", required=True)
    v.add_argument("--out", default=None)
    v.set_defaults(fn=cmd_discover)

    g = sub.add_parser("gen")
    g.add_argument("--out", required=True)
    g.add_argument("--pages", type=int, default=1000)
    g.add_argument("--hosts", type=int, default=1)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--page-scale", type=int, default=1)
    g.set_defaults(fn=cmd_gen)

    k = sub.add_parser("curate")
    k.add_argument("--sf-dir", required=True,
                   help="directory holding documents.parquet")
    k.add_argument("--out", required=True)
    k.add_argument("--passes", default=None,
                   help=f"comma list from {list(_CURATE_PASSES)} "
                        "(default: all)")
    k.set_defaults(fn=cmd_curate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
