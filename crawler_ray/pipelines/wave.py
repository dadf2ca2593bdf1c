"""Relaxed wave mode — the scale-out BFS execution of the crawl.

Each wave is one lazy Ray Dataset pipeline (streaming executor,
backpressure, no driver materialization of page content):

    frontier_k (parquet)
      -> groupby(host).map_groups:  politeness vts stamps   [shuffle: host]
      -> groupby(bucket).map_groups: fetch join             [shuffle: tiny
                                     (corpus bucket read)    frontier rows]
      -> map_batches: extract + classify + link extraction  [the hot stage]
      -> write_parquet wave_k/extracted (trace is a column-pruned view)
    candidates: read extracted -> explode links -> admission filters
      -> groupby(url_norm): in-wave first-discoverer dedup  [shuffle]
      -> URL-seen actor pool check_and_add (batched RPC per shard)
      -> write_parquet frontier_{k+1}

Visit order is (wave, priority, url_norm) — deterministic and
parallelism-invariant; it matches the serial oracle's ``ordering='bfs'``
semantics exactly (same admission rules, same first-discoverer
tie-break (parent_priority, parent_url, link_index), same per-host
virtual-time politeness stamps).  The driver only ever touches per-host
counts, manifests and row counts.

Checkpoint/resume: per-wave manifest (counts + URL-seen shard snapshots +
politeness clocks).  ``resume=True`` restores from the last complete wave
and continues; completed waves are skipped wholesale.
"""

from __future__ import annotations

import json
import os
import shutil
from urllib.parse import urlparse

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from crawler_ray.functions.urls import (host_hash64_batch,
                                        normalize_url_batch, url_sha1_batch)
from crawler_ray.sources.corpus_store import bucket_of_url
from crawler_ray.state.url_seen import URLSeenPool

__all__ = ["run_wave_mode"]

FRONTIER_SCHEMA = pa.schema([
    ("url_norm", pa.string()), ("host", pa.string()),
    ("host_hash", pa.uint64()), ("url_digest", pa.binary()),
    ("depth", pa.int32()), ("job_type", pa.string()),
    ("priority", pa.int32()), ("parent_url", pa.string()),
])


def _frontier_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pydict(
        {n: [r[n] for r in rows] for n in FRONTIER_SCHEMA.names},
        schema=FRONTIER_SCHEMA)


def run_wave_mode(engine, resume: bool = False) -> dict:
    import ray
    import ray.data as rd
    import pandas as pd

    cfg = engine.cfg
    robots = engine.robots
    store = engine.store
    patterns = cfg.patterns
    policies = cfg.policies
    out_dir = os.path.join(engine.work_dir, "wave")

    from ray.data import DataContext
    ctx = DataContext.get_current()
    prev_block_size = ctx.target_max_block_size
    ctx.target_max_block_size = cfg.target_block_size

    from crawler_ray.state.politeness import PolitenessCore
    politeness = PolitenessCore(robots, cfg.default_delay,
                                cfg.respect_robots)
    pool = URLSeenPool(num_shards=cfg.seen_shards, mode=cfg.seen_mode)
    stats = {"waves": 0, "visited": 0, "admitted": 0, "fetch_misses": 0}

    start_wave = 0
    if resume and os.path.isdir(out_dir):
        done = sorted(
            int(d.split("-")[1]) for d in os.listdir(out_dir)
            if d.startswith("wave-")
            and os.path.exists(os.path.join(out_dir, d, "manifest.json")))
        # a wave is resumable-from only if its successor frontier survived
        # (or it was the terminal wave); walk back until that holds
        pick = None
        for last in reversed(done):
            with open(os.path.join(out_dir, f"wave-{last:04d}",
                                   "manifest.json")) as f:
                manifest = json.load(f)
            nxt = os.path.join(out_dir, f"wave-{last + 1:04d}", "frontier")
            if manifest["next_frontier_rows"] == 0 or os.path.exists(nxt):
                pick = (last, manifest)
                break
        if pick is not None:
            last, manifest = pick
            pool.restore(manifest["seen_snapshot"])
            politeness.restore(manifest["politeness"])
            stats = manifest["stats"]
            start_wave = last + 1
            # scrub stale partial output beyond the resume point, keeping
            # only the next wave's frontier
            for d in os.listdir(out_dir):
                if not d.startswith("wave-"):
                    continue
                idx = int(d.split("-")[1])
                wdir = os.path.join(out_dir, d)
                if idx == start_wave:
                    for sub in os.listdir(wdir):
                        if sub != "frontier":
                            shutil.rmtree(os.path.join(wdir, sub),
                                          ignore_errors=True)
                elif idx > start_wave:
                    shutil.rmtree(wdir, ignore_errors=True)
    if start_wave == 0:
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(out_dir, exist_ok=True)
        _seed_wave0(engine, pool, out_dir)

    seen_pool_ref = ray.put(pool)  # actor handles serialize by reference
    max_waves = cfg.max_depth + 10  # sitemap chains extend past depth

    for wave in range(start_wave, max_waves + 1):
        wave_dir = os.path.join(out_dir, f"wave-{wave:04d}")
        frontier_path = os.path.join(wave_dir, "frontier")
        if not os.path.exists(frontier_path):
            break
        n_frontier = pads.dataset(frontier_path,
                                  format="parquet").count_rows()
        if n_frontier == 0:
            break
        if cfg.max_pages is not None and stats["visited"] >= cfg.max_pages:
            break

        # -- politeness bases: per-host counts (driver-side column scan of
        #    the small frontier file; no Ray execution needed) ------------
        host_col = pads.dataset(frontier_path, format="parquet").to_table(
            columns=["host"])["host"]
        vc = host_col.value_counts()
        bases = {}
        for sv in vc:
            host = sv["values"].as_py()
            base, delay = politeness.bulk_advance(host,
                                                  sv["counts"].as_py())
            bases[host] = (base, delay)
        bases_ref = ray.put(bases)
        num_buckets = store.num_buckets
        bucket_root = store.root

        def add_fetch_bucket(t: pa.Table) -> pa.Table:
            hh = t["host_hash"].to_numpy(zero_copy_only=False)
            b = (hh % np.uint64(num_buckets)).astype(np.int32)
            return t.append_column("fetch_bucket", pa.array(b, pa.int32()))

        def stamp_fetch(group: pd.DataFrame) -> pd.DataFrame:
            """Fused politeness stamp + simulated fetch for one
            host-bucket: the corpus is bucketed by hash(host), so a
            bucket holds whole hosts — per-host vts ranks computed here
            equal the wave-global per-host ranks."""
            import pyarrow.compute as pc
            import pyarrow.dataset as pads_w
            b = ray.get(bases_ref)
            group = group.sort_values(["priority", "url_norm"],
                                      kind="mergesort")
            rank = group.groupby("host", sort=False).cumcount()
            base_arr = np.array([b[h][0] for h in group["host"]])
            delay_arr = np.array([b[h][1] for h in group["host"]])
            group["fetch_vts"] = base_arr + delay_arr * rank.to_numpy()

            bucket = int(group["fetch_bucket"].iloc[0])
            path = os.path.join(bucket_root, f"bucket={bucket:04d}")
            dset = pads_w.dataset(path, format="parquet")
            urls = group["url_norm"].tolist()
            fetched = dset.to_table(columns=["url", "html"],
                                    filter=pc.field("url").isin(urls))
            corpus_df = fetched.to_pandas().rename(
                columns={"url": "url_norm"})
            merged = group.merge(corpus_df, on="url_norm", how="left")
            merged["status_code"] = np.where(merged["html"].notna(),
                                             200, 404)
            return merged.drop(columns=["fetch_bucket"])

        import time as _time
        t_wave0 = _time.time()
        extracted_dir = os.path.join(wave_dir, "extracted")
        ds = rd.read_parquet(frontier_path)
        ds = ds.map_batches(add_fetch_bucket, batch_format="pyarrow")
        ds = ds.groupby("fetch_bucket").map_groups(stamp_fetch,
                                                   batch_format="pandas")
        ds = ds.map_batches(_ExtractFn(cfg.classify, cfg.ner_enabled, wave),
                            batch_format="pyarrow",
                            batch_size=cfg.extract_batch_size)
        # the whole wave runs as ONE streaming execution: extracted rows
        # are spilled to parquet as a side effect (atomic, deterministic
        # part names -> task retries overwrite instead of duplicating) and
        # only the link columns continue to the candidate stages
        ds = ds.map_batches(_SpillExtracted(extracted_dir),
                            batch_format="pyarrow")

        # -- candidates -> next frontier ----------------------------------
        next_dir = os.path.join(out_dir, f"wave-{wave + 1:04d}", "frontier")
        cand = ds.map_batches(_explode_links, batch_format="pyarrow")
        cand = cand.map_batches(
            _CandidateFn(patterns, policies, cfg.max_depth,
                         robots if cfg.respect_robots else None),
            batch_format="pyarrow")

        # in-wave first-discoverer dedup: shuffle on a COARSE url-hash
        # bucket (2 per CPU slot), then a vectorized pandas
        # sort+drop_duplicates inside each bucket — grouping on url_norm
        # directly would pay Ray's per-group cost for thousands of
        # single-row groups
        n_dedup_buckets = max(8, cfg.seen_shards * 4)

        def add_dedup_bucket(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.append_column("dedup_bucket",
                                       pa.array([], pa.int32()))
            b = [bucket_of_url(u, n_dedup_buckets)
                 for u in t["url_norm"].to_pylist()]
            return t.append_column("dedup_bucket", pa.array(b, pa.int32()))

        def pick_winners(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["url_norm", "parent_priority", "parent_url",
                               "link_index"], kind="mergesort")
            g = g.drop_duplicates(subset=["url_norm"], keep="first")
            return g.drop(columns=["dedup_bucket"])

        cand = cand.map_batches(add_dedup_bucket, batch_format="pyarrow")
        cand = cand.groupby("dedup_bucket").map_groups(
            pick_winners, batch_format="pandas")

        def seen_filter(t: pa.Table) -> pa.Table:
            p = ray.get(seen_pool_ref)
            if t.num_rows == 0:
                return t
            mask = p.check_and_add(t["url_digest"].to_pylist(),
                                   t["host_hash"].to_pylist())
            return t.filter(pa.array(mask))

        cand = cand.map_batches(seen_filter, batch_format="pyarrow")
        cand = cand.map_batches(
            lambda t: t.select(FRONTIER_SCHEMA.names),
            batch_format="pyarrow")
        cand.write_parquet(next_dir)
        t_wave = _time.time() - t_wave0
        # an all-empty dataset writes no files at all
        n_next = (pads.dataset(next_dir, format="parquet").count_rows()
                  if os.path.isdir(next_dir) and os.listdir(next_dir) else 0)
        stats["admitted"] += n_next

        ext = pads.dataset(extracted_dir, format="parquet")
        n_ok = ext.count_rows(filter=(pads.field("fetch_ok") == True))  # noqa: E712
        stats["visited"] += n_ok
        stats["fetch_misses"] += n_frontier - n_ok
        stats["waves"] = wave + 1

        # -- manifest + snapshots (lineage for resume) --------------------
        snap_dir = os.path.join(wave_dir, "seen_snapshot")
        pool.snapshot(snap_dir)
        with open(os.path.join(wave_dir, "manifest.json"), "w") as f:
            json.dump({"wave": wave, "frontier_rows": n_frontier,
                       "visited_rows": n_ok, "next_frontier_rows": n_next,
                       "sec_wave": round(t_wave, 3),
                       "seen_snapshot": snap_dir,
                       "politeness": politeness.state(),
                       "stats": stats}, f, indent=2)
        if n_next == 0:
            break

    # -- finalize ----------------------------------------------------------
    from crawler_ray.pipelines.crawl import finalize_content_items
    ext_glob = [os.path.join(out_dir, d, "extracted")
                for d in sorted(os.listdir(out_dir)) if d.startswith("wave-")
                if os.path.exists(os.path.join(out_dir, d, "extracted"))]
    items_path = None
    if ext_glob:
        items_path = finalize_content_items(
            ext_glob, os.path.join(out_dir, "content_items"),
            order_cols=["wave", "priority", "url_norm"])
    trace_path = _write_trace(ext_glob, os.path.join(out_dir, "trace"))
    seen_total = sum(pool.counts())
    pool.shutdown()
    ctx.target_max_block_size = prev_block_size
    summary = {"mode": "wave", "stats": {**stats, "seen": seen_total},
               "trace_path": trace_path, "extracted_dirs": ext_glob,
               "content_items": items_path}
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=str)
    return summary


def _seed_wave0(engine, pool: URLSeenPool, out_dir: str) -> None:
    cfg = engine.cfg
    rows = []
    for seed in engine.seed_urls:
        host = urlparse(seed).netloc
        sitemap_urls = (engine.robots.sitemaps(host)
                        if cfg.use_sitemaps else [])
        urls = sitemap_urls or [seed]
        jt = "sitemap" if sitemap_urls else "page"
        for u in urls:
            norm = normalize_url_batch([u])[0]
            h = urlparse(norm).netloc
            rows.append({
                "url_norm": norm, "host": h,
                "host_hash": int(host_hash64_batch([h])[0]),
                "url_digest": url_sha1_batch([norm])[0],
                "depth": 0, "job_type": jt,
                "priority": cfg.policies.calculate_priority(norm, 0, jt),
                "parent_url": None,
            })
    t = _frontier_table(rows)
    mask = pool.check_and_add(t["url_digest"].to_pylist(),
                              t["host_hash"].to_pylist())
    t = t.filter(pa.array(mask))
    frontier_dir = os.path.join(out_dir, "wave-0000", "frontier")
    os.makedirs(frontier_dir, exist_ok=True)
    pq.write_table(t, os.path.join(frontier_dir, "part-0.parquet"))


class _SpillExtracted:
    """Side-effect sink: writes each extracted batch as a parquet part
    (atomic rename; part name is a digest of (first url, row count) so a
    retried task overwrites its own output instead of duplicating), then
    passes through only the columns the candidate stages need."""

    PASS_COLS = ["url_norm", "links", "depth", "job_type", "priority",
                 "host", "fetch_ok", "sm_kind"]

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def __call__(self, t: pa.Table) -> pa.Table:
        import hashlib
        if t.num_rows:
            os.makedirs(self.out_dir, exist_ok=True)
            tag = f"{t['url_norm'][0].as_py()}|{t.num_rows}"
            name = hashlib.blake2b(tag.encode(),
                                   digest_size=10).hexdigest()
            tmp = os.path.join(self.out_dir, f".{name}.tmp")
            pq.write_table(t.drop_columns(["links"]), tmp)
            os.replace(tmp, os.path.join(self.out_dir,
                                         f"part-{name}.parquet"))
        return t.select(self.PASS_COLS)


class _ExtractFn:
    """Extraction stage wrapper adding the wave column (callable class so
    a future model-backed extractor loads once per actor)."""

    def __init__(self, classify: bool, ner_enabled: bool, wave: int):
        self.classify = classify
        self.ner = ner_enabled
        self.wave = wave

    def __call__(self, batch: pa.Table) -> pa.Table:
        from crawler_ray.stages.transforms import extract_classify_batch
        out = extract_classify_batch(batch, ner_enabled=self.ner,
                                     classify=self.classify,
                                     with_links=True)
        return out.append_column(
            "wave", pa.array([self.wave] * out.num_rows, pa.int32()))


def _explode_links(t: pa.Table) -> pa.Table:
    """(page row, links list) -> one candidate row per link with the
    first-discoverer tie-break key (parent_priority, parent_url,
    link_index)."""
    links_col = t["links"].to_pylist()
    ok = t["fetch_ok"].to_pylist()
    parents = t["url_norm"].to_pylist()
    hosts = t["host"].to_pylist()
    depths = t["depth"].to_pylist()
    jts = t["job_type"].to_pylist()
    prios = t["priority"].to_pylist()
    sm_kinds = t["sm_kind"].to_pylist()

    out = {"link": [], "link_index": [], "parent_url": [],
           "parent_host": [], "parent_priority": [], "cand_depth": [],
           "fixed_job_type": [], "bypass_host": []}
    for i in range(t.num_rows):
        if not ok[i] or not links_col[i]:
            continue
        if jts[i] == "sitemap":
            fixed = "sitemap" if sm_kinds[i] == "index" else "page"
            depth = depths[i] + 1 if fixed == "sitemap" else 0
            bypass = True
        else:
            if depths[i] >= 1_000_000:  # never
                continue
            fixed = ""
            depth = depths[i] + 1
            bypass = False
        for j, link in enumerate(links_col[i]):
            out["link"].append(link)
            out["link_index"].append(j)
            out["parent_url"].append(parents[i])
            out["parent_host"].append(hosts[i])
            out["parent_priority"].append(prios[i])
            out["cand_depth"].append(depth)
            out["fixed_job_type"].append(fixed)
            out["bypass_host"].append(bypass)
    return pa.table({
        "link": pa.array(out["link"], pa.string()),
        "link_index": pa.array(out["link_index"], pa.int32()),
        "parent_url": pa.array(out["parent_url"], pa.string()),
        "parent_host": pa.array(out["parent_host"], pa.string()),
        "parent_priority": pa.array(out["parent_priority"], pa.int32()),
        "cand_depth": pa.array(out["cand_depth"], pa.int32()),
        "fixed_job_type": pa.array(out["fixed_job_type"], pa.string()),
        "bypass_host": pa.array(out["bypass_host"], pa.bool_()),
    })


class _CandidateFn:
    """Admission filters + job_type + priority for candidate links
    (the stateless parts of ``core/crawler.py:685-749``)."""

    def __init__(self, patterns, policies, max_depth, robots):
        self.patterns = patterns
        self.policies = policies
        self.max_depth = max_depth
        self.robots = robots

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _frontier_table([]).append_column(
                "link_index", pa.array([], pa.int32())).append_column(
                "parent_priority", pa.array([], pa.int32()))
        links = t["link"].to_pylist()
        norm = normalize_url_batch(links)
        hosts = [u.split("/", 3)[2] if "//" in u else "" for u in norm]
        parent_hosts = t["parent_host"].to_pylist()
        bypass = t["bypass_host"].to_pylist()
        depths = np.asarray(t["cand_depth"].to_pylist())
        keep = np.array(
            [(b or h == p) for b, h, p in zip(bypass, hosts, parent_hosts)],
            dtype=bool)
        keep &= depths <= self.max_depth
        if self.robots is not None:
            can = self.robots.can_fetch
            keep &= np.array(
                [(b or can(h, urlparse(u).path))
                 for b, h, u in zip(bypass, hosts, norm)], dtype=bool)

        idx = np.nonzero(keep)[0]
        norm_k = [norm[i] for i in idx]
        hosts_k = [hosts[i] for i in idx]
        fixed = t["fixed_job_type"].to_pylist()
        job_types = [fixed[i] or self.patterns.job_type(norm_k[j])
                     for j, i in enumerate(idx)]
        depths_k = depths[idx]
        priorities = self.policies.calculate_priority_batch(
            norm_k, depths_k, job_types)
        return pa.table({
            "url_norm": pa.array(norm_k, pa.string()),
            "host": pa.array(hosts_k, pa.string()),
            "host_hash": pa.array(host_hash64_batch(hosts_k), pa.uint64()),
            "url_digest": pa.array(url_sha1_batch(norm_k), pa.binary()),
            "depth": pa.array(depths_k.astype(np.int32), pa.int32()),
            "job_type": pa.array(job_types, pa.string()),
            "priority": pa.array(priorities, pa.int32()),
            "parent_url": t["parent_url"].take(pa.array(idx)),
            "link_index": t["link_index"].take(pa.array(idx)),
            "parent_priority": t["parent_priority"].take(pa.array(idx)),
        })


def _write_trace(extracted_dirs: list[str], out_dir: str) -> str | None:
    """Column-pruned trace view over the per-wave extracted parts."""
    import glob as _glob

    import ray.data as rd
    if not extracted_dirs:
        return None
    files = sorted(f for d in extracted_dirs
                   for f in _glob.glob(os.path.join(d, "*.parquet")))
    ds = rd.read_parquet(
        files,
        columns=["url_norm", "depth", "job_type", "priority", "parent_url",
                 "fetch_vts", "host", "wave", "fetch_ok"])
    ds = ds.map_batches(
        lambda t: t.filter(t["fetch_ok"]).drop_columns(["fetch_ok"]),
        batch_format="pyarrow")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    ds.write_parquet(out_dir)
    return out_dir
