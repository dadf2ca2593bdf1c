"""Relaxed wave mode — the scale-out BFS execution of the crawl.

Each wave is ONE lazy Ray Dataset pipeline with NO all-to-all shuffle
(streaming executor, backpressure, no driver materialization of page
content):

    frontier_k (parquet, fetch_vts pre-stamped at admission)
      -> map_batches: fetch join           [per-batch bucket reads,
                                            row groups pruned by url
                                            min/max stats]
      -> map_batches: extract + classify + link extraction  [hot stage]
      -> write extracted parts (side-effect spill; trace is a
         column-pruned view)
      -> map_batches: explode links -> admission filters
      -> map_batches: PROPOSE to the sharded admission actors
    commit: one RPC per shard -> shards write frontier_{k+1} parts
            (URL-seen mark + per-host politeness vts stamps)

The two shuffles of the previous design (in-wave first-discoverer dedup
and the per-host politeness groupby) are folded into the admission actor
pool (``state/admission.py``), which is keyed ``hash(host) % S`` exactly
like the URL-seen shards the north rule prescribes.  Min-merge proposals
are commutative and idempotent, so batch order, parallelism, and Ray
task retries cannot change admissions, and per-host vts ranks computed
at commit equal the wave-global (priority, url_norm) visit order.

Visit order is (wave, priority, url_norm) — deterministic and
parallelism-invariant; it matches the serial oracle's ``ordering='bfs'``
semantics exactly (same admission rules, same first-discoverer tie-break
(parent_priority, parent_url, link_index), same per-host virtual-time
politeness stamps).  The driver only ever touches manifests and row
counts.

Checkpoint/resume: per-wave manifest (counts + admission shard snapshots
covering seen-set and politeness clocks).  ``resume=True`` restores from
the last complete wave and continues; completed waves are skipped
wholesale.
"""

from __future__ import annotations

import json
import os
import shutil
from urllib.parse import urlparse

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

from crawler_ray.functions.urls import (host_hash64_batch,
                                        normalize_url_batch, url_sha1_batch)
from crawler_ray.state.admission import AdmissionPool
from crawler_ray.state.metrics import make_metrics_actor

__all__ = ["run_wave_mode"]

CANDIDATE_SCHEMA = pa.schema([
    ("url_norm", pa.string()), ("host", pa.string()),
    ("host_hash", pa.uint64()), ("url_digest", pa.binary()),
    ("depth", pa.int32()), ("job_type", pa.string()),
    ("priority", pa.int32()), ("parent_url", pa.string()),
    ("link_index", pa.int32()), ("parent_priority", pa.int32()),
])

_SEED_PRIORITY = -(1 << 31)  # seeds sort before any real parent

_FOLD_SLICE = None


def _fold_slice_remote():
    """Lazily-defined raw Ray task for the tail-wave fold: run the wave
    stage chain over one frontier slice and propose to the admission
    actors.  A raw task skips the ~1.5 s fixed Ray Data executor
    startup a tiny frontier can't amortize, while slices still run in
    parallel (the earlier driver-side loop serialized the extract
    stage).  Propose is a commutative min-merge and the spill stage's
    part names are content-deterministic, so slice placement, ordering
    and task retries cannot change admissions or duplicate output."""
    global _FOLD_SLICE
    if _FOLD_SLICE is None:
        import ray

        @ray.remote(num_cpus=1)
        def fold_slice(stages, pool, tbl: pa.Table) -> int:
            for stage in stages:
                tbl = stage(tbl)
            return pool.propose(tbl)

        _FOLD_SLICE = fold_slice
    return _FOLD_SLICE

# Bump whenever the on-disk checkpoint layout changes (snapshot file
# names, spill part-name format, manifest keys): resume from an older
# checkpoint fails with a clear error instead of a FileNotFoundError /
# ValueError deep inside the restore path.
WAVE_MANIFEST_FORMAT = 2


def run_wave_mode(engine, resume: bool = False) -> dict:
    import ray
    import ray.data as rd

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

    pool = AdmissionPool(num_shards=cfg.seen_shards, mode=cfg.seen_mode,
                         robots=robots, default_delay=cfg.default_delay,
                         host_split_threshold=cfg.host_split_threshold)
    metrics = make_metrics_actor()
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
            fmt = manifest.get("format", 1)
            if fmt != WAVE_MANIFEST_FORMAT:
                raise ValueError(
                    f"cannot resume: checkpoint manifest format {fmt} != "
                    f"engine format {WAVE_MANIFEST_FORMAT} (snapshot/part "
                    "layout changed between versions; re-run fresh)")
            snap_shards = manifest.get("seen_shards", cfg.seen_shards)
            if snap_shards != cfg.seen_shards:
                raise ValueError(
                    f"cannot resume: checkpoint has {snap_shards} "
                    f"admission shards, config wants {cfg.seen_shards} "
                    "(host->shard routing would change; re-run fresh or "
                    "match seen_shards)")
            pool.restore(manifest["seen_snapshot"])
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

    pool_ref = ray.put(pool)  # actor handles serialize by reference
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

        import time as _time
        t_wave0 = _time.time()
        extracted_dir = os.path.join(wave_dir, "extracted")
        next_dir = os.path.join(out_dir, f"wave-{wave + 1:04d}", "frontier")

        links_dir = (os.path.join(wave_dir, "links")
                     if cfg.spill_links else None)
        stages = (
            _FetchFn(store.root, store.num_buckets, metrics),
            _ExtractFn(cfg.classify, cfg.ner_enabled, wave),
            _SpillExtracted(extracted_dir, links_dir),
            _explode_links,
            _CandidateFn(patterns, policies, cfg.max_depth,
                         robots if cfg.respect_robots else None),
        )

        if cfg.tail_fold_threshold and n_frontier <= cfg.tail_fold_threshold:
            # tail-wave fold: a BFS converges through tiny frontiers, and
            # each Ray Data execution pays ~1.5 s of fixed executor
            # startup regardless of size — run the SAME stage callables
            # as raw Ray tasks in fetch_batch_size slices (identical
            # granularity to the Dataset path, so the per-batch bucket
            # pruning and deterministic spill names behave the same)
            # through the SAME admission actors (see _fold_slice_remote
            # for the commutativity argument).
            table = pads.dataset(frontier_path,
                                 format="parquet").to_table()
            fold = _fold_slice_remote()
            stages_ref = ray.put(stages)
            ray.get([fold.remote(stages_ref, pool_ref,
                                 table.slice(lo, cfg.fetch_batch_size))
                     for lo in range(0, table.num_rows,
                                     cfg.fetch_batch_size)])
        else:
            # NOTE on task granularity: shrinking fetch_batch_size for
            # mid-size frontiers to pack the cluster better was tried
            # and measured SLOWER (30 s vs 23 s default bench) — small
            # fetch batches re-read shared corpus row groups (the
            # range+isin pruning overlaps across batches) and multiply
            # spill parts; the configured size stays authoritative.
            ds = rd.read_parquet(frontier_path)
            ds = ds.map_batches(stages[0], batch_format="pyarrow",
                                batch_size=cfg.fetch_batch_size)
            ds = ds.map_batches(stages[1], batch_format="pyarrow",
                                batch_size=cfg.extract_batch_size)
            # extracted rows spill to parquet as a side effect (atomic,
            # deterministic part names -> task retries overwrite instead
            # of duplicating); only the link columns continue downstream
            ds = ds.map_batches(stages[2], batch_format="pyarrow")
            cand = ds.map_batches(stages[3], batch_format="pyarrow")
            cand = cand.map_batches(stages[4], batch_format="pyarrow")

            def propose(t: pa.Table) -> pa.Table:
                p = ray.get(pool_ref)
                return pa.table({"proposed": pa.array([p.propose(t)],
                                                      pa.int64())})

            # one streaming execution end-to-end; the materialized sink
            # is one tiny count row per batch (page content never
            # reaches the driver)
            final = cand.map_batches(propose,
                                     batch_format="pyarrow").materialize()
            if os.environ.get("GRAFT_WAVE_STATS"):
                print(f"--- wave {wave} stats ---\n{final.stats()}")
        t_pipe = _time.time() - t_wave0
        n_next = pool.commit(next_dir)
        t_commit = _time.time() - t_wave0 - t_pipe
        t_wave = _time.time() - t_wave0
        stats["admitted"] += n_next

        _, n_ok = _SpillExtracted.counts(extracted_dir)
        stats["visited"] += n_ok
        stats["fetch_misses"] += n_frontier - n_ok
        stats["waves"] = wave + 1

        # -- manifest + snapshots (lineage for resume) --------------------
        snap_dir = os.path.join(wave_dir, "seen_snapshot")
        pool.snapshot(snap_dir)
        with open(os.path.join(wave_dir, "manifest.json"), "w") as f:
            json.dump({"format": WAVE_MANIFEST_FORMAT,
                       "wave": wave, "frontier_rows": n_frontier,
                       "seen_shards": cfg.seen_shards,
                       "visited_rows": n_ok, "next_frontier_rows": n_next,
                       "sec_wave": round(t_wave, 3),
                       "sec_pipeline": round(t_pipe, 3),
                       "sec_commit": round(t_commit, 3),
                       "seen_snapshot": snap_dir,
                       "metrics": ray.get(metrics.snapshot.remote()),
                       "stats": stats}, f, indent=2)
        if n_next == 0:
            break

    # -- finalize ----------------------------------------------------------
    from crawler_ray.pipelines.crawl import finalize_content_items
    ext_glob = [os.path.join(out_dir, d, "extracted")
                for d in sorted(os.listdir(out_dir)) if d.startswith("wave-")
                if os.path.exists(os.path.join(out_dir, d, "extracted"))]
    # the small wave block size would shatter the finalize shuffle into
    # thousands of tiny blocks (a 1.5 GB groupby took 18x longer under a
    # 2 MB target) — restore the default for the merge
    ctx.target_max_block_size = prev_block_size
    import time as _time
    t_fin0 = _time.time()
    items_path = None
    trace_path = None
    if ext_glob and cfg.run_finalize:
        trace_path = os.path.join(out_dir, "trace")
        items_path = finalize_content_items(
            ext_glob, os.path.join(out_dir, "content_items"),
            order_cols=["wave", "priority", "url_norm"],
            trace_dir=trace_path,
            winner_broadcast_threshold=cfg.finalize_broadcast_threshold)
    stats["sec_finalize"] = round(_time.time() - t_fin0, 3)
    seen_total = sum(pool.counts())
    metrics_snapshot = ray.get(metrics.snapshot.remote())
    ray.kill(metrics)
    pool.shutdown()
    ctx.target_max_block_size = prev_block_size
    summary = {"mode": "wave", "stats": {**stats, "seen": seen_total},
               "metrics": metrics_snapshot,
               "trace_path": trace_path, "extracted_dirs": ext_glob,
               "content_items": items_path}
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=str)
    return summary


def _seed_wave0(engine, pool: AdmissionPool, out_dir: str) -> None:
    """Seeds flow through the same propose/commit path as every other
    admission, so wave-0 politeness stamps and dedup follow one rule."""
    cfg = engine.cfg
    rows = []
    for seed in engine.seed_urls:
        host = urlparse(seed).netloc
        sitemap_urls = (engine.robots.sitemaps(host)
                        if cfg.use_sitemaps else [])
        urls = sitemap_urls or [seed]
        jt = "sitemap" if sitemap_urls else "page"
        for i, u in enumerate(urls):
            norm = normalize_url_batch([u])[0]
            h = urlparse(norm).netloc
            rows.append({
                "url_norm": norm, "host": h,
                "host_hash": int(host_hash64_batch([h])[0]),
                "url_digest": url_sha1_batch([norm])[0],
                "depth": 0, "job_type": jt,
                "priority": cfg.policies.calculate_priority(norm, 0, jt),
                "parent_url": None,
                "link_index": i, "parent_priority": _SEED_PRIORITY,
            })
    t = pa.Table.from_pydict(
        {n: [r[n] for r in rows] for n in CANDIDATE_SCHEMA.names},
        schema=CANDIDATE_SCHEMA)
    pool.propose(t)
    pool.commit(os.path.join(out_dir, "wave-0000", "frontier"))


class _FetchFn:
    """Simulated fetch (SURVEY §2 J7) without a shuffle: each batch
    resolves its URLs against the host-hash-bucketed corpus store —
    row groups pruned via url min/max statistics, so only the row groups
    containing requested URLs are read.  Parallelism = #batches, not
    #hosts."""

    def __init__(self, root: str, num_buckets: int, metrics=None):
        self.root = root
        self.num_buckets = num_buckets
        self.metrics = metrics

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads_w

        # pyarrow's default per-process pools are sized to the MACHINE
        # (32 threads each); with ~cpu_count concurrent map tasks that is
        # ~1000 threads fighting over 32 cores and a 5-20x slowdown of
        # everything in flight.  One compute + one IO thread per task is
        # right when Ray already provides the process parallelism.
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(2)

        hh = t["host_hash"].to_numpy(zero_copy_only=False)
        buckets = (hh % np.uint64(self.num_buckets)).astype(np.int32)
        urls = t["url_norm"].to_pylist()
        html_map: dict[str, bytes] = {}
        for b in np.unique(buckets):
            us = [u for u, bb in zip(urls, buckets) if bb == b]
            dset = pads_w.dataset(
                os.path.join(self.root, f"bucket={int(b):04d}"),
                format="parquet")
            # arrow does NOT prune row groups on a bare isin filter (it
            # scans the whole bucket); the [min, max] range conjunct DOES
            # prune via row-group statistics, and the frontier is written
            # (host, url)-sorted so a batch's urls form a tight range
            filt = ((pc.field("url") >= min(us))
                    & (pc.field("url") <= max(us))
                    & pc.field("url").isin(us))
            ft = dset.to_table(columns=["url", "html"], filter=filt)
            html_map.update(zip(ft["url"].to_pylist(),
                                ft["html"].to_pylist()))
        html = pa.array([html_map.get(u) for u in urls], pa.binary())
        status = pa.array(
            [200 if html_map.get(u) is not None else 404 for u in urls],
            pa.int32())
        if self.metrics is not None:
            n_hit = sum(1 for u in urls if html_map.get(u) is not None)
            # fire-and-forget: one RPC per batch, advisory counters
            # (a retried task may double-count — acceptable for metrics)
            self.metrics.incr.remote({
                "urls_visited": n_hit,
                "fetch_misses": len(urls) - n_hit,
                "html_bytes": int(sum(len(h) for h in html_map.values())),
            })
        return (t.append_column("html", html)
                .append_column("status_code", status))


class _SpillExtracted:
    """Side-effect sink: writes each extracted batch as a parquet part
    (atomic rename; part name is a digest of (first url, row count) so a
    retried task overwrites its own output instead of duplicating), then
    passes through only the columns the candidate stages need.

    The part filename carries the batch's (rows, fetch_ok) counts —
    ``part-<digest>.n<rows>.ok<ok>.parquet`` — so per-wave stats are a
    directory listing instead of a driver-side scan over every part
    (which is minutes on a 70k-row wave of hundreds of parts)."""

    PASS_COLS = ["url_norm", "links", "depth", "job_type", "priority",
                 "host", "fetch_ok", "sm_kind"]

    def __init__(self, out_dir: str, links_dir: str | None = None):
        self.out_dir = out_dir
        self.links_dir = links_dir

    def __call__(self, t: pa.Table) -> pa.Table:
        import hashlib

        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        if t.num_rows:
            os.makedirs(self.out_dir, exist_ok=True)
            tag = f"{t['url_norm'][0].as_py()}|{t.num_rows}"
            name = hashlib.blake2b(tag.encode(),
                                   digest_size=10).hexdigest()
            n_ok = pc.sum(pc.cast(t["fetch_ok"], pa.int64())).as_py() or 0
            fname = f"part-{name}.n{t.num_rows}.ok{n_ok}.parquet"
            tmp = os.path.join(self.out_dir, f".{name}.tmp")
            pq.write_table(t.drop_columns(["links"]), tmp)
            os.replace(tmp, os.path.join(self.out_dir, fname))
            if self.links_dir is not None:
                # side table for the strict replay: per-url outlinks
                os.makedirs(self.links_dir, exist_ok=True)
                ltmp = os.path.join(self.links_dir, f".{name}.tmp")
                pq.write_table(
                    t.select(["url_norm", "links", "sm_kind", "fetch_ok"]),
                    ltmp)
                os.replace(ltmp, os.path.join(self.links_dir,
                                              f"part-{name}.parquet"))
        return t.select(self.PASS_COLS)

    @staticmethod
    def counts(out_dir: str) -> tuple[int, int]:
        """(rows, fetch_ok rows) from part filenames — no file opens."""
        total = ok = 0
        if os.path.isdir(out_dir):
            for f in os.listdir(out_dir):
                if f.startswith("part-") and f.endswith(".parquet"):
                    bits = f.split(".")
                    total += int(bits[-3][1:])
                    ok += int(bits[-2][2:])
        return total, ok


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


_EXPLODED_SCHEMA = pa.schema([
    ("link", pa.string()), ("link_index", pa.int32()),
    ("parent_url", pa.string()), ("parent_host", pa.string()),
    ("parent_priority", pa.int32()), ("cand_depth", pa.int32()),
    ("fixed_job_type", pa.string()), ("bypass_host", pa.bool_()),
])


def _explode_links(t: pa.Table) -> pa.Table:
    """(page row, links list) -> one candidate row per link with the
    first-discoverer tie-break key (parent_priority, parent_url,
    link_index).  Fully vectorized: Arrow ``list_flatten`` for the link
    values, numpy repeat/arange for the per-link row indices — no per-row
    Python loop on the wave hot path."""
    import pyarrow.compute as pc

    n_links = pc.fill_null(pc.list_value_length(t["links"]), 0)
    keep = pc.and_(pc.fill_null(t["fetch_ok"], False),
                   pc.greater(n_links, 0))
    t = t.filter(keep)
    if t.num_rows == 0:
        return _EXPLODED_SCHEMA.empty_table()

    links = t["links"].combine_chunks()
    flat = pc.list_flatten(links)
    lengths = pc.list_value_length(links).to_numpy(zero_copy_only=False)
    lengths = lengths.astype(np.int64)
    total = int(lengths.sum())
    # position within each parent's list = global arange - list start
    starts = np.zeros(len(lengths), dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    link_index = (np.arange(total, dtype=np.int64)
                  - np.repeat(starts, lengths)).astype(np.int32)
    row_idx = pa.array(np.repeat(np.arange(t.num_rows, dtype=np.int64),
                                 lengths))

    # per-row derived fields (vectorized over rows, then repeated)
    is_sm = np.asarray(pc.equal(t["job_type"], "sitemap")
                       .fill_null(False))
    sm_index = np.asarray(pc.equal(t["sm_kind"], "index")
                          .fill_null(False))
    depths = t["depth"].to_numpy(zero_copy_only=False).astype(np.int64)
    fixed_row = np.where(is_sm, np.where(sm_index, "sitemap", "page"), "")
    depth_row = np.where(is_sm & ~sm_index, 0, depths + 1)

    return pa.table({
        "link": flat.cast(pa.string()),
        "link_index": pa.array(link_index, pa.int32()),
        "parent_url": pc.take(t["url_norm"], row_idx),
        "parent_host": pc.take(t["host"], row_idx),
        "parent_priority": pc.take(t["priority"], row_idx)
        .cast(pa.int32()),
        "cand_depth": pa.array(
            np.repeat(depth_row, lengths).astype(np.int32), pa.int32()),
        "fixed_job_type": pa.array(np.repeat(fixed_row, lengths),
                                   pa.string()),
        "bypass_host": pa.array(np.repeat(is_sm, lengths), pa.bool_()),
    })


class _CandidateFn:
    """Admission filters + job_type + priority for candidate links
    (the stateless parts of ``core/crawler.py:685-749``)."""

    def __init__(self, patterns, policies, max_depth, robots):
        self.patterns = patterns
        self.policies = policies
        self.max_depth = max_depth
        self.robots = robots

    # normalized URLs are scheme://netloc+path by construction, so ONE
    # RE2 pass recovers exactly urlparse's netloc and path ((?s): a
    # stray newline in a link must not kill the match)
    _HOST_PATH_RE = r"(?s)^(?:https?)://(?P<host>[^/]*)(?P<path>.*)$"

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return CANDIDATE_SCHEMA.empty_table()
        links = t["link"].combine_chunks()
        # normalize_url is the IDENTITY for the absolute-http majority
        # with no params/query/fragment AND no whitespace (urlparse
        # strips embedded \t\r\n and surrounding C0/space, so any
        # whitespace disqualifies the identity) — two arrow kernels
        # find them, and only the leftover rows pay the per-row
        # urlparse
        fast = pc.and_(
            pc.or_(pc.starts_with(links, "http://"),
                   pc.starts_with(links, "https://")),
            pc.invert(pc.match_substring_regex(
                links, r"[;?#\s\x00-\x1f]")))
        fast_np = np.asarray(pc.fill_null(fast, False))
        if fast_np.all():
            norm_arr = links.cast(pa.string())
        else:
            vals = links.to_pylist()
            slow_idx = np.nonzero(~fast_np)[0]
            slow_norm = normalize_url_batch(
                [vals[i] or "" for i in slow_idx])
            for j, i in enumerate(slow_idx):
                vals[i] = slow_norm[j]
            norm_arr = pa.array([v or "" for v in vals], pa.string())

        parts = pc.extract_regex(norm_arr, self._HOST_PATH_RE)
        hosts_arr = pc.fill_null(pc.struct_field(parts, "host"), "")
        bypass = np.asarray(pc.fill_null(t["bypass_host"], False))
        same_host = np.asarray(pc.fill_null(
            pc.equal(hosts_arr, t["parent_host"].combine_chunks()),
            False))
        depths = t["cand_depth"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        keep = (bypass | same_host) & (depths <= self.max_depth)
        if self.robots is not None:
            # group robots checks per host: hosts with no rules (the
            # common case) clear their whole group at once; only
            # rule-bearing hosts walk their rows
            need = np.nonzero(keep & ~bypass)[0]
            if len(need):
                hosts_py = hosts_arr.to_pylist()
                paths_py = pc.fill_null(
                    pc.struct_field(parts, "path"), "").to_pylist()
                by_host: dict[str, list[int]] = {}
                for i in need:
                    by_host.setdefault(hosts_py[i], []).append(i)
                for host, rows in by_host.items():
                    rules = self.robots.rules.get(host)
                    if rules is None:
                        continue    # unknown host: allowed
                    can = rules.can_fetch
                    for i in rows:
                        if not can(paths_py[i]):
                            keep[i] = False

        idx = np.nonzero(keep)[0]
        take = pa.array(idx)
        norm_k_arr = pc.take(norm_arr, take)
        norm_k = norm_k_arr.to_pylist()
        hosts_k = pc.take(hosts_arr, take).to_pylist()
        fixed = pc.take(t["fixed_job_type"].combine_chunks(),
                        take).to_pylist()
        job_types = [f or self.patterns.job_type(u)
                     for f, u in zip(fixed, norm_k)]
        depths_k = depths[idx]
        priorities = self.policies.calculate_priority_batch(
            norm_k, depths_k, job_types)
        return pa.table({
            "url_norm": norm_k_arr,
            "host": pa.array(hosts_k, pa.string()),
            "host_hash": pa.array(host_hash64_batch(hosts_k), pa.uint64()),
            "url_digest": pa.array(url_sha1_batch(norm_k), pa.binary()),
            "depth": pa.array(depths_k.astype(np.int32), pa.int32()),
            "job_type": pa.array(job_types, pa.string()),
            "priority": pa.array(priorities, pa.int32()),
            "parent_url": t["parent_url"].take(take),
            "link_index": t["link_index"].take(take),
            "parent_priority": t["parent_priority"].take(take),
        })
