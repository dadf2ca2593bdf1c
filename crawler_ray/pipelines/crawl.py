"""The Ray crawl engine: shared scaffolding + the strict priority-replay
mode.  (The relaxed wave mode lives in ``pipelines/wave.py``.)

Two execution modes over the same operator set:

- **strict** (this module): reproduces the serial oracle's global
  priority-queue visit order *exactly* while running all expensive work
  (fetch join, HTML parse, extraction, classification) in parallel.
  The driver replays the priority queue — O(1) bookkeeping per URL — and
  speculatively processes the K lowest unprocessed jobs per round in
  parallel Ray tasks (one per corpus bucket).  Speculation is always
  valid: admission is first-wins-at-enqueue, so every enqueued job is
  eventually visited with the (url, depth, priority, job_type) fixed at
  admission; only the *order* and the *admissions* are decided by the
  serial replay, and those need just the per-page outlink lists.
  This mirrors the reference's semantics (priority pop order,
  ``core/crawler.py:595,954``) without its thread races.  Driver-resident
  seen-set: strict mode is the conformance mode; the 10^10-scale path is
  the wave mode with sharded seen actors.

- **relaxed / wave** (``wave.py``): BFS waves of pure Dataset pipelines
  with the sharded URL-seen actor pool — order is (wave, priority,
  url_norm), the scale-out mode.

Checkpoint/resume (strict): driver state (heap, seen, trace, politeness
clocks) pickled every ``checkpoint_every`` rounds + extracted parquet
parts are append-only per round; resume replays from the snapshot and
re-processes at most one round of speculation (idempotent: finalize
dedupes extracted parts by url_norm).
"""

from __future__ import annotations

import heapq
import json
import os
import pickle
import shutil
from dataclasses import dataclass, field
from urllib.parse import urlparse

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from crawler_ray.functions.patterns import (URLPatternClassifier,
                                            default_url_classifier)
from crawler_ray.functions.priority import (PriorityPolicyManager,
                                            default_policy_manager)
from crawler_ray.functions.urls import normalize_url
from crawler_ray.sources.corpus_store import CorpusStore
from crawler_ray.sources.robots import RobotsTable, parse_sitemap

__all__ = ["CrawlConfig", "CrawlEngine"]

TRACE_SCHEMA = pa.schema([
    ("order", pa.int64()), ("url_norm", pa.string()),
    ("depth", pa.int32()), ("job_type", pa.string()),
    ("priority", pa.int32()), ("parent_url", pa.string()),
    ("fetch_vts", pa.float64()), ("host", pa.string()),
])


@dataclass
class CrawlConfig:
    max_depth: int = 5
    max_pages: int | None = None
    respect_robots: bool = False
    use_sitemaps: bool = True
    default_delay: float = 1.0
    classify: bool = True
    ner_enabled: bool = False
    # physical knobs
    round_batch: int = 2048          # strict: K lowest jobs per round
    extract_batch_size: int = 256    # rows per extract map_batches call
    # rows per fetch-join map_batches call.  The fetch->extract->candidate
    # chain FUSES into one Ray operator, so this batch size sets the fused
    # task granularity (tasks/wave = frontier_rows / fetch_batch_size) AND
    # the spilled part size; 256 keeps every CPU busy on sitemap-fat waves
    # while producing ~MB-scale parts instead of thousands of tiny files
    fetch_batch_size: int = 256
    num_buckets: int = 32            # corpus host-hash buckets
    # smaller blocks through the wave pipeline => extract parallelism even
    # when one mega-host bucket carries most of a wave (Zipf skew)
    target_block_size: int = 2 * 1024 * 1024
    seen_shards: int = 4             # wave mode: URL-seen actor shards
    seen_mode: str = "exact"         # 'exact' | 'bloom' | 'cuckoo'
    # mega-host commit range-split: hosts with more admitted rows than
    # this per wave sort+stamp in parallel segments (identical vts)
    host_split_threshold: int | None = 200_000
    # finalize winner map: broadcast at or under this many distinct
    # hashes, spill key-sorted to a range-partitioned store above it
    finalize_broadcast_threshold: int = 2_000_000
    # fold waves whose frontier is at or under this many rows into raw
    # Ray tasks (fetch_batch_size slices) through the SAME stage
    # callables and admission actors: a Ray Data execution costs
    # ~1.5 s of fixed executor startup per wave, which small tail
    # frontiers (BFS converging) pay in full while the actual work is
    # a few hundred task-milliseconds.  4096 rows is at most
    # fetch_batch_size=256 x 16 concurrent tasks — well under one
    # scheduling round of a 32-CPU node, where raw tasks strictly beat
    # an executor spin-up; bigger frontiers want Ray Data's streaming
    # and backpressure.  0 disables.
    tail_fold_threshold: int = 4096
    checkpoint_every: int = 5        # strict rounds between snapshots
    # internal wave-mode knobs used by the strict prefetch
    spill_links: bool = False        # also spill (url, links) side parts
    run_finalize: bool = True        # skip content_items/trace (prefetch)
    policies: PriorityPolicyManager = field(
        default_factory=default_policy_manager)
    patterns: URLPatternClassifier = field(
        default_factory=default_url_classifier)


def _load_small_tables(corpus_dir: str):
    robots = RobotsTable.from_arrow(
        pq.read_table(os.path.join(corpus_dir, "robots.parquet")))
    seeds = pq.read_table(
        os.path.join(corpus_dir, "seeds.parquet"))["url"].to_pylist()
    sitemaps = pq.read_table(os.path.join(corpus_dir, "sitemaps.parquet"))
    return robots, seeds, sitemaps


def prepare_store(corpus_dir: str, work_dir: str,
                  num_buckets: int) -> CorpusStore:
    """Bucketize the pages corpus (idempotent), merging sitemap bodies so
    the fetch join resolves them like any other URL."""
    store_dir = os.path.join(work_dir, "corpus_store")
    sm = pq.read_table(os.path.join(corpus_dir, "sitemaps.parquet"))
    extra = pa.table({"url": sm["url"],
                      "html": sm["body"].cast(pa.binary())})
    return CorpusStore.build(os.path.join(corpus_dir, "pages"), store_dir,
                             num_buckets=num_buckets, extra_tables=[extra])


# ---------------------------------------------------------------------------
# per-bucket fetch+extract worker (plain Ray task: the strict driver loop is
# an iterative fixpoint the Dataset API cannot express; wave mode uses the
# pure-Dataset pipeline instead)
# ---------------------------------------------------------------------------

def _process_bucket(bucket_path: str, meta: dict, out_dir: str,
                    part_name: str, classify: bool, ner_enabled: bool,
                    max_depth: int) -> list[tuple]:
    """Fetch+extract+classify all jobs routed to one corpus bucket.

    ``meta``: dict of equal-length lists (url_norm, depth, job_type,
    priority, parent_url).  Writes the extracted rows as one parquet part
    (atomic rename) and returns the driver's replay food:
    [(url_norm, fetch_ok, links, sm_kind)] — links only (no content) cross
    back to the driver.
    """
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from crawler_ray.stages.transforms import extract_classify_batch

    from crawler_ray.sources.corpus_store import _pruning_url_filter

    urls = meta["url_norm"]
    ds = pads.dataset(bucket_path, format="parquet")
    fetched = ds.to_table(columns=["url", "html"],
                          filter=_pruning_url_filter(urls))
    html_map = dict(zip(fetched["url"].to_pylist(),
                        fetched["html"].to_pylist()))

    sm_results: list[tuple] = []
    page_idx = [i for i, jt in enumerate(meta["job_type"])
                if jt != "sitemap"]
    out: list[tuple] = []

    # sitemap jobs: parse, no extraction row (core/crawler.py:1278-1365)
    for i, jt in enumerate(meta["job_type"]):
        if jt != "sitemap":
            continue
        body = html_map.get(urls[i])
        if body is None:
            out.append((urls[i], False, [], ""))
        else:
            kind, found = parse_sitemap(body)
            out.append((urls[i], True, found, kind))

    if page_idx:
        batch = pa.table({
            "url_norm": pa.array([urls[i] for i in page_idx]),
            "html": pa.array([html_map.get(urls[i]) for i in page_idx],
                             pa.binary()),
            "job_type": pa.array([meta["job_type"][i] for i in page_idx]),
            "depth": pa.array([meta["depth"][i] for i in page_idx],
                              pa.int32()),
            "priority": pa.array([meta["priority"][i] for i in page_idx],
                                 pa.int32()),
            "parent_url": pa.array([meta["parent_url"][i]
                                    for i in page_idx], pa.string()),
        })
        extracted = extract_classify_batch(batch, ner_enabled=ner_enabled,
                                           classify=classify,
                                           with_links=True)
        links_col = extracted["links"].to_pylist()
        ok_col = extracted["fetch_ok"].to_pylist()
        depths = extracted["depth"].to_pylist()
        for row_i, i in enumerate(page_idx):
            # depth-limit check here saves shipping links the driver
            # would drop (core/crawler.py:855 `depth < max_depth`)
            links = (links_col[row_i]
                     if depths[row_i] < max_depth and ok_col[row_i] else [])
            out.append((urls[i], ok_col[row_i], links, ""))
        os.makedirs(out_dir, exist_ok=True)
        tmp = os.path.join(out_dir, f".{part_name}.tmp")
        pq.write_table(extracted.drop_columns(["links"]), tmp)
        os.replace(tmp, os.path.join(out_dir, f"{part_name}.parquet"))
    return out


@dataclass
class _Job:
    priority: int
    seq: int
    url: str
    depth: int
    job_type: str
    parent: str | None

    def key(self):
        return (self.priority, self.seq)


class CrawlEngine:
    """Facade over the two execution modes."""

    def __init__(self, corpus_dir: str, work_dir: str,
                 config: CrawlConfig | None = None):
        self.corpus_dir = corpus_dir
        self.work_dir = work_dir
        self.cfg = config or CrawlConfig()
        os.makedirs(work_dir, exist_ok=True)
        self.robots, self.seed_urls, self._sitemaps_table = \
            _load_small_tables(corpus_dir)
        self.store = prepare_store(corpus_dir, work_dir,
                                   self.cfg.num_buckets)

    # -- public API ---------------------------------------------------------
    def run(self, mode: str = "strict", resume: bool = False) -> dict:
        if mode == "strict":
            return self._run_strict(resume=resume)
        if mode in ("relaxed", "wave"):
            from crawler_ray.pipelines.wave import run_wave_mode
            return run_wave_mode(self, resume=resume)
        raise ValueError(f"unknown mode {mode!r}")

    def failed_state(self, summary: dict):
        """The failure bookkeeping surface (M26): a ``FailedUrlState``
        with ``was_failed`` / ``should_retry`` over the run's failures,
        matching the reference's ``CrawlState`` API
        (``core/crawler.py:224-333``).

        Strict mode reads the ``failed.parquet`` side table (carries
        errors); wave mode aggregates ``fetch_ok=False`` rows from the
        extracted spill — column-pruned read, vectorized counts, only
        the per-URL attempts map ever lands on the driver."""
        from crawler_ray.state.failures import (FailedUrlState,
                                                failed_urls_table)
        fp = summary.get("failed_path")
        if fp and os.path.exists(fp):
            return FailedUrlState.from_table(pq.read_table(fp))
        tables = []
        for d in summary.get("extracted_dirs", []):
            if not os.path.isdir(d):
                continue
            t = pads.dataset(d).to_table(columns=["url_norm", "fetch_ok"])
            agg = failed_urls_table(t)
            if agg.num_rows:
                tables.append(agg)
        if not tables:
            return FailedUrlState()
        merged = pa.concat_tables(tables)
        # re-merge per-dir counts (a URL can only fail once per wave run,
        # but resumed/overlapping spills may repeat it)
        df = merged.group_by("url_norm").aggregate([("attempts", "sum")])
        st = FailedUrlState()
        for u, c in zip(df["url_norm"].to_pylist(),
                        df["attempts_sum"].to_pylist()):
            st.failed_urls[u] = {"attempts": int(c), "first_attempt": 1,
                                 "last_attempt": int(c),
                                 "last_error": "fetch miss",
                                 "last_status_code": None}
            st.stats["failed_urls"] += int(c)
        return st

    # -- strict mode --------------------------------------------------------
    def _run_strict(self, resume: bool = False) -> dict:
        import ray

        cfg = self.cfg
        out_dir = os.path.join(self.work_dir, "strict")
        extracted_dir = os.path.join(out_dir, "extracted")
        ckpt_path = os.path.join(out_dir, "driver_state.pkl")

        heap: list[tuple] = []  # (priority, seq, _Job)
        seen: set[str] = set()
        trace: list[dict] = []
        failed: list[dict] = []
        last_vts: dict[str, float] = {}
        stats = {"admitted": 0, "skipped": 0, "robots_denied": 0,
                 "fetch_misses": 0, "rounds": 0}
        seq_counter = [0]

        def admit(url: str, depth: int, job_type: str | None,
                  parent: str | None, parent_host: str | None) -> None:
            norm = normalize_url(url)
            if job_type != "sitemap":
                if norm in seen or depth > cfg.max_depth:
                    stats["skipped"] += 1
                    return
                host = urlparse(norm).netloc
                if parent_host is not None and host != parent_host:
                    stats["skipped"] += 1
                    return
                if cfg.respect_robots and not self.robots.can_fetch(
                        host, urlparse(norm).path):
                    stats["robots_denied"] += 1
                    return
            if job_type is None:
                job_type = cfg.patterns.job_type(norm)
            priority = cfg.policies.calculate_priority(norm, depth, job_type)
            seen.add(norm)
            job = _Job(priority, seq_counter[0], norm, depth, job_type,
                       parent)
            heapq.heappush(heap, (priority, job.seq, job))
            seq_counter[0] += 1
            stats["admitted"] += 1

        if resume and os.path.exists(ckpt_path):
            with open(ckpt_path, "rb") as f:
                state = pickle.load(f)
            heap = state["heap"]
            seen = state["seen"]
            trace = state["trace"]
            failed = state["failed"]
            last_vts = state["last_vts"]
            stats = state["stats"]
            seq_counter = state["seq_counter"]
        else:
            if os.path.exists(out_dir):
                shutil.rmtree(out_dir)
            os.makedirs(extracted_dir, exist_ok=True)
            for seed in self.seed_urls:
                host = urlparse(seed).netloc
                sitemap_urls = (self.robots.sitemaps(host)
                                if cfg.use_sitemaps else [])
                if sitemap_urls:
                    for sm_url in sitemap_urls:
                        admit(sm_url, 0, "sitemap", None, None)
                else:
                    admit(seed, 0, "page", None, None)

        results: dict[str, tuple] = {}  # url -> (ok, links, sm_kind)
        # BFS prefetch: strict-visited ⊆ BFS-reachable (the tested
        # invariant between the two modes), so ONE parallel wave run
        # precomputes every (fetch_ok, links, sm_kind) the replay can ask
        # for.  Without it the replay degenerates into thousands of tiny
        # speculation rounds (~3 newly-admitted URLs each) because fresh
        # admissions always outrank already-processed heap entries.  The
        # speculative per-round path below remains as a fallback for any
        # URL the prefetch missed.
        results.update(self._bfs_prefetch())

        def consume(job: _Job) -> None:
            host = urlparse(job.url).netloc
            last = last_vts.get(host)
            vts = 0.0 if last is None else last + self.robots.delay(host)
            last_vts[host] = vts
            ok, links, sm_kind = results.pop(job.url)
            if not ok:
                failed.append({"url_norm": job.url, "job_type": job.job_type,
                               "error": "fetch miss"})
                stats["fetch_misses"] += 1
                return
            trace.append({"order": len(trace), "url_norm": job.url,
                          "depth": job.depth, "job_type": job.job_type,
                          "priority": job.priority,
                          "parent_url": job.parent, "fetch_vts": vts,
                          "host": host})
            if job.job_type == "sitemap":
                if sm_kind == "index":
                    for u in links:
                        admit(u, job.depth + 1, "sitemap", job.url, None)
                else:
                    for u in links:
                        admit(u, 0, "page", job.url, None)
            else:
                for u in links:
                    admit(u, job.depth + 1, None, job.url, host)

        process_bucket = ray.remote(_process_bucket)
        budget_hit = False
        while heap and not budget_hit:
            # phase 1: replay as far as results allow
            while heap and heap[0][2].url in results:
                if cfg.max_pages is not None and len(trace) >= cfg.max_pages:
                    budget_hit = True
                    break
                consume(heapq.heappop(heap)[2])
            if budget_hit or not heap:
                break
            # phase 2: speculatively process the K lowest unprocessed jobs
            buf, batch = [], []
            while heap and len(batch) < cfg.round_batch:
                entry = heapq.heappop(heap)
                buf.append(entry)
                if entry[2].url not in results:
                    batch.append(entry[2])
            for entry in buf:
                heapq.heappush(heap, entry)
            by_bucket: dict[int, list[_Job]] = {}
            for job in batch:
                by_bucket.setdefault(self.store.bucket_for_url(job.url),
                                     []).append(job)
            refs = []
            for b, jobs in by_bucket.items():
                meta = {
                    "url_norm": [j.url for j in jobs],
                    "depth": [j.depth for j in jobs],
                    "job_type": [j.job_type for j in jobs],
                    "priority": [j.priority for j in jobs],
                    "parent_url": [j.parent for j in jobs],
                }
                refs.append(process_bucket.remote(
                    self.store.bucket_path(b), meta, extracted_dir,
                    f"round{stats['rounds']:06d}-b{b:04d}",
                    cfg.classify, cfg.ner_enabled, cfg.max_depth))
            for res in ray.get(refs):
                for url, ok, links, sm_kind in res:
                    results[url] = (ok, links, sm_kind)
            stats["rounds"] += 1
            if stats["rounds"] % cfg.checkpoint_every == 0:
                self._save_strict_ckpt(ckpt_path, heap, seen, trace, failed,
                                       last_vts, stats, seq_counter)

        self._save_strict_ckpt(ckpt_path, heap, seen, trace, failed,
                               last_vts, stats, seq_counter)
        trace_path = os.path.join(out_dir, "trace.parquet")
        pq.write_table(self._trace_table(trace), trace_path)
        # content parts come from the strict fallback rounds AND the
        # prefetch waves; order_of filters to strictly-visited urls and
        # the merge dedups per (hash, url), so overlap is harmless
        prefetch_ext = [
            os.path.join(self.work_dir, "strict", "prefetch", "wave", d,
                         "extracted")
            for d in sorted(os.listdir(os.path.join(
                self.work_dir, "strict", "prefetch", "wave")))
            if d.startswith("wave-")
            and os.path.exists(os.path.join(
                self.work_dir, "strict", "prefetch", "wave", d,
                "extracted"))
        ] if os.path.isdir(os.path.join(self.work_dir, "strict",
                                        "prefetch", "wave")) else []
        items_path = finalize_content_items(
            [extracted_dir] + prefetch_ext if os.path.isdir(extracted_dir)
            else prefetch_ext,
            os.path.join(out_dir, "content_items"),
            order_of={t["url_norm"]: t["order"] for t in trace},
            winner_broadcast_threshold=cfg.finalize_broadcast_threshold)
        stats["visited"] = len(trace)
        stats["seen"] = len(seen)
        # failed side table (M26): one row per failed attempt, the
        # on-disk form of the reference's CrawlState.failed_urls map
        # (core/crawler.py:224-259); consumed by failed_state()
        failed_path = os.path.join(out_dir, "failed.parquet")
        pq.write_table(pa.Table.from_pydict({
            "url_norm": pa.array([r["url_norm"] for r in failed],
                                 pa.string()),
            "job_type": pa.array([r.get("job_type") for r in failed],
                                 pa.string()),
            "error": pa.array([r.get("error") for r in failed],
                              pa.string()),
        }), failed_path)
        all_ext = (([extracted_dir] if os.path.isdir(extracted_dir)
                    else []) + prefetch_ext)
        summary = {"mode": "strict", "stats": stats,
                   "trace_path": trace_path,
                   "failed_path": failed_path,
                   "extracted_dirs": all_ext,
                   "content_items": items_path}
        with open(os.path.join(out_dir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2, default=str)
        return summary

    def _bfs_prefetch(self) -> dict[str, tuple]:
        """Run the wave engine (resumable, finalize skipped, links
        side-spilled) over the same corpus/config and return the replay
        food map url -> (fetch_ok, links, sm_kind)."""
        import dataclasses
        import glob as _glob

        from crawler_ray.pipelines.wave import run_wave_mode

        clone = CrawlEngine.__new__(CrawlEngine)
        clone.corpus_dir = self.corpus_dir
        clone.work_dir = os.path.join(self.work_dir, "strict", "prefetch")
        os.makedirs(clone.work_dir, exist_ok=True)
        clone.cfg = dataclasses.replace(
            self.cfg, spill_links=True, run_finalize=False, max_pages=None)
        clone.robots = self.robots
        clone.seed_urls = self.seed_urls
        clone._sitemaps_table = self._sitemaps_table
        clone.store = self.store
        run_wave_mode(clone, resume=True)

        out: dict[str, tuple] = {}
        files = sorted(_glob.glob(os.path.join(
            clone.work_dir, "wave", "wave-*", "links", "*.parquet")))
        max_depth = self.cfg.max_depth
        for f in files:
            t = pq.read_table(f)
            for url, links, sm_kind, ok in zip(
                    t["url_norm"].to_pylist(), t["links"].to_pylist(),
                    t["sm_kind"].to_pylist(), t["fetch_ok"].to_pylist()):
                out[url] = (ok, links or [], sm_kind or "")
        return out

    @staticmethod
    def _trace_table(trace: list[dict]) -> pa.Table:
        return pa.Table.from_pydict(
            {name: [t[name] for t in trace]
             for name in TRACE_SCHEMA.names}, schema=TRACE_SCHEMA)

    @staticmethod
    def _save_strict_ckpt(path, heap, seen, trace, failed, last_vts, stats,
                          seq_counter):
        tmp = path + ".tmp"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(tmp, "wb") as f:
            pickle.dump({"heap": heap, "seen": seen, "trace": trace,
                         "failed": failed, "last_vts": last_vts,
                         "stats": stats, "seq_counter": seq_counter}, f,
                        protocol=4)
        os.replace(tmp, path)


class _TraceSpill:
    """Side-effect stage inside the finalize execution: writes the
    column-pruned crawl-trace part for each batch (all fetch_ok rows,
    sitemaps included), then passes the batch through unchanged — the
    trace costs no extra read or execution."""

    COLS = ["url_norm", "depth", "job_type", "priority", "parent_url",
            "fetch_vts", "host", "wave"]

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def __call__(self, t: pa.Table) -> pa.Table:
        import hashlib

        import pyarrow.compute as pc
        keep = [c for c in self.COLS if c in t.column_names]
        part = t.filter(t["fetch_ok"]).select(keep)
        if part.num_rows:
            os.makedirs(self.out_dir, exist_ok=True)
            tag = f"{part['url_norm'][0].as_py()}|{part.num_rows}"
            name = hashlib.blake2b(tag.encode(),
                                   digest_size=10).hexdigest()
            tmp = os.path.join(self.out_dir, f".{name}.tmp")
            pq.write_table(part, tmp)
            os.replace(tmp, os.path.join(self.out_dir,
                                         f"part-{name}.parquet"))
        return t


# per-worker-process cache of the finalize winner-key index, keyed by
# the broadcast ObjectRef (module-level so reused worker processes keep
# it across build tasks; cleared when a new finalize broadcasts)
_BUILD_IDX_CACHE: dict = {}


def _winner_key(url_col, hash_col) -> pa.Array:
    """The composite finalize winner key.  ONE definition shared by the
    broadcast/store producers and the build consumer — a format drift
    between them would make index_in match nothing and silently write
    an empty content_items."""
    import pyarrow.compute as pc
    return pc.binary_join_element_wise(url_col, hash_col, "\x00")


def finalize_content_items(extracted_dir: str, out_dir: str,
                           order_of: dict[str, int] | None = None,
                           order_cols: list[str] | None = None,
                           trace_dir: str | None = None,
                           winner_broadcast_threshold: int = 2_000_000
                           ) -> str:
    """Dedup-upsert finalization (``core/storage.py:103-211``) in TWO
    phases so page content never crosses the shuffle:

    1. **Decide** — read only the small columns (url, similarity_hash,
       visit-order columns; ``similarity_hash IS NULL`` is exactly the
       empty-content filter, so content bytes stay on disk), spill the
       crawl trace as a side effect, and run the first-wins/last-update
       merge per hash over a bucketed groupby of ~60 B rows.
    2. **Build** — broadcast the winner map (last-visited url -> merged
       attributes) and stream the full parts once: rows whose url is a
       winner pick up their attributes and are written directly.  URLs
       are unique across parts (wave admission dedups; strict fallback
       parts are disjoint from prefetch parts by construction), so no
       content ever shuffles.

    Semantics: within each similarity_hash group the first-visited row
    wins the insert (keeps url), the last-visited row's
    title/content/content_type/meta overwrite (update semantics).
    ``order_of``: visit order per url (strict mode; broadcast via
    ``ray.put``).  ``order_cols``: columns already on the rows that sort
    lexicographically in visit order (wave mode).

    The winner map is one small row per distinct hash, keyed by the
    composite ``(last_url, similarity_hash)`` — unique by construction
    (one winner per hash), and it stays correct even on anomalous
    spills where one url appears with two different hashes (overlapping
    resume runs whose content changed): each content version matches
    exactly its own hash's winner instead of colliding on the url.  At
    or under ``winner_broadcast_threshold`` winners the map ships once
    via ``ray.put``; above it the winners spill KEY-SORTED to
    range-partitioned parquet and each build task does a file-range +
    row-group pruned point read for its batch's keys (url-clustered by
    the spill layout, so O(1) files per batch) — the winner table never
    lands on the driver, and content STILL never shuffles (a
    ``Dataset.join`` here would repartition the content rows, the
    exact cost the two-phase design exists to avoid).  Set the
    threshold to 0 to force the store path (the pytest equivalence
    test does).
    """
    import glob as _glob

    import pandas as pd
    import ray
    import ray.data as rd

    dirs = ([extracted_dir] if isinstance(extracted_dir, str)
            else list(extracted_dir))
    files = sorted(f for d in dirs
                   for f in _glob.glob(os.path.join(d, "**", "*.parquet"),
                                       recursive=True))
    import pyarrow.parquet as _pq
    have = {f.name for f in _pq.read_schema(files[0])}
    sort_cols = ["__order"] if order_of is not None else list(order_cols)

    # -- phase 1: decide winners (small columns only) -----------------------
    small_need = ({"url_norm", "similarity_hash", "fetch_ok"}
                  | set(_TraceSpill.COLS) | set(order_cols or []))
    ds = rd.read_parquet(files, columns=sorted(small_need & have))
    if trace_dir is not None:
        shutil.rmtree(trace_dir, ignore_errors=True)
        ds = ds.map_batches(_TraceSpill(trace_dir), batch_format="pyarrow")
    if order_of is not None:
        # broadcast the visit-order map as an arrow table (zero-copy
        # per task; a dict would re-unpickle in every decide batch)
        order_ref = ray.put(pa.table({
            "url_norm": pa.array(list(order_of.keys()), pa.string()),
            "__order": pa.array(list(order_of.values()), pa.int64()),
        }).combine_chunks())

    def decide_prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.and_(t["fetch_ok"],
                             pc.is_valid(t["similarity_hash"])))
        keep = ["url_norm", "similarity_hash"] + [
            c for c in (order_cols or [])
            if c in t.column_names and c not in ("url_norm",
                                                 "similarity_hash")]
        return t.select(keep)

    ds = ds.map_batches(decide_prep, batch_format="pyarrow")

    def attach_order(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        o = ray.get(order_ref)
        idx = pc.index_in(t["url_norm"], value_set=o["url_norm"])
        t = t.append_column("__order", o["__order"].take(idx))
        return t.filter(pc.is_valid(idx))

    if order_of is not None:
        ds = ds.map_batches(attach_order, batch_format="pyarrow")

    def decide_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["similarity_hash"] + sort_cols,
                          kind="mergesort")
        g = g.drop_duplicates(subset=["similarity_hash", "url_norm"],
                              keep="first")
        firsts = g.drop_duplicates(subset=["similarity_hash"],
                                   keep="first").set_index(
                                       "similarity_hash")
        lasts = g.drop_duplicates(subset=["similarity_hash"],
                                  keep="last").set_index("similarity_hash")
        counts = g.groupby("similarity_hash", sort=False).size()
        out = pd.DataFrame({"url": firsts["url_norm"],
                            "last_url": lasts["url_norm"],
                            "n_versions": counts})
        for c in sort_cols:
            out[f"first_{c}"] = firsts[c]
        return out.reset_index(names="similarity_hash")

    def add_merge_bucket(t: pa.Table) -> pa.Table:
        b = [int(h[:4], 16) % 64 for h in
             t["similarity_hash"].to_pylist()]
        return t.append_column("merge_bucket", pa.array(b, pa.int32()))

    import time as _time
    _t0 = _time.time()
    # planner decision for the decide merge: the broadcast path below
    # collects the winner map (one row per distinct hash) to the driver
    # anyway, so when even the UNmerged decide input (>= winners) fits
    # the same threshold, run one execution for trace-spill + prep,
    # collect the small columns, and decide driver-side — the
    # 64-bucket all-to-all shuffle's fixed cost dominates at small
    # scale.  Row count is a metadata-only footer scan.  Above the
    # threshold (or on an empty input) the bucketed groupby does the
    # work and nothing lands on the driver.  Both paths run the same
    # decide_bucket, so winners are bit-identical (pytest-pinned).
    n_small_rows = sum(pq.read_metadata(f).num_rows for f in files)
    winners_ds = None
    if n_small_rows <= winner_broadcast_threshold:
        blocks = [b for b in ray.get(ds.to_arrow_refs()) if b.num_rows]
        if blocks:
            small_pd = pa.concat_tables(blocks).to_pandas()
            decided = decide_bucket(small_pd)
            winners_ds = rd.from_arrow(
                pa.Table.from_pandas(decided, preserve_index=False))
    if winners_ds is None:
        winners_ds = (ds.map_batches(add_merge_bucket,
                                     batch_format="pyarrow")
                      .groupby("merge_bucket")
                      .map_groups(
                          lambda g: decide_bucket(
                              g.drop(columns=["merge_bucket"])),
                          batch_format="pandas")
                      # coerce blocks to arrow: the decide merge ran in
                      # pandas, but the store spill needs a pa.Schema
                      .map_batches(lambda t: t, batch_format="pyarrow")
                      .materialize())
    _t_decide = _time.time() - _t0
    win_schema = winners_ds.schema()
    attr_cols = [c for c in win_schema.names
                 if c not in ("last_url", "winner_key")]
    n_winners = winners_ds.count()
    winner_store_root = None
    if n_winners <= winner_broadcast_threshold:
        import pyarrow.compute as pc
        blocks = [b for b in ray.get(winners_ds.to_arrow_refs())
                  if b.num_rows]  # empty blocks carry degenerate schemas
        wt = (pa.concat_tables([b.select(win_schema.names)
                                for b in blocks]) if blocks
              else win_schema.base_schema.empty_table())
        wt = wt.append_column(
            "winner_key", _winner_key(wt["last_url"],
                                      wt["similarity_hash"]))
        # broadcast as ONE arrow table: arrow ships zero-copy from the
        # object store, so every build task reads the shared buffer
        # instead of re-unpickling a dict/DataFrame per batch (measured
        # ~10 s of the 160k-page finalize before this)
        win_ref = ray.put(wt.combine_chunks())

        def lookup(keys: pa.Array) -> tuple[pa.Array, pa.Table]:
            w = ray.get(win_ref)
            # pc.index_in rebuilds its hash set from the full value_set
            # on EVERY call (~120 ms at 450k winners — hundreds of core
            # seconds across a run's batches), so build the key index
            # once per worker process instead; per-batch cost is then a
            # few thousand dict hits (<1 ms)
            key_idx = _BUILD_IDX_CACHE.get(win_ref.hex())
            if key_idx is None:
                _BUILD_IDX_CACHE.clear()  # one finalize at a time
                key_idx = {k: i for i, k in
                           enumerate(w["winner_key"].to_pylist())}
                # key by the ref's hex, not the ObjectRef itself — a
                # held ObjectRef would pin the broadcast table in the
                # object store long after the finalize ends
                _BUILD_IDX_CACHE[win_ref.hex()] = key_idx
            pos = [key_idx.get(k) for k in keys.to_pylist()]
            picked = w.take(pa.array(
                [p for p in pos if p is not None],
                pa.int64())).select(attr_cols)
            return pa.array([p is not None for p in pos]), picked
    else:
        # winner table too big to broadcast: spill it KEY-SORTED as
        # range-partitioned parquet (one distributed sort of the SMALL
        # winner table — content still never shuffles) and point-read
        # per batch with file-range + row-group pruning.  The key is
        # url-major and content spill parts are (host, url)-clustered,
        # so each build batch's key range overlaps O(1) winner files.
        # (A hash-partitioned store was tried first and sent every
        # batch to every partition: 144k winners took >30x the
        # broadcast path; range layout restores the locality.)
        import glob as _g

        def add_winner_key(t: pa.Table) -> pa.Table:
            return t.append_column(
                "winner_key", _winner_key(t["last_url"],
                                          t["similarity_hash"]))

        winner_store_root = out_dir.rstrip("/") + ".winners"
        shutil.rmtree(winner_store_root, ignore_errors=True)
        (winners_ds.map_batches(add_winner_key, batch_format="pyarrow")
         .sort("winner_key")
         .write_parquet(winner_store_root, row_group_size=4096))
        win_full_schema = win_schema.base_schema.append(
            pa.field("winner_key", pa.string()))
        # per-file key ranges: exact min/max over each file's key
        # column, computed in parallel Ray tasks — no reliance on
        # within-file sort order (an undocumented writer invariant) or
        # on parquet string footer stats (which may be truncated).
        # File count is O(sort output blocks), not O(winners).

        @ray.remote
        def _key_range(p: str):
            import pyarrow.compute as pc
            import pyarrow.parquet as pq
            t = pq.read_table(p, columns=["winner_key"])
            if t.num_rows == 0:
                return None
            mm = pc.min_max(t["winner_key"]).as_py()
            return (p, mm["min"], mm["max"])

        files_w = sorted(_g.glob(
            os.path.join(winner_store_root, "*.parquet")))
        ranges = [r for r in ray.get([_key_range.remote(p)
                                      for p in files_w])
                  if r is not None]
        ranges_ref = ray.put(ranges)

        def lookup(keys: pa.Array) -> tuple[pa.Array, pa.Table]:
            import pyarrow.compute as pc
            import pyarrow.dataset as pads
            ask = sorted(keys.drop_null().to_pylist())
            paths = []
            if ask:
                lo, hi = ask[0], ask[-1]
                paths = [p for p, mn, mx in ray.get(ranges_ref)
                         if not (mx < lo or mn > hi)]
            if paths:
                filt = ((pc.field("winner_key") >= lo)
                        & (pc.field("winner_key") <= hi)
                        & pc.field("winner_key").isin(ask))
                w = pads.dataset(paths).to_table(filter=filt)
            else:
                w = win_full_schema.empty_table()
            idx = pc.index_in(keys, value_set=w["winner_key"])
            picked = w.take(idx.drop_null()).select(attr_cols)
            return pc.is_valid(idx), picked

    # -- phase 2: stream content once, no shuffle ---------------------------
    big_need = {"url_norm", "similarity_hash", "title", "content",
                "content_type", "date", "author", "entities_json",
                "domains"}
    ds2 = rd.read_parquet(files, columns=sorted(big_need & have))

    def build(t: pa.Table) -> pa.Table:
        import json as _json
        import pyarrow.compute as pc
        keys = _winner_key(t["url_norm"], t["similarity_hash"])
        valid, picked = lookup(keys)
        t = t.filter(valid)
        dom = pa.array([_json.dumps(d, ensure_ascii=False)
                        for d in t["domains"].to_pylist()], pa.string())
        out = pa.table({
            "similarity_hash": picked["similarity_hash"].cast(pa.string()),
            "url": picked["url"].cast(pa.string()),
            "title": t["title"], "content": t["content"],
            "content_type": t["content_type"], "date": t["date"],
            "author": t["author"], "entities_json": t["entities_json"],
            "domains_json": dom,
            "n_versions": picked["n_versions"].cast(pa.int64()),
        })
        for c in sort_cols:
            out = out.append_column(f"first_{c}", picked[f"first_{c}"])
        return out

    # batch_size coalesces the many tiny spill-part blocks (~170 rows
    # each at 160k pages) so per-batch fixed lookup costs amortize
    items = ds2.map_batches(build, batch_format="pyarrow",
                            batch_size=4096)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    _t1 = _time.time()
    items.write_parquet(out_dir)
    if os.environ.get("GRAFT_FINALIZE_STATS"):
        print(f"finalize: decide={_t_decide:.2f}s "
              f"broadcast={_t1 - _t0 - _t_decide:.2f}s "
              f"build={_time.time() - _t1:.2f}s n_winners={n_winners}")
    if winner_store_root is not None:
        shutil.rmtree(winner_store_root, ignore_errors=True)
    # invariant: each winner is built from exactly its last-visit row,
    # so output rows == winners.  More rows means the same
    # (url, similarity_hash) content row appeared in two spill parts
    # (overlapping resume spills with unchanged content) — fail loudly
    # instead of shipping silent duplicates.  Metadata-only check.
    n_out = sum(pq.read_metadata(os.path.join(out_dir, f)).num_rows
                for f in os.listdir(out_dir) if f.endswith(".parquet"))
    if n_out != n_winners:
        raise ValueError(
            f"finalize wrote {n_out} content items for {n_winners} "
            f"winners — duplicate (url, similarity_hash) rows across "
            f"extracted parts; re-run the crawl fresh (overlapping "
            f"resume spills)")
    return out_dir
