"""Sharded frontier-admission actors: URL-seen + in-wave dedup +
politeness stamping in one keyed actor pool.

The wave pipeline's two all-to-all shuffles (in-wave first-discoverer
dedup and the per-host politeness groupby) both key on ``hash(host) % S``
— exactly the URL-seen sharding the north rule prescribes.  Folding them
into the seen shards turns two Ray sorts per wave into batched actor RPCs
(`propose`) plus one commit round, with these invariants:

- **propose** (during the wave's streaming execution): for each candidate
  row, skip if the digest is already seen (previous waves), else keep the
  row with the *minimum* tie-break key ``(parent_priority, parent_url,
  link_index)`` — the first-discoverer rule of the serial oracle
  (``pipelines/oracle.py``; reference admission ``core/crawler.py:685-749``).
  Min-merge is commutative/idempotent, so proposal order, batch
  boundaries, and Ray task retries cannot change the winner.
- **commit** (once per wave, after the pipeline drains): admitted rows =
  all distinct proposed digests; mark them seen; per host (a host lives
  on exactly one shard) sort by ``(priority, url_norm)`` and stamp
  ``fetch_vts = base + rank*delay`` continuing the host's virtual-time
  clock (politeness semantics of ``utils/http.py:200-226`` in virtual
  time; misses still consume slots, matching the oracle's stamp-then-
  check order).  Each shard writes its frontier part directly — the next
  wave's input needs no further shuffle.

Snapshot/restore covers seen + clocks (proposals are always empty at
snapshot time), giving the same per-wave lineage/resume as before.

Mega-host skew: extraction/fetch parallelism is host-independent (fused
map tasks over fixed-size batches — the salted-repartition effect the
north rule asks for, by construction), but a host's COMMIT (sort + vts
stamping of its admitted rows) would be serial within its shard.  Hosts
whose admitted row count exceeds ``host_split_threshold`` are therefore
range-split by (priority, url_norm) segments (split points sampled
deterministically) and each segment sorts + stamps in its own Ray helper
task with ``vts = base + (segment_offset + i) * delay`` — rank arithmetic
is unchanged, so the stamps are bit-identical to the serial path
(``tests/test_state.py`` pins that equality and the conformance suite
runs with the split forced on).
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawler_ray.sources.robots import RobotsTable
from crawler_ray.state.url_seen import BloomFilter, CuckooFilter, make_filter

__all__ = ["AdmissionShardCore", "AdmissionPool", "FRONTIER_FIELDS"]

FRONTIER_FIELDS = [
    ("url_norm", pa.string()), ("host", pa.string()),
    ("host_hash", pa.uint64()), ("url_digest", pa.binary()),
    ("depth", pa.int32()), ("job_type", pa.string()),
    ("priority", pa.int32()), ("parent_url", pa.string()),
    ("fetch_vts", pa.float64()),
]


def _sort_rank_segment(rows: list[tuple]) -> list[tuple]:
    """Sort one (priority, url_norm) range segment of a mega-host's
    admitted rows.  Pure function so it runs identically inline or as a
    Ray helper task."""
    rows.sort(key=lambda r: (r[6], r[0]))
    return rows


def _stamp_host_rows(hrows: list[tuple], base: float, delay: float,
                     split_threshold: int | None,
                     use_ray: bool) -> list[tuple]:
    """Stamp ``fetch_vts = base + rank * delay`` over the host's rows
    ranked by (priority, url_norm).  Below the threshold: one serial
    sort.  Above it: range-split into contiguous (priority, url_norm)
    segments via deterministically sampled split points; each segment
    sorts independently (Ray tasks when available) and stamps with
    ``base + (segment_offset + i) * delay`` — global ranks, and
    therefore vts values, are identical to the serial path regardless
    of where the split points land."""
    n = len(hrows)
    if split_threshold is None or n <= split_threshold:
        hrows.sort(key=lambda r: (r[6], r[0]))
        return [r + (base + i * delay,) for i, r in enumerate(hrows)]

    import bisect
    n_seg = -(-n // split_threshold)  # ceil
    keys = [(r[6], r[0]) for r in hrows]
    # deterministic sample -> exact quantile split points of the sample
    stride = max(1, n // (n_seg * 32))
    sample = sorted(keys[::stride])
    cuts = [sample[(len(sample) * j) // n_seg] for j in range(1, n_seg)]
    segments: list[list[tuple]] = [[] for _ in range(n_seg)]
    for key, row in zip(keys, hrows):
        segments[bisect.bisect_left(cuts, key)].append(row)
    if use_ray:
        import ray
        task = ray.remote(num_cpus=1)(_sort_rank_segment)
        sorted_segs = ray.get([task.remote(s) for s in segments])
    else:
        sorted_segs = [_sort_rank_segment(s) for s in segments]
    out: list[tuple] = []
    offset = 0
    for seg in sorted_segs:
        out.extend(r + (base + (offset + i) * delay,)
                   for i, r in enumerate(seg))
        offset += len(seg)
    return out


class AdmissionShardCore:
    """One shard (plain Python; wrapped by ray.remote in the pool)."""

    def __init__(self, mode: str = "exact", expected_keys: int = 1 << 20,
                 bits_per_key: int = 12,
                 robots: RobotsTable | None = None,
                 default_delay: float = 1.0,
                 host_split_threshold: int | None = 200_000):
        self.mode = mode
        self._set: set[bytes] | None = set() if mode == "exact" else None
        self._filter = (None if mode == "exact"
                        else make_filter(mode, expected_keys, bits_per_key))
        self.n_added = 0
        self.robots = robots or RobotsTable(default_delay=default_delay)
        self.host_split_threshold = host_split_threshold
        self.last_vts: dict[str, float] = {}
        # digest -> (tiebreak, row tuple)
        self._proposals: dict[bytes, tuple] = {}

    # -- membership ---------------------------------------------------------
    def _seen(self, digest: bytes) -> bool:
        if self.mode == "exact":
            return digest in self._set
        if isinstance(self._filter, CuckooFilter):
            return self._filter.contains(digest)
        pos = self._filter._positions(digest)
        masks = np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8))
        return bool(np.all(self._filter.bits[pos >> 3] & masks))

    def _mark(self, digest: bytes) -> None:
        if self.mode == "exact":
            self._set.add(digest)
        else:
            self._filter.check_and_add(digest)
        self.n_added += 1

    def contains(self, digests: list[bytes]) -> list[bool]:
        return [self._seen(d) for d in digests]

    def count(self) -> int:
        return self.n_added

    # -- two-phase admission ------------------------------------------------
    def propose(self, cols: dict[str, list]) -> int:
        """Min-merge candidate rows into the wave's proposal buffer.
        ``cols``: equal-length lists for url_norm/host/host_hash/
        url_digest/depth/job_type/priority/parent_url plus the tie-break
        columns parent_priority/link_index.  Returns rows retained."""
        kept = 0
        proposals = self._proposals
        for (norm, host, hh, digest, depth, jt, prio, parent,
             pprio, lidx) in zip(
                cols["url_norm"], cols["host"], cols["host_hash"],
                cols["url_digest"], cols["depth"], cols["job_type"],
                cols["priority"], cols["parent_url"],
                cols["parent_priority"], cols["link_index"]):
            if self._seen(digest):
                continue
            key = (pprio, parent or "", lidx)
            cur = proposals.get(digest)
            if cur is None or key < cur[0]:
                proposals[digest] = (
                    key, (norm, host, hh, digest, depth, jt, prio, parent))
                kept += 1
        return kept

    def commit(self, out_dir: str | None, shard_id: int) -> int:
        """Admit all proposed rows: mark seen, stamp per-host politeness
        virtual timestamps, write this shard's frontier part.  Returns
        the number of admitted rows."""
        rows = [r for _, r in self._proposals.values()]
        self._proposals = {}
        for r in rows:
            self._mark(r[3])
        if not rows:
            return 0
        # per-host vts: sort by (priority, url_norm) inside each host and
        # continue the host clock — identical ranks to the wave-global
        # (priority, url_norm) visit order of the BFS oracle
        by_host: dict[str, list] = {}
        for r in rows:
            by_host.setdefault(r[1], []).append(r)
        try:
            import ray
            use_ray = ray.is_initialized()
        except ImportError:      # pragma: no cover
            use_ray = False
        stamped: list[tuple] = []
        for host, hrows in by_host.items():
            d = self.robots.delay(host)
            last = self.last_vts.get(host)
            base = 0.0 if last is None else last + d
            self.last_vts[host] = base + (len(hrows) - 1) * d
            stamped.extend(_stamp_host_rows(
                hrows, base, d, self.host_split_threshold, use_ray))
        if out_dir is not None:
            # physical row order is free (vts is already a column): sort
            # by (host, url) so fetch batches hit contiguous runs of the
            # url-sorted corpus buckets — minimal row-group decompression
            stamped.sort(key=lambda r: (r[1], r[0]))
            names = [n for n, _ in FRONTIER_FIELDS]
            table = pa.Table.from_pydict(
                {n: [r[i] for r in stamped]
                 for i, n in enumerate(names)},
                schema=pa.schema(FRONTIER_FIELDS))
            os.makedirs(out_dir, exist_ok=True)
            tmp = os.path.join(out_dir, f".part-{shard_id:04d}.tmp")
            pq.write_table(table, tmp)
            os.replace(tmp, os.path.join(out_dir,
                                         f"part-{shard_id:04d}.parquet"))
        return len(stamped)

    # -- checkpoint ---------------------------------------------------------
    def snapshot(self, path: str) -> str:
        state = {"mode": self.mode, "n_added": self.n_added,
                 "last_vts": self.last_vts}
        if self.mode == "exact":
            state["set"] = self._set
        else:
            state["filter"] = self._filter.state()
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(state, f, protocol=4)
        os.replace(tmp, path)
        return path

    def restore(self, path: str) -> int:
        with open(path, "rb") as f:
            state = pickle.load(f)
        self.mode = state["mode"]
        self.n_added = state["n_added"]
        self.last_vts = state["last_vts"]
        self._proposals = {}
        if self.mode == "exact":
            self._set = state["set"]
            self._filter = None
        else:
            cls = CuckooFilter if self.mode == "cuckoo" else BloomFilter
            self._filter = cls.from_state(state["filter"])
            self._set = None
        return self.n_added


class AdmissionPool:
    """S-shard admission pool, routing key ``host_hash % S`` (a host's
    URL-seen membership, in-wave dedup, and politeness clock live on one
    shard).  Propose RPCs are batched one-per-shard-per-batch; commit is
    one RPC per shard per wave."""

    def __init__(self, num_shards: int = 8, mode: str = "exact",
                 expected_keys_per_shard: int = 1 << 20,
                 bits_per_key: int = 12,
                 robots: RobotsTable | None = None,
                 default_delay: float = 1.0, num_cpus: float = 0.1,
                 host_split_threshold: int | None = 200_000):
        import ray
        self.num_shards = num_shards
        actor_cls = ray.remote(num_cpus=num_cpus)(AdmissionShardCore)
        self.shards = [
            actor_cls.remote(mode=mode,
                             expected_keys=expected_keys_per_shard,
                             bits_per_key=bits_per_key, robots=robots,
                             default_delay=default_delay,
                             host_split_threshold=host_split_threshold)
            for _ in range(num_shards)
        ]

    _PROPOSE_COLS = ["url_norm", "host", "host_hash", "url_digest",
                     "depth", "job_type", "priority", "parent_url",
                     "parent_priority", "link_index"]

    def propose(self, table: pa.Table) -> int:
        """Batched propose: one RPC per shard touched by this table."""
        import ray
        if table.num_rows == 0:
            return 0
        hh = table["host_hash"].to_numpy(zero_copy_only=False)
        shard_ids = (hh % np.uint64(self.num_shards)).astype(np.int64)
        cols = {c: table[c].to_pylist() for c in self._PROPOSE_COLS}
        refs = []
        for sid in np.unique(shard_ids):
            idxs = np.nonzero(shard_ids == sid)[0]
            sub = {c: [cols[c][i] for i in idxs]
                   for c in self._PROPOSE_COLS}
            refs.append(self.shards[int(sid)].propose.remote(sub))
        return sum(ray.get(refs))

    def commit(self, out_dir: str | None) -> int:
        import ray
        return sum(ray.get([
            s.commit.remote(out_dir, i)
            for i, s in enumerate(self.shards)]))

    def counts(self) -> list[int]:
        import ray
        return ray.get([s.count.remote() for s in self.shards])

    def snapshot(self, directory: str) -> list[str]:
        import ray
        os.makedirs(directory, exist_ok=True)
        return ray.get([
            s.snapshot.remote(os.path.join(directory, f"adm-{i:04d}.pkl"))
            for i, s in enumerate(self.shards)
        ])

    def restore(self, directory: str) -> int:
        import ray
        return sum(ray.get([
            s.restore.remote(os.path.join(directory, f"adm-{i:04d}.pkl"))
            for i, s in enumerate(self.shards)
        ]))

    def shutdown(self) -> None:
        import ray
        for s in self.shards:
            ray.kill(s)
        self.shards = []
