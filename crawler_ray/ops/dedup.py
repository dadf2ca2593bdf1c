"""Deduplication operators — exact, similarity-hash, MinHash+LSH, SimHash,
embedding-cosine.  These are first-class components of a training-data
pipeline at 100 TB (and generalize the reference's D1-D3 dedup semantics,
``core/crawler.py:199-222`` / ``models/content.py:70-102``).

Scale shapes:
- exact / similarity-hash: one vectorized hashing ``map_batches`` pass,
  then a hash-keyed ``groupby`` where each group keeps the first-wins row
  — the only shuffle is on the 16-byte hash key.
- MinHash+LSH: shingle -> 128-perm signature per batch (numpy universal
  hashing, no Python per-shingle loop), explode to (shard, band_hash)
  rows — shard = (band, band_hash prefix) so banding groups stay
  bounded at any corpus size — groupby on the shard key, per-bucket
  candidate pairs verified by signature agreement — classic SRCH04
  LSH; only signatures shuffle, never documents.
- SimHash: 64-bit signatures; candidates blocked on 4x16-bit sub-bands
  (any pair with Hamming distance <= 3 shares at least one exact sub-band
  by pigeonhole), verified by popcount.
- embedding-cosine: label-blocked exact pairs (blocking key stands in for
  an IVF/LSH bucket at scale; see ``ops/similarity.py`` for the ANN path).
"""

from __future__ import annotations

import functools
import hashlib
import inspect
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["exact_dedup", "similarity_dedup", "minhash_signatures",
           "minhash_lsh_pairs", "simhash_pairs", "embedding_dup_pairs",
           "minhash_dedup_keep", "ngram_jaccard_pairs"]

_WORD_RE = re.compile(r"\w+")


def _rd():
    import ray.data as rd
    return rd


def _join_partitions(requested: int | None,
                     approx_rows: int | None = None) -> int:
    """Partition count for hash joins: scale with the cluster AND the
    data.  Join aggregator actors reserve ~0.125 CPU + memory per
    partition; a fixed large count deadlocks small clusters (two
    chained 16-partition joins starve a 4-CPU test session), while a
    fixed small count under-splits at scale.  The cluster cap is
    P = #CPUs (each join ~1/8 of the cluster); when the caller knows
    the bigger side's row count (parquet metadata or a materialized
    aggregate — both free), partitions are further bounded to
    ~64k rows each so aggregate-sized joins don't pay 32 actors of
    startup to shuffle a few thousand rows."""
    if requested is not None:
        return requested
    import ray
    cpus = (ray.cluster_resources().get("CPU", 8)
            if ray.is_initialized() else 8)
    cap = max(2, min(64, int(cpus)))
    if approx_rows is not None:
        return max(2, min(cap, approx_rows // 65536 + 1))
    return cap


def _join_ready(ds, schema: pa.Schema):
    """Materialize an aggregate output and strip its schema-less empty
    blocks before feeding a ``Dataset.join``.  Ray's groupby-aggregate
    emits zero-row blocks with NO schema for empty hash partitions, and
    ``map_batches`` passes empty blocks through without invoking the UDF
    (so they cannot be re-schema'd in-stream); a join aggregator that
    receives one fails inside ``pyarrow.Table.join`` with 'No match ...
    for key field reference'.  Dropping the empty blocks (their row
    contribution is nil) leaves every block carrying the real schema.
    The materialize is not an extra barrier in practice — the aggregate
    itself is already an all-to-all fence."""
    import ray.data as rd
    mat = ds.materialize()
    refs = [block_ref
            for bundle in mat.iter_internal_ref_bundles()
            for block_ref, meta in bundle.blocks
            if (meta.num_rows or 0) > 0]
    if not refs:
        return rd.from_arrow(schema.empty_table())
    return rd.from_arrow_refs(refs)


# -- vectorized engine-internal hashing -------------------------------------
# These hashes only need to be deterministic and well-mixed (the LSH /
# SimHash outputs are rows-only checked); crc32 (C speed) diffused through
# splitmix64 replaces per-token blake2b, and shingle hashes come from a
# windowed polynomial over token hashes instead of hashing shingle strings.

def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


_TOKEN_HASH_CACHE: dict[str, int] = {}
_TOKEN_HASH_CACHE_MAX = 2_000_000

_PAIRS_MEMO: dict[tuple, object] = {}


def _pairs_memo(src: str):
    """Memoize an operator's MATERIALIZED pair Dataset per (bound args,
    source-file fingerprint, Ray job).  The ``*_dedup_keep`` operators
    otherwise re-run the entire pair pipeline their ``*_pairs`` sibling
    just computed — the driver suite runs both back to back, and
    ``simhash_dedup_keep`` alone re-paid 10-12 s of a ~50 s sf0.1
    suite.  ``src`` names the input parquet inside ``sf_dir`` (the
    sentinel ``"table"`` resolves the operator's ``table`` argument);
    the (path, mtime_ns, size) fingerprint invalidates rewritten
    inputs, the job id keeps a Dataset from an earlier Ray session
    from being served, and an uninitialized Ray passes through
    unmemoized so a bare library call keeps its lazy shape.  Entries
    are pair tables (near-dup pairs only — small by construction), so
    cache growth is bounded by distinct (op, params) calls per
    session.  ``join_partitions`` is normalized through
    ``_join_partitions`` so the keep's resolved value and a caller's
    ``None`` hit the same entry."""
    def deco(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            import ray
            if not ray.is_initialized():
                return fn(*args, **kwargs)
            bound = sig.bind(*args, **kwargs)
            bound.apply_defaults()
            items = dict(bound.arguments)
            sf_dir = items.pop("sf_dir")
            name = (f"{items.get('table', 'documents')}.parquet"
                    if src == "table" else src)
            path = os.path.join(sf_dir, name)
            if "join_partitions" in items:
                items["join_partitions"] = _join_partitions(
                    items["join_partitions"])
            st = os.stat(path)
            key = (fn.__name__, os.path.abspath(path), st.st_mtime_ns,
                   st.st_size, tuple(sorted(items.items())),
                   ray.get_runtime_context().get_job_id())
            hit = _PAIRS_MEMO.get(key)
            if hit is None:
                hit = fn(*args, **kwargs).materialize()
                _PAIRS_MEMO[key] = hit
            return hit
        return wrapper
    return deco

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count): byte
    LUT over the raw view."""
    return (_POP8[np.ascontiguousarray(x).view(np.uint8)]
            .reshape(len(x), 8).sum(axis=1).astype(np.int64))


def _ragged_pairs(group_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-group (i < j) index pairs over a SORTED group-id array,
    fully vectorized (the ragged-triu cumsum/repeat trick) — replaces the
    per-bucket Python pair loops in every LSH banding operator.  Returns
    (left_idx, right_idx) into the input order; memory is O(total pairs),
    never O(bucket^2) per bucket."""
    n = len(group_ids)
    empty = np.empty(0, dtype=np.int64)
    if n < 2:
        return empty, empty
    starts = np.flatnonzero(np.r_[True, group_ids[1:] != group_ids[:-1]])
    counts = np.diff(np.r_[starts, n])
    group_start = np.repeat(starts, counts)         # per element
    pos = np.arange(n) - group_start                 # position in group
    total = int(pos.sum())
    if total == 0:
        return empty, empty
    rights = np.repeat(np.arange(n, dtype=np.int64), pos)
    first_pair = np.cumsum(pos) - pos                # pair offset per elt
    lefts = (np.arange(total, dtype=np.int64)
             - np.repeat(first_pair, pos)
             + np.repeat(group_start, pos))
    return lefts, rights


def _sorted_lookup(ids: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Resolve ``keys`` to row positions in the id-sorted ``ids`` via
    one vectorized searchsorted, failing LOUDLY on any miss — a plain
    searchsorted returns the insertion point (a silent wrong row) where
    the dict it replaced raised KeyError.  Unconditional check, not an
    assert: it must survive ``python -O``."""
    pos = np.searchsorted(ids, keys)
    safe = np.minimum(pos, max(len(ids) - 1, 0))
    if len(ids) == 0 or not (ids[safe] == keys).all():
        missing = keys if len(ids) == 0 else keys[ids[safe] != keys]
        raise KeyError(f"{len(missing)} lookup keys missing from the "
                       f"broadcast table (first: {missing[:3]})")
    return pos


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """md5 low-64 per token (== DuckDB's
    ``('0x'||substr(md5(tok),1,16))::UBIGINT`` — the property that makes
    every consumer SQL-twinnable), amortized by a per-process vocabulary
    cache: each distinct token is hashed once per worker lifetime, so on
    Zipf webtext the md5 cost tends to zero.  Bounded so a 100-TB shard
    cannot grow the cache without limit."""
    cache = _TOKEN_HASH_CACHE
    if len(cache) > _TOKEN_HASH_CACHE_MAX:
        cache.clear()
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = cache.get(t)
        if h is None:
            h = int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8],
                               "big")
            cache[t] = h
        out[i] = h
    return out


# ---------------------------------------------------------------------------
# exact + similarity-hash dedup
# ---------------------------------------------------------------------------

def exact_dedup(sf_dir: str, table: str = "documents",
                id_col: str = "doc_id", text_col: str = "text"):
    """Exact dedup (D1 analog): md5 of the raw text; min-id wins each
    hash group.  Output: (text_hash, doc_id winner, n_copies).

    Grouping runs on the md5-low64 bit-cast key through the hash-range
    exchange (``ops/exchange.py`` — a sort-based groupby over 1M unique
    md5 STRINGS measured 21 s at 1M docs, the exchange ~4 s) with the
    hex digest carried as a payload column; two texts colliding on the
    low 64 bits would merge groups, the module's documented ~2^-64
    approximation."""
    from crawler_ray.ops.exchange import exchange_reduce

    ds = _rd().read_parquet(f"{sf_dir}/{table}.parquet",
                            columns=[id_col, text_col])

    def partial(t: pa.Table) -> pa.Table:
        from crawler_ray.ops.hashkeys import md5_hex_and_key64
        hexes, k64 = md5_hex_and_key64(t[text_col])
        h64 = k64.view(np.int64)
        order = np.argsort(h64, kind="stable")
        return pa.table({
            "h64": pa.array(h64[order], pa.int64()),
            "doc_id": pa.array(
                t[id_col].to_numpy()[order], pa.int64()),
            "n_copies": pa.array(np.ones(len(order), np.int64),
                                 pa.int64()),
            "text_hash": hexes.take(pa.array(order)),
        })

    part = ds.map_batches(partial, batch_format="pyarrow").materialize()
    _, refs = exchange_reduce(part, "h64", sum_cols=("n_copies",),
                              min_cols=("doc_id",),
                              first_cols=("text_hash",))
    return (_rd().from_arrow_refs(refs)
            .select_columns(["text_hash", "doc_id", "n_copies"]))


def similarity_dedup(sf_dir: str):
    """Similarity-hash dedup, SQL-checkable form of M18/D3
    (``models/content.py:70-102``): md5 of the first 1000 chars of the
    whitespace-collapsed text.  (The full Persian normalization variant is
    pytest-verified against the serial oracle; this query uses the
    SQL-expressible simple normalization so DuckDB can replay it.)

    Grouping runs on the md5-low64 bit-cast key through the hash-range
    exchange with the hex digest as payload — same plan and collision
    convention as ``exact_dedup``."""
    from crawler_ray.ops.exchange import exchange_reduce

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        from crawler_ray.ops.hashkeys import md5_hex_and_key64
        # the sig rule stays a Python loop: str.split() strips Unicode
        # whitespace classes RE2/pc kernels treat differently, and the
        # serial-oracle pin depends on exactly this normalization
        sigs = [" ".join(s.split())[:1000]
                for s in t["text"].to_pylist()]
        hexes, k64 = md5_hex_and_key64(pa.array(sigs, pa.string()))
        h64 = k64.view(np.int64)
        order = np.argsort(h64, kind="stable")
        return pa.table({
            "h64": pa.array(h64[order], pa.int64()),
            "doc_id": pa.array(t["doc_id"].to_numpy()[order], pa.int64()),
            "n_copies": pa.array(np.ones(len(order), np.int64),
                                 pa.int64()),
            "sim_hash": hexes.take(pa.array(order)),
        })

    part = ds.map_batches(partial, batch_format="pyarrow").materialize()
    _, refs = exchange_reduce(part, "h64", sum_cols=("n_copies",),
                              min_cols=("doc_id",),
                              first_cols=("sim_hash",))
    return (_rd().from_arrow_refs(refs)
            .select_columns(["sim_hash", "doc_id", "n_copies"]))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit hashes of k-word shingles (lowercased \\w+ tokens):
    an order-sensitive splitmix64-xor fold over per-token hashes
    (``acc = splitmix64(acc) ^ h_next``, finished with one more
    splitmix64), fully vectorized — k-1 chained array passes.

    The fold uses only xor and splitmix64 so a DuckDB oracle can
    reproduce it step for step (see the minhash_pairs oracle in
    ``__ray_entry__``); a multiply-based polynomial would wrap mod 2^64,
    which SQL integer types cannot express."""
    toks = _WORD_RE.findall(text.lower())
    if len(toks) < k:
        toks = toks + ["_"] * (k - len(toks))
    th = _token_hashes(toks)
    win = np.lib.stride_tricks.sliding_window_view(th, k)
    acc = win[:, 0]
    for i in range(1, k):
        acc = _splitmix64(acc) ^ win[:, i]
    return _splitmix64(acc)


class _MinHasher:
    """Stateful minhash stage: the permutation coefficients are drawn once
    per actor in ``__init__`` from a fixed seed (actor-pool pattern F5/F6:
    setup once, batches many)."""

    def __init__(self, num_perm: int = 128, shingle_k: int = 5,
                 id_col: str = "doc_id", text_col: str = "text"):
        # xor-mix permutation family: perm_i(s) = splitmix64(s ^ seed_i)
        # with seed_i = splitmix64(i+1).  Deterministic with no RNG state,
        # and — unlike the multiply-shift family wrapping mod 2^64 — every
        # step is xor/shift/add, so the SQL oracle derives the identical
        # seeds from range(num_perm) and replays the permutation exactly.
        self.seeds = _splitmix64(
            np.arange(1, num_perm + 1, dtype=np.uint64))
        self.num_perm = num_perm
        self.k = shingle_k
        self.id_col = id_col
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        s = _shingle_hashes(text, self.k)
        m = _splitmix64(self.seeds[:, None] ^ s[None, :])
        return m.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_pylist()
        sigs = [self.signature(s or "")
                for s in t[self.text_col].to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "sig": pa.array([sig.tobytes() for sig in sigs], pa.binary()),
        })


def minhash_signatures(sf_dir: str, num_perm: int = 128,
                       shingle_k: int = 5, table: str = "documents"):
    ds = _rd().read_parquet(f"{sf_dir}/{table}.parquet",
                            columns=["doc_id", "text"])
    return ds.map_batches(_MinHasher, batch_format="pyarrow",
                          batch_size=256, concurrency=(2, 12),
                          fn_constructor_kwargs={"num_perm": num_perm,
                                                 "shingle_k": shingle_k})


@_pairs_memo(src="table")
def minhash_lsh_pairs(sf_dir: str, num_perm: int = 128, bands: int = 32,
                      shingle_k: int = 5, threshold: float = 0.5,
                      table: str = "documents",
                      join_partitions: int | None = None,
                      broadcast_threshold: int = 50_000,
                      shard_bits: int | None = None):
    """Near-dup candidate pairs via LSH banding, verified by signature
    agreement (estimated Jaccard).  Returns (doc_a, doc_b,
    est_jaccard_milli) for pairs >= threshold.

    Scale shape: the verify step is a two-sided signature join keyed by
    doc_id.  Like any join, it picks its physical strategy by side size:
    a signature table at or under ``broadcast_threshold`` docs
    (num_perm*8 B each — 50k docs ≈ 50 MB) is broadcast once via
    ``ray.put`` and looked up in-task (broadcast join — the shuffle
    machinery would cost more than the data), while a larger table goes
    through two hash-partitioned ``Dataset.join`` passes so signatures
    never land on the driver and never fan out whole.  Both paths
    compare the per-pair signatures as ONE (n_pairs, num_perm) numpy
    equality per batch; set ``broadcast_threshold=0`` to force the join
    path (the chain-component test does).

    The banding groupby keys on ``shard`` = (band, top ``shard_bits``
    of band_hash), not on the band alone: a bare per-band group holds
    the WHOLE corpus (one map_groups task per band would OOM a worker
    at 10^9+ docs), while the band_hash prefix splits each band into
    uniform-random sub-groups of ~2M rows without ever separating rows
    that share a band_hash (equal hash => equal prefix), so the pair
    set is invariant under sharding (pytest-pinned).  ``shard_bits``
    defaults from the signature count; pass it to force a value."""
    import math

    join_partitions = _join_partitions(join_partitions)
    rows = num_perm // bands
    # signatures feed both the banding pass and the verify joins —
    # materialize once (small: num_perm*8 B per doc)
    sig_ds = minhash_signatures(sf_dir, num_perm, shingle_k,
                                table).materialize()
    if shard_bits is None:
        target = 2_000_000  # rows per banding group
        shard_bits = min(24, max(0, math.ceil(math.log2(max(
            1.0, sig_ds.count() * bands / target)))))
    sb = np.uint64(shard_bits)

    def band_explode(t: pa.Table) -> pa.Table:
        """(doc, band) bucket keys in one vectorized pass: polynomial of
        each band's signature rows diffused by splitmix64."""
        if t.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int64()),
                             "band_hash": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64())})
        # one frombuffer over the joined fixed-width payloads (the
        # verify stage's idiom) instead of a per-row frombuffer+stack
        sigs = np.frombuffer(b"".join(t["sig"].to_pylist()),
                             dtype=np.uint64)
        mat = sigs.reshape(t.num_rows, bands, rows)
        pows = np.empty(rows, dtype=np.uint64)
        pows[-1] = 1
        with np.errstate(over="ignore"):
            for i in range(rows - 2, -1, -1):
                pows[i] = pows[i + 1] * np.uint64(1099511628211)
            keys = _splitmix64(
                (mat * pows).sum(axis=2, dtype=np.uint64))  # (docs, bands)
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        flat = keys.ravel()
        band_idx = np.tile(np.arange(bands, dtype=np.uint64), len(ids))
        shard = (band_idx << sb) | (
            (flat >> (np.uint64(64) - sb)) if shard_bits
            else np.uint64(0))
        return pa.table({
            "shard": pa.array(shard.astype(np.int64), pa.int64()),
            "band_hash": pa.array(flat, pa.uint64()),
            "doc_id": pa.array(np.repeat(ids, bands), pa.int64())})

    banded = sig_ds.map_batches(band_explode, batch_format="pyarrow")

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one Ray group per shard (bounded rows); the fine band_hash
        # buckets pair up in one vectorized ragged-triu pass — no
        # Python loop over buckets or pairs
        bh = g["band_hash"].to_numpy(dtype=np.uint64)
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((ids, bh))
        bh, ids = bh[order], ids[order]
        left, right = _ragged_pairs(bh)
        return pd.DataFrame({"doc_a": ids[left], "doc_b": ids[right]})

    pairs = banded.groupby("shard").map_groups(band_pairs,
                                               batch_format="pandas")

    def score_pairs(t: pa.Table, sa: np.ndarray,
                    sb: np.ndarray) -> pa.Table:
        # one stacked (n_pairs, num_perm) comparison per batch — no
        # per-pair Python loop
        matches = (sa == sb).sum(axis=1).astype(np.int64)
        est = matches * 1000 // num_perm
        out = pa.table({"doc_a": t["doc_a"], "doc_b": t["doc_b"],
                        "est_jaccard_milli": pa.array(est, pa.int64())})
        return out.filter(
            pa.compute.greater_equal(out["est_jaccard_milli"],
                                     int(threshold * 1000)))

    _EMPTY = pa.table({"doc_a": pa.array([], pa.int64()),
                       "doc_b": pa.array([], pa.int64()),
                       "est_jaccard_milli": pa.array([], pa.int64())})

    def verify_joined(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY
        sa = np.frombuffer(b"".join(t["sig_a"].to_pylist()),
                           dtype=np.uint64).reshape(t.num_rows, num_perm)
        sb = np.frombuffer(b"".join(t["sig_b"].to_pylist()),
                           dtype=np.uint64).reshape(t.num_rows, num_perm)
        return score_pairs(t, sa, sb)

    # dedupe candidate pairs discovered by multiple bands BEFORE the
    # (more expensive) verification
    from ray.data.aggregate import Count
    agg = (pairs.groupby(["doc_a", "doc_b"])
           .aggregate(Count(alias_name="n_bands")))

    if sig_ds.count() <= broadcast_threshold:
        # small-side broadcast join: ship the signatures once as a pair
        # of numpy arrays (id-sorted ids + stacked signature matrix) —
        # numpy rides the object store zero-copy, unlike a dict, which
        # every verify task would re-unpickle — and look rows up with
        # one vectorized searchsorted per batch
        import ray
        ids_l, sigs_l = [], []
        for ref in sig_ds.to_arrow_refs():
            blk = ray.get(ref)
            if blk.num_rows:
                ids_l.append(np.asarray(blk["doc_id"].to_numpy(
                    zero_copy_only=False), dtype=np.int64))
                sigs_l.append(np.frombuffer(
                    b"".join(blk["sig"].to_pylist()),
                    dtype=np.uint64).reshape(blk.num_rows, num_perm))
        if ids_l:
            sig_ids = np.concatenate(ids_l)
            sig_mat = np.vstack(sigs_l)
            order = np.argsort(sig_ids, kind="stable")
            sig_ids, sig_mat = (sig_ids[order],
                                np.ascontiguousarray(sig_mat[order]))
        else:  # empty corpus: no signatures, no pairs to verify
            sig_ids = np.empty(0, np.int64)
            sig_mat = np.empty((0, num_perm), np.uint64)
        sig_ref = ray.put((sig_ids, sig_mat))

        def verify_broadcast(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _EMPTY
            ids, mat = ray.get(sig_ref)
            a = np.asarray(t["doc_a"].to_numpy(zero_copy_only=False),
                           np.int64)
            b = np.asarray(t["doc_b"].to_numpy(zero_copy_only=False),
                           np.int64)
            # candidates are emitted from these same signatures, so
            # every id must resolve (loud KeyError otherwise)
            return score_pairs(t, mat[_sorted_lookup(ids, a)],
                               mat[_sorted_lookup(ids, b)])

        return agg.map_batches(verify_broadcast, batch_format="pyarrow")

    # the join path needs schema-clean blocks (see _join_ready)
    uniq = _join_ready(
        agg, pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                        ("n_bands", pa.int64())]))
    # Dataset.join breaks on an empty side (no shards shuffled -> the
    # aggregator joins a schema-less table); zero candidates means zero
    # verified pairs, so short-circuit
    if uniq.count() == 0:
        return _rd().from_arrow(_EMPTY)
    # doc_id-keyed signature joins (Dataset.join drops the right key
    # column, so each join contributes exactly one sig column)
    with_a = uniq.join(sig_ds, "inner", num_partitions=join_partitions,
                       on=("doc_a",), right_on=("doc_id",)
                       ).rename_columns({"sig": "sig_a"})
    with_b = with_a.join(sig_ds, "inner", num_partitions=join_partitions,
                         on=("doc_b",), right_on=("doc_id",)
                         ).rename_columns({"sig": "sig_b"})
    return with_b.map_batches(verify_joined, batch_format="pyarrow")


def minhash_dedup_keep(sf_dir: str, max_rounds: int = 64,
                       join_partitions: int | None = None, **kwargs):
    """Dedup decision from LSH pairs: connected components by iterated
    min-label propagation, keep the min doc_id per component.  Returns
    (doc_id, keep) for docs that appear in any near-dup pair.

    Fully distributed — the pair graph never lands on the driver.  Per
    round: labels join the (directed-both-ways) edge table keyed by node
    (hash-partitioned ``Dataset.join``), propagated labels union the
    current ones, and a groupby-min picks each node's new label.  Labels
    only ever decrease, so the scalar sum of labels strictly decreases
    until fixpoint — convergence is detected from that one aggregate (the
    only value the driver sees).  Rounds needed = component diameter in
    hops (near-dup components are shallow; ``max_rounds`` is a safety
    backstop, and hitting it raises rather than silently under-merging)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Min

    requested_jp = join_partitions
    join_partitions = _join_partitions(join_partitions)
    pairs = (minhash_lsh_pairs(sf_dir, join_partitions=join_partitions,
                               **kwargs)
             .select_columns(["doc_a", "doc_b"]).materialize())
    return _components_keep(pairs, requested_jp, max_rounds)


def _components_keep(pairs, requested_jp: int | None, max_rounds: int,
                     id_name: str = "doc_id",
                     broadcast_threshold: int = 1_000_000):
    """Shared keep-decision over a materialized (doc_a, doc_b) pair
    Dataset: distributed min-label propagation (see minhash_dedup_keep
    docstring for the convergence argument), with a driver-side
    vectorized fast path for pair graphs at or under
    ``broadcast_threshold`` edges.  Output: (id_name, keep)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Min

    n_pairs = pairs.count()
    if n_pairs == 0:
        return pa.table({id_name: pa.array([], pa.int64()),
                         "keep": pa.array([], pa.bool_())})

    # planner decision, same shape as the MinHash verify step: a pair
    # graph at or under the threshold (16 B/edge — 1M edges = 16 MB)
    # is min-labeled driver-side in vectorized numpy, because below
    # that size EVERY distributed propagation round costs more in join
    # actor startup than the whole graph; above it nothing lands on
    # the driver and the per-round joins do the work.  Both paths
    # compute the identical (node, keep=node==component-min) table
    # (pytest pins equality).
    if n_pairs <= broadcast_threshold:
        df = pairs.select_columns(["doc_a", "doc_b"]).to_pandas()
        a = df["doc_a"].to_numpy(dtype=np.int64)
        b = df["doc_b"].to_numpy(dtype=np.int64)
        ids = np.unique(np.concatenate([a, b]))
        ia = np.searchsorted(ids, a)
        ib = np.searchsorted(ids, b)
        lab = ids.copy()
        for _ in range(max_rounds):
            new = lab.copy()
            np.minimum.at(new, ia, lab[ib])
            np.minimum.at(new, ib, lab[ia])
            # pointer jumping: labels are node ids, so chase one hop
            new = np.minimum(new, new[np.searchsorted(ids, new)])
            if (new == lab).all():
                break
            lab = new
        else:
            raise RuntimeError(
                f"min-label propagation did not converge in "
                f"{max_rounds} rounds (pathologically deep chain?)")
        return pa.table({id_name: pa.array(ids, pa.int64()),
                         "keep": pa.array(lab == ids, pa.bool_())})

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64())})

    edges = pairs.map_batches(both_dirs,
                              batch_format="pyarrow").materialize()
    # near-dup edge tables are far smaller than the corpus (only docs
    # with LSH collisions appear); size the per-round join to the edge
    # count, not the cluster, so each propagation round doesn't pay
    # full-width join-actor startup to shuffle a few thousand edges
    prop_jp = _join_partitions(requested_jp,
                               approx_rows=edges.count())

    # round 0 fused into the node build: label = min(node, min neighbor)
    def init_label(t: pa.Table) -> pa.Table:
        lab = np.minimum(t["src"].to_numpy(zero_copy_only=False),
                         t["min_dst"].to_numpy(zero_copy_only=False))
        return pa.table({"node": t["src"],
                         "label": pa.array(lab, pa.int64())})

    label_schema = pa.schema([("node", pa.int64()),
                              ("label", pa.int64())])
    labels = _join_ready(
        edges.groupby("src")
        .aggregate(Min("dst", alias_name="min_dst"))
        .map_batches(init_label, batch_format="pyarrow"),
        label_schema)
    prev_sum = labels.sum("label")
    for _ in range(max_rounds):
        prop = (edges.join(labels, "inner",
                           num_partitions=prop_jp,
                           on=("src",), right_on=("node",))
                .select_columns(["dst", "label"])
                .rename_columns({"dst": "node"}))
        labels = _join_ready(
            labels.union(prop).groupby("node")
            .aggregate(Min("label", alias_name="label")),
            label_schema)
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s
    else:
        raise RuntimeError(
            f"min-label propagation did not converge in {max_rounds} "
            "rounds (pathologically deep near-dup chain?)")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            id_name: t["node"],
            "keep": pc.equal(t["node"], t["label"])})

    return labels.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class _SimHasher:
    """Per-doc 64-bit SimHash.

    Token hash is the md5 low-64 (first 8 digest bytes, big-endian) —
    bit-identical to DuckDB's ``('0x'||substr(md5(tok),1,16))::UBIGINT``,
    which makes the whole operator SQL-twinnable (see the
    ``simhash_pairs`` oracle in ``__ray_entry__``).  Votes are weighted
    by token occurrence count over DISTINCT tokens, so each distinct
    token is hashed once per actor lifetime: the vocabulary cache
    amortizes the md5 to ~zero on Zipf webtext (stateful-actor pattern;
    bounded so a 100-TB shard cannot grow it without limit).

    Tokenization is Python ``\\w+`` on the lowercased text; the SQL twin
    uses RE2 ``[\\p{L}\\p{N}_]+``.  Both are letters+digits+underscore
    (Unicode categories L*/N*); they can only diverge on exotic
    word-character categories (combining marks inside words), verified
    absent from the test tables.
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col
        self._shifts = np.arange(64, dtype=np.uint64)

    def simhash64(self, text: str) -> int:
        from collections import Counter

        toks = _WORD_RE.findall(text.lower())
        if not toks:
            return 0
        tc = Counter(toks)
        hs = _token_hashes(list(tc.keys()))  # md5-low64, vocab-cached
        cs = np.fromiter(tc.values(), dtype=np.int64, count=len(tc))
        # (n_distinct, 64) bit matrix -> count-weighted vote per bit
        bits = (hs[:, None] >> self._shifts[None, :]) & np.uint64(1)
        votes = ((2 * bits.astype(np.int64) - 1) * cs[:, None]).sum(axis=0)
        out = 0
        for i in np.nonzero(votes > 0)[0]:
            out |= (1 << int(i))
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_pylist()
        sigs = [self.simhash64(s or "") for s in t[self.text_col].to_pylist()]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "simhash": pa.array(
                             np.array(sigs, dtype=np.uint64), pa.uint64())})


@_pairs_memo(src="table")
def simhash_pairs(sf_dir: str, max_hamming: int = 3,
                  table: str = "documents",
                  shard_bits: int | None = None,
                  max_candidate_pairs: int | None = None):
    """Near-dup pairs by SimHash: block on 4x16-bit sub-bands (pigeonhole
    guarantees any pair at Hamming <= 3 collides in >= 1 band), verify by
    popcount.  Returns (doc_a, doc_b, hamming).

    The banding groupby keys on ``shard`` = (band, top ``shard_bits``
    of the 16-bit sub-band key): a bare per-band group holds the whole
    corpus (4 corpus-sized map_groups tasks — a worker OOM at 10^9+
    docs), while the key prefix splits each band into bounded groups
    without separating rows that share a key (equal key => equal
    prefix), so the pair set is invariant (pytest-pinned).  The width
    defaults from the table's parquet row count — 0 for small corpora,
    where thousands of tiny groups would only add shuffle overhead.

    Candidate-blowup guard: on a low-entropy corpus (many equal
    sub-band keys) the TRUE Hamming<=``max_hamming`` pair set is
    quadratic and the job cannot terminate usefully.  Before emitting
    any pair, the exact per-(band, key) bucket histogram — at most
    4 * 2^16 rows regardless of corpus size — prices the candidate set
    as sum(c*(c-1)/2); if it exceeds ``max_candidate_pairs`` (default
    max(10M, 50 per doc)) the op raises in seconds with the estimate
    and remediation pointers instead of hanging for days."""
    import math

    import pyarrow.dataset as pads

    path = f"{sf_dir}/{table}.parquet"
    target = 2_000_000  # rows per banding group
    n_docs = pads.dataset(path, format="parquet").count_rows()
    if shard_bits is None:
        shard_bits = min(16, max(0, math.ceil(math.log2(max(
            1.0, n_docs * 4 / target)))))
    sb = np.int64(shard_bits)
    if max_candidate_pairs is None:
        max_candidate_pairs = max(10_000_000, 50 * n_docs)

    ds = _rd().read_parquet(path, columns=["doc_id", "text"])
    sig = ds.map_batches(_SimHasher, batch_format="pyarrow",
                         batch_size=512,
                         concurrency=(2, 12)).materialize()

    # -- guard pass: exact candidate count from the (band, key) histogram
    from crawler_ray.ops.exchange import exchange_reduce

    def hist_partial(t: pa.Table) -> pa.Table:
        sims = np.asarray(t["simhash"].to_pylist(), dtype=np.uint64)
        shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
        keys = ((sims[:, None] >> shifts[None, :])
                & np.uint64(0xFFFF)).astype(np.int64)
        band = np.tile(np.arange(4, dtype=np.int64), len(sims))
        bk = (band << np.int64(16)) | keys.ravel()
        uniq, counts = np.unique(bk, return_counts=True)
        return pa.table({"bk": pa.array(uniq, pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    hist = sig.map_batches(hist_partial,
                           batch_format="pyarrow").materialize()
    _, hist_refs = exchange_reduce(hist, "bk", sum_cols=("n",))
    import ray as _ray
    est_pairs = 0
    for ht in _ray.get(list(hist_refs)):
        c = ht["n"].to_numpy()
        est_pairs += int((c * (c - 1) // 2).sum())
    if est_pairs > max_candidate_pairs:
        raise ValueError(
            f"simhash_pairs: the banding histogram prices "
            f"{est_pairs:,} candidate pairs for {n_docs:,} docs — over "
            f"the {max_candidate_pairs:,} ceiling; the corpus is too "
            f"low-entropy for 4x16-bit SimHash banding (the true "
            f"Hamming<={max_hamming} pair set is likely quadratic and "
            f"the job would not terminate).  Lower max_hamming, dedup "
            f"exact duplicates first (exact_dedup), use minhash_pairs "
            f"(bounded banding groups by construction), or raise "
            f"max_candidate_pairs explicitly if the blowup is intended.")

    def band_explode(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        sims = np.asarray(t["simhash"].to_pylist(), dtype=np.uint64)
        shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
        keys = ((sims[:, None] >> shifts[None, :])
                & np.uint64(0xFFFF)).astype(np.int64)  # (docs, 4)
        band = np.tile(np.arange(4, dtype=np.int64), len(ids))
        shard = (band << sb) | (keys.ravel() >> np.int64(16 - sb)
                                if shard_bits else np.int64(0))
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
            "shard": pa.array(shard, pa.int64()),
            "key": pa.array(keys.ravel().astype(np.int32), pa.int32()),
            "simhash": pa.array(np.repeat(sims, 4), pa.uint64())})

    banded = sig.map_batches(band_explode, batch_format="pyarrow")

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized: ragged-triu pair indices per key bucket, then ONE
        # xor + LUT popcount over the pair arrays (1-D — never a
        # bucket^2 matrix)
        key = g["key"].to_numpy(dtype=np.int64)
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        sims = g["simhash"].to_numpy(dtype=np.uint64)
        order = np.lexsort((ids, key))
        key, ids, sims = key[order], ids[order], sims[order]
        left, right = _ragged_pairs(key)
        if not len(left):
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        ham = _popcount64(sims[left] ^ sims[right])
        keep = ham <= max_hamming
        return pd.DataFrame({"doc_a": ids[left][keep],
                             "doc_b": ids[right][keep],
                             "hamming": ham[keep]})

    pairs = banded.groupby("shard").map_groups(band_pairs,
                                               batch_format="pandas")
    from ray.data.aggregate import Min
    return (pairs.groupby(["doc_a", "doc_b"])
            .aggregate(Min("hamming", alias_name="hamming")))


def simhash_dedup_keep(sf_dir: str, max_hamming: int = 3,
                       max_rounds: int = 64,
                       join_partitions: int | None = None,
                       table: str = "documents"):
    """Dedup decision from SimHash pairs: the same distributed
    min-label-propagation connected components as
    ``minhash_dedup_keep`` (see its docstring), over the Hamming-
    verified SimHash pair graph.  Returns (doc_id, keep) for docs that
    appear in any near-dup pair; keep = doc_id is its component's min.
    SQL twin: the bit-exact ``simhash_pairs`` oracle wrapped in a
    recursive-CTE transitive closure (``__ray_entry__``)."""
    pairs = (simhash_pairs(sf_dir, max_hamming=max_hamming, table=table)
             .select_columns(["doc_a", "doc_b"]).materialize())
    return _components_keep(pairs, join_partitions, max_rounds)


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------

_ASCII_WORD_RE = re.compile(r"[a-z0-9_]+")


@_pairs_memo(src="table")
def ngram_jaccard_pairs(sf_dir: str, n: int = 3,
                        threshold_milli: int = 500,
                        table: str = "documents",
                        max_gram_df: int | None = None,
                        broadcast_threshold: int = 1_000_000,
                        join_partitions: int | None = None):
    """Exact n-gram Jaccard near-dup pairs (the exact counterpart of the
    MinHash estimate above; D3-family dedup).  Token grams are ASCII
    ``[a-z0-9_]+`` words lowercased (chosen so DuckDB RE2 and Python
    ``re`` tokenize identically), distinct per document.

    Plan: explode distinct (doc, gram-hash-64) rows once and materialize
    (ids + 8-byte hashes only — the documents themselves never shuffle);
    intersection counts come from bucketed gram-groupby pair emission +
    a (doc_a, doc_b) groupby-sum.  The per-doc gram-set sizes feed the
    final scoring pass through a planner decision identical to the
    MinHash verify step: a corpus at or under ``broadcast_threshold``
    docs ships the (doc_id -> n_grams) map once via ``ray.put`` (12 B a
    row — 10^6 docs ≈ 12 MB), while a larger corpus routes the sizes
    through two doc_id-keyed hash-partitioned ``Dataset.join`` passes so
    the size table never lands on the driver (set
    ``broadcast_threshold=0`` to force the join path — the pytest
    equivalence test does).  jaccard_milli uses pure
    integer arithmetic ``(c*1000)//(|A|+|B|-c)`` so the oracle hash-matches
    bit-exactly — up to 64-bit gram-hash collisions: two distinct grams
    hashing alike inflate an intersection count by one, or (since the
    distinct-gram sets and per-doc sizes are computed over hashed
    grams) deflate a per-doc size by one.  Negligible at tested scale
    (~2^-64 per gram pair) but a real approximation at 10^9-doc
    corpora; widen the digest if bit-exactness matters there.

    Hot grams (stopword-grams shared by many docs) are the skew risk at
    scale: a gram in d documents emits d*(d-1)/2 pairs.  ``max_gram_df``
    caps that — grams whose document frequency exceeds the cap are
    dropped before pair emission (the per-doc set sizes keep counting
    them, so scores become a lower bound and a pair overlapping ONLY in
    hot grams is not emitted).  Default ``None`` keeps exact semantics;
    the hot-gram set is tiny by construction (at most
    total_gram_rows/cap grams), so broadcasting it is safe at any
    corpus size."""
    import ray
    import pyarrow.dataset as pads
    from ray.data.aggregate import Count, Sum

    join_partitions = _join_partitions(join_partitions)
    n_docs = pads.dataset(f"{sf_dir}/{table}.parquet",
                          format="parquet").count_rows()
    ds = _rd().read_parquet(f"{sf_dir}/{table}.parquet",
                            columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        # gram hash = splitmix64-diffused polynomial over the window's
        # md5-low64 token hashes (vocabulary-cached per worker, so the
        # md5 cost tends to zero on Zipf webtext) — no gram strings are
        # ever built and the per-doc work after tokenization is three
        # numpy passes, not a Python loop over grams
        out_id, out_gram = [], []
        fnv = np.uint64(1099511628211)
        for doc_id, text in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
            toks = _ASCII_WORD_RE.findall((text or "").lower())
            m = len(toks) - n + 1
            if m <= 0:
                continue
            hs = _token_hashes(toks)
            with np.errstate(over="ignore"):
                acc = hs[:m].copy()
                for j in range(1, n):
                    acc = _splitmix64(acc * fnv + hs[j:j + m])
            grams = np.unique(acc)
            out_id.append(np.full(len(grams), doc_id, dtype=np.int64))
            out_gram.append(grams)
        if out_id:
            ids, gr = np.concatenate(out_id), np.concatenate(out_gram)
        else:
            ids = np.empty(0, np.int64)
            gr = np.empty(0, np.uint64)
        # grams ride as BIT-CAST int64: Ray Data's groupby on a uint64
        # key round-trips values >= 2^63 through Python objects (the
        # arrow conversion falls back to a pickled extension column and
        # downstream selects lose the column); the hash is an opaque
        # key, so the signed view is lossless
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "gram": pa.array(gr.view(np.int64), pa.int64())})

    exploded = ds.map_batches(explode, batch_format="pyarrow",
                              batch_size=512).materialize()

    # per-doc gram-set sizes on the FULL gram sets (max_gram_df filters
    # pair emission below, never the denominators)
    sizes_agg = (exploded.groupby("doc_id")
                 .aggregate(Count(alias_name="n_grams")))

    if max_gram_df is not None:
        # hot-gram skew cap: find grams with df > cap (a tiny set by
        # definition), broadcast it, filter the exploded rows before any
        # pair emission — per-doc sizes above stay computed on the FULL
        # gram sets (documented lower-bound semantics)
        hot = (exploded.groupby("gram")
               .aggregate(Count(alias_name="df"))
               .map_batches(
                   lambda t: t.filter(pa.compute.greater(
                       t["df"], max_gram_df)).select(["gram"]),
                   batch_format="pyarrow")
               .to_pandas())
        # an empty result loses its columns through Dataset.to_pandas —
        # no gram exceeded the cap, so the filter is a no-op
        hot_vals = (np.asarray(hot["gram"], dtype=np.int64)
                    if "gram" in hot.columns else np.empty(0, np.int64))
        hot_ref = ray.put(pa.array(hot_vals))

        def drop_hot(t: pa.Table) -> pa.Table:
            hot_arr = ray.get(hot_ref)
            if len(hot_arr) == 0:
                return t
            import pyarrow.compute as pc
            return t.filter(pc.invert(
                pc.is_in(t["gram"], value_set=hot_arr)))

        exploded = exploded.map_batches(drop_hot, batch_format="pyarrow")

    # adaptive bucket width: any refinement of the gram partition keeps
    # pair semantics (pairs only form within equal grams, and equal
    # grams share every low bit), so widen the mask with the corpus to
    # hold ~2M gram rows per map_groups task instead of letting the
    # fixed-64-bucket groups grow with the corpus.  Low bits are
    # sign-view-agnostic.  (This op stays the documented exact /
    # quadratic path; MinHash is the scale path.)
    import math
    bucket_bits = max(6, min(24, math.ceil(math.log2(max(
        1.0, n_docs * 128 / 2_000_000)))))
    bucket_mask = np.int64((1 << bucket_bits) - 1)

    def add_bucket(t: pa.Table) -> pa.Table:
        bucket = pa.compute.cast(
            pa.compute.bit_wise_and(t["gram"], bucket_mask), pa.int32())
        return t.append_column("bucket", bucket)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized ragged-triu pair emission per gram bucket
        gr = g["gram"].to_numpy(dtype=np.int64)
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((ids, gr))
        gr, ids = gr[order], ids[order]
        left, right = _ragged_pairs(gr)
        return pd.DataFrame({"doc_a": ids[left], "doc_b": ids[right]})

    inter = (exploded.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket").map_groups(bucket_pairs,
                                           batch_format="pandas")
             .map_batches(lambda t: t.append_column(
                 "one", pa.array(np.ones(t.num_rows, dtype=np.int64))),
                 batch_format="pyarrow")
             .groupby(["doc_a", "doc_b"])
             .aggregate(Sum("one", alias_name="n_common")))

    _EMPTY = pa.table({"doc_a": pa.array([], pa.int64()),
                       "doc_b": pa.array([], pa.int64()),
                       "jaccard_milli": pa.array([], pa.int64())})

    def finish(t: pa.Table, na: np.ndarray, nb: np.ndarray) -> pa.Table:
        c = t["n_common"].to_numpy(zero_copy_only=False).astype(np.int64)
        jac = (c * 1000) // (na + nb - c)
        out = pa.table({"doc_a": t["doc_a"], "doc_b": t["doc_b"],
                        "jaccard_milli": pa.array(jac, pa.int64())})
        return out.filter(pa.compute.greater_equal(
            out["jaccard_milli"], threshold_milli))

    if n_docs <= broadcast_threshold:
        # small-corpus path: ship the (doc_id -> n_grams) map once as
        # two id-sorted numpy arrays (zero-copy from the object store;
        # a dict would re-unpickle per task) and resolve each batch
        # with one vectorized searchsorted
        sizes = sizes_agg.to_pandas().sort_values("doc_id")
        size_ref = ray.put((
            np.asarray(sizes["doc_id"], dtype=np.int64),
            np.asarray(sizes["n_grams"], dtype=np.int64)))

        def score_broadcast(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _EMPTY
            ids, grams = ray.get(size_ref)
            a = np.asarray(t["doc_a"].to_numpy(zero_copy_only=False),
                           np.int64)
            b = np.asarray(t["doc_b"].to_numpy(zero_copy_only=False),
                           np.int64)
            # pair ids come from the same exploded grams the sizes
            # aggregate over — every id must resolve (loud otherwise)
            return finish(t, grams[_sorted_lookup(ids, a)],
                          grams[_sorted_lookup(ids, b)])

        return inter.map_batches(score_broadcast, batch_format="pyarrow")

    # at-scale path: doc_id-keyed size joins — the size table never
    # lands on the driver
    inter_r = _join_ready(
        inter, pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                          ("n_common", pa.int64())]))
    if inter_r.count() == 0:
        return _rd().from_arrow(_EMPTY)
    sizes_r = _join_ready(
        sizes_agg, pa.schema([("doc_id", pa.int64()),
                              ("n_grams", pa.int64())]))
    with_a = inter_r.join(sizes_r, "inner",
                          num_partitions=join_partitions,
                          on=("doc_a",), right_on=("doc_id",)
                          ).rename_columns({"n_grams": "n_grams_a"})
    with_b = with_a.join(sizes_r, "inner",
                         num_partitions=join_partitions,
                         on=("doc_b",), right_on=("doc_id",)
                         ).rename_columns({"n_grams": "n_grams_b"})

    def score_joined(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY
        na = t["n_grams_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = t["n_grams_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return finish(t, na, nb)

    return with_b.map_batches(score_joined, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

@_pairs_memo(src="embeddings.parquet")
def embedding_dup_pairs(sf_dir: str, threshold: float = 0.4,
                        tile_rows: int = 2048,
                        max_group_rows: int = 4_000_000):
    """Exact cosine near-dup pairs, blocked by the label column (the
    blocking key plays the IVF-bucket role the north rule's skew handling
    needs at scale).  Returns (vec_id_a, vec_id_b, cos_milli).

    The per-label cosine is computed in fixed-size ``tile_rows`` ×
    ``tile_rows`` block matmuls over the upper triangle, so peak score
    memory is O(tile_rows^2) regardless of label-bucket size — a hot
    label no longer builds a dense n^2 matrix.  Pair emission is fully
    vectorized (nonzero + minimum/maximum), no per-pair Python loop.
    Compute stays inherently O(n^2) per label (exact all-pairs);
    ``max_group_rows`` fails LOUDLY on a label bucket so skewed that
    even tiled exact scoring is the wrong tool — at that size the
    caller should pre-bucket the hot label (LSH/IVF, as ``knn_lsh`` /
    ``knn_ivf`` do) instead of silently burning a worker for hours."""
    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding", "label"])

    def per_label(g: pa.Table) -> pd.DataFrame:
        n = g.num_rows
        if n > max_group_rows:
            label = g["label"][0].as_py()
            raise ValueError(
                f"label bucket {label!r} has {n} rows "
                f"(> max_group_rows={max_group_rows}): exact all-pairs "
                f"cosine is O(n^2); pre-bucket this hot label (LSH/IVF) "
                f"or raise max_group_rows explicitly")
        # same zero-copy constant-length list decode as the ANN paths
        from crawler_ray.ops.similarity import _batch_vectors
        ids, mat = _batch_vectors(g)
        ids = np.asarray(ids, dtype=np.int64)
        out_a, out_b, out_m = [], [], []
        for i0 in range(0, n, tile_rows):
            rows = mat[i0:i0 + tile_rows]
            # j tiles start at i0: everything left of the diagonal
            # block is the lower triangle, never scored
            for j0 in range(i0, n, tile_rows):
                cos = rows @ mat[j0:j0 + tile_rows].T
                ii, jj = np.nonzero(cos >= threshold)
                gi, gj = ii + i0, jj + j0
                keep = gi < gj          # strict upper triangle
                if not keep.any():
                    continue
                gi, gj = gi[keep], gj[keep]
                out_a.append(np.minimum(ids[gi], ids[gj]))
                out_b.append(np.maximum(ids[gi], ids[gj]))
                out_m.append(np.floor(
                    cos[ii[keep], jj[keep]] * 1000).astype(np.int64))
        if out_a:
            df = pd.DataFrame({"vec_id_a": np.concatenate(out_a),
                               "vec_id_b": np.concatenate(out_b),
                               "cos_milli": np.concatenate(out_m)})
        else:
            df = pd.DataFrame({"vec_id_a": [], "vec_id_b": [],
                               "cos_milli": []})
        # pin dtypes so empty groups don't degrade the dataset schema
        return df.astype({"vec_id_a": "int64", "vec_id_b": "int64",
                          "cos_milli": "int64"})

    return ds.groupby("label").map_groups(per_label,
                                          batch_format="pyarrow")


def ngram_jaccard_dedup_keep(sf_dir: str, max_rounds: int = 64,
                             join_partitions: int | None = None,
                             **kwargs):
    """Dedup decision from exact n-gram Jaccard pairs: the shared
    distributed min-label-propagation components (see
    ``minhash_dedup_keep``) over the thresholded Jaccard pair graph.
    Returns (doc_id, keep).  SQL twin: the exact pairs oracle wrapped
    in the recursive-CTE transitive closure (``__ray_entry__``).

    Inherits ``ngram_jaccard_pairs``' 64-bit gram-hash approximation:
    a hash collision can inflate one pair's intersection count, so at
    10^9-doc corpora an extra edge (and thus an under-keep in its
    component) has ~2^-64-per-gram-pair probability — widen the digest
    there if bit-exactness matters (see the pairs docstring)."""
    pairs = (ngram_jaccard_pairs(sf_dir, join_partitions=join_partitions,
                                 **kwargs)
             .select_columns(["doc_a", "doc_b"]).materialize())
    return _components_keep(pairs, join_partitions, max_rounds)


def embedding_dedup_keep(sf_dir: str, threshold: float = 0.4,
                         max_rounds: int = 64,
                         join_partitions: int | None = None):
    """Dedup decision from embedding-cosine pairs: the shared
    distributed min-label-propagation components (see
    ``minhash_dedup_keep``) over the label-blocked cosine pair graph.
    Returns (vec_id, keep); keep = vec_id is its component's min.  SQL
    twin: the pairs oracle wrapped in the recursive-CTE closure."""

    def to_edges(t: pa.Table) -> pa.Table:
        return pa.table({"doc_a": t["vec_id_a"], "doc_b": t["vec_id_b"]})

    pairs = (embedding_dup_pairs(sf_dir, threshold=threshold)
             .map_batches(to_edges, batch_format="pyarrow")
             .materialize())
    return _components_keep(pairs, join_partitions, max_rounds,
                            id_name="vec_id")
