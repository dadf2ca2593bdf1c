"""Hash-range exchange — a raw-Ray-task replacement for sort-based
groupby aggregation on MOSTLY-UNIQUE int64 keys.

Ray Data's groupby is a sort shuffle: every row is range-partitioned,
sorted, and merged, which is the right machinery when groups are fat
and the reducer is rich.  On the "count mostly-singleton 64-bit hashes"
shape every curation operator hits (distinct line hashes, distinct
grams, per-doc tallies), that machinery is pathological — measured on
7.3M per-batch-unique line hashes at 1M docs: sort aggregate 41 s,
Ray's HASH_SHUFFLE strategy 123 s, this exchange ~3 s for bit-identical
output.  The brief's "raw Ray tasks as a last resort" case, used
deliberately:

1. each partial block (the map_batches output — REQUIRED sorted by the
   int64 key with per-block-unique keys, i.e. the ``np.unique``-partial
   contract) is range-split by one ``searchsorted`` against K global
   cut points, returning zero-copy table slices;
2. K combiners each concatenate their ~total/K rows, do ONE
   argsort + ``np.add.reduceat`` per sum column (plus a take-first for
   carried payload columns), apply the optional ``min_count`` filter
   and ``finish`` hook, and emit a typed Arrow table.

Bytes moved = the partial tables, once; no sort of the full stream, no
per-group Python.  The zero-copy range slices rely on Ray's Arrow
serializer truncating sliced buffers in transit — with plain pickle a
1%% slice would ship its ENTIRE parent block, turning the K-way split
into K full copies; ``tests/test_exchange.py`` pins the truncation
(fan-out bytes ~= parent bytes) so a Ray regression fails loudly.  The per-range output refs live in the object store:
feed them to ``ray.data.from_arrow_refs`` for a join side or further
Dataset work, or ``ray.get`` + concatenate under a broadcast threshold
(range order == global key order, so the concatenation is sorted).
Scales by adding combiners (``num_ranges``); skew is impossible by
construction because keys are uniform hashes.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pyarrow as pa

__all__ = ["exchange_reduce", "exchange_common_keys"]


def exchange_reduce(part, key_col: str,
                    sum_cols: Sequence[str] = (),
                    min_cols: Sequence[str] = (),
                    first_cols: Sequence[str] = (),
                    min_count: int | None = None,
                    cnt_col: str | None = None,
                    finish: Callable[[pa.Table], pa.Table] | None = None,
                    num_ranges: int | None = None):
    """Group a MATERIALIZED Dataset of partial blocks by ``key_col``
    (int64, sorted within each block): sum ``sum_cols``, take the
    minimum of ``min_cols``, carry the value of each ``first_cols`` from
    the group's first row in block-arrival order, optionally keep only
    groups whose ``cnt_col`` total reaches ``min_count``, then apply
    ``finish`` per range (e.g. a per-range top-k — ranges partition the
    key space, so any global top-k is a merge of per-range top-ks).

    Returns ``(total_rows, refs)``: the summed row count over all
    ranges and the per-range pa.Table ObjectRefs (empty ranges dropped;
    one typed empty kept if nothing survives so downstream joins always
    see a schema)."""
    import ray

    blocks = [block_ref
              for bundle in part.iter_internal_ref_bundles()
              for block_ref, meta in bundle.blocks
              if (meta.num_rows or 0) > 0]
    cols = [key_col, *sum_cols, *min_cols, *first_cols]

    def _reduce_table(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            out = t
        else:
            ks = t[key_col].to_numpy()
            order = np.argsort(ks, kind="stable")
            ks = ks[order]
            starts = np.flatnonzero(
                np.concatenate([[True], ks[1:] != ks[:-1]]))
            data = {key_col: pa.array(ks[starts], pa.int64())}
            for c in sum_cols:
                v = t[c].to_numpy()[order]
                data[c] = pa.array(np.add.reduceat(v, starts), pa.int64())
            for c in min_cols:
                v = t[c].to_numpy()[order]
                data[c] = pa.array(np.minimum.reduceat(v, starts),
                                   pa.int64())
            take_idx = pa.array(order[starts])
            for c in first_cols:
                data[c] = t[c].combine_chunks().take(take_idx)
            out = pa.table(data)
            if min_count is not None:
                keep = out[cnt_col or sum_cols[0]].to_numpy() >= min_count
                out = out.filter(pa.array(keep))
        if finish is not None:
            out = finish(out)
        return out

    if not blocks:
        empty = _reduce_table(
            pa.table({key_col: pa.array([], pa.int64()),
                      **{c: pa.array([], pa.int64())
                         for c in (*sum_cols, *min_cols)},
                      **{c: pa.array([], pa.string())
                         for c in first_cols}}))
        return 0, [ray.put(empty)]

    cpus = int(ray.cluster_resources().get("CPU", 8))
    # clamp to >= 2: with num_returns=1 Ray hands back ONE ref holding
    # the whole tuple, so per-range indexing below would mis-fan-out
    k = max(2, num_ranges) if num_ranges else max(
        2, min(64, cpus, len(blocks)))
    cuts = np.linspace(-2.0**63, 2.0**63, k + 1)[1:-1].astype(np.int64)

    @ray.remote
    def split(t: pa.Table):
        t = t.select(cols)
        keys = t[key_col].to_numpy()
        # fail LOUD on a contract violation: an unsorted partial block
        # would silently mis-partition (searchsorted assumes order)
        if len(keys) > 1 and not (keys[1:] >= keys[:-1]).all():
            raise ValueError(
                f"exchange partial block not sorted by '{key_col}' "
                "(the np.unique/argsort partial contract)")
        idx = np.searchsorted(keys, cuts)
        bounds = np.concatenate([[0], idx, [len(keys)]])
        return tuple(t.slice(bounds[i], bounds[i + 1] - bounds[i])
                     for i in range(k))

    @ray.remote(num_returns=2)
    def combine(*shards):
        out = _reduce_table(pa.concat_tables(shards))
        return out.num_rows, out

    split_refs = [split.options(num_returns=k).remote(b)
                  for b in blocks]
    per_range = [[sr[r] for sr in split_refs] for r in range(k)]
    counts, refs = zip(*[combine.remote(*per_range[r]) for r in range(k)])
    counts = ray.get(list(counts))
    total = int(sum(counts))
    kept = [r for c, r in zip(counts, refs) if c > 0]
    # range order == global int64 order: kept refs concatenate into a
    # globally sorted key sequence; keep one typed empty if none survive
    return total, (kept or [refs[0]])


def exchange_common_keys(part, key_col: str, cnt_col: str,
                         min_count: int, num_ranges: int | None = None):
    """Keys whose global count reaches ``min_count`` (``min_count=1`` is
    the distinct reduction).  Per-range refs hold single-column tables,
    globally sorted across the range order."""
    return exchange_reduce(part, key_col, sum_cols=(cnt_col,),
                           min_count=min_count, cnt_col=cnt_col,
                           finish=lambda t: t.select([key_col]),
                           num_ranges=num_ranges)
