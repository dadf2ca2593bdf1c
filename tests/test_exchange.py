"""Pins for ops/exchange.py — correctness of the reduce itself plus the
byte-accounting property the whole design leans on: the ``split`` stage
returns ZERO-COPY SLICES of each partial block, which is only safe
because Ray's Arrow serialization (the custom serializer ray.data
registers) truncates sliced buffers.  Plain ``pickle.dumps`` of the
same slice ships the ENTIRE parent buffer (measured 22 MB for a 1%%
slice of a 22 MB table on pyarrow 16) — if Ray ever dropped that
serializer, every K-way exchange would ship each block K times; this
test fails loudly in that world."""

import numpy as np
import pyarrow as pa
import pytest

from crawler_ray.ops.exchange import exchange_common_keys, exchange_reduce


def _serialized_bytes(obj) -> int:
    import ray
    ctx = ray._private.worker.global_worker.get_serialization_context()
    return ctx.serialize(obj).total_bytes


def test_slice_serialization_truncates(ray_session):
    """A K-slice fan-out of one block must serialize to ~the block's
    bytes, not K x block (the exchange split contract)."""
    n = 200_000
    t = pa.table({"k": pa.array(np.arange(n), pa.int64()),
                  "s": pa.array([f"row{i:07d}" for i in range(n)],
                                pa.string())})
    full = _serialized_bytes(t)
    k = 16
    cuts = np.linspace(0, n, k + 1).astype(int)
    tup = tuple(t.slice(int(cuts[i]), int(cuts[i + 1] - cuts[i]))
                for i in range(k))
    fanout = _serialized_bytes(tup)
    # amplification would be ~k x; allow 30% framing overhead
    assert fanout < 1.3 * full, (
        f"K-slice fan-out serialized to {fanout} bytes vs parent {full}: "
        "Ray's Arrow slice truncation is gone — combine/compact slices "
        "in ops/exchange.py split() before returning them")
    # and a single small slice must not ship the parent
    one = _serialized_bytes(t.slice(1000, 1000))
    assert one < 0.05 * full


def _mk_partials(rows_per_block, n_keys, seed=0):
    """Materialized Dataset of per-block-unique sorted int64 partials."""
    import ray.data as rd
    rng = np.random.default_rng(seed)
    tables = []
    for nb in rows_per_block:
        keys = rng.choice(n_keys, size=nb, replace=False).astype(np.int64)
        counts = rng.integers(1, 5, size=nb).astype(np.int64)
        order = np.argsort(keys)
        tables.append(pa.table({
            "h": pa.array(keys[order], pa.int64()),
            "n": pa.array(counts[order], pa.int64()),
            "d": pa.array(rng.integers(0, 1000, size=nb)[order]
                          .astype(np.int64), pa.int64()),
        }))
    return rd.from_arrow(tables).materialize(), tables


def _oracle(tables):
    import pandas as pd
    df = pd.concat([t.to_pandas() for t in tables])
    g = df.groupby("h").agg(n=("n", "sum"), d=("d", "min")).reset_index()
    return g.sort_values("h").reset_index(drop=True)


@pytest.mark.parametrize("num_ranges", [None, 1, 2, 7])
def test_exchange_reduce_matches_pandas(ray_session, num_ranges):
    """Sum+min reduction identical to a pandas groupby for any fan-out,
    including the once-broken num_ranges=1 (clamped to 2)."""
    import ray
    part, tables = _mk_partials([100, 57, 83], n_keys=400)
    total, refs = exchange_reduce(part, "h", sum_cols=("n",),
                                  min_cols=("d",),
                                  num_ranges=num_ranges)
    got = pa.concat_tables(ray.get(list(refs))).to_pandas()
    exp = _oracle(tables)
    assert total == len(exp)
    # range order == global key order
    assert (got["h"].to_numpy() == exp["h"].to_numpy()).all()
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    assert (got["d"].to_numpy() == exp["d"].to_numpy()).all()


def test_exchange_common_keys_min_count(ray_session):
    import ray
    part, tables = _mk_partials([80, 80, 80], n_keys=120, seed=3)
    exp = _oracle(tables)
    exp = exp[exp["n"] >= 4]
    total, refs = exchange_common_keys(part, "h", "n", min_count=4)
    got = pa.concat_tables(ray.get(list(refs)))
    assert total == len(exp)
    assert got.column_names == ["h"]
    assert (got["h"].to_numpy() == exp["h"].to_numpy()).all()


def test_exchange_unsorted_partial_fails_loud(ray_session):
    import ray.data as rd
    bad = pa.table({"h": pa.array([5, 1, 3], pa.int64()),
                    "n": pa.array([1, 1, 1], pa.int64())})
    part = rd.from_arrow(bad).materialize()
    with pytest.raises(Exception, match="not sorted"):
        import ray
        total, refs = exchange_reduce(part, "h", sum_cols=("n",))
        ray.get(list(refs))
