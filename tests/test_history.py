"""O3 history eviction: closed-form Dataset view vs a literal serial
replay of the reference's bounded-dict loop (core/crawler.py:218-222)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from crawler_ray.state.history import evict_history, retained_size


def _reference_replay(keys, tss, max_urls, evict_chunk):
    """The reference's add_visited loop, verbatim semantics: dict keyed
    by url, evict the ``evict_chunk`` oldest by visited_at whenever the
    dict exceeds ``max_urls``.  Ties broken by (visited_at, key) to
    match the operator's documented determinism."""
    history = {}
    for k, t in sorted(zip(keys, tss), key=lambda x: (x[1], x[0])):
        history[k] = t
        if len(history) > max_urls:
            oldest = sorted(history.items(),
                            key=lambda x: (x[1], x[0]))[:evict_chunk]
            for old_k, _ in oldest:
                del history[old_k]
    return history


def _check(keys, tss, max_urls, evict_chunk):
    ds = rd.from_arrow(pa.table({
        "url": pa.array(keys, pa.string()),
        "visited_at": pa.array(tss, pa.float64()),
    })).repartition(7)
    got = evict_history(ds, max_urls=max_urls, evict_chunk=evict_chunk
                        ).to_pandas()
    want = _reference_replay(keys, tss, max_urls, evict_chunk)
    assert len(got) == len(want)
    assert dict(zip(got["url"], got["visited_at"])) == want


def test_matches_reference_replay_unique_keys(ray_session):
    rng = np.random.default_rng(3)
    n = 1237
    keys = [f"https://h{i % 13}.example/p/{i}" for i in range(n)]
    tss = np.cumsum(rng.uniform(0.1, 2.0, n)).tolist()
    _check(keys, tss, max_urls=400, evict_chunk=100)


def test_no_eviction_below_threshold(ray_session):
    keys = [f"u{i}" for i in range(50)]
    tss = [float(i) for i in range(50)]
    _check(keys, tss, max_urls=400, evict_chunk=100)


def test_boundary_sizes(ray_session):
    # exactly max, max+1 (first eviction), and a mid-cycle point
    for n in (400, 401, 457, 500, 501):
        keys = [f"u{i:04d}" for i in range(n)]
        tss = [float(i) for i in range(n)]
        _check(keys, tss, max_urls=400, evict_chunk=100)


def test_retained_size_closed_form():
    # replay-derived truth for a sweep of n
    for n in range(0, 900, 17):
        keys = [f"u{i:04d}" for i in range(n)]
        tss = [float(i) for i in range(n)]
        want = _reference_replay(keys, tss, 300, 100)
        assert retained_size(n, 300, 100) == len(want), n


def test_revisits_collapse_to_latest(ray_session):
    """Operator semantics under revisits: latest visit per key wins,
    retention counts distinct keys (module docstring's exactness
    note)."""
    keys = ["a", "b", "a", "c", "b"]
    tss = [1.0, 2.0, 5.0, 3.0, 4.0]
    ds = rd.from_arrow(pa.table({
        "url": pa.array(keys), "visited_at": pa.array(tss)}))
    got = evict_history(ds, max_urls=10, evict_chunk=2).to_pandas()
    assert dict(zip(got["url"], got["visited_at"])) == {
        "a": 5.0, "b": 4.0, "c": 3.0}
