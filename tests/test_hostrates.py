"""host_rate_table: vectorized tree-merge vs a brute-force oracle."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from crawler_ray.ops.hostrates import host_rate_table


def _brute_force(hosts, vts):
    """Straight per-host python computation of the same stats."""
    by_host = {}
    for h, v in zip(hosts, vts):
        by_host.setdefault(h, []).append(v)
    rows = {}
    for h, vs in by_host.items():
        vs = sorted(vs)
        n = len(vs)
        gaps = [b - a for a, b in zip(vs, vs[1:])]
        span = vs[-1] - vs[0] if n > 1 else 0.0
        rows[h] = {
            "n_visits": n,
            "vts_span_sec": span,
            "visits_per_vminute": (n - 1) / span * 60 if span > 0 else 0.0,
            "min_gap_sec": min(gaps) if gaps else 0.0,
        }
    return rows


def _run(hosts, vts, num_blocks):
    ds = rd.from_arrow(pa.table({
        "host": pa.array(hosts, pa.string()),
        "fetch_vts": pa.array(vts, pa.float64()),
    })).repartition(num_blocks)
    got = host_rate_table(ds).to_pandas().set_index("host")
    want = _brute_force(hosts, vts)
    assert sorted(got.index) == sorted(want)
    for h, w in want.items():
        g = got.loc[h]
        assert int(g["n_visits"]) == w["n_visits"], h
        for col in ("vts_span_sec", "visits_per_vminute", "min_gap_sec"):
            assert math.isclose(g[col], w[col], rel_tol=1e-9,
                                abs_tol=1e-12), (h, col)


def test_interleaved_hosts_many_blocks(ray_session):
    """Hosts interleaved in input order, runs forced across many tiny
    blocks so both merge levels do real work."""
    rng = np.random.default_rng(7)
    hosts, vts = [], []
    clocks = {f"h{i:02d}.example": 10.0 * i for i in range(12)}
    for _ in range(400):
        h = rng.choice(list(clocks))
        clocks[h] += float(rng.uniform(0.5, 9.0))
        hosts.append(h)
        vts.append(clocks[h])
    _run(hosts, vts, num_blocks=17)


def test_single_visit_and_mega_host(ray_session):
    """One-visit hosts (no gap → 0.0) next to one host holding 90% of
    rows (its run spans every block)."""
    hosts = ["lonely-a", "lonely-b"]
    vts = [5.0, 99.0]
    mega_vts = np.cumsum(np.linspace(1.0, 2.0, 300)).tolist()
    hosts += ["mega.example"] * 300
    vts += mega_vts
    _run(hosts, vts, num_blocks=23)
    # degenerate: every host a single visit
    _run([f"s{i}" for i in range(20)], [float(i) for i in range(20)],
         num_blocks=7)


def test_zero_span_ties(ray_session):
    """Repeated identical vts per host: span 0, rate 0, min gap 0."""
    _run(["t.example"] * 5, [3.0] * 5, num_blocks=3)


def test_empty_trace(ray_session):
    out = host_rate_table(rd.from_arrow(pa.table({
        "host": pa.array([], pa.string()),
        "fetch_vts": pa.array([], pa.float64()),
    }))).to_pandas()
    assert len(out) == 0  # empty Dataset → no rows (Ray drops the
    # schema of an all-empty pipeline; column names are pinned by the
    # non-empty tests above)
