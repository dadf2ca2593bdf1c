"""Per-host politeness rate accounting over a crawl trace.

Computes, for every host: visit count, virtual-time span, implied visit
rate, and the minimum observed inter-visit gap (which must never
undercut the host's crawl-delay — reference ``utils/http.py:200-226``
enforces the delay, this operator audits it after the fact).

Scale shape (the reason this module exists instead of a
``groupby(host).map_groups`` one-liner): per-host ``map_groups`` calls a
Python function once per host — fine at 4-8 hosts, minutes of pure
call overhead at a million.  Here the whole reduction is an associative
tree of VECTORIZED numpy passes and the per-host work never leaves a
batch kernel:

1. sort the trace by ``(host, fetch_vts)`` (one distributed range sort);
2. each batch emits ONE partial row per host *run* it contains
   (count, first/last vts, min in-batch gap) — ``_run_partials``;
3. the partials (a few rows per host per batch) sort by
   ``(host, first_vts)`` and collapse block-locally with the SAME
   associative kernel — ``_merge_runs`` — leaving ~one row per host;
4. a final single-block ``_merge_runs`` pass folds hosts that spanned
   block boundaries, then ``_finalize`` derives span / rate columns.

Step 4 is a one-task reduce over ~#hosts tiny rows (fine through ~10^7
hosts); beyond that, insert more ``repartition(k) + _merge_runs``
levels — the kernel is associative, so the tree deepens without any
semantic change.
"""

from __future__ import annotations

__all__ = ["host_rate_table"]

_PARTIAL_COLS = ("host", "n", "first_vts", "last_vts", "min_gap")


def _run_partials(t):
    """One partial row per host run in a (host, vts)-sorted batch."""
    import numpy as np
    import pyarrow as pa

    if len(t) == 0:
        return _empty_partials()
    hosts = np.asarray(t["host"].to_pylist(), dtype=object)
    vts = t["fetch_vts"].to_numpy(zero_copy_only=False).astype(np.float64)
    starts = np.flatnonzero(
        np.concatenate(([True], hosts[1:] != hosts[:-1])))
    ends = np.concatenate((starts[1:], [len(hosts)]))
    gaps = np.append(np.diff(vts), np.inf)  # gaps[i] = vts[i+1] - vts[i]
    # gap at a run's last element crosses into the next host: mask it
    gaps[ends - 1] = np.inf
    return pa.table({
        "host": pa.array(hosts[starts], pa.string()),
        "n": pa.array(ends - starts, pa.int64()),
        "first_vts": pa.array(vts[starts], pa.float64()),
        "last_vts": pa.array(vts[ends - 1], pa.float64()),
        "min_gap": pa.array(np.minimum.reduceat(gaps, starts),
                            pa.float64()),
    })


def _merge_runs(t):
    """Associative merge of (host, first_vts)-sorted partial runs.

    Collapses every same-host run of partials into one partial,
    folding in the boundary gaps between consecutive partials
    (``next.first_vts - prev.last_vts``).  Output is again a valid
    partials table, so the pass can be stacked into a tree.
    """
    import numpy as np
    import pyarrow as pa

    if len(t) == 0:
        return _empty_partials()
    hosts = np.asarray(t["host"].to_pylist(), dtype=object)
    n = t["n"].to_numpy(zero_copy_only=False)
    first = t["first_vts"].to_numpy(zero_copy_only=False)
    last = t["last_vts"].to_numpy(zero_copy_only=False)
    mg = t["min_gap"].to_numpy(zero_copy_only=False).copy()
    starts = np.flatnonzero(
        np.concatenate(([True], hosts[1:] != hosts[:-1])))
    ends = np.concatenate((starts[1:], [len(hosts)]))
    # boundary[i] = gap between partial i and i+1; pad so that the
    # entry at each run's last partial (a cross-host pair) is masked
    boundary = np.append(first[1:] - last[:-1], np.inf)
    boundary[ends - 1] = np.inf
    merged_gap = np.minimum(np.minimum.reduceat(mg, starts),
                            np.minimum.reduceat(boundary, starts))
    return pa.table({
        "host": pa.array(hosts[starts], pa.string()),
        "n": pa.array(np.add.reduceat(n, starts), pa.int64()),
        "first_vts": pa.array(first[starts], pa.float64()),
        "last_vts": pa.array(last[ends - 1], pa.float64()),
        "min_gap": pa.array(merged_gap, pa.float64()),
    })


def _finalize(t):
    """Derive the user-facing columns from fully merged partials."""
    import numpy as np
    import pyarrow as pa

    n = t["n"].to_numpy(zero_copy_only=False)
    first = t["first_vts"].to_numpy(zero_copy_only=False)
    last = t["last_vts"].to_numpy(zero_copy_only=False)
    mg = t["min_gap"].to_numpy(zero_copy_only=False)
    span = np.where(n > 1, last - first, 0.0)
    rate = np.divide(n - 1, span, out=np.zeros_like(span),
                     where=span > 0) * 60.0
    return pa.table({
        "host": t["host"],
        "n_visits": pa.array(n, pa.int64()),
        "vts_span_sec": pa.array(span, pa.float64()),
        "visits_per_vminute": pa.array(rate, pa.float64()),
        "min_gap_sec": pa.array(np.where(np.isinf(mg), 0.0, mg),
                                pa.float64()),
    })


def _empty_partials():
    import pyarrow as pa
    return pa.table({
        "host": pa.array([], pa.string()),
        "n": pa.array([], pa.int64()),
        "first_vts": pa.array([], pa.float64()),
        "last_vts": pa.array([], pa.float64()),
        "min_gap": pa.array([], pa.float64()),
    })


def host_rate_table(trace_ds):
    """Per-host rate audit of a crawl trace Dataset.

    ``trace_ds`` needs ``host`` (string) and ``fetch_vts`` (float)
    columns; pass a column-pruned ``read_parquet`` of the trace.
    Returns a Dataset with one row per host: ``n_visits``,
    ``vts_span_sec``, ``visits_per_vminute``, ``min_gap_sec``.
    """
    return (trace_ds
            .sort(["host", "fetch_vts"])
            .map_batches(_run_partials, batch_format="pyarrow")
            .sort(["host", "first_vts"])
            .map_batches(_merge_runs, batch_format="pyarrow")
            # order-preserving coalesce (~#hosts tiny rows) for the
            # root of the merge tree; see module docstring for the
            # >10^7-host extension
            .repartition(1)
            .map_batches(_merge_runs, batch_format="pyarrow")
            .map_batches(_finalize, batch_format="pyarrow"))
