"""Pins for ops/hashkeys.py — the DuckDB-vectorized md5 kernels must
reproduce the hashlib rules bit-exactly (every oracle twin and every
persisted hash depends on these conventions)."""

import hashlib

import numpy as np
import pyarrow as pa

from crawler_ray.ops.hashkeys import (md5_bucket, md5_hex_and_key64,
                                      md5_key64)

# mixed shapes: small ints, big ints, unicode, empty, long
IDS = [0, 1, 7, 999, 12345678901234, 2**62]
TEXTS = ["", "hello world", "äöü فارسی", "a" * 5000, "7:42", "\n\t x "]


def test_md5_bucket_matches_hashlib():
    exp = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                    % 1000 for i in IDS], dtype=np.int64)
    # pa.Array, ChunkedArray, numpy, and plain-list inputs all agree
    got_arr = md5_bucket(pa.array(IDS, pa.int64()))
    got_ch = md5_bucket(pa.chunked_array([pa.array(IDS[:3], pa.int64()),
                                          pa.array(IDS[3:], pa.int64())]))
    got_np = md5_bucket(np.array(IDS, dtype=np.int64))
    got_list = md5_bucket(IDS)
    for got in (got_arr, got_ch, got_np, got_list):
        assert np.array_equal(got, exp)
    assert md5_bucket([], mod=1000).shape == (0,)


def test_md5_bucket_mod():
    got = md5_bucket(IDS, mod=7)
    exp = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                    % 7 for i in IDS], dtype=np.int64)
    assert np.array_equal(got, exp)


def test_md5_key64_matches_hashlib():
    exp = np.array(
        [int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
         for s in TEXTS], dtype=np.uint64)
    got = md5_key64(pa.array(TEXTS, pa.string()))
    assert got.dtype == np.uint64
    assert np.array_equal(got, exp)
    assert md5_key64([]).shape == (0,)


def test_md5_hex_and_key64_matches_hashlib():
    hexes, k64 = md5_hex_and_key64(pa.array(TEXTS, pa.string()))
    assert hexes.type == pa.string()
    assert hexes.to_pylist() == [hashlib.md5(s.encode()).hexdigest()
                                 for s in TEXTS]
    exp = np.array(
        [int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
         for s in TEXTS], dtype=np.uint64)
    assert np.array_equal(k64, exp)
    he, ke = md5_hex_and_key64([])
    assert len(he) == 0 and ke.shape == (0,)
