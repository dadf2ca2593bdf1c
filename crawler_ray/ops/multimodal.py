"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real decode libraries (PIL / ffmpeg / soundfile) are not in this
container, so the decode step is STUBBED two ways:

- ``RealImageDecode``: raises ``NotImplementedError`` with instructions —
  the marked integration point for a real decoder;
- ``FakeDecode``: a deterministic stand-in that derives (width, height,
  n_frames) from the payload bytes, so the Ray-side plumbing — binary
  schema, actor-pool stage signature, small-batch sizing, output layout —
  is real and tested end-to-end.

The payload here is the document text encoded as bytes (a stand-in for an
image/audio blob of realistic size); batches stay small because binary
rows are wide (the batch_size=64 below is the knob that matters at 100 TB
with MB-scale blobs — per the memory-aware sizing rule).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["attach_payload", "FakeDecode", "RealImageDecode",
           "payload_meta", "payload_features"]


def _rd():
    import ray.data as rd
    return rd


def attach_payload(sf_dir: str):
    """documents -> (doc_id, payload:binary) — the opaque-blob column."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def to_bytes(t: pa.Table) -> pa.Table:
        payload = [s.encode("utf-8") for s in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "payload": pa.array(payload, pa.binary())})

    return ds.map_batches(to_bytes, batch_format="pyarrow")


class RealImageDecode:
    """The integration point for a real decoder.  Instantiating it in this
    container raises — by design."""

    def __init__(self):
        raise NotImplementedError(
            "image/audio decode libraries are not available in this "
            "environment; plug a real decoder here (load it ONCE in "
            "__init__, decode per batch in __call__) and swap it for "
            "FakeDecode in the pipeline")


class FakeDecode:
    """Deterministic decode stand-in: metadata derived from the payload
    bytes (stable across runs/processes).  Mirrors the actor-pool shape a
    real decoder needs: model/codec setup once per actor in __init__."""

    def __init__(self):
        self._h = hashlib.blake2b  # "codec handle" loaded once

    def __call__(self, t: pa.Table) -> pa.Table:
        widths, heights, frames = [], [], []
        payloads = t["payload"].to_pylist()
        for p in payloads:
            d = self._h(p, digest_size=4).digest()
            widths.append(64 + d[0] % 192)
            heights.append(64 + d[1] % 192)
            frames.append(1 + d[2] % 8)
        return (t.append_column("width", pa.array(widths, pa.int32()))
                .append_column("height", pa.array(heights, pa.int32()))
                .append_column("n_frames", pa.array(frames, pa.int32())))


def payload_meta(sf_dir: str):
    """SQL-checkable metadata pass: byte length of each payload (what an
    ingest audit computes before decode).  (doc_id, n_bytes)."""
    ds = attach_payload(sf_dir)

    def meta(t: pa.Table) -> pa.Table:
        n = [len(p) for p in t["payload"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "n_bytes": pa.array(n, pa.int64())})

    return ds.map_batches(meta, batch_format="pyarrow")


def payload_features(sf_dir: str):
    """Full multimodal pipeline: payload -> FakeDecode actor pool (small
    batches: binary rows are wide) -> deterministic 4-dim feature vector
    per blob.  Rows-only check (decode is the stubbed step)."""
    ds = attach_payload(sf_dir)
    ds = ds.map_batches(FakeDecode, batch_format="pyarrow",
                        batch_size=64, concurrency=2)

    def features(t: pa.Table) -> pa.Table:
        feats = []
        for p in t["payload"].to_pylist():
            arr = np.frombuffer(
                hashlib.blake2b(p, digest_size=16).digest(),
                dtype=np.uint8).astype(np.float32)
            feats.append((arr[:4] / 255.0).tolist())
        return (t.drop_columns(["payload"])
                .append_column("features",
                               pa.array(feats, pa.list_(pa.float32()))))

    return ds.map_batches(features, batch_format="pyarrow")
