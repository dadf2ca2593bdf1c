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

Stage inventory: ``attach_payload`` (blob column), ``FakeDecode`` /
``RealImageDecode`` (decode actor pool), ``FakeResize`` (resize actor
pool), ``frame_sample_batch`` (row-expanding frame sampler), composed
into the ``payload_meta`` / ``payload_features`` / ``payload_frames``
driver queries.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["attach_payload", "FakeDecode", "RealImageDecode",
           "FakeResize", "frame_sample_batch", "payload_meta",
           "payload_features", "payload_frames", "payload_stats"]


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


class FakeResize:
    """Resize stand-in with the real stage's exact shape: target dims
    fixed at actor construction (a real resizer opens its PIL/libvips
    handle here, once per actor), per-batch work in ``__call__``.  The
    stand-in emits a deterministic byte budget proportional to the
    target area so output size scales the way a real resize does."""

    def __init__(self, width: int = 224, height: int = 224):
        self.width = width
        self.height = height
        self._h = hashlib.blake2b  # "codec handle" loaded once

    def __call__(self, t: pa.Table) -> pa.Table:
        n_out = max(8, (self.width * self.height) // 256)
        outs = []
        for p in t["payload"].to_pylist():
            seed = self._h(p, digest_size=8).digest()
            outs.append((seed * (-(-n_out // 8)))[:n_out])
        t = t.drop_columns(["payload"])
        return (t.append_column("payload", pa.array(outs, pa.binary()))
                .append_column("out_width",
                               pa.array([self.width] * len(outs),
                                        pa.int32()))
                .append_column("out_height",
                               pa.array([self.height] * len(outs),
                                        pa.int32())))


def frame_sample_batch(t: pa.Table, max_frames: int = 3) -> pa.Table:
    """Frame sampling as a row-expanding batch transform: each decoded
    payload (with its ``n_frames`` from the decode stage) emits up to
    ``max_frames`` rows — evenly strided frame indices, a deterministic
    byte slice per frame standing in for the decoded frame.  The layout
    (one output row per frame, doc_id carried through, small batches
    upstream) is the real 100-TB shape; only the slice is fake."""
    ids, fidx, frames = [], [], []
    payloads = t["payload"].to_pylist()
    nfs = t["n_frames"].to_pylist()
    doc_ids = t["doc_id"].to_pylist()
    for doc_id, p, nf in zip(doc_ids, payloads, nfs):
        nf = max(1, int(nf))
        take = min(nf, max_frames)
        # evenly spaced, first frame always included
        step = nf / take
        chunk = max(1, len(p) // nf)
        for j in range(take):
            i = int(j * step)
            ids.append(doc_id)
            fidx.append(i)
            frames.append(p[i * chunk:(i + 1) * chunk])
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "frame_idx": pa.array(fidx, pa.int32()),
        "frame": pa.array(frames, pa.binary())})


def payload_frames(sf_dir: str, max_frames: int = 3):
    """Video-style pipeline: payload -> FakeDecode actor pool ->
    resize actor pool -> frame sampling (row-expanding).  Rows-only
    (decode/resize are the stubbed steps); schema and per-doc frame
    counts are pytest-pinned.  Output: (doc_id, frame_idx, frame)."""
    ds = attach_payload(sf_dir)
    # two chained actor pools: fractional num_cpus so the chain plus
    # the read tasks fit a small session (2 full-CPU pools deadlock a
    # 4-CPU cluster); a real codec would size num_cpus to its decode
    # cost instead
    ds = ds.map_batches(FakeDecode, batch_format="pyarrow",
                        batch_size=64, concurrency=2, num_cpus=0.5)
    ds = ds.map_batches(FakeResize, batch_format="pyarrow",
                        batch_size=64, concurrency=2, num_cpus=0.5)
    return ds.map_batches(
        lambda t: frame_sample_batch(t, max_frames=max_frames),
        batch_format="pyarrow")


# magic-byte table for the container sniff — public file signatures
_MAGIC = (
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"RIFF", "riff"),          # wav/avi/webp share the RIFF container
    (b"%PDF", "pdf"),
    (b"PK\x03\x04", "zip"),
    (b"OggS", "ogg"),
    (b"\x1a\x45\xdf\xa3", "matroska"),
)


def payload_stats(sf_dir: str):
    """REAL byte-level payload analysis — no codec stub: container
    sniffing from public magic-byte signatures plus Shannon byte entropy
    and distinct-byte counts from one numpy ``bincount`` per blob (the
    pre-decode triage a multimodal ingest runs to route/validate blobs
    before paying for a decoder).  Output (doc_id, n_bytes, format,
    entropy_milli, n_distinct_bytes); entropy is floor-scaled to milli-
    bits so the value is integer-stable.  Rows-only driver check (byte
    iteration is not reasonably SQL-expressible); magic-byte fixtures
    are pytest-pinned."""
    payloads = attach_payload(sf_dir)

    def stats(t: pa.Table) -> pa.Table:
        fmts, n_bytes, ent, nd = [], [], [], []
        for buf in t["payload"].to_pylist():
            b = np.frombuffer(buf, dtype=np.uint8)
            n_bytes.append(len(b))
            fmt = "unknown"
            for magic, name in _MAGIC:
                if buf[:len(magic)] == magic:
                    fmt = name
                    break
            fmts.append(fmt)
            if len(b):
                counts = np.bincount(b, minlength=256)
                nz = counts[counts > 0]
                p = nz / len(b)
                ent.append(int(-(p * np.log2(p)).sum() * 1000))
                nd.append(int(len(nz)))
            else:
                ent.append(0)
                nd.append(0)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "format": pa.array(fmts, pa.string()),
            "entropy_milli": pa.array(ent, pa.int64()),
            "n_distinct_bytes": pa.array(nd, pa.int64()),
        })

    # binary rows are wide: small batches, task pool (stateless)
    return payloads.map_batches(stats, batch_format="pyarrow",
                                batch_size=256)
