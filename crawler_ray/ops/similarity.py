"""Similarity search over the embeddings table.

- ``knn_bruteforce``: exact cosine top-k — the baseline.  Query matrix is
  broadcast once (``ray.put``); each batch does one float64 matmul and
  emits only its local top-k per query (partial top-k combiner), so the
  final shuffle carries k rows per (query, batch) instead of the whole
  score matrix.
- ``knn_ivf``: the scale path — a deterministic k-means (fixed seed,
  driver-side on a sample) builds C centroids; every vector is assigned
  to its nearest centroid in one vectorized pass; queries probe only the
  top-``nprobe`` centroid buckets.  Recall vs the brute-force baseline is
  measured in tests, not assumed.
- ``knn_lsh``: the second scale path — multi-table signed-random-
  projection LSH (a vector is a candidate when ANY table buckets it
  with the query); no training pass at all (the hyperplanes are fixed
  seeded draws), so it suits streaming corpora where a k-means sample
  is stale on arrival.

**I/O pruning (the real index):** by default both approximate paths
persist a bucket-partitioned copy of the embeddings once
(``ivf_build_index`` / ``lsh_build_index``: one assignment pass, spill
files named ``bucket=<b>/part-<content-digest>.parquet`` so a retried
task is idempotent, manifest written last so presence == complete) and
every query job then READS ONLY THE PROBED BUCKETS' FILES — query I/O
is O(corpus * nprobe / n_buckets), not O(corpus)-scanned-then-masked.
The index is memoized per (source fingerprint, params) and reused
across calls; ``persist_index=False`` keeps the index-free streaming
scan (one pass, mask per batch) for corpora read exactly once.
Results are bit-identical between the two modes — the pruned read
drops only rows whose mask was false for every query.  Single builder
per index root assumed (same assumption as the TableStore); at
multi-node scale ``index_root``/``CRAWLER_RAY_ANN_ROOT`` must point at
shared storage.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["knn_bruteforce", "knn_ivf", "ivf_build_centroids",
           "ivf_build_index", "knn_lsh", "lsh_build_index",
           "embedding_assign"]

_ANN_ROOT_ENV = "CRAWLER_RAY_ANN_ROOT"


def _ann_root() -> str:
    base = os.environ.get(_ANN_ROOT_ENV)
    if base:
        return base
    import tempfile
    try:
        import getpass
        user = getpass.getuser()
    except Exception:
        user = f"uid{os.getuid()}" if hasattr(os, "getuid") else "nouser"
    # per-user dir: a fixed shared /tmp path breaks with PermissionError
    # the moment another user created it first
    return os.path.join(tempfile.gettempdir(), f"crawler_ray_ann_{user}")


def _rd():
    import ray.data as rd
    return rd


def _load_queries(sf_dir: str,
                  n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """Query set = the ``n_queries`` smallest vec_ids.  Scale shape: the
    ids are found by a distributed per-batch min-k combiner (the driver
    sees at most n_queries rows per batch, never the table), then the
    query vectors come from ONE pruned point read — row groups selected
    by the [min, max] range conjunct + isin, same trick as the corpus
    store's fetch join (``sources/corpus_store.py``)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    path = f"{sf_dir}/embeddings.parquet"

    def batch_min_k(t: pa.Table) -> pa.Table:
        ids = np.sort(t["vec_id"].to_numpy(zero_copy_only=False))
        return pa.table({"vec_id": pa.array(ids[:n_queries], pa.int64())})

    cand = (_rd().read_parquet(path, columns=["vec_id"])
            .map_batches(batch_min_k, batch_format="pyarrow").to_pandas())
    qids = np.sort(cand["vec_id"].to_numpy())[:n_queries].astype(np.int64)

    filt = ((pc.field("vec_id") >= int(qids.min()))
            & (pc.field("vec_id") <= int(qids.max()))
            & pc.field("vec_id").isin([int(x) for x in qids]))
    t = pads.dataset(path, format="parquet").to_table(
        columns=["vec_id", "embedding"], filter=filt)
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids)
    q = np.stack(t["embedding"].to_pylist()).astype(np.float64)[order]
    q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    return ids[order], q


def _batch_vectors(t: pa.Table):
    """(ids, L2-normalized float64 matrix) for one embeddings batch.
    Constant-length list columns decode via one zero-copy
    ``list_flatten`` + reshape instead of a per-row ``to_pylist``
    (the dominant cost of every ANN batch at 10^5+ rows); ragged or
    null-bearing columns fall back to the row path."""
    import pyarrow.compute as pc

    ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False))
    col = t["embedding"].combine_chunks()
    n = len(col)
    lens = pc.list_value_length(col)
    mm = pc.min_max(lens).as_py() if n else {"min": None, "max": None}
    if (n and col.null_count == 0 and mm["min"] is not None
            and mm["min"] == mm["max"] and mm["min"] > 0):
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
        mat = flat.astype(np.float64, copy=False).reshape(n, mm["min"])
    else:
        mat = np.asarray(col.to_pylist(), dtype=np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                           1e-12)
    return ids, mat


def _masked_topk_table(qids_, qmat_, ids, mat, k, mask_of,
                       dedup_ids: bool = False) -> pa.Table:
    """Per-query candidate-mask partial top-k (shared by the IVF and
    LSH paths; the brute-force path scores all queries in one matmul
    instead).  ``dedup_ids`` collapses repeated vec_ids before scoring
    — the LSH index stores a vector once per hash table, so a batch
    over probed buckets can carry the same vector several times."""
    out_q, out_v, out_s = [], [], []
    for qi in range(len(qids_)):
        mask = mask_of(qi)
        if not mask.any():
            continue
        sub_ids, sub = ids[mask], mat[mask]
        if dedup_ids:
            sub_ids, first = np.unique(sub_ids, return_index=True)
            sub = sub[first]
        scores = sub @ qmat_[qi]
        idx = np.lexsort((sub_ids, -scores))[:k]
        out_q.extend([int(qids_[qi])] * len(idx))
        out_v.extend(sub_ids[idx].tolist())
        out_s.extend(scores[idx].tolist())
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "vec_id": pa.array(out_v, pa.int64()),
                     "score": pa.array(out_s, pa.float64())})


def _final_topk_groups(partials, k: int):
    """Global top-k per query over the partial (query_id, vec_id,
    score) rows — ranks break score ties by vec_id (deterministic)."""

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True],
                          kind="mergesort")
        # a candidate can arrive from several partial batches when the
        # bucketed LSH layout replicates it across hash tables; its
        # score is identical in each, so keep-first is exact
        g = g.drop_duplicates(subset=["vec_id"], keep="first").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        return g[["query_id", "vec_id", "rank"]]

    return partials.groupby("query_id").map_groups(final_topk,
                                                   batch_format="pandas")


def knn_bruteforce(sf_dir: str, k: int = 10, n_queries: int = 4):
    """Exact cosine top-k for the first ``n_queries`` vec_ids.  Returns
    (query_id, vec_id, rank) — ranks break score ties by vec_id so the
    result is deterministic and engine-independent."""
    import ray

    qids, qmat = _load_queries(sf_dir, n_queries)
    q_ref = ray.put((qids, qmat))

    def partial_topk(t: pa.Table) -> pa.Table:
        qids_, qmat_ = ray.get(q_ref)
        ids, mat = _batch_vectors(t)
        scores = qmat_ @ mat.T              # (n_q, n_batch)
        out_q, out_v, out_s = [], [], []
        kk = min(k, scores.shape[1])
        for qi in range(scores.shape[0]):
            # local top-k: order by (-score, vec_id)
            idx = np.lexsort((ids, -scores[qi]))[:kk]
            out_q.extend([int(qids_[qi])] * len(idx))
            out_v.extend(ids[idx].tolist())
            out_s.extend(scores[qi][idx].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    partials = ds.map_batches(partial_topk, batch_format="pyarrow",
                              batch_size=4096)

    return _final_topk_groups(partials, k)


def ivf_build_centroids(sf_dir: str, n_centroids: int = 16,
                        iters: int = 10, seed: int = 7,
                        sample_per_centroid: int = 256) -> np.ndarray:
    """Deterministic mini k-means on a bounded embeddings sample —
    mirrors the reference's pattern of running sklearn DBSCAN driver-side
    on collected features (``core/structure_discovery.py:856-944``), but
    the driver never holds more than ``n_centroids * sample_per_centroid``
    vectors: when the table is larger, rows are picked by a deterministic
    vec_id hash threshold (partitioning-invariant — no RNG over row
    order), filtered distributed, and only the sample is collected."""
    import pyarrow.dataset as pads

    path = f"{sf_dir}/embeddings.parquet"
    target = n_centroids * sample_per_centroid
    n_rows = pads.dataset(path, format="parquet").count_rows()
    if n_rows <= target:
        t = pq.read_table(path, columns=["embedding"])
        mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    else:
        # keep vec_ids whose splitmix64 hash falls under the sampling
        # threshold — oversample slightly so the truncation below is
        # deterministic even if the hash rate lands a little low
        from crawler_ray.ops.dedup import _splitmix64
        thresh = np.uint64(int((1 << 64) * min(1.0, 1.25 * target
                                               / n_rows)))

        def sample(t: pa.Table) -> pa.Table:
            ids = t["vec_id"].to_numpy(zero_copy_only=False)
            h = _splitmix64(ids.astype(np.uint64))
            return t.filter(pa.array(h < thresh))

        st = (_rd().read_parquet(path, columns=["vec_id", "embedding"])
              .map_batches(sample, batch_format="pyarrow").to_pandas())
        st = st.sort_values("vec_id").head(target)
        mat = np.stack(st["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    centroids = mat[rng.choice(len(mat), size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ centroids.T, axis=1)
        for c in range(n_centroids):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids /= np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    return centroids


# ---------------------------------------------------------------------------
# persisted bucket-partitioned index layouts (the I/O-pruning machinery)
# ---------------------------------------------------------------------------

def _source_fingerprint(path: str) -> list:
    st = os.stat(path)
    return [os.path.abspath(path), st.st_mtime_ns, st.st_size]


def _index_root_for(path: str, params: dict,
                    index_root: str | None) -> str:
    if index_root is not None:
        return index_root
    key = json.dumps([_source_fingerprint(path), params], sort_keys=True)
    digest = hashlib.md5(key.encode()).hexdigest()[:16]
    return os.path.join(_ann_root(), f"{params['kind']}-{digest}")


def _load_manifest(root: str, path: str, params: dict) -> dict | None:
    """The manifest is written LAST (atomic rename), so its presence
    means the data pass completed; a fingerprint/params mismatch (the
    source file changed underneath, or a hash collision on the root
    name) invalidates the index."""
    manifest = os.path.join(root, "_INDEX.json")
    if not os.path.exists(manifest):
        return None
    with open(manifest) as f:
        meta = json.load(f)
    if (meta.get("fingerprint") != _source_fingerprint(path)
            or meta.get("params") != params):
        return None
    return meta


def _write_manifest(root: str, path: str, params: dict,
                    extra: dict) -> None:
    meta = {"fingerprint": _source_fingerprint(path), "params": params,
            **extra}
    tmp = os.path.join(root, "_INDEX.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(root, "_INDEX.json"))


def _gc_stale_roots(kind: str, src_path: str, keep_root: str) -> None:
    """Remove sibling DEFAULT-root indexes of the same kind built from
    the same source file under an older fingerprint.  The default root
    name embeds the fingerprint, so every source rewrite would
    otherwise orphan a complete index copy (n_tables x corpus for LSH)
    until the temp dir fills.  Explicit ``index_root`` callers own
    their lifecycle; manifest-less dirs are skipped (possibly another
    builder mid-build)."""
    base = os.path.abspath(_ann_root())
    keep = os.path.abspath(keep_root)
    if os.path.dirname(keep) != base or not os.path.isdir(base):
        return
    src = os.path.abspath(src_path)
    for d in os.listdir(base):
        full = os.path.join(base, d)
        if full == keep or not d.startswith(f"{kind}-"):
            continue
        try:
            with open(os.path.join(full, "_INDEX.json")) as f:
                meta = json.load(f)
        except (OSError, ValueError):
            continue
        fp = meta.get("fingerprint") or [None]
        if fp and fp[0] == src:
            shutil.rmtree(full, ignore_errors=True)


def _spill_bucketed(t: pa.Table, root: str, bucket_col: str,
                    buckets: np.ndarray, suffix: str = "") -> int:
    """Write one batch's rows split by bucket, one file per
    (batch, bucket): ``bucket=<b>/part-<content-digest><suffix>.parquet``.
    The digest is over the batch's vec_ids, so a retried task rewrites
    the SAME files (tmp + rename, idempotent) — the wave pipeline's
    deterministic-name spill pattern."""
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    digest = hashlib.md5(ids.tobytes()).hexdigest()[:16]
    written = 0
    for b in np.unique(buckets):
        sub = t.filter(pa.array(buckets == b))
        d = os.path.join(root, f"{bucket_col}={int(b):06d}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"part-{digest}{suffix}.parquet")
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(sub, tmp, row_group_size=4096)
        os.replace(tmp, path)
        written += sub.num_rows
    return written


def _compact_buckets(root: str, rows_per_file: int = 512_000) -> None:
    """Rewrite each bucket dir's many per-task spill files into a few
    ~``rows_per_file`` files (a 4096-row build batch times hundreds of
    tasks otherwise leaves thousands of tiny parts, and per-file read
    overhead then swamps the probed-bucket pruning).  Memory-bounded:
    parts are merged in runs capped by row count, never a whole bucket
    at once.  Runs as raw Ray tasks — this is filesystem maintenance,
    not a data transform.  Crash-safe: the manifest is written only
    after the whole build, so a partially compacted root is rebuilt
    from scratch."""
    import ray

    dirs = [os.path.join(root, d) for d in sorted(os.listdir(root))
            if os.path.isdir(os.path.join(root, d))]

    @ray.remote(num_cpus=0.5)
    def compact(d: str) -> int:
        parts = sorted(f for f in os.listdir(d)
                       if f.endswith(".parquet"))
        if len(parts) <= 1:
            return 0
        runs: list[list[str]] = [[]]
        run_rows = 0
        for f in parts:
            nr = pq.read_metadata(os.path.join(d, f)).num_rows
            if run_rows + nr > rows_per_file and runs[-1]:
                runs.append([])
                run_rows = 0
            runs[-1].append(f)
            run_rows += nr
        for i, run in enumerate(runs):
            t = pa.concat_tables(
                [pq.read_table(os.path.join(d, f)) for f in run])
            out = os.path.join(d, f"part-c{i:04d}.parquet")
            tmp = f"{out}.tmp.{os.getpid()}"
            pq.write_table(t, tmp, row_group_size=4096)
            os.replace(tmp, out)
        keep = {f"part-c{i:04d}.parquet" for i in range(len(runs))}
        for f in parts:
            if f not in keep:
                os.remove(os.path.join(d, f))
        return len(parts)

    ray.get([compact.remote(d) for d in dirs])


def _bucket_files(root: str, bucket_col: str,
                  bucket_ids: list[int]) -> list[str]:
    """All part files under the named bucket dirs (missing dirs are
    legal: an empty bucket never spilled a file)."""
    out = []
    for b in sorted(set(int(x) for x in bucket_ids)):
        d = os.path.join(root, f"{bucket_col}={b:06d}")
        if os.path.isdir(d):
            out.extend(sorted(
                os.path.join(d, f) for f in os.listdir(d)
                if f.endswith(".parquet")))
    return out


def _read_index_files(paths: list[str], columns: list[str]):
    """Single indirection for the pruned bucket reads — tests
    monkeypatch this to assert query jobs touch ONLY probed buckets."""
    return _rd().read_parquet(paths, columns=columns)


_PARTIAL_SCHEMA = pa.schema([("query_id", pa.int64()),
                             ("vec_id", pa.int64()),
                             ("score", pa.float64())])

# the FINAL result schema — empty early-returns must carry it (an
# empty dataset through groupby().map_groups loses even the partial
# schema: final_topk never runs)
_TOPK_SCHEMA = pa.schema([("query_id", pa.int64()),
                          ("vec_id", pa.int64()),
                          ("rank", pa.int64())])


def ivf_build_index(sf_dir: str, n_centroids: int = 16, seed: int = 7,
                    iters: int = 10, sample_per_centroid: int = 256,
                    index_root: str | None = None) -> str:
    """Persist the centroid-bucketed embeddings layout (build once,
    probe many): k-means centroids from the bounded sample, then ONE
    distributed assignment pass spilling each batch's rows into
    per-bucket files.  Memoized by (source fingerprint, params) — a
    matching manifest short-circuits the whole build.  Returns the
    index root; centroids ride in the manifest so probing never
    recomputes them."""
    import ray

    path = f"{sf_dir}/embeddings.parquet"
    params = {"kind": "ivf", "n_centroids": n_centroids, "seed": seed,
              "iters": iters, "spc": sample_per_centroid}
    root = _index_root_for(path, params, index_root)
    if _load_manifest(root, path, params) is not None:
        return root
    if os.path.exists(root):            # stale or partial build
        shutil.rmtree(root)
    os.makedirs(root, exist_ok=True)

    centroids = ivf_build_centroids(sf_dir, n_centroids, iters=iters,
                                    seed=seed,
                                    sample_per_centroid=sample_per_centroid)
    c_ref = ray.put(centroids)

    def spill(t: pa.Table) -> pa.Table:
        cents = ray.get(c_ref)
        _, mat = _batch_vectors(t)
        assign = np.argmax(mat @ cents.T, axis=1).astype(np.int32)
        t2 = t.append_column("bucket", pa.array(assign, pa.int32()))
        n = _spill_bucketed(t2, root, "bucket", assign)
        return pa.table({"rows": pa.array([n], pa.int64())})

    counts = (_rd().read_parquet(path, columns=["vec_id", "embedding"])
              .map_batches(spill, batch_format="pyarrow", batch_size=4096)
              .materialize())           # side effects run exactly once
    _compact_buckets(root)
    _write_manifest(root, path, params, {
        "centroids": centroids.astype(np.float64).tobytes().hex(),
        "centroid_shape": list(centroids.shape),
        "rows": int(counts.sum("rows") or 0)})
    _gc_stale_roots("ivf", path, root)
    return root


def _ivf_centroids_from_manifest(root: str) -> np.ndarray:
    with open(os.path.join(root, "_INDEX.json")) as f:
        meta = json.load(f)
    return np.frombuffer(
        bytes.fromhex(meta["centroids"]),
        dtype=np.float64).reshape(meta["centroid_shape"]).copy()


def knn_ivf(sf_dir: str, k: int = 10, n_queries: int = 4,
            n_centroids: int = 16, nprobe: int = 4,
            persist_index: bool = True,
            index_root: str | None = None):
    """IVF-bucketed approximate top-k: assign vectors to centroid
    buckets, scan only the ``nprobe`` closest buckets per query.
    Output shape identical to ``knn_bruteforce``.

    Default (``persist_index=True``) probes the persisted layout from
    ``ivf_build_index`` — the query job reads ONLY the union of the
    queries' probed buckets' files, so I/O scales with nprobe/C of the
    corpus.  ``persist_index=False`` is the index-free streaming scan
    (full read, per-batch assignment + mask — compute-pruned, I/O not)
    for a corpus that will be read exactly once anyway.  Both modes
    return bit-identical results (tests pin this)."""
    import ray

    if persist_index:
        root = ivf_build_index(sf_dir, n_centroids, index_root=index_root)
        centroids = _ivf_centroids_from_manifest(root)
    else:
        centroids = ivf_build_centroids(sf_dir, n_centroids)
    qids, qmat = _load_queries(sf_dir, n_queries)
    probe = np.argsort(-(qmat @ centroids.T), axis=1)[:, :nprobe]

    if persist_index:
        paths = _bucket_files(root, "bucket",
                              np.unique(probe).tolist())
        if not paths:
            # a pa.Table keeps the schema; an empty Dataset's
            # to_pandas() would drop the columns entirely
            return _TOPK_SCHEMA.empty_table()
        ctx_ref = ray.put((qids, qmat, probe))

        def pruned_topk(t: pa.Table) -> pa.Table:
            qids_, qmat_, probe_ = ray.get(ctx_ref)
            ids, mat = _batch_vectors(t)
            bkt = t["bucket"].to_numpy(zero_copy_only=False)
            return _masked_topk_table(
                qids_, qmat_, ids, mat, k,
                lambda qi: np.isin(bkt, probe_[qi]))

        partials = (_read_index_files(paths,
                                      ["vec_id", "embedding", "bucket"])
                    .map_batches(pruned_topk, batch_format="pyarrow",
                                 batch_size=4096))
        return _final_topk_groups(partials, k)

    ctx_ref = ray.put((qids, qmat, centroids, probe))

    def partial_topk(t: pa.Table) -> pa.Table:
        qids_, qmat_, cents, probe_ = ray.get(ctx_ref)
        ids, mat = _batch_vectors(t)
        assign = np.argmax(mat @ cents.T, axis=1)
        return _masked_topk_table(
            qids_, qmat_, ids, mat, k,
            lambda qi: np.isin(assign, probe_[qi]))

    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    partials = ds.map_batches(partial_topk, batch_format="pyarrow",
                              batch_size=4096)

    return _final_topk_groups(partials, k)


def _lsh_planes(sf_dir: str, n_tables: int, n_bits: int,
                seed: int) -> np.ndarray:
    """Deterministic signed-random-projection hyperplanes for
    ``n_tables`` independent hash tables, shape (n_tables, n_bits,
    dim).  The embedding dimension comes from one row-group read of
    the first row — never the table."""
    import pyarrow.dataset as pads

    frag = next(pads.dataset(f"{sf_dir}/embeddings.parquet",
                             format="parquet").get_fragments())
    one = frag.head(1, columns=["embedding"])
    dim = len(one["embedding"][0].as_py())
    return np.random.RandomState(seed).randn(n_tables, n_bits, dim)


def _lsh_codes(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Per-table sign patterns packed into int64: (rows, n_tables)."""
    bits = np.einsum("rd,tbd->rtb", mat, planes) > 0
    weights = (1 << np.arange(planes.shape[1], dtype=np.int64))
    return bits.astype(np.int64) @ weights


def lsh_build_index(sf_dir: str, n_tables: int = 8, n_bits: int = 4,
                    seed: int = 7, index_root: str | None = None) -> str:
    """Persist the (table, bucket)-partitioned LSH layout: each vector
    is written once PER HASH TABLE under its table-local bucket key
    ``tkey = table * 2^n_bits + code`` — the classic multi-table LSH
    index trade: ``n_tables``× storage buys O(candidates) query I/O.
    Same memoized-manifest / deterministic-spill machinery as the IVF
    index; the hyperplanes ride in the manifest."""
    import ray

    path = f"{sf_dir}/embeddings.parquet"
    params = {"kind": "lsh", "n_tables": n_tables, "n_bits": n_bits,
              "seed": seed}
    root = _index_root_for(path, params, index_root)
    if _load_manifest(root, path, params) is not None:
        return root
    if os.path.exists(root):            # stale or partial build
        shutil.rmtree(root)
    os.makedirs(root, exist_ok=True)

    planes = _lsh_planes(sf_dir, n_tables, n_bits, seed)
    p_ref = ray.put(planes)
    period = 1 << n_bits

    def spill(t: pa.Table) -> pa.Table:
        planes_ = ray.get(p_ref)
        _, mat = _batch_vectors(t)
        codes = _lsh_codes(mat, planes_)        # (rows, n_tables)
        n = 0
        for tt in range(codes.shape[1]):
            tkeys = (tt * period + codes[:, tt]).astype(np.int32)
            t2 = t.append_column("tkey", pa.array(tkeys, pa.int32()))
            n += _spill_bucketed(t2, root, "tkey", tkeys,
                                 suffix=f"-t{tt}")
        return pa.table({"rows": pa.array([n], pa.int64())})

    counts = (_rd().read_parquet(path, columns=["vec_id", "embedding"])
              .map_batches(spill, batch_format="pyarrow", batch_size=4096)
              .materialize())           # side effects run exactly once
    _compact_buckets(root)
    _write_manifest(root, path, params, {
        "planes": planes.astype(np.float64).tobytes().hex(),
        "plane_shape": list(planes.shape),
        "rows": int(counts.sum("rows") or 0)})
    _gc_stale_roots("lsh", path, root)
    return root


def _lsh_planes_from_manifest(root: str) -> np.ndarray:
    with open(os.path.join(root, "_INDEX.json")) as f:
        meta = json.load(f)
    return np.frombuffer(
        bytes.fromhex(meta["planes"]),
        dtype=np.float64).reshape(meta["plane_shape"]).copy()


def knn_lsh(sf_dir: str, k: int = 10, n_queries: int = 4,
            n_tables: int = 8, n_bits: int = 4, seed: int = 7,
            persist_index: bool = True,
            index_root: str | None = None):
    """LSH-bucketed approximate top-k (the second scale path beside
    IVF): the classic multi-table construction — ``n_tables``
    independent sign-pattern hashes of ``n_bits`` each; a vector is a
    candidate for a query if ANY table puts them in the same bucket
    (per-table collision prob ~ (1 - theta/pi)^n_bits, union over
    tables drives recall).  No training pass at all, so it suits
    streaming corpora where an IVF k-means sample is stale on arrival.
    Same partial-top-k combiner shape as ``knn_bruteforce`` — only
    k rows per (query, batch) ever shuffle.  Output shape identical to
    ``knn_bruteforce``; recall vs the exact baseline is measured in
    tests (``tests/test_similarity_multimodal.py``), not assumed.
    Rows-only in the driver gate: the hyperplanes are numpy RNG draws
    with no SQL twin.

    Default (``persist_index=True``) probes the persisted layout from
    ``lsh_build_index``: the query job reads only the (table, bucket)
    partitions the queries hash into; a vector replicated across
    probed tables is deduped before scoring (within a batch) and at
    the final top-k (across batches), so results are bit-identical to
    the ``persist_index=False`` streaming scan (tests pin this)."""
    import ray

    if persist_index:
        root = lsh_build_index(sf_dir, n_tables, n_bits, seed,
                               index_root=index_root)
        planes = _lsh_planes_from_manifest(root)
    else:
        planes = _lsh_planes(sf_dir, n_tables, n_bits, seed)
    qids, qmat = _load_queries(sf_dir, n_queries)
    qcodes = _lsh_codes(qmat, planes)          # (n_q, n_tables)

    if persist_index:
        period = 1 << n_bits
        qkeys = (np.arange(n_tables, dtype=np.int64)[None, :] * period
                 + qcodes).astype(np.int32)    # (n_q, n_tables)
        paths = _bucket_files(root, "tkey", np.unique(qkeys).tolist())
        if not paths:
            # a pa.Table keeps the schema; an empty Dataset's
            # to_pandas() would drop the columns entirely
            return _TOPK_SCHEMA.empty_table()
        ctx_ref = ray.put((qids, qmat, qkeys))

        def pruned_topk(t: pa.Table) -> pa.Table:
            qids_, qmat_, qkeys_ = ray.get(ctx_ref)
            ids, mat = _batch_vectors(t)
            tk = t["tkey"].to_numpy(zero_copy_only=False)
            return _masked_topk_table(
                qids_, qmat_, ids, mat, k,
                lambda qi: np.isin(tk, qkeys_[qi]),
                dedup_ids=True)

        partials = (_read_index_files(paths,
                                      ["vec_id", "embedding", "tkey"])
                    .map_batches(pruned_topk, batch_format="pyarrow",
                                 batch_size=4096))
        return _final_topk_groups(partials, k)

    ctx_ref = ray.put((qids, qmat, planes, qcodes))

    def partial_topk(t: pa.Table) -> pa.Table:
        qids_, qmat_, planes_, qcodes_ = ray.get(ctx_ref)
        ids, mat = _batch_vectors(t)
        codes = _lsh_codes(mat, planes_)       # (rows, n_tables)
        return _masked_topk_table(
            qids_, qmat_, ids, mat, k,
            lambda qi: (codes == qcodes_[qi][None, :]).any(axis=1))

    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    partials = ds.map_batches(partial_topk, batch_format="pyarrow",
                              batch_size=4096)

    return _final_topk_groups(partials, k)


_ASSIGN_CACHE: dict = {}


def embedding_assign(sf_dir: str, k: int = 8):
    """Nearest-centroid assignment against a DETERMINISTIC seed set —
    the k lowest vec_ids' embeddings are the centroids and every vector
    joins its highest-cosine centroid (ties by lowest centroid id).
    This is the assignment step of embedding-based data mixing
    (SemDeDup / DataComp-style cluster bucketing) made SQL-checkable:
    because the centroid set is a deterministic slice of the table, the
    DuckDB twin replays the exact assignment with
    ``list_cosine_similarity`` + ROW_NUMBER (both sides score in
    float64; the sf corpus' minimum top-2 centroid gap is ~4e-4, so
    summation-order ulps cannot flip an argmax).  Output: (vec_id,
    centroid_id).

    Plan: the k centroids come from the ``_load_queries`` distributed
    min-k combiner + pruned point read (NOT a full ``Dataset.sort`` —
    an all-to-all sort for k rows is the exact anti-pattern the
    min-k/top-k combiners exist to avoid) and ship once via
    ``ray.put`` (zero-copy per node); each batch is one
    (B x d) @ (d x k) float64 matmul + argmax — np.argmax takes the
    FIRST maximum, which on the ascending-cid centroid matrix equals
    the SQL tie-break."""
    import ray

    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    cids, cmat = _load_queries(sf_dir, k)  # normalized, cid-ascending
    c_ref = ray.put((cids.astype(np.int64), cmat))

    def assign(t: pa.Table) -> pa.Table:
        got = _ASSIGN_CACHE.get(c_ref.hex())
        if got is None:
            _ASSIGN_CACHE.clear()
            got = ray.get(c_ref)
            _ASSIGN_CACHE[c_ref.hex()] = got
        cids_, cmat_ = got
        ids, mat = _batch_vectors(t)
        sims = mat @ cmat_.T
        best = sims.argmax(axis=1)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "centroid_id": pa.array(cids_[best], pa.int64()),
        })

    return ds.map_batches(assign, batch_format="pyarrow",
                          batch_size=4096)
