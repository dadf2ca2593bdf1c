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
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["knn_bruteforce", "knn_ivf", "ivf_build_centroids",
           "knn_lsh"]


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
    """(ids, L2-normalized float64 matrix) for one embeddings batch."""
    ids = np.asarray(t["vec_id"].to_pylist())
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    return ids, mat


def _masked_topk_table(qids_, qmat_, ids, mat, k, mask_of) -> pa.Table:
    """Per-query candidate-mask partial top-k (shared by the IVF and
    LSH paths; the brute-force path scores all queries in one matmul
    instead)."""
    out_q, out_v, out_s = [], [], []
    for qi in range(len(qids_)):
        mask = mask_of(qi)
        if not mask.any():
            continue
        sub_ids, sub = ids[mask], mat[mask]
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
                          kind="mergesort").head(k)
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


def knn_ivf(sf_dir: str, k: int = 10, n_queries: int = 4,
            n_centroids: int = 16, nprobe: int = 4):
    """IVF-bucketed approximate top-k: assign vectors to centroid buckets
    (one vectorized pass), scan only the ``nprobe`` closest buckets per
    query.  Output shape identical to ``knn_bruteforce``."""
    import ray

    centroids = ivf_build_centroids(sf_dir, n_centroids)
    qids, qmat = _load_queries(sf_dir, n_queries)
    probe = np.argsort(-(qmat @ centroids.T), axis=1)[:, :nprobe]
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


def knn_lsh(sf_dir: str, k: int = 10, n_queries: int = 4,
            n_tables: int = 8, n_bits: int = 4, seed: int = 7):
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
    with no SQL twin."""
    import ray

    planes = _lsh_planes(sf_dir, n_tables, n_bits, seed)
    qids, qmat = _load_queries(sf_dir, n_queries)
    qcodes = _lsh_codes(qmat, planes)          # (n_q, n_tables)
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
