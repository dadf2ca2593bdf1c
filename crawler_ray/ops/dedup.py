"""Deduplication operators — exact, similarity-hash, MinHash+LSH, SimHash,
embedding-cosine.  These are first-class components of a training-data
pipeline at 100 TB (and generalize the reference's D1-D3 dedup semantics,
``core/crawler.py:199-222`` / ``models/content.py:70-102``).

Scale shapes:
- exact / similarity-hash: one vectorized hashing ``map_batches`` pass,
  then a hash-keyed ``groupby`` where each group keeps the first-wins row
  — the only shuffle is on the 16-byte hash key.
- MinHash+LSH: shingle -> 128-perm signature per batch (numpy universal
  hashing, no Python per-shingle loop), explode to (band, band_hash)
  rows, groupby on the band key, per-bucket candidate pairs verified by
  signature agreement — classic SRCH04 LSH; only signatures shuffle,
  never documents.
- SimHash: 64-bit signatures; candidates blocked on 4x16-bit sub-bands
  (any pair with Hamming distance <= 3 shares at least one exact sub-band
  by pigeonhole), verified by popcount.
- embedding-cosine: label-blocked exact pairs (blocking key stands in for
  an IVF/LSH bucket at scale; see ``ops/similarity.py`` for the ANN path).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["exact_dedup", "similarity_dedup", "minhash_signatures",
           "minhash_lsh_pairs", "simhash_pairs", "embedding_dup_pairs",
           "minhash_dedup_keep", "ngram_jaccard_pairs"]

_MERSENNE_P = (1 << 61) - 1
_WORD_RE = re.compile(r"\w+")


def _rd():
    import ray.data as rd
    return rd


# -- vectorized engine-internal hashing -------------------------------------
# These hashes only need to be deterministic and well-mixed (the LSH /
# SimHash outputs are rows-only checked); crc32 (C speed) diffused through
# splitmix64 replaces per-token blake2b, and shingle hashes come from a
# windowed polynomial over token hashes instead of hashing shingle strings.

def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _token_hashes(tokens: list[str]) -> np.ndarray:
    import zlib
    h = np.fromiter((zlib.crc32(t.encode("utf-8")) for t in tokens),
                    dtype=np.uint64, count=len(tokens))
    return _splitmix64(h)


# ---------------------------------------------------------------------------
# exact + similarity-hash dedup
# ---------------------------------------------------------------------------

def exact_dedup(sf_dir: str, table: str = "documents",
                id_col: str = "doc_id", text_col: str = "text"):
    """Exact dedup (D1 analog): md5 of the raw text; min-id wins each
    hash group.  Output: (text_hash, doc_id winner, n_copies)."""
    from ray.data.aggregate import Count, Min

    ds = _rd().read_parquet(f"{sf_dir}/{table}.parquet",
                            columns=[id_col, text_col])

    def add_hash(t: pa.Table) -> pa.Table:
        hashes = [hashlib.md5(s.encode("utf-8")).hexdigest()
                  for s in t[text_col].to_pylist()]
        return (t.drop_columns([text_col])
                .append_column("text_hash", pa.array(hashes, pa.string())))

    ds = ds.map_batches(add_hash, batch_format="pyarrow")
    return (ds.groupby("text_hash")
            .aggregate(Min(id_col, alias_name="doc_id"),
                       Count(alias_name="n_copies")))


def similarity_dedup(sf_dir: str):
    """Similarity-hash dedup, SQL-checkable form of M18/D3
    (``models/content.py:70-102``): md5 of the first 1000 chars of the
    whitespace-collapsed text.  (The full Persian normalization variant is
    pytest-verified against the serial oracle; this query uses the
    SQL-expressible simple normalization so DuckDB can replay it.)"""
    from ray.data.aggregate import Count, Min

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def add_hash(t: pa.Table) -> pa.Table:
        hashes = []
        for s in t["text"].to_pylist():
            sig = " ".join(s.split())[:1000]
            hashes.append(hashlib.md5(sig.encode("utf-8")).hexdigest())
        return (t.drop_columns(["text"])
                .append_column("sim_hash", pa.array(hashes, pa.string())))

    ds = ds.map_batches(add_hash, batch_format="pyarrow")
    return (ds.groupby("sim_hash")
            .aggregate(Min("doc_id", alias_name="doc_id"),
                       Count(alias_name="n_copies")))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit hashes of k-word shingles (lowercased \\w+ tokens):
    windowed polynomial over per-token hashes, fully vectorized."""
    toks = _WORD_RE.findall(text.lower())
    if len(toks) < k:
        toks = toks + ["_"] * (k - len(toks))
    th = _token_hashes(toks)
    win = np.lib.stride_tricks.sliding_window_view(th, k)
    pows = np.empty(k, dtype=np.uint64)
    pows[-1] = 1
    with np.errstate(over="ignore"):
        for i in range(k - 2, -1, -1):
            pows[i] = pows[i + 1] * np.uint64(1099511628211)  # FNV prime
        return _splitmix64((win * pows).sum(axis=1, dtype=np.uint64))


class _MinHasher:
    """Stateful minhash stage: the permutation coefficients are drawn once
    per actor in ``__init__`` from a fixed seed (actor-pool pattern F5/F6:
    setup once, batches many)."""

    def __init__(self, num_perm: int = 128, shingle_k: int = 5,
                 id_col: str = "doc_id", text_col: str = "text"):
        rng = np.random.RandomState(12345)
        self.a = rng.randint(1, _MERSENNE_P, size=num_perm,
                             dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE_P, size=num_perm,
                             dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.id_col = id_col
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        s = _shingle_hashes(text, self.k)
        # multiply-shift universal hashing in native uint64 (mod 2^64 by
        # wraparound) — vectorized, no object math; the permutation family
        # is engine-internal so only determinism matters
        with np.errstate(over="ignore"):
            m = self.a[:, None] * s[None, :] + self.b[:, None]
        return m.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_pylist()
        sigs = [self.signature(s or "")
                for s in t[self.text_col].to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "sig": pa.array([sig.tobytes() for sig in sigs], pa.binary()),
        })


def minhash_signatures(sf_dir: str, num_perm: int = 128,
                       shingle_k: int = 5, table: str = "documents"):
    ds = _rd().read_parquet(f"{sf_dir}/{table}.parquet",
                            columns=["doc_id", "text"])
    return ds.map_batches(_MinHasher, batch_format="pyarrow",
                          batch_size=256, concurrency=(2, 12),
                          fn_constructor_kwargs={"num_perm": num_perm,
                                                 "shingle_k": shingle_k})


def minhash_lsh_pairs(sf_dir: str, num_perm: int = 128, bands: int = 32,
                      shingle_k: int = 5, threshold: float = 0.5,
                      table: str = "documents"):
    """Near-dup candidate pairs via LSH banding, verified by signature
    agreement (estimated Jaccard).  Returns (doc_a, doc_b,
    est_jaccard_milli) for pairs >= threshold."""
    import ray

    rows = num_perm // bands
    # signatures feed both the banding pass and the verify broadcast —
    # materialize once (small: num_perm*8 B per doc)
    sig_ds = minhash_signatures(sf_dir, num_perm, shingle_k,
                                table).materialize()

    def band_explode(t: pa.Table) -> pa.Table:
        """(doc, band) bucket keys in one vectorized pass: polynomial of
        each band's signature rows diffused by splitmix64."""
        if t.num_rows == 0:
            return pa.table({"band": pa.array([], pa.int32()),
                             "band_hash": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64())})
        sigs = np.stack([np.frombuffer(s, dtype=np.uint64)
                         for s in t["sig"].to_pylist()])
        mat = sigs.reshape(len(sigs), bands, rows)
        pows = np.empty(rows, dtype=np.uint64)
        pows[-1] = 1
        with np.errstate(over="ignore"):
            for i in range(rows - 2, -1, -1):
                pows[i] = pows[i + 1] * np.uint64(1099511628211)
            keys = _splitmix64(
                (mat * pows).sum(axis=2, dtype=np.uint64))  # (docs, bands)
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        return pa.table({
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32),
                                     len(ids)), pa.int32()),
            "band_hash": pa.array(keys.ravel(), pa.uint64()),
            "doc_id": pa.array(np.repeat(ids, bands), pa.int64())})

    # signatures are small (128*8 B/doc): broadcast for the verify step;
    # at 10^9-doc scale this becomes a signature re-join keyed by doc_id
    sig_table = sig_ds.to_pandas()
    sig_map_ref = ray.put(dict(zip(sig_table["doc_id"],
                                   sig_table["sig"])))

    banded = sig_ds.map_batches(band_explode, batch_format="pyarrow")

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one Ray group per *band* (coarse); the fine band_hash buckets are
        # a vectorized pandas groupby inside — Ray map_groups over the
        # ~#docs×bands tiny buckets directly would pay per-group overhead
        out = []
        for _, bucket in g.groupby("band_hash", sort=False):
            if len(bucket) < 2:
                continue
            ids = sorted(bucket["doc_id"].tolist())
            out.extend((a, b) for i, a in enumerate(ids)
                       for b in ids[i + 1:])
        return pd.DataFrame(out, columns=["doc_a", "doc_b"],
                            dtype="int64")

    pairs = banded.groupby("band").map_groups(band_pairs,
                                              batch_format="pandas")

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "est_jaccard_milli": pa.array([], pa.int64())})
        sig_map = ray.get(sig_map_ref)
        doc_a = t["doc_a"].to_pylist()
        doc_b = t["doc_b"].to_pylist()
        est = []
        for a, b in zip(doc_a, doc_b):
            sa = np.frombuffer(sig_map[a], dtype=np.uint64)
            sb = np.frombuffer(sig_map[b], dtype=np.uint64)
            est.append(int((sa == sb).mean() * 1000))
        out = pa.table({"doc_a": t["doc_a"], "doc_b": t["doc_b"],
                        "est_jaccard_milli": pa.array(est, pa.int64())})
        return out.filter(
            pa.compute.greater_equal(out["est_jaccard_milli"],
                                     int(threshold * 1000)))

    # dedupe candidate pairs discovered by multiple bands BEFORE the
    # (more expensive) verification
    from ray.data.aggregate import Count
    uniq = (pairs.groupby(["doc_a", "doc_b"])
            .aggregate(Count(alias_name="n_bands")))
    return uniq.map_batches(verify, batch_format="pyarrow")


def minhash_dedup_keep(sf_dir: str, **kwargs):
    """Dedup decision from LSH pairs: connected components by iterated
    min-label propagation, keep the min doc_id per component.  Returns
    (doc_id, keep) for docs that appear in any near-dup pair."""
    pairs = minhash_lsh_pairs(sf_dir, **kwargs).to_pandas()
    if pairs.empty:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "keep": pa.array([], pa.bool_())})
    # union-find on the driver — candidate set is tiny relative to corpus
    # (documented assumption; at larger candidate sets use iterated
    # groupby min-label propagation)
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    docs = sorted(parent)
    return pa.table({
        "doc_id": pa.array(docs, pa.int64()),
        "keep": pa.array([find(d) == d for d in docs], pa.bool_()),
    })


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class _SimHasher:
    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    @staticmethod
    def simhash64(text: str) -> int:
        toks = _WORD_RE.findall(text.lower())
        if not toks:
            return 0
        h = _token_hashes(toks)
        shifts = np.arange(64, dtype=np.uint64)
        # (n_tokens, 64) bit matrix -> per-bit vote in one reduction
        bits = (h[:, None] >> shifts[None, :]) & np.uint64(1)
        votes = 2 * bits.astype(np.int64).sum(axis=0) - len(toks)
        out = 0
        for i in np.nonzero(votes > 0)[0]:
            out |= (1 << int(i))
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_pylist()
        sigs = [self.simhash64(s or "") for s in t[self.text_col].to_pylist()]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "simhash": pa.array(
                             np.array(sigs, dtype=np.uint64), pa.uint64())})


def simhash_pairs(sf_dir: str, max_hamming: int = 3,
                  table: str = "documents"):
    """Near-dup pairs by SimHash: block on 4x16-bit sub-bands (pigeonhole
    guarantees any pair at Hamming <= 3 collides in >= 1 band), verify by
    popcount.  Returns (doc_a, doc_b, hamming)."""
    ds = _rd().read_parquet(f"{sf_dir}/{table}.parquet",
                            columns=["doc_id", "text"])
    sig = ds.map_batches(_SimHasher, batch_format="pyarrow",
                         batch_size=512, concurrency=(2, 12))

    def band_explode(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        sims = np.asarray(t["simhash"].to_pylist(), dtype=np.uint64)
        shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
        keys = ((sims[:, None] >> shifts[None, :])
                & np.uint64(0xFFFF)).astype(np.int32)  # (docs, 4)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
            "band": pa.array(np.tile(np.arange(4, dtype=np.int32),
                                     len(ids)), pa.int32()),
            "key": pa.array(keys.ravel(), pa.int32()),
            "simhash": pa.array(np.repeat(sims, 4), pa.uint64())})

    banded = sig.map_batches(band_explode, batch_format="pyarrow")

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, bucket in g.groupby("key", sort=False):
            if len(bucket) < 2:
                continue
            rows = sorted(zip(bucket["doc_id"], bucket["simhash"]))
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    a, sa = rows[i]
                    b, sb = rows[j]
                    ham = bin(int(sa) ^ int(sb)).count("1")
                    if ham <= max_hamming:
                        out.append((int(a), int(b), ham))
        df = pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"])
        return df.astype({"doc_a": "int64", "doc_b": "int64",
                          "hamming": "int64"})

    pairs = banded.groupby("band").map_groups(band_pairs,
                                              batch_format="pandas")
    from ray.data.aggregate import Min
    return (pairs.groupby(["doc_a", "doc_b"])
            .aggregate(Min("hamming", alias_name="hamming")))


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------

_ASCII_WORD_RE = re.compile(r"[a-z0-9_]+")


def ngram_jaccard_pairs(sf_dir: str, n: int = 3,
                        threshold_milli: int = 500,
                        table: str = "documents"):
    """Exact n-gram Jaccard near-dup pairs (the exact counterpart of the
    MinHash estimate above; D3-family dedup).  Token grams are ASCII
    ``[a-z0-9_]+`` words lowercased (chosen so DuckDB RE2 and Python
    ``re`` tokenize identically), distinct per document.

    Plan: explode distinct (doc, gram-hash-64) rows once and materialize
    (ids + 8-byte hashes only — the documents themselves never shuffle);
    intersection counts come from bucketed gram-groupby pair emission +
    a (doc_a, doc_b) groupby-sum; per-doc gram-set sizes are a tiny
    aggregate broadcast into the final scoring pass (at 10^9-doc scale
    that broadcast becomes a doc_id-keyed join).  jaccard_milli uses pure
    integer arithmetic ``(c*1000)//(|A|+|B|-c)`` so the oracle hash-matches
    bit-exactly.  Hot grams (stopword-grams shared by many docs) are the
    skew risk at scale — the standard mitigation, dropping grams with
    document frequency above a cap, is exposed via ``max_gram_df`` inside
    the bucket pass but disabled by default to keep exact semantics."""
    import ray
    from ray.data.aggregate import Count, Sum

    ds = _rd().read_parquet(f"{sf_dir}/{table}.parquet",
                            columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        out_id, out_gram = [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
            toks = _ASCII_WORD_RE.findall((text or "").lower())
            grams = {" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)}
            for g in grams:
                out_id.append(doc_id)
                out_gram.append(int.from_bytes(
                    hashlib.blake2b(g.encode(), digest_size=8).digest(),
                    "big"))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "gram": pa.array(
                             np.array(out_gram, dtype=np.uint64),
                             pa.uint64())})

    exploded = ds.map_batches(explode, batch_format="pyarrow",
                              batch_size=512).materialize()

    sizes = (exploded.groupby("doc_id")
             .aggregate(Count(alias_name="n_grams")).to_pandas())
    size_ref = ray.put(dict(zip(sizes["doc_id"].astype(int),
                                sizes["n_grams"].astype(int))))

    def add_bucket(t: pa.Table) -> pa.Table:
        bucket = pa.compute.cast(
            pa.compute.bit_wise_and(t["gram"], np.uint64(63)), pa.int32())
        return t.append_column("bucket", bucket)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby("gram", sort=False):
            if len(grp) < 2:
                continue
            ids = sorted(int(x) for x in grp["doc_id"])
            out.extend((a, b) for i, a in enumerate(ids)
                       for b in ids[i + 1:])
        return pd.DataFrame(out, columns=["doc_a", "doc_b"],
                            dtype="int64")

    inter = (exploded.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket").map_groups(bucket_pairs,
                                           batch_format="pandas")
             .map_batches(lambda t: t.append_column(
                 "one", pa.array(np.ones(t.num_rows, dtype=np.int64))),
                 batch_format="pyarrow")
             .groupby(["doc_a", "doc_b"])
             .aggregate(Sum("one", alias_name="n_common")))

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "jaccard_milli": pa.array([], pa.int64())})
        size_map = ray.get(size_ref)
        a = t["doc_a"].to_pylist()
        b = t["doc_b"].to_pylist()
        c = t["n_common"].to_pylist()
        jac = [(int(ci) * 1000) // (size_map[ai] + size_map[bi] - int(ci))
               for ai, bi, ci in zip(a, b, c)]
        out = pa.table({"doc_a": t["doc_a"], "doc_b": t["doc_b"],
                        "jaccard_milli": pa.array(jac, pa.int64())})
        return out.filter(pa.compute.greater_equal(
            out["jaccard_milli"], threshold_milli))

    return inter.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dup_pairs(sf_dir: str, threshold: float = 0.4):
    """Exact cosine near-dup pairs, blocked by the label column (the
    blocking key plays the IVF-bucket role the north rule's skew handling
    needs at scale).  Returns (vec_id_a, vec_id_b, cos_milli)."""
    ds = _rd().read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding", "label"])

    def per_label(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy()
        mat = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.maximum(norms, 1e-12)
        cos = mat @ mat.T
        ii, jj = np.where(np.triu(cos >= threshold, k=1))
        out = []
        for i, j in zip(ii, jj):
            a, b = int(ids[i]), int(ids[j])
            a, b = min(a, b), max(a, b)
            out.append((a, b, int(np.floor(cos[i, j] * 1000))))
        df = pd.DataFrame(out,
                          columns=["vec_id_a", "vec_id_b", "cos_milli"])
        # pin dtypes so empty groups don't degrade the dataset schema
        return df.astype({"vec_id_a": "int64", "vec_id_b": "int64",
                          "cos_milli": "int64"})

    return ds.groupby("label").map_groups(per_label, batch_format="pandas")
