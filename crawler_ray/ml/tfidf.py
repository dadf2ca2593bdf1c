"""Distributed TF-IDF featurizer — the reference's feature layer
(``ml/features.py:197-265`` ``PersianTfidfVectorizer``: an sklearn
``TfidfVectorizer`` over pre-normalized whitespace-tokenized text with
word n-grams and min_df / max_df / max_features vocabulary pruning)
re-derived without sklearn, with the FIT expressed as Ray Dataset
aggregates so the corpus never lands on the driver:

    tokenize+ngram per batch -> (term, tf_in_doc, 1) rows
      -> groupby(term): Sum(tf), Sum(1)=df
      -> min_df/max_df filter -> sort by (tf desc, term) -> limit(max_features)

The driver holds only the final vocabulary (bounded by ``max_features``).
Transform is a stateless vectorized pass with the vocabulary broadcast:
smooth-idf tf-idf rows, l2-normalized (sklearn defaults:
``idf = ln((1+n)/(1+df)) + 1``, raw-count tf).  Feature indices are
assigned in sorted-term order like sklearn's vocabulary; the
``max_features`` tie-break (equal corpus frequency) is defined here as
term-ascending so fits are deterministic under any partitioning.

Tokenizer modes: ``persian`` applies the reference's normalization
(``functions/text.py``) then splits on whitespace (the reference
pre-tokenizes the same way, ``ml/features.py:222`` ``x.split()``);
``ascii`` lowercases and splits on whitespace — for engine-side English
corpora.  The mode is stored in the model artifact so fit and score can
never disagree.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["TfidfVectorizer", "tokenize_texts"]


def _normalize(texts: list[str], mode: str) -> list[str]:
    if mode == "persian":
        from crawler_ray.functions.text import normalize_persian_text
        return [normalize_persian_text(t or "") for t in texts]
    return [(t or "").lower() for t in texts]


def tokenize_texts(texts: list[str], mode: str = "persian",
                   ngram_range: tuple[int, int] = (1, 2)
                   ) -> list[list[str]]:
    """Whitespace tokens of the normalized text, expanded to word
    n-grams joined by single spaces (sklearn word-analyzer semantics)."""
    lo, hi = ngram_range
    out = []
    for text in _normalize(texts, mode):
        toks = text.split()
        grams: list[str] = []
        for n in range(lo, hi + 1):
            if n == 1:
                grams.extend(toks)
            else:
                grams.extend(" ".join(toks[i:i + n])
                             for i in range(len(toks) - n + 1))
        out.append(grams)
    return out


class TfidfVectorizer:
    """Fit on a Ray Dataset (or a plain list of texts for unit tests);
    transform any batch of texts to a dense (n, n_features) float64
    matrix.  State after fit: ``vocab`` (term -> column), ``idf``."""

    def __init__(self, max_features: int = 5000, min_df: int = 2,
                 max_df: float = 0.95,
                 ngram_range: tuple[int, int] = (1, 2),
                 token_mode: str = "persian"):
        self.max_features = max_features
        self.min_df = min_df
        self.max_df = max_df
        self.ngram_range = tuple(ngram_range)
        self.token_mode = token_mode
        self.vocab: dict[str, int] | None = None
        self.idf: np.ndarray | None = None
        self.n_docs: int = 0

    # -- fit -----------------------------------------------------------------
    def fit(self, texts_or_ds, text_col: str = "text") -> "TfidfVectorizer":
        import ray.data as rd
        if isinstance(texts_or_ds, rd.Dataset):
            terms = self._fit_distributed(texts_or_ds, text_col)
        else:
            terms = self._fit_local(list(texts_or_ds))
        # sklearn assigns feature indices in sorted-term order
        order = sorted(terms)
        self.vocab = {t: i for i, t in enumerate(order)}
        df = np.array([terms[t] for t in order], dtype=np.float64)
        self.idf = np.log((1.0 + self.n_docs) / (1.0 + df)) + 1.0
        return self

    def _select(self, df_counts: dict[str, int],
                tf_counts: dict[str, int]) -> dict[str, int]:
        """min_df/max_df filter + top-max_features by corpus frequency
        (tie-break: term ascending).  Returns term -> df."""
        cap = self.max_df * self.n_docs
        kept = [(t, d) for t, d in df_counts.items()
                if d >= self.min_df and d <= cap]
        kept.sort(key=lambda td: (-tf_counts[td[0]], td[0]))
        return dict(kept[:self.max_features])

    def _fit_local(self, texts: list[str]) -> dict[str, int]:
        self.n_docs = len(texts)
        df: dict[str, int] = {}
        tf: dict[str, int] = {}
        for grams in tokenize_texts(texts, self.token_mode,
                                    self.ngram_range):
            seen: dict[str, int] = {}
            for g in grams:
                seen[g] = seen.get(g, 0) + 1
            for g, c in seen.items():
                df[g] = df.get(g, 0) + 1
                tf[g] = tf.get(g, 0) + c
        return self._select(df, tf)

    def _fit_distributed(self, ds, text_col: str) -> dict[str, int]:
        from ray.data.aggregate import Sum

        mode, ngr = self.token_mode, self.ngram_range
        self.n_docs = ds.count()

        def explode(t: pa.Table) -> pa.Table:
            terms: list[str] = []
            tfs: list[int] = []
            for grams in tokenize_texts(t[text_col].to_pylist(), mode,
                                        ngr):
                seen: dict[str, int] = {}
                for g in grams:
                    seen[g] = seen.get(g, 0) + 1
                terms.extend(seen.keys())
                tfs.extend(seen.values())
            return pa.table({
                "term": pa.array(terms, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
                "one": pa.array(np.ones(len(terms), dtype=np.int64))})

        stats = (ds.map_batches(explode, batch_format="pyarrow")
                 .groupby("term")
                 .aggregate(Sum("tf", alias_name="tf"),
                            Sum("one", alias_name="df")))
        cap = self.max_df * self.n_docs
        min_df = self.min_df

        def df_filter(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            keep = pc.and_(pc.greater_equal(t["df"], min_df),
                           pc.less_equal(t["df"], cap))
            return t.filter(keep)

        top = (stats.map_batches(df_filter, batch_format="pyarrow")
               .sort(["tf", "term"], descending=[True, False])
               .limit(self.max_features).to_pandas())
        return dict(zip(top["term"], top["df"].astype(int)))

    # -- transform -----------------------------------------------------------
    def transform(self, texts: list[str]) -> np.ndarray:
        """Dense l2-normalized tf-idf matrix for one batch of texts."""
        if self.vocab is None:
            raise ValueError("TfidfVectorizer is not fitted")
        n = len(texts)
        x = np.zeros((n, len(self.vocab)), dtype=np.float64)
        for i, grams in enumerate(tokenize_texts(texts, self.token_mode,
                                                 self.ngram_range)):
            for g in grams:
                j = self.vocab.get(g)
                if j is not None:
                    x[i, j] += 1.0
        x *= self.idf[None, :]
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        return x / np.maximum(norms, 1e-12)

    # -- artifact round-trip ---------------------------------------------------
    def state(self) -> dict:
        order = sorted(self.vocab, key=self.vocab.get)
        return {"vocab_terms": np.array(order, dtype=np.str_),
                "idf": self.idf,
                "tfidf_meta": np.array(
                    [str(self.max_features), str(self.min_df),
                     str(self.max_df), str(self.ngram_range[0]),
                     str(self.ngram_range[1]), self.token_mode,
                     str(self.n_docs)], dtype=np.str_)}

    @classmethod
    def from_state(cls, arrays: dict) -> "TfidfVectorizer":
        meta = [str(x) for x in arrays["tfidf_meta"]]
        v = cls(max_features=int(meta[0]), min_df=int(meta[1]),
                max_df=float(meta[2]), ngram_range=(int(meta[3]),
                                                    int(meta[4])),
                token_mode=meta[5])
        v.n_docs = int(meta[6])
        terms = [str(t) for t in arrays["vocab_terms"]]
        v.vocab = {t: i for i, t in enumerate(terms)}
        v.idf = np.asarray(arrays["idf"], dtype=np.float64)
        return v
