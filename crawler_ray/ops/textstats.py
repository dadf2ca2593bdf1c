"""Text analysis operators over the documents table: token counting,
language ID, quality scoring, document fingerprinting.

SQL-checkable ops stick to primitives both Python ``re`` and DuckDB RE2
evaluate identically on this corpus: ``\\S+`` token splits, codepoint-class
counts (Arabic block vs ASCII letters), integer-scaled ratios.  The
winnowing fingerprint is not SQL-expressible (rows-only check).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

__all__ = ["token_counts", "bpe_token_counts", "lang_id", "text_quality", "fingerprints",
           "classify_docs", "classify_docs_model", "curate_corpus",
           "pii_scrub", "repetition_stats", "top_bigrams",
           "dataset_split", "chunk_documents", "pack_manifest",
           "contamination_check"]

def _rd():
    import ray.data as rd
    return rd


def token_counts(sf_dir: str):
    """(doc_id, n_tokens) with whitespace tokenization (M16 analog for
    generic text; the Persian tokenizer path is pytest-covered).
    Pure Arrow RE2 kernel — the same ``\\S+`` the DuckDB oracle runs, so
    parity is by construction and the scan carries zero Python."""
    import pyarrow.compute as pc

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def count(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pc.cast(
                pc.count_substring_regex(t["text"], r"\S+"), pa.int64()),
        })

    return ds.map_batches(count, batch_format="pyarrow")


_BPE_PAT = (r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+"
            r"| ?[^\s\p{L}\p{N}]+|\s+")


def bpe_token_counts(sf_dir: str):
    """(doc_id, n_bpe_tokens, n_ws_tokens) — the BPE-ish pre-tokenizer
    count next to the whitespace count: the GPT-2 pre-tokenizer pattern
    with its lookahead clause dropped (RE2 has no lookahead; both
    pyarrow and DuckDB run RE2, so the simplified pattern means exactly
    the same thing on both sides — leftmost-first alternation
    included).  The BPE-ish count is the standard loader-budget number
    ("how many sequences will this corpus pack into"), the ratio
    n_bpe/n_ws a cheap fertility proxy.  Pure Arrow RE2 kernels, zero
    Python in the scan; SQL twin is the literal same pattern."""
    import pyarrow.compute as pc

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def count(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "n_bpe_tokens": pc.cast(
                pc.count_substring_regex(t["text"], _BPE_PAT),
                pa.int64()),
            "n_ws_tokens": pc.cast(
                pc.count_substring_regex(t["text"], r"\S+"), pa.int64()),
        })

    return ds.map_batches(count, batch_format="pyarrow")


def lang_id(sf_dir: str):
    """Heuristic script-based language ID (the engine's analog of the
    reference's implicit fa-only assumption): counts Arabic-block vs
    ASCII-letter codepoints; 'fa' when Arabic dominates, else 'en'.
    Output: (doc_id, n_arabic, n_latin, lang_pred)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n_ar = pc.cast(pc.count_substring_regex(
            t["text"], "[؀-ۿ]"), pa.int64())
        n_la = pc.cast(pc.count_substring_regex(
            t["text"], "[A-Za-z]"), pa.int64())
        pred = pc.if_else(pc.greater(n_ar, n_la), "fa", "en")
        return pa.table({"doc_id": t["doc_id"], "n_arabic": n_ar,
                         "n_latin": n_la, "lang_pred": pred})

    return ds.map_batches(score, batch_format="pyarrow")


def text_quality(sf_dir: str):
    """Structural quality features (integer-scaled, parity shapes with the
    reference's structural features ``ml/features.py:554-668``):
    n_words, n_chars_nonws, avg_word_len_milli, question_marks."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        text = t["text"]
        w = pc.cast(pc.count_substring_regex(text, r"\S+"),
                    pa.int64()).to_numpy()
        c = pc.utf8_length(pc.replace_substring_regex(
            text, r"\s", "")).cast(pa.int64()).to_numpy()
        avg = np.where(w > 0, (c * 1000) // np.maximum(w, 1), 0)
        q = pc.add(pc.count_substring(text, "?"),
                   pc.count_substring(text, "؟")).cast(pa.int64())
        return pa.table({"doc_id": t["doc_id"],
                         "n_words": pa.array(w, pa.int64()),
                         "n_chars_nonws": pa.array(c, pa.int64()),
                         "avg_word_len_milli": pa.array(avg, pa.int64()),
                         "question_marks": q})

    return ds.map_batches(score, batch_format="pyarrow")


class _Winnower:
    """Winnowing fingerprinter (Schleimer et al. 2003): k-gram rolling
    hashes, minimum per sliding window, distinct fingerprints per doc.
    Stateful stage — window/k fixed per actor."""

    def __init__(self, k: int = 8, window: int = 4):
        self.k = k
        self.window = window

    def fingerprints(self, text: str) -> list[int]:
        data = text.encode("utf-8", errors="replace")
        if len(data) < self.k:
            data = data + b"\0" * (self.k - len(data))
        # vectorized k-gram hashing: windowed polynomial over bytes
        # diffused by splitmix64 (the hash is engine-internal; only
        # determinism and mixing matter)
        from crawler_ray.ops.dedup import _splitmix64
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        win = np.lib.stride_tricks.sliding_window_view(arr, self.k)
        pows = np.empty(self.k, dtype=np.uint64)
        pows[-1] = 1
        with np.errstate(over="ignore"):
            for i in range(self.k - 2, -1, -1):
                pows[i] = pows[i + 1] * np.uint64(1099511628211)
            hashes = _splitmix64((win * pows).sum(axis=1, dtype=np.uint64))
        if len(hashes) <= self.window:
            return [int(hashes.min())]
        view = np.lib.stride_tricks.sliding_window_view(hashes, self.window)
        return sorted(set(int(x) for x in view.min(axis=1)))

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        fps = [self.fingerprints(s) for s in texts]
        return pa.table({
            "doc_id": t["doc_id"],
            "n_fingerprints": pa.array([len(f) for f in fps], pa.int64()),
            "min_fingerprint": pa.array(
                [min(f) for f in fps],
                pa.uint64()),
        })


def fingerprints(sf_dir: str, k: int = 8, window: int = 4):
    """Document fingerprints for overlap detection (rows-only check; the
    hash choice is engine-internal)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return ds.map_batches(_Winnower, batch_format="pyarrow",
                          batch_size=512, concurrency=(2, 12),
                          fn_constructor_kwargs={"k": k, "window": window})


# Six keywords per class on purpose: the reference normalizes keyword
# counts by dictionary size before the argmax (``ml/features.py:400-422``);
# with equal-size dictionaries the raw-count argmax is identical, which
# keeps the oracle SQL in exact integer arithmetic.
DOC_CLASS_KEYWORDS: dict[str, list[str]] = {
    "sql": ["query", "table", "join", "scan", "filter", "sort"],
    "streaming": ["stream", "window", "watermark", "event", "batch",
                  "state"],
    "ml": ["vector", "model", "train", "embed", "feature", "label"],
}

# Tokenize with an explicit ASCII word class instead of ``\b`` keyword
# regexes: Python ``re`` word boundaries are Unicode-aware while DuckDB's
# RE2 boundaries are ASCII, so a non-ASCII word character adjacent to a
# keyword would make engine and oracle counts diverge.  ``[a-z0-9_]+``
# means the same thing in both engines (same trick as
# ``ngram_jaccard_pairs``).
_WORD_RE = re.compile(r"[a-z0-9_]+")
_CLASS_SETS = {name: frozenset(kws)
               for name, kws in DOC_CLASS_KEYWORDS.items()}


def classify_docs(sf_dir: str):
    """Keyword-frequency document classification (classifier parity F6:
    keyword scoring ``ml/features.py:400-422,514-534``, argmax with
    dictionary-order tie-break and all-zero -> 'other',
    ``core/classifier.py:242-249`` / ``crawler_ray/functions/classify.py``).
    Keywords are counted over ``[a-z0-9_]+`` tokens (tokenize once, count
    by set membership) so Python ``re`` and DuckDB RE2 produce identical
    counts regardless of adjacent non-ASCII characters.  Output: (doc_id,
    n_sql, n_streaming, n_ml, doc_class)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def classify(t: pa.Table) -> pa.Table:
        texts = [s.lower() for s in t["text"].to_pylist()]
        toks = [_WORD_RE.findall(s) for s in texts]
        counts = {name: [sum(1 for w in ws if w in kws) for ws in toks]
                  for name, kws in _CLASS_SETS.items()}
        labels = []
        for i in range(len(texts)):
            cs = [(counts[name][i], name) for name in DOC_CLASS_KEYWORDS]
            if all(c == 0 for c, _ in cs):
                labels.append("other")
            else:
                best = max(range(len(cs)), key=lambda j: (cs[j][0], -j))
                labels.append(cs[best][1])
        return pa.table({"doc_id": t["doc_id"],
                         "n_sql": pa.array(counts["sql"], pa.int64()),
                         "n_streaming": pa.array(counts["streaming"],
                                                 pa.int64()),
                         "n_ml": pa.array(counts["ml"], pa.int64()),
                         "doc_class": pa.array(labels, pa.string())})

    return ds.map_batches(classify, batch_format="pyarrow")


def classify_docs_model(sf_dir: str, model_dir: str | None = None,
                        seed: int = 42):
    """Model-backed document classification (F6/O8 end-to-end): a seeded
    TF-IDF + softmax artifact is trained on first use
    (``crawler_ray/ml/training.py:train_doc_class_model``, deterministic
    under the fixed seed), discovered newest-by-mtime exactly like the
    reference (``core/classifier.py:154-179``), and applied as an
    actor-pool ``map_batches`` stage (model loaded once per actor).
    Output: (doc_id, pred_class).  Not SQL-expressible (rows-only in the
    driver gate); prediction quality and determinism are pytest-pinned
    in ``tests/test_ml_training.py``."""
    from crawler_ray.ml.model import ModelClassifier, find_latest_model
    from crawler_ray.ml.training import train_doc_class_model

    model_dir = model_dir or "/tmp/crawler_ray_models"
    prefix = "doc_class_classifier_"
    if find_latest_model(model_dir, prefix) is None:
        train_doc_class_model(model_dir, seed=seed)
    path = find_latest_model(model_dir, prefix)

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return ds.map_batches(
        ModelClassifier, batch_format="pyarrow", batch_size=256,
        concurrency=(2, 8),
        fn_constructor_kwargs={"model_path": path},
    ).select_columns(["doc_id", "pred_class"])


# per-worker-process cache of the curation winner index, keyed by the
# broadcast ObjectRef (reused worker processes keep it across batches)
_VERDICT_IDX_CACHE: dict = {}


def curate_corpus(sf_dir: str, min_words: int = 30,
                  broadcast_threshold: int = 1_000_000,
                  join_partitions: int | None = None):
    """Training-data curation verdict per document — the composition the
    dedup/quality/lang operators exist for: exact-dedup first-wins, then
    a minimum-length quality gate.  Output (doc_id, n_words, verdict) with
    verdict in {'dup', 'short', 'keep'} (first matching rule wins, so the
    decision is order-deterministic and SQL-replayable).

    Plan shape: one hashing+counting pass over the documents (vectorized
    per batch), a Min-aggregate on the 16-byte hash to pick winners —
    only hashes shuffle, never text.  The winner set reaches the verdict
    pass by the usual planner decision: a corpus at or under
    ``broadcast_threshold`` docs ships the (hash -> keep_id) map once via
    ``ray.put``, a larger one routes it through a hash-keyed
    ``Dataset.join`` so the winner table never lands on the driver
    (``broadcast_threshold=0`` forces the join path — pytest pins the
    two paths identical)."""
    import pyarrow.dataset as pads
    import ray

    from crawler_ray.ops.dedup import _join_partitions
    from crawler_ray.ops.exchange import exchange_reduce

    path = f"{sf_dir}/documents.parquet"
    n_docs = pads.dataset(path, format="parquet").count_rows()
    ds = _rd().read_parquet(path, columns=["doc_id", "text"])

    def hash_and_count(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from crawler_ray.ops.hashkeys import md5_key64

        # md5-low64 bit-cast group key (the exchange/join key; the
        # module's documented ~2^-64 collision approximation)
        h64 = md5_key64(t["text"]).view(np.int64)
        # same RE2 \S+ kernel as token_counts / text_quality and the
        # DuckDB twin — ONE token definition across the whole suite
        # (Python re's \S treats Unicode spaces like NBSP differently)
        words = pc.cast(pc.count_substring_regex(t["text"], r"\S+"),
                        pa.int64())
        return pa.table({"doc_id": t["doc_id"],
                         "h64": pa.array(h64, pa.int64()),
                         "n_words": words})

    hashed = ds.map_batches(hash_and_count,
                            batch_format="pyarrow").materialize()

    # winner per hash via the hash-range exchange (a sort groupby over
    # 1M unique hash keys measured ~40 s of curate_corpus's 45 s at 1M
    # docs; see ops/exchange.py) — partials pre-reduce per batch
    def win_partial(t: pa.Table) -> pa.Table:
        h = t["h64"].to_numpy()
        ids = t["doc_id"].to_numpy()
        order = np.argsort(h, kind="stable")
        return pa.table({"h64": pa.array(h[order], pa.int64()),
                         "keep_id": pa.array(ids[order], pa.int64())})

    win_part = hashed.map_batches(win_partial,
                                  batch_format="pyarrow").materialize()
    _, win_refs = exchange_reduce(win_part, "h64",
                                  min_cols=("keep_id",))

    def finish(t: pa.Table, keep_ids: np.ndarray) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        words = t["n_words"].to_numpy(zero_copy_only=False)
        out = np.where(keep_ids != ids, "dup",
                       np.where(words < min_words, "short", "keep"))
        return pa.table({"doc_id": t["doc_id"], "n_words": t["n_words"],
                         "verdict": pa.array(out.tolist(), pa.string())})

    if n_docs <= broadcast_threshold:
        # ship the winner map as TWO parallel sorted numpy arrays
        # (zero-copy from the object store; range order == global
        # order) and resolve each batch with one searchsorted
        tables = ray.get(win_refs)
        win_ref = ray.put((
            np.concatenate([t["h64"].to_numpy() for t in tables]),
            np.concatenate([t["keep_id"].to_numpy() for t in tables])))

        def verdict_broadcast(t: pa.Table) -> pa.Table:
            pair = _VERDICT_IDX_CACHE.get(win_ref.hex())
            if pair is None:
                _VERDICT_IDX_CACHE.clear()
                # hex key: a held ObjectRef would pin the broadcast
                # arrays in the object store after the job ends
                pair = ray.get(win_ref)
                _VERDICT_IDX_CACHE[win_ref.hex()] = pair
            keys, keep = pair
            h = t["h64"].to_numpy()
            # every batch hash is present by construction (the winner
            # map covers all hashes), so searchsorted is a total lookup
            keep_ids = keep[np.searchsorted(keys, h)]
            return finish(t, keep_ids)

        return hashed.map_batches(verdict_broadcast,
                                  batch_format="pyarrow")

    # at-scale path: hash-keyed winner join — the winner table never
    # lands on the driver (the exchange's per-range refs ARE the side)
    winners_r = _rd().from_arrow_refs(win_refs)
    joined = hashed.join(winners_r, "inner",
                         num_partitions=_join_partitions(join_partitions,
                                                         approx_rows=n_docs),
                         on=("h64",))

    def verdict_joined(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_words": pa.array([], pa.int64()),
                             "verdict": pa.array([], pa.string())})
        return finish(t, t["keep_id"].to_numpy(zero_copy_only=False))

    return joined.map_batches(verdict_joined, batch_format="pyarrow")


# -- PII scrubbing -----------------------------------------------------------
# Patterns restricted to syntax RE2 evaluates identically in Arrow
# (replace/count_substring_regex) and DuckDB (regexp_replace/extract_all):
# no backreferences, no lookaround.  Scrub order is fixed (email, phone,
# ipv4) and each count is taken on the text AS IT STANDS when that
# pattern's replace runs, so n_email/n_phone/n_ipv4 are exactly the
# number of placeholders each step wrote — audit-accurate — and the SQL
# twin is a literal replay of the same sequence.  The phone class is
# [\d\- ] (not \s): a run must stay on one line, so a digit run cannot
# swallow newline-separated numbers or digits from an adjacent list.
_PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def pii_scrub(sf_dir: str):
    """PII redaction over the documents table — the standard
    training-data scrub pass (emails, phone runs, IPv4 literals
    rewritten to typed placeholder tokens).  Output (doc_id, n_email,
    n_phone, n_ipv4, text_scrubbed).

    Entirely Arrow compute kernels (RE2) per batch — zero Python in the
    hot path, so the stage runs at C++ scan speed and streams at any
    corpus size.  SQL twin: the same three RE2 patterns through DuckDB's
    regexp_extract_all/regexp_replace."""
    import pyarrow.compute as pc

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        cols = {"doc_id": t["doc_id"]}
        scrubbed = t["text"]
        for name, pat, repl in _PII_PATTERNS:
            # count on the CURRENT text (post earlier scrub steps) so the
            # count equals the placeholders this replace writes
            cols[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(scrubbed, pat), pa.int64())
            scrubbed = pc.replace_substring_regex(scrubbed, pat, repl)
        cols["text_scrubbed"] = scrubbed
        return pa.table(cols)

    return ds.map_batches(scrub, batch_format="pyarrow")


def repetition_stats(sf_dir: str):
    """Gopher-style within-document repetition signals (Rae et al.
    2021, "Scaling Language Models", Appendix A1.1 quality filters —
    re-derived here over whitespace tokens): per document,
    total / distinct word counts, the most-frequent word's share and the
    duplicate-word fraction (both integer-scaled to milli-units so the
    SQL twin is bit-exact).  Tokens are the non-empty runs of a
    single-space split — the same list DuckDB's ``string_split`` yields —
    and documents with zero tokens are dropped (mirroring the SQL
    unnest+group shape).  Output (doc_id, n_words, n_distinct,
    top_share_milli, dup_frac_milli).

    Vectorized: one Arrow split per batch, numpy repeat for the
    doc-index spine, one pandas composite groupby for the tallies —
    per-batch work is C loops over the flattened token stream."""
    import pandas as pd
    import pyarrow.compute as pc

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], " ")
        lens = pc.list_value_length(words).to_numpy()
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        doc_ids = np.repeat(t["doc_id"].to_numpy(), lens)
        mask = flat != ""
        df = pd.DataFrame({"d": doc_ids[mask], "w": flat[mask]})
        per_pair = df.groupby(["d", "w"], sort=False).size()
        by_doc = per_pair.groupby(level=0, sort=True)
        total = by_doc.sum().to_numpy()
        distinct = by_doc.size().to_numpy()
        top = by_doc.max().to_numpy()
        ids = by_doc.sum().index.to_numpy()
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array(total, pa.int64()),
            "n_distinct": pa.array(distinct, pa.int64()),
            "top_share_milli": pa.array(1000 * top // total, pa.int64()),
            "dup_frac_milli": pa.array(
                1000 * (total - distinct) // total, pa.int64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


def top_bigrams(sf_dir: str, k: int = 50):
    """Corpus-wide top-k word bigrams — the canonical
    pre-aggregate-before-shuffle pattern: each batch tallies its own
    bigram counts (integer-code factorize + np.unique), so only
    (hash, partial_count, bigram) rows — bounded by distinct bigrams
    per batch, not corpus size — reach the hash-range exchange
    (``ops/exchange.py``; the sort-based groupby this replaced measured
    57 s at 1M docs for a 97k-group result, the exchange ~3 s).  Ranges
    partition the key space, so each combiner takes its own top-k and
    the driver merges K*k rows.  Keys are md5-low64 bigram hashes with
    the module's documented ~2^-64 collision approximation; ties break
    by bigram ascending so the result is deterministic.  Output
    (bigram, n), n descending."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    from crawler_ray.ops.dedup import _token_hashes
    from crawler_ray.ops.exchange import exchange_reduce

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], " ")
        lens = pc.list_value_length(words).to_numpy()
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        mask = flat != ""
        flat, doc_idx = flat[mask], doc_idx[mask]
        if len(flat) < 2:
            # full typed empty — must carry the same (h, n, bigram)
            # schema as the non-empty branch or the materialized
            # partials hold heterogeneous blocks
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "bigram": pa.array([], pa.string())})
        same_doc = doc_idx[:-1] == doc_idx[1:]
        # factorize words once (C hash) and tally integer bigram codes;
        # strings are built only for the batch's DISTINCT bigrams, so
        # per-batch work is O(tokens) integer ops + O(distinct) strings
        codes, uniques = pd.factorize(flat)
        uniques = np.asarray(uniques, dtype=object)
        a = codes[:-1][same_doc].astype(np.int64)
        b = codes[1:][same_doc].astype(np.int64)
        key = a * len(uniques) + b
        uk, counts = np.unique(key, return_counts=True)
        bg = (pd.Series(uniques[uk // len(uniques)])
              .str.cat(pd.Series(uniques[uk % len(uniques)]), sep=" "))
        h = _token_hashes(list(bg)).view(np.int64)
        order = np.argsort(h)
        return pa.table({
            "h": pa.array(h[order], pa.int64()),
            "n": pa.array(counts[order], pa.int64()),
            "bigram": pa.array(bg, pa.string()).take(pa.array(order)),
        })

    def topk_range(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2
        if t.num_rows > k:
            idx = pc2.sort_indices(
                t, sort_keys=[("n", "descending"),
                              ("bigram", "ascending")])[:k]
            t = t.take(idx)
        return t

    part = ds.map_batches(partial, batch_format="pyarrow").materialize()
    _, refs = exchange_reduce(part, "h", sum_cols=("n",),
                              first_cols=("bigram",), finish=topk_range)
    merged = pa.concat_tables(ray.get(refs)).select(["bigram", "n"])
    idx = pc.sort_indices(merged, sort_keys=[("n", "descending"),
                                             ("bigram", "ascending")])[:k]
    return _rd().from_arrow(merged.take(idx))


def dataset_split(sf_dir: str, test_permille: int = 100,
                  val_permille: int = 100):
    """Deterministic train/val/test assignment — the standard
    hash-bucket split of a training corpus: bucket = first 8 hex chars
    of md5(doc_id as decimal string) mod 1000, then test / val / train
    by permille thresholds (test first, then val — fixed rule order).
    Output (doc_id, bucket, split).

    Content-independent and stable under repartitioning or resharding
    (the hash keys on doc_id alone), so reruns and incremental appends
    land every document in the same split.  SQL twin: DuckDB md5 over
    the same decimal string."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])
    t_cut = test_permille
    v_cut = test_permille + val_permille

    def assign(t: pa.Table) -> pa.Table:
        from crawler_ray.ops.hashkeys import md5_bucket
        buckets = md5_bucket(t["doc_id"])
        split = np.where(buckets < t_cut, "test",
                         np.where(buckets < v_cut, "val", "train"))
        return pa.table({"doc_id": t["doc_id"],
                         "bucket": pa.array(buckets, pa.int64()),
                         "split": pa.array(split.tolist(), pa.string())})

    return ds.map_batches(assign, batch_format="pyarrow")


def chunk_documents(sf_dir: str, chunk_tokens: int = 32):
    """Fixed-size token chunking — each document's token stream (the
    same non-empty single-space split as ``repetition_stats``) cut into
    consecutive ``chunk_tokens``-token windows, the training-data
    pre-tokenization pass.  Row-expanding output (doc_id, chunk_idx,
    n_tokens, chunk_text); zero-token documents vanish.

    Vectorized: one Arrow split per batch, numpy integer math for the
    per-token (doc, chunk) assignment, one pandas groupby join to
    reassemble chunk text — no per-row Python in the scan."""
    import pandas as pd
    import pyarrow.compute as pc

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def chunk(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], " ")
        lens = pc.list_value_length(words).to_numpy()
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        doc_ids = np.repeat(t["doc_id"].to_numpy(), lens)
        row_idx = np.repeat(np.arange(len(lens)), lens)
        mask = flat != ""
        flat, doc_ids, row_idx = flat[mask], doc_ids[mask], row_idx[mask]
        if len(flat) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "chunk_idx": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "chunk_text": pa.array([], pa.string())})
        # position of each surviving token within its document
        starts = np.flatnonzero(np.diff(row_idx, prepend=-1))
        pos = np.arange(len(flat)) - np.repeat(starts, np.diff(
            np.append(starts, len(flat))))
        chunk_idx = pos // chunk_tokens
        df = pd.DataFrame({"doc_id": doc_ids, "chunk_idx": chunk_idx,
                           "w": flat})
        g = df.groupby(["doc_id", "chunk_idx"], sort=True)
        joined = g["w"].agg(" ".join)
        counts = g.size()
        idx = joined.index
        return pa.table({
            "doc_id": pa.array(idx.get_level_values(0).to_numpy(),
                               pa.int64()),
            "chunk_idx": pa.array(idx.get_level_values(1).to_numpy(),
                                  pa.int64()),
            "n_tokens": pa.array(counts.to_numpy(), pa.int64()),
            "chunk_text": pa.array(joined.to_numpy(), pa.string()),
        })

    return ds.map_batches(chunk, batch_format="pyarrow")


def pack_manifest(sf_dir: str, seq_tokens: int = 64,
                  bucket_size: int = 4096):
    """Sequence-packing manifest — the concat-then-split packing every
    GPT-style pretraining loader performs (documents joined end-to-end,
    cut at fixed context length): documents are laid end-to-end in
    doc_id order and
    cut into ``seq_tokens``-token training sequences; each document's
    row records where its tokens land.  Output (doc_id, n_tokens,
    tok_offset, first_seq, last_seq) with tok_offset the document's
    global token start, and first/last_seq = the sequence indexes of its
    first and last token (zero-token documents carry first_seq =
    last_seq = the sequence their offset falls in).

    The global prefix sum is computed in two levels so no driver-side
    per-document state exists: (1) per-doc token counts aggregate into
    doc_id-range buckets (``bucket_size`` docs per bucket — the groupby
    key), (2) the driver cumsums only the bucket totals (corpus_size /
    bucket_size rows) and broadcasts them, (3) each bucket's documents
    get their within-bucket cumsum in one ``map_groups`` task.  SQL
    twin: ``SUM(...) OVER (ORDER BY doc_id)``."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def count_tokens(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], " ")
        lens = pc.list_value_length(words).to_numpy()
        flat = pc.list_flatten(words)
        nonempty = pc.cast(pc.not_equal(flat, ""), pa.int64()).to_numpy(
            zero_copy_only=False)
        # per-doc count of non-empty tokens: segment-sum of the mask
        csum = np.concatenate([[0], np.cumsum(nonempty)])
        bounds = np.concatenate([[0], np.cumsum(lens)])
        n = csum[bounds[1:]] - csum[bounds[:-1]]
        ids = t["doc_id"].to_numpy()
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(n, pa.int64()),
                         "bucket": pa.array(ids // bucket_size,
                                            pa.int64())})

    counts = ds.map_batches(count_tokens,
                            batch_format="pyarrow").materialize()
    # level 1: bucket totals (one row per bucket_size docs) -> driver
    totals = counts.groupby("bucket").sum("n_tokens").to_pandas()
    totals = totals.sort_values("bucket").reset_index(drop=True)
    starts = np.concatenate(
        [[0], np.cumsum(totals["sum(n_tokens)"].to_numpy())[:-1]])
    bucket_offset = dict(zip(totals["bucket"].to_numpy(), starts))
    off_ref = ray.put(bucket_offset)

    # level 2: within-bucket cumsum, offset by the bucket's global start
    def finish(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)[df["bucket"].iloc[0]]
        df = df.sort_values("doc_id")
        n = df["n_tokens"].to_numpy()
        tok_offset = off + np.concatenate([[0], np.cumsum(n)[:-1]])
        first_seq = tok_offset // seq_tokens
        last_tok = tok_offset + np.maximum(n - 1, 0)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_tokens": n,
            "tok_offset": tok_offset,
            "first_seq": first_seq,
            "last_seq": last_tok // seq_tokens,
        })

    return counts.groupby("bucket").map_groups(finish,
                                               batch_format="pandas")


def contamination_check(sf_dir: str, n: int = 3,
                        broadcast_threshold: int = 2_000_000,
                        join_partitions: int | None = None):
    """Benchmark decontamination — for every train-split document, how
    many of its distinct word ``n``-grams also occur anywhere in the
    test split (the held-out set a real pipeline must not leak — the
    n-gram-overlap decontamination of Brown et al. 2020, "Language
    Models are Few-Shot Learners", Appendix C).  Splits
    come from ``dataset_split``'s content-independent hash rule, derived
    in-map with no shuffle.  Output (doc_id, n_grams, n_contaminated)
    for train documents with at least one ``n``-gram.

    Scale shape: grams travel as the same 64-bit hashes
    ``ngram_jaccard_pairs`` uses (splitmix64 over md5-low64 token
    hashes — no gram strings are ever built; two distinct grams
    colliding can flip one membership bit, ~2^-64 per gram pair, the
    module's documented approximation).  The test-side gram set is
    deduplicated distributedly (``groupby`` on the hash), then the
    usual planner decision — at or under ``broadcast_threshold``
    distinct grams it ships once via ``ray.put`` as a sorted int64
    array and the train scan counts membership with a vectorized
    binary search; above it the train (doc_id, gram) rows inner-join
    the gram set so neither side lands on the driver
    (``broadcast_threshold=0`` forces the join path; pytest pins the
    two paths identical)."""
    import pyarrow.compute as pc
    import ray

    from crawler_ray.ops.dedup import (_join_partitions, _join_ready,
                                       _splitmix64, _token_hashes)
    from crawler_ray.ops.exchange import (exchange_common_keys,
                                          exchange_reduce)

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def _split_mask(ids) -> np.ndarray:
        from crawler_ray.ops.hashkeys import md5_bucket
        return md5_bucket(ids)  # bucket; test < 100, train >= 200

    _FNV = np.uint64(1099511628211)

    def _doc_grams(t: pa.Table):
        """(doc_row_local_idx, gram_hash int64) — DISTINCT per doc."""
        empty = (np.array([], dtype=np.int64),) * 2
        words = pc.split_pattern(t["text"], " ")
        lens = pc.list_value_length(words).to_numpy()
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        row_idx = np.repeat(np.arange(len(lens)), lens)
        mask = flat != ""
        flat, row_idx = flat[mask], row_idx[mask]
        m = len(flat) - n + 1
        if m <= 0:
            return empty
        hs = _token_hashes(list(flat))
        with np.errstate(over="ignore"):
            acc = hs[:m].copy()
            for j in range(1, n):
                acc = _splitmix64(acc * _FNV + hs[j:j + m])
        same = row_idx[:m] == row_idx[n - 1:]
        d = row_idx[:m][same]
        g = acc[same].view(np.int64)
        if len(d) == 0:
            return empty
        # distinct per doc: doc-major sort + adjacent dedupe (no hashes
        # of hashes, no Python objects)
        order = np.lexsort((g, d))
        d, g = d[order], g[order]
        keep = np.concatenate(
            [[True], (d[1:] != d[:-1]) | (g[1:] != g[:-1])])
        return d[keep], g[keep]

    def test_grams(t: pa.Table) -> pa.Table:
        buckets = _split_mask(t["doc_id"].to_pylist())
        sub = t.filter(pa.array(buckets < 100))
        _, g = _doc_grams(sub)
        u = np.unique(g)  # sorted int64, unique — the exchange contract
        return pa.table({"g": pa.array(u, pa.int64()),
                         "n": pa.array(np.ones(len(u), np.int64),
                                       pa.int64())})

    # distinct bench grams via the hash-range exchange (the sort-based
    # groupby this replaced paid full-shuffle cost on mostly-unique
    # gram hashes; see ops/exchange.py for measurements)
    bench_part = ds.map_batches(test_grams,
                                batch_format="pyarrow").materialize()
    n_bench, bench_refs = exchange_common_keys(bench_part, "g", "n", 1)

    def train_doc_grams(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        buckets = _split_mask(ids)
        sub = t.filter(pa.array(buckets >= 200))
        d, g = _doc_grams(sub)
        doc_ids = sub["doc_id"].to_numpy()[d] if len(d) else d
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "g": pa.array(g, pa.int64())})

    train = ds.map_batches(train_doc_grams, batch_format="pyarrow")

    if n_bench <= broadcast_threshold:
        # range order == global order: the concat is already sorted
        gs = np.concatenate(
            [t["g"].to_numpy() for t in ray.get(bench_refs)])
        gs_ref = ray.put(gs.astype(np.int64, copy=False))

        def count_broadcast(t: pa.Table) -> pa.Table:
            s = ray.get(gs_ref)  # sorted int64, zero-copy from plasma
            gv = t["g"].to_numpy()
            if len(s):
                idx = np.clip(np.searchsorted(s, gv), 0, len(s) - 1)
                hit = (s[idx] == gv).astype(np.int64)
            else:
                hit = np.zeros(len(gv), dtype=np.int64)
            d = t["doc_id"].to_numpy()
            # train_doc_grams emits doc-major rows; within a batch a
            # plain bincount over compacted ids does the tally
            uniq, inv = np.unique(d, return_inverse=True)
            return pa.table({
                "doc_id": pa.array(uniq, pa.int64()),
                "n_grams": pa.array(np.bincount(inv), pa.int64()),
                "n_contaminated": pa.array(
                    np.bincount(inv, weights=hit).astype(np.int64),
                    pa.int64()),
            })

        # per-batch partials then a sum-combine (a doc's grams can span
        # batch boundaries) — the per-doc sum is again the
        # mostly-singleton-groups shape, so it goes through the
        # exchange too; count_broadcast's np.unique doc ids satisfy the
        # sorted-unique partial contract
        part = (train.map_batches(count_broadcast,
                                  batch_format="pyarrow").materialize())
        _, out_refs = exchange_reduce(
            part, "doc_id", sum_cols=("n_grams", "n_contaminated"))
        return _rd().from_arrow_refs(out_refs)

    # join path: (doc_id, g) x bench grams — nothing lands on the driver
    bench = _rd().from_arrow_refs(bench_refs)
    parts = _join_partitions(join_partitions, approx_rows=n_bench)
    train_r = _join_ready(train.groupby(["doc_id", "g"]).count(),
                          pa.schema([("doc_id", pa.int64()),
                                     ("g", pa.int64()),
                                     ("count()", pa.int64())]))
    totals = train_r.groupby("doc_id").count()
    hits = train_r.join(bench, "inner", num_partitions=parts, on=("g",),
                        right_suffix="_b").groupby("doc_id").count()
    totals_r = _join_ready(totals, pa.schema([("doc_id", pa.int64()),
                                              ("count()", pa.int64())]))
    hits_r = _join_ready(hits, pa.schema([("doc_id", pa.int64()),
                                          ("count()", pa.int64())]))
    joined = totals_r.join(hits_r, "left_outer", num_partitions=parts,
                           on=("doc_id",), right_suffix="_hit")

    def finish(t: pa.Table) -> pa.Table:
        hit = t["count()_hit"].to_pandas().fillna(0).astype("int64")
        return pa.table({"doc_id": t["doc_id"],
                         "n_grams": t["count()"],
                         "n_contaminated": pa.array(hit.to_numpy(),
                                                    pa.int64())})

    return joined.map_batches(finish, batch_format="pyarrow")
