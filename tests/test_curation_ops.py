"""Unit tests for the curation passes added for training-data pipelines:
PII scrubbing, repetition stats, corpus bigrams (``ops/textstats.py``).

The synthetic documents tables contain no PII and no punctuation, so the
sf0.001 oracle parity in test_ops_oracle only proves the zero case —
these tests plant real fixtures and pin the interesting branches."""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_ray.ops import textstats  # noqa: E402


@pytest.fixture()
def planted_sf(tmp_path):
    """A documents.parquet with planted PII / repetition shapes."""
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "contact bob.smith+spam@mail.example.org or "
            "alice@sub.domain.io today",
            "call +98 21 1234-5678 or 09123456789 now; server at "
            "10.0.0.1 and 192.168.100.200",
            "a a a a b",             # top word 4/5, dup frac 3/5
            "x  y",                  # double space -> empty token dropped
            "",                      # zero tokens -> dropped from stats
        ], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_pii_scrub_planted(ray_session, planted_sf):
    out = {r["doc_id"]: r
           for r in textstats.pii_scrub(planted_sf).take_all()}
    assert out[0]["n_email"] == 2
    assert out[0]["text_scrubbed"] == "contact <EMAIL> or <EMAIL> today"
    assert out[1]["n_email"] == 0
    assert out[1]["n_phone"] == 2
    assert out[1]["n_ipv4"] == 2
    assert "<PHONE>" in out[1]["text_scrubbed"]
    assert "<IP>" in out[1]["text_scrubbed"]
    assert "10.0.0.1" not in out[1]["text_scrubbed"]
    # clean doc passes through untouched
    assert out[2]["text_scrubbed"] == "a a a a b"
    assert out[4]["text_scrubbed"] == ""


def test_pii_scrub_sequential_counts(ray_session, tmp_path):
    """Counts are audit-accurate: each pattern counts the text AS IT
    STANDS when its replace runs, and the phone class excludes newlines
    so runs cannot bridge lines (round-3 ADVICE items)."""
    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([
            # digit-run local part: the email scrub consumes it first,
            # so the phone step sees no digits left to redact
            "reach 123-456-7890@mail.example.com now",
            # two 9-digit runs split by a newline -> TWO phone matches
            # (the old [\d\-\s] class merged them into one)
            "a 123456789\n987654321 b",
        ], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r
           for r in textstats.pii_scrub(str(tmp_path)).take_all()}
    assert out[0]["n_email"] == 1
    assert out[0]["n_phone"] == 0
    assert out[0]["text_scrubbed"] == "reach <EMAIL> now"
    assert out[1]["n_phone"] == 2
    assert out[1]["text_scrubbed"] == "a <PHONE>\n<PHONE> b"


def test_repetition_stats_planted(ray_session, planted_sf):
    out = {r["doc_id"]: r
           for r in textstats.repetition_stats(planted_sf).take_all()}
    r = out[2]  # "a a a a b"
    assert (r["n_words"], r["n_distinct"]) == (5, 2)
    assert r["top_share_milli"] == 800      # floor(1000*4/5)
    assert r["dup_frac_milli"] == 600       # floor(1000*3/5)
    r = out[3]  # "x  y": the empty token between the spaces is dropped
    assert (r["n_words"], r["n_distinct"]) == (2, 2)
    assert r["top_share_milli"] == 500
    assert r["dup_frac_milli"] == 0
    assert 4 not in out  # zero-token doc dropped (matches the SQL shape)


def test_top_bigrams_planted(ray_session, planted_sf):
    got = textstats.top_bigrams(planted_sf, k=3).take_all()
    # doc2 "a a a a b" -> 'a a' x3 dominates; every other bigram occurs
    # once, and the n=1 ties break by bigram ascending ('+98 21' first)
    assert (got[0]["bigram"], got[0]["n"]) == ("a a", 3)
    assert [r["n"] for r in got[1:]] == [1, 1]
    assert got[1]["bigram"] == "+98 21"
    assert got[1]["bigram"] < got[2]["bigram"]
    # doc3 "x  y": the empty token is dropped, so the bigram bridges the
    # double space
    all_rows = textstats.top_bigrams(planted_sf, k=100).take_all()
    assert ("x y", 1) in [(r["bigram"], r["n"]) for r in all_rows]


def test_top_bigrams_no_cross_doc(ray_session, tmp_path):
    """Bigrams never bridge document boundaries."""
    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["p q", "q p"], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = textstats.top_bigrams(str(tmp_path), k=10).take_all()
    assert sorted((r["bigram"], r["n"]) for r in got) == [
        ("p q", 1), ("q p", 1)]


def test_dataset_split_deterministic(ray_session, planted_sf):
    import hashlib

    a = sorted(textstats.dataset_split(planted_sf).take_all(),
               key=lambda r: r["doc_id"])
    b = sorted(textstats.dataset_split(planted_sf).take_all(),
               key=lambda r: r["doc_id"])
    assert a == b  # content-independent, rerun-stable
    for r in a:
        want = int(hashlib.md5(str(r["doc_id"]).encode())
                   .hexdigest()[:8], 16) % 1000
        assert r["bucket"] == want
        assert r["split"] == ("test" if want < 100
                              else "val" if want < 200 else "train")


def test_dataset_split_thresholds(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table({"doc_id": pa.array(list(range(200)), pa.int64()),
                     "text": pa.array(["x"] * 200, pa.string())})
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    # widening val to 1000 permille absorbs everything not in test
    out = textstats.dataset_split(str(tmp_path), test_permille=0,
                                  val_permille=1000).take_all()
    assert {r["split"] for r in out} == {"val"}


def test_chunk_documents_boundaries(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table({
        "doc_id": pa.array([7, 8, 9], pa.int64()),
        "text": pa.array([
            "a b c d e f g",   # 7 tokens, k=3 -> chunks 3/3/1
            "x  y",            # empty token dropped -> one 2-token chunk
            "",                # dropped entirely
        ], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    rows = sorted(((r["doc_id"], r["chunk_idx"], r["n_tokens"],
                    r["chunk_text"])
                   for r in textstats.chunk_documents(
                       str(tmp_path), chunk_tokens=3).take_all()))
    assert rows == [
        (7, 0, 3, "a b c"), (7, 1, 3, "d e f"), (7, 2, 1, "g"),
        (8, 0, 2, "x y"),
    ]


def test_pack_manifest_two_level_cumsum(ray_session, tmp_path):
    """bucket_size=2 forces the distributed two-level prefix sum across
    several buckets; results must equal the serial concat-then-split."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = ["a b c", "d e", "", "f g h i", "j", "k l m"]
    docs = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r for r in textstats.pack_manifest(
        str(tmp_path), seq_tokens=4, bucket_size=2).take_all()}
    # serial oracle
    off = 0
    for i, s in enumerate(texts):
        n = len([w for w in s.split(" ") if w])
        r = got[i]
        assert (r["n_tokens"], r["tok_offset"]) == (n, off)
        assert r["first_seq"] == off // 4
        assert r["last_seq"] == (off + max(n - 1, 0)) // 4
        off += n
    # doc 3 ("f g h i", offset 5) straddles sequences 1 and 2
    assert (got[3]["first_seq"], got[3]["last_seq"]) == (1, 2)


def test_contamination_check_planted(ray_session, tmp_path):
    """Planted split: find doc_ids that hash into test (<100) and train
    (>=200) buckets, plant a shared 3-gram, and check the counts."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1000

    test_id = next(i for i in range(10_000) if bucket(i) < 100)
    train_a = next(i for i in range(10_000)
                   if bucket(i) >= 200 and i != test_id)
    train_b = next(i for i in range(10_000)
                   if bucket(i) >= 200 and i not in (test_id, train_a))
    docs = pa.table({
        "doc_id": pa.array([test_id, train_a, train_b], pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta",        # test: grams abg, bgd
            "alpha beta gamma zzz",          # train: abg contaminated
            "one two three four five",       # train: clean
        ], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    from crawler_ray.ops.textstats import contamination_check
    for kw in ({}, {"broadcast_threshold": 0}):  # both planner paths
        out = {r["doc_id"]: r
               for r in contamination_check(str(tmp_path), **kw).take_all()}
        assert set(out) == {train_a, train_b}
        assert (out[train_a]["n_grams"],
                out[train_a]["n_contaminated"]) == (2, 1)
        assert (out[train_b]["n_grams"],
                out[train_b]["n_contaminated"]) == (3, 0)


def test_cross_op_token_invariants(ray_session, tmp_path):
    """The curation ops share one token definition (non-empty runs of a
    single-space split); their outputs must agree on every document."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(1234)
    vocab = ["aa", "b", "ccc", "dd", "e"]
    texts = []
    for _ in range(40):
        k = rng.randint(0, 12)
        # random runs of spaces exercise the empty-token dropping
        texts.append(" ".join(
            rng.choice(vocab) + (" " if rng.random() < 0.3 else "")
            for _ in range(k)).strip())
    docs = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    rep = {r["doc_id"]: r["n_words"]
           for r in textstats.repetition_stats(sf).take_all()}
    pack = {r["doc_id"]: r["n_tokens"]
            for r in textstats.pack_manifest(sf).take_all()}
    chunks: dict[int, int] = {}
    joined: dict[int, list] = {}
    for r in textstats.chunk_documents(sf, chunk_tokens=3).take_all():
        chunks[r["doc_id"]] = chunks.get(r["doc_id"], 0) + r["n_tokens"]
        joined.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"]))

    for i, s in enumerate(texts):
        toks = [w for w in s.split(" ") if w]
        assert pack[i] == len(toks)  # pack_manifest counts every doc
        if toks:
            assert rep[i] == len(toks)
            assert chunks[i] == len(toks)
            # chunk texts reassemble the exact token stream
            whole = " ".join(t for _, t in sorted(joined[i]))
            assert whole == " ".join(toks)
        else:
            assert i not in rep and i not in chunks


def test_bpe_token_counts_known_values(ray_session, tmp_path):
    """BPE-ish pre-tokenizer counts on hand-checkable strings, plus the
    whitespace count in the same row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.ops.textstats import bpe_token_counts

    texts = ["Hello world, it's 2026!",   # Hello/ world/,/ it/'s/ 2026/!
             "",
             "a'b''s"]                    # a/'/b/'/'s
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r
           for r in bpe_token_counts(str(tmp_path)).take_all()}
    assert out[0]["n_bpe_tokens"] == 7
    assert out[0]["n_ws_tokens"] == 4
    assert (out[1]["n_bpe_tokens"], out[1]["n_ws_tokens"]) == (0, 0)
    assert out[2]["n_bpe_tokens"] == 5
