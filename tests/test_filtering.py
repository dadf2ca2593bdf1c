"""Unit tests for the corpus selection layer (``ops/filtering.py``):
line-level dedup, the Gopher-style quality gate, per-source quotas,
stratified sampling and exact length percentiles.

The synthetic sf tables exercise the zero/default branches through the
driver oracle; these tests plant the interesting shapes — boilerplate
lines, all-dropped documents, each quality rule, skewed sources."""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_ray.ops import filtering  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def _write_docs(tmp_path, texts, langs=None, sources=None):
    n = len(texts)
    docs = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs or ["en"] * n, pa.string()),
        "source": pa.array(sources or ["s0"] * n, pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


# -- line_dedup --------------------------------------------------------------

BOILER = "accept all cookies"


@pytest.fixture()
def lined_sf(tmp_path):
    return _write_docs(tmp_path, [
        f"{BOILER}\nreal content one\n\nfooter",   # boiler + empty kept
        f"{BOILER}\nreal content two\nfooter",     # footer dup'd too
        BOILER,                                    # ALL lines drop
        "unique line only",                        # untouched
        "",                                        # empty doc: one empty line
    ])


def test_line_dedup_planted(ray_session, lined_sf):
    out = {r["doc_id"]: r
           for r in filtering.line_dedup(lined_sf).take_all()}
    assert len(out) == 5
    # boilerplate and the duplicated footer drop; empty line survives
    assert out[0]["text_clean"] == "real content one\n"
    assert (out[0]["n_lines"], out[0]["n_dropped"]) == (4, 2)
    assert out[1]["text_clean"] == "real content two"
    assert (out[1]["n_lines"], out[1]["n_dropped"]) == (3, 2)
    # a doc losing every line still emits a row
    assert out[2]["text_clean"] == ""
    assert (out[2]["n_lines"], out[2]["n_dropped"]) == (1, 1)
    assert out[3]["text_clean"] == "unique line only"
    assert out[3]["n_dropped"] == 0
    # empty doc: its single empty line is structure, always kept
    assert (out[4]["n_lines"], out[4]["n_dropped"]) == (1, 0)
    assert out[4]["text_clean"] == ""


def test_line_dedup_join_path_equivalent(ray_session, lined_sf):
    """broadcast_threshold=0 forces the explode + left_anti join path;
    both paths must be bit-identical (including the all-dropped doc,
    which only survives the join path via the li=-1 sentinel row)."""
    bc = sorted(filtering.line_dedup(lined_sf).take_all(),
                key=lambda r: r["doc_id"])
    jn = sorted(filtering.line_dedup(lined_sf,
                                     broadcast_threshold=0).take_all(),
                key=lambda r: r["doc_id"])
    assert bc == jn


def test_line_dedup_min_count(ray_session, lined_sf):
    """min_count=3 only drops the thrice-repeated boilerplate, not the
    twice-repeated footer."""
    out = {r["doc_id"]: r
           for r in filtering.line_dedup(lined_sf,
                                         min_count=3).take_all()}
    assert out[0]["text_clean"] == "real content one\n\nfooter"
    assert out[0]["n_dropped"] == 1
    assert out[2]["text_clean"] == ""


# -- _exchange_common_keys ---------------------------------------------------

def test_exchange_common_keys_matches_naive(ray_session):
    """The hash-range exchange equals a naive global tally, including
    keys at the int64 extremes (range-cut edges) and across many
    partial blocks."""
    import numpy as np
    import ray
    import ray.data as rd

    rng = np.random.default_rng(7)
    # skewed keys spanning the full int64 range, split over 10 blocks
    keys = np.concatenate([
        rng.integers(-2**63, 2**63, 3000, dtype=np.int64),
        rng.choice(np.array([-2**63, 2**63 - 1, 0, -1, 42],
                            dtype=np.int64), 500),
    ])
    tables = []
    for chunk in np.array_split(keys, 10):
        u, c = np.unique(chunk, return_counts=True)
        tables.append(pa.table({"k": pa.array(u, pa.int64()),
                                "n": pa.array(c, pa.int64())}))
    part = rd.from_arrow(tables).materialize()
    total, refs = filtering._exchange_common_keys(part, "k", "n", 2)
    got = np.concatenate([t["k"].to_numpy() for t in ray.get(refs)])
    u, c = np.unique(keys, return_counts=True)
    want = u[c >= 2]
    assert total == len(want)
    assert np.array_equal(np.sort(got), want)
    assert np.array_equal(got, np.sort(got))  # range order == sorted

    # min_count=1 is the distinct reduction
    total1, refs1 = filtering._exchange_common_keys(part, "k", "n", 1)
    assert total1 == len(u)

    # empty input keeps a typed schema for downstream joins
    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                    "n": pa.array([], pa.int64())})
                          ).materialize()
    t0, r0 = filtering._exchange_common_keys(empty, "k", "n", 2)
    assert t0 == 0
    assert ray.get(r0[0]).schema.field("k").type == pa.int64()


# -- quality_filter ----------------------------------------------------------

def test_quality_filter_rules(ray_session, tmp_path):
    words50 = " ".join(f"w{i:02d}khj" for i in range(50))
    sf = _write_docs(tmp_path, [
        words50,                              # 0: keep
        "too short",                          # 1: too_short
        " ".join(["aa"] * 60),                # 2: short_words beats top/dup
        " ".join(["averyverylongword" + str(i) for i in range(60)]),
        # 4: top word 20/59 > 200 milli, lengths in range
        " ".join(["topw"] * 20 + [f"w{i:02d}khj" for i in range(39)]),
        "",                                   # 5: zero tokens -> too_short
    ])
    out = {r["doc_id"]: r
           for r in filtering.quality_filter(sf).take_all()}
    assert out[0]["reason"] == "keep"
    assert out[1]["reason"] == "too_short"
    assert out[2]["reason"] == "short_words"   # mean len 2000 < 3000
    assert out[3]["reason"] == "long_words"
    assert out[4]["reason"] == "top_word"
    assert out[5] == {"doc_id": 5, "n_words": 0, "mean_wlen_milli": 0,
                      "top_share_milli": 0, "dup_frac_milli": 0,
                      "reason": "too_short"}


def test_quality_filter_repetitive(ray_session, tmp_path):
    # 60 words, 30 distinct -> dup_frac 500 > 300; top share 2/60=33
    sf = _write_docs(tmp_path, [
        " ".join(f"w{i:02d}khj" for i in list(range(30)) * 2)])
    out = filtering.quality_filter(sf).take_all()
    assert out[0]["reason"] == "repetitive"
    assert out[0]["dup_frac_milli"] == 500


# -- source_quota ------------------------------------------------------------

def test_source_quota_skew(ray_session, tmp_path):
    # source A: 120 docs, B: 3 docs; quota 50 keeps the 50 smallest ids
    sources = ["A"] * 120 + ["B"] * 3
    sf = _write_docs(tmp_path, ["x"] * 123, sources=sources)
    rows = filtering.source_quota(sf, quota=50).take_all()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append((r["rk"], r["doc_id"]))
    assert len(by_src["A"]) == 50
    assert sorted(by_src["A"]) == [(i + 1, i) for i in range(50)]
    assert sorted(by_src["B"]) == [(1, 120), (2, 121), (3, 122)]


# -- stratified_sample -------------------------------------------------------

def test_stratified_sample_overrides(ray_session, tmp_path):
    langs = (["en"] * 100) + (["fa"] * 100)
    sf = _write_docs(tmp_path, ["x"] * 200, langs=langs)
    rows = filtering.stratified_sample(
        sf, default_permille=0, overrides={"fa": 1000}).take_all()
    # en sampled at 0 permille -> none; fa at 1000 -> all
    assert {r["lang"] for r in rows} == {"fa"}
    assert len(rows) == 100
    # determinism + composability: kept set == dataset_split buckets
    from crawler_ray.ops.textstats import dataset_split
    buckets = {r["doc_id"]: r["bucket"]
               for r in dataset_split(sf).take_all()}
    for r in rows:
        assert buckets[r["doc_id"]] == r["bucket"]


# -- incremental_dedup -------------------------------------------------------

def test_incremental_dedup_planted(ray_session, tmp_path):
    """Incoming docs whose exact text already exists in the corpus are
    dropped; fresh ones survive.  Bucket rule: md5(doc_id) mod 1000 —
    doc_ids are chosen so the fixture has both sides populated."""
    import hashlib

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1000

    ids = list(range(40))
    existing_ids = [i for i in ids if bucket(i) >= 200]
    incoming_ids = [i for i in ids if bucket(i) < 200]
    assert existing_ids and incoming_ids
    dup_id, fresh_id = incoming_ids[0], incoming_ids[-1]
    texts = {i: f"existing text {i}" for i in existing_ids}
    texts[dup_id] = texts[existing_ids[0]]        # exact dup of corpus
    for i in incoming_ids[1:]:
        texts[i] = f"fresh text {i}"
    docs = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([texts[i] for i in ids], pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    out = {r["doc_id"] for r in filtering.incremental_dedup(sf).take_all()}
    assert dup_id not in out
    assert out == set(incoming_ids) - {dup_id}
    assert fresh_id in out

    # forced join path is bit-identical
    jn = {r["doc_id"] for r in filtering.incremental_dedup(
        sf, broadcast_threshold=0).take_all()}
    assert jn == out


# -- shuffle_corpus ----------------------------------------------------------

def test_shuffle_corpus_deterministic(ray_session, tmp_path):
    """Exact 0..n-1 ranks; same seed -> same order on rerun; different
    seed -> different order; matches a local md5-order replay."""
    import hashlib

    sf = _write_docs(tmp_path, ["x"] * 97)
    out = {r["doc_id"]: r["shuffle_rank"]
           for r in filtering.shuffle_corpus(sf, seed=0).take_all()}
    assert sorted(out.values()) == list(range(97))
    want = {i: r for r, i in enumerate(sorted(
        range(97),
        key=lambda i: (hashlib.md5(f"0:{i}".encode()).hexdigest()[:16],
                       i)))}
    assert out == want
    again = {r["doc_id"]: r["shuffle_rank"]
             for r in filtering.shuffle_corpus(sf, seed=0).take_all()}
    assert again == out
    other = {r["doc_id"]: r["shuffle_rank"]
             for r in filtering.shuffle_corpus(sf, seed=1).take_all()}
    assert other != out
    assert sorted(other.values()) == list(range(97))


# -- normalize_text ----------------------------------------------------------

def test_normalize_text_planted(ray_session, tmp_path):
    sf = _write_docs(tmp_path, [
        "étude  has\t\ttabs\nand newlines ",  # NFC + collapse + trim
        "already clean",
        " nbsp stays ",                   # NBSP is not RE2 \s
    ])
    out = {r["doc_id"]: r
           for r in filtering.normalize_text(sf).take_all()}
    assert out[0]["text_norm"] == "étude has tabs and newlines"
    assert out[0]["changed"] is True
    assert out[1]["text_norm"] == "already clean"
    assert out[1]["changed"] is False
    assert out[2]["text_norm"] == " nbsp stays "
    assert out[2]["changed"] is False


# -- length_percentiles ------------------------------------------------------

def test_length_percentiles_exact(ray_session, tmp_path):
    # 100 docs with 1..100 tokens: pct p -> ceil(p) rank -> length p
    sf = _write_docs(tmp_path,
                     [" ".join(["w"] * n) for n in range(1, 101)])
    t = filtering.length_percentiles(sf)
    got = {p: v for p, v in zip(t["pct"].to_pylist(),
                                t["n_tokens"].to_pylist())}
    assert got == {10: 10, 25: 25, 50: 50, 75: 75, 90: 90, 99: 99}


def test_length_percentiles_sf(ray_session):
    t = filtering.length_percentiles(SF_DIR)
    vals = t["n_tokens"].to_pylist()
    assert vals == sorted(vals) and len(vals) == 6


# -- curate_pipeline (the fused chain) ---------------------------------------

@pytest.fixture()
def curate_sf(tmp_path):
    """Docs exercising every chain stage: boilerplate lines that only
    line_dedup removes, whitespace variants that only normalization
    collides, quality failures, and exact duplicates with a clear
    min-doc_id winner."""
    good = " ".join(f"word{i:03d}" for i in range(60))   # passes the gate
    other = " ".join(f"item{i:03d}" for i in range(60))
    return _write_docs(tmp_path, [
        f"{BOILER}\n{good}",                 # 0: survives, dup winner
        f"{BOILER}\n{good}  ",               #  1: normalizes == doc 0
        f"{other}\nextra tail line",         # 2: survives, unique
        BOILER,                              # 3: all lines drop -> too_short
        "tiny doc",                          # 4: too_short
        " ".join(["dup"] * 80),              # 5: gated (top_word share)
    ])


def test_curate_pipeline_planted(ray_session, curate_sf):
    rows = {r["doc_id"]: r
            for r in filtering.curate_pipeline(curate_sf).take_all()}
    # winners only: doc 0 beats its normalized twin 1; docs 3-5 gated out
    assert set(rows) == {0, 2}
    assert rows[0]["n_copies"] == 2
    assert rows[2]["n_copies"] == 1
    # line dedup ran before normalization: the boilerplate dropped
    assert (rows[0]["n_lines"], rows[0]["n_dropped"]) == (2, 1)
    assert rows[0]["n_words"] == 60
    assert rows[2]["n_words"] == 63
    # hash is md5 of the NORMALIZED deduped text
    import hashlib
    good = " ".join(f"word{i:03d}" for i in range(60))
    assert rows[0]["text_hash"] == hashlib.md5(good.encode()).hexdigest()
    assert rows[2]["n_dropped"] == 0
    # split stamp matches the dataset_split bucket rule
    b0 = int(hashlib.md5(b"0").hexdigest()[:8], 16) % 1000
    exp = "test" if b0 < 100 else ("val" if b0 < 200 else "train")
    assert rows[0]["split"] == exp


def test_curate_pipeline_join_path_equivalent(ray_session, curate_sf):
    """broadcast_threshold=0 forces BOTH nested planner decisions down
    their join paths (line_dedup's left_anti and the winner inner
    join); output must be identical to the broadcast plan."""
    key = lambda r: r["doc_id"]
    bc = sorted(filtering.curate_pipeline(curate_sf).take_all(), key=key)
    jn = sorted(filtering.curate_pipeline(
        curate_sf, broadcast_threshold=0).take_all(), key=key)
    assert bc == jn


def test_curate_pipeline_empty_survivors(ray_session, tmp_path):
    """A corpus where nothing survives still yields a typed empty
    result on both planner paths."""
    sf = _write_docs(tmp_path, ["tiny", "also tiny"])
    out = filtering.curate_pipeline(sf)
    assert out.count() == 0
    out_j = filtering.curate_pipeline(sf, broadcast_threshold=0)
    assert out_j.count() == 0


# -- span_dedup (exact-substring scoring) ------------------------------------

@pytest.fixture()
def span_sf(tmp_path):
    """Planted duplicated spans: docs 0 and 1 share a 6-token run in
    different surrounding text; doc 2 repeats a span within itself;
    doc 3 is all-unique; doc 4 is shorter than the window."""
    shared = "alpha beta gamma delta epsilon zeta"
    return _write_docs(tmp_path, [
        f"one two {shared} three four",
        f"nine ten {shared} eleven",
        "rep one two three rep one two three rep one two three",
        "u0 u1 u2 u3 u4 u5 u6 u7 u8 u9",
        "too short",
    ])


def test_span_dedup_planted(ray_session, span_sf):
    out = {r["doc_id"]: r
           for r in filtering.span_dedup(span_sf,
                                         span_tokens=6).take_all()}
    assert len(out) == 5
    # doc 0: 10 tokens -> 5 windows; exactly the shared window dups
    assert out[0]["n_spans"] == 5
    assert out[0]["n_dup_spans"] == 1
    # doc 1: 9 tokens -> 4 windows; one is the shared span
    assert out[1]["n_spans"] == 4
    assert out[1]["n_dup_spans"] == 1
    # doc 2: "rep one two three" x3 = 12 tokens -> 7 windows; the
    # 4-token period makes windows at offsets 0..3 repeat at 4..7:
    # windows 0-2 equal windows 4-6 pairwise; window 3 ('three rep one
    # two' starting at offset 3) occurs twice too -> ALL 7 dup? verify
    # by replay below instead of hand-counting
    assert out[2]["n_spans"] == 7
    assert out[2]["n_dup_spans"] >= 6
    assert out[3]["n_dup_spans"] == 0
    # doc 4: 2 tokens < window -> zero spans, still a row
    assert (out[4]["n_spans"], out[4]["n_dup_spans"]) == (0, 0)


def test_span_dedup_matches_duckdb_replay(ray_session, span_sf):
    """Bit-exact vs the string-grouping DuckDB replay (the oracle
    construction) at window 6 on the planted corpus."""
    import duckdb
    got = (filtering.span_dedup(span_sf, span_tokens=6).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = duckdb.sql(f"""
        WITH lists AS (
            SELECT doc_id, list_filter(string_split(text,' '),
                                       w -> w <> '') AS l
            FROM read_parquet('{span_sf}/documents.parquet')
        ), spans AS (
            SELECT doc_id, unnest(list_transform(range(6, len(l)+1),
                          i -> array_to_string(l[i-5:i], ' '))) AS s
            FROM lists
        ), c AS (SELECT s, COUNT(*) cnt FROM spans GROUP BY s),
        per AS (SELECT doc_id, COUNT(*) n_spans,
                       SUM((c.cnt >= 2)::BIGINT) n_dup
                FROM spans JOIN c USING (s) GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(per.n_spans,0) AS BIGINT) n_spans,
               CAST(COALESCE(per.n_dup,0) AS BIGINT) n_dup_spans
        FROM read_parquet('{span_sf}/documents.parquet') d
        LEFT JOIN per USING (doc_id) ORDER BY d.doc_id
    """).df()
    assert got["n_spans"].tolist() == exp["n_spans"].tolist()
    assert got["n_dup_spans"].tolist() == exp["n_dup_spans"].tolist()


def test_span_dedup_join_path_equivalent(ray_session, span_sf):
    key = lambda r: r["doc_id"]
    bc = sorted(filtering.span_dedup(span_sf,
                                     span_tokens=6).take_all(), key=key)
    jn = sorted(filtering.span_dedup(span_sf, span_tokens=6,
                                     broadcast_threshold=0).take_all(),
                key=key)
    assert bc == jn


def test_span_dedup_empty_and_short_corpus(ray_session, tmp_path):
    """Zero-row and all-too-short corpora yield typed results on both
    planner paths (no windows anywhere -> all zero counts)."""
    sf = _write_docs(tmp_path, ["a b", "c"])
    out = {r["doc_id"]: r
           for r in filtering.span_dedup(sf, span_tokens=6).take_all()}
    assert {k: (v["n_spans"], v["n_dup_spans"])
            for k, v in out.items()} == {0: (0, 0), 1: (0, 0)}
    jn = {r["doc_id"]: r
          for r in filtering.span_dedup(
              sf, span_tokens=6, broadcast_threshold=0).take_all()}
    assert out == jn
