"""Property-based tests for the selection layer (``ops/filtering.py``):
each operator is compared against an independent pure-Python reference
on hypothesis-generated corpora (small alphabet so collisions/dup
structure actually occur).  Examples are capped low — every example
runs a real Ray pipeline."""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_ray.ops import filtering  # noqa: E402

# lines drawn from a tiny pool so corpus-wide duplicates are common
_LINE_POOL = ["alpha beta", "gamma", "", "delta epsilon zeta", "eta",
              "alpha beta", "theta iota"]

_docs_strategy = st.lists(
    st.lists(st.sampled_from(_LINE_POOL), min_size=0, max_size=6)
    .map("\n".join),
    min_size=1, max_size=12)


def _write(tmp, texts):
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array([f"s{i % 3}" for i in range(len(texts))],
                           pa.string()),
    }), os.path.join(tmp, "documents.parquet"))
    return tmp


@settings(max_examples=8, deadline=None)
@given(texts=_docs_strategy, min_count=st.integers(2, 3))
def test_line_dedup_matches_python(ray_session, tmp_path_factory,
                                   texts, min_count):
    sf = _write(str(tmp_path_factory.mktemp("ld")), texts)
    got = {r["doc_id"]: r
           for r in filtering.line_dedup(sf,
                                         min_count=min_count).take_all()}
    # pure-Python reference
    from collections import Counter
    counts = Counter(ln for t in texts for ln in t.split("\n") if ln)
    for i, t in enumerate(texts):
        lines = t.split("\n")
        kept = [ln for ln in lines
                if ln == "" or counts[ln] < min_count]
        r = got[i]
        assert r["n_lines"] == len(lines)
        assert r["n_dropped"] == len(lines) - len(kept)
        assert r["text_clean"] == "\n".join(kept)
    assert len(got) == len(texts)


@settings(max_examples=8, deadline=None)
@given(texts=_docs_strategy)
def test_incremental_dedup_matches_python(ray_session, tmp_path_factory,
                                          texts):
    sf = _write(str(tmp_path_factory.mktemp("inc")), texts)
    got = {r["doc_id"] for r in filtering.incremental_dedup(sf).take_all()}

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1000

    existing = {hashlib.md5(t.encode()).hexdigest()
                for i, t in enumerate(texts) if bucket(i) >= 200}
    want = {i for i, t in enumerate(texts)
            if bucket(i) < 200
            and hashlib.md5(t.encode()).hexdigest() not in existing}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(texts=st.lists(
    st.lists(st.sampled_from(["aa", "bcd", "efghijklmn", "x"]),
             min_size=0, max_size=80).map(" ".join),
    min_size=1, max_size=10))
def test_quality_filter_matches_python(ray_session, tmp_path_factory,
                                       texts):
    sf = _write(str(tmp_path_factory.mktemp("qf")), texts)
    got = {r["doc_id"]: r
           for r in filtering.quality_filter(sf, min_words=5).take_all()}
    for i, t in enumerate(texts):
        words = [w for w in t.split(" ") if w]
        total = len(words)
        distinct = len(set(words))
        top = max((words.count(w) for w in set(words)), default=0)
        chars = sum(len(w) for w in words)
        safe = max(total, 1)
        mean_wlen = 1000 * chars // safe
        top_share = 1000 * top // safe
        dup_frac = 1000 * (total - distinct) // safe
        if total < 5:
            reason = "too_short"
        elif total > 100_000:
            reason = "too_long"
        elif mean_wlen < 3000:
            reason = "short_words"
        elif mean_wlen > 10000:
            reason = "long_words"
        elif top_share > 200:
            reason = "top_word"
        elif dup_frac > 300:
            reason = "repetitive"
        else:
            reason = "keep"
        r = got[i]
        assert (r["n_words"], r["mean_wlen_milli"], r["top_share_milli"],
                r["dup_frac_milli"], r["reason"]) == (
            total, mean_wlen, top_share, dup_frac, reason), (i, t)
