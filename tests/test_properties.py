"""Property tests (SURVEY §5.6): normalization idempotence, hash
stability, and wave-mode invariance under physical knobs (shard count,
batch size) plus the max_pages budget."""

from __future__ import annotations

import pyarrow.dataset as pads
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_ray.functions.text import (normalize_persian_text,
                                        similarity_hash)
from crawler_ray.functions.urls import normalize_url

# URL-ish material: hosts, paths with unicode, queries, fragments
_url_st = st.builds(
    lambda scheme, host, path, q, frag: (
        f"{scheme}://{host}/{path}"
        + (f"?{q}" if q else "") + (f"#{frag}" if frag else "")),
    st.sampled_from(["http", "https"]),
    st.from_regex(r"[a-z][a-z0-9.-]{0,20}\.[a-z]{2,5}", fullmatch=True),
    st.text(alphabet="abc012/-%._~", max_size=30),
    st.text(alphabet="abc=&1", max_size=10),
    st.text(alphabet="xyz", max_size=5),
)


@settings(max_examples=200, deadline=None)
@given(_url_st)
def test_normalize_url_idempotent(url):
    once = normalize_url(url)
    assert normalize_url(once) == once
    # reference semantics: query/fragment always stripped
    assert "?" not in once and "#" not in once


_link_st = st.one_of(
    _url_st,
    st.text(max_size=40),                       # garbage
    st.builds(lambda u: u.upper(), _url_st),    # uppercase scheme
    st.builds(lambda h, p: f"http://{h}/a;b/{p}?q=1#f",
              st.from_regex(r"[a-z]{1,8}\.[a-z]{2,3}", fullmatch=True),
              st.text(alphabet="abc/", max_size=10)),
    # urlparse strips embedded \t\r\n and surrounding whitespace —
    # these MUST disqualify the arrow identity fast path
    st.builds(lambda u, ws, i: u[:i] + ws + u[i:],
              _url_st, st.sampled_from(["\t", "\r", "\n", " "]),
              st.integers(min_value=0, max_value=12)),
)


@settings(max_examples=100, deadline=None)
@given(st.lists(_link_st, min_size=1, max_size=16))
def test_candidate_fn_parsing_matches_urlparse(links):
    """The vectorized admission stage's arrow fast path + RE2 host/path
    extraction must agree with the per-row urlparse ground truth for
    any link material (absolute, relative-ish garbage, params/query/
    fragment, uppercase schemes)."""
    from urllib.parse import urlparse

    import pyarrow as pa

    from crawler_ray.functions.patterns import default_url_classifier
    from crawler_ray.functions.priority import default_policy_manager
    from crawler_ray.pipelines.wave import _CandidateFn

    n = len(links)
    want_norm = [normalize_url(u) for u in links]
    t = pa.table({
        "link": pa.array(links, pa.string()),
        "link_index": pa.array(range(n), pa.int32()),
        "parent_url": pa.array(["http://p/"] * n, pa.string()),
        "parent_host": pa.array(["p"] * n, pa.string()),
        "parent_priority": pa.array([0] * n, pa.int32()),
        "cand_depth": pa.array([1] * n, pa.int32()),
        "fixed_job_type": pa.array([""] * n, pa.string()),
        # bypass: keep EVERY row so the parse of every input is checked
        "bypass_host": pa.array([True] * n, pa.bool_()),
    })
    fn = _CandidateFn(default_url_classifier(), default_policy_manager(),
                      max_depth=99, robots=None)
    out = fn(t)
    assert out["url_norm"].to_pylist() == want_norm
    for norm, host in zip(want_norm, out["host"].to_pylist()):
        if norm.startswith(("http://", "https://")):
            assert host == urlparse(norm).netloc, norm
        else:
            assert host == ""  # non-http schemes carry no host here


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=400))
def test_persian_normalize_reaches_fixpoint(text):
    # Not strictly idempotent in one pass (reference operation order:
    # whitespace collapse BEFORE NFKD, so decompositions like U+00A8 ->
    # space + combining diaeresis can leave fresh edge whitespace), but
    # a second application is always a fixpoint.
    twice = normalize_persian_text(normalize_persian_text(text))
    assert normalize_persian_text(twice) == twice


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=1, max_size=1500), st.text(max_size=200))
def test_similarity_hash_depends_only_on_first_1000_normalized(
        text, tail):
    base = normalize_persian_text(text)
    if len(base) < 1000:
        return  # tail would change the signature window
    assert similarity_hash(text) == similarity_hash(base[:1000] + tail)


@pytest.mark.usefixtures("ray_session")
class TestWaveInvariance:
    def test_trace_invariant_under_physical_knobs(self, small_corpus,
                                                  tmp_path_factory):
        """Different shard counts / batch sizes must not change the crawl
        (determinism is semantic, not physical) — checked against the
        serial oracle."""
        from crawler_ray.pipelines.crawl import CrawlConfig, CrawlEngine
        from crawler_ray.pipelines.oracle import oracle_crawl
        work = str(tmp_path_factory.mktemp("work_knobs"))
        eng = CrawlEngine(small_corpus["dir"], work,
                          CrawlConfig(seen_shards=5, fetch_batch_size=17,
                                      extract_batch_size=23))
        summary = eng.run(mode="wave")
        oracle = oracle_crawl(small_corpus["dir"], ordering="bfs")
        key = lambda r: (r["wave"], r["priority"], r["url_norm"])  # noqa: E731
        a = sorted(pads.dataset(summary["trace_path"]).to_table()
                   .to_pylist(), key=key)
        assert [(r["url_norm"], round(r["fetch_vts"], 6)) for r in a] \
            == [(r["url_norm"], round(r["fetch_vts"], 6))
                for r in oracle.trace]

    def test_max_pages_budget(self, small_corpus, tmp_path_factory):
        from crawler_ray.pipelines.crawl import CrawlConfig, CrawlEngine
        work = str(tmp_path_factory.mktemp("work_budget"))
        eng = CrawlEngine(small_corpus["dir"], work,
                          CrawlConfig(max_pages=40))
        summary = eng.run(mode="wave")
        v = summary["stats"]["visited"]
        # budget is checked between waves: it may overshoot by at most
        # one wave, never undershoot a reachable corpus
        assert 40 <= v
        trace = pads.dataset(summary["trace_path"]).to_table()
        assert trace.num_rows == v
