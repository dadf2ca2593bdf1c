"""Failed-URL state semantics (M26) vs the reference's CrawlState
failure bookkeeping (core/crawler.py:224-333)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from crawler_ray.state.failures import (FailedUrlState, failed_urls_table)


class TestFailedUrlState:
    def test_retry_semantics(self):
        st = FailedUrlState()
        url = "http://site0.example/missing"
        # unknown URL -> always retryable (core/crawler.py:330-331)
        assert st.should_retry(url)
        assert not st.was_failed(url)
        for i in range(1, 3):
            st.add_failed(url, error=f"err{i}")
            assert st.was_failed(url)
            assert st.failed_urls[
                "http://site0.example/missing"]["attempts"] == i
            assert st.should_retry(url)  # attempts < 3
        st.add_failed(url, error="err3", status_code=503)
        rec = st.failed_urls["http://site0.example/missing"]
        assert rec["attempts"] == 3
        assert rec["last_error"] == "err3"
        assert rec["last_status_code"] == 503
        assert not st.should_retry(url)          # 3 >= max_retries
        assert st.should_retry(url, max_retries=5)
        assert st.stats["failed_urls"] == 3

    def test_url_normalized_before_lookup(self):
        # the reference normalizes on both write and read: fragment and
        # query are stripped by normalize_url, so variants hit one record
        st = FailedUrlState()
        st.add_failed("http://site0.example/a#frag")
        assert st.was_failed("http://site0.example/a?page=2")
        st.add_failed("http://site0.example/a")
        assert st.failed_urls["http://site0.example/a"]["attempts"] == 2

    def test_from_table_counts_attempts(self):
        t = pa.table({
            "url_norm": ["http://h/a", "http://h/b", "http://h/a",
                         "http://h/a"],
            "error": ["e1", "x", "e2", "e3"],
        })
        st = FailedUrlState.from_table(t)
        assert st.failed_urls["http://h/a"]["attempts"] == 3
        assert st.failed_urls["http://h/a"]["last_error"] == "e3"
        assert st.failed_urls["http://h/b"]["attempts"] == 1
        assert not st.should_retry("http://h/a")
        assert st.should_retry("http://h/b")
        assert st.retry_eligible() == ["http://h/b"]

    def test_failed_urls_table_aggregate(self):
        t = pa.table({
            "url_norm": ["u1", "u2", "u3", "u1", "u4"],
            "fetch_ok": pa.array([False, True, None, False, False],
                                 pa.bool_()),
        })
        out = failed_urls_table(t)
        got = dict(zip(out["url_norm"].to_pylist(),
                       out["attempts"].to_pylist()))
        # null fetch_ok counts as a failure (fill_null False)
        assert got == {"u1": 2, "u3": 1, "u4": 1}

    def test_failed_urls_table_empty(self):
        t = pa.table({"url_norm": pa.array([], pa.string()),
                      "fetch_ok": pa.array([], pa.bool_())})
        out = failed_urls_table(t)
        assert out.num_rows == 0
        assert out.column_names == ["url_norm", "attempts"]


@pytest.mark.usefixtures("ray_session")
class TestEngineFailedState:
    def test_strict_and_wave_agree(self, small_corpus, tmp_path):
        from crawler_ray.pipelines.crawl import CrawlConfig, CrawlEngine

        cfg = CrawlConfig()  # uncapped: the 404 posts sit deep in the site
        eng_s = CrawlEngine(small_corpus["dir"], str(tmp_path / "ws"),
                            config=cfg)
        s_sum = eng_s.run(mode="strict")
        st_s = eng_s.failed_state(s_sum)

        eng_w = CrawlEngine(small_corpus["dir"], str(tmp_path / "ww"),
                            config=cfg)
        w_sum = eng_w.run(mode="wave")
        st_w = eng_w.failed_state(w_sum)

        s_urls = set(st_s.failed_urls)
        w_urls = set(st_w.failed_urls)
        # corpus v5 plants deterministic 404s (every 17th post cites a
        # /missing/ URL), so the wave run must observe fetch misses
        assert w_urls, "corpus should contain broken links"
        assert all("/missing/" in u for u in w_urls)
        # strict visits a prefix of the wave frontier (max_pages cap), so
        # its failure set is contained in the wave's
        assert s_urls <= w_urls
        # a URL fails at most once per run -> every failure is retryable
        for st in (st_s, st_w):
            for u, rec in st.failed_urls.items():
                assert rec["attempts"] == 1
                assert st.should_retry(u)
        assert s_sum["stats"]["fetch_misses"] == len(s_urls)
