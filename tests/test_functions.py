"""Unit tests for scalar functions: URL normalization, Persian text
normalization, hashing, priority policies, keyword classification.
Expected values are hand-derived from the reference semantics (file:line
cited in the function docstrings)."""

import hashlib

import numpy as np
import pytest

from crawler_ray.functions.text import (
    normalize_persian_text, tokenize_persian_text, calculate_text_hash,
    similarity_hash, is_similar_content,
)
from crawler_ray.functions.urls import (
    normalize_url, host_hash64, host_hash64_batch, url_sha1,
)
from crawler_ray.functions.priority import (
    default_policy_manager, PriorityPolicyManager,
)
from crawler_ray.functions.classify import classify_text, domain_scores


class TestNormalizeUrl:
    # parity with utils/http.py:512-531
    def test_strips_query_fragment(self):
        assert (normalize_url("https://a.example/p/x?q=1#frag")
                == "https://a.example/p/x")

    def test_relative_join(self):
        assert (normalize_url("../up", "https://a.example/d/e/")
                == "https://a.example/d/up")
        assert (normalize_url("/abs", "https://a.example/d/")
                == "https://a.example/abs")

    def test_absolute_untouched_by_base(self):
        assert (normalize_url("http://b.example/z", "https://a.example/")
                == "http://b.example/z")

    def test_preserves_case_and_trailing_slash(self):
        assert (normalize_url("https://A.example/Path/")
                == "https://A.example/Path/")

    def test_idempotent(self):
        u = normalize_url("https://a.example/p?x=1")
        assert normalize_url(u) == u


class TestPersianText:
    def test_char_map(self):
        # Arabic kaf/yeh -> Persian, Arabic-Indic digits -> ASCII
        assert normalize_persian_text("ملك") == "ملک"
        assert normalize_persian_text("علي") == "علی"
        assert normalize_persian_text("١٢٣") == "123"

    def test_ws_collapse_and_combining(self):
        assert normalize_persian_text("á  b\t\nc") == "a b c"

    def test_zwnj_to_space(self):
        assert normalize_persian_text("می‌شود") == "می شود"

    def test_tokenize_drops_stop_words_and_punct(self):
        toks = tokenize_persian_text("این قانون، از دادگاه است!")
        assert toks == ["قانون", "دادگاه"]

    def test_text_hash_matches_manual(self):
        s = "hello  world"
        expect = hashlib.md5(b"hello world").hexdigest()
        assert calculate_text_hash(s) == expect
        assert calculate_text_hash("") is None

    def test_similarity_hash_first_1000(self):
        long = "x" * 2000
        assert similarity_hash(long) == hashlib.md5(b"x" * 1000).hexdigest()
        assert similarity_hash("a b") == similarity_hash("a  b")

    def test_similarity_hash_precomputed_normalization_identical(self):
        # the extract stage normalizes the FULL content once and passes it
        # via normalized=;  the signature must be byte-identical to the
        # prefix-normalize path for every boundary shape
        cases = [
            "short text",
            "x" * 2000,
            # whitespace run spanning the 4000-char prefix boundary
            ("w " * 1995) + "   \t\n   " + ("y " * 3000),
            # combining mark right at the boundary
            ("a" * 3999) + "́" + ("b" * 3000),
            # Arabic chars needing the char map, long enough to truncate
            ("ملك علي ١٢٣ " + "متن " * 2000),
            # long raw text that normalizes to < 1001 chars (fallback path)
            ("z" + " " * 50) * 200,
        ]
        for content in cases:
            full_norm = normalize_persian_text(content)
            assert (similarity_hash(content, normalized=full_norm)
                    == similarity_hash(content)), content[:50]

    def test_is_similar_content(self):
        assert is_similar_content("abc def", "abc  def")
        assert not is_similar_content("abc", "abc def ghi jkl mno")


class TestPriority:
    # weights/values from core/crawler.py:498-545; weighted mean + int()
    # truncation from core/crawler.py:470-496
    def test_generic_depth0(self):
        mgr = default_policy_manager()
        # depth 0*10*1.0 + path '/a' 1 slash *5*0.8 = 4 / 1.8 = 2.22 -> 2
        assert mgr.calculate_priority("https://h/a", 0, "page") == 2

    def test_list_depth1(self):
        mgr = default_policy_manager()
        # (1*10*1 + -20*1.5 + 3*5*0.8) / (1+1.5+0.8) = -8/3.3 -> -2.42 -> -2
        assert (mgr.calculate_priority("https://h/category/law/", 1, "list")
                == -2)

    def test_sitemap(self):
        mgr = default_policy_manager()
        # (0*10 -30*2 + 1*5*0.8)/(1+2+0.8) = -56/3.8 = -14.7 -> -14 (trunc)
        assert (mgr.calculate_priority("https://h/sitemap.xml", 0, "sitemap")
                == -14)

    def test_batch_matches_scalar(self):
        mgr = default_policy_manager()
        urls = ["https://h/a", "https://h/category/x/", "https://h/p/q/r",
                "https://h/sitemap.xml"]
        depths = np.array([0, 1, 3, 0])
        types = ["page", "list", "detail", "sitemap"]
        batch = mgr.calculate_priority_batch(urls, depths, types)
        scalar = [mgr.calculate_priority(u, int(d), t)
                  for u, d, t in zip(urls, depths, types)]
        assert batch.tolist() == scalar

    def test_custom_policy_plugin(self):
        mgr = default_policy_manager()
        mgr.add_policy("boost_faq",
                       condition_func=lambda url, job: "/faq" in url,
                       priority_func=lambda url, job: -100, weight=2.0)
        p_faq = mgr.calculate_priority("https://h/faq", 0, "page")
        p_other = mgr.calculate_priority("https://h/xyz", 0, "page")
        assert p_faq < p_other
        # scalar fallback also used by the batch path for custom policies
        batch = mgr.calculate_priority_batch(
            ["https://h/faq", "https://h/xyz"], np.array([0, 0]),
            ["page", "page"])
        assert batch.tolist() == [p_faq, p_other]


class TestClassify:
    def test_question_detection(self):
        r = classify_text("آیا این قرارداد معتبر است؟ سوال من این است")
        assert r["content_type"]["content_type"] == "question"

    def test_domain_scoring(self):
        r = classify_text("جرم و مجازات و قصاص در قانون مجازات")
        assert "criminal" in r["domains"]["domains"][:1]

    def test_empty_text_other(self):
        r = classify_text("")
        assert r["content_type"]["content_type"] == "other"
        assert r["domains"]["domains"] == []

    def test_english_text_other(self):
        r = classify_text("plain english words only here")
        assert r["content_type"]["content_type"] == "other"


class TestUrlHash:
    def test_host_hash_stable(self):
        h = host_hash64("site0.example")
        expect = int.from_bytes(
            hashlib.sha1(b"site0.example").digest()[:8], "big")
        assert h == expect
        assert host_hash64_batch(["site0.example"]).tolist() == [expect]

    def test_url_sha1(self):
        assert url_sha1("https://a/") == hashlib.sha1(b"https://a/").digest()
