"""Unit tests for the state layer: bloom filter, URL-seen shard core,
politeness core, robots/sitemap parsing."""

import hashlib

from crawler_ray.sources.robots import (HostRules, RobotsTable,
                                        parse_robots_txt, parse_sitemap)
from crawler_ray.state.politeness import PolitenessCore
from crawler_ray.state.url_seen import BloomFilter, URLSeenShardCore


def _digest(s: str) -> bytes:
    return hashlib.sha1(s.encode()).digest()


class TestSeenShard:
    def test_exact_first_wins(self):
        shard = URLSeenShardCore(mode="exact")
        d = [_digest("a"), _digest("b"), _digest("a")]
        assert shard.check_and_add(d) == [True, True, False]
        assert shard.check_and_add([_digest("b")]) == [False]
        assert shard.count() == 2

    def test_bloom_no_false_negatives(self):
        shard = URLSeenShardCore(mode="bloom", expected_keys=10_000)
        keys = [_digest(f"url{i}") for i in range(5_000)]
        first = shard.check_and_add(keys)
        assert all(first[i] or True for i in range(len(first)))
        # every inserted key must read as present afterwards
        assert all(shard.contains(keys))

    def test_bloom_fpp_bounded(self):
        shard = URLSeenShardCore(mode="bloom", expected_keys=20_000,
                                 bits_per_key=12)
        shard.check_and_add([_digest(f"in{i}") for i in range(20_000)])
        probes = [_digest(f"out{i}") for i in range(20_000)]
        fp = sum(shard.contains(probes))
        assert fp / 20_000 < 0.01  # ~0.03% expected at 12 bits/key

    def test_snapshot_restore(self, tmp_path):
        shard = URLSeenShardCore(mode="exact")
        shard.check_and_add([_digest("x"), _digest("y")])
        path = str(tmp_path / "snap.pkl")
        shard.snapshot(path)
        fresh = URLSeenShardCore(mode="exact")
        assert fresh.restore(path) == 2
        assert fresh.check_and_add([_digest("x")]) == [False]


class TestPoliteness:
    def test_vts_spacing_per_host(self):
        core = PolitenessCore(default_delay=2.0)
        allowed, vts = core.admit(["https://a/x", "https://a/y",
                                   "https://b/z", "https://a/w"])
        assert allowed == [True] * 4
        assert vts == [0.0, 2.0, 0.0, 4.0]

    def test_robots_delay_raises_only(self):
        rt = RobotsTable({"h": HostRules("h", crawl_delay=0.5)},
                         default_delay=1.0)
        assert rt.delay("h") == 1.0  # crawl-delay can only raise
        rt2 = RobotsTable({"h": HostRules("h", crawl_delay=3.0)},
                          default_delay=1.0)
        assert rt2.delay("h") == 3.0

    def test_robots_deny(self):
        rt = RobotsTable({"h": HostRules("h", disallow=["/private/"])})
        core = PolitenessCore(rt, respect_robots=True)
        allowed, vts = core.admit(["https://h/private/1", "https://h/ok"])
        assert allowed == [False, True]
        assert vts[0] == -1.0 and vts[1] == 0.0

    def test_bulk_advance(self):
        core = PolitenessCore(default_delay=1.0)
        base, d = core.bulk_advance("h", 3)   # stamps 0,1,2
        assert (base, d) == (0.0, 1.0)
        base2, _ = core.bulk_advance("h", 2)  # stamps 3,4
        assert base2 == 3.0


class TestRobotsParsing:
    def test_parse_robots_txt(self):
        body = """# comment
User-agent: *
Disallow: /private/
Allow: /private/pub/
Crawl-delay: 2.5
Sitemap: https://h/sitemap.xml
User-agent: evilbot
Disallow: /
"""
        r = parse_robots_txt("h", body)
        assert r.disallow == ["/private/"]
        assert r.allow == ["/private/pub/"]
        assert r.crawl_delay == 2.5
        assert r.sitemaps == ["https://h/sitemap.xml"]
        assert not r.can_fetch("/private/x")
        assert r.can_fetch("/private/pub/y")  # longest prefix wins
        assert r.can_fetch("/open")

    def test_parse_sitemap_xml_and_index(self):
        xml = ('<?xml version="1.0"?><urlset xmlns='
               '"http://www.sitemaps.org/schemas/sitemap/0.9">'
               "<url><loc>https://h/a</loc></url></urlset>")
        assert parse_sitemap(xml) == ("xml", ["https://h/a"])
        idx = ('<?xml version="1.0"?><sitemapindex xmlns='
               '"http://www.sitemaps.org/schemas/sitemap/0.9">'
               "<sitemap><loc>https://h/s1.xml</loc></sitemap>"
               "</sitemapindex>")
        assert parse_sitemap(idx) == ("index", ["https://h/s1.xml"])

    def test_parse_sitemap_text_fallback(self):
        body = "# comment\nhttps://h/a\n\nhttps://h/b\n"
        assert parse_sitemap(body) == ("text", ["https://h/a", "https://h/b"])


def test_bloom_filter_roundtrip_state():
    bf = BloomFilter(1000)
    assert bf.check_and_add(_digest("k"))
    assert not bf.check_and_add(_digest("k"))
    bf2 = BloomFilter.from_state(bf.state())
    assert not bf2.check_and_add(_digest("k"))


class TestCuckooFilter:
    def test_insert_contains_no_false_negatives(self):
        from crawler_ray.state.url_seen import CuckooFilter
        import hashlib
        cf = CuckooFilter(expected_keys=5000)
        digests = [hashlib.sha1(f"u{i}".encode()).digest()
                   for i in range(4000)]
        for d in digests:
            assert cf.check_and_add(d) is True
        for d in digests:           # no false negatives, ever
            assert cf.contains(d)
            assert cf.check_and_add(d) is False

    def test_false_positive_rate_bounded(self):
        from crawler_ray.state.url_seen import CuckooFilter
        import hashlib
        cf = CuckooFilter(expected_keys=5000)
        for i in range(4000):
            cf.check_and_add(hashlib.sha1(f"u{i}".encode()).digest())
        fp = sum(cf.contains(hashlib.sha1(f"other{i}".encode()).digest())
                 for i in range(20000))
        assert fp / 20000 < 0.01    # 16-bit fingerprints: ~0.03% expected

    def test_state_round_trip(self):
        from crawler_ray.state.url_seen import CuckooFilter
        import hashlib
        cf = CuckooFilter(expected_keys=256)
        ds = [hashlib.sha1(bytes([i])).digest() for i in range(200)]
        for d in ds:
            cf.check_and_add(d)
        cf2 = CuckooFilter.from_state(cf.state())
        assert all(cf2.contains(d) for d in ds)
        assert cf2.check_and_add(ds[0]) is False

    def test_overflow_keeps_correctness(self):
        from crawler_ray.state.url_seen import CuckooFilter
        import hashlib
        cf = CuckooFilter(expected_keys=16)   # tiny table, force overflow
        ds = [hashlib.sha1(f"x{i}".encode()).digest() for i in range(600)]
        for d in ds:
            cf.check_and_add(d)
        assert all(cf.contains(d) for d in ds)
