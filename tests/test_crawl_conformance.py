"""Crawl-trace + extraction + dedup conformance: the Ray engine must
reproduce the serial oracle exactly (SURVEY.md §5 strategy).

- strict mode  vs priority-queue oracle: identical visit ORDER (url,
  depth, job_type, priority, parent, fetch_vts per slot)
- wave mode    vs BFS oracle: identical (wave, priority, url) sequence
- both: byte-identical extracted content vs the corpus golden `text`
  column, identical content_items after similarity-hash dedup-upsert
- resume: killing between waves and resuming yields identical output
"""

import os
import shutil

import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from crawler_ray.pipelines.crawl import CrawlConfig, CrawlEngine
from crawler_ray.pipelines.oracle import oracle_crawl

pytestmark = pytest.mark.usefixtures("ray_session")


def _trace_key(row):
    return (row["url_norm"], row["depth"], row["job_type"],
            row["priority"], row["parent_url"], round(row["fetch_vts"], 6))


@pytest.fixture(scope="module")
def strict_run(small_corpus, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("work_strict"))
    eng = CrawlEngine(small_corpus["dir"], work,
                      CrawlConfig(round_batch=128))
    summary = eng.run(mode="strict")
    oracle = oracle_crawl(small_corpus["dir"], ordering="priority")
    return summary, oracle, small_corpus["dir"]


@pytest.fixture(scope="module")
def wave_run(small_corpus, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("work_wave"))
    eng = CrawlEngine(small_corpus["dir"], work, CrawlConfig())
    summary = eng.run(mode="wave")
    oracle = oracle_crawl(small_corpus["dir"], ordering="bfs")
    return summary, oracle, small_corpus["dir"]


class TestStrictConformance:
    def test_trace_exact_order(self, strict_run):
        summary, oracle, _ = strict_run
        trace = pq.read_table(summary["trace_path"]).to_pylist()
        assert len(trace) == len(oracle.trace) > 50
        for eng_row, ora_row in zip(trace, oracle.trace):
            assert _trace_key(eng_row) == _trace_key(ora_row)

    def test_seen_membership(self, strict_run):
        summary, oracle, _ = strict_run
        assert summary["stats"]["seen"] == len(oracle.seen)
        trace = pq.read_table(summary["trace_path"]).to_pylist()
        assert {t["url_norm"] for t in trace} <= oracle.seen

    def test_extracted_byte_identical_vs_golden(self, strict_run):
        """Engine content must equal the corpus golden `text` column —
        the BASELINE.json per-row invariant."""
        summary, _, corpus_dir = strict_run
        golden = dict(zip(
            *[pq.read_table(os.path.join(corpus_dir, "pages"),
                            columns=["url", "text"])[c].to_pylist()
              for c in ("url", "text")]))
        import glob as _glob
        files = sorted(f for d in summary["extracted_dirs"]
                       for f in _glob.glob(os.path.join(d, "*.parquet")))
        ext = pads.dataset(files, format="parquet").to_table(
            columns=["url_norm", "content", "job_type", "fetch_ok"])
        n = 0
        for url, content, jt, ok in zip(*[ext[c].to_pylist()
                                          for c in ("url_norm", "content",
                                                    "job_type",
                                                    "fetch_ok")]):
            if jt == "sitemap" or not ok:
                continue
            assert content == golden[url], f"content mismatch for {url}"
            n += 1
        assert n > 50

    def test_content_items_match_oracle(self, strict_run):
        summary, oracle, _ = strict_run
        items = pads.dataset(summary["content_items"],
                             format="parquet").to_table().to_pylist()
        assert len(items) == len(oracle.content_items)
        by_url = {r["url"]: r for r in items}
        for o in oracle.content_items:
            e = by_url[o["url"]]
            assert e["content"] == o["content"]
            assert e["title"] == o["title"]
            assert e["similarity_hash"] == o["similarity_hash"]
            assert e["content_type"] == o["content_type"]

    def test_dedup_happened(self, strict_run):
        summary, oracle, _ = strict_run
        items = pads.dataset(summary["content_items"],
                             format="parquet").to_table()
        trace = pq.read_table(summary["trace_path"])
        n_pages = sum(1 for jt in trace["job_type"].to_pylist()
                      if jt != "sitemap")
        assert items.num_rows < n_pages  # duplicates were merged
        assert max(items["n_versions"].to_pylist()) >= 2


class TestWaveConformance:
    def test_trace_matches_bfs_oracle(self, wave_run):
        summary, oracle, _ = wave_run
        trace = pads.dataset(summary["trace_path"],
                             format="parquet").to_table().to_pylist()
        trace.sort(key=lambda r: (r["wave"], r["priority"], r["url_norm"]))
        assert len(trace) == len(oracle.trace) > 50
        for eng_row, ora_row in zip(trace, oracle.trace):
            assert _trace_key(eng_row) == _trace_key(ora_row)

    def test_tail_fold_identical_to_dataset_path(self, small_corpus,
                                                 wave_run,
                                                 tmp_path_factory):
        """Tail-wave folding (driver-side slices through the same stage
        callables + admission actors) must be invisible: the full trace
        — wave, priority, url, parent, vts — is identical to a run with
        folding disabled (every wave through the Ray Data executor)."""
        import pyarrow as pa
        summary, _, _ = wave_run      # default config: folding enabled
        work = str(tmp_path_factory.mktemp("work_nofold"))
        eng = CrawlEngine(small_corpus["dir"], work,
                          CrawlConfig(tail_fold_threshold=0))
        nofold = eng.run(mode="wave")
        # the fold path runs _FetchFn driver-side, which clamps the
        # process-global arrow pools — the fold must restore whatever
        # the driver had (pin with a sentinel value, since the env
        # default here may itself be 1)
        prev = (pa.cpu_count(), pa.io_thread_count())
        try:
            pa.set_cpu_count(3)
            pa.set_io_thread_count(5)
            work2 = str(tmp_path_factory.mktemp("work_fold2"))
            CrawlEngine(small_corpus["dir"], work2,
                        CrawlConfig()).run(mode="wave")
            assert (pa.cpu_count(), pa.io_thread_count()) == (3, 5)
        finally:
            pa.set_cpu_count(prev[0])
            pa.set_io_thread_count(prev[1])

        def rows(s):
            t = pads.dataset(s["trace_path"],
                             format="parquet").to_table().to_pylist()
            t.sort(key=lambda r: (r["wave"], r["priority"], r["url_norm"]))
            return [(_trace_key(r), r["wave"]) for r in t]

        assert rows(summary) == rows(nofold)

    def test_seen_set_vs_strict(self, wave_run, strict_run):
        """BFS (min-depth) admission can reach URLs that priority order
        loses to depth inflation near the depth limit — the divergence is
        one-sided: priority-seen ⊆ bfs-seen, and the extras sit at
        max_depth (documented semantics difference between modes)."""
        wave_summary, wave_oracle, _ = wave_run
        _, strict_oracle, _ = strict_run
        assert strict_oracle.seen <= wave_oracle.seen
        extras = wave_oracle.seen - strict_oracle.seen
        depth_of = {t["url_norm"]: t["depth"] for t in wave_oracle.trace}
        assert all(depth_of.get(u, 99) >= 4 for u in extras)
        trace = pads.dataset(wave_summary["trace_path"],
                             format="parquet").to_table()
        assert set(trace["url_norm"].to_pylist()) <= wave_oracle.seen

    def test_content_items_match_oracle(self, wave_run):
        summary, oracle, _ = wave_run
        items = pads.dataset(summary["content_items"],
                             format="parquet").to_table().to_pylist()
        assert len(items) == len(oracle.content_items)
        by_url = {r["url"]: r for r in items}
        for o in oracle.content_items:
            e = by_url[o["url"]]
            assert e["content"] == o["content"]
            assert e["similarity_hash"] == o["similarity_hash"]

    def test_finalize_duplicate_last_url(self, tmp_path_factory):
        """Two hash groups electing the SAME last_url (one url spilled
        twice with different content, as overlapping resume runs can
        produce) must not crash the keyed-store path and must emit one
        content item per hash on BOTH paths — the composite
        (last_url, similarity_hash) winner key disambiguates."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import pyarrow.dataset as pads
        from crawler_ray.pipelines.crawl import finalize_content_items

        base = str(tmp_path_factory.mktemp("fin_dup"))
        ext = os.path.join(base, "extracted")
        os.makedirs(ext)

        def row(url, h, content, wave):
            return {"url_norm": url, "similarity_hash": h,
                    "fetch_ok": True, "title": "t-" + h,
                    "content": content, "content_type": "article",
                    "date": None, "author": None, "entities_json": "{}",
                    "domains": [], "wave": wave, "priority": 1.0,
                    "depth": 0, "job_type": "page", "parent_url": None,
                    "fetch_vts": 0.0, "host": "h.example"}

        # group A = {Y@wave0, X@wave1} (last visit X), group B =
        # {X@wave1, re-extracted with different content} (last visit
        # X): both groups elect last_url = X
        part0 = [row("http://h.example/y", "aaaa11", "old body", 0)]
        part1 = [row("http://h.example/x", "aaaa11", "old body x", 1),
                 row("http://h.example/x", "bbbb22", "new body", 1)]
        pq.write_table(pa.Table.from_pylist(part0),
                       os.path.join(ext, "part-0.parquet"))
        pq.write_table(pa.Table.from_pylist(part1),
                       os.path.join(ext, "part-1.parquet"))

        outs = {}
        for name, thresh in (("bcast", 1_000_000), ("store", 0)):
            path = finalize_content_items(
                ext, os.path.join(base, "items_" + name),
                order_cols=["wave", "priority", "url_norm"],
                winner_broadcast_threshold=thresh)
            outs[name] = sorted(
                pads.dataset(path, format="parquet")
                .to_table().to_pylist(),
                key=lambda r: r["similarity_hash"])
        assert outs["bcast"] == outs["store"]
        got = outs["bcast"]
        assert [r["similarity_hash"] for r in got] == ["aaaa11", "bbbb22"]
        # group A: first visit Y wins the insert (keeps url), last
        # visit X supplies the content; group B: X's re-extracted body
        assert got[0]["url"] == "http://h.example/y"
        assert got[0]["content"] == "old body x"
        assert got[0]["n_versions"] == 2
        assert got[1]["url"] == "http://h.example/x"
        assert got[1]["content"] == "new body"

    def test_finalize_rejects_duplicate_content_rows(self,
                                                     tmp_path_factory):
        """The SAME (url_norm, similarity_hash) row spilled into two
        parts (overlapping resume spills, content unchanged) would
        silently duplicate content items — finalize must fail loudly on
        its rows==winners invariant instead."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import pytest
        from crawler_ray.pipelines.crawl import finalize_content_items

        base = str(tmp_path_factory.mktemp("fin_dup_rows"))
        ext = os.path.join(base, "extracted")
        os.makedirs(ext)
        row = {"url_norm": "http://h.example/x", "similarity_hash":
               "aaaa11", "fetch_ok": True, "title": "t", "content":
               "body", "content_type": "article", "date": None,
               "author": None, "entities_json": "{}", "domains": [],
               "wave": 0, "priority": 1.0, "depth": 0,
               "job_type": "page", "parent_url": None,
               "fetch_vts": 0.0, "host": "h.example"}
        for i in range(2):
            pq.write_table(pa.Table.from_pylist([row]),
                           os.path.join(ext, f"part-{i}.parquet"))
        with pytest.raises(ValueError, match="winners"):
            finalize_content_items(
                ext, os.path.join(base, "items"),
                order_cols=["wave", "priority", "url_norm"])

    def test_finalize_winner_store_path_identical(self, wave_run,
                                                  tmp_path_factory):
        """winner_broadcast_threshold=0 forces the at-scale path — winners
        spill to a (last_url, hash)-keyed TableStore and build tasks
        point-read them — and the content_items output must be
        row-identical to the broadcast path the engine ran."""
        from crawler_ray.pipelines.crawl import finalize_content_items
        summary, _, _ = wave_run
        out = str(tmp_path_factory.mktemp("fin_store"))
        path = finalize_content_items(
            summary["extracted_dirs"], os.path.join(out, "items"),
            order_cols=["wave", "priority", "url_norm"],
            winner_broadcast_threshold=0)
        got = sorted(pads.dataset(path, format="parquet")
                     .to_table().to_pylist(),
                     key=lambda r: r["similarity_hash"])
        want = sorted(pads.dataset(summary["content_items"],
                                   format="parquet").to_table().to_pylist(),
                      key=lambda r: r["similarity_hash"])
        assert got == want


class TestResume:
    def test_wave_resume_identical(self, small_corpus, tmp_path_factory):
        """Run to completion; then re-run with resume=True (no-op fast
        path); then simulate a crash by deleting the last waves and
        resuming — final trace must be identical."""
        work = str(tmp_path_factory.mktemp("work_resume"))
        eng = CrawlEngine(small_corpus["dir"], work, CrawlConfig())
        full = eng.run(mode="wave")
        full_trace = pads.dataset(full["trace_path"],
                                  format="parquet").to_table().to_pylist()
        full_trace.sort(key=lambda r: (r["wave"], r["priority"],
                                       r["url_norm"]))

        out_dir = os.path.join(work, "wave")
        waves = sorted(d for d in os.listdir(out_dir)
                       if d.startswith("wave-"))
        # simulate crash: drop trace + the last two waves entirely
        shutil.rmtree(os.path.join(out_dir, "trace"))
        for d in waves[-2:]:
            shutil.rmtree(os.path.join(out_dir, d))
        resumed = eng.run(mode="wave", resume=True)
        resumed_trace = pads.dataset(
            resumed["trace_path"],
            format="parquet").to_table().to_pylist()
        resumed_trace.sort(key=lambda r: (r["wave"], r["priority"],
                                          r["url_norm"]))
        assert ([_trace_key(r) for r in resumed_trace]
                == [_trace_key(r) for r in full_trace])

    def test_strict_resume_from_checkpoint(self, small_corpus,
                                           tmp_path_factory):
        work = str(tmp_path_factory.mktemp("work_sresume"))
        cfg = CrawlConfig(round_batch=32, checkpoint_every=1)
        eng = CrawlEngine(small_corpus["dir"], work, cfg)
        full = eng.run(mode="strict")
        # resume after completion must be a no-op with identical trace
        resumed = eng.run(mode="strict", resume=True)
        t1 = pq.read_table(full["trace_path"]).to_pylist()
        t2 = pq.read_table(resumed["trace_path"]).to_pylist()
        assert [_trace_key(r) for r in t1] == [_trace_key(r) for r in t2]


class TestRobotsMode:
    def test_respect_robots_excludes_private(self, small_corpus,
                                             tmp_path_factory):
        work = str(tmp_path_factory.mktemp("work_robots"))
        eng = CrawlEngine(small_corpus["dir"], work,
                          CrawlConfig(respect_robots=True))
        summary = eng.run(mode="wave")
        trace = pads.dataset(summary["trace_path"],
                             format="parquet").to_table()
        urls = trace["url_norm"].to_pylist()
        assert not any("/private/" in u for u in urls)
        oracle = oracle_crawl(small_corpus["dir"], ordering="bfs",
                              respect_robots=True)
        assert len(urls) == len(oracle.trace)


class TestMultiHost:
    def test_hosts_isolated_and_skewed(self, multihost_corpus,
                                       tmp_path_factory):
        work = str(tmp_path_factory.mktemp("work_multi"))
        eng = CrawlEngine(multihost_corpus["dir"], work,
                          CrawlConfig(seen_shards=3))
        summary = eng.run(mode="wave")
        oracle = oracle_crawl(multihost_corpus["dir"], ordering="bfs")
        trace = pads.dataset(summary["trace_path"],
                             format="parquet").to_table().to_pylist()
        assert len(trace) == len(oracle.trace)
        hosts = {r["host"] for r in trace}
        assert len(hosts) == 3
        # politeness budgets are per-host: vts sequences independent
        for h in hosts:
            vts = sorted(r["fetch_vts"] for r in trace if r["host"] == h)
            assert vts[0] == 0.0
            assert all(b - a > 0.49 for a, b in zip(vts, vts[1:]))


class TestApproximateSeenModes:
    """bloom / cuckoo URL-seen shards must reproduce the exact-mode crawl
    at conformance scale (false positives are possible in principle but
    deterministic — these fixtures have none)."""

    @pytest.mark.parametrize("mode", ["bloom", "cuckoo"])
    def test_mode_matches_exact_trace(self, small_corpus, wave_run,
                                      tmp_path_factory, mode):
        exact_summary, _, _ = wave_run
        work = str(tmp_path_factory.mktemp(f"work_{mode}"))
        eng = CrawlEngine(small_corpus["dir"], work,
                          CrawlConfig(seen_mode=mode))
        summary = eng.run(mode="wave")
        key = lambda r: (r["wave"], r["priority"], r["url_norm"])  # noqa: E731
        a = sorted(pads.dataset(summary["trace_path"],
                                format="parquet").to_table().to_pylist(),
                   key=key)
        b = sorted(pads.dataset(exact_summary["trace_path"],
                                format="parquet").to_table().to_pylist(),
                   key=key)
        assert len(a) == len(b)
        assert [_trace_key(r) for r in a] == [_trace_key(r) for r in b]


class TestHostSplitCommit:
    """Mega-host commit range-split: stamps must be bit-identical to the
    serial path, both at the unit level and through a full crawl with
    the split forced on (threshold far below the corpus size)."""

    def test_stamp_host_rows_identical(self):
        import random

        from crawler_ray.state.admission import _stamp_host_rows

        rng = random.Random(3)
        rows = [(f"https://h/p{rng.randrange(10_000)}", "h", 1, b"d",
                 1, "page", rng.randrange(100), "parent")
                for _ in range(5_000)]
        serial = _stamp_host_rows(list(rows), base=7.0, delay=0.5,
                                  split_threshold=None, use_ray=False)
        split = _stamp_host_rows(list(rows), base=7.0, delay=0.5,
                                 split_threshold=256, use_ray=False)
        assert serial == split

    def test_wave_trace_with_split_forced(self, small_corpus, wave_run,
                                          tmp_path_factory):
        exact_summary, _, _ = wave_run
        work = str(tmp_path_factory.mktemp("work_split"))
        eng = CrawlEngine(small_corpus["dir"], work,
                          CrawlConfig(host_split_threshold=8))
        summary = eng.run(mode="wave")
        key = lambda r: (r["wave"], r["priority"], r["url_norm"])  # noqa: E731
        a = sorted(pads.dataset(summary["trace_path"],
                                format="parquet").to_table().to_pylist(),
                   key=key)
        b = sorted(pads.dataset(exact_summary["trace_path"],
                                format="parquet").to_table().to_pylist(),
                   key=key)
        assert len(a) == len(b) > 50
        assert [_trace_key(r) for r in a] == [_trace_key(r) for r in b]


class TestManifestFormatGuard:
    def test_stale_format_resume_raises(self, small_corpus,
                                        tmp_path_factory):
        """Resume from a checkpoint written by an older engine version
        (different snapshot/part layout) must fail fast with a clear
        re-run-fresh error, not a FileNotFoundError deep in restore."""
        import json

        work = str(tmp_path_factory.mktemp("work_fmt"))
        eng = CrawlEngine(small_corpus["dir"], work, CrawlConfig())
        eng.run(mode="wave")
        mpath = os.path.join(work, "wave", "wave-0000", "manifest.json")
        with open(mpath) as f:
            manifest = json.load(f)
        manifest["format"] = 1  # pretend an old engine wrote this
        # make this wave the resume point: drop later manifests
        for d in sorted(os.listdir(os.path.join(work, "wave"))):
            if d.startswith("wave-") and d != "wave-0000":
                mp = os.path.join(work, "wave", d, "manifest.json")
                if os.path.exists(mp):
                    os.remove(mp)
        with open(mpath, "w") as f:
            json.dump(manifest, f)
        eng2 = CrawlEngine(small_corpus["dir"], work, CrawlConfig())
        with pytest.raises(ValueError, match="re-run fresh"):
            eng2.run(mode="wave", resume=True)


def test_spill_retry_idempotent(tmp_path):
    """A retried spill task overwrites its own part instead of
    duplicating it — the property the deterministic part names exist
    for (a Ray task retry re-executes the same batch)."""
    import pyarrow as pa

    from crawler_ray.pipelines.wave import _SpillExtracted

    out = str(tmp_path / "extracted")
    batch = pa.table({
        "url_norm": pa.array(["https://h/x", "https://h/y"]),
        "links": pa.array([["https://h/z"], []],
                          pa.list_(pa.string())),
        "depth": pa.array([1, 1], pa.int32()),
        "job_type": pa.array(["post", "post"]),
        "priority": pa.array([5, 5], pa.int64()),
        "host": pa.array(["h", "h"]),
        "fetch_ok": pa.array([True, False]),
        "sm_kind": pa.array(["", ""]),
        "title": pa.array(["t1", "t2"]),
    })
    spill = _SpillExtracted(out)
    r1 = spill(batch)
    files_once = sorted(os.listdir(out))
    r2 = spill(batch)  # the "retry"
    files_twice = sorted(os.listdir(out))
    assert files_once == files_twice and len(files_once) == 1
    assert _SpillExtracted.counts(out) == (2, 1)
    assert r1.equals(r2)
