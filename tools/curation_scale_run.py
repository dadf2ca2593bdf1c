"""Large-corpus validation of the curation operator suite (round-3
evidence item for the new training-data passes).

Generates an N-doc word-soup documents table (deterministic per-doc RNG
keyed on doc_id — regeneration-stable under any partitioning), then runs
each curation pass end-to-end with a parquet sink (the realistic
consumption: results never land on the driver) and reports per-pass
wall time plus cross-op invariant checks computed DISTRIBUTEDLY:

- sum of chunk n_tokens == sum of repetition n_words
             == sum of pack_manifest n_tokens (over docs with tokens)
- pack_manifest's final (tok_offset + n_tokens) == total corpus tokens
  (the two-level prefix sum closed the telescope exactly)
- contamination rows == number of train-split docs with >= 1 trigram

Round 4 extends the corpus to multi-line documents with planted
boilerplate (a shared cookie-banner line in ~1/3 of docs, a shared
footer in ~1/4) plus lang/source columns, and adds the selection-layer
passes with their own distributed invariants:

- line_dedup: recounting the lines of text_clean over the CLEANED
  corpus must show every surviving line below min_count (end-to-end
  proof that no common line survived), and sum(n_lines) must equal the
  corpus's total line count
- quality_filter: rows == N and the word-count floor is exact vs a
  DuckDB replay of the rule
- source_quota / stratified_sample / length_percentiles: bit-equal to
  full DuckDB window/hash replays over the corpus

Usage:  PYTHONPATH=/root/repo python tools/curation_scale_run.py
Env:    GRAFT_CUR_DOCS (default 1_000_000), RAY_GRAFT_CPUS (default 32)
Output: one JSON line.  Scratch under /tmp.
"""

from __future__ import annotations

import json
import os
import shutil
import time

N_DOCS = int(os.environ.get("GRAFT_CUR_DOCS", "1000000"))
WORK = f"/tmp/curation_scale_{N_DOCS}_v2"

VOCAB = ("the fast key order sort table scan merge part window small "
         "hash join batch stream value data agg query filter group "
         "vector line column customer big slow state event model train"
         ).split()


def gen_documents(sf_dir: str) -> None:
    """Deterministic word-soup documents table, generated distributedly
    (per-doc seed = splitmix64(doc_id) — partitioning-invariant)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.ops.dedup import _splitmix64

    if os.path.exists(os.path.join(sf_dir, "_DONE")):
        return
    shutil.rmtree(sf_dir, ignore_errors=True)

    BANNER = "accept all cookies to continue"
    FOOTER = "copyright example site all rights reserved"
    LANGS = ("en", "fa", "de", "es")

    def render(batch):
        ids = batch["id"].to_numpy()
        texts = []
        vocab = np.array(VOCAB)
        for i in ids:
            s = _splitmix64(np.uint64(i) + np.uint64(0x5EED))
            rng = np.random.default_rng(int(s))
            n = int(rng.integers(20, 120))
            words = vocab[rng.integers(0, len(vocab), n)]
            # multi-line body: ~10-word lines so line_dedup has real
            # per-doc structure (word-soup lines are essentially unique)
            lines = [" ".join(words[j:j + 10])
                     for j in range(0, n, 10)]
            if i % 3 == 0:
                lines.insert(0, BANNER)
            if i % 4 == 1:
                lines.append(FOOTER)
            texts.append("\n".join(lines))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([LANGS[int(i) % len(LANGS)] for i in ids],
                             pa.string()),
            "source": pa.array([f"s{int(i) % 1009}" for i in ids],
                               pa.string()),
        })

    (rd.range(N_DOCS)
     .map_batches(render, batch_size=8192, batch_format="pyarrow")
     .write_parquet(sf_dir))
    # the ops read <sf_dir>/documents.parquet; parquet dirs work too
    os.rename(sf_dir, sf_dir + "_tmp")
    os.makedirs(sf_dir)
    os.rename(sf_dir + "_tmp", os.path.join(sf_dir, "documents.parquet"))
    with open(os.path.join(sf_dir, "_DONE"), "w"):
        pass


def main() -> None:
    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from crawler_ray.ops import filtering, textstats

    sf = os.path.join(WORK, "sf")
    t0 = time.time()
    gen_documents(sf)
    t_gen = round(time.time() - t0, 1)

    out = {"n_docs": N_DOCS, "gen_sec": t_gen, "passes": {}}
    sums = {}
    for name in ("pii_scrub", "repetition_stats", "dataset_split",
                 "chunk_documents", "pack_manifest", "top_bigrams",
                 "contamination_check", "line_dedup", "quality_filter",
                 "source_quota", "stratified_sample",
                 "incremental_dedup", "normalize_text",
                 "shuffle_corpus", "curate_pipeline", "span_dedup"):
        sink = os.path.join(WORK, "out", name)
        shutil.rmtree(sink, ignore_errors=True)
        t0 = time.time()
        fn = getattr(textstats, name, None) or getattr(filtering, name)
        # the driver query's relaxed gate constants — Gopher defaults
        # keep zero word-soup docs (dup_frac fails them all)
        kwargs = ({"min_words": 20, "max_dup_frac_milli": 600}
                  if name == "curate_pipeline" else
                  {"span_tokens": 20} if name == "span_dedup" else {})
        ds = fn(sf, **kwargs)
        ds.write_parquet(sink)
        out["passes"][name] = round(time.time() - t0, 1)
        sums[name] = sink
    t0 = time.time()
    pctl = filtering.length_percentiles(sf)
    out["passes"]["length_percentiles"] = round(time.time() - t0, 1)

    # -- distributed invariant checks (duckdb over the sinks) -------------
    import duckdb
    q = duckdb.sql
    tok_rep = q(f"SELECT sum(n_words), count(*) FROM "
                f"read_parquet('{sums['repetition_stats']}/*.parquet')"
                ).fetchone()
    tok_chunk = q(f"SELECT sum(n_tokens) FROM "
                  f"read_parquet('{sums['chunk_documents']}/*.parquet')"
                  ).fetchone()
    pack = q(f"SELECT sum(n_tokens), max(tok_offset + n_tokens), count(*) "
             f"FROM read_parquet('{sums['pack_manifest']}/*.parquet')"
             ).fetchone()
    cont = q(f"SELECT count(*), sum((n_contaminated > 0)::BIGINT) FROM "
             f"read_parquet('{sums['contamination_check']}/*.parquet')"
             ).fetchone()
    out["invariants"] = {
        "total_tokens": int(tok_rep[0]),
        "repetition_docs": int(tok_rep[1]),
        "chunk_tokens_equal": int(tok_chunk[0]) == int(tok_rep[0]),
        "pack_tokens_equal": int(pack[0]) == int(tok_rep[0]),
        "pack_telescope_closed": int(pack[1]) == int(tok_rep[0]),
        "pack_rows": int(pack[2]),
        "contaminated_train_docs": [int(cont[0]), int(cont[1])],
    }
    docs_pq = f"{sf}/documents.parquet/*.parquet"
    # line_dedup: total line conservation + no common line survives
    ld = q(f"SELECT sum(n_lines), sum(n_dropped), count(*) FROM "
           f"read_parquet('{sums['line_dedup']}/*.parquet')").fetchone()
    corpus_lines = q(
        f"SELECT sum(len(string_split(text, chr(10)))) FROM "
        f"read_parquet('{docs_pq}')").fetchone()
    max_resurvive = q(
        f"SELECT COALESCE(max(n), 0) FROM ("
        f"  SELECT line, count(*) AS n FROM ("
        f"    SELECT unnest(string_split(text_clean, chr(10))) AS line"
        f"    FROM read_parquet('{sums['line_dedup']}/*.parquet'))"
        f"  WHERE line <> '' GROUP BY line)").fetchone()
    # quality_filter: row conservation + exact word-count floor
    qf = q(f"SELECT count(*),"
           f" sum((reason = 'too_short' AND n_words < 50)::BIGINT),"
           f" sum((n_words < 50)::BIGINT) FROM "
           f"read_parquet('{sums['quality_filter']}/*.parquet')"
           ).fetchone()
    # source_quota: bit-equal to the DuckDB window replay
    quota_diff = q(
        f"SELECT count(*) FROM ("
        f"  (SELECT doc_id, source, rk FROM"
        f"     (SELECT doc_id, source, ROW_NUMBER() OVER"
        f"        (PARTITION BY source ORDER BY doc_id) AS rk"
        f"      FROM read_parquet('{docs_pq}')) WHERE rk <= 50)"
        f"  EXCEPT"
        f"  (SELECT doc_id, source, rk FROM"
        f"     read_parquet('{sums['source_quota']}/*.parquet')))"
        ).fetchone()
    # incremental_dedup: bit-equal to the full-md5 NOT IN replay
    incr_diff = q(
        f"SELECT count(*) FROM ("
        f"  (WITH b AS (SELECT doc_id, text,"
        f"       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
        f"         ::BIGINT % 1000 AS bucket"
        f"     FROM read_parquet('{docs_pq}')),"
        f"   ex AS (SELECT DISTINCT md5(text) AS h FROM b"
        f"          WHERE bucket >= 200)"
        f"   SELECT doc_id, md5(text) AS text_hash FROM b"
        f"   WHERE bucket < 200"
        f"     AND md5(text) NOT IN (SELECT h FROM ex))"
        f"  EXCEPT"
        f"  (SELECT doc_id, text_hash FROM"
        f"     read_parquet('{sums['incremental_dedup']}/*.parquet')))"
        ).fetchone()
    # shuffle_corpus: an exact permutation of 0..N-1
    shuf = q(f"SELECT count(*), count(DISTINCT shuffle_rank),"
             f" min(shuffle_rank), max(shuffle_rank) FROM "
             f"read_parquet('{sums['shuffle_corpus']}/*.parquet')"
             ).fetchone()
    # ...AND rank-EXACT at scale: a 10k-doc sample replayed against the
    # full-corpus ROW_NUMBER over the md5 hex prefix.  Permutation-ness
    # alone cannot catch a block-order regression in the private
    # iter_internal_ref_bundles() ordering the op leans on; this can.
    shuf_exact = q(
        f"WITH r AS (SELECT doc_id,"
        f"   ROW_NUMBER() OVER (ORDER BY"
        f"     substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 16),"
        f"     doc_id) - 1 AS rk"
        f"   FROM read_parquet('{docs_pq}'))"
        f" SELECT count(*) FROM"
        f"   read_parquet('{sums['shuffle_corpus']}/*.parquet') s"
        f"   JOIN r USING (doc_id)"
        f" WHERE s.doc_id % 97 = 0 AND s.shuffle_rank <> r.rk"
        ).fetchone()
    # curate_pipeline: winners are hash-distinct, and the split stamp
    # replays the md5 bucket rule on a sample
    cur = q(f"SELECT count(*), count(DISTINCT text_hash) FROM "
            f"read_parquet('{sums['curate_pipeline']}/*.parquet')"
            ).fetchone()
    cur_split = q(
        f"SELECT count(*) FROM "
        f"read_parquet('{sums['curate_pipeline']}/*.parquet')"
        f" WHERE doc_id % 23 = 0 AND split <> ("
        f"   CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),"
        f"        1, 8))::BIGINT % 1000 < 100 THEN 'test'"
        f"        WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),"
        f"        1, 8))::BIGINT % 1000 < 200 THEN 'val'"
        f"        ELSE 'train' END)").fetchone()
    # span_dedup: row-conserving; window totals replay exactly from
    # token counts; dups never exceed totals
    spd = q(f"SELECT count(*),"
            f" sum(n_spans),"
            f" sum((n_dup_spans > n_spans)::BIGINT) FROM "
            f"read_parquet('{sums['span_dedup']}/*.parquet')").fetchone()
    spd_exp = q(
        f"SELECT sum(greatest(len(list_filter(string_split(text, ' '),"
        f" w -> w <> '')) - 19, 0)) FROM read_parquet('{docs_pq}')"
        ).fetchone()
    # normalize_text: row-conserving; no double spaces or edge spaces
    # survive in changed rows
    norm = q(f"SELECT count(*),"
             f" sum((text_norm LIKE '%  %' OR text_norm LIKE ' %'"
             f"      OR text_norm LIKE '% ')::BIGINT) FROM "
             f"read_parquet('{sums['normalize_text']}/*.parquet')"
             ).fetchone()
    # stratified_sample: bit-equal to the md5-bucket replay
    strat_diff = q(
        f"SELECT count(*) FROM ("
        f"  (SELECT doc_id, lang, bucket FROM"
        f"     (SELECT doc_id, lang,"
        f"        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
        f"          ::BIGINT % 1000 AS bucket"
        f"      FROM read_parquet('{docs_pq}')) WHERE bucket < 100)"
        f"  EXCEPT"
        f"  (SELECT doc_id, lang, bucket FROM"
        f"     read_parquet('{sums['stratified_sample']}/*.parquet')))"
        ).fetchone()
    out["invariants"].update({
        "line_dedup_rows": int(ld[2]),
        "line_total_equal": int(ld[0]) == int(corpus_lines[0]),
        "lines_dropped": int(ld[1]),
        "no_common_line_survives": int(max_resurvive[0]) < 2,
        "quality_rows": int(qf[0]),
        "quality_floor_exact": int(qf[1]) == int(qf[2]),
        "source_quota_replay_diff": int(quota_diff[0]),
        "incremental_replay_diff": int(incr_diff[0]),
        "shuffle_exact_permutation": (
            int(shuf[0]) == N_DOCS and int(shuf[1]) == N_DOCS
            and int(shuf[2]) == 0 and int(shuf[3]) == N_DOCS - 1),
        "shuffle_sample_rank_mismatches": int(shuf_exact[0]),
        "curate_rows": int(cur[0]),
        "curate_winners_distinct": int(cur[0]) == int(cur[1]),
        "curate_split_sample_mismatches": int(cur_split[0]),
        "span_rows": int(spd[0]),
        "span_totals_exact": int(spd[1]) == int(spd_exp[0]),
        "span_dups_bounded": int(spd[2]) == 0,
        "normalize_rows": int(norm[0]),
        "normalize_residual_ws": int(norm[1]),
        "stratified_replay_diff": int(strat_diff[0]),
        "length_percentiles": dict(zip(pctl["pct"].to_pylist(),
                                       pctl["n_tokens"].to_pylist())),
    })
    ok = (out["invariants"]["chunk_tokens_equal"]
          and out["invariants"]["pack_tokens_equal"]
          and out["invariants"]["pack_telescope_closed"]
          and out["invariants"]["pack_rows"] == N_DOCS
          and out["invariants"]["line_dedup_rows"] == N_DOCS
          and out["invariants"]["line_total_equal"]
          and out["invariants"]["lines_dropped"] > 0
          and out["invariants"]["no_common_line_survives"]
          and out["invariants"]["quality_rows"] == N_DOCS
          and out["invariants"]["quality_floor_exact"]
          and out["invariants"]["source_quota_replay_diff"] == 0
          and out["invariants"]["incremental_replay_diff"] == 0
          and out["invariants"]["shuffle_exact_permutation"]
          and out["invariants"]["shuffle_sample_rank_mismatches"] == 0
          and out["invariants"]["curate_winners_distinct"]
          and out["invariants"]["curate_split_sample_mismatches"] == 0
          and out["invariants"]["span_rows"] == N_DOCS
          and out["invariants"]["span_totals_exact"]
          and out["invariants"]["span_dups_bounded"]
          and out["invariants"]["normalize_rows"] == N_DOCS
          and out["invariants"]["normalize_residual_ws"] == 0
          and out["invariants"]["stratified_replay_diff"] == 0)
    out["invariants_ok"] = bool(ok)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
