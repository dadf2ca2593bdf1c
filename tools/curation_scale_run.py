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
WORK = f"/tmp/curation_scale_{N_DOCS}"

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

    def render(batch):
        ids = batch["id"].to_numpy()
        texts = []
        vocab = np.array(VOCAB)
        for i in ids:
            s = _splitmix64(np.uint64(i) + np.uint64(0x5EED))
            rng = np.random.default_rng(int(s))
            n = int(rng.integers(20, 120))
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), n)]))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

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

    from crawler_ray.ops import textstats

    sf = os.path.join(WORK, "sf")
    t0 = time.time()
    gen_documents(sf)
    t_gen = round(time.time() - t0, 1)

    out = {"n_docs": N_DOCS, "gen_sec": t_gen, "passes": {}}
    sums = {}
    for name in ("pii_scrub", "repetition_stats", "dataset_split",
                 "chunk_documents", "pack_manifest", "top_bigrams",
                 "contamination_check"):
        sink = os.path.join(WORK, "out", name)
        shutil.rmtree(sink, ignore_errors=True)
        t0 = time.time()
        ds = getattr(textstats, name)(sf)
        ds.write_parquet(sink)
        out["passes"][name] = round(time.time() - t0, 1)
        sums[name] = sink

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
    ok = (out["invariants"]["chunk_tokens_equal"]
          and out["invariants"]["pack_tokens_equal"]
          and out["invariants"]["pack_telescope_closed"]
          and out["invariants"]["pack_rows"] == N_DOCS)
    out["invariants_ok"] = bool(ok)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
