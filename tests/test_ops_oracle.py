"""Operator-suite parity: every ``queries()`` entry that has an
``oracle_sql()`` twin must match DuckDB on row count, column set, and
order-insensitive value hash at sf0.001 — the same comparison the driver
runs at sf0.01.  Rows-only entries are smoke-checked for non-empty,
stable output."""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# crawl_* run the full engine over a generated corpus — covered by
# test_crawl_conformance, too slow to repeat here.
SKIP = {"crawl_trace", "crawl_content_items", "crawl_host_rates"}

# rows-only ops where an empty result is legitimate at this tiny sf
MAY_BE_EMPTY = {"embedding_dup_pairs", "minhash_pairs",
                "minhash_dedup_keep", "simhash_pairs",
                "ngram_jaccard_pairs"}


def _entry():
    import __ray_entry__
    return __ray_entry__


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()


def _canon(df: pd.DataFrame) -> tuple:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(repr(v))
            elif isinstance(v, bytes):
                vals.append(v.hex())
            else:
                vals.append(str(v))
        rows.append("\x1f".join(vals))
    rows.sort()
    return (len(df), list(df.columns),
            hashlib.md5("\x1e".join(rows).encode()).hexdigest())


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _query_names():
    return [n for n in _entry().queries() if n not in SKIP]


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(name, ray_session, duck):
    e = _entry()
    mine = _to_pandas(e.queries()[name](SF_DIR))
    sql = e.oracle_sql().get(name)
    if sql is None:
        assert set(mine.columns), f"{name}: no columns"
        if name not in MAY_BE_EMPTY:
            assert len(mine) > 0, f"{name}: empty rows-only result"
        return
    theirs = duck.sql(sql).df()
    assert _canon(mine) == _canon(theirs), (
        f"{name}: mismatch vs DuckDB oracle "
        f"(mine {len(mine)} rows, oracle {len(theirs)} rows)")


def test_expert_domain_links_join_path_equivalent(ray_session):
    """broadcast_threshold=0 forces the at-scale doc_id-/expert_id-keyed
    joins; the scored link table must be identical to the broadcast
    (id-sorted numpy) path."""
    from crawler_ray.ops.relational import expert_domain_links
    key = ["expert_id", "domain"]
    bc = _to_pandas(expert_domain_links(SF_DIR)).sort_values(key)
    jn = _to_pandas(expert_domain_links(SF_DIR, broadcast_threshold=0)
                    ).sort_values(key)
    assert (bc.reset_index(drop=True).equals(jn.reset_index(drop=True)))


def test_curate_corpus_join_path_equivalent(ray_session):
    """broadcast_threshold=0 forces the at-scale hash-keyed winner join;
    the verdicts must be identical to the broadcast path."""
    from crawler_ray.ops.textstats import curate_corpus
    bc = _to_pandas(curate_corpus(SF_DIR)).sort_values("doc_id")
    jn = _to_pandas(curate_corpus(SF_DIR, broadcast_threshold=0)
                    ).sort_values("doc_id")
    assert (bc.reset_index(drop=True).equals(jn.reset_index(drop=True)))
