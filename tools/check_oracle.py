"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf, run the matching oracle_sql() through DuckDB on the
same parquet views, and compare row count + schema + order-insensitive
value hash.  Usage: python tools/check_oracle.py [sf_dir] [query ...]"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> tuple:
    df = df[sorted(df.columns)].copy()
    # normalize dtypes for hashing: ints -> int64, floats kept, bytes hex
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
    digest = hashlib.md5("\x1e".join(rows).encode()).hexdigest()
    return len(df), list(df.columns), digest


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    import time
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"ERROR  {name}: {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ROWS   {name}: {len(mine)} rows "
                  f"[{', '.join(sorted(mine.columns))}] {el:.1f}s "
                  "(rows-only)")
            if len(mine) == 0 and name not in ("embedding_dup_pairs",):
                print(f"  WARN: zero rows")
            continue
        theirs = con.sql(oracles[name]).df()
        m = canon(mine)
        o = canon(theirs)
        status = "OK" if m == o else "MISMATCH"
        print(f"{status:9s}{name}: mine={m[0]} oracle={o[0]} {el:.1f}s")
        if m != o:
            failures.append(name)
            if m[1] != o[1]:
                print(f"  cols mine  : {m[1]}\n  cols oracle: {o[1]}")
            elif m[0] == o[0]:
                mm = mine[sorted(mine.columns)]
                oo = theirs[sorted(theirs.columns)]
                key = sorted(mine.columns)[0]
                mm = mm.sort_values(list(mm.columns)).reset_index(drop=True)
                oo = oo.sort_values(list(oo.columns)).reset_index(drop=True)
                diff = (mm.astype(str) != oo.astype(str)).any(axis=1)
                print("  first diffs:")
                print(pd.concat([mm[diff].head(3), oo[diff].head(3)],
                                keys=["mine", "oracle"]))
    ray.shutdown()
    print("\nFAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
