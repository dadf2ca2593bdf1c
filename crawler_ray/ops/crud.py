"""Driver surface for the keyed TableStore (S11-S14): a full
create -> bulk insert -> update-or-insert -> delete -> scan cycle over
the TPC-H ``customer`` table, exercised exactly the way the reference
drives its ORM CRUD layer (``database/operations.py:23-231``,
``core/storage.py:273-303`` bulk counts) but as partition-local
parquet merges (see ``crawler_ray/state/tablestore.py``).

Scenario (all rules closed-form so a DuckDB oracle can replay them):

1. seed    — upsert every ``customer`` row (all inserts).
2. mutate  — one upsert carrying BOTH updates and inserts:
   - customers with >= 5 orders get ``c_acctbal + 100.0`` and
     ``c_mktsegment = 'UPDATED'`` (update-or-insert hits the update arm);
   - one new customer per nation, key ``10_000_000 + n_nationkey``
     (hits the insert arm).
3. delete  — every current key with ``c_custkey % 7 == 0``.
4. scan    — the surviving table is the ``table_crud`` result;
   ``table_crud_counts`` returns the S12-style bulk counters.

The update-key set is an aggregate (distinct customers with >= 5
orders).  It reaches the update filter by the usual planner decision:
at or under ``broadcast_threshold`` keys it ships once via ``ray.put``
and filters with a vectorized ``is_in``; above it the customer rows
semi-join the key table through a hash-partitioned ``Dataset.join``,
so the key set never lands on the driver (``broadcast_threshold=0``
forces the join path — pytest pins the two paths identical).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["table_crud", "table_crud_counts"]

_NEW_KEY_BASE = 10_000_000
_MIN_ORDERS = 5
_DELETE_MOD = 7


def _rd():
    import ray.data as rd
    return rd


def _store_root(sf_dir: str, broadcast_threshold: int) -> str:
    # threshold is part of the key so the broadcast and join variants
    # never share (and mid-cycle corrupt) one store directory
    digest = hashlib.md5(
        f"{sf_dir}|{broadcast_threshold}".encode()).hexdigest()[:12]
    return f"/tmp/crawler_ray_tablestore/{digest}"


def _update_keys_ds(sf_dir: str):
    """Distinct customers with >= ``_MIN_ORDERS`` orders, as a Dataset —
    a groupby aggregate bounded by the distinct-customer count of the
    order log."""
    cnt = (_rd().read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey"])
           .groupby("o_custkey").count())

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["count()"], _MIN_ORDERS))

    return (cnt.map_batches(keep, batch_format="pyarrow")
            .select_columns(["o_custkey"]))


_CYCLE_CACHE: dict[tuple, tuple] = {}


def _run_cycle(sf_dir: str, broadcast_threshold: int = 1_000_000):
    """Run the full CRUD cycle; returns (store, counts_table).

    Memoized per (sf_dir, threshold) within the process: the driver
    registers BOTH table_crud and table_crud_counts, and each would
    otherwise re-execute the whole seed/update/insert/delete cycle —
    the second caller serves from the first run's store files."""
    key = (sf_dir, broadcast_threshold)
    if key in _CYCLE_CACHE:
        store, counts = _CYCLE_CACHE[key]
        # a long-lived process can outlive the /tmp store files (tmp
        # cleaners); serve the cache only while the table still exists
        if os.path.exists(os.path.join(store.root, "_TABLE.json")):
            return store, counts
        del _CYCLE_CACHE[key]
    _CYCLE_CACHE[key] = _run_cycle_impl(sf_dir, broadcast_threshold)
    return _CYCLE_CACHE[key]


def _run_cycle_impl(sf_dir: str, broadcast_threshold: int):
    import pyarrow.parquet as pq
    import ray

    from crawler_ray.ops.dedup import _join_partitions, _join_ready
    from crawler_ray.state.tablestore import TableStore

    cust_path = f"{sf_dir}/customer.parquet"
    schema = pq.read_schema(cust_path).remove_metadata()
    store = TableStore.create(_store_root(sf_dir, broadcast_threshold),
                              "c_custkey", schema,
                              num_partitions=8, drop_existing=True)

    # rows_hint (parquet metadata — free) routes small mutations
    # through the store's raw-task path instead of a groupby shuffle;
    # at driver-gate scale every cycle phase qualifies, and pytest pins
    # the two mutation paths identical
    n_cust = pq.read_metadata(cust_path).num_rows
    seed = store.upsert(_rd().read_parquet(cust_path), rows_hint=n_cust)

    keys_ds = _update_keys_ds(sf_dir)

    def rewrite(hit: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": hit["c_custkey"],
            "c_name": hit["c_name"],
            "c_nationkey": hit["c_nationkey"],
            "c_acctbal": pc.add(hit["c_acctbal"], 100.0),
            "c_mktsegment": pa.array(["UPDATED"] * hit.num_rows,
                                     pa.string()),
        }).cast(schema)

    keys_r = _join_ready(keys_ds,
                         pa.schema([("o_custkey", pa.int64())]))
    n_keys = keys_r.count()
    if n_keys <= broadcast_threshold:
        keys = sorted(r["o_custkey"] for r in keys_r.take_all())
        # broadcast the arrow array itself (zero-copy per task) rather
        # than rebuilding it from numpy in every batch
        keys_ref = ray.put(pa.array(keys, pa.int64()))

        def build_updates(t: pa.Table) -> pa.Table:
            mask = pc.is_in(t["c_custkey"], value_set=ray.get(keys_ref))
            return rewrite(t.filter(mask))

        updates = (_rd().read_parquet(cust_path)
                   .map_batches(build_updates, batch_format="pyarrow"))
    else:
        # at-scale path: semi-join the customers against the key table —
        # the key set never lands on the driver
        joined = _rd().read_parquet(cust_path).join(
            keys_r, "inner",
            num_partitions=_join_partitions(None, approx_rows=n_keys),
            on=("c_custkey",), right_on=("o_custkey",))
        updates = joined.map_batches(rewrite, batch_format="pyarrow")

    def build_inserts(t: pa.Table) -> pa.Table:
        nk = t["n_nationkey"].to_numpy(zero_copy_only=False)
        names = ["NEW-" + n for n in t["n_name"].to_pylist()]
        return pa.table({
            "c_custkey": pa.array(_NEW_KEY_BASE + nk.astype(np.int64),
                                  pa.int64()),
            "c_name": pa.array(names, pa.string()),
            "c_nationkey": pa.array(nk, pa.int32()),
            "c_acctbal": pa.array(np.zeros(len(nk)), pa.float64()),
            "c_mktsegment": pa.array(["NEW"] * len(nk), pa.string()),
        }).cast(schema)

    inserts = (_rd().read_parquet(f"{sf_dir}/nation.parquet",
                                  columns=["n_nationkey", "n_name"])
               .map_batches(build_inserts, batch_format="pyarrow"))

    n_nation = pq.read_metadata(f"{sf_dir}/nation.parquet").num_rows
    mutate = store.upsert(updates.union(inserts),
                          rows_hint=n_keys + n_nation)

    def doomed(t: pa.Table) -> pa.Table:
        k = t["c_custkey"]
        # k % 7 via integer ops (keys are non-negative)
        mod = pc.subtract(k, pc.multiply(pc.divide(k, _DELETE_MOD),
                                         _DELETE_MOD))
        return pa.table({"c_custkey": k}).filter(pc.equal(mod, 0))

    deleted = store.delete(
        store.scan(columns=["c_custkey"])
        .map_batches(doomed, batch_format="pyarrow"),
        rows_hint=store.count())  # metadata-sum upper bound

    counts = pa.table({
        "seed_inserted": pa.array([seed["inserted"]], pa.int64()),
        "seed_updated": pa.array([seed["updated"]], pa.int64()),
        "mut_inserted": pa.array([mutate["inserted"]], pa.int64()),
        "mut_updated": pa.array([mutate["updated"]], pa.int64()),
        "deleted": pa.array([deleted], pa.int64()),
    })
    return store, counts


def table_crud(sf_dir: str, broadcast_threshold: int = 1_000_000):
    """Final table after the CRUD cycle (see module docstring)."""
    store, _ = _run_cycle(sf_dir, broadcast_threshold)
    return store.scan()


def table_crud_counts(sf_dir: str, broadcast_threshold: int = 1_000_000):
    """S12-style bulk counters for each phase of the CRUD cycle."""
    _, counts = _run_cycle(sf_dir, broadcast_threshold)
    return counts
