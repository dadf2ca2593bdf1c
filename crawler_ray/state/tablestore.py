"""Keyed table store: the Ray-native replacement for the reference's
generic CRUD layer (S12/S13/S14).

The reference does row CRUD through a MySQL ORM
(``database/operations.py:23-231`` create/bulk_create/get/update/
delete/count, ``database/schema.py:115-166`` DDL, and
``core/storage.py:273-303`` bulk stores with success/update counts).
A Ray Data engine replaces the database with a hash-partitioned keyed
parquet layout and turns every mutation into a *partition-local* merge:

    <root>/part-00000.parquet ... part-{P-1}.parquet + _TABLE.json

- **DDL** (S14) is directory layout + schema manifest (`create`/`drop`).
- **Upsert** (S11/S12) hash-partitions the incoming rows by key and
  rewrites ONLY the touched partitions: one `groupby(part).map_groups`
  where each task reads its single partition file, merges key-sorted
  (incoming wins over existing — the ORM's update-or-insert), and
  writes back atomically (tmp + rename, so a retried task is
  idempotent).  Insert/update counts come back as the task's return
  rows — the bulk-store counts, via aggregate instead of a driver loop.
- **Delete** is the same partition-local rewrite with an anti-filter.
- **Point get** (S13 read) touches only the partitions that can hold
  the keys, with the range+isin row-group pruning filter the fetch
  join uses (partitions are key-sorted on every rewrite).
- **Scan/count** are plain Dataset reads.

At 10^10 rows nothing here lands on the driver: rows shuffle once by
key hash, partition files rewrite in parallel, and a failed upsert run
re-executes per-partition merges idempotently.  Single-writer per
table (the reference's session-scoped storage manager made the same
assumption; concurrent writers would need a manifest lock).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

__all__ = ["TableStore"]


def _rd():
    import ray.data as rd
    return rd


def _key_hash(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Stable uint64 per key: splitmix64 for integer keys, md5-low64 for
    strings (the same SQL-twinnable families the dedup operators use)."""
    if pa.types.is_integer(arr.type):
        from crawler_ray.ops.dedup import _splitmix64
        vals = np.asarray(arr.to_numpy(zero_copy_only=False),
                          dtype=np.uint64)
        return _splitmix64(vals)
    out = np.empty(len(arr), dtype=np.uint64)
    for i, v in enumerate(arr.to_pylist()):
        out[i] = int.from_bytes(
            hashlib.md5(str(v).encode("utf-8")).digest()[:8], "big")
    return out


class TableStore:
    """A hash-partitioned keyed parquet table with distributed CRUD."""

    def __init__(self, root: str):
        self.root = root
        with open(os.path.join(root, "_TABLE.json")) as f:
            meta = json.load(f)
        self.key_col: str = meta["key_col"]
        self.num_partitions: int = meta["num_partitions"]
        self.schema = pa.ipc.read_schema(
            pa.py_buffer(bytes.fromhex(meta["schema_ipc"])))

    # -- DDL (S14) -----------------------------------------------------
    @staticmethod
    def create(root: str, key_col: str, schema: pa.Schema,
               num_partitions: int = 16,
               drop_existing: bool = False) -> "TableStore":
        if os.path.exists(os.path.join(root, "_TABLE.json")):
            if not drop_existing:
                return TableStore(root)
            shutil.rmtree(root)
        os.makedirs(root, exist_ok=True)
        meta = {
            "key_col": key_col,
            "num_partitions": num_partitions,
            "schema_ipc": schema.serialize().to_pybytes().hex(),
        }
        tmp = os.path.join(root, "_TABLE.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(root, "_TABLE.json"))
        return TableStore(root)

    def drop(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)

    # -- helpers ---------------------------------------------------------
    def _part_path(self, part: int) -> str:
        return os.path.join(self.root, f"part-{part:05d}.parquet")

    def _partition_of(self, arr) -> np.ndarray:
        return (_key_hash(arr) % np.uint64(self.num_partitions)).astype(
            np.int32)

    def _existing_parts(self) -> list[str]:
        return [p for i in range(self.num_partitions)
                if os.path.exists(p := self._part_path(i))]

    def _check_schema(self, schema: pa.Schema) -> None:
        want = [(f.name, f.type) for f in self.schema]
        got = [(f.name, f.type) for f in schema
               if f.name != "_part"]
        if want != got:
            raise ValueError(
                f"upsert schema {got} != table schema {want}")

    # -- mutations -------------------------------------------------------
    def upsert(self, ds, rows_hint: int | None = None,
               collect_threshold: int = 65536) -> dict:
        """Insert-or-update rows by key (incoming wins).  Incoming keys
        must be unique — the reference's bulk loop implies a processing
        order that a distributed batch has no analog for, so ambiguous
        inputs fail loudly instead of merging nondeterministically.
        Returns {'inserted': n, 'updated': m} (S12's bulk counts).

        ``rows_hint``: caller-known upper bound on the incoming row
        count.  At or under ``collect_threshold`` the mutation skips
        the groupby's all-to-all (whose fixed cost dwarfs a small
        merge — a one-row pattern-DB save otherwise pays a full
        shuffle): the input is collected in its single execution,
        split by partition hash, and merged by one raw Ray task per
        touched partition — the same per-partition ``merge`` either
        way, so results are identical (pytest-pinned).  Without a hint
        (or above the threshold) nothing lands on the driver."""
        key_col, root = self.key_col, self.root
        part_path = self._part_path
        self._check_schema(ds.schema().base_schema)

        part_of = self._partition_of

        def add_part(t: pa.Table) -> pa.Table:
            return t.append_column(
                "_part", pa.array(part_of(t[key_col]), pa.int32()))

        def merge(g: pa.Table) -> pa.Table:
            part = int(g["_part"][0].as_py())
            inc = g.drop_columns(["_part"])
            keys = inc[key_col]
            if pc.count_distinct(keys).as_py() != inc.num_rows:
                raise ValueError(
                    f"duplicate keys in upsert batch for partition "
                    f"{part}")
            path = part_path(part)
            updated = 0
            if os.path.exists(path):
                old = pq.read_table(path)
                mask = pc.is_in(old[key_col], value_set=keys)
                updated = pc.sum(mask).as_py() or 0
                keep = old.filter(pc.invert(mask)).cast(inc.schema)
                merged = pa.concat_tables([keep, inc])
            else:
                merged = inc
            merged = merged.sort_by(key_col)
            tmp = path + ".tmp"
            pq.write_table(merged, tmp, row_group_size=4096)
            os.replace(tmp, path)
            return pa.table({
                "inserted": pa.array([inc.num_rows - updated], pa.int64()),
                "updated": pa.array([updated], pa.int64())})

        if rows_hint is not None and rows_hint <= collect_threshold:
            return self._collected_mutation(ds, add_part, merge,
                                            ("inserted", "updated"))

        # materialize: the side-effecting merge must run EXACTLY once —
        # a lazy Dataset would re-execute per .sum() consumption (the
        # counts table is <= num_partitions rows)
        counts = (ds.map_batches(add_part, batch_format="pyarrow")
                  .groupby("_part")
                  .map_groups(merge, batch_format="pyarrow")
                  .materialize())
        return {"inserted": counts.sum("inserted") or 0,
                "updated": counts.sum("updated") or 0}

    def _collected_mutation(self, ds, add_part, merge,
                            count_cols: tuple) -> dict:
        """Small-input mutation path: one execution collects the rows,
        one raw Ray task per touched partition runs the SAME
        partition-local merge the groupby path would (idempotent
        tmp+rename rewrites, so task retries are safe)."""
        import ray

        blocks = [b for b in ray.get(ds.to_arrow_refs()) if b.num_rows]
        if not blocks:
            return {c: 0 for c in count_cols}
        inc = add_part(pa.concat_tables(
            [b.select(blocks[0].column_names) for b in blocks]))
        task = ray.remote(num_cpus=0.5)(merge)
        futs = []
        for part in np.unique(
                inc["_part"].to_numpy(zero_copy_only=False)):
            futs.append(task.remote(
                inc.filter(pc.equal(inc["_part"], int(part)))))
        out = (pa.concat_tables(ray.get(futs)) if futs
               else None)
        return {c: (pc.sum(out[c]).as_py() or 0) if out is not None
                else 0 for c in count_cols}

    def delete(self, keys_ds, rows_hint: int | None = None,
               collect_threshold: int = 65536) -> int:
        """Delete by key; ``keys_ds`` is a Dataset with the key column.
        Only the partitions that can hold the keys rewrite.  Returns the
        number of rows actually deleted.  ``rows_hint``: same planner
        decision as ``upsert`` — a small key set skips the all-to-all
        and rewrites the touched partitions via raw Ray tasks."""
        key_col = self.key_col
        part_path = self._part_path
        part_of = self._partition_of

        def add_part(t: pa.Table) -> pa.Table:
            return pa.table({
                key_col: t[key_col],
                "_part": pa.array(part_of(t[key_col]), pa.int32())})

        def drop_keys(g: pa.Table) -> pa.Table:
            part = int(g["_part"][0].as_py())
            path = part_path(part)
            if not os.path.exists(path):
                return pa.table({"deleted": pa.array([0], pa.int64())})
            old = pq.read_table(path)
            mask = pc.is_in(old[key_col], value_set=g[key_col])
            n = pc.sum(mask).as_py() or 0
            if n:
                tmp = path + ".tmp"
                pq.write_table(old.filter(pc.invert(mask)), tmp,
                               row_group_size=4096)
                os.replace(tmp, path)
            return pa.table({"deleted": pa.array([n], pa.int64())})

        if rows_hint is not None and rows_hint <= collect_threshold:
            return self._collected_mutation(keys_ds, add_part, drop_keys,
                                            ("deleted",))["deleted"]

        counts = (keys_ds.map_batches(add_part, batch_format="pyarrow")
                  .groupby("_part")
                  .map_groups(drop_keys, batch_format="pyarrow")
                  .materialize())  # side effects must run exactly once
        return counts.sum("deleted") or 0

    # -- reads -----------------------------------------------------------
    def get(self, keys: list) -> pa.Table:
        """Point lookup: reads only the partitions the keys hash to,
        with the range+isin row-group pruning filter (partitions are
        key-sorted)."""
        arr = pa.array(keys)
        parts = sorted(set(self._partition_of(arr).tolist()))
        paths = [p for i in parts
                 if os.path.exists(p := self._part_path(i))]
        if not paths:
            return self.schema.empty_table()
        import pyarrow.dataset as pads
        filt = ((pc.field(self.key_col) >= min(keys))
                & (pc.field(self.key_col) <= max(keys))
                & pc.field(self.key_col).isin(keys))
        return pads.dataset(paths).to_table(filter=filt)

    def scan(self, columns: list[str] | None = None):
        """Full-table Dataset (S13 read path); empty table => empty ds."""
        paths = self._existing_parts()
        if not paths:
            return _rd().from_arrow(
                self.schema.empty_table() if columns is None
                else self.schema.empty_table().select(columns))
        return _rd().read_parquet(paths, columns=columns)

    def count(self) -> int:
        return sum(pq.read_metadata(p).num_rows
                   for p in self._existing_parts())
