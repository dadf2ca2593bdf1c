"""Keyed TableStore (S11-S14): partition-local CRUD semantics."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_ray.state.tablestore import TableStore


def _mk(tmp_path, rows, key="k", parts=4):
    schema = pa.schema([("k", pa.int64()), ("v", pa.string())])
    store = TableStore.create(str(tmp_path / "t"), key, schema,
                              num_partitions=parts, drop_existing=True)
    if rows:
        import ray.data as rd
        store.upsert(rd.from_arrow(pa.table({
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "v": pa.array([r[1] for r in rows], pa.string())})))
    return store


def test_create_is_idempotent_and_drop_existing_resets(tmp_path, ray_session):
    store = _mk(tmp_path, [(1, "a")])
    again = TableStore.create(store.root, "k", store.schema)
    assert again.count() == 1  # no drop: data survives
    fresh = TableStore.create(store.root, "k", store.schema,
                              drop_existing=True)
    assert fresh.count() == 0


def test_upsert_counts_and_get(tmp_path, ray_session):
    import ray.data as rd

    store = _mk(tmp_path, [(i, f"v{i}") for i in range(20)])
    assert store.count() == 20
    res = store.upsert(rd.from_arrow(pa.table({
        "k": pa.array([5, 6, 100], pa.int64()),
        "v": pa.array(["V5", "V6", "V100"], pa.string())})))
    assert res == {"inserted": 1, "updated": 2}
    got = store.get([5, 100, 999]).sort_by("k")
    assert got["k"].to_pylist() == [5, 100]
    assert got["v"].to_pylist() == ["V5", "V100"]
    assert store.count() == 21


def test_upsert_rejects_duplicate_keys(tmp_path, ray_session):
    import ray.data as rd

    store = _mk(tmp_path, [])
    dup = rd.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "v": pa.array(["a", "b"], pa.string())}))
    with pytest.raises(Exception, match="duplicate keys"):
        store.upsert(dup)


def test_upsert_rejects_schema_mismatch(tmp_path, ray_session):
    import ray.data as rd

    store = _mk(tmp_path, [])
    bad = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                  "x": pa.array([1.0], pa.float64())}))
    with pytest.raises(ValueError, match="schema"):
        store.upsert(bad)


def test_delete_and_scan(tmp_path, ray_session):
    import ray.data as rd

    store = _mk(tmp_path, [(i, f"v{i}") for i in range(10)])
    n = store.delete(rd.from_arrow(pa.table({
        "k": pa.array([0, 3, 9, 42], pa.int64())})))
    assert n == 3
    assert sorted(store.scan().to_pandas()["k"]) == [1, 2, 4, 5, 6, 7, 8]
    # scanning a column subset prunes at the read
    assert store.scan(columns=["v"]).schema().names == ["v"]


def test_partitions_stay_key_sorted(tmp_path, ray_session):
    store = _mk(tmp_path, [(i, "x") for i in range(50)])
    for i in range(store.num_partitions):
        p = store._part_path(i)
        if os.path.exists(p):
            ks = pq.read_table(p)["k"].to_pylist()
            assert ks == sorted(ks)


def test_string_keys(tmp_path, ray_session):
    import ray.data as rd

    schema = pa.schema([("u", pa.string()), ("n", pa.int64())])
    store = TableStore.create(str(tmp_path / "s"), "u", schema,
                              num_partitions=4, drop_existing=True)
    store.upsert(rd.from_arrow(pa.table({
        "u": pa.array(["a", "b", "c"], pa.string()),
        "n": pa.array([1, 2, 3], pa.int64())})))
    res = store.upsert(rd.from_arrow(pa.table({
        "u": pa.array(["b", "d"], pa.string()),
        "n": pa.array([20, 4], pa.int64())})))
    assert res == {"inserted": 1, "updated": 1}
    got = store.get(["b", "d"]).sort_by("u")
    assert got["n"].to_pylist() == [20, 4]


def test_table_crud_join_path_equivalent(ray_session):
    """broadcast_threshold=0 forces the semi-join update-key path; the
    final table and the bulk counters must match the broadcast path."""
    from crawler_ray.ops.crud import table_crud, table_crud_counts

    sf = "/root/testdata/sf0.001"
    bc = (table_crud(sf).to_pandas()
          .sort_values("c_custkey").reset_index(drop=True))
    jn = (table_crud(sf, broadcast_threshold=0).to_pandas()
          .sort_values("c_custkey").reset_index(drop=True))
    assert bc.equals(jn)
    assert (table_crud_counts(sf).to_pylist()
            == table_crud_counts(sf, broadcast_threshold=0).to_pylist())


@pytest.mark.parametrize("hinted", [False, True],
                         ids=["groupby-path", "collect-path"])
def test_random_crud_matches_dict_model(tmp_path, ray_session, hinted):
    """Model-based check: a random interleaving of upserts, deletes and
    point gets must track a plain dict exactly — contents, insert/update
    counts, delete counts, and get results.  Runs once per mutation
    path (``rows_hint`` routes small inputs through raw per-partition
    tasks instead of the groupby shuffle); both must match the model —
    and therefore each other — exactly."""
    import random

    import ray.data as rd

    rng = random.Random(2024)
    schema = pa.schema([("k", pa.int64()), ("v", pa.string())])
    store = TableStore.create(str(tmp_path / "model"), "k", schema,
                              num_partitions=4, drop_existing=True)
    model: dict[int, str] = {}
    keyspace = list(range(40))

    for step in range(12):
        op = rng.choice(["upsert", "delete", "get"])
        if op == "upsert":
            keys = rng.sample(keyspace, rng.randint(1, 12))
            vals = [f"s{step}-{k}" for k in keys]
            counts = store.upsert(rd.from_arrow(pa.table({
                "k": pa.array(keys, pa.int64()),
                "v": pa.array(vals, pa.string())})),
                rows_hint=len(keys) if hinted else None)
            want_updated = sum(k in model for k in keys)
            assert counts == {"inserted": len(keys) - want_updated,
                              "updated": want_updated}, step
            model.update(zip(keys, vals))
        elif op == "delete":
            keys = rng.sample(keyspace, rng.randint(1, 10))
            n = store.delete(rd.from_arrow(pa.table({
                "k": pa.array(keys, pa.int64())})),
                rows_hint=len(keys) if hinted else None)
            want = sum(k in model for k in keys)
            assert n == want, step
            for k in keys:
                model.pop(k, None)
        else:
            keys = rng.sample(keyspace, rng.randint(1, 15))
            got = store.get(keys)
            want_rows = sorted((k, model[k]) for k in keys if k in model)
            got_rows = sorted(zip(got["k"].to_pylist(),
                                  got["v"].to_pylist()))
            assert got_rows == want_rows, step
        # full-state check every step: scan == model, count == len
        scanned = sorted(
            (r["k"], r["v"]) for r in store.scan().take_all())
        assert scanned == sorted(model.items()), step
        assert store.count() == len(model), step
