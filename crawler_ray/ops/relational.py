"""Relational parity operators over the TPC-H-ish test tables.

Each function mirrors an operator family from SURVEY.md §2 (stats
aggregations A1-A2, top-k O5-O6, filters M25/S13, broadcast and multi-way
joins J4/J6, windowed/streaming shapes §2.9) expressed Ray-Data-first:
columns pruned at the read, per-batch partial aggregation before the
shuffle where it pays, broadcast small sides instead of shuffle joins.

Cross-engine exactness: every *computed* numeric output is integerized
per row with ``floor(x * scale)`` before summing.  The per-row double
product is IEEE-identical in numpy and DuckDB, floor is exact, and int64
sums are order-independent — so the driver's value-hash comparison against
the oracle SQL is bit-exact.  Raw column pass-throughs (no arithmetic)
are safe as-is.  Column names match ``__ray_entry__.oracle_sql`` exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "pricing_summary", "top_parts", "orders_filter", "events_by_type",
    "brand_revenue", "region_customers", "events_tumbling_window",
    "sessionize", "customers_no_orders", "user_top_events",
    "clicks_asof_views", "error_recent_activity",
    "domain_content_links", "expert_domain_links",
]


def _rd():
    import ray.data as rd
    return rd


def _cents(x: pd.Series) -> pd.Series:
    return np.floor(x * 100).astype("int64")


def pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped stats rollup (reference stats parity A1/A2:
    per-type counters, ``core/storage.py:366-374``).  Pre-aggregates per
    batch (combiner) so the groupby shuffles one row per (flag, status)
    per batch instead of every lineitem row."""
    from ray.data.aggregate import Sum

    ds = _rd().read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native combiner: the same IEEE double ops as the pandas
        # original (multiply, then floor), so int64 partials stay
        # bit-identical to the DuckDB twin.
        price = batch["l_extendedprice"]
        disc_mult = pc.subtract(pa.scalar(1.0), batch["l_discount"])
        pre = pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "qty_i": pc.cast(pc.floor(batch["l_quantity"]), pa.int64()),
            "base_cents": pc.cast(
                pc.floor(pc.multiply(price, pa.scalar(100.0))),
                pa.int64()),
            "disc_cents": pc.cast(
                pc.floor(pc.multiply(pc.multiply(price, disc_mult),
                                     pa.scalar(100.0))),
                pa.int64())})
        g = pre.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_i", "sum"), ("base_cents", "sum"),
             ("disc_cents", "sum"), ("qty_i", "count")])
        ren = {"qty_i_sum": "sum_qty", "base_cents_sum": "sum_base_cents",
               "disc_cents_sum": "sum_disc_cents",
               "qty_i_count": "count_order"}
        return g.rename_columns([ren.get(c, c) for c in g.column_names])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)
    out = (partials.groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                      Sum("sum_base_cents", alias_name="sum_base_cents"),
                      Sum("sum_disc_cents", alias_name="sum_disc_cents"),
                      Sum("count_order", alias_name="count_order")))

    def finish(batch: pa.Table) -> pa.Table:
        avg_milli = pc.divide(pc.multiply(batch["sum_qty"], 1000),
                              batch["count_order"])
        return batch.append_column("avg_qty_milli",
                                   pc.cast(avg_milli, pa.int64()))

    return out.map_batches(finish, batch_format="pyarrow")


def top_parts(sf_dir: str, k: int = 10):
    """Top-k by price (O5/O6 sort+limit parity).  Raw column values pass
    through untouched, so doubles hash-match the oracle."""
    ds = _rd().read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_name", "p_retailprice"])
    return ds.sort(["p_retailprice", "p_partkey"],
                   descending=[True, False]).limit(k)


def orders_filter(sf_dir: str):
    """Predicate + projection (admission-filter shape M25; CRUD filters
    S13).  Vectorized Arrow filter inside map_batches, never row Python."""
    ds = _rd().read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice",
                 "o_orderstatus"])

    def flt(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(t["o_orderstatus"], "O"),
                       pc.greater(t["o_totalprice"], 100_000.0))
        return t.filter(mask).drop_columns(["o_orderstatus"])

    return ds.map_batches(flt, batch_format="pyarrow")


def events_by_type(sf_dir: str, k: int = 5):
    """groupby-count + top-k (section-frequency parity A6,
    ``core/structure_discovery.py:530-547``)."""
    from ray.data.aggregate import Count, Sum

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        milli = pc.cast(pc.floor(pc.multiply(t["value"], 1000.0)),
                        pa.int64())
        return t.drop_columns(["value"]).append_column("value_milli", milli)

    ds = ds.map_batches(prep, batch_format="pyarrow")
    out = (ds.groupby("event_type")
           .aggregate(Count(alias_name="n_events"),
                      Sum("value_milli", alias_name="sum_value_milli")))
    return out.sort(["n_events", "event_type"],
                    descending=[True, False]).limit(k)


def brand_revenue(sf_dir: str):
    """Broadcast join (J4 small-side pattern): the part table rides
    ``ray.put`` once as (sorted keys, brand codes) numpy arrays —
    zero-copy from the object store, unlike a pickled DataFrame — and
    is fetched in the actor's ``__init__``; lineitem batches resolve
    brands with one vectorized searchsorted, no shuffle of the big
    side.  Misses are dropped (inner join), matching the pandas-merge
    original."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    enc = part["p_brand"].combine_chunks().dictionary_encode()
    brand_names = [str(v) for v in enc.dictionary.to_pylist()]
    keys = np.asarray(part["p_partkey"].to_numpy(zero_copy_only=False),
                      np.int64)
    codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False),
                       np.int32)
    srt = np.argsort(keys, kind="stable")
    part_ref = ray.put((keys[srt], codes[srt]))

    ds = _rd().read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"])

    class JoinRevenue:
        def __init__(self):
            self.keys, self.codes = ray.get(part_ref)
            self.brands = pa.array(brand_names, pa.string())

        def __call__(self, batch: pa.Table) -> pa.Table:
            price = batch["l_extendedprice"]
            mult = pc.subtract(pa.scalar(1.0), batch["l_discount"])
            cents = pc.cast(
                pc.floor(pc.multiply(pc.multiply(price, mult),
                                     pa.scalar(100.0))),
                pa.int64()).to_numpy(zero_copy_only=False)
            k = np.asarray(batch["l_partkey"].to_numpy(
                zero_copy_only=False), np.int64)
            if len(self.keys) == 0 or len(k) == 0:
                hit = np.zeros(len(k), bool)
                code = np.empty(0, np.int32)
            else:
                pos = np.searchsorted(self.keys, k)
                safe = np.minimum(pos, len(self.keys) - 1)
                hit = self.keys[safe] == k
                code = self.codes[safe[hit]]
            nb = len(brand_names)
            sums = np.zeros(nb, np.int64)
            cnts = np.zeros(nb, np.int64)
            np.add.at(sums, code, cents[hit])
            np.add.at(cnts, code, 1)
            nz = np.flatnonzero(cnts)
            return pa.table({
                "p_brand": self.brands.take(pa.array(nz, pa.int32())),
                "revenue_cents": pa.array(sums[nz], pa.int64()),
                "n_items": pa.array(cnts[nz], pa.int64())})

    partials = ds.map_batches(JoinRevenue, batch_format="pyarrow",
                              batch_size=65536, concurrency=2)
    return (partials.groupby("p_brand")
            .aggregate(Sum("revenue_cents", alias_name="revenue_cents"),
                       Sum("n_items", alias_name="n_items")))


def region_customers(sf_dir: str):
    """Multi-way dimension join (J6 link-table shape): nation+region are
    tiny — the driver merges them once, then broadcasts (sorted nation
    keys, region codes) numpy arrays; customer batches resolve the
    region with one vectorized searchsorted and pre-aggregate per batch
    (inner-join semantics: customers with an unknown nation drop, same
    as the pandas-merge original)."""
    import ray
    from ray.data.aggregate import Sum

    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    region = pd.read_parquet(f"{sf_dir}/region.parquet")
    dim = nation.merge(region, left_on="n_regionkey",
                       right_on="r_regionkey")[["n_nationkey", "r_name"]]
    r_names = sorted(dim["r_name"].unique())
    r_code = {n: i for i, n in enumerate(r_names)}
    n_keys = dim["n_nationkey"].to_numpy(np.int64)
    n_codes = dim["r_name"].map(r_code).to_numpy(np.int32)
    srt = np.argsort(n_keys, kind="stable")
    dim_ref = ray.put((n_keys[srt], n_codes[srt]))
    region_arr = pa.array(r_names, pa.string())

    ds = _rd().read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_nationkey", "c_acctbal"])

    def join(batch: pa.Table) -> pa.Table:
        keys, codes = ray.get(dim_ref)
        cents = pc.cast(
            pc.floor(pc.multiply(batch["c_acctbal"], pa.scalar(100.0))),
            pa.int64()).to_numpy(zero_copy_only=False)
        k = np.asarray(batch["c_nationkey"].to_numpy(
            zero_copy_only=False), np.int64)
        if len(keys) == 0 or len(k) == 0:
            hit = np.zeros(len(k), bool)
            code = np.empty(0, np.int32)
        else:
            pos = np.searchsorted(keys, k)
            safe = np.minimum(pos, len(keys) - 1)
            hit = keys[safe] == k
            code = codes[safe[hit]]
        nr = len(r_names)
        sums = np.zeros(nr, np.int64)
        cnts = np.zeros(nr, np.int64)
        np.add.at(sums, code, cents[hit])
        np.add.at(cnts, code, 1)
        nz = np.flatnonzero(cnts)
        return pa.table({
            "r_name": region_arr.take(pa.array(nz, pa.int32())),
            "n_customers": pa.array(cnts[nz], pa.int64()),
            "sum_acctbal_cents": pa.array(sums[nz], pa.int64())})

    partials = ds.map_batches(join, batch_format="pyarrow")
    return (partials.groupby("r_name")
            .aggregate(Sum("n_customers", alias_name="n_customers"),
                       Sum("sum_acctbal_cents",
                           alias_name="sum_acctbal_cents")))


def events_tumbling_window(sf_dir: str, window_minutes: int = 60):
    """Tumbling event-time window per event_type (streaming-shape parity,
    SURVEY §2.9): window = floor(epoch/size)*size; groupby(type, window).
    Ray Data has no watermarks — the input is a bounded event log, which
    is exactly the reference's replay situation."""
    from ray.data.aggregate import Count, Sum

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type", "value"])
    w_us = window_minutes * 60 * 1_000_000

    def add_window(t: pa.Table) -> pa.Table:
        epoch_us = pc.cast(t["ts"], pa.int64())
        win = pc.multiply(pc.divide(epoch_us, w_us), w_us)
        milli = pc.cast(pc.floor(pc.multiply(t["value"], 1000.0)),
                        pa.int64())
        return (t.drop_columns(["ts", "value"])
                .append_column("window_start", pc.cast(win, pa.int64()))
                .append_column("value_milli", milli))

    ds = ds.map_batches(add_window, batch_format="pyarrow")
    return (ds.groupby(["event_type", "window_start"])
            .aggregate(Count(alias_name="n_events"),
                       Sum("value_milli", alias_name="sum_value_milli")))


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user (gap-based, SURVEY §2.9): partition by
    user, sort by ts within the group, close a session after a 30-min
    silence.  ``groupby(user).map_groups`` with pandas — the documented
    ordering assumption is ts order within each user partition."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        g["value_milli"] = np.floor(g["value"] * 1000).astype("int64")
        session_id = (g["ts"].diff() > gap).cumsum()
        agg = (g.groupby(session_id)
               .agg(session_start=("ts", "min"), n_events=("ts", "size"),
                    sum_value_milli=("value_milli", "sum")))
        agg["user_id"] = g["user_id"].iloc[0]
        return agg.reset_index(drop=True)

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas")

    def to_epoch(t: pa.Table) -> pa.Table:
        sec = pc.cast(t["session_start"], pa.int64())
        return (t.drop_columns(["session_start"])
                .append_column("session_start_us", sec))

    return out.map_batches(to_epoch, batch_format="pyarrow")


def customers_no_orders(sf_dir: str, min_total: float = 250_000.0):
    """Anti-join (J1/J2 shape: membership filter against a seen-set —
    the relational twin of the URL-seen admission filter,
    ``core/crawler.py:705,866-867``): customers with no order above
    ``min_total``.  The distinct qualifying customer keys are collected
    once and broadcast via ``ray.put``; each customer batch filters with
    a vectorized ``is_in``.  At 10^10-key scale this flips to the sharded
    seen-filter actors (``state/url_seen.py``) or a hash-partitioned
    shuffle anti-join — the broadcast is right whenever the distinct key
    set fits a worker heap."""
    import ray

    orders = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_totalprice"])
    keys = (orders.map_batches(
                lambda t: t.filter(
                    pc.greater(t["o_totalprice"], min_total))
                .select(["o_custkey"]),
                batch_format="pyarrow")
            .unique("o_custkey"))
    key_ref = ray.put(pa.array(sorted(keys), pa.int64()))

    ds = _rd().read_parquet(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_name", "c_acctbal"])

    def anti(t: pa.Table) -> pa.Table:
        seen = ray.get(key_ref)
        mask = pc.invert(pc.is_in(t["c_custkey"], value_set=seen))
        return t.filter(mask)

    return ds.map_batches(anti, batch_format="pyarrow")


def user_top_events(sf_dir: str, k: int = 3):
    """Top-k per group (O1/O5 ordering parity as a windowed rank): the
    k highest-value events per user, rank ties broken by event_id.
    Per-batch partial top-k per user first, so the groupby shuffles at
    most k rows per (user, batch) instead of the full event log."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        # numpy lexsort combiner (user asc, value desc, event_id asc),
        # then keep rank < k within each user run — no pandas round-trip.
        if t.num_rows == 0:
            return t
        uid = np.asarray(t["user_id"].to_numpy(zero_copy_only=False),
                         np.int64)
        eid = np.asarray(t["event_id"].to_numpy(zero_copy_only=False),
                         np.int64)
        val = t["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, -val, uid))
        u = uid[order]
        new_run = np.r_[True, u[1:] != u[:-1]]
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        rank = np.arange(len(u)) - starts[run_id]
        return t.take(pa.array(order[rank < k], pa.int64()))

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values(["value", "event_id"],
                           ascending=[False, True], kind="mergesort")
             .head(k).reset_index(drop=True))
        out = pd.DataFrame({
            "user_id": g["user_id"].astype("int64"),
            "event_id": g["event_id"].astype("int64"),
            "value_milli": np.floor(g["value"] * 1000).astype("int64"),
            "rank": np.arange(1, len(g) + 1, dtype="int64"),
        })
        return out

    return partials.groupby("user_id").map_groups(final,
                                                  batch_format="pandas")


def clicks_asof_views(sf_dir: str):
    """As-of join (custom operator the Dataset API lacks, built per
    SURVEY §2's composition rule: groupby(user) + in-group sort +
    merge_asof): each 'click' event joined to the most recent 'view' by
    the same user at or before the click.  Views are deduped per (user,
    ts) keeping the min event_id so tie-breaks are engine-independent;
    clicks with no prior view are dropped (inner as-of).  Partitioning
    assumption: all events of one user fit one group — per-user event
    counts are bounded; a mega-user would need time-range sub-splits
    carrying boundary views forward."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "event_type"])

    def pre(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["event_type"],
                        value_set=pa.array(["click", "view"]))
        return t.filter(mask)

    ds = ds.map_batches(pre, batch_format="pyarrow")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        clicks = g[g["event_type"] == "click"]
        views = g[g["event_type"] == "view"]
        empty = pd.DataFrame({
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "click_ts_us": pd.Series([], dtype="int64"),
            "view_event_id": pd.Series([], dtype="int64"),
            "view_ts_us": pd.Series([], dtype="int64")})
        if clicks.empty or views.empty:
            return empty
        views = (views.sort_values(["ts", "event_id"], kind="mergesort")
                 .drop_duplicates("ts", keep="first"))
        clicks = clicks.sort_values(["ts", "event_id"], kind="mergesort")
        j = pd.merge_asof(
            clicks[["event_id", "user_id", "ts"]],
            views[["ts", "event_id"]].rename(
                columns={"event_id": "view_event_id"}),
            on="ts", direction="backward", suffixes=("", "_view"))
        # merge_asof keeps the click ts; recover the matched view ts.
        # Map to int64 epoch-us scalars (datetime64[us] -> int64), not
        # Timestamp objects — object Timestamps astype to nanoseconds.
        vmap = dict(zip(views["event_id"],
                        views["ts"].astype("int64")))
        j = j.dropna(subset=["view_event_id"])
        if j.empty:
            return empty
        return pd.DataFrame({
            "event_id": j["event_id"].astype("int64"),
            "user_id": j["user_id"].astype("int64"),
            "click_ts_us": j["ts"].astype("int64"),
            "view_event_id": j["view_event_id"].astype("int64"),
            "view_ts_us": j["view_event_id"].map(vmap).astype("int64"),
        })

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pandas")


def error_recent_activity(sf_dir: str, window_minutes: int = 5):
    """Range (interval) join — the other custom-operator shape the
    Dataset API lacks (SURVEY §2 composition rule): for each 'error'
    event, how many events the same user produced in the strictly
    preceding ``window_minutes``.  Per user: one sort + vectorized
    ``searchsorted`` over the interval bounds — no pairwise expansion,
    so a user with E events and K errors costs O((E+K) log E), not
    O(E*K).  Partitioning assumption: one user's events fit one group
    (same as the as-of join above)."""
    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts",
                                     "event_type"])
    w_us = window_minutes * 60 * 1_000_000

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts"].astype("int64").to_numpy())
        err = g[g["event_type"] == "error"]
        if err.empty:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "error_ts_us": pd.Series([], dtype="int64"),
                "n_recent": pd.Series([], dtype="int64")})
        e_ts = err["ts"].astype("int64").to_numpy()
        right = np.searchsorted(ts, e_ts, side="left")       # < e.ts
        left = np.searchsorted(ts, e_ts - w_us, side="left")  # >= e.ts-w
        return pd.DataFrame({
            "event_id": err["event_id"].astype("int64").to_numpy(),
            "user_id": err["user_id"].astype("int64").to_numpy(),
            "error_ts_us": e_ts,
            "n_recent": (right - left).astype("int64")})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pandas")


def domain_content_links(sf_dir: str):
    """The reference's scored content<->domain M2M link table
    (``database/schema.py:79-90`` ``domain_content``;
    ``core/storage.py:213-240`` creates one row per (content, domain)
    with a relevance score).  Re-expressed over the documents table:
    domain = the keyword-argmax class (same tie-break as classify_docs),
    relevance_milli = winning-count share of all keyword hits (pure
    integer arithmetic so the DuckDB twin hash-matches); docs with no
    keyword hits have no domain rows, exactly like the reference's
    store path when the classifier returns no domains.
    Output: (content_id, domain, relevance_milli)."""
    from crawler_ray.ops.textstats import _CLASS_SETS, _WORD_RE

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    names = list(_CLASS_SETS)

    def link(t: pa.Table) -> pa.Table:
        toks = [_WORD_RE.findall(s.lower())
                for s in t["text"].to_pylist()]
        counts = np.array(
            [[sum(1 for w in ws if w in _CLASS_SETS[n]) for n in names]
             for ws in toks], dtype=np.int64).reshape(len(toks),
                                                      len(names))
        total = counts.sum(axis=1)
        keep = total > 0
        best = counts.argmax(axis=1)  # first max wins = dict order
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[keep]
        bc = counts[keep, best[keep]]
        return pa.table({
            "content_id": pa.array(ids, pa.int64()),
            "domain": pa.array([names[b] for b in best[keep]],
                               pa.string()),
            "relevance_milli": pa.array(bc * 1000 // total[keep],
                                        pa.int64())})

    return ds.map_batches(link, batch_format="pyarrow")


def expert_domain_links(sf_dir: str, join_partitions: int | None = None,
                        broadcast_threshold: int = 1_000_000):
    """The reference's scored expert<->domain M2M link table
    (``database/schema.py:92-102`` ``expert_domain``: confidence per
    (expert, domain)).  Experts/answers are derived deterministically
    from the relational tables (experts = customers, answers = orders,
    answered content = o_orderkey mod #documents) so a DuckDB twin can
    replay it; per-domain confidence = the expert's answer share in that
    domain (integer milli).

    Plan shape, by the usual planner decision: the per-doc domain map
    and the per-expert totals are each BROADCAST (id-sorted numpy +
    int8 domain codes — zero-copy from the object store) when their
    row counts are at or under ``broadcast_threshold``, resolved with
    one vectorized searchsorted per batch; above it they become
    doc_id- / expert_id-keyed hash ``Dataset.join``s so neither table
    ever lands on the driver.  ``broadcast_threshold=0`` forces the
    join path (pytest pins the two identical).
    Output: (expert_id, domain, n_answers, confidence_milli)."""
    import pyarrow.dataset as pads
    import ray
    from ray.data.aggregate import Count, Sum

    from crawler_ray.ops.dedup import _join_partitions, _join_ready

    n_docs = pads.dataset(f"{sf_dir}/documents.parquet",
                          format="parquet").count_rows()
    n_orders = pads.dataset(f"{sf_dir}/orders.parquet",
                            format="parquet").count_rows()
    classed = domain_content_links(sf_dir).select_columns(
        ["content_id", "domain"])

    orders = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])

    def to_answers(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "expert_id": t["o_custkey"].cast(pa.int64()),
            "content_id": pa.array(keys % n_docs, pa.int64())})

    answers = orders.map_batches(to_answers, batch_format="pyarrow")

    if n_docs <= broadcast_threshold:
        blocks = [b for b in ray.get(classed.to_arrow_refs())
                  if b.num_rows]
        ct = (pa.concat_tables(blocks) if blocks
              else pa.table({"content_id": pa.array([], pa.int64()),
                             "domain": pa.array([], pa.string())}))
        enc = ct["domain"].combine_chunks().dictionary_encode()
        names = [str(v) for v in enc.dictionary.to_pylist()]
        ids = np.asarray(ct["content_id"].to_numpy(
            zero_copy_only=False), np.int64)
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False),
                           np.int32)
        srt = np.argsort(ids, kind="stable")
        dom_ref = ray.put((ids[srt], codes[srt]))

        def attach_domain(t: pa.Table) -> pa.Table:
            d_ids, d_codes = ray.get(dom_ref)
            k = np.asarray(t["content_id"].to_numpy(
                zero_copy_only=False), np.int64)
            if len(d_ids) == 0:
                hit = np.zeros(len(k), bool)
                dom = np.empty(0, np.int32)
            else:
                pos = np.searchsorted(d_ids, k)
                safe = np.minimum(pos, len(d_ids) - 1)
                hit = d_ids[safe] == k  # miss = doc without domain rows
                dom = d_codes[safe[hit]]
            return pa.table({
                "expert_id": t["expert_id"].filter(pa.array(hit)),
                "domain": pa.array(names, pa.string()).take(
                    pa.array(dom, pa.int32()))})

        ad = answers.map_batches(attach_domain, batch_format="pyarrow")
    else:
        # partitions sized to the bigger join side (answers = orders
        # rows, known for free from parquet metadata)
        jp = _join_partitions(join_partitions, approx_rows=n_orders)
        ad = answers.join(classed, "inner", num_partitions=jp,
                          on=("content_id",))

    gc = _join_ready(
        ad.groupby(["expert_id", "domain"])
        .aggregate(Count(alias_name="n_answers")),
        pa.schema([("expert_id", pa.int64()), ("domain", pa.string()),
                   ("n_answers", pa.int64())]))
    out_schema = pa.schema(
        [("expert_id", pa.int64()), ("domain", pa.string()),
         ("n_answers", pa.int64()), ("confidence_milli", pa.int64())])
    n_gc = gc.count()  # cheap: _join_ready materialized the aggregate
    if n_gc == 0:
        return _rd().from_arrow(out_schema.empty_table())

    if n_gc <= broadcast_threshold:
        gblocks = [b for b in ray.get(gc.to_arrow_refs()) if b.num_rows]
        gt = pa.concat_tables(gblocks)
        e_ids = np.asarray(gt["expert_id"].to_numpy(
            zero_copy_only=False), np.int64)
        n_ans = np.asarray(gt["n_answers"].to_numpy(
            zero_copy_only=False), np.int64)
        uniq, inv = np.unique(e_ids, return_inverse=True)
        totals = np.zeros(len(uniq), np.int64)
        np.add.at(totals, inv, n_ans)
        tot_ref = ray.put((uniq, totals))

        def score_bcast(t: pa.Table) -> pa.Table:
            t_ids, t_tot = ray.get(tot_ref)
            from crawler_ray.ops.dedup import _sorted_lookup
            k = np.asarray(t["expert_id"].to_numpy(
                zero_copy_only=False), np.int64)
            total = t_tot[_sorted_lookup(t_ids, k)]
            n = t["n_answers"].to_numpy(zero_copy_only=False)
            return pa.table({
                "expert_id": t["expert_id"], "domain": t["domain"],
                "n_answers": t["n_answers"],
                "confidence_milli": pa.array(n * 1000 // total,
                                             pa.int64())})

        return gc.map_batches(score_bcast, batch_format="pyarrow")

    tot = _join_ready(
        gc.groupby("expert_id").aggregate(
            Sum("n_answers", alias_name="total")),
        pa.schema([("expert_id", pa.int64()),
                   ("total", pa.int64())]))
    joined = gc.join(tot, "inner",
                     num_partitions=_join_partitions(join_partitions,
                                                     approx_rows=n_gc),
                     on=("expert_id",))

    def score(t: pa.Table) -> pa.Table:
        n = t["n_answers"].to_numpy(zero_copy_only=False)
        total = t["total"].to_numpy(zero_copy_only=False)
        return pa.table({
            "expert_id": t["expert_id"], "domain": t["domain"],
            "n_answers": t["n_answers"],
            "confidence_milli": pa.array(n * 1000 // total, pa.int64())})

    return joined.map_batches(score, batch_format="pyarrow")
