"""Expert / answer / link-table entity surface over crawled content
items — the reference's remaining schema tables
(``database/schema.py:48-77`` experts + answers,
``database/schema.py:79-102`` domain_content + expert_domain;
``core/storage.py:213-240`` creates domain_content rows with a default
relevance of 0.8 when content is stored).

The reference keys entities by MySQL autoincrement ids; a distributed
engine has no global counter, so entities are keyed by their natural
keys instead: experts by author name (the profile page's extracted
author, M10), answers and content by url.  All tables derive from the
finalized ``content_items`` parquet in one or two streaming passes:

- ``experts``: profile-type items grouped by author (profile_url = the
  lexicographically first profile url, mirroring first-wins upserts),
  left-joined with per-author answer counts (the reference's
  ``answers_count`` column).
- ``answers``: answer-type items with a non-empty author ->
  (url, expert_name, similarity_hash).
- ``domain_content``: one row per (content url, classified domain) with
  ``relevance_milli = 800`` (the reference's 0.8 default).
- ``expert_domain``: per (expert, domain) answer counts with
  ``confidence_milli`` = the expert's answer share in that domain
  (aggregate -> per-expert total -> join back, same shape as
  ``ops/relational.py:expert_domain_links``).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["experts_table", "answers_table", "domain_content_table",
           "expert_domain_table"]


def _rd():
    import ray.data as rd
    return rd


def _nonempty_author(t: pa.Table, content_type: str) -> pa.Table:
    keep = pc.and_(pc.equal(t["content_type"], content_type),
                   pc.and_(pc.is_valid(t["author"]),
                           pc.not_equal(t["author"], "")))
    return t.filter(keep)


def answers_table(items_path: str):
    """(url, expert_name, similarity_hash) for answer-type items."""
    ds = _rd().read_parquet(items_path,
                            columns=["url", "author", "content_type",
                                     "similarity_hash"])

    def pick(t: pa.Table) -> pa.Table:
        t = _nonempty_author(t, "answer")
        return pa.table({"url": t["url"],
                         "expert_name": t["author"],
                         "similarity_hash": t["similarity_hash"]})

    return ds.map_batches(pick, batch_format="pyarrow")


def experts_table(items_path: str, join_partitions: int | None = None):
    """(name, profile_url, n_profiles, answers_count) per expert."""
    from ray.data.aggregate import Count, Min

    from crawler_ray.ops.dedup import _join_partitions, _join_ready

    ds = _rd().read_parquet(items_path,
                            columns=["url", "author", "content_type"])

    def profiles(t: pa.Table) -> pa.Table:
        t = _nonempty_author(t, "profile")
        return pa.table({"name": t["author"], "url": t["url"]})

    prof = _join_ready(
        ds.map_batches(profiles, batch_format="pyarrow")
        .groupby("name")
        .aggregate(Min("url", alias_name="profile_url"),
                   Count(alias_name="n_profiles")),
        pa.schema([("name", pa.string()), ("profile_url", pa.string()),
                   ("n_profiles", pa.int64())]))
    counts = _join_ready(
        answers_table(items_path)
        .groupby("expert_name")
        .aggregate(Count(alias_name="answers_count")),
        pa.schema([("expert_name", pa.string()),
                   ("answers_count", pa.int64())]))
    # Dataset.join cannot handle an EMPTY side (the hash shuffle sends
    # no shards for empty blocks, and the aggregator then joins against
    # a schema-less table) — when one side has no rows the join result
    # is known anyway, so short-circuit it
    n_prof = prof.count()  # cheap: _join_ready materialized both sides
    if n_prof == 0:
        return _rd().from_arrow(pa.schema(
            [("name", pa.string()), ("profile_url", pa.string()),
             ("n_profiles", pa.int64()),
             ("answers_count", pa.int64())]).empty_table())
    if counts.count() == 0:
        joined = prof
    else:
        joined = prof.join(
            counts, "left_outer",
            num_partitions=_join_partitions(join_partitions,
                                            approx_rows=n_prof),
            on=("name",), right_on=("expert_name",))

    def fill(t: pa.Table) -> pa.Table:
        if "answers_count" in t.column_names:
            ac = pc.fill_null(t["answers_count"], 0).cast(pa.int64())
        else:
            ac = pa.array(np.zeros(t.num_rows, dtype=np.int64))
        return pa.table({"name": t["name"],
                         "profile_url": t["profile_url"],
                         "n_profiles": t["n_profiles"],
                         "answers_count": ac})

    return joined.map_batches(fill, batch_format="pyarrow")


def domain_content_table(items_path: str, relevance_milli: int = 800):
    """(url, domain, relevance_milli) — one row per classified domain of
    each stored content item (``core/storage.py:230-235``: default
    relevance 0.8 per created relationship)."""
    ds = _rd().read_parquet(items_path,
                            columns=["url", "domains_json"])

    def explode(t: pa.Table) -> pa.Table:
        urls, domains = [], []
        for url, dj in zip(t["url"].to_pylist(),
                           t["domains_json"].to_pylist()):
            for d in json.loads(dj or "[]"):
                urls.append(url)
                domains.append(d)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "domain": pa.array(domains, pa.string()),
            "relevance_milli": pa.array(
                np.full(len(urls), relevance_milli, dtype=np.int64))})

    return ds.map_batches(explode, batch_format="pyarrow")


def expert_domain_table(items_path: str,
                        join_partitions: int | None = None):
    """(expert_name, domain, n_answers, confidence_milli): per-expert
    domain shares over their answers' classified domains."""
    from ray.data.aggregate import Count, Sum

    from crawler_ray.ops.dedup import _join_partitions, _join_ready

    ds = _rd().read_parquet(items_path,
                            columns=["author", "content_type",
                                     "domains_json"])

    def explode(t: pa.Table) -> pa.Table:
        t = _nonempty_author(t, "answer")
        names, domains = [], []
        for name, dj in zip(t["author"].to_pylist(),
                            t["domains_json"].to_pylist()):
            for d in json.loads(dj or "[]"):
                names.append(name)
                domains.append(d)
        return pa.table({"expert_name": pa.array(names, pa.string()),
                         "domain": pa.array(domains, pa.string())})

    gc = _join_ready(
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["expert_name", "domain"])
        .aggregate(Count(alias_name="n_answers")),
        pa.schema([("expert_name", pa.string()),
                   ("domain", pa.string()),
                   ("n_answers", pa.int64())]))
    tot = _join_ready(
        gc.groupby("expert_name").aggregate(
            Sum("n_answers", alias_name="total")),
        pa.schema([("expert_name", pa.string()),
                   ("total", pa.int64())]))
    out_schema = pa.schema(
        [("expert_name", pa.string()), ("domain", pa.string()),
         ("n_answers", pa.int64()), ("confidence_milli", pa.int64())])
    n_gc = gc.count()  # cheap: _join_ready materialized the aggregate
    if n_gc == 0:
        return _rd().from_arrow(out_schema.empty_table())
    joined = gc.join(tot, "inner",
                     num_partitions=_join_partitions(join_partitions,
                                                     approx_rows=n_gc),
                     on=("expert_name",))

    def score(t: pa.Table) -> pa.Table:
        n = t["n_answers"].to_numpy(zero_copy_only=False)
        total = t["total"].to_numpy(zero_copy_only=False)
        return pa.table({
            "expert_name": t["expert_name"], "domain": t["domain"],
            "n_answers": t["n_answers"],
            "confidence_milli": pa.array(n * 1000 // total, pa.int64())})

    return joined.map_batches(score, batch_format="pyarrow")
