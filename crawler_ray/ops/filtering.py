"""Corpus-level filtering / sampling passes for training-data pipelines —
the selection layer that sits between the per-doc scans (``textstats``)
and the pair-building dedup family (``dedup``):

- ``line_dedup``        — CCNet-style corpus-wide duplicated-line removal
- ``quality_filter``    — Gopher-style composite quality gate
- ``source_quota``      — per-source document cap (first-K by doc_id)
- ``stratified_sample`` — deterministic per-language hash sampling
- ``incremental_dedup`` — delta dedup of an incoming shard vs the corpus
- ``normalize_text``    — NFC + whitespace canonicalization
- ``shuffle_corpus``    — deterministic global shuffle with exact ranks
- ``length_percentiles``— exact corpus length percentiles via histogram
- ``curate_pipeline``   — the fused line_dedup -> normalize -> quality
  -> exact-dedup -> split chain as one plan
- ``span_dedup``        — duplicated-span detection (exact-substring
  dedup at token granularity, Lee et al. 2022)

Every operator is a streaming Ray Data plan over the documents table and
has a DuckDB twin in ``__ray_entry__.oracle_sql`` (rows+schema+hash
checked by the driver at sf0.01).  The reference crawler has no corpus
curation at all — these exist for the 100-TB training-data bar; the doc
conventions (milli-scaled integer ratios, single token definition,
broadcast-vs-join planner decisions) follow ``ops/textstats.py`` /
``ops/dedup.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["line_dedup", "quality_filter", "source_quota",
           "stratified_sample", "incremental_dedup", "normalize_text",
           "shuffle_corpus", "length_percentiles", "curate_pipeline",
           "span_dedup"]


def _rd():
    import ray.data as rd
    return rd


# the hash-range exchange lives in ops/exchange.py (shared with
# textstats); see its module docstring for the measured sort-aggregate
# vs exchange comparison that motivated it
from crawler_ray.ops.exchange import (  # noqa: E402
    exchange_common_keys as _exchange_common_keys)


# ---------------------------------------------------------------------------
# line-level dedup (CCNet-style)
# ---------------------------------------------------------------------------

# per-worker cache of the broadcast common-line hash array, keyed by the
# ObjectRef hex (same pattern as textstats._VERDICT_IDX_CACHE)
_COMMON_CACHE: dict = {}


def line_dedup(sf_dir: str, min_count: int = 2,
               broadcast_threshold: int = 5_000_000,
               join_partitions: int | None = None):
    """Parquet-reading wrapper around :func:`_line_dedup_ds` — see its
    docstring for the algorithm and plan shape."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return _line_dedup_ds(ds, min_count=min_count,
                          broadcast_threshold=broadcast_threshold,
                          join_partitions=join_partitions)


def _line_dedup_ds(ds, min_count: int = 2,
                   broadcast_threshold: int = 5_000_000,
                   join_partitions: int | None = None):
    """Corpus-wide duplicated-line removal (CCNet, Wenzek et al. 2020
    §3.1): a line that occurs at least ``min_count`` times across the
    whole corpus is boilerplate (nav bars, cookie banners, footers) and
    every occurrence is dropped; empty lines are always kept (they are
    structure, not content).  Output per document: (doc_id, n_lines,
    n_dropped, text_clean) where ``text_clean`` re-joins the surviving
    lines with ``\\n``.

    Plan shape — count pass + rebuild pass, never a text shuffle in the
    default path:

    1. one scan explodes non-empty lines, hashes each to md5-low64
       (``dedup._token_hashes`` — the per-worker vocabulary cache makes
       repeated boilerplate nearly free), and pre-tallies per batch, so
       only (8-byte hash, partial count) rows reach the hash-range
       exchange (``_exchange_common_keys`` — measured 14x faster than a
       sort-based groupby on this mostly-unique-keys shape);
    2. common hashes (count >= min_count) come back as ONE sorted int64
       array (md5-low64 bit-cast, the gram-hash convention), broadcast
       via ``ray.put`` when they fit under ``broadcast_threshold``,
       and the rebuild scan drops lines by a
       vectorized ``searchsorted`` membership test — text never leaves
       its input block;
    3. above the threshold (web scale: boilerplate is a large set) the
       rebuild goes through the shuffle the problem genuinely requires —
       explode (doc_id, li, line), ``left_anti``-join against the common
       table on the hash, and re-assemble per doc ordered by li.  A
       per-doc sentinel row (li = -1) survives every anti-join so
       documents whose lines ALL drop still emit a row.  Both paths are
       pinned identical in pytest.

    Counting groups by the 64-bit line hash, not the line string — the
    same documented ~2^-64 collision approximation as
    ``ngram_jaccard_pairs``; the DuckDB twin groups by the string and
    matches up to those collisions.

    ``ds`` must be a LAZY (doc_id, text) Dataset: both the count pass
    and the rebuild pass execute it, which for a parquet read (or any
    cheap scan chain, e.g. ``curate_pipeline``'s raw read) just streams
    the source twice — the at-scale alternative would materialize the
    whole corpus in the object store between passes."""
    import pyarrow.compute as pc
    import ray

    from crawler_ray.ops.dedup import _join_partitions, _token_hashes

    def _explode(t: pa.Table):
        """(doc_ids, line_idx, flat_lines, n_lines_per_doc) for a batch."""
        lines = pc.split_pattern(t["text"], "\n")
        lens = pc.list_value_length(lines).to_numpy()
        flat = pc.list_flatten(lines).to_numpy(zero_copy_only=False)
        doc_ids = np.repeat(t["doc_id"].to_numpy(), lens)
        # line index within its document
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        li = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, lens)
        return doc_ids, li, flat, lens

    def count_partial(t: pa.Table) -> pa.Table:
        _, _, flat, _ = _explode(t)
        flat = flat[flat != ""]
        if len(flat) == 0:
            return pa.table({"line_hash": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        hashes = _token_hashes(flat.tolist())
        uniq, counts = np.unique(hashes, return_counts=True)
        # bit-cast to int64 (uint64 above 2^63 degrades to
        # pickled-object blocks in any shuffle) and re-sort in int64
        # order — the _exchange_common_keys partial contract
        v = uniq.view(np.int64)
        order = np.argsort(v)
        return pa.table({"line_hash": pa.array(v[order], pa.int64()),
                         "n": pa.array(counts[order], pa.int64())})

    part = ds.map_batches(count_partial,
                          batch_format="pyarrow").materialize()
    n_common, common_refs = _exchange_common_keys(
        part, "line_hash", "n", min_count)

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("n_lines", pa.int64()),
                            ("n_dropped", pa.int64()),
                            ("text_clean", pa.string())])

    if n_common <= broadcast_threshold:
        # range order == global order, so the concat is already sorted
        arr = np.concatenate(
            [t["line_hash"].to_numpy() for t in ray.get(common_refs)])
        common_ref = ray.put(arr.astype(np.int64, copy=False))

        def rebuild_broadcast(t: pa.Table) -> pa.Table:
            srt = _COMMON_CACHE.get(common_ref.hex())
            if srt is None:
                _COMMON_CACHE.clear()
                srt = ray.get(common_ref)
                _COMMON_CACHE[common_ref.hex()] = srt
            doc_ids, _, flat, lens = _explode(t)
            nonempty = flat != ""
            hashes = np.zeros(len(flat), dtype=np.uint64)
            if nonempty.any():
                hashes[nonempty] = _token_hashes(flat[nonempty].tolist())
            hashes = hashes.view(np.int64)
            # membership: sorted-array binary search (no per-call hash
            # set rebuild); empty lines are never members
            if len(srt):
                pos = np.searchsorted(srt, hashes)
                np.clip(pos, 0, len(srt) - 1, out=pos)
                member = nonempty & (srt[pos] == hashes)
            else:
                member = np.zeros(len(flat), dtype=bool)
            keep = ~member
            # per-doc reassembly without Python loops: one big join of
            # kept lines via np.add.reduceat over offsets is awkward for
            # strings — a bounded pandas groupby does it in C
            import pandas as pd
            kept_doc = np.repeat(np.arange(len(lens)), lens)[keep]
            joined = (pd.Series(flat[keep])
                      .groupby(kept_doc).agg("\n".join)
                      if keep.any() else pd.Series([], dtype=object))
            text_clean = np.full(len(lens), "", dtype=object)
            text_clean[joined.index.to_numpy()] = joined.to_numpy()
            n_kept = np.bincount(kept_doc, minlength=len(lens)) \
                if keep.any() else np.zeros(len(lens), dtype=np.int64)
            return pa.table({
                "doc_id": t["doc_id"],
                "n_lines": pa.array(lens.astype(np.int64), pa.int64()),
                "n_dropped": pa.array(lens - n_kept, pa.int64()),
                "text_clean": pa.array(text_clean.tolist(), pa.string()),
            })

        return ds.map_batches(rebuild_broadcast, batch_format="pyarrow")

    # at-scale path: explode + left_anti join + per-doc reassembly.
    # Text genuinely shuffles here — that IS the CCNet shard shuffle;
    # the join keys are 8-byte hashes and the common table never lands
    # on the driver.
    def explode_rows(t: pa.Table) -> pa.Table:
        doc_ids, li, flat, lens = _explode(t)
        hashes = np.zeros(len(flat), dtype=np.uint64)
        nonempty = flat != ""
        if nonempty.any():
            hashes[nonempty] = _token_hashes(flat[nonempty].tolist())
        hashes = hashes.view(np.int64)
        # sentinel row per doc: survives every anti-join (hash 0 is the
        # reserved empty-line value, never counted) and carries n_lines
        out = pa.table({
            "doc_id": pa.array(
                np.concatenate([doc_ids, t["doc_id"].to_numpy()]),
                pa.int64()),
            "li": pa.array(
                np.concatenate([li, np.full(t.num_rows, -1,
                                            dtype=np.int64)]),
                pa.int64()),
            "line": pa.array(
                np.concatenate([flat,
                                np.full(t.num_rows, "", dtype=object)]
                               ).tolist(), pa.string()),
            "line_hash": pa.array(
                np.concatenate([hashes,
                                np.zeros(t.num_rows, dtype=np.int64)]),
                pa.int64()),
            "n_lines": pa.array(
                np.concatenate([np.repeat(lens, lens),
                                lens]).astype(np.int64), pa.int64()),
        })
        return out

    exploded = ds.map_batches(explode_rows, batch_format="pyarrow")
    n_parts = _join_partitions(join_partitions)
    import ray as _ray

    # Two concurrent exchanges so TEXT SHIPS EXACTLY ONCE (an earlier
    # version anti-joined the full exploded rows by line_hash and then
    # re-exchanged survivors by doc_id — text crossed the wire twice
    # and the Acero join alone measured 9.1 s of a 24 s 1M-doc run):
    #
    #   light hop   (doc_id, li, line_hash) rows — 24 B/row, no text —
    #               route by line_hash range to K1 combiners, each
    #               holding ITS zero-copy slice of the common table
    #               (slices of disjoint increasing ranges concatenate
    #               already sorted); one vectorized binary search emits
    #               the DROPPED (doc_id, li) pairs, split by doc shard;
    #   full hop    the exploded rows WITH text route by doc shard
    #               straight from the explode — the one all-to-all the
    #               CCNet shuffle genuinely requires;
    #   rebuild     each doc-shard combiner anti-filters its full rows
    #               against its dropped pairs (pandas C hash-merge on
    #               two int64 columns) and reassembles MANY docs per
    #               call with the same bounded pandas groupby the
    #               broadcast path uses — never one Python call per doc.
    #
    # Ray Data's keyed repartition needs the global HASH_SHUFFLE
    # strategy (measured pathological here, see ops/exchange.py); this
    # raw-task split/combine shape moves the minimum bytes the problem
    # allows: text once, 24 B/row hashes twice.
    co = exploded.materialize()
    row_blocks = [block_ref
                  for bundle in co.iter_internal_ref_bundles()
                  for block_ref, meta in bundle.blocks
                  if (meta.num_rows or 0) > 0]
    if not row_blocks:
        return _rd().from_arrow(out_schema.empty_table())
    k1 = max(2, min(n_parts, len(row_blocks) * 4))
    k = max(2, min(n_parts, len(row_blocks) * 4))
    cuts = np.linspace(-2.0**63, 2.0**63, k1 + 1)[1:-1].astype(np.int64)
    MIX = np.uint64(0x9E3779B97F4A7C15)

    def _doc_shard_split(t: pa.Table):
        """Split a table into k slices by the multiply-mix doc shard —
        sequential doc_ids spread uniformly, so skew is impossible by
        construction.  Raw slices are safe to return: Ray's Arrow
        serializer truncates sliced buffers in transit (pinned in
        tests/test_exchange.py — plain pickle would ship the parent
        block per slice)."""
        d = t["doc_id"].to_numpy().astype(np.uint64)
        shard = (((d * MIX) >> np.uint64(32))
                 % np.uint64(k)).astype(np.int64)
        order = np.argsort(shard, kind="stable")
        t2 = t.take(pa.array(order))
        ss = shard[order]
        bounds = np.searchsorted(ss, np.arange(k + 1))
        return tuple(
            t2.slice(bounds[i], bounds[i + 1] - bounds[i])
            for i in range(k))

    @_ray.remote
    def split_light(*blocks):
        lt = pa.concat_tables(
            b.select(["doc_id", "li", "line_hash"]) for b in blocks)
        order = np.argsort(lt["line_hash"].to_numpy(), kind="stable")
        t2 = lt.take(pa.array(order))
        keys = t2["line_hash"].to_numpy()
        idx = np.searchsorted(keys, cuts)
        bounds = np.concatenate([[0], idx, [len(keys)]])
        return tuple(t2.slice(bounds[i], bounds[i + 1] - bounds[i])
                     for i in range(k1))

    @_ray.remote
    def split_common(ct: pa.Table):
        keys = ct["line_hash"].to_numpy()
        idx = np.searchsorted(keys, cuts)
        bounds = np.concatenate([[0], idx, [len(keys)]])
        return tuple(keys[bounds[i]:bounds[i + 1]] for i in range(k1))

    @_ray.remote
    def split_full(*blocks):
        return _doc_shard_split(pa.concat_tables(
            b.select(["doc_id", "li", "line", "n_lines"])
            for b in blocks))

    @_ray.remote
    def member_combine(nc: int, *parts):
        """Dropped (doc_id, li) pairs of one line_hash range, split by
        doc shard for the rebuild combiners."""
        commons = [p for p in parts[:nc] if len(p)]
        t = pa.concat_tables(parts[nc:])
        if t.num_rows and commons:
            srt = np.concatenate(commons)  # sorted by construction
            h = t["line_hash"].to_numpy()
            pos = np.searchsorted(srt, h)
            np.clip(pos, 0, len(srt) - 1, out=pos)
            t = t.filter(pa.array(srt[pos] == h))
        elif not commons:
            t = t.slice(0, 0)
        return _doc_shard_split(t.select(["doc_id", "li"]))

    @_ray.remote
    def rebuild(nd: int, *parts) -> pa.Table:
        import pandas as pd
        dropped = pa.concat_tables(parts[:nd])
        full = pa.concat_tables(parts[nd:])
        if dropped.num_rows and full.num_rows:
            left = full.select(["doc_id", "li"]).to_pandas()
            dd = dropped.to_pandas()
            dd["__drop"] = True
            merged = left.merge(dd, on=["doc_id", "li"], how="left")
            full = full.filter(
                pa.array(merged["__drop"].isna().to_numpy()))
        return _reassemble_rows(full, out_schema)

    # coalesce input blocks to ~k split tasks: 256 blocks x k returns
    # was ~25k tiny objects and measured SLOWER than the Acero join it
    # replaced; grouped, each exchange is k x k objects
    groups = [g.tolist() for g in
              np.array_split(np.arange(len(row_blocks)),
                             min(len(row_blocks), k))]
    block_groups = [[row_blocks[i] for i in g] for g in groups if len(g)]
    light_refs = [split_light.options(num_returns=k1).remote(*g)
                  for g in block_groups]
    csplit = [split_common.options(num_returns=k1).remote(c)
              for c in common_refs]
    full_refs = [split_full.options(num_returns=k).remote(*g)
                 for g in block_groups]
    dropped_refs = [
        member_combine.options(num_returns=k).remote(
            len(csplit),
            *[cs[j] for cs in csplit],
            *[lr[j] for lr in light_refs])
        for j in range(k1)]
    refs = [rebuild.remote(k1,
                           *[dr[s] for dr in dropped_refs],
                           *[fr[s] for fr in full_refs])
            for s in range(k)]
    return _rd().from_arrow_refs(refs)


def _reassemble_rows(t: pa.Table, out_schema: pa.Schema) -> pa.Table:
    """Vectorized per-doc line reassembly over MANY documents at once:
    rows (doc_id, li, line, n_lines) arrive in any order; the li = -1
    sentinel guarantees one group per doc even when every real line
    dropped.  One lexsort + one pandas C-loop string join per call —
    the same kernel as the broadcast path, O(batch) Python calls total
    instead of O(corpus documents)."""
    import pandas as pd

    if t.num_rows == 0:
        return out_schema.empty_table()
    d = t["doc_id"].to_numpy()
    li = t["li"].to_numpy()
    order = np.lexsort((li, d))
    d, li = d[order], li[order]
    lines = (t["line"].combine_chunks().take(pa.array(order))
             .to_numpy(zero_copy_only=False))
    nl = t["n_lines"].to_numpy()[order]
    new = np.concatenate([[True], d[1:] != d[:-1]])
    starts = np.flatnonzero(new)
    codes = np.cumsum(new) - 1
    ndocs = len(starts)
    real = li >= 0
    text = np.full(ndocs, "", dtype=object)
    n_kept = np.zeros(ndocs, dtype=np.int64)
    if real.any():
        joined = pd.Series(lines[real]).groupby(codes[real]).agg(
            "\n".join)
        text[joined.index.to_numpy()] = joined.to_numpy()
        n_kept = np.bincount(codes[real],
                             minlength=ndocs).astype(np.int64)
    nlv = nl[starts].astype(np.int64)
    return pa.table({
        "doc_id": pa.array(d[starts], pa.int64()),
        "n_lines": pa.array(nlv, pa.int64()),
        "n_dropped": pa.array(nlv - n_kept, pa.int64()),
        "text_clean": pa.array(text.tolist(), pa.string()),
    }).cast(out_schema)


# ---------------------------------------------------------------------------
# Gopher-style quality gate
# ---------------------------------------------------------------------------

def quality_filter(sf_dir: str, min_words: int = 50,
                   max_words: int = 100_000,
                   min_mean_wlen_milli: int = 3_000,
                   max_mean_wlen_milli: int = 10_000,
                   max_top_share_milli: int = 200,
                   max_dup_frac_milli: int = 300):
    """Composite document quality gate — the Gopher rule family (Rae et
    al. 2021, Appendix A1.1) re-derived over this suite's single token
    definition (non-empty runs of a single-space split, as
    ``repetition_stats``): word-count bounds, mean word length bounds
    (milli-chars, floor division so the SQL twin is bit-exact), a cap on
    the most-frequent word's share and on the duplicate-word fraction.
    The FIRST failing rule, in that fixed order, names the verdict;
    zero-token documents fail the word-count floor.  Output (doc_id,
    n_words, mean_wlen_milli, top_share_milli, dup_frac_milli, reason).

    One streaming scan; per batch the token spine is flattened once and
    tallied with a composite pandas groupby (C loops), exactly the
    ``repetition_stats`` shape plus a character-sum column."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    th = (min_words, max_words, min_mean_wlen_milli, max_mean_wlen_milli,
          max_top_share_milli, max_dup_frac_milli)

    def gate(t: pa.Table) -> pa.Table:
        total, mean_wlen, top_share, dup_frac, reason = _quality_stats(
            t["text"], *th)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_words": pa.array(total, pa.int64()),
            "mean_wlen_milli": pa.array(mean_wlen, pa.int64()),
            "top_share_milli": pa.array(top_share, pa.int64()),
            "dup_frac_milli": pa.array(dup_frac, pa.int64()),
            "reason": pa.array(reason.tolist(), pa.string()),
        })

    return ds.map_batches(gate, batch_format="pyarrow")


def _quality_stats(text, min_words, max_words, min_mean_wlen_milli,
                   max_mean_wlen_milli, max_top_share_milli,
                   max_dup_frac_milli):
    """The Gopher gate kernel over one batch's text column — returns
    (n_words, mean_wlen_milli, top_share_milli, dup_frac_milli, reason)
    as numpy arrays.  Shared by ``quality_filter`` and the fused
    ``curate_pipeline`` stage so the rule order and milli scaling have
    exactly one definition."""
    import pandas as pd
    import pyarrow.compute as pc

    words = pc.split_pattern(text, " ")
    lens = pc.list_value_length(words).to_numpy()
    flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
    row_idx = np.repeat(np.arange(len(lens)), lens)
    mask = flat != ""
    flat, row_idx = flat[mask], row_idx[mask]

    n = len(lens)
    total = np.zeros(n, dtype=np.int64)
    distinct = np.zeros(n, dtype=np.int64)
    top = np.zeros(n, dtype=np.int64)
    chars = np.zeros(n, dtype=np.int64)
    if len(flat):
        wlen = np.char.str_len(flat.astype(str))
        df = pd.DataFrame({"r": row_idx, "w": flat, "c": wlen})
        per_pair = df.groupby(["r", "w"], sort=False)["c"].agg(
            "size")
        cnt = per_pair.groupby(level=0, sort=False)
        idx = cnt.sum().index.to_numpy()
        total[idx] = cnt.sum().to_numpy()
        distinct[idx] = cnt.size().to_numpy()
        top[idx] = cnt.max().to_numpy()
        chars[idx] = np.bincount(row_idx, weights=wlen,
                                 minlength=n)[idx].astype(np.int64)

    safe = np.maximum(total, 1)
    mean_wlen = 1000 * chars // safe
    top_share = 1000 * top // safe
    dup_frac = 1000 * (total - distinct) // safe

    reason = np.full(n, "keep", dtype=object)
    # reverse order so earlier rules overwrite later ones =>
    # first-failing-rule-wins with pure vector stores
    reason[dup_frac > max_dup_frac_milli] = "repetitive"
    reason[top_share > max_top_share_milli] = "top_word"
    reason[mean_wlen > max_mean_wlen_milli] = "long_words"
    reason[mean_wlen < min_mean_wlen_milli] = "short_words"
    reason[total > max_words] = "too_long"
    reason[total < min_words] = "too_short"
    return total, mean_wlen, top_share, dup_frac, reason


# ---------------------------------------------------------------------------
# per-source quota
# ---------------------------------------------------------------------------

def source_quota(sf_dir: str, quota: int = 50):
    """Per-source document cap — keep the first ``quota`` documents of
    each source by ascending doc_id (the deterministic twin of "cap any
    one domain's contribution to the training mix").  Output (doc_id,
    source, rk) with rk the 1-based rank within the source.

    Pre-aggregate before the shuffle: each batch keeps at most ``quota``
    candidates per source it sees (a batch can never contribute more
    winners than that), so the groupby shuffles a bounded candidate set
    — O(sources x quota) rows per batch — never the corpus.  The final
    per-source rank is a tiny ``map_groups`` over survivors."""
    import pandas as pd

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "source"])

    def prune(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = (df.sort_values("doc_id")
              .groupby("source", sort=False).head(quota))
        # strip the pandas schema metadata: blocks with embedded dict
        # metadata defeat Ray's schema dedup (it warns per block)
        return (pa.Table.from_pandas(df, preserve_index=False)
                .replace_schema_metadata(None))

    def rank(df):
        df = df.sort_values("doc_id").head(quota).copy()
        df["rk"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["doc_id", "source", "rk"]]

    # two-level prune: level 1 bounds each block's contribution, the
    # coalesce + re-prune bounds the SORT-GROUPBY INPUT at
    # O(32 x sources x quota) regardless of corpus size (at 1M docs the
    # single-level plan shuffled 12.9M candidate rows; this one 1.6M).
    # Pruning is idempotent and winner-preserving: any global top-quota
    # row is a top-quota row of every block that contains it.
    pruned = (ds.map_batches(prune, batch_format="pyarrow")
              .repartition(32)
              .map_batches(prune, batch_format="pyarrow"))
    return pruned.groupby("source").map_groups(rank)


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------

def stratified_sample(sf_dir: str, default_permille: int = 100,
                      overrides: dict[str, int] | None = None):
    """Deterministic per-language subsampling — the data-mixing pass
    that downsamples over-represented languages: a document is kept when
    its hash bucket (the ``dataset_split`` rule: first 8 hex chars of
    md5(doc_id as decimal string) mod 1000) falls below the language's
    permille rate (``overrides`` per language, ``default_permille``
    otherwise).  Output (doc_id, lang, bucket) for kept documents only.

    Content-independent and stable under resharding (the same doc always
    lands on the same side), and composable with ``dataset_split`` —
    both read the same bucket, so sampling never moves a document across
    train/test boundaries."""
    from crawler_ray.ops.hashkeys import md5_bucket

    rates = dict(overrides or {})
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang"])

    def sample(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        buckets = md5_bucket(t["doc_id"])
        langs = t["lang"].to_numpy(zero_copy_only=False)
        limit = np.fromiter((rates.get(l, default_permille)
                             for l in langs),
                            dtype=np.int64, count=len(langs))
        keep = buckets < limit
        return pa.table({
            "doc_id": pa.array(np.asarray(ids, dtype=np.int64)[keep],
                               pa.int64()),
            "lang": pa.array(langs[keep].tolist(), pa.string()),
            "bucket": pa.array(buckets[keep], pa.int64()),
        })

    return ds.map_batches(sample, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# text normalization
# ---------------------------------------------------------------------------

def normalize_text(sf_dir: str):
    """Canonical text normalization — the pass that runs BEFORE any
    hash-based dedup so visually-identical documents actually collide:
    Unicode NFC composition, ASCII-whitespace runs collapsed to one
    space, leading/trailing spaces stripped.  Output (doc_id,
    text_norm, changed).

    The whitespace steps are Arrow RE2 kernels; NFC runs through
    ``unicodedata`` on the non-ASCII MINORITY only — pyarrow 16's
    ``utf8_normalize`` decomposes for every ``form`` value (it cannot
    compose), so it is unusable for NFC, and an ASCII string (byte
    length == codepoint length, one vectorized compare) is NFC by
    definition, which on webtext leaves only a few percent of rows for
    the Python call.  DuckDB's nfc_normalize and RE2 regexp_replace
    replay the exact same transforms; RE2's ``\\s`` is ASCII whitespace
    on both sides (NBSP et al. survive — the lang/token ops already
    treat them consistently)."""
    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        x = _normalize_arr(t["text"])
        return pa.table({
            "doc_id": t["doc_id"],
            "text_norm": x,
            "changed": pc.not_equal(x, t["text"]),
        })

    return ds.map_batches(norm, batch_format="pyarrow")


def _normalize_arr(text) -> pa.Array:
    """The ``normalize_text`` kernel over one batch's text column: NFC
    (Python, non-ASCII minority only), RE2 whitespace collapse, edge
    strip.  Shared with ``curate_pipeline``."""
    import unicodedata

    import pyarrow.compute as pc

    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    nonascii = np.flatnonzero(
        pc.not_equal(pc.binary_length(text),
                     pc.utf8_length(text)).to_numpy(
                         zero_copy_only=False))
    if len(nonascii):
        vals = text.to_pylist()
        for i in nonascii:
            vals[i] = unicodedata.normalize("NFC", vals[i])
        text = pa.array(vals, pa.string())
    x = pc.replace_substring_regex(text, r"\s+", " ")
    return pc.replace_substring_regex(x, r"^ +| +$", "")


# ---------------------------------------------------------------------------
# incremental (delta) dedup
# ---------------------------------------------------------------------------

_EXISTING_CACHE: dict = {}


def incremental_dedup(sf_dir: str, existing_min_bucket: int = 200,
                      broadcast_threshold: int = 5_000_000,
                      join_partitions: int | None = None):
    """Delta dedup — the append-only ingestion pass: documents arriving
    in the INCOMING shard are kept only when their exact text hash does
    not already exist in the EXISTING corpus.  The shards come from the
    ``dataset_split`` bucket rule (existing = bucket >=
    ``existing_min_bucket``, i.e. the train split; incoming = the
    rest), so the operator is self-contained over one documents table
    while modelling the real shape: new crawl shard vs corpus-so-far.
    Output (doc_id, text_hash) for surviving incoming docs —
    within-shard duplicates are exact_dedup's job, not this one's.

    Plan: ONE hashing scan projects (doc_id, bucket, md5-hex,
    md5-low64) and is materialized — hashes, never text — then both
    sides filter from it.  The existing side reduces to DISTINCT 8-byte
    bit-cast hashes; membership is the usual planner decision
    (sorted-array broadcast under ``broadcast_threshold``, a
    ``left_anti`` hash join above it; pytest pins the paths identical).
    The 64-bit membership key carries the module's documented ~2^-64
    collision approximation; the hex hash in the output is exact."""
    import ray

    from crawler_ray.ops.dedup import _join_partitions
    from crawler_ray.ops.hashkeys import md5_bucket, md5_hex_and_key64

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def project(t: pa.Table) -> pa.Table:
        buckets = md5_bucket(t["doc_id"])
        hexes, k64 = md5_hex_and_key64(t["text"])
        return pa.table({
            "doc_id": t["doc_id"],
            "bucket": pa.array(buckets, pa.int64()),
            "text_hash": hexes,
            "h64": pa.array(k64.view(np.int64), pa.int64()),
        })

    hashed = ds.map_batches(project, batch_format="pyarrow").materialize()
    incoming = hashed.filter(expr=f"bucket < {existing_min_bucket}")

    # distributed DISTINCT via the hash-range exchange (a sort-based
    # groupby measured 12 s on 800k mostly-unique keys at 1M docs;
    # the exchange does the same reduction in ~1 s) — partials are the
    # per-batch unique sorted h64 of the existing side
    def ex_partial(t: pa.Table) -> pa.Table:
        mask = t["bucket"].to_numpy() >= existing_min_bucket
        uniq = np.unique(t["h64"].to_numpy()[mask])
        return pa.table({"h64": pa.array(uniq, pa.int64()),
                         "n": pa.array(np.ones(len(uniq), np.int64),
                                       pa.int64())})

    ex_part = hashed.map_batches(ex_partial,
                                 batch_format="pyarrow").materialize()
    n_existing, ex_refs = _exchange_common_keys(ex_part, "h64", "n", 1)

    if n_existing <= broadcast_threshold:
        arr = np.concatenate(
            [t["h64"].to_numpy() for t in ray.get(ex_refs)])
        ex_ref = ray.put(arr.astype(np.int64, copy=False))

        def anti_broadcast(t: pa.Table) -> pa.Table:
            srt = _EXISTING_CACHE.get(ex_ref.hex())
            if srt is None:
                _EXISTING_CACHE.clear()
                srt = ray.get(ex_ref)
                _EXISTING_CACHE[ex_ref.hex()] = srt
            h = t["h64"].to_numpy()
            if len(srt):
                pos = np.searchsorted(srt, h)
                np.clip(pos, 0, len(srt) - 1, out=pos)
                fresh = srt[pos] != h
            else:
                fresh = np.ones(len(h), dtype=bool)
            return t.select(["doc_id", "text_hash"]).filter(
                pa.array(fresh))

        return incoming.map_batches(anti_broadcast,
                                    batch_format="pyarrow")

    existing_r = _rd().from_arrow_refs(ex_refs)
    kept = incoming.join(existing_r, "left_anti",
                         num_partitions=_join_partitions(join_partitions),
                         on=("h64",))
    return kept.select_columns(["doc_id", "text_hash"])


# ---------------------------------------------------------------------------
# deterministic global shuffle
# ---------------------------------------------------------------------------

def shuffle_corpus(sf_dir: str, seed: int = 0):
    """Reproducible global shuffle — the training-order pass: every
    document gets an exact global rank in the order of
    md5(f"{seed}:{doc_id}") (ties — full-digest collisions — break by
    doc_id), so the same seed always yields the same order on any
    cluster, any partitioning, any rerun.  Output (doc_id, rank),
    rank 0-based.

    Plan: one hashing scan, a distributed ``Dataset.sort`` on the hash
    key, then exact ordinals WITHOUT moving data again — block row
    counts are metadata, so the driver computes per-block offsets from
    counts alone and raw per-block tasks stamp ``offset + arange``.
    The sort key is the sign-flipped md5-low64 (int64 order then equals
    unsigned order equals hex-string order), which is what lets the
    DuckDB twin replay the exact rank with a ROW_NUMBER over the hex
    prefix.  Output column is named ``shuffle_rank`` (``rank`` collides
    with the SQL window keyword)."""
    import pyarrow.compute as pc
    import ray

    from crawler_ray.ops.hashkeys import md5_key64

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])

    def key_of(t: pa.Table) -> pa.Table:
        salted = pc.binary_join_element_wise(
            f"{seed}:", pc.cast(t["doc_id"], pa.string()), "")
        k = md5_key64(salted)
        # sign-flip: signed int64 order == unsigned order
        k = (k ^ np.uint64(1 << 63)).view(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "key": pa.array(k, pa.int64())})

    ranked = (ds.map_batches(key_of, batch_format="pyarrow")
              .sort(["key", "doc_id"]).materialize())

    blocks = [(block_ref, meta.num_rows or 0)
              for bundle in ranked.iter_internal_ref_bundles()
              for block_ref, meta in bundle.blocks]

    @ray.remote
    def stamp(t: pa.Table, offset: int) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "shuffle_rank": pa.array(
                offset + np.arange(t.num_rows, dtype=np.int64),
                pa.int64()),
        })

    refs, offset = [], 0
    for block_ref, n in blocks:
        if n:
            refs.append(stamp.remote(block_ref, offset))
            offset += n
    if not refs:
        return _rd().from_arrow(pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "shuffle_rank": pa.array([], pa.int64())}))
    return _rd().from_arrow_refs(refs)


# ---------------------------------------------------------------------------
# exact length percentiles
# ---------------------------------------------------------------------------

def length_percentiles(sf_dir: str,
                       pcts: tuple[int, ...] = (10, 25, 50, 75, 90, 99)):
    """Exact corpus token-length percentiles — the curation dashboard
    number behind every "cut at the p99 length" decision.  Percentile p
    is the smallest length whose cumulative count reaches
    ``ceil(p*N/100)`` (integer math: ``(p*N + 99) // 100``), so the
    definition is rank-exact and SQL-replayable — no interpolation, no
    sketch error.  Output (pct, n_tokens), one row per requested
    percentile.

    Distributed shape: the scan reduces to a (n_tokens -> count)
    histogram via groupby — the shuffled aggregate is bounded by the
    number of DISTINCT document lengths (<= max doc length, independent
    of corpus size), so the driver-side cumsum over the histogram is a
    few thousand rows even at 100 TB.  Token definition: the suite-wide
    RE2 ``\\S+`` count."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def count(t: pa.Table) -> pa.Table:
        return pa.table({"n_tokens": pc.cast(
            pc.count_substring_regex(t["text"], r"\S+"), pa.int64())})

    hist = (ds.map_batches(count, batch_format="pyarrow")
            .groupby("n_tokens").aggregate(Count(alias_name="cnt"))
            .take_all())
    lengths = np.array([r["n_tokens"] for r in hist], dtype=np.int64)
    counts = np.array([r["cnt"] for r in hist], dtype=np.int64)
    order = np.argsort(lengths)
    lengths, counts = lengths[order], counts[order]
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0

    out_p, out_v = [], []
    for p in pcts:
        if n == 0:
            continue
        rank = (p * n + 99) // 100
        out_p.append(int(p))
        out_v.append(int(lengths[np.searchsorted(cum, rank)]))
    return pa.table({"pct": pa.array(out_p, pa.int64()),
                     "n_tokens": pa.array(out_v, pa.int64())})


# ---------------------------------------------------------------------------
# fused end-to-end curation pipeline
# ---------------------------------------------------------------------------

_WINNER_CACHE: dict = {}


def curate_pipeline(sf_dir: str, min_count: int = 2,
                    broadcast_threshold: int = 5_000_000,
                    join_partitions: int | None = None,
                    min_words: int = 50, max_words: int = 100_000,
                    min_mean_wlen_milli: int = 3_000,
                    max_mean_wlen_milli: int = 10_000,
                    max_top_share_milli: int = 200,
                    max_dup_frac_milli: int = 300,
                    test_permille: int = 100, val_permille: int = 100):
    """The composed corpus-curation chain as ONE engine plan —
    line_dedup -> normalize_text -> quality_filter -> exact-dedup
    winners -> dataset_split — over a single documents read, no
    intermediate parquet sinks (the ``curate`` CLI's resumable-pass
    twin, fused).  Output per SURVIVING document: (doc_id, n_lines,
    n_dropped, n_words, n_copies, text_hash, split).

    Stage order is semantic, not arbitrary: normalization collapses
    newlines, so CCNet line dedup MUST run on the raw text first; the
    quality gate and the exact dedup then score/hash the normalized
    text so visually-identical docs collide; the split stamp is
    content-independent and lands last.  A document survives when (a)
    its de-boilerplated normalized text passes every Gopher rule and
    (b) it is the min-doc_id winner of its exact-hash group.

    Plan shape: ``_line_dedup_ds`` streams the raw read twice (count +
    rebuild — cheap scans, no corpus materialization); the fused
    gate stage normalizes, scores, filters, hashes, and stamps the
    split in one batch pass, after which TEXT IS GONE — the surviving
    stream is (ids, stats, 8-byte + hex hashes), which is what gets
    materialized for the winner exchange (~60 B/row; the 100-TB
    alternative — recomputing the gate for a second pass — costs more
    than it saves).  Winner selection is the usual planner decision:
    the (h64, winner, n_copies) table broadcasts under
    ``broadcast_threshold`` and the final pass filters by a
    vectorized searchsorted; above it the exchange's per-range refs
    become an inner-join side and the filter runs post-join (pytest
    pins the paths identical)."""
    import ray

    from crawler_ray.ops.dedup import _join_partitions
    from crawler_ray.ops.exchange import exchange_reduce
    from crawler_ray.ops.hashkeys import md5_bucket, md5_hex_and_key64

    th = (min_words, max_words, min_mean_wlen_milli, max_mean_wlen_milli,
          max_top_share_milli, max_dup_frac_milli)
    t_cut, v_cut = test_permille, test_permille + val_permille

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    ld = _line_dedup_ds(ds, min_count=min_count,
                        broadcast_threshold=broadcast_threshold,
                        join_partitions=join_partitions)

    empty = pa.schema([("doc_id", pa.int64()), ("n_lines", pa.int64()),
                       ("n_dropped", pa.int64()), ("n_words", pa.int64()),
                       ("text_hash", pa.string()), ("h64", pa.int64()),
                       ("split", pa.string())])

    def gate(t: pa.Table) -> pa.Table:
        text_norm = _normalize_arr(t["text_clean"])
        total, _, _, _, reason = _quality_stats(text_norm, *th)
        kidx = np.flatnonzero(reason == "keep")
        if len(kidx) == 0:
            return empty.empty_table()
        take = pa.array(kidx)
        ids = t["doc_id"].combine_chunks().take(take)
        hexes, k64 = md5_hex_and_key64(text_norm.take(take))
        buckets = md5_bucket(ids)
        split = np.where(buckets < t_cut, "test",
                         np.where(buckets < v_cut, "val", "train"))
        return pa.table({
            "doc_id": ids,
            "n_lines": t["n_lines"].combine_chunks().take(take),
            "n_dropped": t["n_dropped"].combine_chunks().take(take),
            "n_words": pa.array(total[kidx], pa.int64()),
            "text_hash": hexes,
            "h64": pa.array(k64.view(np.int64), pa.int64()),
            "split": pa.array(split.tolist(), pa.string()),
        })

    # text ends here: the materialized survivor stream is ids + stats +
    # hashes only, consumed twice (winner partials + the final filter)
    gated = ld.map_batches(gate, batch_format="pyarrow").materialize()
    if gated.count() == 0:
        # all-empty blocks lose their schema in Ray; hand back a TYPED
        # empty so sinks and readers always see the output columns
        out_empty = pa.schema([("doc_id", pa.int64()),
                               ("n_lines", pa.int64()),
                               ("n_dropped", pa.int64()),
                               ("n_words", pa.int64()),
                               ("n_copies", pa.int64()),
                               ("text_hash", pa.string()),
                               ("split", pa.string())])
        return _rd().from_arrow(out_empty.empty_table())

    def win_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"h64": pa.array([], pa.int64()),
                             "n_copies": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        h = t["h64"].to_numpy()
        order = np.argsort(h, kind="stable")
        hs = h[order]
        starts = np.flatnonzero(
            np.concatenate([[True], hs[1:] != hs[:-1]]))
        docs = t["doc_id"].to_numpy()[order]
        return pa.table({
            "h64": pa.array(hs[starts], pa.int64()),
            "n_copies": pa.array(
                np.diff(np.append(starts, len(hs))), pa.int64()),
            "doc_id": pa.array(np.minimum.reduceat(docs, starts)
                               if len(starts) else docs, pa.int64()),
        })

    part = gated.map_batches(win_partial,
                             batch_format="pyarrow").materialize()
    n_groups, refs = exchange_reduce(part, "h64", sum_cols=("n_copies",),
                                     min_cols=("doc_id",))

    out_cols = ["doc_id", "n_lines", "n_dropped", "n_words", "n_copies",
                "text_hash", "split"]

    if n_groups <= broadcast_threshold:
        tables = ray.get(list(refs))
        winners = ray.put((
            np.concatenate([t["h64"].to_numpy() for t in tables]),
            np.concatenate([t["doc_id"].to_numpy() for t in tables]),
            np.concatenate([t["n_copies"].to_numpy() for t in tables])))

        def pick(t: pa.Table) -> pa.Table:
            w = _WINNER_CACHE.get(winners.hex())
            if w is None:
                _WINNER_CACHE.clear()
                w = ray.get(winners)
                _WINNER_CACHE[winners.hex()] = w
            hs, win, n = w
            h = t["h64"].to_numpy()
            if len(hs) == 0:
                keep = np.zeros(len(h), dtype=bool)
                nc = np.array([], dtype=np.int64)
            else:
                pos = np.searchsorted(hs, h)
                np.clip(pos, 0, len(hs) - 1, out=pos)
                keep = win[pos] == t["doc_id"].to_numpy()
                nc = n[pos][keep]
            out = t.filter(pa.array(keep)).append_column(
                "n_copies", pa.array(nc, pa.int64()))
            return out.select(out_cols)

        return gated.map_batches(pick, batch_format="pyarrow")

    # join path: the per-range winner refs become the join side — the
    # winner table never lands on the driver
    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"h64": t["h64"], "win_doc": t["doc_id"],
                         "n_copies": t["n_copies"]})

    winners_ds = (_rd().from_arrow_refs(list(refs))
                  .map_batches(rename, batch_format="pyarrow"))
    joined = gated.join(winners_ds, "inner",
                        num_partitions=_join_partitions(join_partitions),
                        on=("h64",))

    def post(t: pa.Table) -> pa.Table:
        keep = t["doc_id"].to_numpy() == t["win_doc"].to_numpy()
        return t.filter(pa.array(keep)).select(out_cols)

    return joined.map_batches(post, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# duplicated-span detection (exact-substring dedup, token granularity)
# ---------------------------------------------------------------------------

_SPAN_CACHE: dict = {}


def span_dedup(sf_dir: str, span_tokens: int = 50, min_count: int = 2,
               broadcast_threshold: int = 5_000_000,
               join_partitions: int | None = None):
    """Duplicated-span detection — the token-granularity form of exact
    substring dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", §3: memorization-prone exact repeats
    are substrings, not whole documents): every consecutive
    ``span_tokens``-token window of every document is hashed; a span
    occurring ``min_count``+ times ACROSS THE CORPUS (within-doc
    repeats count) is duplicated.  Output per document: (doc_id,
    n_spans, n_dup_spans) — n_spans = max(0, n_tokens - span + 1), and
    a downstream gate can cut on n_dup_spans/n_spans.  Token definition
    is the suite-wide non-empty single-space split; window hashes are
    the contamination_check rolling construction (splitmix64-diffused
    FNV over md5-low64 token hashes), so grouping carries the module's
    documented ~2^-64 collision approximation while the DuckDB twin
    groups by the span STRING.

    Plan shape (the line_dedup pattern):

    1. count pass — per-batch window hashes pre-tallied to (8-byte
       hash, count) partials through the hash-range exchange; common
       spans (count >= min_count) come back as per-range sorted refs;
    2. score pass — under ``broadcast_threshold`` the common set ships
       once via ``ray.put`` (zero-copy plasma mapping per node) and ONE
       scan emits (doc_id, n_spans, n_dup_spans) by vectorized
       searchsorted membership + bincount;
    3. above the threshold nothing broadcasts: the scan emits light
       (doc_id, span_hash) member candidates that inner-join the
       common refs (8-byte keys, never text), per-batch tallies reduce
       to (doc_id, n_dup) partials, and ONE hash-range exchange on
       doc_id sums them with the per-doc totals stream — zero-span and
       zero-dup documents still emit rows because the totals stream
       covers every document.  Both paths are pytest-pinned identical.
    """
    import pyarrow.compute as pc
    import ray

    from crawler_ray.ops.dedup import (_join_partitions, _splitmix64,
                                       _token_hashes)
    from crawler_ray.ops.exchange import exchange_reduce

    n = int(span_tokens)
    _FNV = np.uint64(1099511628211)

    ds = _rd().read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def _windows(t: pa.Table):
        """(window_row_idx, window_hash uint64, tokens_per_row)."""
        words = pc.split_pattern(t["text"], " ")
        lens = pc.list_value_length(words).to_numpy()
        flat = pc.list_flatten(words).to_numpy(zero_copy_only=False)
        row_idx = np.repeat(np.arange(len(lens)), lens)
        mask = flat != ""
        flat, row_idx = flat[mask], row_idx[mask]
        ntok = np.bincount(row_idx,
                           minlength=len(lens)).astype(np.int64)
        m = len(flat) - n + 1
        if m <= 0:
            return (np.array([], dtype=np.int64),
                    np.array([], dtype=np.uint64), ntok)
        hs = _token_hashes(list(flat))
        with np.errstate(over="ignore"):
            acc = hs[:m].copy()
            for j in range(1, n):
                acc = _splitmix64(acc * _FNV + hs[j:j + m])
        same = row_idx[:m] == row_idx[n - 1:]
        return row_idx[:m][same], acc[same], ntok

    def count_partial(t: pa.Table) -> pa.Table:
        _, h, _ = _windows(t)
        uniq, counts = np.unique(h.view(np.int64), return_counts=True)
        return pa.table({"h": pa.array(uniq, pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    part = ds.map_batches(count_partial,
                          batch_format="pyarrow").materialize()
    n_common, common_refs = _exchange_common_keys(part, "h", "n",
                                                  min_count)

    if n_common <= broadcast_threshold:
        arr = np.concatenate(
            [t["h"].to_numpy() for t in ray.get(common_refs)])
        common_ref = ray.put(arr.astype(np.int64, copy=False))

        def score(t: pa.Table) -> pa.Table:
            srt = _SPAN_CACHE.get(common_ref.hex())
            if srt is None:
                _SPAN_CACHE.clear()
                srt = ray.get(common_ref)
                _SPAN_CACHE[common_ref.hex()] = srt
            ridx, h, ntok = _windows(t)
            h = h.view(np.int64)
            if len(srt) and len(h):
                pos = np.searchsorted(srt, h)
                np.clip(pos, 0, len(srt) - 1, out=pos)
                member = srt[pos] == h
            else:
                member = np.zeros(len(h), dtype=bool)
            n_dup = (np.bincount(ridx[member], minlength=t.num_rows)
                     .astype(np.int64) if member.any()
                     else np.zeros(t.num_rows, dtype=np.int64))
            return pa.table({
                "doc_id": t["doc_id"],
                "n_spans": pa.array(np.maximum(ntok - n + 1, 0),
                                    pa.int64()),
                "n_dup_spans": pa.array(n_dup, pa.int64()),
            })

        return ds.map_batches(score, batch_format="pyarrow")

    # join path: totals partials cover every doc; member tallies come
    # from an 8-byte-key inner join against the common refs; one
    # exchange on doc_id sums both streams
    def totals_partial(t: pa.Table) -> pa.Table:
        _, _, ntok = _windows(t)
        ids = t["doc_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        return pa.table({
            "doc_id": pa.array(ids[order], pa.int64()),
            "n_spans": pa.array(
                np.maximum(ntok - n + 1, 0)[order], pa.int64()),
            "n_dup_spans": pa.array(np.zeros(len(ids), np.int64),
                                    pa.int64()),
        })

    def light_rows(t: pa.Table) -> pa.Table:
        ridx, h, _ = _windows(t)
        ids = t["doc_id"].to_numpy()[ridx] if len(ridx) else \
            np.array([], dtype=np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "h": pa.array(h.view(np.int64), pa.int64())})

    def tally(t: pa.Table) -> pa.Table:
        ids, counts = np.unique(t["doc_id"].to_numpy(),
                                return_counts=True)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_spans": pa.array(np.zeros(len(ids), np.int64),
                                pa.int64()),
            "n_dup_spans": pa.array(counts.astype(np.int64),
                                    pa.int64()),
        })

    common_r = _rd().from_arrow_refs(list(common_refs))
    members = (ds.map_batches(light_rows, batch_format="pyarrow")
               .join(common_r, "inner",
                     num_partitions=_join_partitions(join_partitions),
                     on=("h",)))
    dup_part = members.map_batches(tally, batch_format="pyarrow")
    totals = ds.map_batches(totals_partial, batch_format="pyarrow")
    both = totals.union(dup_part).materialize()
    _, refs = exchange_reduce(both, "doc_id",
                              sum_cols=("n_spans", "n_dup_spans"))
    return _rd().from_arrow_refs(list(refs))
