"""Hash-bucketed corpus layout + the simulated-fetch join (SURVEY §2 J7).

The reference fetches live over HTTP (``utils/http.py:244-332``); here
"fetch" is a point-lookup join of the frontier against the Parquet pages
corpus.  At 10^10-URL scale the corpus must never be scanned per wave, so
it is bucketized ONCE by ``sha1(url) % B`` into ``bucket=NN/`` directories
(each sorted by url, small row groups -> min/max stats prune row groups on
``url IN (...)`` filters).  A fetch is then:

    frontier -> add bucket column -> groupby(bucket)
             -> per-bucket task reads ONLY its bucket with an `isin`
                filter and hash-joins in memory

i.e. the only shuffle is of the (tiny) frontier rows; corpus bytes move
once from storage to the task that needs them.  Misses (URLs not in the
corpus) surface as ``status_code=404, html=None`` rows, mirroring the
reference's failed-fetch shape (``utils/http.py:265-272``).
"""

from __future__ import annotations

import hashlib
import json
import os
from urllib.parse import urlparse

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

__all__ = ["CorpusStore", "bucket_of_url", "host_bucket_of_url"]

def bucket_of_url(url: str, num_buckets: int) -> int:
    return int.from_bytes(hashlib.sha1(url.encode()).digest()[:8],
                          "big") % num_buckets


def _pruning_url_filter(urls: list[str]):
    """Point-lookup filter that actually prunes parquet row groups: arrow
    does not use row-group statistics for a bare ``isin``, but it does for
    range comparisons — so wrap the isin in the urls' [min, max] range
    (buckets are url-sorted, callers pass sorted runs when they can)."""
    return ((pc.field("url") >= min(urls))
            & (pc.field("url") <= max(urls))
            & pc.field("url").isin(urls))


def host_bucket_of_url(url: str, num_buckets: int) -> int:
    """Corpus bucket key = hash(host): a host's pages co-locate with its
    politeness/URL-seen state (north-rule sharding), so the wave pipeline
    can stamp politeness AND fetch in one groupby."""
    host = urlparse(url).netloc
    return int.from_bytes(hashlib.sha1(host.encode()).digest()[:8],
                          "big") % num_buckets


class CorpusStore:
    """A bucketized pages corpus on disk.

    Layout: ``<root>/bucket=NN/part-*.parquet`` + ``_STORE.json`` manifest
    (num_buckets, row count).  Build is idempotent and resumable: each
    bucket directory is written atomically and skipped when present.
    """

    LAYOUT_KEY = "host"  # bucketing key; bump when the layout changes

    def __init__(self, root: str):
        self.root = root
        with open(os.path.join(root, "_STORE.json")) as f:
            meta = json.load(f)
        if meta.get("key") != self.LAYOUT_KEY:
            raise ValueError(
                f"corpus store at {root} uses stale layout "
                f"{meta.get('key')!r}; delete it to rebuild")
        self.num_buckets: int = meta["num_buckets"]
        self.num_rows: int = meta.get("num_rows", -1)

    # -- build --------------------------------------------------------------
    @staticmethod
    def build(pages_path: str, root: str, num_buckets: int = 16,
              columns: list[str] | None = None,
              extra_tables: list[pa.Table] | None = None) -> "CorpusStore":
        """Bucketize ``pages_path`` into ``root``.  Uses a streaming
        pyarrow scan (batch-at-a-time, constant memory) — suitable for the
        sandbox scales; the same layout would be produced at cluster scale
        by a Ray ``map_batches`` + ``partition_cols`` write.

        ``extra_tables`` rows (at least url + html columns; e.g. sitemap
        bodies, which the reference fetches through the same HTTP path,
        ``core/crawler.py:1292``) are merged into the store so the fetch
        join resolves them uniformly."""
        manifest = os.path.join(root, "_STORE.json")
        if os.path.exists(manifest):
            try:
                return CorpusStore(root)
            except ValueError:
                import shutil as _sh
                _sh.rmtree(root)
                os.makedirs(root, exist_ok=True)
        os.makedirs(root, exist_ok=True)
        dataset = pads.dataset(pages_path, format="parquet")
        # large corpora bucketize distributed (one groupby(bucket) pass,
        # each bucket written url-sorted by its own task); the serial
        # streaming path below stays for oracle/unit-test scale
        try:
            import ray
            ray_up = ray.is_initialized()
        except ImportError:      # pragma: no cover
            ray_up = False
        if ray_up and dataset.count_rows() > 20_000:
            return CorpusStore._build_ray(dataset, pages_path, root,
                                          num_buckets, columns,
                                          extra_tables, manifest)
        cols = columns or dataset.schema.names
        buffers: dict[int, list[pa.Table]] = {b: [] for b in range(num_buckets)}
        n_rows = 0
        import itertools

        def _extra_batches():
            for t_extra in (extra_tables or []):
                arrays, names = [], []
                for c in cols:
                    names.append(c)
                    if c in t_extra.column_names:
                        arrays.append(t_extra[c].combine_chunks())
                    else:
                        typ = dataset.schema.field(c).type
                        arrays.append(pa.nulls(t_extra.num_rows, type=typ))
                yield from pa.Table.from_arrays(arrays,
                                                names=names).to_batches()

        for batch in itertools.chain(dataset.to_batches(columns=cols),
                                     _extra_batches()):
            if batch.num_rows == 0:
                continue
            t = pa.Table.from_batches([batch])
            urls = t["url"].to_pylist()
            bucket_ids = pa.array(
                [host_bucket_of_url(u, num_buckets) for u in urls],
                pa.int32())
            for b in range(num_buckets):
                mask = pc.equal(bucket_ids, b)
                if pc.any(mask).as_py():
                    buffers[b].append(t.filter(mask))
            n_rows += t.num_rows
        for b, parts in buffers.items():
            bdir = os.path.join(root, f"bucket={b:04d}")
            tmp = bdir + ".tmp"
            os.makedirs(tmp, exist_ok=True)
            if parts:
                table = pa.concat_tables(parts)
                table = table.sort_by("url")
            else:
                table = dataset.head(0)
            # small row groups: the fetch join reads with url-isin
            # filters, and row-group min/max pruning is the unit of
            # decompression — 256 rows ≈ a few MB even at CC page sizes
            pq.write_table(table, os.path.join(tmp, "part-0.parquet"),
                           row_group_size=256)
            os.rename(tmp, bdir)
        with open(manifest, "w") as f:
            json.dump({"num_buckets": num_buckets, "num_rows": n_rows,
                       "key": CorpusStore.LAYOUT_KEY}, f)
        return CorpusStore(root)

    @staticmethod
    def _build_ray(dataset, pages_path: str, root: str, num_buckets: int,
                   columns, extra_tables, manifest: str) -> "CorpusStore":
        """Distributed bucketize: the 100-TB-shaped path (a
        ``groupby(bucket)`` shuffle where each bucket group sorts by url
        and writes its own parquet atomically)."""
        import json

        import pandas as pd
        import ray.data as rd

        cols = columns or dataset.schema.names
        n_rows = dataset.count_rows()
        ds = rd.read_parquet(pages_path, columns=list(cols))
        if extra_tables:
            schema = dataset.schema
            fixed = []
            for t_extra in extra_tables:
                arrays = [
                    (t_extra[c].combine_chunks() if c in t_extra.column_names
                     else pa.nulls(t_extra.num_rows,
                                   type=schema.field(c).type))
                    for c in cols
                ]
                fixed.append(pa.Table.from_arrays(arrays, names=list(cols)))
                n_rows += t_extra.num_rows
            ds = ds.union(rd.from_arrow(pa.concat_tables(fixed)))

        # salt each host-bucket into sub-groups: a Zipf mega-host can
        # carry multiple GB of html, and >2 GB of binary in ONE shuffle
        # group overflows 32-bit arrow offsets (and serializes the write);
        # each (bucket, salt) group writes its own url-sorted part — the
        # point-lookup filter prunes row groups per file just the same
        n_salt = 16

        def add_bucket(t: pa.Table) -> pa.Table:
            urls = t["url"].to_pylist()
            b = [host_bucket_of_url(u, num_buckets) for u in urls]
            s = [bucket_of_url(u, n_salt) for u in urls]
            return (t.append_column("bucket", pa.array(b, pa.int32()))
                    .append_column("salt", pa.array(s, pa.int32())))

        def write_bucket(g: pa.Table) -> pa.Table:
            # arrow-native group handling: binary html never round-trips
            # through pandas object dtype
            b = int(g["bucket"][0].as_py())
            salt = int(g["salt"][0].as_py())
            table = g.drop_columns(["bucket", "salt"]).sort_by("url")
            bdir = os.path.join(root, f"bucket={b:04d}")
            os.makedirs(bdir, exist_ok=True)
            tmp = os.path.join(bdir, f".part-{salt:02d}.tmp")
            pq.write_table(table, tmp, row_group_size=256)
            os.replace(tmp, os.path.join(bdir, f"part-{salt:02d}.parquet"))
            return pa.table({"bucket": pa.array([b], pa.int32()),
                             "rows": pa.array([g.num_rows], pa.int64())})

        (ds.map_batches(add_bucket, batch_format="pyarrow")
         .groupby(["bucket", "salt"]).map_groups(write_bucket,
                                                 batch_format="pyarrow")
         .materialize())
        # empty buckets still need a (schema-bearing) file for readers
        empty = dataset.head(0)
        for b in range(num_buckets):
            bdir = os.path.join(root, f"bucket={b:04d}")
            if not os.path.exists(bdir):
                os.makedirs(bdir, exist_ok=True)
                pq.write_table(empty.select(list(cols)),
                               os.path.join(bdir, "part-0.parquet"))
        with open(manifest, "w") as f:
            json.dump({"num_buckets": num_buckets, "num_rows": n_rows,
                       "key": CorpusStore.LAYOUT_KEY}, f)
        return CorpusStore(root)

    # -- lookups ------------------------------------------------------------
    def bucket_path(self, bucket: int) -> str:
        return os.path.join(self.root, f"bucket={bucket:04d}")

    def bucket_for_url(self, url: str) -> int:
        return host_bucket_of_url(url, self.num_buckets)

    # NB: the live fetch paths are ``pipelines/wave.py:_FetchFn`` (per-batch
    # pruned bucket reads inside the wave pipeline) and
    # ``pipelines/crawl.py:_process_bucket`` (strict replay); earlier
    # ``fetch_local``/``fetch_join`` convenience wrappers were removed as
    # dead code (and fetch_join round-tripped binary html through pandas).
