"""crawler_ray — a Ray-Data-native web-crawl / extract / dedup engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference crawler (``moslem-mohseni/crawler``, studied
read-only at ``/root/reference``) on top of ``ray.data.Dataset``:

- ``htmlmini``           stdlib HTML DOM (bs4-subset query API)
- ``functions/``         pure scalar/vector fns (urls, text, extract,
                         classify, priority) — shared by oracle and stages
- ``stages/``            Ray Data ``map_batches`` stage functions
- ``state/``             actor-pool state: sharded URL-seen, politeness,
                         metrics
- ``sources/``           corpus fetch-join store, robots/sitemap parsing
- ``pipelines/``         the crawl engine (strict priority-replay mode and
                         relaxed wave mode) + the serial oracle
- ``ops/``               general data-processing operators over parquet
                         tables (dedup family, ANN, text analysis,
                         relational/windowed queries, multimodal stubs)
- ``corpus``             deterministic synthetic Common-Crawl-style corpus
                         generator (pages/robots/sitemaps/seeds tables)

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the test fixture, ``bench.py`` and CLI entry points.
"""

__version__ = "0.1.0"
