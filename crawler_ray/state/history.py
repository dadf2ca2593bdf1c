"""Bounded URL-history eviction (O3).

The reference keeps ``url_history`` as a dict keyed by normalized URL;
after every successful visit, if the dict exceeds ``max_urls`` it drops
the 100 oldest entries by ``visited_at`` (``core/crawler.py:218-222``).

Replaying that serial loop row-by-row would be a driver bottleneck, but
the loop has a closed form: every eviction fires exactly when the dict
reaches ``max_urls + 1`` and removes ``evict_chunk`` entries, and since
inserts always enter at the newest end while evictions always remove
the oldest end, the dict is at all times the top-``size`` keys ordered
by latest visit time.  After ``n`` inserts:

    evictions e = ceil((n - max_urls) / evict_chunk)   (0 if n <= max)
    size(n)     = n - e * evict_chunk

so the retained set is a ``sort(desc) + limit(size(n))`` — two streaming
passes (one to count, one to cut), no per-row driver loop.  The count
pass is inherent: the reference's ``len(url_history)`` needs it too.

Exactness: the closed form counts inserts as DISTINCT keys (each key's
visits collapse to its latest ``visited_at`` first).  When a URL is
revisited while still in the dict, the reference updates it in place
without growing ``len`` — identical to the collapse; a URL revisited
AFTER being evicted re-enters and re-grows ``len``, which the collapse
undercounts.  For crawl traces (each URL fetched once per run) the
replay is exact; ``tests/test_history.py`` pins it against a literal
serial replay of the reference loop.
"""

from __future__ import annotations

import math

__all__ = ["evict_history", "retained_size"]


def retained_size(n: int, max_urls: int = 10000,
                  evict_chunk: int = 100) -> int:
    """Final history size after ``n`` unique-key inserts."""
    if n <= max_urls:
        return n
    return n - evict_chunk * math.ceil((n - max_urls) / evict_chunk)


def evict_history(ds, max_urls: int = 10000, evict_chunk: int = 100,
                  key: str = "url", ts: str = "visited_at"):
    """Retained history view of a visit log Dataset.

    ``ds`` holds one row per visit with a ``key`` column (URL) and a
    ``ts`` column (visit time).  Returns the rows the reference's
    bounded dict would still hold after replaying the log in time
    order: latest visit per key, newest ``size(n)`` keys by
    ``(ts, key)`` descending (the key tie-break makes equal-timestamp
    eviction deterministic, where the reference relies on dict
    insertion order).
    """
    from ray.data.aggregate import Max

    # materialize the aggregate output (one row per key, already an
    # all-to-all fence) so count + sort don't each re-execute the
    # upstream groupby over the full visit log
    latest = ds.groupby(key).aggregate(Max(ts, alias_name=ts)).materialize()
    n = latest.count()
    keep = retained_size(n, max_urls, evict_chunk)
    return (latest
            .sort([ts, key], descending=[True, True])
            .limit(keep))


def history_eviction(sf_dir: str, max_urls: int = 500,
                     evict_chunk: int = 100):
    """Driver query (O3): retained-history view after replaying the
    reference's bounded-dict eviction over the events log — event_id
    as the history key, ts as visited_at.  max_urls scaled to 500 so
    eviction actually fires at test scale (reference default 10000,
    ``config/settings.py`` / ``core/crawler.py:218-222``)."""
    import os

    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "ts"])
    return evict_history(ds, max_urls=max_urls, evict_chunk=evict_chunk,
                         key="event_id", ts="ts")
