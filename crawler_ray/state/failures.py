"""Failed-URL state: attempts map + retry predicate (M26).

Parity with the reference's ``CrawlState`` failure bookkeeping
(``core/crawler.py:224-333``): each failure is recorded under the
normalized URL as ``{attempts, first_attempt, last_attempt, last_error,
last_status_code}``; ``was_failed`` is membership, ``should_retry``
is ``attempts < max_retries`` (default 3, ``config/settings.py:57``)
with unknown URLs always retryable.

Two honesty notes, verified against the reference source:

- ``should_retry`` has NO caller in the reference — ``add_job``
  (``core/crawler.py:685-735``) gates admission only on
  visited/in-progress/depth/domain, and a failed URL stays in
  ``in_progress``-removed/unvisited limbo without ever being re-queued.
  The predicate is exposed API surface, so it is implemented here as
  exactly that: a resume-time re-admission filter callers can apply,
  not a hidden requeue loop inside the engine (which would diverge
  from observable reference behavior).
- The reference stamps wall-clock ``datetime.now()``; a distributed
  deterministic engine cannot.  Attempt ordinals take the timestamps'
  place (``first_attempt``/``last_attempt`` hold the 1-based attempt
  index); the retry decision only ever reads ``attempts``.

At scale the failures live in the crawl spill (every extracted part
keeps its ``fetch_ok=False`` rows), so the state builds from an Arrow
table with a vectorized ``value_counts`` — never a Python loop over
rows — and only the (tiny) per-URL attempts map is held driver-side.
A 100-TB crawl's failure set is bounded by the frontier's miss rate,
orders of magnitude below the page count.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from crawler_ray.functions.urls import normalize_url

DEFAULT_MAX_RETRIES = 3  # config/settings.py:57


class FailedUrlState:
    """Driver-side attempts map over the failed side table."""

    def __init__(self) -> None:
        self.failed_urls: dict[str, dict] = {}
        self.stats = {"failed_urls": 0}

    def add_failed(self, url: str, error: str | None = None,
                   status_code: int | None = None) -> None:
        """``core/crawler.py:224-259`` minus wall-clock timestamps."""
        u = normalize_url(url)
        rec = self.failed_urls.get(u)
        if rec is not None:
            rec["attempts"] += 1
            rec["last_attempt"] = rec["attempts"]
            rec["last_error"] = error
            rec["last_status_code"] = status_code
        else:
            self.failed_urls[u] = {
                "attempts": 1, "first_attempt": 1, "last_attempt": 1,
                "last_error": error, "last_status_code": status_code,
            }
        self.stats["failed_urls"] += 1

    def was_failed(self, url: str) -> bool:
        """``core/crawler.py:303-315``."""
        return normalize_url(url) in self.failed_urls

    def should_retry(self, url: str,
                     max_retries: int = DEFAULT_MAX_RETRIES) -> bool:
        """``core/crawler.py:317-333``: unknown URLs are retryable;
        known ones while ``attempts < max_retries``."""
        rec = self.failed_urls.get(normalize_url(url))
        return True if rec is None else rec["attempts"] < max_retries

    # ---- vectorized builders -------------------------------------------

    @classmethod
    def from_failed_rows(cls, rows: list[dict]) -> "FailedUrlState":
        """From the strict-mode failed list (url_norm already normalized)."""
        st = cls()
        for r in rows:
            st.add_failed(r["url_norm"], error=r.get("error"),
                          status_code=r.get("status_code"))
        return st

    @classmethod
    def from_table(cls, t: pa.Table) -> "FailedUrlState":
        """From an Arrow table of failure rows (one row per failed
        attempt; ``url_norm`` column required, ``error`` optional).

        Attempt counts come from a vectorized ``value_counts``; the
        last error per URL from a single backward scan over the
        (small) failure table.
        """
        st = cls()
        if t.num_rows == 0:
            return st
        vc = pc.value_counts(t["url_norm"].combine_chunks())
        urls = vc.field("values").to_pylist()
        counts = vc.field("counts").to_pylist()
        errors: dict[str, str | None] = {}
        if "error" in t.column_names:
            ucol = t["url_norm"].to_pylist()
            ecol = t["error"].to_pylist()
            for u, e in zip(ucol, ecol):
                errors[u] = e  # last occurrence wins (document order)
        for u, c in zip(urls, counts):
            st.failed_urls[u] = {
                "attempts": c, "first_attempt": 1, "last_attempt": c,
                "last_error": errors.get(u),
                "last_status_code": None,
            }
            st.stats["failed_urls"] += c
        return st

    def retry_eligible(self,
                       max_retries: int = DEFAULT_MAX_RETRIES) -> list[str]:
        """URLs a resume-time caller may re-admit (sorted for
        determinism)."""
        return sorted(u for u, rec in self.failed_urls.items()
                      if rec["attempts"] < max_retries)


def failed_urls_table(t: pa.Table) -> pa.Table:
    """Aggregate a crawl output table (with ``fetch_ok`` rows) into the
    failed-URLs side view: one row per failed URL with its attempt
    count.  Pure Arrow kernels — usable inside ``map_batches`` per
    block, with the per-URL counts merged by a small driver-side
    combine (failure cardinality ≪ page cardinality)."""
    mask = pc.invert(pc.fill_null(t["fetch_ok"], False))
    f = t.filter(mask)
    if f.num_rows == 0:
        return pa.table({"url_norm": pa.array([], pa.string()),
                         "attempts": pa.array([], pa.int64())})
    vc = pc.value_counts(f["url_norm"].combine_chunks())
    out = pa.table({"url_norm": vc.field("values"),
                    "attempts": vc.field("counts")})
    return out.sort_by("url_norm")
