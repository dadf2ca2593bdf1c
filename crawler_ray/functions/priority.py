"""URL priority policies — plugin API + vectorized default policy set.

Reimplements the reference's ``URLPriorityPolicyManager``
(``core/crawler.py:441-545``): registered policies are ``(condition,
priority, weight)`` triples combined as a weighted mean, truncated to int
with Python ``int()`` (toward-zero) semantics.  Default policies and their
exact weights come from ``core/crawler.py:498-545``:

- depth_policy:        depth * 10            (weight 1.0, job present)
- list_policy:         -20                   (weight 1.5, job_type 'list')
- detail_policy:       -10                   (weight 1.0, job_type 'detail')
- sitemap_policy:      -30                   (weight 2.0, job_type 'sitemap')
- path_length_policy:  path.count('/') * 5   (weight 0.8, always)

Policies registered through :meth:`PriorityPolicyManager.add_policy` may
optionally supply a vectorized form; the default set is fully vectorized
so the hot canonicalize stage computes priorities with numpy over whole
Arrow batches instead of per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence
from urllib.parse import urlparse

import numpy as np

__all__ = ["PriorityPolicyManager", "default_policy_manager"]


@dataclass
class _Policy:
    name: str
    condition: Callable  # (url, job) -> bool
    priority: Callable   # (url, job) -> number
    weight: float = 1.0
    enabled: bool = True
    # optional vectorized form: (urls, depths, job_types, path_slashes)
    #   -> (applies: bool ndarray, values: float ndarray)
    vector: Optional[Callable] = None


@dataclass
class _Job:
    """Minimal CrawlJob view for policy callables (``core/crawler.py:29-52``)."""
    url: str
    depth: int
    job_type: str


class PriorityPolicyManager:
    """User-extension surface per SURVEY.md §2.10: same registration API as
    the reference (name, condition_func, priority_func, weight, enabled)."""

    def __init__(self):
        self.policies: list[_Policy] = []

    def add_policy(self, name: str, condition_func: Callable,
                   priority_func: Callable, weight: float = 1.0,
                   enabled: bool = True, vector_func: Callable | None = None,
                   ) -> None:
        self.policies.append(_Policy(name, condition_func, priority_func,
                                     weight, enabled, vector_func))

    # -- scalar path (parity with ``core/crawler.py:470-496``) -------------
    def calculate_priority(self, url: str, depth: int = 0,
                           job_type: str = "page") -> int:
        job = _Job(url, depth, job_type)
        priority = 0.0
        total_weight = 0.0
        for policy in self.policies:
            if not policy.enabled:
                continue
            if policy.condition(url, job):
                priority += policy.priority(url, job) * policy.weight
                total_weight += policy.weight
        if total_weight > 0:
            priority = priority / total_weight
        return int(priority)

    # -- vectorized path ---------------------------------------------------
    def calculate_priority_batch(self, urls: Sequence[str],
                                 depths: np.ndarray,
                                 job_types: Sequence[str]) -> np.ndarray:
        """Weighted-mean priorities for a whole batch.  Uses each policy's
        vectorized form when available; rows touched by a non-vectorized
        policy fall back to the scalar path (correctness over speed for
        user plugins)."""
        n = len(urls)
        if any(p.enabled and p.vector is None for p in self.policies):
            return np.array(
                [self.calculate_priority(u, int(d), t)
                 for u, d, t in zip(urls, depths, job_types)],
                dtype=np.int32)

        depths = np.asarray(depths, dtype=np.float64)
        path_slashes = np.fromiter(
            (urlparse(u).path.count("/") for u in urls),
            dtype=np.float64, count=n)
        acc = np.zeros(n, dtype=np.float64)
        weight = np.zeros(n, dtype=np.float64)
        jt = np.asarray(job_types, dtype=object)
        for policy in self.policies:
            if not policy.enabled:
                continue
            applies, values = policy.vector(urls, depths, jt, path_slashes)
            acc += np.where(applies, values * policy.weight, 0.0)
            weight += np.where(applies, policy.weight, 0.0)
        out = np.divide(acc, weight, out=acc.copy(), where=weight > 0)
        # int() truncates toward zero — np.trunc matches, np.floor does not.
        return np.trunc(out).astype(np.int32)


def default_policy_manager() -> PriorityPolicyManager:
    """The reference's default policy set (``core/crawler.py:498-545``)."""
    mgr = PriorityPolicyManager()
    mgr.add_policy(
        "depth_policy",
        condition_func=lambda url, job: job is not None,
        priority_func=lambda url, job: job.depth * 10,
        weight=1.0,
        vector_func=lambda urls, d, jt, ps: (np.ones(len(urls), bool), d * 10),
    )
    mgr.add_policy(
        "list_policy",
        condition_func=lambda url, job: job is not None and job.job_type == "list",
        priority_func=lambda url, job: -20,
        weight=1.5,
        vector_func=lambda urls, d, jt, ps: (jt == "list",
                                             np.full(len(urls), -20.0)),
    )
    mgr.add_policy(
        "detail_policy",
        condition_func=lambda url, job: job is not None and job.job_type == "detail",
        priority_func=lambda url, job: -10,
        weight=1.0,
        vector_func=lambda urls, d, jt, ps: (jt == "detail",
                                             np.full(len(urls), -10.0)),
    )
    mgr.add_policy(
        "sitemap_policy",
        condition_func=lambda url, job: job is not None and job.job_type == "sitemap",
        priority_func=lambda url, job: -30,
        weight=2.0,
        vector_func=lambda urls, d, jt, ps: (jt == "sitemap",
                                             np.full(len(urls), -30.0)),
    )
    mgr.add_policy(
        "path_length_policy",
        condition_func=lambda url, job: True,
        priority_func=lambda url, job: urlparse(url).path.count("/") * 5,
        weight=0.8,
        vector_func=lambda urls, d, jt, ps: (np.ones(len(urls), bool), ps * 5),
    )
    return mgr
