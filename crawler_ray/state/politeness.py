"""Per-host politeness budgets in virtual time + robots admission.

The reference enforces politeness with a single wall-clock
``last_request_time`` + sleep (``utils/http.py:200-226``; robots
crawl-delay can raise the delay, ``:213-216``).  With a simulated fetch
there is nothing to sleep for, so the budget runs in *virtual time*: each
visit to host h is stamped ``fetch_vts = last_vts[h] + delay[h]`` (first
visit at 0).  The stamps provide per-host rate accounting (a crawl trace
whose per-host timestamps respect crawl-delay budgets) without changing
visit order — matching the reference, which pops a job first and then
waits (``core/crawler.py:775`` -> ``utils/http.py:219-224``).

``PolitenessCore`` is the per-shard logic; ``PolitenessPool`` shards it by
``host_hash % S`` (same routing as the URL-seen pool so one host's state
never crosses shards).  The relaxed wave pipeline instead stamps vts
deterministically with a per-wave groupby(host) rank (see
``pipelines/crawl.py``), updating the same core between waves.
"""

from __future__ import annotations

from urllib.parse import urlparse

from crawler_ray.sources.robots import RobotsTable

__all__ = ["PolitenessCore", "PolitenessPool"]


class PolitenessCore:
    def __init__(self, robots: RobotsTable | None = None,
                 default_delay: float = 1.0,
                 respect_robots: bool = False):
        self.robots = robots or RobotsTable(default_delay=default_delay)
        self.default_delay = default_delay
        self.respect_robots = respect_robots
        self.last_vts: dict[str, float] = {}

    def delay(self, host: str) -> float:
        return self.robots.delay(host)

    def can_fetch(self, host: str, path: str) -> bool:
        if not self.respect_robots:
            # the reference hard-disables robots enforcement in its main
            # crawler regardless of the flag (core/crawler.py:602)
            return True
        return self.robots.can_fetch(host, path)

    def admit(self, urls: list[str]) -> tuple[list[bool], list[float]]:
        """Serial admission in call order: robots check + vts stamp.
        Returns (allowed, fetch_vts); denied rows get vts -1."""
        allowed, stamps = [], []
        for url in urls:
            p = urlparse(url)
            host = p.netloc
            if not self.can_fetch(host, p.path):
                allowed.append(False)
                stamps.append(-1.0)
                continue
            last = self.last_vts.get(host)
            vts = 0.0 if last is None else last + self.delay(host)
            self.last_vts[host] = vts
            allowed.append(True)
            stamps.append(vts)
        return allowed, stamps

    def bulk_advance(self, host: str, n: int) -> tuple[float, float]:
        """Reserve n visit slots on host; returns (base_vts, delay) so the
        caller can stamp ``base_vts + i*delay`` for i in 0..n-1.  Used by
        the wave pipeline for deterministic distributed stamping."""
        d = self.delay(host)
        last = self.last_vts.get(host)
        base = 0.0 if last is None else last + d
        self.last_vts[host] = base + (n - 1) * d
        return base, d

    def state(self) -> dict:
        return dict(self.last_vts)

    def restore(self, state: dict) -> None:
        self.last_vts = dict(state)


class PolitenessPool:
    """Actor pool sharded by host hash; batched admit RPCs."""

    def __init__(self, robots: RobotsTable | None = None,
                 num_shards: int = 4, default_delay: float = 1.0,
                 respect_robots: bool = False, num_cpus: float = 0.1):
        import ray
        self.num_shards = num_shards
        actor_cls = ray.remote(num_cpus=num_cpus)(PolitenessCore)
        self.shards = [actor_cls.remote(robots=robots,
                                        default_delay=default_delay,
                                        respect_robots=respect_robots)
                       for _ in range(num_shards)]

    def admit(self, urls: list[str], host_hashes) -> tuple[list, list]:
        import ray
        by_shard: dict[int, list[int]] = {}
        for i, hh in enumerate(host_hashes):
            by_shard.setdefault(int(hh) % self.num_shards, []).append(i)
        refs, groups = [], []
        for shard_id, idxs in by_shard.items():
            refs.append(self.shards[shard_id].admit.remote(
                [urls[i] for i in idxs]))
            groups.append(idxs)
        allowed = [False] * len(urls)
        stamps = [-1.0] * len(urls)
        for idxs, (a, s) in zip(groups, ray.get(refs)):
            for j, i in enumerate(idxs):
                allowed[i], stamps[i] = a[j], s[j]
        return allowed, stamps

    def states(self) -> list[dict]:
        import ray
        return ray.get([s.state.remote() for s in self.shards])

    def shutdown(self) -> None:
        import ray
        for s in self.shards:
            ray.kill(s)
        self.shards = []
