"""Per-stage metrics counters (Prometheus-style snapshot dict).

Replaces the reference's lock-guarded stats dicts
(``core/crawler.py:175-182,335-351``; ``core/storage.py:50-57``).  Stages
increment in batches (one RPC per map_batches call at most); the driver
snapshots per wave and embeds the counters in each lineage manifest.
"""

from __future__ import annotations

import time

__all__ = ["MetricsCore", "make_metrics_actor"]


class MetricsCore:
    def __init__(self):
        self.counters: dict[str, float] = {}
        self.start_time = time.time()

    def incr(self, deltas: dict[str, float]) -> None:
        for k, v in deltas.items():
            self.counters[k] = self.counters.get(k, 0) + v

    def snapshot(self) -> dict:
        out = dict(self.counters)
        elapsed = max(time.time() - self.start_time, 1e-9)
        out["elapsed_sec"] = elapsed
        # parity metric with the reference's urls_per_minute
        # (core/crawler.py:344-349)
        if "urls_visited" in out:
            out["urls_per_minute"] = out["urls_visited"] / elapsed * 60
        return out

    def reset(self) -> None:
        self.counters.clear()
        self.start_time = time.time()


def make_metrics_actor(num_cpus: float = 0.05):
    import ray
    return ray.remote(num_cpus=num_cpus)(MetricsCore).remote()
