"""Adaptive crawl daemon — the reference's smart-crawl phase machine
(S8/F9, ``scripts/smart_crawler.py:65-462``) as driver-side loop control
between bounded crawl runs.

Phases and cadences (``scripts/smart_crawler.py:92-97``):
    initial -> every 1 min, active -> 30 min, steady -> 180 min,
    maintenance -> 1440 min, each sleep jittered ±20%
    (``:450-462`` — seeded RNG here so runs are reproducible).

Transitions (``scripts/smart_crawler.py:403-420``):
    initial -> active:       >100 URLs processed or >60 min in phase
    active -> steady:        (>1000 URLs or >240 min) and <20% new content
    steady -> maintenance:   (>5000 URLs or >1440 min) and <5% new content

Each cycle runs the wave engine with ``resume=True`` (the reference's
incremental mode — NB its ``incremental_crawl.py:52`` calls a checkpoint
API that doesn't exist on its Crawler; here checkpointing is a real
engine API).  Time is injected (``clock``) so the machine is unit-testable
without sleeping; the default clock is wall time with real sleeps scaled
by ``minute_seconds`` (set it small for bounded-corpus runs).
"""

from __future__ import annotations

import json
import os
import random
import time

__all__ = ["PhaseMachine", "SmartCrawlDaemon", "PHASE_FREQ_MINUTES"]

PHASE_FREQ_MINUTES = {"initial": 1, "active": 30, "steady": 180,
                      "maintenance": 1440}


class PhaseMachine:
    """Pure phase-transition logic (unit-tested without any crawling)."""

    def __init__(self, seed: int = 42):
        self.phase = "initial"
        self.phase_started_min = 0.0
        self.urls_processed = 0
        self.urls_new_content = 0
        self.transitions: list[dict] = []
        self._rng = random.Random(seed)

    @property
    def new_content_pct(self) -> float:
        # The reference divides by max(1, urls_processed)
        # (``scripts/smart_crawler.py:403-420``): zero processed => 0.0,
        # so a pure time-threshold trigger still transitions active->steady.
        return (100.0 * self.urls_new_content
                / max(1, self.urls_processed))

    def record_cycle(self, processed: int, new_content: int) -> None:
        self.urls_processed += processed
        self.urls_new_content += new_content

    def update_phase(self, now_min: float) -> str:
        """Apply the reference's thresholds; returns the (possibly new)
        phase.  ``now_min`` is minutes since daemon start."""
        in_phase = now_min - self.phase_started_min
        old = self.phase
        if self.phase == "initial":
            if self.urls_processed > 100 or in_phase > 60:
                self.phase = "active"
        elif self.phase == "active":
            if ((self.urls_processed > 1000 or in_phase > 240)
                    and self.new_content_pct < 20.0):
                self.phase = "steady"
        elif self.phase == "steady":
            if ((self.urls_processed > 5000 or in_phase > 1440)
                    and self.new_content_pct < 5.0):
                self.phase = "maintenance"
        if self.phase != old:
            self.transitions.append({"from": old, "to": self.phase,
                                     "at_min": now_min})
            self.phase_started_min = now_min
        return self.phase

    def sleep_minutes(self) -> float:
        """Cadence for the current phase with ±20% seeded jitter
        (``scripts/smart_crawler.py:450-462``)."""
        base = PHASE_FREQ_MINUTES[self.phase]
        return base * (0.8 + 0.4 * self._rng.random())

    # -- state round-trip (S8) ----------------------------------------------
    def state(self) -> dict:
        return {"phase": self.phase,
                "phase_started_min": self.phase_started_min,
                "urls_processed": self.urls_processed,
                "urls_new_content": self.urls_new_content,
                "transitions": self.transitions}

    def restore(self, state: dict) -> None:
        self.phase = state["phase"]
        self.phase_started_min = state["phase_started_min"]
        self.urls_processed = state["urls_processed"]
        self.urls_new_content = state["urls_new_content"]
        self.transitions = list(state["transitions"])


class SmartCrawlDaemon:
    """Driver loop: crawl cycle -> update counters -> phase transition ->
    jittered sleep -> repeat.  ``engine`` needs ``run(mode, resume)``
    returning the wave summary dict."""

    def __init__(self, engine, state_path: str, seed: int = 42,
                 minute_seconds: float = 60.0, clock=time.monotonic,
                 sleep=time.sleep):
        self.engine = engine
        self.state_path = state_path
        self.machine = PhaseMachine(seed)
        self.minute_seconds = minute_seconds
        self._clock = clock
        self._sleep = sleep
        self._t0 = clock()
        if os.path.exists(state_path):
            with open(state_path) as f:
                self.machine.restore(json.load(f))

    def _now_min(self) -> float:
        return (self._clock() - self._t0) / self.minute_seconds

    def save_state(self) -> None:
        tmp = self.state_path + ".tmp"
        os.makedirs(os.path.dirname(self.state_path) or ".", exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(self.machine.state(), f, indent=2)
        os.replace(tmp, self.state_path)

    def run(self, max_cycles: int = 1) -> dict:
        summary = {}
        for cycle in range(max_cycles):
            summary = self.engine.run(mode="wave", resume=cycle > 0
                                      or self.machine.urls_processed > 0)
            stats = summary.get("stats", {})
            visited = stats.get("visited", 0)
            prev = self.machine.urls_processed
            # new content this cycle = newly visited URLs (bounded corpus:
            # a resumed completed crawl visits nothing new)
            self.machine.record_cycle(max(visited - prev, 0),
                                      max(visited - prev, 0))
            self.machine.update_phase(self._now_min())
            self.save_state()
            if cycle + 1 < max_cycles:
                self._sleep(self.machine.sleep_minutes()
                            * self.minute_seconds)
        return {"phase": self.machine.phase,
                "state": self.machine.state(), "last_summary": summary}
