"""Phase machine (S8/F9) — reference thresholds
(``scripts/smart_crawler.py:92-97,403-420,450-462``), pure logic plus a
fake-engine daemon loop (no Ray)."""

from __future__ import annotations

import json

from crawler_ray.pipelines.daemon import (PHASE_FREQ_MINUTES, PhaseMachine,
                                          SmartCrawlDaemon)


def test_initial_to_active_on_urls():
    m = PhaseMachine()
    m.record_cycle(101, 101)
    assert m.update_phase(now_min=5) == "active"
    assert m.transitions == [{"from": "initial", "to": "active",
                              "at_min": 5}]


def test_initial_to_active_on_time():
    m = PhaseMachine()
    m.record_cycle(3, 3)
    assert m.update_phase(now_min=30) == "initial"
    assert m.update_phase(now_min=61) == "active"


def test_active_needs_low_new_content():
    m = PhaseMachine()
    m.record_cycle(2000, 2000)          # 100% new
    m.update_phase(now_min=1)           # -> active
    assert m.update_phase(now_min=300) == "active"  # too much new content
    m.record_cycle(18000, 1000)         # now ~15% new overall
    assert m.new_content_pct < 20
    assert m.update_phase(now_min=301) == "steady"


def test_steady_to_maintenance():
    m = PhaseMachine()
    m.record_cycle(200, 200)
    m.update_phase(1)
    m.record_cycle(5000, 300)
    m.update_phase(2)
    assert m.phase == "steady"
    m.record_cycle(100000, 1000)
    assert m.new_content_pct < 5
    assert m.update_phase(3) == "maintenance"


def test_jitter_bounds_and_determinism():
    a = PhaseMachine(seed=1)
    b = PhaseMachine(seed=1)
    for _ in range(20):
        s = a.sleep_minutes()
        assert 0.8 * PHASE_FREQ_MINUTES["initial"] <= s \
            <= 1.2 * PHASE_FREQ_MINUTES["initial"]
    assert b.sleep_minutes() == PhaseMachine(seed=1).sleep_minutes()


def test_state_round_trip(tmp_path):
    m = PhaseMachine()
    m.record_cycle(150, 120)
    m.update_phase(10)
    m2 = PhaseMachine()
    m2.restore(json.loads(json.dumps(m.state())))
    assert m2.state() == m.state()


class _FakeEngine:
    """Visits 120 URLs the first run, nothing new after (bounded corpus)."""

    def __init__(self):
        self.calls = []

    def run(self, mode="wave", resume=False):
        self.calls.append((mode, resume))
        return {"stats": {"visited": 120}}


def test_daemon_cycles(tmp_path):
    fake_clock = [0.0]
    slept = []

    def clock():
        return fake_clock[0]

    def sleep(sec):
        slept.append(sec)
        fake_clock[0] += sec

    eng = _FakeEngine()
    d = SmartCrawlDaemon(eng, str(tmp_path / "daemon.json"),
                         minute_seconds=1.0, clock=clock, sleep=sleep)
    out = d.run(max_cycles=3)
    # first cycle fresh, later cycles resume; 120 new then 0 new
    assert eng.calls == [("wave", False), ("wave", True), ("wave", True)]
    assert out["state"]["urls_processed"] == 120
    assert out["phase"] == "active"       # >100 URLs processed
    assert len(slept) == 2                # no sleep after the last cycle
    # resumable: a new daemon restores the saved phase state
    d2 = SmartCrawlDaemon(eng, str(tmp_path / "daemon.json"),
                          minute_seconds=1.0, clock=clock, sleep=sleep)
    assert d2.machine.phase == "active"
    assert d2.machine.urls_processed == 120
