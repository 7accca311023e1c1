"""Canary-adaptive bench capture logic (bench.py, VERDICT r4 item 1).

Pure-logic tests: health tiering of a canary capture and the bounded
wait loop's early-exit on a stable "usable" plateau — the two behaviors
that decide how much wall budget the driver bench burns before the
headline config.  No device, no subprocess: _tunnel_canary is stubbed.
"""

import importlib.util
import os
import sys

import pytest


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_health_tiers(bench):
    h = bench._canary_health
    # sub-second RT + fast result-sized fetch: the pristine relay
    assert h({"scalar_rt_s": 0.5, "gather_4m_fetch_s": 0.4}) == "healthy"
    # RT 1-8 s but result fetches still fast: measured at full rate
    # (570.9k reads/s at RT 2.0-2.5 s) -> not worth waiting out
    assert h({"scalar_rt_s": 2.1, "gather_4m_fetch_s": 0.4}) == "usable"
    assert h({"scalar_rt_s": 7.9, "gather_4m_fetch_s": 1.9}) == "usable"
    # the r4 regime: 48-54 s round trips
    assert h({"scalar_rt_s": 48.0, "gather_4m_fetch_s": 0.4}) == "degraded"
    # slow result-sized fetches gate throughput regardless of scalar RT
    assert h({"scalar_rt_s": 0.5, "gather_4m_fetch_s": 9.0}) == "degraded"
    # canary never finished / no measurement at all
    assert h({"timeout": True, "scalar_rt_s": 0.5}) == "stalled"
    assert h({}) == "stalled"


def _run_wait(bench, monkeypatch, captures, budget_s=9_999.0):
    seq = iter(captures)

    def fake_canary(budget):
        try:
            return dict(next(seq))
        except StopIteration:  # budget must have stopped the loop first
            pytest.fail("wait loop ran past the scripted captures")

    monkeypatch.setattr(bench, "_tunnel_canary", fake_canary)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    trail: list = []
    last = bench._wait_healthy(trail, budget_s=budget_s)
    return trail, last


HEALTHY = {"scalar_rt_s": 0.5, "gather_4m_fetch_s": 0.4}
USABLE = {"scalar_rt_s": 2.0, "gather_4m_fetch_s": 0.5}
DEGRADED = {"scalar_rt_s": 48.0, "gather_4m_fetch_s": 0.5}


def test_wait_stops_on_first_healthy(bench, monkeypatch):
    trail, last = _run_wait(bench, monkeypatch, [DEGRADED, HEALTHY])
    assert [c["health"] for c in trail] == ["degraded", "healthy"]
    assert last["health"] == "healthy"


def test_wait_stops_after_two_consecutive_usable(bench, monkeypatch):
    trail, last = _run_wait(
        bench, monkeypatch, [DEGRADED, USABLE, USABLE]
    )
    assert [c["health"] for c in trail] == ["degraded", "usable", "usable"]
    assert last["health"] == "usable"


def test_usable_streak_resets_on_degraded(bench, monkeypatch):
    # usable, degraded, usable, usable -> only the final PAIR ends the wait
    trail, _ = _run_wait(
        bench, monkeypatch, [USABLE, DEGRADED, USABLE, USABLE]
    )
    assert len(trail) == 4


def test_wait_respects_budget_and_records_trail(bench, monkeypatch):
    # all-degraded: loop must stop once the budget is spent and leave the
    # full trail as evidence that no healthy window existed
    t = {"v": 0.0}
    monkeypatch.setattr(bench.time, "time", lambda: t.setdefault(
        "v", 0.0) or t["v"])

    def fake_canary(budget):
        t["v"] += 100.0
        return dict(DEGRADED)

    monkeypatch.setattr(bench, "_tunnel_canary", fake_canary)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    trail: list = []
    bench._wait_healthy(trail, budget_s=250.0)
    assert 2 <= len(trail) <= 4
    assert all(c["health"] == "degraded" for c in trail)
