"""Unit tests for bench.py's measurement protocol (timed_best) — the
noise-retry recording added per ADVICE r9 must fire above the
threshold, record every discarded reading, and stay honest about
whether the query cleared. Scripted durations, no Spark."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import timed_best  # noqa: E402


def scripted(durations):
    it = iter(durations)

    def run_once():
        return next(it), 42

    return run_once


def test_no_budget_no_retry():
    # two sub-second runs extend to four; no budget -> no retry record
    best, n, info = timed_best(scripted([0.5, 0.4, 0.45, 0.41]), None)
    assert best == 0.4 and n == 42 and info is None


def test_fast_query_stops_at_two_runs_when_over_a_second():
    best, _, info = timed_best(scripted([1.5, 1.4]), 2.0)
    assert best == 1.4 and info is None  # under max(4.0, 2.3): clean


def test_retry_fires_records_and_clears():
    # budget 1.0 -> threshold max(2.0, 1.3) = 2.0; two slow reads,
    # the retry finds 1.1 -> cleared, with the discard recorded
    best, _, info = timed_best(scripted([3.0, 2.9, 1.1]), 1.0)
    assert best == 1.1
    assert info == {
        "retries": 1,
        "discarded_sec": [2.9],
        "kept_sec": 1.1,
        "threshold_sec": 2.0,
        "cleared": True,
    }


def test_retry_exhausts_and_stays_flagged():
    # every reading stays above threshold: 2 retries, cleared=False.
    # The worse retry readings are what's discarded (r11 fix: a
    # non-improving retry records ITSELF, not a copy of the kept best)
    best, _, info = timed_best(scripted([3.0, 2.9, 3.1, 3.2]), 1.0)
    assert best == 2.9
    assert info["retries"] == 2
    assert info["discarded_sec"] == [3.1, 3.2]
    assert info["kept_sec"] == 2.9
    assert info["cleared"] is False


def test_sub_second_readings_get_extra_runs():
    # all sub-second: protocol takes 4 runs before any retry logic
    seen = []

    def run_once():
        seen.append(1)
        return 0.2, 7

    best, n, info = timed_best(run_once, 5.0)
    assert len(seen) == 4 and best == 0.2 and info is None


def test_absolute_floor_suppresses_noise_on_tiny_budgets():
    # budget 0.01 -> threshold 0.31: a 0.25s reading is NOT retried
    best, _, info = timed_best(scripted([0.25, 0.26, 0.27, 0.25]), 0.01)
    assert best == 0.25 and info is None


def test_ambient_ratio_takes_min_of_runs():
    # r12 (VERDICT item 2): the canary takes the min of its runs so a
    # one-off stall on one run cannot read as host drift
    from bench import ambient_ratio

    assert ambient_ratio(scripted([0.60, 0.42]), 0.28) == 1.5
    # order-independent
    assert ambient_ratio(scripted([0.42, 0.60]), 0.28) == 1.5


def test_ambient_ratio_none_without_budget():
    from bench import ambient_ratio

    assert ambient_ratio(scripted([0.5, 0.5]), None) is None
    assert ambient_ratio(scripted([0.5, 0.5]), 0.0) is None
