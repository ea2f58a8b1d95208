"""Pure-function tests for the scaling-pair harness in bench.py.

The concurrent lo∥hi design (bench.py:_run_concurrent_pair) rests on two
small pieces of logic that must be exactly right: trial/window overlap
selection (a hi trial in the lo child's quiet tail must be excluded — the
bias that sank the naive concurrent design) and CHILD_RESULT parsing from
mixed Spark log output. No Spark session needed."""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

_BENCH_PATH = os.path.join(os.path.dirname(__file__), "..", "bench.py")
_spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH_PATH)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _tr(t0: float, t1: float, n: int = 1000) -> dict:
    return {
        "t_start": t0,
        "t_end": t1,
        "n_urls": n,
        "seconds": t1 - t0,
        "urls_per_sec": n / (t1 - t0) if t1 > t0 else 0.0,
        "sys_busy_avg": 1.0,
    }


class TestOverlapFrac:
    def test_fully_inside(self):
        lo = _tr(0.0, 100.0)
        assert bench._overlap_frac(_tr(10.0, 40.0), lo) == 1.0

    def test_fully_outside_after(self):
        lo = _tr(0.0, 100.0)
        assert bench._overlap_frac(_tr(100.0, 130.0), lo) == 0.0

    def test_fully_outside_before(self):
        lo = _tr(50.0, 100.0)
        assert bench._overlap_frac(_tr(10.0, 50.0), lo) == 0.0

    def test_partial(self):
        lo = _tr(0.0, 100.0)
        # trial spans 80..120: 20 of 40 seconds inside
        assert bench._overlap_frac(_tr(80.0, 120.0), lo) == pytest.approx(0.5)

    def test_zero_duration_trial(self):
        lo = _tr(0.0, 100.0)
        assert bench._overlap_frac(_tr(50.0, 50.0), lo) == 0.0


class TestParseChildResults:
    def test_extracts_all_result_lines_amid_logs(self):
        out = "\n".join(
            [
                "26/08/18 INFO SparkContext: noise",
                "CHILD_RESULT " + json.dumps(_tr(0.0, 10.0)),
                "[Stage 3:====>     (4 + 4) / 16]",
                "CHILD_RESULT " + json.dumps(_tr(20.0, 30.0)),
            ]
        )
        got = bench._parse_child_results(out)
        assert len(got) == 2
        assert got[0]["t_start"] == 0.0 and got[1]["t_start"] == 20.0

    def test_no_results_raises_with_context(self):
        with pytest.raises(RuntimeError, match="child bench failed"):
            bench._parse_child_results("only logs here", "stderr tail")


class TestPairSelection:
    """The selection rule inside _run_concurrent_pair, exercised on the
    recorded shape: duration-weighted mean over trials with >= 50% of
    their timed window inside lo's window."""

    def test_quiet_tail_trial_excluded(self):
        lo = _tr(0.0, 200.0, n=3000)
        trials = [
            _tr(0.0, 100.0, n=8000),     # inside: 80/s
            _tr(100.0, 200.0, n=8000),   # inside: 80/s
            _tr(201.0, 241.0, n=8000),   # quiet tail: 200/s, must not count
        ]
        overlapped = [t for t in trials if bench._overlap_frac(t, lo) >= 0.5]
        assert len(overlapped) == 2
        rate = sum(t["n_urls"] for t in overlapped) / sum(
            t["seconds"] for t in overlapped
        )
        assert rate == pytest.approx(80.0)

    def test_duration_weighting_not_trial_mean(self):
        lo = _tr(0.0, 300.0)
        fast = _tr(0.0, 50.0, n=10000)    # 200/s over 50s
        slow = _tr(50.0, 300.0, n=10000)  # 40/s over 250s
        overlapped = [t for t in overlapped_order(fast, slow) if bench._overlap_frac(t, lo) >= 0.5]
        rate = sum(t["n_urls"] for t in overlapped) / sum(
            t["seconds"] for t in overlapped
        )
        # 20000 urls / 300 s, NOT mean(200, 40) = 120
        assert rate == pytest.approx(20000 / 300)


def overlapped_order(*trials):
    return list(trials)
