"""Recrawl scheduling (operators/recrawl.py): Cho & Garcia-Molina change-rate
estimator parity vs a pure-Python re-derivation, revisit clamping/tiers, and
the single-shuffle plan shape."""

import datetime as dt
import math

import pytest
from pyspark.sql import Row

from webcrawler_spark.operators import recrawl as RC

T0 = dt.datetime(2024, 1, 1)


def _hist(url, sig_seq, step_hours=12):
    return [
        Row(
            url=url,
            fetch_ts=T0 + dt.timedelta(hours=i * step_hours),
            content_sig=s,
            fetch_id=i,
        )
        for i, s in enumerate(sig_seq)
    ]


def _py_lambda(sigs, step_hours):
    k = len(sigs) - 1
    n = sum(1 for a, b in zip(sigs, sigs[1:]) if a != b)
    span_days = k * step_hours / 24.0
    lam = -math.log((k - n + 0.5) / (k + 0.5)) / (span_days / k)
    return k, n, span_days, lam


def test_change_rates_python_parity(spark):
    rows = (
        _hist("u/stable", ["a"] * 9)                       # n=0
        + _hist("u/flappy", ["a", "b"] * 5)                # every interval changes
        + _hist("u/slow", ["a", "a", "a", "b", "b", "b", "c", "c"], step_hours=24)
        + _hist("u/two", ["a", "b"])                       # k=1 minimum
    )
    df = spark.createDataFrame(rows)
    got = {
        r["url"]: r
        for r in RC.change_rates(
            df, ts_col="fetch_ts", sig_col="content_sig", tiebreak_col="fetch_id"
        ).collect()
    }
    assert set(got) == {"u/stable", "u/flappy", "u/slow", "u/two"}
    for url, sigs, step in [
        ("u/stable", ["a"] * 9, 12),
        ("u/flappy", ["a", "b"] * 5, 12),
        ("u/slow", ["a", "a", "a", "b", "b", "b", "c", "c"], 24),
        ("u/two", ["a", "b"], 12),
    ]:
        k, n, span, lam = _py_lambda(sigs, step)
        r = got[url]
        assert r["k_intervals"] == k
        assert r["n_changes"] == n
        assert r["span_days"] == pytest.approx(span, abs=1e-6)
        assert r["lambda_day"] == pytest.approx(lam, abs=1e-5)
    # never-changed page: (k-0+0.5)/(k+0.5) == 1 exactly -> lambda == 0
    assert got["u/stable"]["lambda_day"] == 0.0
    # page changing every 12h interval: lambda well above 1/day
    assert got["u/flappy"]["lambda_day"] > 2.0


def test_change_rates_null_sigs_and_min_intervals(spark):
    rows = _hist("u/null", [None, None, "a", None]) + _hist("u/one", ["a"])
    df = spark.createDataFrame(rows)
    out = RC.change_rates(
        df, ts_col="fetch_ts", sig_col="content_sig", tiebreak_col="fetch_id"
    )
    got = {r["url"]: r for r in out.collect()}
    # single fetch -> zero intervals -> filtered out
    assert "u/one" not in got
    # null->null is NOT a change; null->a and a->null are
    assert got["u/null"]["n_changes"] == 2


def test_revisit_schedule_clamps_and_tiers(spark):
    rates = spark.createDataFrame(
        [
            Row(url="hot", k_intervals=10, n_changes=10, lambda_day=8.0),
            Row(url="daily", k_intervals=10, n_changes=5, lambda_day=0.5),
            Row(url="cold", k_intervals=10, n_changes=0, lambda_day=0.01),
            Row(url="dead", k_intervals=10, n_changes=0, lambda_day=0.0),
        ]
    )
    got = {r["url"]: r for r in RC.revisit_schedule(rates).collect()}
    assert got["hot"]["revisit_days"] == pytest.approx(0.25)  # clamped to min
    assert got["hot"]["tier"] == "hot"
    assert got["daily"]["revisit_days"] == pytest.approx(2.0)
    assert got["daily"]["tier"] == "daily"
    assert got["cold"]["revisit_days"] == 30.0  # 100d clamped to max
    assert got["cold"]["tier"] == "weekly"
    assert got["dead"]["revisit_days"] == 30.0  # lambda=0 -> max_days


def test_change_rates_single_shuffle_plan(spark):
    df = spark.createDataFrame(_hist("u/a", ["a", "b", "a"]))
    plan = RC.change_rates(
        df, ts_col="fetch_ts", sig_col="content_sig", tiebreak_col="fetch_id"
    )._jdf.queryExecution().executedPlan().toString()
    # the lag window and the per-url agg share one url hash exchange
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BatchEvalPython" not in plan


def test_intervals_hints_prior_vs_posterior(spark):
    """Sitemap-hint fusion: a declared interval replaces the optimistic
    fastest band ONLY for single-fetch URLs; once change data exists the
    measured banding wins; hints clamp to [1, max_interval]; un-hinted
    first visits keep the fastest band."""
    from pyspark.sql import functions as F

    from webcrawler_spark.operators import recrawl as RC

    state = spark.createDataFrame(
        [
            ("u_first_hinted", 1, 0, "h1"),
            ("u_first_plain", 1, 0, "h2"),
            ("u_first_big_hint", 1, 0, "h3"),
            ("u_first_zero_hint", 1, 0, "h4"),
            ("u_hot_hinted", 3, 2, "h5"),   # rate 1.0 -> band 1, hint ignored
            ("u_cold_hinted", 5, 0, "h6"),  # rate 0.0 -> max, hint ignored
        ],
        "url_norm string, n_fetches int, n_changes int, last_hash string",
    )
    hints = spark.createDataFrame(
        [
            ("u_first_hinted", 4),
            ("u_first_hinted", 6),  # same loc in a second sitemap: min wins,
                                    # and the dup must NOT fan out the join
            ("u_first_big_hint", 99),   # clamps to max_interval=8
            ("u_first_zero_hint", 0),   # clamps to 1
            ("u_hot_hinted", 8),
            ("u_cold_hinted", 2),
        ],
        "url_norm string, hint_epochs int",
    )
    rows = RC.intervals_from_state(state, hints=hints).collect()
    assert len(rows) == 6  # duplicate hint did not fan out the state join
    got = {r["url_norm"]: r["interval_epochs"] for r in rows}
    assert got == {
        "u_first_hinted": 4,
        "u_first_plain": 1,
        "u_first_big_hint": 8,
        "u_first_zero_hint": 1,
        "u_hot_hinted": 1,
        "u_cold_hinted": 8,
    }
    # without hints: identical to prior behavior
    base = {
        r["url_norm"]: r["interval_epochs"]
        for r in RC.intervals_from_state(state).collect()
    }
    assert base["u_first_hinted"] == 1 and base["u_hot_hinted"] == 1
