"""DUST rule mining (operators/dust.py): learned content-irrelevant URL
params from (url, content_hash) evidence — Bar-Yossef et al. WWW'07 shape."""

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.dust import mine_irrelevant_params


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, content_hash string")


def test_session_param_mined_irrelevant_page_relevant(spark):
    rows = []
    # page CHANGES content; sess does not. 3 alias groups per param.
    for item in (1, 2, 3):
        for page in (0, 1):
            for sess in ("a", "b"):
                rows.append(
                    (
                        f"https://s.ex.com/i/{item}?page={page}&sess={sess}",
                        f"hash-{item}-p{page}",
                    )
                )
    out = {
        r["param"]: r
        for r in mine_irrelevant_params(_pages(spark, rows), min_groups=3).collect()
    }
    assert out["sess"]["irrelevant"] is True
    # sess: 6 groups (item x page), all clean, one dup url saved per group
    assert out["sess"]["groups_multi"] == 6
    assert out["sess"]["clean_groups"] == 6
    assert out["sess"]["dup_urls_avoidable"] == 6
    # page: groups are hash-dirty -> relevant
    assert out["page"]["irrelevant"] is False
    assert out["page"]["clean_groups"] == 0


def test_min_support_gate(spark):
    # only 2 multi-valued groups -> below min_groups=3 -> not irrelevant
    rows = [
        ("https://s.ex.com/a?sid=1", "h-a"),
        ("https://s.ex.com/a?sid=2", "h-a"),
        ("https://s.ex.com/b?sid=1", "h-b"),
        ("https://s.ex.com/b?sid=2", "h-b"),
    ]
    out = mine_irrelevant_params(_pages(spark, rows), min_groups=3).collect()
    (row,) = out
    assert row["param"] == "sid"
    assert row["groups_multi"] == 2
    assert row["irrelevant"] is False


def test_other_params_partition_groups(spark):
    # sid clean only within matching 'page' context; a dirty group anywhere
    # on the host kills the verdict for that (host, param)
    rows = [
        ("https://s.ex.com/a?page=1&sid=1", "h1"),
        ("https://s.ex.com/a?page=1&sid=2", "h1"),
        ("https://s.ex.com/a?page=2&sid=1", "h2"),
        ("https://s.ex.com/a?page=2&sid=2", "h2"),
        ("https://s.ex.com/b?page=1&sid=1", "h3"),
        ("https://s.ex.com/b?page=1&sid=2", "DIFFERENT"),
    ]
    out = {
        r["param"]: r
        for r in mine_irrelevant_params(_pages(spark, rows), min_groups=3).collect()
    }
    assert out["sid"]["groups_multi"] == 3
    assert out["sid"]["clean_groups"] == 2
    assert out["sid"]["irrelevant"] is False


def test_no_query_string_urls_ignored(spark):
    rows = [("https://s.ex.com/plain", "h0"), ("https://s.ex.com/other", "h1")]
    assert mine_irrelevant_params(_pages(spark, rows)).count() == 0


def test_plan_has_no_python_and_no_join(spark):
    rows = [("https://s.ex.com/a?x=1&y=2", "h")]
    df = mine_irrelevant_params(_pages(spark, rows))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan  # two hash-aggs, zero joins
