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


# ---------------------------------------------------------------------------
# in-loop wiring (CrawlConfig.mine_dust): rules learned from fetched evidence
# strip later aliases BEFORE the fetch


def _dust_web_dfs(spark, tmp_path_factory):
    from webcrawler_spark import synth

    web = synth.generate_web(seed=42, n_hosts=6, n_pages=60, dust_sessions=2)
    d = tmp_path_factory.mktemp("dustweb")
    synth.write_parquet(web, str(d))
    return (
        spark.read.parquet(f"{d}/pages.parquet"),
        spark.read.parquet(f"{d}/seeds.parquet"),
        spark.read.parquet(f"{d}/robots.parquet"),
    )


def test_mine_dust_skips_late_aliases_without_losing_content(
    spark, tmp_path_factory
):
    from webcrawler_spark.config import CrawlConfig
    from webcrawler_spark.plans import epoch as E
    from webcrawler_spark.storage.catalog import Catalog

    pages_df, seeds_df, robots_df = _dust_web_dfs(spark, tmp_path_factory)
    n_epochs = 4

    def run(tag, mine):
        # generous politeness budget so both crawls converge; the savings
        # metric is SCHEDULED fetch attempts (pages_fetched counts the
        # content-deduped web_content delta, which alias fetches never
        # enter by definition — they are duplicate bodies)
        cfg = CrawlConfig(epoch_seconds=60, hot_host_salt=2, mine_dust=mine,
                          dust_min_groups=2)
        root = tmp_path_factory.mktemp(tag)
        cat = Catalog(spark, str(root))
        counters = E.run_epochs(
            spark, cat, pages_df, seeds_df, robots_df, n_epochs, cfg
        )
        web = cat.read_delta_union("web_content", n_epochs - 1)
        hashes = {r["content_hash"] for r in web.select("content_hash").collect()}
        sched = cat.read_delta_union("schedule", n_epochs - 1)
        sched_urls = [r["url_norm"] for r in sched.select("url_norm").collect()]
        return counters, hashes, sched_urls

    c_off, h_off, s_off = run("dust_off", mine=False)
    c_on, h_on, s_on = run("dust_on", mine=True)

    # rules were learned (the ?affid evidence exists from epoch 1 on)
    assert any(c.get("dust_rule_hosts", 0) > 0 for c in c_on)
    # mining saves scheduled fetch attempts, all of them alias URLs
    assert len(s_on) < len(s_off)
    avoided = set(s_off) - set(s_on)
    assert avoided and all("affid" in u for u in avoided)
    # alias attempts specifically shrink
    assert (
        sum("affid" in u for u in s_on) < sum("affid" in u for u in s_off)
    )
    # no DISTINCT content was lost — only duplicate bodies were skipped
    assert h_off == h_on


def test_strip_params_by_rules_column(spark):
    from pyspark.sql import functions as F

    from webcrawler_spark.functions import columns as C

    df = spark.createDataFrame(
        [
            ("https://a.com/x?sid=1&page=2", ["sid"]),
            ("https://a.com/x?sid=1", ["sid"]),
            ("https://a.com/x?page=2", ["sid"]),
            ("https://a.com/x", ["sid"]),
            ("https://a.com/x?sid=1", []),
            ("https://a.com/x?sid=1", None),
        ],
        "url string, rules array<string>",
    )
    out = [
        r["out"]
        for r in df.select(
            C.strip_params_by_rules(F.col("url"), F.col("rules")).alias("out")
        ).collect()
    ]
    assert out == [
        "https://a.com/x?page=2",
        "https://a.com/x",
        "https://a.com/x?page=2",
        "https://a.com/x",
        "https://a.com/x?sid=1",
        "https://a.com/x?sid=1",
    ]
