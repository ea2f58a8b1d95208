"""RefinedWeb-style URL soft-score filter (functions/columns.py:
url_block_score / url_quality_gate)."""

from pyspark.sql import functions as F

from webcrawler_spark.functions import columns as C

WORDS = {"casino": 1.0, "poker": 0.8, "free-money": 0.5}


def _run(spark, urls, **gate_kw):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = df.select(
        "url",
        F.round(C.url_block_score(F.col("url"), WORDS), 2).alias("s"),
        C.url_quality_gate(F.col("url"), soft_words=WORDS, **gate_kw).alias(
            "keep"
        ),
    ).collect()
    return {r["url"]: (r["s"], r["keep"]) for r in rows}


def test_soft_scores_accumulate(spark):
    got = _run(
        spark,
        [
            "https://a.example.com/article/1",        # clean
            "https://a.example.com/poker/1",          # 0.8 < 1 -> keep
            "https://a.example.com/poker/free-money", # 1.3 -> block
            "https://casino.example.com/poker",       # 1.8 -> block
        ],
    )
    assert got["https://a.example.com/article/1"] == (0.0, True)
    assert got["https://a.example.com/poker/1"] == (0.8, True)
    assert got["https://a.example.com/poker/free-money"] == (1.3, False)
    assert got["https://casino.example.com/poker"] == (1.8, False)


def test_threshold_boundary_blocks_at_exactly_one(spark):
    got = _run(spark, ["https://a.example.com/casino"])
    assert got["https://a.example.com/casino"] == (1.0, False)


def test_hard_host_blocks_clean_url(spark):
    got = _run(
        spark,
        ["https://www.Bad.example.net/article/1"],
        hard_hosts=("bad.example.net",),  # surt host: lowercased, www-less
    )
    assert got["https://www.Bad.example.net/article/1"] == (0.0, False)


def test_no_python_udf(spark):
    df = spark.createDataFrame([("https://x/y",)], ["url"])
    plan = (
        df.select(C.url_block_score(F.col("url"), WORDS))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
