"""Quantile-threshold global top-k (operators/topk.py): exact equality with
ORDER BY ... LIMIT under duplicates, skewed scores, tiny inputs, and k >= n."""

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.topk import threshold_topk


def _reference(df, score, k, idc):
    return [
        (r[idc], r[score])
        for r in df.orderBy(F.desc(score), F.asc(idc)).limit(k).collect()
    ]


def _ours(df, score, k, idc, **kw):
    return [
        (r[idc], r[score])
        for r in threshold_topk(df, score, k, idc, **kw).collect()
    ]


@pytest.mark.parametrize("k", [1, 100, 1500])
def test_matches_full_sort(spark, k):
    # 20k rows, heavy duplicate scores (mod 97) -> boundary ties guaranteed
    df = spark.range(20_000).select(
        F.col("id").alias("rid"),
        F.pmod(F.xxhash64("id"), F.lit(97)).cast("double").alias("score"),
    )
    assert _ours(df, "score", k, "rid") == _reference(df, "score", k, "rid")


def test_small_and_degenerate_inputs(spark):
    df = spark.range(5).select(F.col("id").alias("rid"), F.lit(1.0).alias("score"))
    assert _ours(df, "score", 10, "rid") == _reference(df, "score", 10, "rid")
    empty = df.filter(F.lit(False))
    assert _ours(empty, "score", 3, "rid") == []


def test_all_equal_scores_tiebreak_exact(spark):
    # every row at the boundary: selection is purely the id tiebreak
    df = spark.range(3_000).select(F.col("id").alias("rid"), F.lit(7.0).alias("score"))
    assert _ours(df, "score", 250, "rid") == [(i, 7.0) for i in range(250)]


def test_coarse_sketch_still_exact(spark):
    # a deliberately sloppy sketch (eps=0.2) must still return the exact
    # answer — only the band size (work), not correctness, depends on eps
    df = spark.range(10_000).select(
        F.col("id").alias("rid"),
        (F.xxhash64("id") % 1000).cast("double").alias("score"),
    )
    assert _ours(df, "score", 500, "rid", relative_error=0.2) == _reference(
        df, "score", 500, "rid"
    )


def test_null_scores_match_nulls_last_semantics(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 9.0), (4, None), (5, 1.0)],
        "rid int, score double",
    )
    # k exceeds the non-null count: nulls fill the tail, ordered by id
    got = _ours(df, "score", 5, "rid")
    assert got == [(3, 9.0), (1, 5.0), (5, 1.0), (2, None), (4, None)]
    # k within non-null count: nulls never appear
    assert _ours(df, "score", 2, "rid") == [(3, 9.0), (1, 5.0)]
    # all-null scores
    allnull = spark.createDataFrame([(1, None), (2, None)], "rid int, score double")
    assert _ours(allnull, "score", 1, "rid") == [(1, None)]


def test_zorder_value_interleave_and_locality(spark):
    from pyspark.sql import functions as F

    from webcrawler_spark.operators.topk import zorder_layout_stats, zorder_value

    # hand-checked Morton codes: z(a,b) interleaves a into even bits,
    # b into odd bits
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 3)], ["a", "b"]
    )
    out = {(r["a"], r["b"]): r["z"] for r in df.select(
        "a", "b", zorder_value(F.col("a"), F.col("b"), bits=4).alias("z")
    ).collect()}
    assert out[(0, 0)] == 0 and out[(1, 0)] == 1 and out[(0, 1)] == 2
    assert out[(1, 1)] == 3 and out[(2, 0)] == 4 and out[(3, 3)] == 15
    # locality: on a 16x16 grid split into 16 files, z-order bounds BOTH
    # per-file spans at 3 (a 4x4 tile); a 1-D sort leaves the non-leading
    # span at the full domain (15)
    grid = spark.createDataFrame(
        [(a, b) for a in range(16) for b in range(16)], ["a", "b"]
    )
    zstats = zorder_layout_stats(grid, "a", "b", n_files=16, bits=4).collect()
    assert all(r["a_max"] - r["a_min"] <= 3 and r["b_max"] - r["b_min"] <= 3
               for r in zstats)
    from pyspark.sql import Window

    w = Window.orderBy("a", "b")
    lin = (
        grid.withColumn("file_id", F.ntile(16).over(w))
        .groupBy("file_id")
        .agg((F.max("b") - F.min("b")).alias("bspan"))
        .collect()
    )
    assert all(r["bspan"] == 15 for r in lin)
