"""Manifest column stats + partition-pruned reads (storage/catalog.py:
stage(stats_cols=...) / read_delta_pruned) — Iceberg manifest-level file
skipping on plain parquet."""

import pytest

from pyspark.sql import functions as F

from webcrawler_spark.storage.catalog import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "cat"))
    # 3 epochs of a delta table with DISJOINT url_fp ranges
    for e, (lo, hi) in enumerate([(0, 99), (100, 199), (200, 299)]):
        df = spark.range(lo, hi + 1).select(
            F.col("id").alias("url_fp"), F.lit(e).alias("discovered_epoch")
        )
        n = c.stage("links", e, df, stats_cols=("url_fp",))
        c.commit_epoch(e, {"links": n}, {})
    return c


def test_stats_recorded_in_manifest(cat):
    eps = {e["epoch"]: e for e in cat.read_manifest()["epochs"]}
    assert eps[0]["stats"]["links"]["url_fp"] == [0, 99]
    assert eps[2]["stats"]["links"]["url_fp"] == [200, 299]


def test_pruned_read_skips_nonmatching_epochs(cat):
    df = cat.read_delta_pruned("links", 2, "url_fp", 120, 180)
    rows = sorted(r["url_fp"] for r in df.collect())
    assert rows == list(range(120, 181))
    # only epoch=1's partition was opened
    dirs = {f.split("epoch=")[1].split("/")[0] for f in df.inputFiles()}
    assert dirs == {"1"}


def test_pruned_read_matches_unpruned_filter(cat):
    pruned = cat.read_delta_pruned("links", 2, "url_fp", 50, 250)
    full = cat.read_delta_union("links", 2).filter(
        F.col("url_fp").between(50, 250)
    )
    assert sorted(r["url_fp"] for r in pruned.collect()) == sorted(
        r["url_fp"] for r in full.collect()
    )


def test_no_matching_epoch_returns_none(cat):
    assert cat.read_delta_pruned("links", 2, "url_fp", 1000, 2000) is None


def test_time_travel_respects_as_of(cat):
    # epoch 2's range exists but is after the as-of point
    assert cat.read_delta_pruned("links", 1, "url_fp", 200, 299) is None


def test_statless_epoch_read_conservatively(cat, spark):
    # epoch 3 staged WITHOUT stats: pruning must include it for any range
    df = spark.range(500, 510).select(
        F.col("id").alias("url_fp"), F.lit(3).alias("discovered_epoch")
    )
    cat.commit_epoch(3, {"links": cat.stage("links", 3, df)}, {})
    got = cat.read_delta_pruned("links", 3, "url_fp", 505, 506)
    assert sorted(r["url_fp"] for r in got.collect()) == [505, 506]


def test_compacted_table_falls_back_to_filter(cat):
    cat.compact_delta("links", 2)
    df = cat.read_delta_pruned("links", 2, "url_fp", 120, 180)
    assert sorted(r["url_fp"] for r in df.collect()) == list(range(120, 181))
