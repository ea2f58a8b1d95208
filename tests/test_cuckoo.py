"""Partitioned cuckoo-filter seen set (operators/cuckoo.py): the deletable
tier-1 prefilter. Invariants tested:

- no false negatives (every inserted fp probes True);
- bounded false-positive rate on disjoint fps (16-bit tags, 2x4 slots:
  theory ~0.04%, asserted < 0.5%);
- delete removes exactly the expired fps while preserving no-false-negatives
  for everything else (the TTL-eviction path a bloom cannot express);
- incremental update_cuckoo equals a from-scratch build in probe behavior;
- dedupe_new_urls_cuckoo is exactly equivalent to the plain anti-join;
- numpy kernels survive saturation pressure (kick loop) deterministically.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators import cuckoo as CK


def _fps(n, seed, lo=0, hi=2**62):
    rng = np.random.default_rng(seed)
    return np.unique(rng.integers(lo, hi, size=n, dtype=np.int64))


# ---- pure numpy kernel tests (no Spark) -----------------------------------------


def test_kernel_no_false_negatives_and_fp_rate():
    fps = _fps(20_000, seed=1)
    table = CK._new_table(CK._table_size(len(fps)))
    CK._insert_fps(table, fps)
    assert CK._contains_fps(table, fps).all()

    other = _fps(50_000, seed=2)
    other = np.setdiff1d(other, fps)
    fp_rate = CK._contains_fps(table, other).mean()
    assert fp_rate < 0.005, fp_rate


def test_kernel_delete_then_absent():
    fps = _fps(5_000, seed=3)
    table = CK._new_table(CK._table_size(len(fps)))
    CK._insert_fps(table, fps)
    gone, kept = fps[:2_000], fps[2_000:]
    CK._delete_fps(table, gone)
    # kept fps must still all probe True (delete touches only its own slots)
    assert CK._contains_fps(table, kept).all()
    # deleted fps probe mostly False (a residual hit is a genuine tag
    # collision with a kept fp — bounded by the FP rate)
    assert CK._contains_fps(table, gone).mean() < 0.005


def test_kernel_duplicate_copies_make_delete_safe():
    """Deletion-safety rule (Fan et al. §3.2): colliding inserts each hold a
    physical slot, so deleting one leaves the other visible. Re-offering the
    same batch stands in for distinct fps colliding on (bucket, tag)."""
    fps = _fps(500, seed=4)
    table = CK._new_table(CK._table_size(4_000))
    CK._insert_fps(table, fps)
    occupied = int((table != 0).sum())
    CK._insert_fps(table, fps)
    assert int((table != 0).sum()) == 2 * occupied  # copies stored, not skipped
    CK._delete_fps(table, fps)  # removes one copy each
    assert CK._contains_fps(table, fps).all()  # still no false negatives
    CK._delete_fps(table, fps)
    assert CK._contains_fps(table, fps).mean() < 0.01


def test_kernel_kick_loop_under_pressure():
    # fill to ~load factor limit: forces relocations through _kick_insert
    m = CK._table_size(1)  # smallest table: 1 bucket x 4 slots... scale up
    m = 256
    cap = int(m * CK._SLOTS * CK._LOAD_FACTOR)
    fps = _fps(cap, seed=5)[:cap]
    table = np.zeros((m, CK._SLOTS), dtype=np.uint16)
    CK._insert_fps(table, fps)
    assert CK._contains_fps(table, fps).all()
    # determinism: same input -> identical table bytes
    table2 = np.zeros((m, CK._SLOTS), dtype=np.uint16)
    CK._insert_fps(table2, fps)
    assert table.tobytes() == table2.tobytes()


def test_kernel_overflow_raises():
    m = 8
    fps = _fps(m * CK._SLOTS * 4, seed=6)
    table = np.zeros((m, CK._SLOTS), dtype=np.uint16)
    with pytest.raises(ValueError, match="over capacity"):
        CK._insert_fps(table, fps)


# ---- Spark-level tests -----------------------------------------------------------


def _seen_df(spark, fps):
    return spark.createDataFrame([(int(x),) for x in fps], "url_fp long")


def test_build_and_probe_no_false_negatives(spark):
    fps = _fps(30_000, seed=7)
    seen = _seen_df(spark, fps)
    ck = CK.build_cuckoo(seen, n_buckets=8, capacity=60_000)
    probed = CK.cuckoo_might_contain(seen, ck)
    assert probed.filter(~F.col("might_contain")).count() == 0


def test_probe_fp_rate_and_nonbroadcast_path(spark):
    fps = _fps(30_000, seed=8)
    seen = _seen_df(spark, fps)
    ck = CK.build_cuckoo(seen, n_buckets=8, capacity=60_000).persist()
    novel = np.setdiff1d(_fps(30_000, seed=9), fps)
    cand = _seen_df(spark, novel)
    for bc in (True, False):
        hits = (
            CK.cuckoo_might_contain(cand, ck, broadcast_blobs=bc)
            .filter(F.col("might_contain"))
            .count()
        )
        assert hits / len(novel) < 0.005
    ck.unpersist()


def test_update_equals_rebuild(spark):
    a, b = _fps(10_000, seed=10), _fps(10_000, seed=11)
    ck0 = CK.build_cuckoo(_seen_df(spark, a), n_buckets=4, capacity=40_000)
    ck1 = CK.update_cuckoo(ck0, _seen_df(spark, b), n_buckets=4, capacity=40_000)
    both = _seen_df(spark, np.union1d(a, b))
    assert (
        CK.cuckoo_might_contain(both, ck1).filter(~F.col("might_contain")).count() == 0
    )


def test_build_adaptive_blob_sizing_never_overflows(spark):
    """A build whose configured capacity is far too small must not fail:
    hot buckets get bigger blobs (per-blob m rides the row)."""
    fps = _fps(30_000, seed=20)
    seen = _seen_df(spark, fps)
    ck = CK.build_cuckoo(seen, n_buckets=4, capacity=100)  # 25 fps/bucket cfg
    assert CK.cuckoo_might_contain(seen, ck).filter(~F.col("might_contain")).count() == 0
    # and the blobs really did grow beyond the configured share
    assert all(r["m"] > CK._table_size(100 // 4) for r in ck.select("m").collect())


def test_update_over_capacity_fails_fast_with_clear_error(spark):
    """Inserting a delta that would overfill an existing blob must surface a
    plan-level capacity error (lossy tags cannot be rehashed bigger in
    place), not die deep in the kick loop."""
    import re

    a = _fps(400, seed=21)
    ck = CK.build_cuckoo(_seen_df(spark, a), n_buckets=1, capacity=400).persist()
    big_delta = _seen_df(spark, np.setdiff1d(_fps(30_000, seed=22), a))
    with pytest.raises(Exception, match=re.escape("over capacity")):
        CK.update_cuckoo(ck, big_delta, n_buckets=1, capacity=400).collect()
    ck.unpersist()


def test_update_advisory_band_succeeds(spark):
    """A delta that lands the blob between the 95% advisory load factor and
    100% must be placed by the kick loop, not rejected by the capacity
    pre-check (the pre-check fails fast only on projections that cannot
    possibly fit). 400 build + 90 delta = 490 of 512 slots (95.7%)."""
    a = _fps(420, seed=31)[:400]
    delta = np.setdiff1d(_fps(600, seed=32), a)[:90]
    ck = CK.build_cuckoo(_seen_df(spark, a), n_buckets=1, capacity=400).persist()
    ck2 = CK.update_cuckoo(ck, _seen_df(spark, delta), n_buckets=1, capacity=400)
    probe = CK.cuckoo_might_contain(_seen_df(spark, delta), ck2)
    assert probe.filter(~F.col("might_contain")).count() == 0
    ck.unpersist()


def test_delete_ttl_eviction(spark):
    fps = _fps(10_000, seed=12)
    expired, live = fps[:4_000], fps[4_000:]
    ck = CK.build_cuckoo(_seen_df(spark, fps), n_buckets=4, capacity=20_000)
    ck2 = CK.delete_cuckoo(ck, _seen_df(spark, expired), n_buckets=4, capacity=20_000)
    live_df = _seen_df(spark, live)
    assert (
        CK.cuckoo_might_contain(live_df, ck2).filter(~F.col("might_contain")).count()
        == 0
    )
    exp_hits = (
        CK.cuckoo_might_contain(_seen_df(spark, expired), ck2)
        .filter(F.col("might_contain"))
        .count()
    )
    assert exp_hits / len(expired) < 0.005


def test_dedupe_equivalence_with_anti_join(spark):
    all_fps = _fps(20_000, seed=13)
    seen_fps = all_fps[::2]
    seen = _seen_df(spark, seen_fps)
    cand = _seen_df(spark, all_fps)
    ck = CK.build_cuckoo(seen, n_buckets=8, capacity=40_000)
    via_cuckoo = sorted(
        r["url_fp"] for r in CK.dedupe_new_urls_cuckoo(cand, seen, ck).collect()
    )
    plain = sorted(
        r["url_fp"] for r in cand.join(seen, "url_fp", "left_anti").collect()
    )
    assert via_cuckoo == plain


def test_sparse_bucket_population_no_false_negatives(spark):
    """Regression: fps that populate only a subset of buckets (all-even keys
    mod 8 -> buckets {0,2,4,6}) must still probe with the BUILD's bucket
    modulus. Inferring n_buckets as max(bucket)+1 rehashed with 7 and
    produced mass false negatives — both filters now carry an nb column."""
    from webcrawler_spark.operators import dedup as D

    evens = np.arange(0, 30_000, 2, dtype=np.int64)
    seen = _seen_df(spark, evens)
    ck = CK.build_cuckoo(seen, n_buckets=8, capacity=30_000)
    assert (
        CK.cuckoo_might_contain(seen, ck).filter(~F.col("might_contain")).count() == 0
    )
    bl = D.build_bloom(seen, n_buckets=8, capacity=30_000, fp_rate=0.001)
    assert (
        D.bloom_might_contain(seen, bl).filter(~F.col("might_contain")).count() == 0
    )


def test_update_with_mismatched_n_buckets_stays_correct(spark):
    """Regression: incremental update/delete must bucket the delta with the
    EXISTING table's modulus, not the caller's — a mismatched n_buckets
    would scatter fps into blobs the probe never consults."""
    from webcrawler_spark.operators import dedup as D

    a, b = _fps(5_000, seed=20), _fps(5_000, seed=21)
    ck0 = CK.build_cuckoo(_seen_df(spark, a), n_buckets=8, capacity=20_000)
    ck1 = CK.update_cuckoo(ck0, _seen_df(spark, b), n_buckets=3, capacity=20_000)
    both = _seen_df(spark, np.union1d(a, b))
    assert CK.cuckoo_might_contain(both, ck1).filter(~F.col("might_contain")).count() == 0
    ck2 = CK.delete_cuckoo(ck1, _seen_df(spark, b), n_buckets=5, capacity=20_000)
    assert CK.cuckoo_might_contain(_seen_df(spark, a), ck2).filter(~F.col("might_contain")).count() == 0

    bl0 = D.build_bloom(_seen_df(spark, a), n_buckets=8, capacity=20_000, fp_rate=0.001)
    bl1 = D.update_bloom(bl0, _seen_df(spark, b), n_buckets=3, capacity=20_000, fp_rate=0.001)
    assert D.bloom_might_contain(both, bl1).filter(~F.col("might_contain")).count() == 0
