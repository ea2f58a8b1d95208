"""Global top-k at frontier scale: quantile-threshold banding.

The reference's priority drain (url-frontier/app.py:294-325) is a Postgres
``ORDER BY priority LIMIT k``. At 10^10 frontier rows a naive
``orderBy().limit(k)`` is fine for small k (Spark's TakeOrderedAndProject
keeps a k-heap per partition and merges k*partitions rows on the driver),
but a *global fetch-budget drain* wants k in the millions — per-partition
heaps of millions of rows and a driver merge of k*partitions rows stop
being free.

``threshold_topk`` makes the sorted set small before any ordering happens:

  1. one aggregation pass computes the (1 - k/n) quantile of the score with
     rank error eps*n (approxQuantile = Greenwald-Khanna sketch; partial
     aggs only, no row shuffle);
  2. the band ``score >= t`` is a scan+filter (~k + 2*eps*n rows);
  3. only the band is ordered — TakeOrderedAndProject over ~k(1+eps') rows
     instead of n.

If the sketch overshoots (band < k rows — possible, the error bound is
two-sided), the threshold steps down by the error margin and the band is
re-counted; each step widens the band by >= eps*n rank, so the loop is
bounded by ~1/eps steps and in practice takes 0-1 retries.

Results are exact and deterministic: (score desc, id asc) total order,
identical to ORDER BY score DESC, id LIMIT k."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def threshold_topk(
    df: DataFrame,
    score_col: str,
    k: int,
    id_col: str,
    relative_error: float = 0.001,
) -> DataFrame:
    """Exact top-k rows by (score desc, id asc) without sorting the full
    input. ``relative_error`` is the quantile sketch's rank error as a
    fraction of n (band overshoot ~ 2*eps*n extra rows)."""
    # one pass for both totals: the quantile target must be a rank among
    # NON-NULL scores (approxQuantile ignores nulls) — computing frac from
    # the total row count on a null-heavy column would chase a band size no
    # threshold can reach, stepping frac down ~1/(2*eps) times
    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.count(score_col).alias("n_scored")
    ).first()
    n, n_scored = row["n"], row["n_scored"]
    if n <= k or n_scored <= k:
        # k covers every non-null score: ORDER BY ... NULLS LAST directly
        # (degenerate size — the sorted set is at most k rows bigger than k)
        return df.orderBy(F.desc_nulls_last(score_col), F.asc(id_col)).limit(k)

    frac = max(0.0, 1.0 - k / n_scored)
    eps = relative_error
    while True:
        t = df.stat.approxQuantile(score_col, [frac], eps)[0]
        band = df.filter(F.col(score_col) >= t)
        if band.count() >= k or frac <= 0.0:
            break
        # sketch overshot: step the target rank down by the error margin
        frac = max(0.0, frac - 2 * eps)
    return band.orderBy(F.desc(score_col), F.asc(id_col)).limit(k)


def zorder_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of two non-negative integer keys into
    one 2*bits-bit sort key — the Iceberg `Z-ORDER` layout analog: sorting
    by the z-value clusters BOTH dimensions, so per-file min/max column
    stats prune range predicates on either key (a 1-D sort only ever
    prunes its leading column). Pure integer codegen: bits are extracted
    and placed with shifts/masks — no UDF.

    100 TB shape: the z-value is a projection; the layout cost is the one
    repartitionByRange + sortWithinPartitions write the table pays anyway
    for any clustered layout (cluster_by_surt precedent in the epoch
    loop). Keys wider than `bits` bits must be range-rank-compressed
    first (documented; 16 bits cover 65k buckets per dimension — plenty
    for host-hash x priority)."""
    za = F.lit(0).cast("long")
    av = a.cast("long")
    bv = b.cast("long")
    for i in range(bits):
        bit_a = F.shiftright(av, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(bv, i).bitwiseAND(F.lit(1))
        za = (
            za
            .bitwiseOR(F.shiftleft(bit_a, 2 * i))
            .bitwiseOR(F.shiftleft(bit_b, 2 * i + 1))
        )
    return za


def zorder_layout_stats(
    df: DataFrame,
    a_col: str,
    b_col: str,
    n_files: int = 16,
    bits: int = 16,
) -> DataFrame:
    """Evidence query for the z-order layout: bucket rows into `n_files`
    equal z-ranges (ntile over the z-value) and report each file's
    min/max span in BOTH dimensions. Under a 1-D sort the non-leading
    column's span per file is ~the full domain (no pruning); under
    z-order both spans shrink toward domain/sqrt(n_files) — the
    measurable property Iceberg's Z-ORDER buys. The ntile window stands
    in for the writer's range partitioner at test scale; the production
    write is repartitionByRange(z) + per-file stats."""
    from pyspark.sql import Window

    z = zorder_value(F.col(a_col), F.col(b_col), bits)
    w = Window.orderBy(z, F.col(a_col), F.col(b_col))
    return (
        df.select(F.col(a_col), F.col(b_col), z.alias("zv"))
        .withColumn("file_id", F.ntile(n_files).over(w))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min(a_col).alias("a_min"),
            F.max(a_col).alias("a_max"),
            F.min(b_col).alias("b_min"),
            F.max(b_col).alias("b_max"),
        )
        .orderBy("file_id")
    )
