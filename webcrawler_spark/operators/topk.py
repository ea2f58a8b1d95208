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
