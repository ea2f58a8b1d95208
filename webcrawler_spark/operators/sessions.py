"""Event sessionization + semi-structured event analytics.

The reference's scheduler treats activity as per-minute rate windows
(`services/url-scheduler/politeness_manager.py:189-206`) and 30-second delay
buckets (`services/url-scheduler/app.py:39-53`); a training-data pipeline
additionally needs gap-based sessionization over an event stream. Both are
pure window/aggregate plans — one shuffle on the user key, everything else
whole-stage-codegen'd JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 86400,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since the
    user's previous event exceeds ``gap_seconds``.

    Classic lag + conditional cumulative-sum formulation: both windows share
    the same (user, ts) partitioning/ordering so Catalyst plans ONE exchange +
    one sort for the whole operator. Returns one row per session:
    (user_id, session_id, n_events, session_start).
    """
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(id_col))
    # Microsecond-exact integer gap: unix_timestamp() truncates to whole
    # seconds, which flips `gap > threshold` at sub-second boundaries and
    # desynchronizes from any fractional-second reference (DELTAS audit).
    # (NTZ -> TZ cast shifts every value by the same session-zone offset,
    # which cancels in the lag difference.)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = ts_us - F.lag(ts_us).over(w)
    gap_us = F.lit(int(gap_seconds) * 1_000_000).cast("long")
    sess = F.sum(
        F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    ).over(w)
    return (
        events.withColumn("session_id", sess)
        .groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
        )
    )


def shard_imbalance(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """A6 (domain_sharding.py:201-276): per-shard load distribution ->
    max/min load + imbalance ratio (the reference rebalances at ratio >= 2;
    in Spark the same signal feeds salting / AQE skew handling)."""
    loads = (
        df.withColumn("shard_id", F.pmod(F.col(key_col), F.lit(n_shards)).cast("int"))
        .groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("load"))
    )
    return loads.agg(
        F.max("load").alias("max_load"),
        F.min("load").alias("min_load"),
        F.round(F.max("load") / F.min("load"), 6).alias("imbalance_ratio"),
    )
