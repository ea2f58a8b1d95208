"""Count-Min Sketch (Cormode & Muthukrishnan 2005) — bounded-memory
frequency estimation for heavy-hitter detection.

The reference tracks per-host counters in Redis (url-scheduler's politeness
and host-stats state); at 10^8 hosts / 10^10 URL discoveries the exact
counter table is itself a big-data object. A CMS answers "which hosts are
flooding discovery" in depth × width integers TOTAL (e.g. 4 × 65536 × 8 B
= 2 MB) with a one-sided guarantee: estimate ≥ true count, overestimate
≤ εN with probability 1-δ (ε = e/width, δ = e^-depth).

Hash family: h_i(key) = ((a_i·(key mod P) + b_i) mod P) mod width with
P = 2^31 - 1 — pairwise-independent (Carter-Wegman), and every step is
exact int64 arithmetic both engines can replay bit-for-bit (a·key < 2^62;
no engine-specific hash function in the path, unlike xxhash64 which DuckDB
cannot reproduce). Keys must be non-negative (fingerprints/ids; pmod
upstream if signed).

100 TB shape: the build is one explode(depth) + map-side-partial hash-agg
that collapses to ≤ depth×width rows no matter the input size — the
classic mergeable-sketch property (per-partition sketches add cell-wise).
Estimation joins the (depth×width)-row sketch broadcast against the probe
keys. All codegen; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_P = 2_147_483_647  # 2^31 - 1, Mersenne prime
# (a, b) per row — fixed odd multipliers, arbitrary but pinned (the oracle
# SQL inlines the same table)
PARAMS: list[tuple[int, int]] = [(911, 13), (3571, 97), (181081, 1009), (2718281, 31)]


def _cell(key: Column, a: int, b: int, width: int) -> Column:
    return ((F.lit(a) * (key % F.lit(_P)) + F.lit(b)) % F.lit(_P)) % F.lit(width)


def build_cms(
    df: DataFrame, key_col: str, width: int = 256, depth: int | None = None
) -> DataFrame:
    """(r, col, cnt) sketch table over df[key_col] (one increment per row).
    depth defaults to len(PARAMS) = 4 (δ ≈ 1.8%)."""
    depth = len(PARAMS) if depth is None else depth
    key = F.col(key_col)
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"), _cell(key, a, b, width).alias("col")
                )
                for r, (a, b) in enumerate(PARAMS[:depth])
            ]
        )
    ).alias("cell")
    return (
        df.select(cells)
        .groupBy(F.col("cell.r").alias("r"), F.col("cell.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def estimate_cms(
    cms: DataFrame, keys: DataFrame, key_col: str, width: int = 256
) -> DataFrame:
    """Adds `est_cnt` = min over the sketch rows of the key's cell counts
    (0 when a cell was never touched). One broadcast join of the ≤
    depth×width-row sketch; estimate ≥ true count always."""
    depth = cms.agg(F.max("r")).first()[0] + 1
    probes = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cell(F.col(key_col), a, b, width).alias("col"),
                    )
                    for r, (a, b) in enumerate(PARAMS[:depth])
                ]
            )
        ).alias("cell"),
    ).select("*", F.col("cell.r").alias("r"), F.col("cell.col").alias("col")).drop("cell")
    joined = probes.join(F.broadcast(cms), ["r", "col"], "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )
    group_cols = [c for c in keys.columns]
    return joined.groupBy(*group_cols).agg(F.min("cnt").alias("est_cnt"))
