"""Mirror-host detection: host pairs sharing many content fingerprints.

Real crawls waste budget on mirrors (the same site served under several
hostnames — CDNs, country TLDs, http/https+www permutations that survive
canonicalization because the *content* is what repeats, not the URL). The
reference deduplicates per-URL and per-document (services/parser dedup via
content hash; SURVEY J4) but has no cross-host roll-up; at 10^10-URL scale
the roll-up is what lets the scheduler drop an entire mirrored host instead
of rediscovering each duplicate page one fetch at a time.

Shape (all JVM-native, two shuffles):
  distinct(host, fp)                       -- shuffle 1: on (host, fp)
  -> per-fp host count, keep 2..cap hosts  -- boilerplate fingerprints
                                              (nav chrome, error pages) hit
                                              thousands of hosts; the cap
                                              bounds the self-join fan-out
                                              at cap^2/2 rows per fp and is
                                              the standard frequency-cut
                                              used in pair-generation dedup
  -> self-join on fp (host_a < host_b)     -- shuffle 2: on fp
  -> count per pair, Jaccard vs per-host fingerprint-set sizes

The per-pair aggregate shuffles on (host_a, host_b); per-host sizes come
from the same distinct relation. No driver-side state, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mirror_hosts(
    df: DataFrame,
    host_col: str = "host",
    fp_col: str = "content_fp",
    min_shared: int = 2,
    max_hosts_per_fp: int = 64,
) -> DataFrame:
    """Host pairs ordered-by-nothing with shared-fingerprint count + Jaccard.

    Returns columns ``host_a, host_b, shared, n_a, n_b, jaccard`` for every
    pair of hosts sharing >= ``min_shared`` fingerprints, ignoring
    fingerprints present on more than ``max_hosts_per_fp`` hosts (global
    boilerplate). ``host_a < host_b`` canonicalizes the pair. Jaccard is
    over the hosts' distinct-fingerprint sets (rounded 6dp for the oracle
    compare).
    """
    from pyspark.sql import Window

    d = df.select(
        F.col(host_col).alias("host"), F.col(fp_col).alias("fp")
    ).distinct()

    # Eligibility as an unordered count-over-window instead of a separate
    # agg + semi-join: the window partitions on fp, which is exactly the
    # self-join's partitioning, so both join inputs are the SAME subplan and
    # Spark reuses one exchange for a+b instead of recomputing the distinct
    # relation three times.
    n_hosts = F.count(F.lit(1)).over(Window.partitionBy("fp"))
    dd = (
        d.withColumn("n_hosts", n_hosts)
        .filter((F.col("n_hosts") >= 2) & (F.col("n_hosts") <= max_hosts_per_fp))
        .select("host", "fp")
    )

    a = dd.alias("a")
    b = dd.alias("b")
    pairs = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.host") < F.col("b.host")))
        .groupBy(
            F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )

    sizes = d.groupBy("host").agg(F.count(F.lit(1)).alias("n_fp"))
    return (
        pairs.join(sizes.withColumnRenamed("host", "host_a"), "host_a")
        .withColumnRenamed("n_fp", "n_a")
        .join(sizes.withColumnRenamed("host", "host_b"), "host_b")
        .withColumnRenamed("n_fp", "n_b")
        .select(
            "host_a",
            "host_b",
            "shared",
            "n_a",
            "n_b",
            F.round(
                F.col("shared")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def mirror_losers(
    digests: DataFrame,
    url_col: str = "url_norm",
    hash_col: str = "content_hash",
    min_shared: int = 2,
    overlap: float = 0.5,
    max_hosts_per_fp: int = 64,
) -> DataFrame:
    """The epoch loop's mirror-collapse dim: one ``host`` column of hosts to
    DROP from the pending pool (CrawlConfig.collapse_mirrors).

    Evidence is the accumulated fetch_digests table (url_norm,
    content_hash) — the same per-fetch stream DUST mining reads, which
    keeps the duplicate-content rows web_content's dedup drops (exactly
    the rows mirror evidence lives in). A host is a loser when it is the
    lexicographically LARGER member (``host_b``) of a pair where the
    CONTAINMENT of its fingerprint set in the pair, shared/n_b, is >=
    ``overlap``: containment, not Jaccard, because the gate itself freezes
    the loser while the canonical host keeps crawling — under Jaccard the
    canonical side's growth would dilute the score below threshold and
    resurrect the mirror every few epochs; containment of the frozen side
    is monotone under canonical growth. The smaller host is the canonical
    representative, so the rule is deterministic, order-free, and
    transitively safe — in a mirror clique every host except the minimum
    appears as some pair's host_b, leaving exactly one representative
    crawling. Host key is the SURT registrable host
    (functions/columns.surt_host), matching the trap gate's join key.
    """
    from ..functions import columns as C

    d = digests.select(
        C.surt_host(F.col(url_col)).alias("host"),
        F.col(hash_col).alias("fp"),
    )
    pairs = mirror_hosts(
        d, "host", "fp", min_shared=min_shared, max_hosts_per_fp=max_hosts_per_fp
    )
    return (
        pairs.filter(F.col("shared") / F.col("n_b") >= overlap)
        .select(F.col("host_b").alias("host"))
        .distinct()
    )
