"""Crawl-trap detection: hosts whose URL space looks infinite.

Real crawls sink unbounded budget into calendar pages, session-id
permutations, and self-linking directory loops (the reference has no
defense beyond its per-URL dedup — every NEW trap URL passes dedup by
definition; services/url-scheduler throttles rate, not URL-space growth).
The batch defense is statistical: per host, measure how the URL inventory
is shaped —

- **depth**: path-segment count; trap trees run deep.
- **repeat deficit**: segments minus distinct segments per path; loops
  (``/a/b/a/b/a/b``) repeat segments, organic paths rarely do.
- **template domination**: collapse digit runs to ``{n}`` — if one
  template accounts for most of a host's URLs (``/cal/{n}/{n}/{n}``),
  the space is generated, not authored.

All JVM-native (split/array_distinct/regexp_replace in whole-stage
codegen). Shuffle shape: one pass per URL for the signals, a hash-agg per
(host, template) then per host for shares — both map-side partial; output
is host-scale. The per-host flags feed the scheduler the same way
host_stats does (broadcast dim join, drop or de-prioritize suspects).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.columns import _SCHEME_AUTH


def _path_of(url: Column) -> Column:
    return F.regexp_extract(url, _SCHEME_AUTH + r"[^/?#]*([^?#]*)", 1)


def url_template(url: Column) -> Column:
    """Digit runs in the path collapsed to ``{n}`` (query dropped):
    ``/item/8141?x=1`` -> ``/item/{n}``."""
    return F.regexp_replace(_path_of(url), r"[0-9]+", "{n}")


def trap_signals(
    df: DataFrame,
    url_col: str = "url_norm",
    max_depth: int = 8,
    max_repeat: int = 2,
    template_share_threshold: float = 0.5,
    min_urls: int = 20,
) -> DataFrame:
    """Per-host trap signals + suspect flag.

    Returns (host, n_urls, n_deep, n_repeat, top_template,
    top_template_share, is_trap_suspect): a host is a suspect when it has
    >= ``min_urls`` URLs and any of — deep paths (> ``max_depth``
    segments), repeated segments (repeat deficit > ``max_repeat``), or one
    digit-template covering > ``template_share_threshold`` of its URLs.
    """
    from ..functions.columns import surt_host

    segs = F.filter(F.split(_path_of(F.col(url_col)), "/"), lambda s: s != "")
    per_url = df.select(
        surt_host(F.col(url_col)).alias("host"),
        F.size(segs).alias("depth"),
        (F.size(segs) - F.size(F.array_distinct(segs))).alias("repeat_deficit"),
        url_template(F.col(url_col)).alias("template"),
    )

    tpl = per_url.groupBy("host", "template").agg(F.count(F.lit(1)).alias("n_tpl"))
    w = Window.partitionBy("host").orderBy(F.desc("n_tpl"), F.asc("template"))
    top_tpl = (
        tpl.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("host", F.col("template").alias("top_template"), "n_tpl")
    )

    per_host = per_url.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum((F.col("depth") > max_depth).cast("long")).alias("n_deep"),
        F.sum((F.col("repeat_deficit") > max_repeat).cast("long")).alias("n_repeat"),
    )
    out = per_host.join(top_tpl, "host").select(
        "host",
        "n_urls",
        "n_deep",
        "n_repeat",
        "top_template",
        F.round(F.col("n_tpl") / F.col("n_urls"), 6).alias("top_template_share"),
    )
    return out.withColumn(
        "is_trap_suspect",
        (F.col("n_urls") >= min_urls)
        & (
            (F.col("n_deep") > 0)
            | (F.col("n_repeat") > 0)
            | (F.col("top_template_share") > template_share_threshold)
        ),
    )


def soft404_signals(
    pages: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    hash_col: str = "content_hash",
    len_col: str = "n_chars",
    min_count: int = 5,
    max_chars: int = 512,
) -> DataFrame:
    """Per-host soft-404 template detection.

    Real crawls hit hosts that answer missing paths with HTTP 200 and a
    site-branded "not found" page (the reference's fetcher only trusts the
    status code — services/crawler downloads them as content).  The template
    signature: ONE short body served verbatim from MANY distinct paths of
    the same host.  Per (host, content_hash) count distinct urls; the host's
    template is its most-repeated short body (count >= min_count, avg length
    <= max_chars; ties -> lexicographically smallest hash).  Pages matching
    the template are the soft-404s the dedup/index tiers should drop and
    the frontier should stop expanding.

    Output: (host, template_hash, n_soft404, n_pages, soft404_rate).
    Shape at 10^10: one hash-agg on (host, hash) + one per-host window over
    that agg's own partitioning — the window input is already collapsed to
    distinct bodies per host, orders of magnitude smaller than the pages.
    """
    from pyspark.sql import Window

    per_hash = pages.groupBy(
        F.col(host_col).alias("host"), F.col(hash_col).alias("chash")
    ).agg(
        F.countDistinct(url_col).alias("n_urls"),
        F.avg(len_col).alias("avg_chars"),
    )
    host_tot = per_hash.groupBy("host").agg(F.sum("n_urls").alias("n_pages"))
    cand = per_hash.filter(
        (F.col("n_urls") >= min_count) & (F.col("avg_chars") <= max_chars)
    )
    w = Window.partitionBy("host").orderBy(F.desc("n_urls"), F.asc("chash"))
    tmpl = (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "host",
            F.col("chash").alias("template_hash"),
            F.col("n_urls").cast("bigint").alias("n_soft404"),
        )
    )
    return tmpl.join(host_tot, "host").select(
        "host",
        "template_hash",
        "n_soft404",
        F.col("n_pages").cast("bigint").alias("n_pages"),
        F.round(F.col("n_soft404") / F.col("n_pages"), 6).alias("soft404_rate"),
    )
