"""Link discovery: extract -> explode -> filter -> next-epoch candidates.

Maps the parser's LinkExtractor + rediscovery emit
(services/parser/app.py:122-166, 624-647):
- extract_links pandas UDF returns ARRAY<STRUCT> (UDTF-shaped), exploded
  JVM-side;
- scheme/extension/social filters (P2-P4) are applied *inside* the UDF
  exactly like the reference (parser/app.py:89-99);
- within-page dedup is the UDF's seen-set (U2), cross-page dedup is
  dropDuplicates downstream;
- only internal/external links re-enter the frontier (P12,
  parser/app.py:629).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CrawlConfig, DEFAULT_CONFIG
from ..functions.udfs import extract_links_col


def extract_all_links(fetched: DataFrame, epoch: int) -> DataFrame:
    """fetched(url_norm, html, depth, ...) -> links table rows (LINKS schema)."""
    exploded = (
        fetched.select(
            F.col("url_norm").alias("source_url"),
            F.col("depth").alias("source_depth"),
            F.explode(extract_links_col(F.col("html"), F.col("url_norm"))).alias("link"),
        )
        .select(
            "source_url",
            F.col("link.url").alias("target_url"),
            F.col("link.anchor_text").alias("anchor_text"),
            F.col("link.link_type").alias("link_type"),
            (F.col("source_depth") + 1).cast("int").alias("crawl_depth"),
            F.lit(epoch).alias("discovered_epoch"),
        )
    )
    return exploded


def discovered_candidates(
    links: DataFrame, cfg: CrawlConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Links -> next-epoch frontier candidates (parser/app.py:628-647):
    internal/external only, fixed discovered priority, depth+1 carried."""
    return (
        links.filter(F.col("link_type").isin("internal", "external"))
        .select(
            F.col("target_url").alias("url"),
            F.col("source_url"),
            F.col("crawl_depth").alias("depth"),
            F.lit(cfg.discovered_priority).alias("source_priority"),
        )
    )
