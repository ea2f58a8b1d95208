"""DUST mining: learn site-specific URL-alias rules from observed content.

"Different URLs with Similar Text" (Bar-Yossef, Keidar, Schonfeld — WWW'07):
large sites serve the same page under many URLs that differ only in
content-irrelevant query parameters (session ids, affiliate/referral tags,
sort echoes).  The reference strips a FIXED list of tracking params at
canonicalize time (services/frontier/app.py:156-170's normalize step — see
`functions/urlnorm.py` for the byte-parity port); DUST mining is the
complement that LEARNS the per-host rule table from evidence the crawler
already has: (url, content_hash) pairs from prior fetches.  Mined rules
feed back into canonicalization, so the frontier drops aliases BEFORE
fetching — at 10^10-URL scale, a single hot parameter (e.g. `jsessionid`)
can be >10% of the frontier.

Evidence model (the paper's "instance" test, restricted to single-param
substitutions): parameter `p` is content-irrelevant on host `h` when every
observed group of URLs that agree on everything EXCEPT p's value (same
scheme://host/path and the same multiset of other params) maps to exactly
one content hash — with support of at least `min_groups` such multi-valued
groups.

100 TB shape: two hash aggregations, no joins at all.  Parse + explode is
a codegen projection; the group stage keys on (host, param, group_key) —
cardinality ≤ total observed params, shuffled once; the rule stage keys on
(host, param) — tiny.  Group keys are host-prefixed, so hot hosts spread
over their own param space rather than one reducer.  The output rule table
is |hosts|×|params| and broadcasts back into the canonicalizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mine_irrelevant_params(
    pages: DataFrame,
    url_col: str = "url",
    hash_col: str = "content_hash",
    min_groups: int = 3,
) -> DataFrame:
    """(host, param, groups_multi, clean_groups, dup_urls_avoidable,
    irrelevant) — one row per (host, query-parameter) observed with ≥2
    distinct values in at least one alias group.

    * groups_multi — alias groups (same base URL + same other params) where
      this param took ≥2 distinct values.
    * clean_groups — those groups whose pages all share ONE content hash.
    * dup_urls_avoidable — redundant fetches the rule would have saved:
      sum over clean groups of (distinct urls − 1).
    * irrelevant — the mined verdict: ≥ `min_groups` multi-valued groups,
      every one of them clean.
    """
    parts = F.split(F.col(url_col), r"\?", 2)
    u = pages.select(
        F.col(url_col).alias("url"),
        F.col(hash_col).alias("content_hash"),
        F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1).alias(
            "host"
        ),
        F.get(parts, 0).alias("base"),
        F.coalesce(
            F.filter(F.split(F.get(parts, 1), "&"), lambda p: p != F.lit("")),
            F.array().cast("array<string>"),
        ).alias("params"),
    )
    ex = u.select(
        "url", "content_hash", "host", "base", "params", F.explode("params").alias("p")
    )
    key_of = lambda q: F.get(F.split(q, "=", 2), 0)  # noqa: E731
    ex = (
        ex.withColumn("param", key_of(F.col("p")))
        .withColumn("value", F.get(F.split(F.col("p"), "=", 2), 1))
        .withColumn(
            "group_key",
            F.concat(
                F.col("base"),
                F.lit("?"),
                F.array_join(
                    F.array_sort(
                        F.filter(
                            F.col("params"), lambda q: key_of(q) != F.col("param")
                        )
                    ),
                    "&",
                ),
            ),
        )
    )
    grp = ex.groupBy("host", "param", "group_key").agg(
        F.countDistinct("value").alias("n_values"),
        F.countDistinct("content_hash").alias("n_hashes"),
        F.countDistinct("url").alias("n_urls"),
    )
    return (
        grp.filter(F.col("n_values") >= 2)
        .groupBy("host", "param")
        .agg(
            F.count(F.lit(1)).alias("groups_multi"),
            F.sum(F.when(F.col("n_hashes") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("clean_groups"),
            F.sum(F.when(F.col("n_hashes") == 1, F.col("n_urls") - 1).otherwise(0))
            .cast("bigint")
            .alias("dup_urls_avoidable"),
        )
        .withColumn(
            "irrelevant",
            (F.col("groups_multi") >= min_groups)
            & (F.col("clean_groups") == F.col("groups_multi")),
        )
    )


def dust_rules_dim(
    pages: DataFrame,
    url_col: str = "url",
    hash_col: str = "content_hash",
    min_groups: int = 3,
) -> DataFrame:
    """(host, dust_params) broadcast dim for the canonicalizer: per host,
    the sorted array of params mined `irrelevant`.  This is the table the
    epoch loop (CrawlConfig.mine_dust) re-derives from the accumulated
    web_content after each epoch and joins onto the next epoch's candidates
    via `functions.columns.strip_params_by_rules`.  |hosts with rules| rows
    — broadcast-sized by construction (one row per host that serves
    aliases)."""
    rules = mine_irrelevant_params(pages, url_col, hash_col, min_groups)
    return (
        rules.filter(F.col("irrelevant"))
        .groupBy("host")
        .agg(F.array_sort(F.collect_set("param")).alias("dust_params"))
    )
