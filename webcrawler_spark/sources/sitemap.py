"""Sitemap XML source — urlset and sitemapindex parsing as native plans.

The reference collects `Sitemap:` lines from robots.txt (urllib
`site_maps()` parity in `functions/robots.py:sitemap_seeds`) but never
fetches or parses the XML documents those lines point at. A production
frontier does: sitemaps are the highest-precision seed source a site
offers (sitemaps.org protocol — `<urlset>` leaves with per-URL `lastmod`
and `priority`, `<sitemapindex>` files fanning out to up to 50k leaves of
50k URLs each).

Everything here is native codegen — `regexp_extract_all` to split the
element list, `transform` + `regexp_extract` for the fields, one explode.
No XML library, no Python UDF: the subset of XML that sitemaps use is
regular (no nesting inside `<url>` elements), so RE2/Java-regex class
patterns with `(?s)` + non-greedy bodies parse it exactly.

100 TB shape: sitemap payloads arrive as (sitemap_url, xml) rows from the
fetch join — parsing is a projection + explode, fan-out bounded by the
protocol's 50k-URLs-per-file cap, so one 50 MB sitemap never becomes a
skewed task (the explode distributes with its parent row). Index expansion
is one broadcast-free equi-join per level; the protocol forbids indexes of
indexes, so `expand_index` is a single round plus a loud leftover check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one <url>…</url> / <sitemap>…</sitemap> element, non-greedy, dotall
_URL_ELEM = r"(?s)<url\s*>(.*?)</url\s*>"
_SM_ELEM = r"(?s)<sitemap\s*>(.*?)</sitemap\s*>"
_LOC = r"(?s)<loc\s*>\s*(.*?)\s*</loc\s*>"
_LASTMOD = r"(?s)<lastmod\s*>\s*(.*?)\s*</lastmod\s*>"
_PRIORITY = r"(?s)<priority\s*>\s*(.*?)\s*</priority\s*>"
_CHANGEFREQ = r"(?s)<changefreq\s*>\s*(.*?)\s*</changefreq\s*>"

# sitemaps.org protocol changefreq tokens -> revisit interval in hours.
# "always" = re-fetch every visit (0h floor); "never" = archival, no
# scheduled revisit (null interval — content-change-driven recrawl,
# scheduler.recrawl_schedule, still applies).
CHANGEFREQ_HOURS: dict[str, float] = {
    "always": 0.0,
    "hourly": 1.0,
    "daily": 24.0,
    "weekly": 168.0,
    "monthly": 720.0,
    "yearly": 8760.0,
}


def parse_urlset(df: DataFrame, xml_col: str = "xml", parent_col: str = "sitemap_url") -> DataFrame:
    """Explode a (sitemap_url, xml) table of `<urlset>` leaves into
    (sitemap_url, loc, lastmod, changefreq, priority) — priority defaults
    to 0.5 per the protocol when the element is absent, changefreq is the
    lowercased token when present and one of the protocol's seven values
    (else null); empty/missing loc rows are dropped (a loc-less `<url>` is
    invalid per spec)."""
    entries = F.regexp_extract_all(F.col(xml_col), F.lit(_URL_ELEM), F.lit(1))
    e = df.select(F.col(parent_col), F.explode(entries).alias("_e"))
    loc = F.regexp_extract(F.col("_e"), _LOC, 1)
    lastmod = F.regexp_extract(F.col("_e"), _LASTMOD, 1)
    prio = F.regexp_extract(F.col("_e"), _PRIORITY, 1)
    freq = F.lower(F.regexp_extract(F.col("_e"), _CHANGEFREQ, 1))
    return (
        e.select(
            parent_col,
            loc.alias("loc"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
            F.when(
                freq.isin(*CHANGEFREQ_HOURS, "never"), freq
            ).alias("changefreq"),
            F.coalesce(
                F.when(prio != "", prio).cast("double"), F.lit(0.5)
            ).alias("priority"),
        )
        .filter(F.col("loc") != "")
    )


def recrawl_hints(urlset: DataFrame) -> DataFrame:
    """Map a parsed urlset into recrawl scheduling hints: interval_hours
    per the protocol's changefreq semantics (see :data:`CHANGEFREQ_HOURS`;
    "never" and absent changefreq yield null — those URLs fall back to the
    observed-change-rate policy, `operators/scheduler.recrawl_schedule`,
    which this table FUSES with: the sitemap hint is the site's declared
    prior, the Cho & Garcia-Molina banding is the measured posterior).
    Returns (loc, changefreq, interval_hours, priority, lastmod) — a pure
    codegen projection over the parse."""
    hours = F.lit(None).cast("double")
    for token, h in CHANGEFREQ_HOURS.items():
        hours = F.when(F.col("changefreq") == token, F.lit(h)).otherwise(hours)
    return urlset.select(
        "loc", "changefreq", hours.alias("interval_hours"), "priority", "lastmod"
    )


def parse_sitemap_index(df: DataFrame, xml_col: str = "xml", parent_col: str = "sitemap_url") -> DataFrame:
    """Explode a `<sitemapindex>` table into (sitemap_url, child_loc)."""
    entries = F.regexp_extract_all(F.col(xml_col), F.lit(_SM_ELEM), F.lit(1))
    e = df.select(F.col(parent_col), F.explode(entries).alias("_e"))
    loc = F.regexp_extract(F.col("_e"), _LOC, 1)
    return e.select(parent_col, loc.alias("child_loc")).filter(F.col("child_loc") != "")


def is_index(xml_col_name: str = "xml"):
    """Column predicate: payload is a sitemapindex (vs a urlset leaf)."""
    return F.col(xml_col_name).rlike("<sitemapindex")


def expand_index(sitemaps: DataFrame, xml_col: str = "xml", url_col: str = "sitemap_url") -> DataFrame:
    """Resolve one level of sitemapindex fan-out over a fetched
    (sitemap_url, xml) table: index rows are replaced by the leaf rows
    their `<sitemap><loc>` entries point at (equi-join on the child URL);
    leaf rows pass through. A child that is ITSELF an index is protocol-
    invalid (indexes of indexes are forbidden) — surfaced in the
    `unresolved_index` flag rather than silently dropped."""
    leaves = sitemaps.filter(~is_index(xml_col))
    idx = sitemaps.filter(is_index(xml_col))
    children = (
        parse_sitemap_index(idx, xml_col, url_col)
        .join(
            sitemaps.select(
                F.col(url_col).alias("child_loc"), F.col(xml_col).alias("_cxml")
            ),
            "child_loc",
            "left",
        )
        .select(
            F.col("child_loc").alias(url_col),
            F.col("_cxml").alias(xml_col),
        )
    )
    out = leaves.select(url_col, xml_col).union(children).dropDuplicates([url_col])
    return out.withColumn("unresolved_index", F.col(xml_col).isNull() | is_index(xml_col))
