"""Canonical link element (``<link rel="canonical">``) — page-declared
duplicate collapse.

The reference extracts links and metadata (services/parser/app.py:79-120,
:426) but never consumes the canonical link element; its dedup layers are
URL-exact, fuzzy and content-hash (services/deduplicator). At web scale the
canonical tag is the *site-declared* half of duplicate handling: CMSes emit
one canonical target for every parameter/pagination/mirror alias, and a
crawler that honors it (a) indexes one copy instead of N near-identical
bodies and (b) discovers the canonical target even when no <a> link points
at it. This module adds that layer, Spark-first:

- extraction is a whole-stage-codegen regexp projection (no UDF, no extra
  shuffle — it rides the parse stage like the <meta name=robots> gate in
  ``functions/columns.py:354``);
- relative hrefs resolve with pure string columns (absolute /
  scheme-relative / root-relative / path-relative);
- canonical *chains* (a→b→c) and loops collapse with the same
  pointer-doubling join as redirect chains (``operators/links.
  resolve_redirects``) — O(E)-shuffle per round, log(hops) rounds, never a
  per-hop walk. A loop or an over-deep chain makes the signal untrustworthy
  and is ignored (canonical := self) — the behavior Google documents for
  canonical loops.

HTML contract (same as the meta-robots gate): attributes may come in any
order, values quoted with ' or " or unquoted; a ``rel`` value may be a
token list ("alternate canonical"); tags whose quoted attributes contain a
literal ``>`` are out of contract. Only the FIRST canonical tag in the
document counts (browser/indexer behavior for conflicting tags).

Shape at 100 TB: extraction + resolution are projections; the chain
resolver joins only the minority of pages that declare a non-self
canonical (on real crawls a few percent); collapse is one hash-agg keyed
on the canonical target.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .links import resolve_redirects

# The full first <link ...> tag whose rel value contains the token
# `canonical` (double-quoted, single-quoted, or unquoted value). RE2- and
# Java-regex compatible: no lookaround, \b only.
_TAG_PAT = (
    r"""(?is)<link\b[^>]*\brel\s*=\s*(?:"[^">]*\bcanonical\b[^">]*"[^>]*"""
    r"""|'[^'>]*\bcanonical\b[^'>]*'[^>]*|canonical\b[^>]*?)>"""
)
_HREF_DQ = r"""(?is)\bhref\s*=\s*"([^">]*)\""""
_HREF_SQ = r"""(?is)\bhref\s*=\s*'([^'>]*)'"""
_HREF_UQ = r"""(?is)\bhref\s*=\s*([^\s"'>]+)"""

_ABS_PAT = r"^[A-Za-z][A-Za-z0-9+.\-]*://"


def canonical_href(html: Column) -> Column:
    """Raw href of the first rel=canonical link tag, or NULL when the page
    declares none (or declares it without an href)."""
    tag = F.regexp_extract(html, _TAG_PAT, 0)
    href = F.coalesce(
        F.nullif(F.regexp_extract(tag, _HREF_DQ, 1), F.lit("")),
        F.nullif(F.regexp_extract(tag, _HREF_SQ, 1), F.lit("")),
        F.nullif(F.regexp_extract(tag, _HREF_UQ, 1), F.lit("")),
    )
    return F.nullif(F.trim(href), F.lit(""))


def resolve_href(base_url: Column, href: Column) -> Column:
    """RFC-3986 reference resolution for the four forms that cover
    canonical tags in the wild, as pure string columns (codegen, no UDF):

    - absolute (``scheme://...``)        -> as-is
    - scheme-relative (``//host/path``)  -> base scheme + href
    - root-relative (``/path``)          -> base origin + href
    - path-relative (``name``)           -> base directory + href

    Dot-segment normalization (``../``) is NOT performed here — the epoch
    loop's candidate ingest runs every discovered URL through the full
    normalizer (functions/urlnorm.py urljoin semantics); this column form
    exists for the shuffle-free collapse/oracle path.
    """
    scheme = F.regexp_extract(base_url, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1)
    origin = F.regexp_extract(base_url, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/]*)", 1)
    basedir = F.when(
        base_url.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*$"),
        F.concat(base_url, F.lit("/")),
    ).otherwise(F.regexp_extract(base_url, r"^(.*/)", 1))
    return (
        F.when(href.isNull(), F.lit(None).cast("string"))
        .when(href.rlike(_ABS_PAT), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(origin, href))
        .otherwise(F.concat(basedir, href))
    )


def declared_canonical(url: Column, html: Column) -> Column:
    """Absolute form of the page's declared canonical target (NULL when
    none declared)."""
    return resolve_href(url, canonical_href(html))


def canonical_map(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    max_hops: int = 5,
) -> DataFrame:
    """One row per page: ``(url, canonical_final, kind, hops)``.

    kind:
    - ``none``  — no canonical tag; canonical_final = url
    - ``self``  — tag points at the page itself; canonical_final = url
    - ``moved`` — tag points elsewhere; canonical_final is the END of the
      declared chain (a→b→c collapses to c), hops = chain length
    - ``loop``  — the declared chain loops or exceeds ``max_hops``; the
      signal is ignored, canonical_final = url

    Chain resolution reuses links.resolve_redirects (pointer doubling:
    log2(max_hops) self-joins of the minority edge set, no per-hop walk).
    """
    base = pages.select(
        F.col(url_col).alias("url"),
        declared_canonical(F.col(url_col), F.col(html_col)).alias("_decl"),
    )
    edges = base.filter(F.col("_decl").isNotNull() & (F.col("_decl") != F.col("url")))
    res = resolve_redirects(
        edges, max_redirects=max_hops, src_col="url", dst_col="_decl"
    ).select(
        F.col("url").alias("_r_url"),
        F.col("final_url").alias("_final"),
        F.col("hops").alias("_hops"),
        F.col("resolved").alias("_ok"),
    )
    out = base.join(res, base["url"] == res["_r_url"], "left")
    kind = (
        F.when(F.col("_decl").isNull(), F.lit("none"))
        .when(F.col("_decl") == F.col("url"), F.lit("self"))
        .when(F.col("_ok"), F.lit("moved"))
        .otherwise(F.lit("loop"))
    )
    return out.select(
        "url",
        F.when(kind == "moved", F.col("_final")).otherwise(F.col("url")).alias(
            "canonical_final"
        ),
        kind.alias("kind"),
        F.when(kind == "moved", F.col("_hops")).otherwise(F.lit(0)).cast("int").alias(
            "hops"
        ),
    )


def collapse_alternates(cmap: DataFrame) -> DataFrame:
    """Group the canonical map by target: ``(canonical_url, n_pages,
    n_alternates, has_loop)``. ``n_alternates`` counts pages whose
    canonical points elsewhere (the rows an index would suppress in favor
    of the target). One hash-agg keyed on the target — scales."""
    return (
        cmap.groupBy(F.col("canonical_final").alias("canonical_url"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pages"),
            F.sum((F.col("kind") == "moved").cast("bigint")).alias("n_alternates"),
            F.max(F.col("kind") == "loop").alias("has_loop"),
        )
    )


# ---- hreflang alternate clusters -------------------------------------------

# Any <link ...> tag carrying an hreflang attribute (rel=alternate per
# spec; the attribute itself is the discriminating marker).
_HREFLANG_TAG_PAT = r"(?is)<link\b[^>]*\bhreflang\s*=[^>]*>"
_HREFLANG_VAL = r"""(?is)\bhreflang\s*=\s*["']?([A-Za-z0-9\-]+)"""


def hreflang_pairs(html: Column) -> Column:
    """Array of ``struct(lang, href)`` — one element per hreflang link tag,
    in document order. Pure regexp projection."""
    tags = F.regexp_extract_all(html, F.lit(_HREFLANG_TAG_PAT), F.lit(0))
    return F.transform(
        tags,
        lambda t: F.struct(
            F.lower(F.regexp_extract(t, _HREFLANG_VAL, 1)).alias("lang"),
            F.coalesce(
                F.nullif(F.regexp_extract(t, _HREF_DQ, 1), F.lit("")),
                F.nullif(F.regexp_extract(t, _HREF_SQ, 1), F.lit("")),
                F.nullif(F.regexp_extract(t, _HREF_UQ, 1), F.lit("")),
            ).alias("href"),
        ),
    )


def hreflang_clusters(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Language-variant clusters from per-page hreflang declarations.

    Per spec every member page declares the FULL alternate set (including
    itself), so clustering is a local decision — no graph join: the
    cluster key is the ``x-default`` href when declared, else the
    lexicographic minimum href of the page's own set. Output one row per
    cluster: ``(cluster_key, n_pages, n_langs, langs)`` with langs a
    sorted comma-joined string (array-free so value-hash oracles compare
    exactly).

    Shape at 100 TB: regexp projection + explode bounded by declared
    alternates per page (single digits) + one hash-agg on cluster_key.
    """
    pairs = pages.select(
        F.col(url_col).alias("url"),
        hreflang_pairs(F.col(html_col).cast("string")).alias("_alts"),
    ).filter(F.size("_alts") > 0)
    xdef = F.filter(F.col("_alts"), lambda a: a["lang"] == "x-default")
    key = F.coalesce(
        F.get(xdef, 0)["href"],  # null-safe under ANSI (empty array -> NULL)
        F.array_min(F.transform(F.col("_alts"), lambda a: a["href"])),
    )
    member = pairs.select(
        "url",
        key.alias("cluster_key"),
        F.col("_alts").alias("alts"),
    )
    exploded = member.select(
        "cluster_key", "url", F.explode("alts").alias("a")
    ).select("cluster_key", "url", F.col("a.lang").alias("lang"))
    return (
        exploded.groupBy("cluster_key")
        .agg(
            F.count_distinct("url").cast("bigint").alias("n_pages"),
            F.count_distinct("lang").cast("bigint").alias("n_langs"),
            F.array_join(F.array_sort(F.collect_set("lang")), ",").alias("langs"),
        )
    )


# ---- feed autodiscovery ------------------------------------------------------

_FEED_TAG_PAT = (
    r"""(?is)<link\b[^>]*\btype\s*=\s*["']?application/(?:rss|atom)\+xml[^>]*>"""
)


def feed_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """RSS/Atom feed autodiscovery (``<link rel="alternate"
    type="application/rss+xml" href=...>``): one row per (page, feed)
    with the feed URL resolved against the page and its kind. Feeds are
    high-value frontier seeds (they enumerate fresh URLs the way sitemaps
    do — sources/sitemap.py is the XML half; this is the discovery half).

    Output: ``(url, feed_url, feed_kind)`` with feed_kind in {rss, atom}.
    Pure regexp projection + bounded explode — scales.
    """
    tags = F.regexp_extract_all(
        F.col(html_col).cast("string"), F.lit(_FEED_TAG_PAT), F.lit(0)
    )
    exploded = pages.select(F.col(url_col).alias("url"), tags.alias("_tags")).select(
        "url", F.explode("_tags").alias("t")
    )
    href = F.coalesce(
        F.nullif(F.regexp_extract(F.col("t"), _HREF_DQ, 1), F.lit("")),
        F.nullif(F.regexp_extract(F.col("t"), _HREF_SQ, 1), F.lit("")),
        F.nullif(F.regexp_extract(F.col("t"), _HREF_UQ, 1), F.lit("")),
    )
    kind = F.when(
        F.lower(F.col("t")).contains("application/rss+xml"), F.lit("rss")
    ).otherwise(F.lit("atom"))
    return (
        exploded.select(
            "url",
            resolve_href(F.col("url"), F.trim(href)).alias("feed_url"),
            kind.alias("feed_kind"),
        )
        .filter(F.col("feed_url").isNotNull())
        .dropDuplicates(["url", "feed_url"])
    )
