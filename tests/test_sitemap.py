"""Sitemap XML source (sources/sitemap.py): urlset/sitemapindex parsing per
sitemaps.org protocol — field extraction, priority default, index fan-out
resolution, and the unresolved-index guard."""

import pyspark.sql.functions as F
import pytest

from webcrawler_spark.sources import sitemap as SM

LEAF_A = (
    "https://a.example.com/sitemap.xml",
    '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc> https://a.example.com/ </loc>"
    "<lastmod>2026-01-02</lastmod><priority>0.9</priority></url>"
    "<url>\n  <loc>https://a.example.com/page</loc>\n</url>"
    "<url><priority>0.1</priority></url>"  # loc-less: invalid, dropped
    "</urlset>",
)
LEAF_B = (
    "https://b.example.com/sitemap.xml",
    "<urlset><url><loc>https://b.example.com/only</loc></url></urlset>",
)
INDEX = (
    "https://a.example.com/sitemap_index.xml",
    "<sitemapindex>"
    "<sitemap><loc>https://a.example.com/sitemap.xml</loc></sitemap>"
    "<sitemap><loc>https://missing.example.com/sitemap.xml</loc></sitemap>"
    "<sitemap><loc>https://nested.example.com/sitemap_index.xml</loc></sitemap>"
    "</sitemapindex>",
)
NESTED = (
    "https://nested.example.com/sitemap_index.xml",
    "<sitemapindex><sitemap><loc>https://x.example.com/s.xml</loc></sitemap></sitemapindex>",
)


@pytest.fixture(scope="module")
def fetched(spark):
    return spark.createDataFrame(
        [LEAF_A, LEAF_B, INDEX, NESTED], "sitemap_url string, xml string"
    )


def test_parse_urlset_fields_and_defaults(spark, fetched):
    rows = {
        r["loc"]: r
        for r in SM.parse_urlset(fetched.filter(F.col("sitemap_url") == LEAF_A[0])).collect()
    }
    # whitespace-trimmed loc, explicit fields
    assert set(rows) == {"https://a.example.com/", "https://a.example.com/page"}
    r = rows["https://a.example.com/"]
    assert r["lastmod"] == "2026-01-02" and r["priority"] == 0.9
    # protocol defaults: no lastmod -> NULL, no priority -> 0.5
    r = rows["https://a.example.com/page"]
    assert r["lastmod"] is None and r["priority"] == 0.5


def test_parse_index(spark, fetched):
    locs = {
        r["child_loc"]
        for r in SM.parse_sitemap_index(
            fetched.filter(F.col("sitemap_url") == INDEX[0])
        ).collect()
    }
    assert locs == {LEAF_A[0], "https://missing.example.com/sitemap.xml", NESTED[0]}


def test_expand_index_resolution_and_guards(spark, fetched):
    out = {r["sitemap_url"]: r for r in SM.expand_index(fetched).collect()}
    # leaves pass through (deduped even though A is also index-referenced)
    assert not out[LEAF_A[0]]["unresolved_index"]
    assert not out[LEAF_B[0]]["unresolved_index"]
    # a referenced child missing from the fetch table is flagged, not dropped
    assert out["https://missing.example.com/sitemap.xml"]["unresolved_index"]
    # an index referencing another index (protocol-invalid) is flagged
    assert out[NESTED[0]]["unresolved_index"]
    # top-level index rows themselves are consumed, not emitted as leaves...
    # unless another index references them (NESTED is, INDEX is not)
    assert INDEX[0] not in out


def test_no_python_udf(spark, fetched):
    plan = (
        SM.parse_urlset(SM.expand_index(fetched).filter(~F.col("unresolved_index")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_changefreq_and_recrawl_hints(spark):
    """changefreq parses case-insensitively, rejects off-protocol tokens,
    and recrawl_hints maps the seven tokens to the published intervals
    ('never' and absent -> null = fall back to observed-change recrawl)."""
    from webcrawler_spark.sources.sitemap import parse_urlset, recrawl_hints

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://a/1</loc><changefreq>Daily</changefreq></url>"
        "<url><loc>https://a/2</loc><changefreq>hourly</changefreq></url>"
        "<url><loc>https://a/3</loc><changefreq>never</changefreq></url>"
        "<url><loc>https://a/4</loc><changefreq>sometimes</changefreq></url>"
        "<url><loc>https://a/5</loc></url>"
        "<url><loc>https://a/6</loc><changefreq>always</changefreq></url>"
        "</urlset>"
    )
    df = spark.createDataFrame(
        [("https://a/sitemap.xml", xml)], "sitemap_url string, xml string"
    )
    got = {
        r["loc"]: (r["changefreq"], r["interval_hours"])
        for r in recrawl_hints(parse_urlset(df)).collect()
    }
    assert got == {
        "https://a/1": ("daily", 24.0),
        "https://a/2": ("hourly", 1.0),
        "https://a/3": ("never", None),
        "https://a/4": (None, None),
        "https://a/5": (None, None),
        "https://a/6": ("always", 0.0),
    }
