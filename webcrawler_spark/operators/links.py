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
    internal/external only, fixed discovered priority, depth+1 carried.

    With cfg.respect_canonical the parser-extracted rel=canonical rows
    (link_type='canonical', htmllib.extract_links) are candidates too:
    CMSes point aliases at targets no <a> links to, so honoring the tag
    means crawling the declared target. Off = reference parity (the
    reference stores canonical rows but never feeds them to the frontier,
    parser/app.py:628-647)."""
    types = ["internal", "external"]
    if cfg.respect_canonical:
        types.append("canonical")
    return (
        links.filter(F.col("link_type").isin(types))
        .select(
            F.col("target_url").alias("url"),
            F.col("source_url"),
            F.col("crawl_depth").alias("depth"),
            F.lit(cfg.discovered_priority).alias("source_priority"),
        )
    )


def anchor_text_index(
    links: DataFrame,
    target_col: str = "target_url",
    anchor_col: str = "anchor_text",
    k: int = 3,
) -> DataFrame:
    """Inbound anchor-text index: top-k anchor terms per link target.

    The classic off-page search signal (the reference stores per-link
    anchor_text in web_links, services/indexer mappings): what OTHER pages
    call a page often describes it better than its own text. Tokenize every
    inbound anchor, count per (target, term), keep the top-k by
    (freq desc, term asc — deterministic).

    Shape: explode is links-scale but the projected payload is (target,
    short term); the count is a map-side-partial hash agg on (target, term);
    the final window partitions by target over the counted dim (distinct
    terms per target, ≪ inbound degree). Skew note: mega-inbound targets
    (the google.com problem) are bounded by the same salt-then-merge
    two-phase used for the frontier top-k if a single target's term dim
    outgrows a task — at that point cap per-source anchors first.
    """
    from pyspark.sql import Window

    terms = (
        links.select(
            F.col(target_col).alias("target"),
            F.explode(F.split(F.lower(F.col(anchor_col)), r"[^a-z0-9]+")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    counts = terms.groupBy("target", "term").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy("target").orderBy(F.desc("freq"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("target", "term", "freq", "rank")
    )


def resolve_redirects(
    edges: DataFrame,
    max_redirects: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Resolve redirect chains to their final target URL with pointer
    doubling — ceil(log2(max_redirects + 1)) rounds of mapping-on-mapping
    self-join instead of one join per hop.

    The reference's fetcher follows redirect chains transparently with a
    hop cap (services/fetcher/app.py:166 ``max_redirects = 5``, :238-239
    ``allow_redirects=True``) and a chain past the cap (or a loop) raises
    TooManyRedirects, failing the fetch. Batch formulation: ``edges`` is
    the redirect map (one row per redirecting URL); the result has one row
    per distinct src with

    - final_url, hops, resolved=true  — terminal reached within the cap;
    - nulls,     resolved=false       — chain exceeds max_redirects OR
      loops (a cycle never reaches a terminal, exactly aiohttp's
      TooManyRedirects behavior).

    Shape at 100 TB: each round is one equi-join of the mapping with
    itself (O(E) shuffle per round), and the round count is logarithmic in
    the hop cap — chains up to 2^rounds collapse, and anything longer than
    max_redirects is classified without ever walking it hop-by-hop. No
    driver-side iteration over data, no collect; this is the same
    pointer-jumping trade as operators/components.py label propagation.
    """
    import math

    rounds = max(1, math.ceil(math.log2(max_redirects + 1)))
    m = edges.select(
        F.col(src_col).alias("url"),
        F.col(dst_col).alias("cur"),
        F.lit(1).cast("int").alias("hops"),
    ).dropDuplicates(["url"])  # a URL redirects to exactly one place
    for _ in range(rounds):
        m2 = m.select(
            F.col("url").alias("j_url"),
            F.col("cur").alias("j_cur"),
            F.col("hops").alias("j_hops"),
        )
        m = m.join(m2, m["cur"] == m2["j_url"], "left").select(
            "url",
            F.coalesce("j_cur", "cur").alias("cur"),
            (F.col("hops") + F.coalesce("j_hops", F.lit(0))).cast("int").alias("hops"),
        )
    srcs = edges.select(F.col(src_col).alias("cur")).distinct().withColumn(
        "_redirects_again", F.lit(True)
    )
    ok = F.col("_redirects_again").isNull() & (F.col("hops") <= max_redirects)
    return m.join(srcs, "cur", "left").select(
        "url",
        F.when(ok, F.col("cur")).alias("final_url"),
        F.when(ok, F.col("hops")).alias("hops"),
        ok.alias("resolved"),
    )


def anchor_search(
    links: DataFrame,
    query_tokens: list[str],
    target_col: str = "target_url",
    anchor_col: str = "anchor_text",
    k: int = 20,
) -> DataFrame:
    """Search the anchor index: rank link TARGETS by inbound anchor hits.

    The off-page half of web ranking (Brin & Page 1998 §2.2 store anchor
    words with the target doc for exactly this; the reference stores
    per-link anchor_text in web_links without acting on it): a page is
    ranked by what OTHER pages call it. Score = total occurrences of query
    terms across the target's inbound anchors; n_terms = distinct query
    terms matched (ties prefer broader coverage). Shape: the anchor
    explode filters to the bounded query-term set IMMEDIATELY (predicate
    on the exploded value, so only matching terms reach the shuffle), one
    map-side-partial hash agg, bounded top-k.
    """
    toks = sorted({t.lower() for t in query_tokens})
    terms = links.select(
        F.col(target_col).alias("target"),
        F.explode(
            F.split(F.lower(F.col(anchor_col)), r"[^a-z0-9]+")
        ).alias("term"),
    ).filter(F.col("term").isin(toks))
    return (
        terms.groupBy("target")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("score"),
            F.countDistinct("term").cast("bigint").alias("n_terms"),
        )
        .orderBy(F.desc("score"), F.desc("n_terms"), F.asc("target"))
        .limit(k)
    )


def focused_frontier(
    links: DataFrame,
    labeled: DataFrame,
    target_col: str = "target_url",
    anchor_col: str = "anchor_text",
    label_col: str = "label",
    labeled_text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Focused crawling (Chakrabarti, van den Berg & Dom 1999): rank
    UNCRAWLED frontier targets by the topical relevance of their inbound
    anchor text, judged by a classifier trained on already-fetched labeled
    pages. The reference stores per-link anchor_text in web_links
    (services/parser extracts it) but schedules by depth+host only; this is
    the published upgrade that steers the frontier toward a topic before
    spending fetch budget.

    Delegates to :func:`~webcrawler_spark.operators.corpus.nb_classifier_score`
    with the link target as the doc id: a target's feature bag is the union
    (with multiplicity) of hashed word uni+bigrams over ALL its inbound
    anchors, so every citation of a page votes on its topic — the Brin &
    Page anchor-propagation idea applied to scheduling. Returns
    (target, score, keep): score = NB log-odds + prior (6 dp), keep =
    score > 0 (the crawl gate). Targets whose anchors have zero tokens drop
    out (no evidence either way).

    Shape at 100 TB: the labeled set reduces to a <= n_buckets-row
    broadcast weight dim + 1-row prior; the frontier side is one anchor
    explode + map-side-partial hash agg keyed on the target — same plan as
    the quality classifier, no self-joins, no collects.
    """
    from .corpus import nb_classifier_score

    anchors = links.select(
        F.col(target_col).alias("target"), F.col(anchor_col).alias("anchor")
    )
    lab = labeled.select(
        F.col(label_col), F.col(labeled_text_col).alias("anchor")
    )
    return nb_classifier_score(
        anchors,
        lab,
        label_col=label_col,
        n_buckets=n_buckets,
        id_col="target",
        text_col="anchor",
    )


def anchor_diversity(
    edges: DataFrame,
    dst_col: str = "dst",
    src_host_col: str = "src_host",
    anchor_col: str = "anchor",
    min_inlinks: int = 20,
    max_diversity: float = 0.1,
) -> DataFrame:
    """Inlink anchor-text diversity — the classic link-farm signal.

    Organic inlinks phrase their anchors independently; a farm stamps one
    template anchor across thousands of pages.  Per target: inlink count,
    distinct source hosts, distinct anchor strings, diversity =
    anchors/inlinks; `farm_suspect` = heavily linked (>= min_inlinks) with
    near-zero diversity (<= max_diversity).  Feeds the same demotion path
    as TrustRank (operators/graph.py) but needs no iteration — one hash-agg
    over the anchor edge table the epoch loop already extracts
    (links.anchor_text_index's input).
    """
    return (
        edges.groupBy(F.col(dst_col).alias("dst"))
        .agg(
            F.count(F.lit(1)).alias("n_inlinks"),
            F.countDistinct(src_host_col).alias("n_src_hosts"),
            F.countDistinct(anchor_col).alias("n_anchors"),
        )
        .withColumn(
            "diversity", F.round(F.col("n_anchors") / F.col("n_inlinks"), 6)
        )
        .withColumn(
            "farm_suspect",
            (F.col("n_inlinks") >= min_inlinks)
            & (F.col("diversity") <= max_diversity),
        )
    )
