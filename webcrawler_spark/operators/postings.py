"""Materialized inverted index: the Elasticsearch-analog postings table.

The reference indexes every parsed page into Elasticsearch
(services/parser/app.py bulk-index -> services/search-api/app.py queries);
ES's internal structure is an inverted index (term dictionary + postings
lists). The search operators in `operators/search.py` re-tokenize the
corpus per query — correct, and fine when each query is a one-off batch
job, but at 100 TB the scan dominates: every search pays the full
explode + agg over the text column.

This module is the materialize-once scale path: build the postings table
`(word, doc_id, tf)` and the doc-length table once per ingest epoch
(exactly when ES would bulk-index), persist both bucketed by word hash,
and answer queries with a term-slice join — each query touches only the
postings rows of its query terms (a partition-pruned read when the table
is written bucketed/partitioned by `bucket`), never the raw text.

100 TB shape: one explode + map-side partial hash-agg builds the postings
(same shape as keywords_global, the plan the epoch job already runs); the
dictionary is a second hash-agg over the postings, tiny relative to the
corpus. Query time: the per-term dictionary rows (|query| rows) broadcast,
the postings are filtered to the query's word set BEFORE any shuffle
(predicate pushdown to the bucketed scan), and the per-doc score agg
shuffles only matching (doc, term) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens


def build_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """(word, doc_id, tf, bucket): one postings row per distinct (term, doc).

    `bucket` = pmod(xxhash64(word), n_buckets) is the partition key for the
    persisted table — queries prune to their terms' buckets. Mirrors ES's
    shard-internal term partitioning (SURVEY S12-S13)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("word"),
    )
    return (
        toks.groupBy("word", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bucket", F.pmod(F.xxhash64("word"), F.lit(n_buckets)).cast("int"))
    )


def doc_lengths(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, dl): token count per doc — BM25's length normalizer.
    Persisted alongside the postings at index-build time."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("dl"),
    )


def term_dictionary(postings: DataFrame) -> DataFrame:
    """ES term dictionary: per-term document frequency (df), collection
    frequency (cf = total occurrences), and the hottest single-doc tf.
    One hash-agg over the postings; at 100 TB this is the small table the
    query planner broadcasts for idf."""
    return postings.groupBy("word").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
        F.max("tf").alias("max_tf"),
    )


def postings_bm25(
    postings: DataFrame,
    doclens: DataFrame,
    query_tokens: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int | None = None,
) -> DataFrame:
    """Okapi BM25 top-k answered FROM the materialized index — byte-identical
    scores to `search.search_bm25` on the same corpus (pinned by
    tests/test_postings.py parity), but the plan never touches the text
    column: filter postings to the query terms (pushed to the scan),
    broadcast the |query|-row df/stats sides, one per-doc agg.

    Pass `n_buckets` (the value used at build_postings time) when `postings`
    is the PERSISTED table partitioned by `bucket`: the query then also
    filters on the terms' bucket ids — xxhash64 of literals constant-folds,
    so the predicate lands on the partition column and the scan prunes to
    |query| of n_buckets partitions."""
    stats = doclens.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    qpost = postings
    if n_buckets is not None:
        cond = None
        for t in query_tokens:
            eq = F.col("bucket") == F.pmod(F.xxhash64(F.lit(t)), F.lit(n_buckets)).cast("int")
            cond = eq if cond is None else (cond | eq)
        qpost = qpost.filter(cond)
    qpost = qpost.filter(F.col("word").isin(*query_tokens)).select("word", "doc_id", "tf")
    dfreq = qpost.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        qpost.join(F.broadcast(dfreq), "word")
        .join(doclens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 4).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def champion_lists(postings: DataFrame, r: int = 8) -> DataFrame:
    """Tiered index (champion lists, IIR §7.1.3): per term, keep only the r
    highest-impact postings (tf DESC, doc_id ASC tie-break).

    The scale rationale: exact BM25 on a common term scans that term's FULL
    postings list — at 10^10 docs, "the" is billions of rows per query.  The
    champion table is ≤ r rows per term, materialized once at index-build
    time next to the postings (same bucketing), so the candidate-generation
    read is r×|query| rows regardless of corpus size.  One window over the
    postings' own (word) partitioning — no extra shuffle beyond the build."""
    from pyspark.sql import Window

    w = Window.partitionBy("word").orderBy(F.desc("tf"), F.asc("doc_id"))
    return (
        postings.withColumn("champ_rank", F.row_number().over(w))
        .filter(F.col("champ_rank") <= r)
        .drop("champ_rank")
    )


def champion_topk(
    postings: DataFrame,
    doclens: DataFrame,
    query_tokens: list[str],
    r: int = 8,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k answered from champion lists: candidates are the union of
    the query terms' champion lists (≤ r×|query| docs, broadcast); scoring
    is EXACT BM25 (global df, true tf/dl) restricted to those candidates.
    Deterministic contract — same champions in, same top-k out — so the
    DuckDB oracle replays it exactly; recall vs exact BM25 is a quality
    knob (r), not a correctness one."""
    stats = doclens.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    qpost = postings.filter(F.col("word").isin(*query_tokens)).select(
        "word", "doc_id", "tf"
    )
    dfreq = qpost.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    cand = champion_lists(qpost, r).select("doc_id").distinct()
    scored = (
        qpost.join(F.broadcast(cand), "doc_id", "left_semi")
        .join(F.broadcast(dfreq), "word")
        .join(doclens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 4).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def postings_varbyte_stats(postings: DataFrame, top_n: int = 50) -> DataFrame:
    """Index-size accounting: per-term delta-gap + varbyte cost of the
    postings list vs raw 8-byte ids — the compaction/storage planner's
    input (decides which segments are worth re-sorting by doc_id before
    flush; gap-encoded sorted runs are ~5-8× smaller on clustered ids).

    Varbyte: 7 payload bits per byte → 1 byte for gap<2^7, 2 for <2^14,
    3 for <2^21, else 4 (integer-exact CASE, no float log — portable across
    engines).  First posting stores the id itself (+1: ids are 0-based).
    Requires an integral doc-id column (map string urls to a dense id
    first, as the catalog's crawl_id does).  One window over the postings'
    (word) partitioning + one hash-agg."""
    from pyspark.sql import Window

    w = Window.partitionBy("word").orderBy("did")
    g = (
        postings.select("word", F.col("doc_id").cast("bigint").alias("did"))
        .withColumn("prev", F.lag("did").over(w))
        .withColumn(
            "gap",
            F.when(F.col("prev").isNull(), F.col("did") + 1).otherwise(
                F.col("did") - F.col("prev")
            ),
        )
    )
    vb = (
        F.when(F.col("gap") < 128, 1)
        .when(F.col("gap") < 16384, 2)
        .when(F.col("gap") < 2097152, 3)
        .otherwise(4)
    )
    out = (
        g.withColumn("vb", vb)
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("vb").cast("bigint").alias("varbyte_bytes"),
        )
        .withColumn("raw_bytes", (F.col("df") * 8).cast("bigint"))
        .withColumn("ratio", F.round(F.col("raw_bytes") / F.col("varbyte_bytes"), 4))
    )
    return out.orderBy(F.desc("df"), F.asc("word")).limit(top_n)


def postings_phrase_slop(
    positional: DataFrame,
    term_a: str,
    term_b: str,
    slop: int = 2,
    k: int = 20,
) -> DataFrame:
    """Two-term sloppy phrase from the positional index — ES
    `match_phrase` with `slop` (Q1 family).  A position pair matches when
    |pos_b − pos_a − 1| ≤ slop, which for two terms is exactly Lucene's
    move-count semantics: adjacent in order = 0 moves, one word between
    = 1, adjacent reversed = 2.  Returns (doc_id, slop_freq, min_moves)
    ranked by slop_freq DESC, doc_id ASC.

    Plan shape: each term's postings slice is a pruned read (term + bucket
    predicate on the persisted table); the pair join is per-doc on doc_id
    with the position band as the join residual — fan-out bounded by
    tf_a × tf_b inside one doc, never cross-doc.  Exact phrase (slop=0)
    stays on `postings_phrase`, which generalizes to n terms."""
    pa = positional.filter(F.col("word") == term_a).select(
        "doc_id", F.col("pos").alias("pos_a")
    )
    pb = positional.filter(F.col("word") == term_b).select(
        "doc_id", F.col("pos").alias("pos_b")
    )
    moves = F.abs(F.col("pos_b") - F.col("pos_a") - 1)
    pairs = pa.join(pb, "doc_id").withColumn("moves", moves).filter(
        F.col("moves") <= slop
    )
    return (
        pairs.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("slop_freq"),
            F.min("moves").cast("bigint").alias("min_moves"),
        )
        .orderBy(F.desc("slop_freq"), F.asc("doc_id"))
        .limit(k)
    )


def merge_postings(base: DataFrame, delta: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Index maintenance across crawl epochs (the ES segment-merge /
    re-index analog): the delta's documents REPLACE their base postings
    (a re-crawled page's old terms must vanish), unseen documents append.
    One left-anti join on the delta's (small, per-epoch) doc-id set + a
    union — the accumulated base never rewrites, matching the catalog's
    merge-on-read discipline; compaction folds deltas on the same cadence
    as `Catalog.compact_delta`."""
    delta_docs = delta.select(id_col).distinct()
    kept = base.join(delta_docs, id_col, "left_anti")
    return kept.unionByName(delta)


def build_positional_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """(word, doc_id, pos, bucket): the POSITIONAL index — what ES actually
    stores to answer match_phrase without re-reading source text. One
    posexplode; positions are 1-based over the analyzed token stream (the
    same stream `phrase_count` scans), bucketed by term hash like
    `build_postings` for query-time partition pruning."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos0", "word"),
    )
    return toks.select(
        "word",
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        F.pmod(F.xxhash64("word"), F.lit(n_buckets)).cast("int").alias("bucket"),
    )


def postings_phrase(
    positional: DataFrame,
    phrase_tokens: list[str],
    k: int = 20,
) -> DataFrame:
    """match_phrase answered FROM the positional index — identical results
    to `search.search_phrase` (pinned in tests): the first term's postings
    anchor candidate starts, each subsequent term joins on
    (doc_id, pos = start + offset), adjacency falls out of the equi-join
    keys. Per-term slices are scan-pruned exactly like postings_bm25; the
    joins key on (doc, position) — co-partitioned after the first
    shuffle, and survivor cardinality shrinks at every step."""
    n = len(phrase_tokens)
    cur = (
        positional.filter(F.col("word") == phrase_tokens[0])
        .select("doc_id", F.col("pos").alias("start"))
    )
    for j in range(1, n):
        nxt = positional.filter(F.col("word") == phrase_tokens[j]).select(
            "doc_id", (F.col("pos") - j).alias("start")
        )
        cur = cur.join(nxt, ["doc_id", "start"])
    return (
        cur.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("phrase_freq"))
        .orderBy(F.desc("phrase_freq"), F.asc("doc_id"))
        .limit(k)
    )
