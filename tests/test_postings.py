"""Materialized inverted index (operators/postings.py): parity with the
scan-time BM25, dictionary invariants, and the persisted-index plan shape
(partition pruning on the term-hash bucket; no text column at query time)."""

import pyspark.sql.functions as F
import pytest

from webcrawler_spark.operators import postings as PO
from webcrawler_spark.operators import search as SE

QT = ["customer", "window", "batch"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def index(docs):
    post = PO.build_postings(docs, "text", "doc_id", n_buckets=16).cache()
    dl = PO.doc_lengths(docs, "text", "doc_id").cache()
    return post, dl


def test_bm25_parity_with_scan_path(docs, index):
    """postings_bm25 from the index == search_bm25 from the raw text,
    score-for-score (same rounding, same tiebreak)."""
    post, dl = index
    via_index = PO.postings_bm25(post, dl, QT, k=50).collect()
    via_scan = SE.search_bm25(docs, QT, "text", "doc_id", k=50).collect()
    assert [(r["doc_id"], r["score"]) for r in via_index] == [
        (r["doc_id"], r["score"]) for r in via_scan
    ]
    assert len(via_index) > 0


def test_dictionary_invariants(docs, index):
    post, _ = index
    d = PO.term_dictionary(post)
    # df <= cf (a doc contributes >= 1 occurrence), max_tf <= cf
    assert d.filter((F.col("df") > F.col("cf")) | (F.col("max_tf") > F.col("cf"))).count() == 0
    # df of a term == distinct docs containing it, cross-checked from raw text
    row = d.filter(F.col("word") == "customer").first()
    expected = docs.filter(F.col("text").rlike("(?i)customer")).count()
    # rlike over raw text can over-count (substring inside a longer token);
    # exact check via the tokenizer itself
    from webcrawler_spark.operators.textstats import tokens

    exact = docs.filter(F.array_contains(tokens(F.col("text")), "customer")).count()
    assert row is not None and row["df"] == exact and exact <= expected


def test_postings_rows_are_per_term_doc(docs, index):
    post, _ = index
    assert post.groupBy("word", "doc_id").count().filter("count > 1").count() == 0
    # bucket is total: every row lands in [0, 16)
    assert post.filter((F.col("bucket") < 0) | (F.col("bucket") >= 16)).count() == 0


def test_persisted_index_plan_prunes_and_skips_text(spark, index, tmp_path):
    """The 100 TB claim: query-time reads touch only the postings table,
    pruned to the query terms' buckets — never the documents text."""
    post, dl = index
    pdir, ldir = str(tmp_path / "post"), str(tmp_path / "dl")
    post.write.partitionBy("bucket").parquet(pdir)
    dl.write.parquet(ldir)
    q = PO.postings_bm25(
        spark.read.parquet(pdir), spark.read.parquet(ldir), QT, k=20, n_buckets=16
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "documents" not in plan  # no raw-text scan anywhere in the plan
    # constant-folded bucket predicate reaches the partition filters
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "bucket" in pf
    # and the scan output matches the fixture-built index's answer
    fresh = [(r["doc_id"], r["score"]) for r in q.collect()]
    base = [(r["doc_id"], r["score"]) for r in PO.postings_bm25(post, dl, QT, k=20).collect()]
    assert fresh == base


def test_merge_postings_replace_semantics(spark, docs):
    """Two-epoch index maintenance: epoch-1 re-crawls half the docs with new
    text — merged postings must equal a fresh build over (old half ∪ new
    versions), with no stale terms surviving."""
    import pyspark.sql.functions as F

    old = docs.limit(40).cache()
    half_ids = [r["doc_id"] for r in old.limit(20).collect()]
    recrawled = old.filter(F.col("doc_id").isin(half_ids)).withColumn(
        "text", F.concat(F.lit("freshterm "), F.col("text"))
    )
    base = PO.build_postings(old, "text", "doc_id")
    delta = PO.build_postings(recrawled, "text", "doc_id")
    merged = PO.merge_postings(base, delta)

    current = old.filter(~F.col("doc_id").isin(half_ids)).unionByName(recrawled)
    want = PO.build_postings(current, "text", "doc_id")
    a = {(r["word"], r["doc_id"], r["tf"]) for r in merged.collect()}
    b = {(r["word"], r["doc_id"], r["tf"]) for r in want.collect()}
    assert a == b
    # the new term is present exactly for the re-crawled docs; stale
    # postings for those docs carry the updated tf only
    fresh = {r["doc_id"] for r in merged.filter(F.col("word") == "freshterm").collect()}
    assert fresh == set(half_ids)


def test_positional_phrase_matches_scan_path(spark, docs):
    """postings_phrase from the positional index == search_phrase from raw
    text, doc-for-doc and count-for-count, incl. a 3-token phrase."""
    from webcrawler_spark.operators import search as SE

    pos = PO.build_positional_postings(docs, "text", "doc_id").cache()
    for phrase in ["batch window", "customer batch window"]:
        toks = phrase.split()
        via_index = [
            (r["doc_id"], r["phrase_freq"])
            for r in PO.postings_phrase(pos, toks, k=100).collect()
        ]
        via_scan = [
            (r["doc_id"], r["phrase_freq"])
            for r in SE.search_phrase(docs, phrase, k=100).collect()
        ]
        assert via_index == via_scan, phrase
    # positions are 1-based and dense per doc
    agg = pos.groupBy("doc_id").agg(
        F.min("pos").alias("lo"), F.max("pos").alias("hi"), F.count(F.lit(1)).alias("n")
    )
    assert agg.filter((F.col("lo") != 1) | (F.col("hi") != F.col("n"))).count() == 0


def test_champion_topk_candidates_bounded_and_exactly_scored(docs, index):
    """Champion candidates come only from the r-deep per-term lists; every
    returned score equals the exact BM25 score for that doc (global df/dl),
    and with r >= max df the tiered path degenerates to exact BM25."""
    post, dl = index
    champs = PO.champion_lists(post.filter(F.col("word").isin(*QT)), r=3)
    cand = {r["doc_id"] for r in champs.select("doc_id").distinct().collect()}
    assert 0 < len(cand) <= 3 * len(QT)

    tiered = PO.champion_topk(post, dl, QT, r=3, k=50).collect()
    exact = {r["doc_id"]: r["score"] for r in PO.postings_bm25(post, dl, QT, k=10_000).collect()}
    for row in tiered:
        assert row["doc_id"] in cand
        assert row["score"] == exact[row["doc_id"]]

    # r larger than any df -> candidate set = all matching docs -> exact top-k
    wide = PO.champion_topk(post, dl, QT, r=10_000, k=20).collect()
    exact_topk = PO.postings_bm25(post, dl, QT, k=20).collect()
    assert [(r["doc_id"], r["score"]) for r in wide] == [
        (r["doc_id"], r["score"]) for r in exact_topk
    ]


def test_champion_lists_rank_order(spark):
    post = spark.createDataFrame(
        [("t", 1, 5), ("t", 2, 9), ("t", 3, 9), ("t", 4, 1)],
        "word string, doc_id long, tf long",
    )
    kept = PO.champion_lists(post, r=2).collect()
    assert sorted((r["doc_id"]) for r in kept) == [2, 3]  # tf desc, doc_id asc


def test_varbyte_stats_integer_exact(spark):
    # gaps: doc 0 -> first gap 1 (1 byte); 127 -> gap 127 (1B); 130 -> gap 3
    # (1B); 20000 -> gap 19870 (3B, >= 16384)
    post = spark.createDataFrame(
        [("t", 0, 1), ("t", 127, 1), ("t", 130, 1), ("t", 20_000, 1)],
        "word string, doc_id long, tf long",
    )
    row = PO.postings_varbyte_stats(post).collect()[0]
    assert row["df"] == 4
    assert row["varbyte_bytes"] == 1 + 1 + 1 + 3
    assert row["raw_bytes"] == 32
    assert row["ratio"] == round(32 / 6, 4)


def test_phrase_slop_move_semantics(spark):
    """Lucene two-term slop: in-order adjacent = 0, one gap = 1, reversed
    adjacent = 2; slop=0 equals the exact phrase path."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta x"),        # adjacent in order -> 0 moves
            (2, "alpha x beta"),        # one word between -> 1 move
            (3, "beta alpha x"),        # reversed adjacent -> 2 moves
            (4, "alpha x x x x beta"),  # too far for slop 3
            (5, "alpha beta alpha beta"),  # two in-order pairs + cross pairs
        ],
        "doc_id long, text string",
    )
    pos = PO.build_positional_postings(docs, "text", "doc_id")
    got = {r["doc_id"]: r for r in PO.postings_phrase_slop(pos, "alpha", "beta", slop=3).collect()}
    assert got[1]["min_moves"] == 0
    assert got[2]["min_moves"] == 1
    assert got[3]["min_moves"] == 2
    assert 4 not in got
    # doc 5 pairs within slop3: (1,2)=0, (1,4)=2, (3,4)=0, (3,2)=2 -> 4 pairs
    assert got[5]["slop_freq"] == 4 and got[5]["min_moves"] == 0

    # slop=0 == exact phrase, doc-for-doc
    exact = {r["doc_id"] for r in PO.postings_phrase(pos, ["alpha", "beta"], k=100).collect()}
    slop0 = {r["doc_id"] for r in PO.postings_phrase_slop(pos, "alpha", "beta", slop=0, k=100).collect()}
    assert exact == slop0
