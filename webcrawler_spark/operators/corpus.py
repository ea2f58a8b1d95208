"""Training-corpus assembly operators — the last mile of an LLM data
pipeline: turn a cleaned, deduplicated document pool into training shards.

Beyond-the-reference extension (the reference crawler stops at the search
index; these are the ops a 100 TB corpus consumer needs next):

- deterministic_sample: reproducible hash-gate sampling, no RNG state
- mix_corpus: per-source target proportions -> per-source sampling rates
- pack_shards: token-budget shard assignment via per-source cumulative sums
- ngram_overlap / decontaminate: benchmark-contamination flagging by
  word-n-gram overlap against an eval set

Everything is pure pyspark.sql.functions (codegen, no Python), and every
arithmetic form is chosen to be expressible identically in ANSI SQL so each
operator carries a DuckDB oracle in the driver contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# Knuth's multiplicative-hash constant (2^32 / phi). doc ids are < 2^40 in
# any realistic corpus, so id * K < 2^72 would overflow — mod first, then
# multiply: ((id % M) * (K % M)) % M stays within int64 for M = 10^4.
_KNUTH = 2654435761
_MOD = 10_000


def sample_gate(key: Column, rate: float, salt: int = 0) -> Column:
    """Deterministic keep/drop gate: keeps ~rate of rows, decided purely by
    the integer key (reproducible across runs/partitionings, unlike
    df.sample whose outcome depends on partition iteration order)."""
    # pmod, not %: Spark % preserves sign, so a negative 64-bit fingerprint
    # key would yield a negative bucket that passes every rate threshold.
    bucket = F.pmod(F.pmod(key + F.lit(salt), _MOD) * (_KNUTH % _MOD), _MOD)
    return bucket < F.lit(int(round(rate * _MOD)))


def deterministic_sample(
    docs: DataFrame, rate: float, id_col: str = "doc_id", salt: int = 0
) -> DataFrame:
    """~rate fraction of docs, selected by hash gate on the id column."""
    return docs.filter(sample_gate(F.col(id_col), rate, salt))


def mix_corpus(
    docs: DataFrame,
    weights: dict[str, float],
    total: int,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Down-sample each source to hit target proportions.

    weights maps source -> target fraction of the output mix; each source is
    hash-gate sampled at rate min(1, total*weight / count(source)). The
    per-source counts are a broadcast-joined aggregate (tiny dim: one row
    per source), so the only corpus-scale work is one scan + filter.
    Sources absent from `weights` are dropped.
    """
    counts = docs.groupBy(source_col).agg(F.count("*").alias("_n"))
    wmap = F.create_map(
        *[x for s, w in sorted(weights.items()) for x in (F.lit(s), F.lit(float(w)))]
    )
    w = wmap[F.col(source_col)]
    # least() SKIPS nulls (both Spark and ANSI SQL), so an unlisted source
    # would silently get rate 1.0 — gate the null before least
    rates = counts.select(
        source_col,
        F.when(
            w.isNotNull(),
            F.least(F.lit(1.0), F.lit(float(total)) * w / F.col("_n")),
        ).alias("_rate"),
    )
    gate = (
        F.pmod(F.pmod(F.col(id_col), _MOD) * (_KNUTH % _MOD), _MOD).cast("double")
        < F.round(F.col("_rate") * _MOD, 0)
    )
    return (
        docs.join(F.broadcast(rates), source_col)
        .filter(F.col("_rate").isNotNull() & gate)
        .drop("_rate")
    )


def whitespace_tokens(text: Column) -> Column:
    """Whitespace token count — the packing currency."""
    return F.size(F.filter(F.split(text, "\\s+"), lambda t: t != ""))


def pack_shards(
    docs: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each doc a training-shard id so shards hold ~budget_tokens.

    shard_id = (source, floor((cumulative_tokens - tokens)/budget)) — the
    doc starts a new shard when the running total crosses the budget.
    Cumulative sums run PER SOURCE (window partitioned by source, ordered by
    doc id): a global cumsum would be a single-partition window — the
    classic local-test-passes/cluster-dies shape. At 100 TB, substitute any
    bounded partition key (source, date, shard-of-id) — packing quality only
    needs locality, not a global order.
    """
    w = Window.partitionBy(source_col).orderBy(id_col)
    toks = whitespace_tokens(F.col(text_col))
    return docs.select(
        id_col,
        source_col,
        toks.alias("n_tokens"),
        F.floor(
            (F.sum(toks).over(w) - toks).cast("double") / F.lit(float(budget_tokens))
        ).cast("int").alias("shard_in_source"),
    )


def word_ngram_set(text: Column, n: int) -> Column:
    """Distinct word n-grams for arbitrary n, fully native: slice windows of
    the token array indexed by a generated sequence (no Python)."""
    toks = F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != "")
    sz = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), sz - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    # sequence(1, k) for k < 1 DESCENDS instead of being empty — guard short
    # texts explicitly
    return F.when(sz >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def ngram_overlap(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, overlap_grams) for every doc sharing at least one word
    n-gram with the eval set — the benchmark-decontamination probe.

    Shape: explode doc grams -> join against the DISTINCT eval gram set.
    The eval side (a benchmark suite, thousands of docs) collapses to a
    small distinct gram dim — broadcast; the corpus side is one explode +
    one partial-aggregated count. No corpus self-join.
    """
    eval_grams = (
        eval_docs.select(
            F.explode(word_ngram_set(F.col(text_col), n)).alias("gram")
        ).distinct()
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(word_ngram_set(F.col(text_col), n)).alias("gram")
    )
    return (
        doc_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("overlap_grams"))
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Docs with >= min_overlap shared n-grams removed (left-anti join on
    the flagged id set)."""
    flagged = (
        ngram_overlap(docs, eval_docs, n, id_col, text_col)
        .filter(F.col("overlap_grams") >= min_overlap)
        .select(id_col)
    )
    return docs.join(flagged, id_col, "left_anti")


def sequence_plan(
    docs: DataFrame,
    seq_len: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training-sequence packing plan: map each doc onto the fixed-length
    token sequences it feeds (the final LLM-data step — documents
    concatenated per source stream in deterministic (source, id) order,
    chunked into ``seq_len``-token training sequences that CROSS doc
    boundaries). Computed without materializing a single token: one
    per-source cumulative-sum window gives every doc its global token
    offset, and the sequence indices fall out arithmetically —

        seq_first    = floor(cum_before / L)
        seq_last     = floor((cum_before + n - 1) / L)
        first_offset = cum_before % L   (doc's first token within seq_first)

    Per-source streams keep the window partitioned (pack_shards' rule: a
    GLOBAL order cumsum would be a single-partition window); training
    mixtures are assembled per source anyway. Empty docs are dropped."""
    w = Window.partitionBy(source_col).orderBy(id_col)
    n = whitespace_tokens(F.col(text_col))
    d = docs.select(
        F.col(source_col).alias("source"), F.col(id_col).alias("doc_id"), n.alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    cum = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("cum_before")
    return d.select("source", "doc_id", "n_tokens", cum).select(
        "source",
        "doc_id",
        "n_tokens",
        "cum_before",
        F.floor(F.col("cum_before") / seq_len).cast("long").alias("seq_first"),
        F.floor((F.col("cum_before") + F.col("n_tokens") - 1) / seq_len)
        .cast("long")
        .alias("seq_last"),
        (F.col("cum_before") % seq_len).cast("long").alias("first_offset"),
    )


def write_corpus_shards(
    docs: DataFrame,
    path: str,
    budget_tokens: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    fmt: str = "json",
) -> DataFrame:
    """The export sink completing the pack_shards story: assign
    token-budget shards, then write the corpus partitioned by
    (source, shard_in_source) as JSONL (the interchange format LLM
    trainers consume) or parquet.

    100 TB shape: `partitionBy` writes one directory per (source, shard)
    with no extra shuffle beyond pack_shards' per-source window — each
    writer task streams its partition. Returns the packed frame (doc_id,
    source, n_tokens, shard_in_source) so callers can assert manifests.
    """
    packed = pack_shards(docs, budget_tokens, source_col, id_col, text_col)
    out = docs.join(packed.select(id_col, "shard_in_source"), id_col)
    (
        out.write.mode("overwrite")
        .partitionBy(source_col, "shard_in_source")
        .format(fmt)
        .save(path)
    )
    return packed
