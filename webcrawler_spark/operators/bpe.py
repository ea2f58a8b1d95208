"""Distributed BPE merge training (Sennrich et al. 2016) — tokenizer tier.

The reference crawler stops at whitespace keyword indexing
(services/parser/app.py); training-data pipelines additionally need a
subword tokenizer trained ON the crawled corpus. Classic BPE is a greedy
loop — count adjacent symbol pairs, merge the most frequent — and the key
to distributing it is the observation Sennrich et al. make in §3.2: the
loop runs over the WORD VOCABULARY (word, freq), not the corpus. One
explode + hash-agg shrinks a 100 TB corpus to a bounded vocab table; each
merge round is then a hash-agg + 1-row argmax over that table, and the
driver holds exactly one (pair, count) row per round — the same bounded
driver-state shape as the IVF centroid precedent (similarity.py).

Symbol sequences ride as a single STRING per word, each symbol wrapped in
parens: ``hello`` → ``(h)(e)(l)(l)(o)(_)`` (``_`` is the end-of-word
symbol; the tokenizer emits only [a-z0-9] so neither parens nor ``_``
collide). Merging pair (a,b) is then a literal ``replace(w, '(a)(b)',
'(ab)')`` — left-to-right non-overlapping, exactly the greedy semantics of
the published algorithm, with no shared delimiter between adjacent
matches (the trap of space-joined forms, where one replace consumes the
next match's leading space). Every step — pair explode, count, argmax,
merge application — is native codegen string work; no Python UDFs
anywhere. Application to the corpus is also vocab-side: the merge chain
rewrites each DISTINCT word once, then broadcast-joins back onto
occurrences.

DuckDB oracles replay training as unrolled per-round CTEs (pair hash-agg →
ORDER BY cnt DESC, pair LIMIT 1 → replace) — queries.SQL_bpe_merges /
SQL_bpe_vocab_counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

EOW = "_"  # end-of-word symbol (Sennrich et al.'s </w>)


def _tokens(text: Column) -> Column:
    """Same [a-z0-9]+ token family as lm/corpus so the tiers compose."""
    return F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != "")


def _wrapped(word: Column) -> Column:
    """``hello`` → ``(h)(e)(l)(l)(o)(_)``: one char per symbol + EOW."""
    # split at every strictly-internal position: (?!^)(?!$) — a bare (?!^)
    # also matches at end-of-string and emits a trailing empty symbol
    chars = F.split(word, "(?!^)(?!$)")
    return F.concat(
        F.lit("("),
        F.array_join(chars, ")("),
        F.lit(")("),
        F.lit(EOW),
        F.lit(")"),
    )


def symbols_of(wrapped: Column) -> Column:
    """Symbol array of a wrapped word: ``(a)(bc)(_)`` → [a, bc, _]."""
    inner = F.substring(wrapped, 2, F.length(wrapped) - F.lit(2))
    return F.split(inner, "\\)\\(")


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, wrapped) vocabulary — the bounded training table."""
    return (
        docs.select(F.explode(_tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .withColumn("wrapped", _wrapped(F.col("word")))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Freq-weighted adjacent-pair counts over the wrapped vocab.

    Pair key is its own replace pattern ``(a)(b)`` so the argmax row IS
    the next round's rewrite instruction.
    """
    s = symbols_of(F.col("wrapped"))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(s) - 1),
        lambda i: F.concat(
            F.lit("("),
            F.element_at(s, i),
            F.lit(")("),
            F.element_at(s, i + 1),
            F.lit(")"),
        ),
    )
    # sequence(1, n) DESCENDS for n < 1 — a fully-merged single-symbol word
    # must contribute no pairs, not a bogus reversed range
    pairs = F.when(F.size(s) >= 2, pairs).otherwise(
        F.array().cast("array<string>")
    )
    return (
        vocab.select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )


def train_bpe(
    docs: DataFrame, text_col: str = "text", n_merges: int = 8
) -> list[dict]:
    """Learn ``n_merges`` BPE merges; returns [{rank, pair, merged, cnt}].

    Each round moves exactly one (pair, cnt) row to the driver — the
    1000-executor shape: the vocab table stays distributed, the argmax is
    a bounded reduce (ORDER BY cnt DESC, pair LIMIT 1 equivalent), and the
    merge is a native string rewrite of the vocab. Ties break on the
    lexicographically smallest pair pattern, deterministically.
    """
    vocab = word_freqs(docs, text_col).select("wrapped", "freq").cache()
    merges: list[dict] = []
    cur = vocab
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(cur)
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not best:  # vocabulary of single-symbol words — nothing to merge
            break
        pair, cnt = best[0]["pair"], best[0]["cnt"]
        merged = pair.replace(")(", "")  # '(a)(b)' -> '(ab)'
        merges.append({"rank": rank, "pair": pair, "merged": merged, "cnt": cnt})
        cur = cur.withColumn(
            "wrapped", F.replace(F.col("wrapped"), F.lit(pair), F.lit(merged))
        )
    return merges


def merge_table(spark, merges: list[dict]) -> DataFrame:
    """The learned merges as a DataFrame (rank, pair, merged, cnt)."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("rank", IntegerType()),
            StructField("pair", StringType()),
            StructField("merged", StringType()),
            StructField("cnt", LongType()),
        ]
    )
    return spark.createDataFrame(
        [(m["rank"], m["pair"], m["merged"], m["cnt"]) for m in merges], schema
    )


def apply_merges(vocab: DataFrame, merges: list[dict]) -> DataFrame:
    """Rewrite each distinct word's wrapped form through the merge chain
    (rank order — BPE application must replay training order), adding a
    ``subwords`` array column. Vocab-side: one rewrite per distinct word,
    however many occurrences the corpus has."""
    cur = F.col("wrapped")
    for m in merges:
        cur = F.replace(cur, F.lit(m["pair"]), F.lit(m["merged"]))
    out = vocab.withColumn("encoded", cur)
    return out.withColumn("subwords", symbols_of(F.col("encoded")))


def subword_vocab(
    docs: DataFrame, text_col: str = "text", n_merges: int = 8
) -> DataFrame:
    """Corpus-level subword frequencies after BPE: (subword, n).

    Train, rewrite the distinct-word vocab, then weight each word's
    subwords by the word's corpus frequency — the corpus itself is read
    once (for word_freqs); everything after is vocab-sized.
    """
    merges = train_bpe(docs, text_col, n_merges)
    vocab = apply_merges(word_freqs(docs, text_col), merges)
    return (
        vocab.select(F.explode("subwords").alias("subword"), "freq")
        .groupBy("subword")
        .agg(F.sum("freq").cast("bigint").alias("n"))
    )


def encode_docs(
    docs: DataFrame,
    merges: list[dict],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc BPE length: (id, n_words, n_subwords) via vocab-side rewrite
    + broadcast join back onto word occurrences (the 100 TB path: merges
    touch each distinct word once, not each of its occurrences)."""
    occurrences = docs.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("word")
    )
    vocab = apply_merges(
        occurrences.groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .withColumn("wrapped", _wrapped(F.col("word"))),
        merges,
    ).select("word", F.size("subwords").alias("n_sub"))
    return (
        occurrences.join(F.broadcast(vocab), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_sub").cast("bigint").alias("n_subwords"),
        )
    )


def tokenizer_fertility(
    docs: DataFrame,
    merges: list[dict],
    by: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer fertility audit per group (typically language): subword
    tokens per word and characters per subword token under the LEARNED
    merge chain — the standard check that a tokenizer trained on one mix
    doesn't tax another language with 2-3x the tokens per word. Subword
    counts include the end-of-word marker (consistent with
    `encode_docs` / `bpe_sequence_plan` budgets); chars count the raw
    word letters.

    100 TB shape: same as encode_docs — the merge chain rewrites each
    DISTINCT word once (vocab-sized), the per-word length dim broadcasts
    back onto the occurrence stream, and the group agg partial-aggregates
    map-side. One corpus scan total."""
    occurrences = docs.select(
        F.col(by), F.explode(_tokens(F.col(text_col))).alias("word")
    )
    vocab = apply_merges(
        occurrences.groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .withColumn("wrapped", _wrapped(F.col("word"))),
        merges,
    ).select("word", F.size("subwords").alias("n_sub"))
    joined = occurrences.join(F.broadcast(vocab), "word")
    return joined.groupBy(F.col(by)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum("n_sub").cast("bigint").alias("n_tokens"),
        F.sum(F.length("word")).cast("bigint").alias("n_chars"),
    ).select(
        F.col(by),
        "n_words",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double") / F.col("n_words").cast("double"), 6
        ).alias("fertility"),
        F.round(
            F.col("n_chars").cast("double") / F.col("n_tokens").cast("double"), 6
        ).alias("chars_per_token"),
    )
