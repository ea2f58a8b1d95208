"""Stupid-Backoff n-gram language model — the perplexity-filter tier.

CCNet's headline quality signal is the perplexity of each document under a
KenLM 5-gram model trained on a clean target corpus (Wenzek et al. 2020
§4.3); FineWeb and RedPajama keep the same gate. The reference crawler has
no LM tier (it stops at keyword indexing, services/parser/app.py), so this
is a beyond-the-reference LLM-pipeline extension over the same tables.

The model here is Stupid Backoff (Brants et al. 2007, "Large Language
Models in Machine Translation") rather than Kneser-Ney: it was designed
precisely for MapReduce-scale corpora — counts only, no discount fitting,
score S(w|ctx) = cnt(ngram)/cnt(ctx) with a fixed alpha backoff — which
makes both training and scoring pure relational algebra:

- train_lm: one explode per order -> hash-agg -> a single
  (order, gram, cnt) count table. At web scale this table is itself
  distributed (billions of grams); at bounded vocab it broadcasts.
- lm_score: build each scored position's five lookup keys (trigram,
  context bigram, bigram, context unigram, unigram) BEFORE the explode
  (one struct array per doc, so the token array is not carried through
  the shuffle), left-join the count dims, coalesce down the backoff
  chain, aggregate mean log-score per doc -> perplexity. Each lookup is
  a join on the gram key — exactly Brants et al.'s batched distributed
  inference; `broadcast_model=True` pins the dims map-side when the
  model fits (the 100 TB path flips it off and lets AQE pick the join).

Sentence-start is padded with two BOS sentinels (chr(2) — the tokenizer
strips everything outside [a-z0-9], so no real token collides). Counts
include the pads; the unigram total used by the base case therefore
includes 2 BOS per training doc — a constant normalization, harmless to
ranking and replayed identically in the DuckDB oracle.

Every expression is ANSI-safe codegen (no Python UDFs) and replays
exactly in the DuckDB oracles (queries.SQL_lm_perplexity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BOS = "\x02"
ALPHA = 0.4  # Brants et al. 2007 §4: a single unoptimized backoff factor


def _tokens(text: Column) -> Column:
    """Lowercased [a-z0-9]+ tokens — same family as corpus._word_grams_multi
    so the LM tier composes with the DSIR/NB feature tiers."""
    return F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != "")


def _padded(text: Column) -> Column:
    return F.concat(F.array(F.lit(BOS), F.lit(BOS)), _tokens(text))


def train_lm(
    docs: DataFrame, text_col: str = "text", order: int = 3
) -> DataFrame:
    """Count every 1..order-gram of the BOS-padded token stream.

    Returns (order:int, gram:string, cnt:bigint) — gram is the
    space-joined token window (tokens cannot contain spaces). One explode
    + hash-agg per order, unioned; map-side partial aggregation keeps the
    shuffle at distinct-gram cardinality.
    """
    if order < 1:
        raise ValueError("order must be >= 1")
    t = _padded(F.col(text_col))

    def _joiner(k):
        # NB: a `lambda i, k=k` would have arity 2, and F.transform feeds
        # the element INDEX into the second slot — close over k instead
        return lambda i: F.array_join(F.slice(t, i, k), " ")

    parts = []
    for k in range(1, order + 1):
        sz = F.size(t)
        grams = F.transform(F.sequence(F.lit(1), sz - (k - 1)), _joiner(k))
        # sequence(1, n) DESCENDS for n < 1 — guard short docs (padded
        # size is always >= 2, so only k >= 3 can underflow)
        grams = F.when(sz >= k, grams).otherwise(
            F.array().cast("array<string>")
        )
        parts.append(
            docs.select(F.lit(k).alias("order"), F.explode(grams).alias("gram"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("order", "gram").agg(
        F.count("*").cast("bigint").alias("cnt")
    )


def _lookup_keys(t: Column) -> Column:
    """Per scored position (1-based padded index i >= 3), the five lookup
    keys of the backoff chain, built while the token array is still one
    row — the explode downstream carries only this struct."""
    sz = F.size(t)
    positions = F.when(sz >= 3, F.sequence(F.lit(3), sz)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        positions,
        lambda i: F.struct(
            F.array_join(F.slice(t, i - 2, 3), " ").alias("g3"),
            F.array_join(F.slice(t, i - 2, 2), " ").alias("c2"),
            F.array_join(F.slice(t, i - 1, 2), " ").alias("g2"),
            F.element_at(t, i - 1).alias("c1"),
            F.element_at(t, i).alias("g1"),
        ),
    )


def lm_token_scores(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = ALPHA,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-token Stupid-Backoff scores: (id, pos, token, branch, score).

    branch is the backoff level that fired (3 = trigram hit, 2 = bigram,
    1 = unigram, 0 = out-of-vocabulary floor) — exposed for tests and
    corpus debugging; lm_score aggregates this frame.
    """
    hint = F.broadcast if broadcast_model else (lambda d: d)
    dims = {
        k: hint(
            model.filter(F.col("order") == k).select(
                F.col("gram"), F.col("cnt").alias(f"cnt{k}")
            )
        )
        for k in (1, 2, 3)
    }
    # total unigram mass (incl. BOS pads) — 1-row dim, broadcast cross join
    total = hint(
        model.filter(F.col("order") == 1).agg(
            F.sum("cnt").cast("double").alias("_total")
        )
    )
    rows = (
        docs.select(
            F.col(id_col), F.posexplode(_lookup_keys(_padded(F.col(text_col))))
        )
        .select(id_col, (F.col("pos") + 1).alias("pos"), "col.*")  # 1-based token ordinal
    )
    j = (
        rows.join(dims[3].withColumnRenamed("gram", "g3"), "g3", "left")
        .join(
            dims[2].select(F.col("gram").alias("c2"), F.col("cnt2").alias("cnt_c2")),
            "c2",
            "left",
        )
        .join(dims[2].withColumnRenamed("gram", "g2"), "g2", "left")
        .join(
            dims[1].select(F.col("gram").alias("c1"), F.col("cnt1").alias("cnt_c1")),
            "c1",
            "left",
        )
        .join(dims[1].withColumnRenamed("gram", "g1"), "g1", "left")
        .crossJoin(total)
    )
    a = F.lit(float(alpha))
    # a trained trigram's prefix bigram is always trained too (same corpus,
    # same padding), so cnt_c2/cnt_c1 are non-null whenever cnt3/cnt2 are
    score = (
        F.when(F.col("cnt3").isNotNull(), F.col("cnt3") / F.col("cnt_c2"))
        .when(F.col("cnt2").isNotNull(), a * F.col("cnt2") / F.col("cnt_c1"))
        .when(F.col("cnt1").isNotNull(), a * a * F.col("cnt1") / F.col("_total"))
        .otherwise(a * a / F.col("_total"))
        .cast("double")
    )
    branch = (
        F.when(F.col("cnt3").isNotNull(), 3)
        .when(F.col("cnt2").isNotNull(), 2)
        .when(F.col("cnt1").isNotNull(), 1)
        .otherwise(0)
        .cast("int")
    )
    return j.select(
        id_col,
        "pos",
        F.col("g1").alias("token"),
        branch.alias("branch"),
        score.alias("score"),
    )


def lm_score(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = ALPHA,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-doc LM stats: (id, n_tokens, avg_logprob, perplexity).

    avg_logprob = mean natural-log Stupid-Backoff score (6 dp);
    perplexity = exp(-avg_logprob) (6 dp; lower = more in-domain — CCNet
    keeps the low-perplexity head). Zero-token docs drop out (no scored
    positions), matching dsir_importance's convention.
    """
    tok = lm_token_scores(
        docs, model, id_col, text_col, alpha, broadcast_model
    )
    avg = F.sum(F.log("score")) / F.count("*")
    return tok.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.round(avg, 6).alias("avg_logprob"),
        F.round(F.exp(-avg), 6).alias("perplexity"),
    )


def perplexity_buckets(
    scored: DataFrame,
    ppl_col: str = "perplexity",
    broadcast_thresholds: bool = True,
) -> DataFrame:
    """CCNet head/middle/tail split by global perplexity tertiles.

    Thresholds come from one linear-interpolation percentile aggregation
    (Spark `percentile` ≡ DuckDB `quantile_cont`, the parity pinned by the
    value_percentiles entry) — a 1-row dim cross-joined back, so the split
    is a single pass + broadcast at any scale. head = lowest perplexity.
    """
    hint = F.broadcast if broadcast_thresholds else (lambda d: d)
    th = hint(
        scored.agg(
            F.percentile(ppl_col, 1.0 / 3.0).alias("_t1"),
            F.percentile(ppl_col, 2.0 / 3.0).alias("_t2"),
        )
    )
    bucket = (
        F.when(F.col(ppl_col) <= F.col("_t1"), "head")
        .when(F.col(ppl_col) <= F.col("_t2"), "middle")
        .otherwise("tail")
    )
    return scored.crossJoin(th).select(
        *scored.columns, bucket.alias("ppl_bucket")
    )
