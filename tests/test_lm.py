"""Stupid-Backoff LM tier (operators/lm.py): exact parity against a
pure-Python reference, backoff-branch coverage, perplexity ordering, and
tertile bucketing."""

import math
import re

import pytest

from pyspark.sql import functions as F

from webcrawler_spark.operators import lm as LM


TRAIN = [
    (1, "the cat sat on the mat"),
    (2, "the cat ate the fish"),
    (3, "a dog sat on the rug"),
    (4, "the dog and the cat"),
]

SCORE = [
    (10, "the cat sat on the mat"),     # all trigrams trained
    (11, "dog ate the fish"),           # unigram head, bigram "ate the", trigram tail
    (12, "zyx unknownword the"),        # OOV floor + unigram
    (13, ""),                           # zero tokens -> drops out
]


def _py_tokens(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _py_counts(rows, order=3):
    counts = {}
    for _, text in rows:
        t = [LM.BOS, LM.BOS] + _py_tokens(text)
        for k in range(1, order + 1):
            for i in range(len(t) - k + 1):
                counts[(k, " ".join(t[i : i + k]))] = (
                    counts.get((k, " ".join(t[i : i + k])), 0) + 1
                )
    return counts


def _py_token_scores(text, counts, alpha=LM.ALPHA):
    total = float(sum(c for (k, _), c in counts.items() if k == 1))
    t = [LM.BOS, LM.BOS] + _py_tokens(text)
    out = []
    for i in range(2, len(t)):
        g3, c2 = " ".join(t[i - 2 : i + 1]), " ".join(t[i - 2 : i])
        g2, c1, g1 = " ".join(t[i - 1 : i + 1]), t[i - 1], t[i]
        if (3, g3) in counts:
            branch, s = 3, counts[(3, g3)] / counts[(2, c2)]
        elif (2, g2) in counts:
            branch, s = 2, alpha * counts[(2, g2)] / counts[(1, c1)]
        elif (1, g1) in counts:
            branch, s = 1, alpha * alpha * counts[(1, g1)] / total
        else:
            branch, s = 0, alpha * alpha / total
        out.append((i - 1, t[i], branch, s))  # 1-based token ordinal
    return out


@pytest.fixture(scope="module")
def model(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    return LM.train_lm(train).cache()


def test_train_counts_match_python(spark, model):
    got = {(r["order"], r["gram"]): r["cnt"] for r in model.collect()}
    assert got == _py_counts(TRAIN)


def test_token_scores_exact_and_branches(spark, model):
    docs = spark.createDataFrame(SCORE, ["doc_id", "text"])
    got = LM.lm_token_scores(docs, model).collect()
    counts = _py_counts(TRAIN)
    want = {}
    for doc_id, text in SCORE:
        for pos, tok, branch, s in _py_token_scores(text, counts):
            want[(doc_id, pos)] = (tok, branch, s)
    assert len(got) == len(want)
    branches_seen = set()
    for r in got:
        tok, branch, s = want[(r["doc_id"], r["pos"])]
        assert r["token"] == tok
        assert r["branch"] == branch
        assert r["score"] == pytest.approx(s, abs=1e-12)
        branches_seen.add(branch)
    # the fixture exercises every backoff level
    assert branches_seen == {0, 1, 2, 3}


def test_lm_score_aggregates(spark, model):
    docs = spark.createDataFrame(SCORE, ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in LM.lm_score(docs, model).collect()}
    assert 13 not in rows  # zero-token doc drops out
    counts = _py_counts(TRAIN)
    for doc_id, text in SCORE[:3]:
        scores = [s for _, _, _, s in _py_token_scores(text, counts)]
        avg = sum(math.log(s) for s in scores) / len(scores)
        assert rows[doc_id]["n_tokens"] == len(scores)
        assert rows[doc_id]["avg_logprob"] == pytest.approx(round(avg, 6), abs=1e-9)
        assert rows[doc_id]["perplexity"] == pytest.approx(
            round(math.exp(-avg), 6), abs=1e-9
        )


def test_in_domain_scores_lower_perplexity(spark, model):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "qq zz vv ww xx yy")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["perplexity"] for r in LM.lm_score(docs, model).collect()}
    assert rows[1] < rows[2]


def test_perplexity_buckets_tertiles(spark):
    scored = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 10)], ["doc_id", "perplexity"]
    )
    rows = {r["doc_id"]: r["ppl_bucket"] for r in LM.perplexity_buckets(scored).collect()}
    # quantile_cont thresholds over 1..9: t1 = 3.667, t2 = 6.333
    assert [rows[i] for i in range(1, 10)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )


def test_no_python_udf_in_plan(spark, model):
    docs = spark.createDataFrame(SCORE, ["doc_id", "text"])
    plan = LM.lm_score(docs, model)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
