"""BPE merge training (operators/bpe.py): exact merge-sequence parity vs a
pure-Python Sennrich et al. reference, application parity, tiebreak
determinism, full-merge termination, and the no-Python-UDF plan audit."""

import collections
import re

from pyspark.sql import functions as F

from webcrawler_spark.operators import bpe as B

CORPUS = [
    (1, "low lower lowest low low"),
    (2, "new newer newest new"),
    (3, "wide wider widest low new"),
    (4, "low low new"),
]


def _py_tokens(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _py_train(rows, n_merges):
    freqs = collections.Counter(
        t for _, text in rows for t in _py_tokens(text)
    )
    vocab = {w: tuple(list(w) + [B.EOW]) for w in freqs}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = collections.Counter()
        for w, sym in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += freqs[w]
        if not pairs:
            break
        # argmax: count desc, then lexicographically smallest pattern
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], f"({kv[0][0]})({kv[0][1]})")
        )
        merges.append((rank, f"({a})({b})", f"({a}{b})", cnt))
        new = {}
        for w, sym in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == (a, b):
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new[w] = tuple(out)
        vocab = new
    return merges, vocab, freqs


def test_merge_sequence_exact(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = B.train_bpe(docs, n_merges=6)
    want, _, _ = _py_train(CORPUS, 6)
    assert [(m["rank"], m["pair"], m["merged"], m["cnt"]) for m in got] == want


def test_subword_vocab_parity(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {
        r["subword"]: r["n"] for r in B.subword_vocab(docs, n_merges=6).collect()
    }
    _, vocab, freqs = _py_train(CORPUS, 6)
    want = collections.Counter()
    for w, sym in vocab.items():
        for s in sym:
            want[s] += freqs[w]
    assert got == dict(want)


def test_encode_docs_lengths(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    merges = B.train_bpe(docs, n_merges=6)
    got = {r["doc_id"]: r for r in B.encode_docs(docs, merges).collect()}
    _, vocab, _ = _py_train(CORPUS, 6)
    for doc_id, text in CORPUS:
        toks = _py_tokens(text)
        assert got[doc_id]["n_words"] == len(toks)
        assert got[doc_id]["n_subwords"] == sum(len(vocab[t]) for t in toks)


def test_tiebreak_is_lexicographic(spark):
    # every pair occurs exactly once -> count ties everywhere; the argmax
    # must pick the lexicographically smallest '(a)(b)' pattern
    docs = spark.createDataFrame([(1, "zy"), (2, "bc")], ["doc_id", "text"])
    got = B.train_bpe(docs, n_merges=1)
    assert got[0]["pair"] == "(b)(c)"


def test_full_merge_terminates(spark):
    # 'a' wraps to (a)(_): one merge fully collapses every word; further
    # rounds find no pairs and must stop cleanly, not loop or crash
    docs = spark.createDataFrame([(1, "a a a")], ["doc_id", "text"])
    got = B.train_bpe(docs, n_merges=5)
    assert [(m["pair"], m["cnt"]) for m in got] == [("(a)(_)", 3)]


def test_no_python_udf_in_plan(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    plan = (
        B.subword_vocab(docs, n_merges=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_tokenizer_fertility_by_group(spark):
    import pytest

    from webcrawler_spark.operators.bpe import tokenizer_fertility, train_bpe

    docs = spark.createDataFrame(
        [("en", "aa aa aa bb"), ("de", "cc dd")], ["lang", "text"]
    )
    merges = train_bpe(docs, n_merges=1)  # merges the most frequent pair: (a)(a)
    out = {r["lang"]: r for r in
           tokenizer_fertility(docs, merges, by="lang").collect()}
    # en: 'aa' -> [aa, _] = 2 tokens x3; 'bb' -> [b, b, _] = 3  => 9/4 words
    assert out["en"]["n_words"] == 4 and out["en"]["n_tokens"] == 9
    assert out["en"]["fertility"] == pytest.approx(2.25)
    # de words untouched by the merge: 'cc' -> [c, c, _] = 3 each
    assert out["de"]["n_words"] == 2 and out["de"]["n_tokens"] == 6
    assert out["de"]["chars_per_token"] == pytest.approx(4 / 6, abs=1e-6)
