"""Line-level cleaning (operators/lines.py) on real multi-line text — the
newline segmenter path the contract entries can't cover (the synthetic
documents table is newline-free)."""

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators import lines as L

FOOTER = "copyright example corp all rights reserved"
NAV = "home products about contact"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, f"unique alpha text one.\n{NAV}\nreal body sentence here.\n{FOOTER}"),
        (2, f"{NAV}\nsecond doc body differs.\n{FOOTER}"),
        (3, f"third doc standalone content.\n{FOOTER}"),
        (4, f"{FOOTER}"),  # only boilerplate
        (5, "short\n\n  \nok line with words."),  # blank lines dropped
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_line_table_skips_blank_lines(docs):
    lt = L.line_table(docs, mode="lines")
    d5 = {r["pos"]: r["line"] for r in lt.filter(F.col("doc_id") == 5).collect()}
    assert d5 == {0: "short", 1: "ok line with words."}


def test_dedup_lines_removes_cross_doc_boilerplate(docs):
    out = {r["doc_id"]: r for r in L.dedup_lines(docs, max_doc_freq=1).collect()}
    # FOOTER in 4 docs, NAV in 2 -> both removed everywhere
    assert out[1]["text_clean"] == "unique alpha text one.\nreal body sentence here."
    assert out[1]["n_lines_kept"] == 2 and out[1]["n_lines_total"] == 4
    assert out[3]["text_clean"] == "third doc standalone content."
    # doc of pure boilerplate survives with empty text
    assert out[4]["text_clean"] == "" and out[4]["n_lines_kept"] == 0
    assert out[4]["n_lines_total"] == 1


def test_dedup_lines_threshold(docs):
    # max_doc_freq=2 keeps NAV (2 docs) but still removes FOOTER (4 docs)
    out = {r["doc_id"]: r["text_clean"]
           for r in L.dedup_lines(docs, max_doc_freq=2).collect()}
    assert NAV in out[2] and FOOTER not in out[2]


def test_boilerplate_char_fraction(docs):
    out = {r["doc_id"]: r["dup_line_char_frac"]
           for r in L.boilerplate_char_fraction(docs, max_doc_freq=1).collect()}
    assert out[4] == pytest.approx(1.0)
    total1 = len("unique alpha text one.") + len(NAV) + \
        len("real body sentence here.") + len(FOOTER)
    assert out[1] == pytest.approx((len(NAV) + len(FOOTER)) / total1)


def test_c4_line_filter_terminal_punct(docs):
    out = L.c4_line_filter(
        docs, min_words=3, min_lines=1, require_terminal_punct=True
    )
    got = {r["doc_id"]: r["text_clean"] for r in out.collect()}
    # only sentences ending in . survive; NAV/FOOTER (no punct) dropped
    assert got[1] == "unique alpha text one.\nreal body sentence here."
    assert 4 not in got  # zero kept lines < min_lines


def test_c4_doc_level_gates(spark):
    rows = [
        (1, "a perfectly fine sentence here.\nanother good long line."),
        (2, "lorem ipsum dolor sit amet.\nanother good long line."),
        (3, "code block { return 1; }\nanother good long line."),
        (4, "tiny.\nalso tiny."),  # every line < 3 words
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = [r["doc_id"] for r in
            L.c4_line_filter(df, min_words=3, min_lines=1).collect()]
    assert kept == [1]


def test_chunk_mode_matches_manual(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(19)))], ["doc_id", "text"]
    )
    lt = L.line_table(df, mode="chunks", width=8).orderBy("pos").collect()
    assert [r["line"] for r in lt] == [
        " ".join(f"w{i}" for i in range(8)),
        " ".join(f"w{i}" for i in range(8, 16)),
        " ".join(f"w{i}" for i in range(16, 19)),
    ]
    empty = L.line_table(
        spark.createDataFrame([(2, "   ")], ["doc_id", "text"]),
        mode="chunks",
    )
    assert empty.count() == 0


def _py_gopher(text, top_n=2, dup_n=3):
    """Pure-Python reference for gopher_repetition (lines mode)."""
    from collections import Counter

    chars = len(text)
    segs = [l for l in text.split("\n") if l.strip() != ""]
    seg_c = Counter(segs)
    n_seg = len(segs)
    n_dup = sum(c - 1 for c in seg_c.values())
    dup_chars = sum((c - 1) * len(s) for s, c in seg_c.items())
    toks = text.split()

    def grams(n):
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    g2 = Counter(grams(top_n))
    top_frac = 0.0
    if g2 and chars:
        best = max(g2.items(), key=lambda kv: (kv[1], kv[0]))
        top_frac = best[1] * len(best[0]) / chars
    g3 = Counter(grams(dup_n))
    dup3 = sum(c * len(g) for g, c in g3.items() if c >= 2)
    frac = lambda num, den: num / den if den else 0.0
    return (
        n_seg,
        frac(n_dup, n_seg),
        frac(dup_chars, chars),
        top_frac,
        frac(dup3, chars),
    )


def test_gopher_repetition_matches_python_reference(spark):
    rows = [
        (1, "a b\nc d\na b\ne f g e f g"),
        (2, "x y z"),
        (3, ""),
        (4, "w w w w w w"),   # overlap-naive fracs may exceed 1 by design
        (5, "nav bar\nnav bar\nnav bar\ncontent line one two three"),
        (6, "one two one two one two three"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (
            r["n_segments"],
            r["dup_seg_frac"],
            r["dup_seg_char_frac"],
            r["top_ngram_char_frac"],
            r["dup_ngram_char_frac"],
        )
        for r in L.gopher_repetition(df, mode="lines").collect()
    }
    for doc_id, text in rows:
        exp = _py_gopher(text)
        assert got[doc_id] == pytest.approx(exp), (doc_id, got[doc_id], exp)


def test_gopher_repetition_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a b c a b c")], ["doc_id", "text"])
    plan = L.gopher_repetition(df, mode="chunks")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_gopher_quality_rule_branches(spark):
    """Each fixture doc fails exactly the rule it was built to fail (or
    passes, for -7); verdicts match a pure-Python re-derivation."""
    from webcrawler_spark.operators import textstats as T
    from webcrawler_spark.queries import _GOPHER_FIXTURE

    df = spark.createDataFrame(_GOPHER_FIXTURE, "doc_id long, text string")
    out = {r["doc_id"]: r for r in T.gopher_quality(df, "doc_id", "text").collect()}

    assert out[-1]["bullet_line_frac"] > 0.9 and not out[-1]["gopher_pass"]
    assert out[-2]["ellipsis_line_frac"] > 0.3 and not out[-2]["gopher_pass"]
    assert out[-3]["symbol_ratio"] > 0.1 and not out[-3]["gopher_pass"]
    assert out[-4]["alpha_word_frac"] < 0.8 and not out[-4]["gopher_pass"]
    assert out[-5]["word_count"] < 50 and not out[-5]["gopher_pass"]
    assert out[-6]["mean_word_len"] > 10 and not out[-6]["gopher_pass"]
    assert out[-7]["gopher_pass"]

    # pure-Python cross-check of every signal for the passing doc
    import re
    text = dict(_GOPHER_FIXTURE)[-7]
    toks = [t for t in re.split(r"\s+", text) if t]
    lines = [l for l in text.split("\n") if l.strip()]
    r = out[-7]
    assert r["word_count"] == len(toks)
    assert r["mean_word_len"] == round(sum(map(len, toks)) / len(toks), 6)
    assert r["bullet_line_frac"] == round(sum(
        1 for l in lines if re.match(r"^([*\-•])", l.strip())) / len(lines), 6)
    stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
    low = {t for t in re.split(r"\s+", text.lower()) if t}
    assert r["stop_hits"] == len(low & stops)


def test_gopher_quality_random_docs_match_python(spark):
    """Derandomized fuzz: 40 random documents mixing bullets, ellipses,
    symbols, numerics, and newlines; every signal and the verdict must
    match a pure-Python re-derivation of the rule set."""
    import random
    import re

    from webcrawler_spark.operators import textstats as T

    rnd = random.Random(2026)
    words = ["the", "of", "and", "that", "have", "with", "alpha", "beta",
             "gamma", "12345", "x#y", "longwordverylong", "item", "..."]
    docs = []
    for i in range(40):
        n_lines = rnd.randint(1, 8)
        lines = []
        for _ in range(n_lines):
            toks = [rnd.choice(words) for _ in range(rnd.randint(0, 30))]
            line = " ".join(toks)
            if rnd.random() < 0.3:
                line = "- " + line
            if rnd.random() < 0.3:
                line = line + "..."
            lines.append(line)
        docs.append((i, "\n".join(lines)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in T.gopher_quality(df, "doc_id", "text").collect()}

    stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
    for i, text in docs:
        toks = [t for t in re.split(r"\s+", text) if t]
        wc = len(toks)
        mean_wl = sum(map(len, toks)) / wc if wc else 0.0
        n_hash = text.count("#")
        n_ell = (len(text) - len(text.replace("...", ""))) / 3
        sym = (n_hash + n_ell) / wc if wc else 0.0
        lns = [l for l in text.split("\n") if l.strip()]
        bul = sum(1 for l in lns if re.match(r"^([*\-•])", l.strip())) / len(lns) if lns else 0.0
        ell = sum(1 for l in lns if re.search(r"\.\.\.$", l.strip())) / len(lns) if lns else 0.0
        alpha = sum(1 for t in toks if re.search("[a-zA-Z]", t)) / wc if wc else 0.0
        sh = len({t for t in re.split(r"\s+", text.lower()) if t} & stops)
        r = got[i]
        assert r["word_count"] == wc, i
        assert r["mean_word_len"] == round(mean_wl, 6), i
        assert r["symbol_ratio"] == round(sym, 6), i
        assert r["bullet_line_frac"] == round(bul, 6), i
        assert r["ellipsis_line_frac"] == round(ell, 6), i
        assert r["alpha_word_frac"] == round(alpha, 6), i
        assert r["stop_hits"] == sh, i
        expect = (50 <= wc <= 100_000 and 3.0 <= mean_wl <= 10.0 and sym <= 0.1
                  and bul <= 0.9 and ell <= 0.3 and alpha >= 0.80 and sh >= 2)
        assert r["gopher_pass"] == expect, i


def test_ccnet_normalize_python_parity_and_dedup_effect(spark):
    """ccnet_normalize matches a pure-Python re-derivation, and makes
    case/accent/digit/punct variants hash identical (the CCNet pre-dedup
    property)."""
    import hashlib
    import re

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from webcrawler_spark.operators import textstats as T

    def py_norm(t):
        s = t.lower()
        s = s.translate(str.maketrans(T.CCNET_ACCENTS_SRC, T.CCNET_ACCENTS_DST))
        s = s.translate(str.maketrans(T.CCNET_DIGITS_SRC, T.CCNET_DIGITS_DST))
        s = re.sub(r"\s+", " ", s)
        s = re.sub(r"[^a-z0 ]", "", s)
        s = re.sub(r" +", " ", s)
        return s.strip()

    variants = [
        "The Café costs 1234 dollars, really!",
        "the cafe costs 9876 DOLLARS — really?",
        "THE   café\ncosts 5555 dollars;;; really",
        "a genuinely different document",
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(variants)])
    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", T.ccnet_normalize(F.col("text")).alias("n")).collect()
    }
    for i, t in enumerate(variants):
        assert got[i] == py_norm(t), (i, got[i], py_norm(t))
    # the three variants collapse to ONE normalized form; the 4th stays apart
    hashes = {hashlib.md5(got[i].encode()).hexdigest() for i in range(3)}
    assert len(hashes) == 1
    assert got[3] != got[0]


def test_ccnet_normalize_nfd_multiscript_parity(spark):
    """ccnet_normalize_nfd (opt-in exact-NFD variant): matches a
    pure-Python unicodedata.normalize('NFD') re-derivation on a
    multi-script fixture, folds accents the Latin-1 translate table
    cannot (Polish ś/ż, Czech ř/ě, Vietnamese tone stacks, combining
    sequences), and agrees byte-for-byte with the codegen default on
    Latin-1-only text."""
    import re
    import unicodedata

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from webcrawler_spark.operators import textstats as T

    def py_norm_nfd(t):
        s = unicodedata.normalize("NFD", t.lower())
        s = "".join(c for c in s if not unicodedata.combining(c))
        s = s.translate(str.maketrans(T.CCNET_DIGITS_SRC, T.CCNET_DIGITS_DST))
        s = re.sub(r"\s+", " ", s)
        s = re.sub(r"[^a-z0 ]", "", s)
        s = re.sub(r" +", " ", s)
        return s.strip()

    texts = [
        "The Café costs 1234 dollars, really!",   # Latin-1 (both paths agree)
        "Zażółć gęślą jaźń 42",                  # Polish beyond Latin-1
        "Příliš žluťoučký kůň úpěl ďábelské ódy", # Czech
        "Tiếng Việt có dấu thanh điệu",           # Vietnamese tone stacks
        "café vs café",                # combining vs precomposed é
        "naïve – déjà vu… 99 problems",
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    out = df.select(
        "doc_id",
        T.ccnet_normalize_nfd(F.col("text")).alias("nfd"),
        T.ccnet_normalize(F.col("text")).alias("latin1"),
    ).collect()
    got = {r["doc_id"]: (r["nfd"], r["latin1"]) for r in out}
    for i, t in enumerate(texts):
        assert got[i][0] == py_norm_nfd(t), (i, got[i][0], py_norm_nfd(t))
    # Latin-1-only text: both variants byte-identical
    assert got[0][0] == got[0][1]
    # combining and precomposed é normalize to the same form
    assert got[4][0] == "cafe vs cafe"
    # Polish ż/ź fold only on the NFD path (translate table lacks them)
    assert "zazo" in got[1][0] and "zazo" not in got[1][1]


def test_host_templates_site_scoped(spark):
    """host_templates flags a line by its WITHIN-host page fraction: the
    shared footer is a template on host a (3/3 pages) but not on host b
    (1/3), single-page hosts are excluded by min_pages, and a repeated
    occurrence inside one doc counts that doc once."""
    from pyspark.sql import functions as F

    from webcrawler_spark.operators.lines import host_templates

    rows = [
        ("a", 1, "unique alpha\ncopyright footer"),
        ("a", 2, "unique beta\ncopyright footer\ncopyright footer"),
        ("a", 3, "unique gamma\ncopyright footer"),
        ("b", 4, "copyright footer\nother text"),
        ("b", 5, "more text"),
        ("b", 6, "still more"),
        ("c", 7, "copyright footer"),  # 1-page host: min_pages excludes
    ]
    docs = spark.createDataFrame(rows, "host string, doc_id long, text string")
    got = {
        (r["host"], r["line"]): (r["n_docs"], r["n_pages"], r["frac"])
        for r in host_templates(docs, min_frac=0.5, min_pages=2).collect()
    }
    assert got == {("a", "copyright footer"): (3, 3, 1.0)}
    # lowering the fraction gate admits b's 1/3 occurrence too
    got2 = {
        (r["host"], r["line"])
        for r in host_templates(docs, min_frac=0.3, min_pages=2).collect()
    }
    assert ("b", "copyright footer") in got2 and ("a", "copyright footer") in got2
    assert not any(h == "c" for h, _ in got2)


def test_strip_host_templates_rebuild(spark):
    """strip removes the host's template lines only: host a loses its
    footer everywhere, host b keeps the identical line (not a template
    there); an all-template doc survives with empty text_clean."""
    from webcrawler_spark.operators.lines import strip_host_templates

    rows = [
        ("a", 1, "unique alpha\ncopyright footer"),
        ("a", 2, "copyright footer\nunique beta"),
        ("a", 3, "copyright footer"),  # all-template doc
        ("b", 4, "copyright footer\nother text"),
        ("b", 5, "more text"),
    ]
    docs = spark.createDataFrame(rows, "host string, doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_clean"], r["n_lines_kept"], r["n_lines_total"])
        for r in strip_host_templates(docs, min_frac=0.9).collect()
    }
    assert got == {
        1: ("unique alpha", 1, 2),
        2: ("unique beta", 1, 2),
        3: ("", 0, 1),
        4: ("copyright footer\nother text", 2, 2),
        5: ("more text", 1, 1),
    }


def test_fineweb_filters_branches(spark):
    from webcrawler_spark.operators.lines import fineweb_filters

    long_punct = "This sentence is comfortably longer than thirty chars."
    docs = spark.createDataFrame(
        [
            (1, "nav\nhome\nabout"),                      # short + unpunct
            (2, "\n".join([long_punct] * 3 + ["A different long closing sentence right here."])),
            (3, "\n".join([
                "The first proper sentence is long enough to pass.",
                "The second proper sentence is also long enough here.",
                "The third proper sentence closes the document nicely.",
            ])),
            (4, "One line only, fine and punctuated properly enough."),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in fineweb_filters(docs).collect()}
    assert out[1]["fail_punct"] and out[1]["fail_short"] and not out[1]["fineweb_pass"]
    # doc2: 2 of 4 lines are repeats of an earlier identical line
    assert out[2]["fail_dup"] and not out[2]["fail_punct"] and not out[2]["fineweb_pass"]
    assert out[2]["dup_line_char_frac"] > 0.4
    assert out[3]["fineweb_pass"] and not any(
        out[3][c] for c in ("fail_punct", "fail_short", "fail_dup"))
    # single line: dup frac defined as 0, passes
    assert out[4]["fineweb_pass"] and out[4]["dup_line_char_frac"] == 0.0
