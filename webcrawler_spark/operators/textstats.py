"""Text analysis operators over a documents table (doc_id, text, lang, ...).

Large-scale training-data-pipeline primitives, all JVM-side Column
expressions unless noted:

- tokenization + token counting (whitespace / regex)
- language-ID heuristic (stopword overlap — n-gram-free, deterministic)
- quality scoring (length/structure/uniqueness ladder, from the reference's
  parser quality score parser/app.py:353-397)
- document fingerprinting (rolling polynomial hash — pandas UDF)
- keyword extraction (explode -> filter -> count -> window top-k,
  parser/app.py:426-442)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType

# shared stopword list (subset of english stopwords; fixed so Spark and the
# DuckDB oracle agree byte-for-byte)
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for",
    "with", "as", "by", "at", "from", "that", "this", "it", "are", "was",
    "be", "has", "have",
)

_TOKEN_SPLIT = "[^a-z0-9]+"


def tokens(text: Column) -> Column:
    """Lowercase alnum tokens, empties dropped."""
    return F.filter(F.split(F.lower(text), _TOKEN_SPLIT), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def lang_id_en(text: Column, min_hits: int = 2) -> Column:
    """Stopword-overlap language ID: >= min_hits distinct English stopwords
    => 'en', else 'other'. (The input tables carry a lang column; this is the
    independent detector the reference runs via langdetect, parser/app.py:317-322.)"""
    hits = F.size(F.array_intersect(F.array_distinct(tokens(text)), F.array(*[F.lit(s) for s in STOPWORDS])))
    return F.when(hits >= min_hits, F.lit("en")).otherwise(F.lit("other"))


# per-language stopword profiles for the multi-language detector; fixed
# short lists so Spark and the DuckDB oracle agree byte-for-byte. Overlaps
# ("que" fr/es) are fine — ties break deterministically by language code.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "nicht", "ist", "ein", "eine", "zu",
           "mit", "von", "auf", "sich", "den", "auch"),
    "en": ("the", "and", "of", "to", "in", "is", "that", "with", "for",
           "was", "are", "this", "have", "from", "not"),
    "es": ("el", "los", "las", "una", "que", "por", "para", "con", "del",
           "se", "su", "como", "pero", "sus", "muy"),  # ASCII-only: the
    # [^a-z0-9]+ tokenizer splits accented words, so accented stopwords
    # ("más") could never match

    "fr": ("le", "la", "les", "et", "des", "est", "une", "que", "pour",
           "dans", "qui", "pas", "sur", "vous", "nous"),
}


def lang_id_multi(text: Column, min_hits: int = 2, cjk_frac: float = 0.15) -> Column:
    """Multi-language stopword-profile detector (training-data-pipeline
    language ID; the reference's parser runs langdetect here,
    parser/app.py:317-322). All JVM-native:

    - 'zh' when >= ``cjk_frac`` of characters are CJK-unified (a script
      check — CJK text does not whitespace-tokenize);
    - else score each language as |distinct tokens ∩ its stopword profile|,
      take the argmax (ties break alphabetically, the fixed iteration
      order of LANG_STOPWORDS);
    - 'und' when the best score is below ``min_hits`` (BCP-47 undetermined).
    """
    cjk = F.length(F.regexp_replace(text, "[^\\u4e00-\\u9fff]", ""))
    total = F.greatest(F.length(text), F.lit(1))
    toks = F.array_distinct(tokens(text))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in stops])))
        for lang, stops in LANG_STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    expr = F.when(best < min_hits, F.lit("und"))
    for lang in LANG_STOPWORDS:  # dict order = alphabetical = tiebreak order
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return F.when(cjk / total >= cjk_frac, F.lit("zh")).otherwise(expr)


def doc_quality(text: Column) -> Column:
    """Text-only slice of the reference quality ladder (length tier +
    uniqueness ratio; parser/app.py:357-364,389-395) — SQL-expressible."""
    toks = F.filter(F.split(text, "\\s+"), lambda t: t != "")
    wc = F.size(toks)
    length_score = (
        F.when(wc >= 300, F.lit(25.0))
        .when(wc >= 150, F.lit(15.0))
        .when(wc >= 50, F.lit(10.0))
        .otherwise(F.lit(0.0))
    )
    lower_toks = F.filter(F.split(F.lower(text), "\\s+"), lambda t: t != "")
    uniq = F.when(
        wc > 0, F.size(F.array_distinct(lower_toks)).cast("double") / wc
    ).otherwise(F.lit(0.0))
    return length_score + F.least(F.lit(20.0), uniq * 25)


# CCNet text normalization (Wenzek et al. 2020, §4.1 — the hashing
# normalization applied before paragraph dedup): lowercase, fold accents,
# map every digit to zero, drop remaining punctuation, squeeze whitespace.
# Accent folding is the deterministic Latin-1-supplement subset expressible
# as a translate table (full NFD decomposition needs ICU; documented
# narrowing). The SAME literal tables feed the DuckDB oracle.
CCNET_ACCENTS_SRC = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿ"
CCNET_ACCENTS_DST = "aaaaaaceeeeiiiinooooouuuuyy"
CCNET_DIGITS_SRC = "123456789"
CCNET_DIGITS_DST = "000000000"


def ccnet_normalize(text: Column) -> Column:
    """CCNet §4.1 hashing normalization, fully JVM-native (one codegen
    projection): lower -> accent fold -> digits->0 -> strip non-[a-z0 ]
    -> squeeze/trim whitespace. Used as the opt-in pre-hash step for
    paragraph/minhash dedup so near-identical texts differing only in
    case, accents, digits, or punctuation hash together."""
    s = F.lower(text)
    s = F.translate(s, CCNET_ACCENTS_SRC, CCNET_ACCENTS_DST)
    s = F.translate(s, CCNET_DIGITS_SRC, CCNET_DIGITS_DST)
    # all whitespace -> space BEFORE punct strip, so newline-separated words
    # don't concatenate when the punct class eats the separator
    s = F.regexp_replace(s, r"\s+", " ")
    s = F.regexp_replace(s, "[^a-z0 ]", "")
    s = F.regexp_replace(s, " +", " ")
    return F.trim(s)


@pandas_udf(StringType())
def _nfd_fold_udf(text: pd.Series) -> pd.Series:
    """Exact accent folding: lowercase, canonical NFD decomposition,
    strip combining marks (stdlib unicodedata; one Arrow batch per call)."""
    import unicodedata

    def fold(t: str | None) -> str:
        t = unicodedata.normalize("NFD", (t or "").lower())
        return "".join(c for c in t if not unicodedata.combining(c))

    return text.map(fold)


def ccnet_normalize_nfd(text: Column) -> Column:
    """Opt-in exact-NFD variant of :func:`ccnet_normalize` (DELTAS #16):
    accent folding runs as a full canonical decomposition + combining-mark
    strip in an Arrow-batched UDF, giving Wenzek et al. parity beyond the
    Latin-1-supplement translate table (Polish ś/ź, Czech ř/ě, Vietnamese
    tone stacks, fullwidth-composed sequences…). Every downstream step is
    byte-identical to the codegen default, so on Latin-1-only text the two
    variants agree exactly. The translate-table version stays the hot-path
    default: this one crosses the JVM↔Arrow boundary once per batch."""
    s = _nfd_fold_udf(text)
    s = F.translate(s, CCNET_DIGITS_SRC, CCNET_DIGITS_DST)
    s = F.regexp_replace(s, r"\s+", " ")
    s = F.regexp_replace(s, "[^a-z0 ]", "")
    s = F.regexp_replace(s, " +", " ")
    return F.trim(s)


_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Full Gopher quality rule set (Rae et al. 2021, A1.1 — the
    non-repetition rules; repetition lives in lines.gopher_repetition):
    per-doc signal values plus the combined pass verdict. Entirely native
    higher-order/regex expressions — one codegen stage, zero shuffles,
    so at 100 TB this is a pure map over the corpus scan.

    Rules (document kept iff ALL hold):
      50 <= word_count <= 100_000;  3 <= mean_word_len <= 10;
      symbol_ratio ('#' or '...' per word) <= 0.1;
      bullet_line_frac <= 0.9;  ellipsis_line_frac <= 0.3;
      alpha_word_frac >= 0.80;  stop_hits >= 2 (of 8 canonical stops).
    """
    text = F.col(text_col)
    toks = F.filter(F.split(text, r"\s+"), lambda t: t != "")
    wc = F.size(toks)
    wc_d = wc.cast("double")
    char_sum = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    mean_wl = F.when(wc > 0, char_sum.cast("double") / wc_d).otherwise(F.lit(0.0))
    n_hash = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    # non-overlapping leftmost '...' occurrences — replace() semantics agree
    # between Spark and DuckDB, so the oracle reproduces this exactly
    n_ellipsis = (F.length(text) - F.length(F.replace(text, F.lit("...")))) / 3
    symbol_ratio = F.when(
        wc > 0, (n_hash + n_ellipsis).cast("double") / wc_d
    ).otherwise(F.lit(0.0))

    lines = F.filter(F.split(text, "\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(lines, lambda l: F.trim(l).rlike(r"^([*\-•])"))
        ).cast("double")
        / n_lines,
    ).otherwise(F.lit(0.0))
    ellipsis_line_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"\.\.\.$"))).cast("double")
        / n_lines,
    ).otherwise(F.lit(0.0))

    alpha_frac = F.when(
        wc > 0,
        F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))).cast("double") / wc_d,
    ).otherwise(F.lit(0.0))
    stops = F.array(*[F.lit(s) for s in _GOPHER_STOPS])
    stop_hits = F.size(
        F.filter(
            F.array_distinct(F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")),
            lambda t: F.array_contains(stops, t),
        )
    )

    passes = (
        (wc >= 50) & (wc <= 100_000)
        & (mean_wl >= 3.0) & (mean_wl <= 10.0)
        & (symbol_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_line_frac <= 0.3)
        & (alpha_frac >= 0.80)
        & (stop_hits >= 2)
    )
    return docs.select(
        F.col(id_col),
        wc.alias("word_count"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_line_frac, 6).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.cast("int").alias("stop_hits"),
        passes.alias("gopher_pass"),
    )


# ---- PII scrubbing (training-data extension; all JVM-native regex) -------------
#
# Patterns are deliberately restricted to syntax that behaves identically in
# Java regex (Spark) and RE2 (DuckDB oracle): character classes, bounded
# repetition, non-capturing groups, ASCII \b. No lookaround, no backrefs.

PII_PATTERNS: dict[str, tuple[str, str]] = {
    # name -> (pattern, replacement tag)
    "email": (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{2}-\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
}


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII pattern (full-match count)."""
    pattern, _ = PII_PATTERNS[kind]
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def mask_pii(text: Column) -> Column:
    """Replace every PII occurrence with its type tag. Masking order is the
    dict order (email, phone, ipv4); the patterns are mutually non-overlapping
    (emails need '@', phones are dash-separated, IPs dot-separated) so the
    order does not change results — pinned anyway for determinism."""
    out = text
    for pattern, tag in PII_PATTERNS.values():
        out = F.regexp_replace(out, pattern, tag)
    return out


def pii_scrub(df: DataFrame, text_col: str) -> DataFrame:
    """Scrub a corpus: adds `masked` plus one count column per PII type.
    Pure whole-stage-codegen projection — at 100 TB this is a map-only pass
    with no shuffle; filters/counts fold into the same stage as the scan."""
    out = df.withColumn("masked", mask_pii(F.col(text_col)))
    for kind in PII_PATTERNS:
        out = out.withColumn(f"n_{kind}", pii_count(F.col(text_col), kind))
    return out


def repetition_signals(text: Column) -> list[Column]:
    """Gopher-style repetition/quality gates (Rae et al. 2021, public), kept
    integer-valued so oracle comparison is exact: token count, distinct token
    count (repetition = tokens - distinct), longest token length, stopword
    occurrence count."""
    toks = tokens(text)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return [
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.coalesce(
            F.array_max(F.transform(toks, lambda t: F.length(t))), F.lit(0)
        ).alias("max_token_len"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).alias(
            "n_stopwords"
        ),
    ]


def keywords_per_doc(docs: DataFrame, id_col: str, text_col: str, k: int = 10) -> DataFrame:
    """Per-doc top-k keyword extraction (parser/app.py:426-442): tokenize,
    len>3, de-stopword, count, window top-k (freq desc, word asc)."""
    words = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word")
    ).filter((F.length("word") > 3) & ~F.col("word").isin(*STOPWORDS))
    counts = words.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy(id_col).orderBy(F.desc("freq"), F.asc("word"))
    return counts.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---- document fingerprint (rolling polynomial hash; pandas UDF) ----------------

_FP_BASE = 1000003
_FP_MASK = (1 << 64) - 1


def _rolling_fp(s: str) -> int:
    h = 1469598103934665603  # FNV offset basis as start
    for b in s.encode("utf-8"):
        h = ((h * _FP_BASE) ^ b) & _FP_MASK
    # fold to signed 64 for Spark LongType
    return h - (1 << 64) if h >= (1 << 63) else h


@pandas_udf(LongType())
def doc_fingerprint_udf(text: pd.Series) -> pd.Series:
    """64-bit rolling-hash document fingerprint (content identity across
    epochs without storing the text)."""
    return text.map(lambda t: _rolling_fp(t or ""))


# ---- simhash (near-dup fingerprint; pandas UDF, numpy-vectorized) --------------


@pandas_udf(LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens: per-token 64-bit hashes vote
    bitwise; sign of the vote is the fingerprint bit. Near-dup docs differ in
    few bits (hamming distance)."""
    import numpy as np

    out = []
    for t in text:
        toks = (t or "").lower().split()
        if not toks:
            out.append(0)
            continue
        hs = np.array(
            [_rolling_fp(tok) & _FP_MASK for tok in toks], dtype=np.uint64
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        fp = 0
        for i in range(64):
            if votes[i] > 0:
                fp |= 1 << i
        out.append(fp - (1 << 64) if fp >= (1 << 63) else fp)
    return pd.Series(out, dtype="int64")


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two signed-64 fingerprints (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def lang_margin(text: Column) -> Column:
    """Best minus second-best stopword-profile score — the detector's
    confidence margin (0 = two languages tied; the standard gate before
    trusting a language label in corpus filtering)."""
    toks = F.array_distinct(tokens(text))
    scores = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in stops])))
        for stops in LANG_STOPWORDS.values()
    ]
    arr = F.sort_array(F.array(*scores), asc=False)
    return (arr[0] - arr[1]).cast("int")


# --------------------------------------------------------------------------
# Unicode script mix: per-doc character counts by script block. Language-id
# (lang_id_multi) answers "which language"; this answers "which WRITING
# SYSTEMS and how much of each" — the multilingual-corpus routing signal
# (script-mixed spam, transliteration detection, per-script tokenizer
# routing). Pure codegen: one regexp_replace length-count per script, no
# explode, no Python. At 100 TB this is a projection fused into whatever
# scan already reads the text column.

SCRIPT_RANGES: list[tuple[str, str]] = [
    ("latin", "a-zA-Z"),
    ("cyrillic", "Ѐ-ӿ"),
    ("greek", "Ͱ-Ͽ"),
    ("cjk", "一-鿿぀-ヿ"),
    ("digit", "0-9"),
]


def script_counts(text: Column, ranges: list[tuple[str, str]] | None = None) -> list[Column]:
    """One bigint count column per script block (aliased n_<script>)."""
    out = []
    for name, rng in ranges or SCRIPT_RANGES:
        cnt = F.length(F.regexp_replace(text, f"[^{rng}]", ""))
        out.append(cnt.cast("bigint").alias(f"n_{name}"))
    return out


def main_script(ranges: list[tuple[str, str]] | None = None) -> Column:
    """Dominant script over the n_<script> columns; ties resolve to the
    earlier entry in SCRIPT_RANGES (fixed precedence — deterministic and
    SQL-replayable, unlike an argmax over a map)."""
    names = [n for n, _ in (ranges or SCRIPT_RANGES)]
    expr = F.lit(names[-1])
    for i in range(len(names) - 2, -1, -1):
        me = F.col(f"n_{names[i]}")
        later = [F.col(f"n_{n}") for n in names[i + 1 :]]
        expr = F.when(me >= F.greatest(*later) if len(later) > 1 else me >= later[0], F.lit(names[i])).otherwise(expr)
    return expr


def script_mix(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_<script>..., main_script) — per-doc script histogram."""
    base = docs.select(F.col(id_col), *script_counts(F.col(text_col)))
    return base.withColumn("main_script", main_script())


def host_lang_entropy(
    docs: DataFrame, host_col: str = "source", lang_col: str = "lang"
) -> DataFrame:
    """Shannon entropy of the language mix per host — the routing signal
    for per-language pipelines (a host at entropy 0 is single-language; a
    high-entropy host needs per-doc lang-id, not a host-level default).
    Two stacked hash-aggs on the host key; nats, rounded 6dp."""
    per = docs.groupBy(F.col(host_col).alias("host"), F.col(lang_col).alias("lng")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = per.groupBy("host").agg(F.sum("n").alias("n_docs"))
    return (
        per.join(tot, "host")
        .withColumn("p", F.col("n") / F.col("n_docs"))
        .groupBy("host")
        .agg(
            F.max("n_docs").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).alias("n_langs"),
            F.round(-F.sum(F.col("p") * F.log(F.col("p"))), 6).alias("lang_entropy"),
        )
    )


def term_pmi(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k adjacent-bigram collocations by pointwise mutual information —
    the phrase-mining signal (multi-word expressions for tokenizer vocab
    seeding, query suggestion, stopword-free keyword pairs).

    PMI(a,b) = ln( P(ab) / (P(a)P(b)) ) over adjacent pairs, computed as an
    exact-integer ratio pushed into one ln (same literal expression in the
    DuckDB oracle, so the doubles agree).  min_count floors the n_ab
    estimate (PMI is unstable for rare pairs).  Two explode+hash-agg
    passes over the corpus + two broadcastable unigram joins keyed on the
    bigram's own words; no window, no Python.
    """
    t = docs.select(tokens(F.col(text_col)).alias("t"))
    uni = t.select(F.explode("t").alias("w"))
    n1 = uni.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    sz = F.size("t")
    bigrams = F.zip_with(
        F.slice("t", 1, sz - 1),
        F.slice(F.col("t"), 2, sz - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    n2 = (
        t.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    stats = n1.agg(F.sum("n_w").cast("bigint").alias("N")).crossJoin(
        n2.agg(F.sum("n_ab").cast("bigint").alias("B"))
    )
    a = n1.select(F.col("w").alias("_wa"), F.col("n_w").alias("n_a"))
    b = n1.select(F.col("w").alias("_wb"), F.col("n_w").alias("n_b"))
    out = (
        n2.filter(F.col("n_ab") >= min_count)
        .withColumn("_wa", F.split("bigram", " ")[0])
        .withColumn("_wb", F.split("bigram", " ")[1])
        .join(F.broadcast(a), "_wa")
        .join(F.broadcast(b), "_wb")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("n_ab") * 1.0 * F.col("N") * F.col("N"))
                    / (F.col("B") * 1.0 * F.col("n_a") * F.col("n_b"))
                ),
                6,
            ),
        )
        .select("bigram", "n_ab", "pmi")
    )
    return out.orderBy(F.desc("pmi"), F.asc("bigram")).limit(k)


def vocab_growth(
    docs: DataFrame,
    by: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Heaps-law vocabulary-growth gauge across an ordered corpus axis
    (sources, crawl epochs, dump snapshots): per group — its distinct
    term count, the terms appearing for the FIRST time (attributed to the
    lexicographically-first group containing each term), and the running
    cumulative vocabulary. The planning signal for tokenizer vocab sizing
    and for "is another crawl epoch still buying new language?".

    100 TB shape: one distinct-(group, term) explode + two hash-aggs
    (term → first group; group → counts); the cumulative sum windows over
    the GROUP axis only (bounded). No joins on the data axis."""
    terms = docs.select(
        F.col(by), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("t")
    ).distinct()
    per_group = terms.groupBy(F.col(by)).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms")
    )
    first = terms.groupBy("t").agg(F.min(by).alias(by))
    news = first.groupBy(F.col(by)).agg(
        F.count(F.lit(1)).cast("long").alias("n_new_terms")
    )
    from pyspark.sql import Window

    w = Window.orderBy(by).rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_group.join(news, by, "left")
        .select(
            F.col(by),
            "n_terms",
            F.coalesce("n_new_terms", F.lit(0)).cast("long").alias("n_new_terms"),
        )
        .withColumn("cum_vocab", F.sum("n_new_terms").over(w).cast("long"))
        .orderBy(by)
    )


def pii_density(
    docs: DataFrame,
    by: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Host/source-level PII risk triage (the rollup over `pii_scrub`'s
    per-doc counts a compliance review starts from): per group — docs,
    docs containing ANY PII, per-type totals, and matches per 10k chars
    (the density that makes a 50-doc host comparable to a 5M-doc one).
    One codegen projection + one map-side-combined hash-agg."""
    per = docs.select(
        F.col(by),
        F.length(text_col).cast("long").alias("n_chars"),
        *[
            pii_count(F.col(text_col), kind).cast("long").alias(f"n_{kind}")
            for kind in PII_PATTERNS
        ],
    )
    total = sum((F.col(f"n_{k}") for k in PII_PATTERNS), F.lit(0).cast("long"))
    per = per.withColumn("n_any", total)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("n_any") > 0, 1).otherwise(0)).cast("long")
        .alias("docs_with_pii"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    ] + [
        F.sum(f"n_{k}").cast("long").alias(f"n_{k}") for k in PII_PATTERNS
    ]
    out = per.groupBy(F.col(by)).agg(*aggs)
    dens = sum(
        (F.col(f"n_{k}") for k in PII_PATTERNS), F.lit(0).cast("long")
    ).cast("double") * 10_000.0 / F.greatest(
        F.col("n_chars").cast("double"), F.lit(1.0)
    )
    return out.withColumn("pii_per_10k_chars", F.round(dens, 6))


def length_drift_psi(
    base: DataFrame,
    target: DataFrame,
    value_col: str,
    bin_edges: list[float],
    smooth: float = 0.5,
) -> DataFrame:
    """Population Stability Index between two corpus slices' value
    distributions (the standard drift gauge: PSI < 0.1 stable, 0.1-0.25
    moderate, > 0.25 shifted) over FIXED bin edges, add-`smooth` smoothed
    so empty bins don't blow up the log. One row per bin with both
    shares and the bin's PSI term, plus the total riding every row (the
    driver-friendly shape — no second output frame).

    100 TB shape: each side is one map-side-combined hash-agg onto the
    literal bin axis; the join and window run on |bins| rows."""
    edges = sorted(bin_edges)

    def _binned(df: DataFrame, name: str) -> DataFrame:
        b = F.lit(0)
        for i, e in enumerate(edges):
            b = F.when(F.col(value_col) >= float(e), F.lit(i + 1)).otherwise(b)
        return df.select(b.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).cast("long").alias(name)
        )

    spine = base.sparkSession.range(0, len(edges) + 1).select(
        F.col("id").cast("int").alias("bin")
    )
    joined = (
        spine.join(F.broadcast(_binned(base, "n_base")), "bin", "left")
        .join(F.broadcast(_binned(target, "n_target")), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            F.coalesce("n_target", F.lit(0)).alias("n_target"),
        )
    )
    from pyspark.sql import Window

    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    p = (F.col("n_base") + smooth) / (F.sum("n_base").over(w) + smooth * (len(edges) + 1))
    q = (F.col("n_target") + smooth) / (F.sum("n_target").over(w) + smooth * (len(edges) + 1))
    term = (p - q) * F.log(p / q)
    return (
        joined.withColumn("p_base", F.round(p, 6))
        .withColumn("p_target", F.round(q, 6))
        .withColumn("psi_term", F.round(term, 6))
        .withColumn("psi_total", F.round(F.sum(term).over(w), 6))
        .orderBy("bin")
    )
