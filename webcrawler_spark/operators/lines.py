"""Line-level corpus cleaning — C4/RefinedWeb/CCNet-style operators.

Web-corpus pipelines clean at THREE granularities: document (dedup.py,
similarity.py), line/paragraph (this module), and span (textstats.
repetition_signals). The line tier removes boilerplate that is duplicated
ACROSS documents — nav bars, cookie banners, footers — which survives
document-level dedup because every page's full text differs.

Public recipes implemented (semantics from the published descriptions, not
any code): C4 (Raffel et al. 2020, §2.1) keeps lines with enough words and
drops short/navigational ones; CCNet / RefinedWeb drop lines duplicated in
many documents; Gopher (Rae et al. 2021, A1.1) measures the fraction of
text inside duplicated lines as a quality signal.

Scale shape (100 TB): one explode of the corpus into (doc, pos, line), one
partial-aggregated count per line hash, one hash-join of the exploded table
against the flagged-line set (NOT broadcast — the boilerplate set of a web
corpus is itself large), one groupBy-doc rebuild. Two shuffles total, both
on 8-byte hashes. No window over the whole corpus, no driver-side state.

Line segmentation is pluggable: ``mode="lines"`` splits on newlines (real
WET-style text); ``mode="chunks"`` derives fixed-width token windows from
flat text — deterministic and expressible identically in ANSI SQL, so the
driver's DuckDB oracle can verify the operators on the flat synthetic
``documents`` table (which contains no newlines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

CHUNK_WIDTH = 8


def _tokens(text: Column) -> Column:
    return F.filter(F.split(text, "\\s+"), lambda t: t != "")


def segment(text: Column, mode: str = "lines", width: int = CHUNK_WIDTH) -> Column:
    """text -> array<string> of lines.

    mode="lines": split on newline, drop whitespace-only lines.
    mode="chunks": consecutive `width`-token windows of the whitespace
    token stream (the oracle-expressible segmenter for newline-free text).
    """
    if mode == "lines":
        return F.filter(F.split(text, "\n"), lambda l: F.trim(l) != "")
    if mode != "chunks":
        raise ValueError(f"unknown segment mode: {mode}")
    toks = _tokens(text)
    n = F.size(toks)
    nchunks = F.ceil(n.cast("double") / F.lit(float(width))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nchunks - 1),
        lambda i: F.array_join(F.slice(toks, i * width + 1, width), " "),
    )
    # sequence(0, -1) DESCENDS rather than being empty — guard empty text
    return F.when(n > 0, chunks).otherwise(F.array().cast("array<string>"))


def line_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "lines",
    width: int = CHUNK_WIDTH,
) -> DataFrame:
    """(id, pos, line) — one row per line, pos 0-based within the doc."""
    return docs.select(
        F.col(id_col),
        F.posexplode(segment(F.col(text_col), mode, width)).alias("pos", "line"),
    )


def line_doc_freq(lines: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(line, n_docs): number of DISTINCT docs containing each line.

    Two-phase distinct-then-count (dropDuplicates gets map-side partial
    aggregation) instead of count_distinct, so no single big distinct agg.
    """
    return (
        lines.select("line", id_col)
        .dropDuplicates(["line", id_col])
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _flagged(lines: DataFrame, max_doc_freq: int, id_col: str) -> DataFrame:
    return (
        line_doc_freq(lines, id_col)
        .filter(F.col("n_docs") > max_doc_freq)
        .select("line")
    )


def dedup_lines(
    docs: DataFrame,
    max_doc_freq: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "lines",
    width: int = CHUNK_WIDTH,
) -> DataFrame:
    """Remove every line occurring in more than `max_doc_freq` distinct
    docs (CCNet/RefinedWeb boilerplate removal), rebuild the text.

    Returns (id, text_clean, n_lines_kept, n_lines_total); docs whose every
    line was boilerplate survive with text_clean = '' (the caller decides
    whether to drop empties — C4 does, CCNet keeps for stats).
    """
    lines = line_table(docs, id_col, text_col, mode, width)
    kept = lines.join(_flagged(lines, max_doc_freq, id_col), "line", "left_anti")
    sep = "\n" if mode == "lines" else " "
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines_total"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("n_lines_kept", F.lit(0)).cast("int").alias("n_lines_kept"),
            F.col("n_lines_total").cast("int"),
        )
    )


def boilerplate_char_fraction(
    docs: DataFrame,
    max_doc_freq: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "lines",
    width: int = CHUNK_WIDTH,
) -> DataFrame:
    """Gopher-style cross-doc signal: per doc, the fraction of line
    characters that sit in lines duplicated across > max_doc_freq docs.
    Returns (id, dup_line_char_frac)."""
    lines = line_table(docs, id_col, text_col, mode, width)
    flagged = _flagged(lines, max_doc_freq, id_col).withColumn("dup", F.lit(1))
    marked = lines.join(flagged, "line", "left")
    return marked.groupBy(id_col).agg(
        (
            F.sum(
                F.when(F.col("dup") == 1, F.length("line")).otherwise(F.lit(0))
            ).cast("double")
            / F.sum(F.length("line")).cast("double")
        ).alias("dup_line_char_frac")
    )


def c4_line_filter(
    docs: DataFrame,
    min_words: int = 3,
    min_lines: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "lines",
    width: int = CHUNK_WIDTH,
    require_terminal_punct: bool = False,
) -> DataFrame:
    """C4 §2.1 line rules, per-doc and fully native (no shuffle at all —
    higher-order functions over the segmented array):

    - keep lines with >= min_words words (C4 drops shorter);
    - optionally require terminal punctuation . ! ? " (C4's rule; off by
      default for punctuation-free corpora);
    - drop lines containing 'javascript' (case-insensitive);
    - drop the whole doc if < min_lines lines survive or if the raw text
      contains 'lorem ipsum' or '{'.

    Returns (id, text_clean, n_lines_kept) for surviving docs only.
    """
    segs = segment(F.col(text_col), mode, width)

    def _keep(l: Column) -> Column:
        ok = F.size(F.filter(F.split(l, " "), lambda t: t != "")) >= min_words
        ok = ok & ~F.lower(l).contains("javascript")
        if require_terminal_punct:
            ok = ok & F.substring(l, -1, 1).isin(".", "!", "?", '"')
        return ok

    kept = F.filter(segs, _keep)
    sep = "\n" if mode == "lines" else " "
    out = docs.select(
        F.col(id_col),
        F.array_join(kept, sep).alias("text_clean"),
        F.size(kept).alias("n_lines_kept"),
        F.col(text_col).alias("_raw"),
    )
    return (
        out.filter(
            (F.col("n_lines_kept") >= min_lines)
            & ~F.lower("_raw").contains("lorem ipsum")
            & ~F.col("_raw").contains("{")
        ).drop("_raw")
    )
