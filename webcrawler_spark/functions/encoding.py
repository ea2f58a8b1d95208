"""Charset detection + decoding for fetched page bytes (SURVEY F10).

The reference's ladder (fetcher/app.py:58-79,434-440): charset from the
Content-Type header -> chardet over the first 10 KB -> confidence < 0.7 =>
utf-8; decode with errors='replace'. chardet is a statistical detector and
is not available in this environment, so the middle rung is replaced by the
deterministic detectors that cover the same real-web cases (and that
browsers themselves check before any statistical sniffing, per the WHATWG
encoding sniffing algorithm):

  1. Content-Type header ``charset=`` parameter (authoritative, as in the
     reference);
  2. byte-order marks: UTF-8 / UTF-16 LE/BE / UTF-32 LE/BE;
  3. an HTML ``<meta charset=...>`` or ``<meta http-equiv="Content-Type"
     content="...charset=..">`` declaration within the first 10 KB;
  4. strict UTF-8 validation of the first 10 KB -> utf-8;
  5. fallback windows-1252 (the web's de-facto latin-1 superset — what
     statistical detectors report for most non-UTF-8 web bytes).

Decode always uses errors='replace', exactly like the reference.

Runs as a vectorized pandas UDF over the binary html column; per-page
Python string ops on a bytes prefix, Arrow-batched (the same shape as the
extract_text UDF — this is parse-stage work, off the frontier hot path).
"""

from __future__ import annotations

import codecs
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SNIFF_LIMIT = 10_000  # reference samples the first 10 KB (fetcher/app.py:67)

# BOM-consuming codec names: the generic utf-16/utf-32 codecs read the BOM
# for endianness AND strip it, matching utf-8-sig — decoded text never
# starts with a spurious U+FEFF regardless of the BOM family
_BOMS: tuple[tuple[bytes, str], ...] = (
    (codecs.BOM_UTF32_LE, "utf-32"),
    (codecs.BOM_UTF32_BE, "utf-32"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16"),
    (codecs.BOM_UTF16_BE, "utf-16"),
)

_META_CHARSET = re.compile(
    rb"""<meta[^>]+?charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)
_HEADER_CHARSET = re.compile(r"charset=\s*([^;\s]+)", re.IGNORECASE)


def _normalize_label(label: str) -> str | None:
    """Validate a charset label against Python's codec registry; returns the
    label unchanged if decodable, else None (bogus labels fall through the
    ladder instead of raising, like the reference's except -> utf-8)."""
    label = label.strip().strip("\"'").lower()
    if not label:
        return None
    try:
        codecs.lookup(label)
    except LookupError:
        return None
    return label


def detect_encoding(content: bytes | None, content_type: str | None = None) -> str:
    """The F10 ladder. Returns a codec name usable with bytes.decode."""
    if content_type:
        m = _HEADER_CHARSET.search(content_type)
        if m:
            label = _normalize_label(m.group(1))
            if label:
                return label
    if not content:
        return "utf-8"
    head = content[:_SNIFF_LIMIT]
    for bom, enc in _BOMS:
        if head.startswith(bom):
            return enc
    m = _META_CHARSET.search(head)
    if m:
        label = _normalize_label(m.group(1).decode("ascii", "ignore"))
        if label:
            return label
    try:
        head.decode("utf-8", "strict")
        return "utf-8"
    except UnicodeDecodeError as e:
        # the sniff window may cut a multibyte sequence: an error starting
        # within the last 3 bytes of a TRUNCATED head is the boundary, not
        # bad UTF-8 (a CJK page has ~2/3 odds of splitting a char there)
        if len(content) > _SNIFF_LIMIT and e.start >= len(head) - 3:
            return "utf-8"
        return "windows-1252"


def decode_content(content: bytes | None, content_type: str | None = None) -> tuple[str, str]:
    """(encoding, decoded text) with errors='replace'
    (fetcher/app.py:437-440)."""
    enc = detect_encoding(content, content_type)
    if content is None:
        return enc, ""
    try:
        return enc, content.decode(enc, errors="replace")
    except (LookupError, ValueError):
        return "utf-8", content.decode("utf-8", errors="replace")


def decode_pages(
    df: DataFrame, html_col: str = "html", content_type_col: str | None = None
) -> DataFrame:
    """Adds ``encoding`` and ``decoded_text`` columns from the binary html
    column via one Arrow-batched pandas UDF."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [StructField("encoding", StringType()), StructField("decoded_text", StringType())]
    )

    @pandas_udf(schema)
    def _decode(html: pd.Series, ctype: pd.Series) -> pd.DataFrame:
        pairs = [decode_content(h, c) for h, c in zip(html, ctype)]
        return pd.DataFrame(
            {"encoding": [p[0] for p in pairs], "decoded_text": [p[1] for p in pairs]}
        )

    ctype = F.col(content_type_col) if content_type_col else F.lit(None).cast("string")
    return (
        df.withColumn("_dec", _decode(F.col(html_col), ctype))
        .withColumn("encoding", F.col("_dec.encoding"))
        .withColumn("decoded_text", F.col("_dec.decoded_text"))
        .drop("_dec")
    )
