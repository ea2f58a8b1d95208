"""F10 charset detection + decode (functions/encoding.py): the reference's
header -> sniff -> fallback ladder (fetcher/app.py:58-79) with deterministic
detectors replacing chardet. errors='replace' decode parity throughout."""

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.functions.encoding import (
    decode_content,
    decode_pages,
    detect_encoding,
)

EURO_1252 = "café €uro".encode("windows-1252")
HTML_META_1252 = (
    b'<html><head><meta charset="windows-1252"></head><body>caf\xe9</body></html>'
)
HTML_META_HTTP_EQUIV = (
    b'<html><head><meta http-equiv="Content-Type" '
    b'content="text/html; charset=ISO-8859-1"></head><body>\xe9</body></html>'
)


def test_header_charset_wins():
    # header beats everything, incl. a conflicting meta tag (reference :62-65)
    assert detect_encoding(HTML_META_1252, "text/html; charset=utf-8") == "utf-8"
    assert detect_encoding(b"abc", "text/html; charset=ISO-8859-1") == "iso-8859-1"


def test_bogus_header_falls_through():
    assert detect_encoding("plain ascii".encode(), "text/html; charset=not-a-codec") == "utf-8"


def test_bom_detection():
    assert detect_encoding("﻿hi".encode("utf-8")) == "utf-8-sig"
    assert detect_encoding("hi".encode("utf-16-le"), None) == "utf-8"  # no BOM -> utf-8 ladder
    import codecs

    # BOM-consuming codecs: endianness comes from the BOM and it is stripped
    assert detect_encoding(codecs.BOM_UTF16_LE + "hi".encode("utf-16-le")) == "utf-16"
    assert detect_encoding(codecs.BOM_UTF16_BE + "hi".encode("utf-16-be")) == "utf-16"


def test_bom_stripped_from_decoded_text_all_families():
    for text, enc in [("hi", "utf-16-le"), ("hi", "utf-16-be"), ("hi", "utf-8-sig")]:
        import codecs

        bom = {"utf-16-le": codecs.BOM_UTF16_LE, "utf-16-be": codecs.BOM_UTF16_BE,
               "utf-8-sig": b""}[enc]
        raw = bom + text.encode(enc)
        _, decoded = decode_content(raw)
        assert decoded == "hi", (enc, decoded)


def test_utf8_multibyte_straddles_sniff_boundary():
    # 10 KB sniff window cuts the 2-byte 'é' in half: must still be utf-8
    payload = (b"a" * 9_999) + "é".encode("utf-8") + b" tail" * 100
    assert detect_encoding(payload) == "utf-8"
    _, text = decode_content(payload)
    assert "é" in text and "�" not in text
    # genuinely broken bytes mid-head still fall through to cp1252
    bad = (b"a" * 5_000) + b"\xff\xfe" + (b"b" * 6_000)
    assert detect_encoding(bad) == "windows-1252"


def test_meta_charset_detection():
    assert detect_encoding(HTML_META_1252) == "windows-1252"
    assert detect_encoding(HTML_META_HTTP_EQUIV) == "iso-8859-1"


def test_utf8_validation_then_cp1252_fallback():
    assert detect_encoding("日本語テキスト".encode("utf-8")) == "utf-8"
    # bytes invalid as UTF-8, no meta/BOM -> windows-1252
    assert detect_encoding(EURO_1252) == "windows-1252"


def test_decode_replace_semantics():
    enc, text = decode_content(EURO_1252)
    assert (enc, text) == ("windows-1252", "café €uro")
    # declared utf-8 but broken bytes: errors='replace', never raises
    enc, text = decode_content(b"ok \xff\xfe broken", "text/html; charset=utf-8")
    assert enc == "utf-8" and "�" in text and text.startswith("ok ")
    assert decode_content(None) == ("utf-8", "")


def test_decode_pages_udf(spark):
    rows = [
        (1, "日本語".encode("utf-8"), None),
        (2, HTML_META_1252, None),
        (3, EURO_1252, "text/html; charset=windows-1252"),
        (4, None, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, html binary, content_type string")
    out = {
        r["doc_id"]: (r["encoding"], r["decoded_text"])
        for r in decode_pages(df, "html", "content_type").collect()
    }
    assert out[1] == ("utf-8", "日本語")
    assert out[2][0] == "windows-1252" and out[2][1].endswith("café</body></html>")
    assert out[3] == ("windows-1252", "café €uro")
    assert out[4] == ("utf-8", "")


def test_hypothesis_fuzz_never_crashes():
    """Arbitrary bytes + arbitrary header strings: detect/decode must always
    return (valid codec label, str) and never raise."""
    import codecs

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None, derandomize=True)
    @given(
        content=st.one_of(st.none(), st.binary(max_size=400)),
        header=st.one_of(st.none(), st.text(max_size=60)),
    )
    def _check(content, header):
        enc, text = decode_content(content, header)
        codecs.lookup(enc)  # label is always resolvable
        assert isinstance(text, str)

    _check()
