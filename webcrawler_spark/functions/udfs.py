"""Arrow-batched pandas UDFs — the only JVM<->Python crossings in the engine.

Each wraps a pure-Python core from urlnorm/htmllib over ``pd.Series`` batches
(input_hint mandates vectorized UDFs, no per-row Python at the plan level).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType, StringType

from .. import schemas
from . import htmllib, urlnorm


@pandas_udf(schemas.CANON_STRUCT)
def canonicalize_udf(urls: pd.Series) -> pd.DataFrame:
    """F1+F2: RFC-3986-style canonicalization (url_normalizer.py:35-165).

    Returns struct(url_norm, host, path); url_norm is null for rejected URLs.
    """
    norms, hosts, paths = [], [], []
    for u in urls:
        n = urlnorm.normalize_url(u)
        norms.append(n)
        if n is None:
            hosts.append(None)
            paths.append(None)
        else:
            # n is already canonical: scheme://host/path?query
            from urllib.parse import urlparse

            p = urlparse(n)
            hosts.append(p.netloc)
            paths.append(p.path)
    return pd.DataFrame({"url_norm": norms, "host": hosts, "path": paths})


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """F13: the extraction cascade; byte-identical invariant
    (parser/app.py:192-277)."""
    return html.map(
        lambda b: htmllib.extract_text(
            b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else (b or "")
        )
    )


@pandas_udf(ArrayType(schemas.LINK_STRUCT))
def _extract_links_pd(html: pd.Series, base_url: pd.Series) -> pd.Series:
    out = []
    for b, base in zip(html, base_url):
        s = b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else (b or "")
        out.append(htmllib.extract_links(s, base or ""))
    return pd.Series(out)


def extract_links_col(html_col, base_url_col):
    """UDTF-shaped link extraction (parser/app.py:122-166): returns
    ARRAY<STRUCT> to be exploded by the caller."""
    return _extract_links_pd(html_col, base_url_col)


@pandas_udf(schemas.PAGE_META)
def extract_metadata_udf(html: pd.Series, base_url: pd.Series) -> pd.DataFrame:
    """F11: fetcher metadata extraction (fetcher/app.py:81-136)."""
    rows = []
    for b, base in zip(html, base_url):
        s = b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else (b or "")
        rows.append(htmllib.extract_metadata(s, base or ""))
    return pd.DataFrame(rows)


@pandas_udf(IntegerType())
def fuzz_max_score_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """J3: max(fuzz.ratio, token_sort_ratio, partial_ratio)
    (deduplicator.py:155-168), difflib-backed like fuzzywuzzy's pure-python
    fallback."""
    from .fuzz import max_similarity

    return pd.Series(
        [max_similarity(x or "", y or "") for x, y in zip(a, b)], dtype="int32"
    )
