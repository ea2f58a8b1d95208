"""Native (JVM/codegen) fast path for URL canonicalization.

The canonicalize pandas UDF (functions/udfs.py) is the engine's hottest
operator — at 10^10 URLs the Arrow crossing dominates the frontier job. The
overwhelming majority of real URLs need none of urllib's generality: plain
lowercase http(s) scheme, no percent-encoding, no params (';'), no duplicate
query keys. For those rows the whole normalization — scheme coercion,
www/port stripping, slash collapsing, tracking-param removal, query-key
sorting (url_normalizer.py:35-151) — is expressible as built-in Catalyst
expressions and stays inside WholeStageCodegen.

Contract: for every URL where ``is_simple_url`` is true, the native result is
byte-identical to ``urlnorm.normalize_url`` (property-tested in
tests/test_urlnorm_native.py). Rows that fail the predicate take the pandas
UDF (operators/dedup.py:canonicalize routes with a filter-union, so the UDF
never runs on fast-path rows).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .urlnorm import IGNORE_EXTENSIONS, MIN_URL_LENGTH, PARAMS_TO_REMOVE

# chars urllib's urlencode/quote_plus passes through unchanged (dash kept
# last so the class survives extra members being appended before it)
_SAFE = "A-Za-z0-9_.~"

# shape a native row must have: lowercase http(s) scheme, host of plain
# label chars, optional port, path free of %-escapes/';'/whitespace, query
# of &-joined safe tokens, optional fragment (cut). Anything else => UDF.
_SIMPLE_RE = (
    r"^https?://[A-Za-z0-9.-]+(:[0-9]{1,5})?"
    r"(/[^%;\s?#]*)?"
    rf"(\?[{_SAFE}=&-]*)?"
    r"(#\S*)?$"
)

_EXT_RE = r"\.(" + "|".join(e.lstrip(".") for e in IGNORE_EXTENSIONS) + r")$"

# a query token the native path understands: KEY or KEY= (dropped, blank
# value) or KEY=VALUE with a single '=' and safe chars only
_TOKEN_RE = rf"^[{_SAFE}-]+(=[{_SAFE}-]*)?$"


def _tok_key(t: Column) -> Column:
    return F.element_at(F.split(t, "=", 2), 1)


def _kept_tokens(q_raw: Column) -> Column:
    """Tokens that survive parse_qs(keep_blank_values=False) + tracking-param
    removal: KEY=VALUE with non-blank value, key not in the removal list."""
    toks = F.filter(F.split(q_raw, "&"), lambda t: t.rlike("^[^=]+=.+$"))
    remove = F.array(*[F.lit(p) for p in sorted(PARAMS_TO_REMOVE)])
    return F.filter(toks, lambda t: ~F.array_contains(remove, F.lower(_tok_key(t))))


def is_simple_url(url: Column) -> Column:
    """True iff the native transform is provably byte-identical to the
    Python normalizer for this URL."""
    s = F.trim(url)
    q_raw = F.regexp_extract(s, r"\?([^#]*)", 1)
    toks_ok = F.forall(
        F.split(q_raw, "&"), lambda t: (t == "") | t.rlike(_TOKEN_RE)
    )
    kept = _kept_tokens(q_raw)
    keys = F.transform(kept, _tok_key)
    no_dup_keys = F.size(keys) == F.size(F.array_distinct(keys))
    host_raw = F.regexp_extract(s, r"^https?://([^/?#]*)", 1)
    host_ok = F.regexp_replace(F.lower(host_raw), r"^www\.", "") != ""
    return (
        url.isNotNull()
        & (F.length(s) >= MIN_URL_LENGTH)
        & s.rlike(_SIMPLE_RE)
        & host_ok
        & toks_ok
        & no_dup_keys
    )


def canonicalize_native(url: Column) -> Column:
    """struct(url_norm, host, path) — same shape as canonicalize_udf; only
    valid under is_simple_url. url_norm is null for extension-rejected rows."""
    s = F.regexp_replace(F.trim(url), "#.*", "")  # fragment off (urlparse)

    host = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_extract(s, r"^https?://([^/?]*)", 1)), r"^www\.", ""
        ),
        ":(80|443)$",
        "",
    )

    path_raw = F.regexp_extract(s, r"^https?://[^/?]*([^?]*)", 1)
    collapsed = F.regexp_replace(path_raw, "/+", "/")
    path = (
        F.when(collapsed == "", F.lit("/"))
        .when(
            (F.length(collapsed) > 1) & collapsed.endswith("/"),
            F.substring(collapsed, 1, F.length(collapsed) - 1),
        )
        .otherwise(collapsed)
    )

    kept = _kept_tokens(F.regexp_extract(s, r"\?(.*)$", 1))
    sorted_toks = F.array_sort(
        kept,
        lambda l, r: F.when(_tok_key(l) < _tok_key(r), F.lit(-1))
        .when(_tok_key(l) > _tok_key(r), F.lit(1))
        .otherwise(F.lit(0)),
    )
    query = F.array_join(sorted_toks, "&")

    url_norm = F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    # extension reject (url_normalizer.py:67-69) checks the RAW parsed path
    rejected = F.lower(path_raw).rlike(_EXT_RE)
    return F.struct(
        F.when(rejected, F.lit(None).cast("string")).otherwise(url_norm).alias("url_norm"),
        F.when(rejected, F.lit(None).cast("string")).otherwise(host).alias("host"),
        F.when(rejected, F.lit(None).cast("string")).otherwise(path).alias("path"),
    )
