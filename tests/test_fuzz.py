"""Fuzzy-similarity scores + the reference's dedup verdict sequence
(test_frontier.py:144-150; thresholds deduplicator.py:32-34)."""

from webcrawler_spark.functions import fuzz
from webcrawler_spark.functions.urlnorm import normalize_url


def test_ratio_basics():
    assert fuzz.ratio("abc", "abc") == 100
    assert fuzz.ratio("abc", "xyz") == 0
    assert fuzz.ratio("", "") == 100


def test_token_sort():
    assert fuzz.token_sort_ratio("hello world", "world hello") == 100


def test_partial():
    assert fuzz.partial_ratio("page1", "https://example.com/page1") == 100


def test_reference_dedup_sequence():
    """page1, page1/, page1?utm_source=google -> exact dups after
    normalization; page-1 -> fuzzy dup (>=85); page2 -> not fuzzy-dup of
    page1 at >=95 ... the reference expects page2 as NEW, which holds in its
    flow because exact dedup runs first and fuzzy similarity of page1 vs
    page2 is computed on full URLs."""
    base = "https://example.com/page1"
    n0 = normalize_url(base)
    # exact variants collapse to the same canonical form
    assert normalize_url("https://example.com/page1/") == n0
    assert normalize_url("https://example.com/page1?utm_source=google") == n0
    assert normalize_url("https://www.example.com:443/page1") == n0
    # fuzzy: page-1 scores >= 85 vs page1
    n_dash = normalize_url("https://example.com/page-1")
    assert fuzz.max_similarity(n0, n_dash) >= 85
