"""Unit tests for URL canonicalization + priority — ports the reference's own
normalization expectations (test_frontier.py:22-33 style cases) into pytest."""

import pytest

from webcrawler_spark.functions import urlnorm

NORMALIZATION_TABLE = [
    # (raw, expected) — the reference's tricky-URL table
    ("http://EXAMPLE.COM/Path/", "https://example.com/Path"),
    ("https://www.example.com/page", "https://example.com/page"),
    ("https://example.com:443/page", "https://example.com/page"),
    ("http://example.com:80/page", "https://example.com/page"),
    ("http://example.com/path?utm_source=google&id=123", "https://example.com/path?id=123"),
    ("https://example.com/path?b=2&a=1", "https://example.com/path?a=1&b=2"),
    ("https://example.com//a//b/", "https://example.com/a/b"),
    ("https://example.com", "https://example.com/"),
    ("example.com/some/page", "https://example.com/some/page"),
    ("https://example.com/photo.jpg", None),          # media extension
    ("https://example.com/report.pdf", None),
    ("short", None),                                   # len < 10
    ("", None),
    (None, None),
    ("https://example.com/path#fragment", "https://example.com/path"),
    (
        "https://example.com/p?fbclid=x&gclid=y&sessionid=z",
        "https://example.com/p",
    ),
]


@pytest.mark.parametrize("raw,expected", NORMALIZATION_TABLE)
def test_normalize(raw, expected):
    assert urlnorm.normalize_url(raw) == expected


def test_normalize_idempotent():
    for raw, expected in NORMALIZATION_TABLE:
        if expected is not None:
            assert urlnorm.normalize_url(expected) == expected


def test_priority_trailing_slash_and_floor():
    assert urlnorm.url_priority("https://example.com/", 0, 0) == 120
    assert urlnorm.url_priority("https://example.com/a", 20, 0) == 1


def test_priority_news_bonus():
    # 'https://example.com/news' has 3 slashes -> shallow bonus + news bonus
    assert urlnorm.url_priority("https://example.com/news", 0, 0) == 130


def test_priority_archive_penalty():
    # /archive/x: 4 slashes -> no shallow bonus; archive penalty -15
    assert urlnorm.url_priority("https://example.com/archive/x", 0, 0) == 85


def test_priority_depth_penalty():
    assert urlnorm.url_priority("https://example.com/deep/page", 3, 0) == 70


def test_extract_host():
    assert urlnorm.extract_host("https://WWW.Example.COM/x") == "example.com"
    assert urlnorm.extract_host("https://sub.site.org/") == "sub.site.org"


def test_registered_domain():
    assert urlnorm.registered_domain("blog.site001.com") == "site001.com"
    assert urlnorm.registered_domain("a.b.co.uk") == "b.co.uk"
    assert urlnorm.registered_domain("site001.com") == "site001.com"


def test_parser_normalize_link():
    base = "https://site000.com/page-1"
    f = urlnorm.parser_normalize_link
    assert f("/about", base) == "https://site000.com/about"
    assert f("https://other.com/x/", base) == "https://other.com/x"
    assert f("mailto:a@b.com", base) is None
    assert f("/files/doc.pdf", base) is None
    assert f("/app.css", base) is None
    assert f("https://facebook.com/share", base) is None
    assert f("https://sub.twitter.com/x", base) is None  # substring match


def test_is_internal_link():
    assert urlnorm.is_internal_link("https://www.site000.com/a", "https://site000.com/")
    assert not urlnorm.is_internal_link("https://site001.com/a", "https://site000.com/")
