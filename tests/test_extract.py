"""Extraction cascade + metadata + link extraction golden tests.

Ports the reference's golden-HTML expectations (test_parser.py:54-232 and
test_fetcher.py:142-199) onto an equivalent fixture, and enforces the
byte-identity invariant over the whole synthetic web.
"""

from webcrawler_spark.functions import htmllib

GOLDEN_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
<title>Main Article Title - Test Site</title>
<meta name="description" content="A long test description about the main article with details.">
<meta name="keywords" content="test, article, crawler">
<link rel="canonical" href="https://testsite.com/articles/main-article">
<link rel="alternate" href="https://testsite.com/feed">
<style>body { font-family: Arial; color: #333; }</style>
<script>console.log('analytics tracker');</script>
</head>
<body>
<header><h1>Test Site</h1></header>
<nav><a href="/">Home</a> <a href="/about">About</a></nav>
<article>
<h2>Main Article Title</h2>
<p>This is the first paragraph of the main article content. It has enough
text to be meaningful and it talks about web crawling systems in detail,
including politeness and scheduling concerns that matter at scale.</p>
<p>The second paragraph continues the discussion. Distributed crawlers must
manage frontier state, deduplicate URLs, and respect robots directives while
maintaining throughput across many worker shards.</p>
<p>A third paragraph closes the article with conclusions about batch epoch
processing and snapshot-based checkpointing for resumable pipelines.</p>
<a href="/articles/related-article">Related article</a>
<a href="https://external-site.org/reference">External reference</a>
<a href="https://facebook.com/share">Share on Facebook</a>
<a href="/files/whitepaper.pdf">Whitepaper PDF</a>
<a href="/media/demo.mp4">Demo video</a>
</article>
<aside>Sidebar content here.</aside>
<footer><p>Copyright Test Site</p></footer>
<img src="/img/a.png"><img src="/img/b.png">
</body>
</html>"""

BASE = "https://testsite.com/articles/main-article"


def test_extract_text_strips_boilerplate():
    text = htmllib.extract_text(GOLDEN_HTML)
    assert "Main Article Title" in text
    assert "first paragraph of the main article" in text
    # script/style content must be gone (parser/app.py:231)
    assert "console.log" not in text
    assert "font-family" not in text
    # nav/footer/header subtrees removed
    assert "Copyright Test Site" not in text
    assert "Home" not in text


def test_extract_text_whitespace_squash():
    text = htmllib.extract_text(GOLDEN_HTML)
    assert "  " not in text
    assert "\n" not in text


def test_selection_rule():
    # <100 chars in every method -> empty
    assert htmllib.extract_text("<html><body><p>short</p></body></html>") == ""
    # >100 but <=200 chars -> longest-valid fallback branch (parser/app.py:277)
    mid = "<html><body><p>" + "word " * 25 + "</p></body></html>"
    out = htmllib.extract_text(mid)
    assert len(out) > 100
    # >200 chars -> preferred-method branch returns stripped content
    long = "<html><body><p>" + "word " * 50 + "</p></body></html>"
    assert len(htmllib.extract_text(long)) > 200


def test_extract_links_golden():
    links = htmllib.extract_links(GOLDEN_HTML, BASE)
    by_url = {l["url"]: l for l in links}
    # internal links found
    assert "https://testsite.com/articles/related-article" in by_url
    assert by_url["https://testsite.com/articles/related-article"]["link_type"] == "internal"
    assert by_url["https://testsite.com/articles/related-article"]["anchor_text"] == "Related article"
    # external link found
    assert by_url["https://external-site.org/reference"]["link_type"] == "external"
    # excluded: social domain, .pdf, .mp4 (parser/app.py:61-77)
    assert not any("facebook" in u for u in by_url)
    assert not any(u.endswith(".pdf") or u.endswith(".mp4") for u in by_url)
    # canonical/alternate from <link> tags
    assert by_url["https://testsite.com/articles/main-article"]["link_type"] == "canonical"
    assert by_url["https://testsite.com/feed"]["link_type"] == "alternate"
    # nav links normalized
    assert "https://testsite.com/" in by_url
    assert "https://testsite.com/about" in by_url


def test_extract_metadata_golden():
    meta = htmllib.extract_metadata(GOLDEN_HTML, BASE)
    assert meta["title"] == "Main Article Title - Test Site"
    assert meta["description"].startswith("A long test description")
    assert meta["keywords"] == "test, article, crawler"
    assert meta["lang"] == "en"
    assert meta["canonical_url"] == "https://testsite.com/articles/main-article"
    assert meta["images_count"] == 2
    assert meta["links_count"] == 7  # all <a> tags regardless of filters
    assert meta["text_length"] == len(htmllib.extract_text(GOLDEN_HTML))


def test_title_truncated_200():
    html = "<html><head><title>" + "t" * 500 + "</title></head><body></body></html>"
    meta = htmllib.extract_metadata(html, "https://x.com/")
    assert len(meta["title"]) == 200


def test_byte_identity_over_synthetic_web(web):
    """The per-row invariant: extract_text(html) == text for every page."""
    for p in web["pages"]:
        assert htmllib.extract_text(p["html"].decode("utf-8")) == p["text"]


# ---- multi-method cascade selection (parser/app.py:259-277) --------------------
# The heavyweight extractors are absent in this environment, so the
# >200-char preference rule normally only ever sees the beautifulsoup
# branch. Inject fakes into the import-gated slots to exercise selection
# among >=2 live methods on every branch.


class _FakeTrafilatura:
    def __init__(self, out):
        self.out = out

    def extract(self, html, **kw):
        if isinstance(self.out, Exception):
            raise self.out
        return self.out


class _FakeJustext:
    class _P:
        def __init__(self, text):
            self.text = text
            self.is_boilerplate = False

    def __init__(self, out):
        self.out = out

    def justext(self, html, stoplist):
        return [self._P(self.out)]

    def get_stoplist(self, lang):
        return set()


_BS_HTML = "<html><body><p>" + "soup words here " * 40 + "</p></body></html>"
_BS_TEXT = htmllib._soup_branch(_BS_HTML)
assert len(_BS_TEXT) > 200  # fixture sanity: the bs4 branch is a live contender


def test_cascade_preferred_method_wins(monkeypatch):
    long_traf = "trafilatura content " * 20  # > 200 chars
    monkeypatch.setattr(htmllib, "trafilatura", _FakeTrafilatura(long_traf))
    assert htmllib.extract_text(_BS_HTML) == long_traf.strip()


def test_cascade_short_preferred_falls_through(monkeypatch):
    """A valid (>100) but short (<=200) preferred method must NOT win; the
    next method in preference order with >200 chars does."""
    short_traf = "t" * 150
    long_jx = "justext content " * 20
    monkeypatch.setattr(htmllib, "trafilatura", _FakeTrafilatura(short_traf))
    monkeypatch.setattr(htmllib, "justext", _FakeJustext(long_jx))
    assert htmllib.extract_text(_BS_HTML) == long_jx.strip()


def test_cascade_all_short_longest_valid_raw_wins(monkeypatch):
    """No method clears 200 stripped chars -> longest valid raw output."""
    traf = "t" * 120
    jx = "j" * 180  # longest valid
    monkeypatch.setattr(htmllib, "trafilatura", _FakeTrafilatura(traf))
    monkeypatch.setattr(htmllib, "justext", _FakeJustext(jx))
    short_html = "<html><body><p>" + "w " * 60 + "</p></body></html>"  # bs4 ~120
    bs = htmllib._soup_branch(short_html)
    assert 100 < len(bs) <= 200
    expected = max([traf, jx, bs], key=len)
    assert htmllib.extract_text(short_html) == expected


def test_cascade_failing_method_degrades(monkeypatch):
    """An extractor that raises contributes '' and the cascade continues."""
    monkeypatch.setattr(htmllib, "trafilatura", _FakeTrafilatura(RuntimeError("boom")))
    assert htmllib.extract_text(_BS_HTML) == _BS_TEXT


def test_cascade_invalid_short_method_excluded(monkeypatch):
    """<=100 stripped chars is invalid regardless of preference order."""
    monkeypatch.setattr(htmllib, "trafilatura", _FakeTrafilatura("x" * 80))
    assert htmllib.extract_text(_BS_HTML) == _BS_TEXT
