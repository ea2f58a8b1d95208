"""HTML processing core — pure Python on stdlib ``html.parser``.

Reimplements, from public behavior only, the reference's:

- multi-method text-extraction cascade (services/parser/app.py:192-277).
  The reference tries trafilatura -> justext -> boilerpy3 -> BeautifulSoup.
  Those third-party extractors are unavailable in this environment, so the
  cascade is implemented with optional import-gated slots for them and a
  deterministic stdlib implementation of the BeautifulSoup branch
  (parser/app.py:227-247): strip <script>/<style>/<nav>/<footer>/<header>
  subtrees and comments, concatenate text nodes, then squash whitespace via
  the identical lines -> double-space chunks -> single-space join.
  The selection rule (parser/app.py:259-277) is implemented exactly:
  methods with >100 stripped chars are valid; first method in preference
  order with >200 stripped chars wins (stripped); else longest valid raw.

- page-metadata extraction (services/fetcher/app.py:81-136): title[:200],
  meta description[:500], meta keywords[:200], html@lang, canonical link
  (urljoin'd), link/img counts, text_length.

- link extraction (services/parser/app.py:122-166): <a href> in document
  order then <link rel=canonical|alternate>, dedup by normalized url,
  anchor_text[:200], link_type internal/external/canonical/alternate.

The synthetic page table is generated with this same extractor so the
per-row invariant ``extract_text(html) == text`` is byte-exact by
construction and enforced in tests.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin

from .urlnorm import is_internal_link, parser_normalize_link

# Optional heavyweight extractors (reference parser/requirements.txt pins
# trafilatura 1.6.4). Absent in-sandbox; cascade degrades deterministically.
try:  # pragma: no cover - not installed here
    import trafilatura  # type: ignore
except Exception:  # pragma: no cover
    trafilatura = None
try:  # pragma: no cover
    import justext  # type: ignore
except Exception:  # pragma: no cover
    justext = None
try:  # pragma: no cover
    from boilerpy3 import extractors as _boilerpy_extractors  # type: ignore
except Exception:  # pragma: no cover
    _boilerpy_extractors = None

# subtrees removed before text extraction (parser/app.py:231)
_STRIP_TAGS = frozenset({"script", "style", "nav", "footer", "header"})
_VOID_TAGS = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input",
     "link", "meta", "param", "source", "track", "wbr"}
)


class _TextCollector(HTMLParser):
    """Collect text nodes outside stripped subtrees (bs4 get_text analog)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self.parts: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _STRIP_TAGS and tag not in _VOID_TAGS:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _STRIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            self.parts.append(data)

    # comments are dropped implicitly (reference removes Comment nodes,
    # parser/app.py:235-236)


def _soup_branch(html: str) -> str:
    """The BeautifulSoup fallback branch (parser/app.py:227-247)."""
    try:
        collector = _TextCollector()
        collector.feed(html)
        collector.close()
        raw = "\n".join(collector.parts)
    except Exception:
        return ""
    # identical whitespace squash (parser/app.py:241-243)
    lines = (line.strip() for line in raw.splitlines())
    chunks = (phrase.strip() for line in lines for phrase in line.split("  "))
    return " ".join(chunk for chunk in chunks if chunk)


def extract_methods(html: str) -> dict[str, str]:
    """Run every available extraction method (parser/app.py:192-247)."""
    results: dict[str, str] = {}
    if trafilatura is not None:  # pragma: no cover
        try:
            results["trafilatura"] = trafilatura.extract(
                html, include_comments=False, include_tables=True
            ) or ""
        except Exception:
            results["trafilatura"] = ""
    if justext is not None:  # pragma: no cover
        try:
            paragraphs = justext.justext(html, justext.get_stoplist("English"))
            results["justext"] = "\n".join(
                p.text for p in paragraphs if not p.is_boilerplate
            )
        except Exception:
            results["justext"] = ""
    if _boilerpy_extractors is not None:  # pragma: no cover
        try:
            results["boilerpy"] = (
                _boilerpy_extractors.ArticleExtractor().get_content(html) or ""
            )
        except Exception:
            results["boilerpy"] = ""
    results["beautifulsoup"] = _soup_branch(html)
    return results


_PREFERENCE_ORDER = ("trafilatura", "justext", "boilerpy", "beautifulsoup")


def select_best_content(results: dict[str, str]) -> str:
    """Selection rule, exact (parser/app.py:259-277)."""
    valid = {k: v for k, v in results.items() if v and len(v.strip()) > 100}
    if not valid:
        return ""
    for method in _PREFERENCE_ORDER:
        if method in valid:
            content = valid[method].strip()
            if len(content) > 200:
                return content
    return max(valid.values(), key=len)


def extract_text(html: str) -> str:
    """The cascade end-to-end — the byte-identical per-url invariant."""
    return select_best_content(extract_methods(html))


class _DocParser(HTMLParser):
    """One pass collecting metadata + links in document order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title_parts: list[str] = []
        self._in_title = False
        self.description: str | None = None
        self.keywords: str | None = None
        self.lang: str | None = None
        self.canonical_href: str | None = None
        self.a_tags: list[tuple[str | None, str | None, list[str], list[str]]] = []
        # each a_tag: (href, title, rel, anchor_parts) — anchor_parts mutated
        self._open_a: list[str] | None = None
        self.link_tags: list[tuple[str | None, list[str]]] = []
        self.links_count = 0
        self.images_count = 0

    @staticmethod
    def _rel_list(value: str | None) -> list[str]:
        return value.split() if value else []

    def handle_starttag(self, tag: str, attrs) -> None:
        d = dict(attrs)
        if tag == "html" and self.lang is None:
            self.lang = d.get("lang")
        elif tag == "title":
            self._in_title = True
        elif tag == "meta":
            name = (d.get("name") or "").lower()
            if name == "description" and self.description is None:
                self.description = d.get("content")
            elif name == "keywords" and self.keywords is None:
                self.keywords = d.get("content")
        elif tag == "a":
            self.links_count += 1
            if "href" in d:
                anchor: list[str] = []
                self.a_tags.append((d.get("href"), d.get("title"), self._rel_list(d.get("rel")), anchor))
                self._open_a = anchor
        elif tag == "img":
            self.images_count += 1
        elif tag == "link":
            rel = self._rel_list(d.get("rel"))
            if "href" in d:
                self.link_tags.append((d.get("href"), rel))
                if "canonical" in rel and self.canonical_href is None:
                    self.canonical_href = d.get("href")

    def handle_endtag(self, tag: str) -> None:
        if tag == "title":
            self._in_title = False
        elif tag == "a":
            self._open_a = None

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self.title_parts.append(data)
        if self._open_a is not None:
            self._open_a.append(data)


def parse_document(html: str) -> _DocParser:
    parser = _DocParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        pass
    return parser


def extract_metadata(html: str, base_url: str) -> dict:
    """Fetcher metadata extraction (fetcher/app.py:81-136)."""
    doc = parse_document(html)
    title = "".join(doc.title_parts).strip()[:200] or None
    description = (doc.description or "").strip()[:500] or None
    keywords = (doc.keywords or "").strip()[:200] or None
    canonical = urljoin(base_url, doc.canonical_href) if doc.canonical_href else None
    text = extract_text(html)
    return {
        "title": title,
        "description": description,
        "keywords": keywords,
        "lang": doc.lang,
        "canonical_url": canonical,
        "links_count": doc.links_count,
        "images_count": doc.images_count,
        "text_length": len(text),
    }


def extract_links(html: str, base_url: str) -> list[dict]:
    """Link extraction, exact reference order + dedup (parser/app.py:122-166)."""
    doc = parse_document(html)
    links: list[dict] = []
    seen: set[str] = set()
    for href, _title, rel, anchor_parts in doc.a_tags:
        if not href:
            continue
        normalized = parser_normalize_link(href, base_url)
        if normalized and normalized not in seen:
            seen.add(normalized)
            links.append(
                {
                    "url": normalized,
                    "anchor_text": "".join(anchor_parts).strip()[:200],
                    "rel": rel,
                    "link_type": "internal"
                    if is_internal_link(normalized, base_url)
                    else "external",
                }
            )
    for href, rel in doc.link_tags:
        if "canonical" in rel or "alternate" in rel:
            normalized = parser_normalize_link(href, base_url)
            if normalized and normalized not in seen:
                seen.add(normalized)
                links.append(
                    {
                        "url": normalized,
                        "anchor_text": "",
                        "rel": rel,
                        "link_type": "canonical" if "canonical" in rel else "alternate",
                    }
                )
    return links
