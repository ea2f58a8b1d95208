"""URL canonicalization — pure-Python core, shared by the pandas UDFs, the
synthetic-data generator, and the crawl-parity oracle.

Semantics replicate the reference exactly (cited per function):
- normalize: reference services/url-frontier/url_normalizer.py:35-151
- extract_domain: url_normalizer.py:153-165
- priority: url_normalizer.py:167-200
- link normalize (parser variant): services/parser/app.py:79-120

These run vectorized over pd.Series inside Arrow-batched pandas UDFs (see
functions/udfs.py) — never per-row Python at the DataFrame layer.
"""

from __future__ import annotations

import re
from urllib.parse import parse_qs, urlencode, urljoin, urlparse, urlunparse

# tracking/session params dropped during canonicalization (url_normalizer.py:22-26)
PARAMS_TO_REMOVE = frozenset(
    {
        "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
        "gclid", "fbclid", "msclkid", "_ga", "_gid", "sessionid", "jsessionid",
        "phpsessid", "sid", "ref", "referrer",
    }
)

# 24 media/doc extensions rejected by the frontier (url_normalizer.py:29-33)
IGNORE_EXTENSIONS = (
    ".jpg", ".jpeg", ".png", ".gif", ".bmp", ".svg", ".webp",
    ".pdf", ".doc", ".docx", ".xls", ".xlsx", ".ppt", ".pptx",
    ".zip", ".rar", ".tar", ".gz", ".mp3", ".mp4", ".avi", ".mov",
)

# parser link-extraction variant: 25 extensions incl. css/js/ico/xml/rss
# (parser/app.py:61-67)
PARSER_EXCLUDED_EXTENSIONS = (
    ".pdf", ".doc", ".docx", ".xls", ".xlsx", ".ppt", ".pptx",
    ".zip", ".rar", ".tar", ".gz", ".7z",
    ".jpg", ".jpeg", ".png", ".gif", ".bmp", ".svg", ".webp",
    ".mp3", ".mp4", ".avi", ".mov", ".wmv", ".flv",
    ".css", ".js", ".ico", ".xml", ".rss",
)

# social/search domains excluded from link discovery (parser/app.py:73-77);
# matched as *substring of netloc* like the reference does (parser/app.py:99)
EXCLUDED_DOMAINS = (
    "facebook.com", "twitter.com", "instagram.com", "linkedin.com",
    "youtube.com", "tiktok.com", "pinterest.com", "reddit.com",
    "google.com", "bing.com", "yahoo.com", "duckduckgo.com",
)

_MULTI_SLASH = re.compile(r"/+")
# light stand-in for validators.url (parser/app.py:113) — scheme://host[.tld][:port][/...]
_URL_OK = re.compile(
    r"^https?://"
    r"(?:[a-z0-9](?:[a-z0-9-]*[a-z0-9])?\.)+[a-z]{2,}"
    r"(?::\d{1,5})?"
    r"(?:[/?#]\S*)?$",
    re.IGNORECASE,
)

MIN_URL_LENGTH = 10  # url_normalizer.py:51


def normalize_url(url: str | None) -> str | None:
    """Frontier canonicalization. Returns None when the URL is rejected."""
    if not url or not isinstance(url, str):
        return None
    url = url.strip()
    if not url or len(url) < MIN_URL_LENGTH:
        return None
    if not url.startswith(("http://", "https://")):
        url = "https://" + url
    try:
        parsed = urlparse(url)
    except Exception:
        return None
    if not parsed.netloc:
        return None
    path_lower = parsed.path.lower()
    if path_lower.endswith(IGNORE_EXTENSIONS):
        return None

    scheme = parsed.scheme.lower()
    scheme = "https" if scheme in ("http", "https") else scheme

    netloc = parsed.netloc.lower()
    if netloc.startswith("www."):
        netloc = netloc[4:]
    if netloc.endswith(":80"):
        netloc = netloc[:-3]
    elif netloc.endswith(":443"):
        netloc = netloc[:-4]

    path = parsed.path
    if not path:
        path = "/"
    else:
        path = _MULTI_SLASH.sub("/", path)
        if len(path) > 1 and path.endswith("/"):
            path = path[:-1]

    query = ""
    if parsed.query:
        try:
            params = parse_qs(parsed.query, keep_blank_values=False)
            filtered = {k: v for k, v in params.items() if k.lower() not in PARAMS_TO_REMOVE}
            if filtered:
                query = urlencode(sorted(filtered.items()), doseq=True)
        except Exception:
            query = ""

    return urlunparse((scheme, netloc, path, "", query, ""))


def extract_host(url: str | None) -> str | None:
    """Lowercased netloc with www. stripped (url_normalizer.py:153-165)."""
    if not url:
        return None
    try:
        host = urlparse(url).netloc.lower()
    except Exception:
        return None
    if host.startswith("www."):
        host = host[4:]
    return host or None


def url_priority(url: str, depth: int = 0, source_priority: int = 0) -> int:
    """Priority score, floor 1 (url_normalizer.py:167-200)."""
    base = 100
    u = url.lower()
    bonus = 0
    if u.endswith("/") or u.count("/") <= 3:
        bonus += 20
    if any(k in u for k in ("news", "blog", "article", "post")):
        bonus += 10
    if any(k in u for k in ("archive", "tag", "category", "page=")):
        bonus -= 15
    return max(1, base + source_priority + bonus - depth * 10)


def registered_domain(host: str | None) -> str:
    """Registered-domain heuristic standing in for tldextract
    (parser/app.py:168-175). Last two labels, or three when the middle label
    is a common SLD (co.uk-style)."""
    if not host:
        return ""
    host = host.lower().split(":")[0]
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    if labels[-2] in {"co", "com", "org", "net", "ac", "gov", "edu"} and len(labels[-1]) == 2:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def parser_normalize_link(href: str | None, base_url: str) -> str | None:
    """Link-extraction normalization (parser/app.py:79-120): urljoin, scheme
    whitelist, extension/domain blocklists, lowercase netloc, rstrip path
    slash, drop fragment, final validity check."""
    if not href:
        return None
    try:
        absolute = urljoin(base_url, href.strip())
        parsed = urlparse(absolute)
    except Exception:
        return None
    if parsed.scheme not in ("http", "https"):
        return None
    path_lower = parsed.path.lower()
    if path_lower.endswith(PARSER_EXCLUDED_EXTENSIONS):
        return None
    domain = parsed.netloc.lower()
    if any(excl in domain for excl in EXCLUDED_DOMAINS):
        return None
    normalized = urlunparse(
        (
            parsed.scheme,
            domain,
            parsed.path.rstrip("/") if parsed.path != "/" else "/",
            parsed.params,
            parsed.query,
            "",
        )
    )
    if _URL_OK.match(normalized):
        return normalized
    return None


def is_internal_link(url: str, base_url: str) -> bool:
    """Same registered domain => internal (parser/app.py:168-175)."""
    try:
        return registered_domain(extract_host(url) or urlparse(url).netloc) == registered_domain(
            extract_host(base_url) or urlparse(base_url).netloc
        )
    except Exception:
        return False
