"""Deterministic synthetic Common-Crawl-style web (FIXTURES.md §1-§3).

Generates the authoritative input table
``pages(url, warc_ts, html, text, lang)`` from a seeded host/page link graph:

- hosts drawn Zipf-skewed (a few hot hosts at ~100x the median, mirroring the
  skew the reference rebalances at domain_sharding.py:213-276);
- HTML shaped like the reference's golden fixture (test_parser.py:56-146):
  title/meta/nav/article/aside/footer, script+style blocks to strip, internal
  + external + social + excluded-extension links, canonical <link>;
- ``text`` is set to ``extract_text(html)`` at generation time, so the
  byte-identical per-row invariant holds by construction and is *checked*
  (not assumed) in tests;
- hrefs embed normalization traps (case, trailing slash, utm params, :443,
  www., //) from the reference's own normalization table
  (test_frontier.py:22-33).

Everything derives from random.Random(seed) — no wall clock, fully
reproducible.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

from .functions.htmllib import extract_text

_WORDS = (
    "spark frontier crawl engine politeness budget priority queue schedule "
    "shard partition bloom filter fingerprint dedup content quality analysis "
    "index search facet language tokens window epoch snapshot resume lineage "
    "counter throughput latency scale skew salt broadcast shuffle join scan "
    "column arrow batch vector hash host domain path query parameter link "
    "anchor canonical robots delay bucket rate limit attempt defer ready "
    "discover depth source status pending news article blog post update "
    "report guide tutorial review product published reporter breaking "
    "opinion thoughts price documentation"
).split()

_LANGS = ("en", "en", "en", "en", "en", "en", "en", "es", "de", "unknown")

BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _sentence(rng: random.Random, n: int) -> str:
    words = [rng.choice(_WORDS) for _ in range(n)]
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _paragraph(rng: random.Random, sentences: int) -> str:
    return " ".join(_sentence(rng, rng.randint(8, 16)) for _ in range(sentences))


def make_hosts(rng: random.Random, n_hosts: int) -> list[str]:
    return [f"site{i:03d}.com" for i in range(n_hosts)]


def _zipf_page_counts(rng: random.Random, n_hosts: int, n_pages: int) -> list[int]:
    """Zipf-ish allocation with hot head hosts."""
    weights = [1.0 / (i + 1) for i in range(n_hosts)]
    total = sum(weights)
    counts = [max(1, int(n_pages * w / total)) for w in weights]
    # trim/pad deterministically to exactly n_pages
    diff = n_pages - sum(counts)
    i = 0
    while diff != 0:
        idx = i % n_hosts
        if diff > 0:
            counts[idx] += 1
            diff -= 1
        elif counts[idx] > 1:
            counts[idx] -= 1
            diff += 1
        i += 1
    return counts


_PATH_KINDS = (
    "news/story-{j}",
    "blog/post-{j}",
    "article-{j}",
    "products/item-{j}",
    "docs/guide-{j}",
    "tag/topic-{j}",
    "archive/{j}",
    "page-{j}",
)


def _page_paths(rng: random.Random, n: int) -> list[str]:
    paths = ["/"]
    for j in range(1, n):
        kind = _PATH_KINDS[j % len(_PATH_KINDS)]
        paths.append("/" + kind.format(j=j))
    return paths


def _trap_href(rng: random.Random, url: str) -> str:
    """Rewrite a canonical URL into an equivalent messy variant."""
    choice = rng.randrange(6)
    if choice == 0:
        return url + ("/" if not url.endswith("/") else "")
    if choice == 1:
        return url + "?utm_source=google&utm_medium=cpc"
    if choice == 2:
        scheme, rest = url.split("://", 1)
        host, _, path = rest.partition("/")
        return f"{scheme}://{host.upper()}/{path}"
    if choice == 3:
        return url.replace("://", "://www.", 1)
    if choice == 4:
        scheme, rest = url.split("://", 1)
        host, _, path = rest.partition("/")
        return f"{scheme}://{host}:443/{path}"
    return url.replace("://", "://", 1).replace(".com/", ".com//", 1) if "/" in url.split("://", 1)[1] else url


def _page_html(
    rng: random.Random,
    url: str,
    host: str,
    internal_targets: list[str],
    external_targets: list[str],
    lang: str,
) -> tuple[str, list[str]]:
    """Render one page. Returns (html, a_hrefs) where a_hrefs is every raw
    <a href> value in document order — the generator's own link plan, i.e.
    INPUT data (the html is rendered FROM it), recorded so SQL oracles can
    re-derive link discovery without running the engine's parser. The rng
    call order below is byte-parity-critical: title, desc, kws, paras, then
    per internal target (random() [, trap randrange] , anchor sentence),
    then per external target (anchor sentence), then the aside."""
    title = _sentence(rng, rng.randint(4, 8))[:-1]
    desc = _sentence(rng, rng.randint(10, 18))
    kws = ", ".join(rng.choice(_WORDS) for _ in range(5))
    paras = "\n".join(
        f"<p>{_paragraph(rng, rng.randint(3, 6))}</p>" for _ in range(rng.randint(3, 7))
    )
    internal_pairs = []
    for t in internal_targets:
        href = _trap_href(rng, t) if rng.random() < 0.3 else t
        internal_pairs.append((href, _sentence(rng, 3)[:-1]))
    internal_links = "\n".join(f'<a href="{h}">{a}</a>' for h, a in internal_pairs)
    external_links = "\n".join(
        f'<a href="{t}">{_sentence(rng, 2)[:-1]}</a>' for t in external_targets
    )
    social = '<a href="https://facebook.com/share">Share</a>\n<a href="https://twitter.com/intent">Tweet</a>'
    excluded = (
        '<a href="/files/report.pdf">PDF</a>\n<a href="/media/video.mp4">Video</a>\n'
        '<a href="/img/photo.jpg">Photo</a>'
    )
    a_hrefs = (
        ["/", "/about-site"]
        + [h for h, _ in internal_pairs]
        + list(external_targets)
        + ["https://facebook.com/share", "https://twitter.com/intent"]
        + ["/files/report.pdf", "/media/video.mp4", "/img/photo.jpg"]
    )
    html = f"""<!DOCTYPE html>
<html lang="{lang}">
<head>
<title>{title}</title>
<meta name="description" content="{desc}">
<meta name="keywords" content="{kws}">
<link rel="canonical" href="{url}">
<style>body {{ font-family: serif; }}</style>
<script>console.log('tracker');</script>
</head>
<body>
<header><h1>{host}</h1></header>
<nav><a href="/">Home</a> <a href="/about-site">About</a></nav>
<article>
<h2>{title}</h2>
{paras}
<div class="links">
{internal_links}
{external_links}
</div>
</article>
<aside>{_paragraph(rng, 2)}</aside>
<footer>{social}
{excluded}
<p>Copyright {host}</p></footer>
</body>
</html>"""
    return html, a_hrefs


def generate_web(
    seed: int = 42,
    n_hosts: int = 40,
    n_pages: int = 400,
    internal_degree: int = 4,
    external_degree: int = 2,
    dust_sessions: int = 0,
) -> dict:
    """Build the synthetic web. Returns dict with keys pages, seeds, robots
    (lists of dict rows).

    ``dust_sessions`` (opt-in, default 0 = byte-identical to before): every
    3rd host additionally serves its first pages under session-id aliases
    (`?affid=k`, same body).  The EARLY aliases (sid 1..n) are linked from the
    host's root page — fetched one epoch after the root, they are the
    evidence DUST mining learns from; the LATE aliases (sid n+1..2n) are
    linked from every other page of the host — with CrawlConfig.mine_dust
    on, the learned rule strips them to the (already-seen) canonical URL
    before they are ever fetched."""
    rng = random.Random(seed)
    hosts = make_hosts(rng, n_hosts)
    counts = _zipf_page_counts(rng, n_hosts, n_pages)

    # canonical URL universe per host
    host_urls: dict[str, list[str]] = {}
    for host, cnt in zip(hosts, counts):
        paths = _page_paths(rng, cnt)
        host_urls[host] = [
            f"https://{host}{p if p != '/' else '/'}".rstrip()
            for p in paths
        ]
    all_urls = [u for urls in host_urls.values() for u in urls]

    dust_early: dict[str, list[str]] = {}
    dust_late: dict[str, list[str]] = {}
    if dust_sessions:
        for host in hosts[::3]:
            targets = host_urls[host][:3]
            dust_early[host] = [
                f"{t}?affid={k}" for t in targets for k in range(1, dust_sessions + 1)
            ]
            dust_late[host] = [
                f"{t}?affid={k}"
                for t in targets
                for k in range(dust_sessions + 1, 2 * dust_sessions + 1)
            ]

    pages = []
    idx = 0
    for host in hosts:
        urls = host_urls[host]
        for u in urls:
            others = [x for x in urls if x != u]
            rng.shuffle(others)
            internal = others[: min(internal_degree, len(others))]
            if u == urls[0] and host in dust_early:
                internal = internal + dust_early[host]
            elif u != urls[0] and host in dust_late:
                internal = internal + dust_late[host]
            external = []
            for _ in range(external_degree):
                t = all_urls[rng.randrange(len(all_urls))]
                if extract_host_of(t) != host:
                    external.append(t)
            lang = rng.choice(_LANGS)
            html, a_hrefs = _page_html(rng, u, host, internal, external, lang)
            text = extract_text(html)
            pages.append(
                {
                    "url": u,
                    "warc_ts": BASE_TS + timedelta(seconds=idx * 7),
                    "html": html.encode("utf-8"),
                    "text": text,
                    "lang": lang,
                    # the generator's raw link plan (a-tag hrefs in document
                    # order; the canonical <link> is always `url` itself) —
                    # input data for SQL oracles, ignored by the engine
                    "a_hrefs": a_hrefs,
                }
            )
            idx += 1

    if dust_sessions:
        # alias page rows: same body (html/text/lang/link plan) as the
        # canonical page, served under the ?sid URL — the content evidence
        # the miner needs. No rng consumed (byte-parity when 0).
        by_url = {p["url"]: p for p in pages}
        for host in hosts[::3]:
            for a in dust_early.get(host, []) + dust_late.get(host, []):
                canon = by_url[a.split("?", 1)[0]]
                pages.append(
                    {**canon, "url": a, "warc_ts": BASE_TS + timedelta(seconds=idx * 7)}
                )
                idx += 1

    # seeds: roots of a subset of hosts + dup/trap variants that must dedupe
    seed_hosts = hosts[: max(3, n_hosts // 3)]
    seeds = []
    for i, h in enumerate(seed_hosts):
        root = f"https://{h}/"
        seeds.append({"url": root, "priority": 10, "depth": 0})
        if i % 3 == 0:
            seeds.append({"url": f"https://www.{h.upper()}/", "priority": 5, "depth": 0})
        if i % 4 == 0:
            seeds.append({"url": root + "?utm_source=twitter", "priority": 5, "depth": 0})
    # one deeper seed
    if host_urls[seed_hosts[0]][1:]:
        seeds.append({"url": host_urls[seed_hosts[0]][1], "priority": 0, "depth": 0})

    # robots: most hosts open; some partial disallows; a couple fully closed;
    # some of the restricted hosts publish Allow carve-outs (the
    # urllib-can_fetch longest-match path: Disallow:/ + Allow:/docs etc.)
    robots = []
    for i, h in enumerate(hosts):
        allow: list[str] = []
        if i % 17 == 5:
            dis = ["/"]
            if i % 2 == 1:
                allow = ["/docs"]  # otherwise-closed host carves docs open
        elif i % 5 == 2:
            dis = ["/tag", "/archive"]
            if i % 2 == 0:
                allow = ["/tag/topic-1"]  # one topic carved back in
        else:
            dis = []
        delay = 1.0
        if i % 7 == 3:
            delay = 0.5
        elif i % 11 == 4:
            delay = 5.0
        robots.append(
            {
                "host": h,
                "allow_prefixes": allow,
                "disallow_prefixes": dis,
                "crawl_delay": delay,
                "fetched_epoch": 0,
            }
        )

    return {"pages": pages, "seeds": seeds, "robots": robots}


def extract_host_of(url: str) -> str:
    return url.split("://", 1)[1].split("/", 1)[0]


def write_parquet(web: dict, out_dir: str) -> None:
    """Write pages/seeds/robots as parquet via pyarrow (no Spark needed)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    pages = web["pages"]
    pq.write_table(
        pa.table(
            {
                "url": [p["url"] for p in pages],
                "warc_ts": pa.array([p["warc_ts"] for p in pages], pa.timestamp("us", tz="UTC")),
                "html": pa.array([p["html"] for p in pages], pa.binary()),
                "text": [p["text"] for p in pages],
                "lang": [p["lang"] for p in pages],
            }
        ),
        f"{out_dir}/pages.parquet",
    )
    seeds = web["seeds"]
    pq.write_table(
        pa.table(
            {
                "url": [s["url"] for s in seeds],
                "priority": pa.array([s["priority"] for s in seeds], pa.int32()),
                "depth": pa.array([s["depth"] for s in seeds], pa.int32()),
            }
        ),
        f"{out_dir}/seeds.parquet",
    )
    robots = web["robots"]
    pq.write_table(
        pa.table(
            {
                "host": [r["host"] for r in robots],
                "allow_prefixes": pa.array(
                    [r["allow_prefixes"] for r in robots], pa.list_(pa.string())
                ),
                "disallow_prefixes": pa.array(
                    [r["disallow_prefixes"] for r in robots], pa.list_(pa.string())
                ),
                "crawl_delay": pa.array([r["crawl_delay"] for r in robots], pa.float64()),
                "fetched_epoch": pa.array([r["fetched_epoch"] for r in robots], pa.int32()),
            }
        ),
        f"{out_dir}/robots.parquet",
    )
