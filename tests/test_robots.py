"""robots.txt parsing (functions/robots.py) — parity with the reference's
authoritative path, urllib.robotparser.RobotFileParser.can_fetch
(politeness_manager.py:120-125), on prefix-style rules INCLUDING Allow
carve-outs, plus the dimension table feeding the native longest-match gate
(columns.robots_allows)."""

import urllib.robotparser

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.functions.robots import parse_robots_txt, robots_table

UA = "WebCrawler/1.0"

ROBOTS_BODIES = {
    "simple": "User-agent: *\nDisallow: /private/\nDisallow: /tmp/\n",
    "named_group": (
        "User-agent: webcrawler\nDisallow: /only-for-us/\nCrawl-delay: 2.5\n"
        "\nUser-agent: *\nDisallow: /for-everyone/\n"
    ),
    "star_only_delay": "User-agent: *\nCrawl-delay: 7\nDisallow: /x/\n",
    "other_bot": "User-agent: googlebot\nDisallow: /\n",
    "comments_and_case": (
        "# banner comment\nUSER-AGENT: *  # inline\nDISALLOW: /a/ # tail\n\nDisallow: /b/\n"
    ),
    "empty_disallow_allows_all": "User-agent: *\nDisallow:\n",
    "disallow_root": "User-agent: *\nDisallow: /\n",
    "multi_agent_run": "User-agent: botA\nUser-agent: webcrawler\nDisallow: /shared/\n",
    "no_groups": "Sitemap: https://example.com/sitemap.xml\n",
    # a group listing BOTH '*' and our agent becomes urllib's default_entry,
    # so the later pure-named group must win
    "mixed_star_named": (
        "User-agent: *\nUser-agent: webcrawler\nDisallow: /a/\n"
        "\nUser-agent: webcrawler\nDisallow: /b/\n"
    ),
    # second '*'-group goes to entries (default already taken) and matches
    # any agent before the default is consulted
    "two_star_groups": (
        "User-agent: *\nDisallow: /a/\n\nUser-agent: *\nDisallow: /b/\n"
    ),
    # ---- Allow carve-outs (the reference hits these constantly in the wild)
    "closed_with_public": "User-agent: *\nAllow: /public/\nDisallow: /\n",
    # urllib is FIRST-match-wins: the Disallow shadows the later Allow
    "allow_after_disallow": "User-agent: *\nDisallow: /a/\nAllow: /a/b/\n",
    # ...but an earlier, longer Allow carves out of the later Disallow
    "allow_before_disallow": "User-agent: *\nAllow: /a/b/\nDisallow: /a/\n",
    "interleaved": (
        "User-agent: *\nAllow: /private/keep/\nDisallow: /private/\n"
        "Allow: /tmp/ok\nDisallow: /tmp/\nDisallow: /x\nAllow: /x/y\n"
    ),
    "empty_allow": "User-agent: *\nAllow:\nDisallow: /a/\n",
}

PATHS = ["/", "/private/x", "/private/keep/x", "/tmp/", "/tmp/ok/z",
         "/public/page", "/only-for-us/a", "/for-everyone/b", "/x/y",
         "/a/1", "/a/b/2", "/b/2", "/shared/doc"]


def _urllib_allows(body: str, path: str) -> bool:
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(body.splitlines())
    return rp.can_fetch(UA, f"https://example.com{path}")


def _gate(allows, disallows, path) -> bool:
    """Python mirror of columns.robots_allows: longest-match-wins over the
    parse-time-pruned prefix sets (oracle._robots_allowed uses the same)."""
    best_dis = max((len(p) for p in disallows if path.startswith(p)), default=-1)
    best_allow = max((len(p) for p in allows if path.startswith(p)), default=-1)
    return best_dis <= best_allow


@pytest.mark.parametrize("name", sorted(ROBOTS_BODIES))
def test_parity_with_urllib_robotparser(name):
    body = ROBOTS_BODIES[name]
    allows, disallows, _ = parse_robots_txt(body, UA)
    for path in PATHS:
        ours = _gate(allows, disallows, path)
        assert ours == _urllib_allows(body, path), (name, path, allows, disallows)


def test_crawl_delay_selection():
    _, _, delay = parse_robots_txt(ROBOTS_BODIES["named_group"], UA)
    assert delay == 2.5  # the named group wins over the * group
    _, _, delay = parse_robots_txt(ROBOTS_BODIES["star_only_delay"], UA)
    assert delay == 7.0
    _, _, delay = parse_robots_txt(ROBOTS_BODIES["other_bot"], UA)
    assert delay is None  # no matching group -> unrestricted


def test_missing_or_empty_content_allows_all():
    # fetch failure => allowed (politeness_manager.py:140-149)
    assert parse_robots_txt(None, UA) == ([], [], None)
    assert parse_robots_txt("", UA) == ([], [], None)
    assert parse_robots_txt(ROBOTS_BODIES["no_groups"], UA) == ([], [], None)


def test_shadow_pruning():
    """First-match-wins collapses to longest-match only because shadowed
    rules are pruned: a rule whose prefix extends an earlier rule's prefix
    can never fire."""
    allows, disallows, _ = parse_robots_txt(
        ROBOTS_BODIES["allow_after_disallow"], UA
    )
    assert disallows == ["/a/"] and allows == []  # later Allow /a/b/ pruned
    allows, disallows, _ = parse_robots_txt(
        ROBOTS_BODIES["allow_before_disallow"], UA
    )
    assert allows == ["/a/b/"] and disallows == ["/a/"]  # both live


def test_robots_table_feeds_scheduler_gate(spark):
    raw = spark.createDataFrame(
        [
            ("a.com", ROBOTS_BODIES["simple"]),
            ("b.com", ROBOTS_BODIES["named_group"]),
            ("c.com", None),
            ("d.com", ROBOTS_BODIES["closed_with_public"]),
        ],
        "host string, robots_txt string",
    )
    dim = robots_table(raw, UA)
    rows = {r["host"]: r for r in dim.collect()}
    assert rows["a.com"]["disallow_prefixes"] == ["/private/", "/tmp/"]
    assert rows["a.com"]["crawl_delay"] is None
    assert rows["b.com"]["disallow_prefixes"] == ["/only-for-us/"]
    assert rows["b.com"]["crawl_delay"] == 2.5
    assert rows["c.com"]["disallow_prefixes"] == []
    assert rows["d.com"]["allow_prefixes"] == ["/public/"]
    assert rows["d.com"]["disallow_prefixes"] == ["/"]

    # plumb through the native P5 gate used by schedule_epoch
    from webcrawler_spark.functions import columns as C

    urls = spark.createDataFrame(
        [("a.com", "/private/x"), ("a.com", "/ok"), ("b.com", "/only-for-us/a"),
         ("d.com", "/public/page"), ("d.com", "/secret")],
        "host string, path string",
    )
    gated = (
        urls.join(F.broadcast(dim), "host", "left")
        .withColumn(
            "allowed",
            C.robots_allows(
                F.col("disallow_prefixes"), F.col("path"), F.col("allow_prefixes")
            ),
        )
    )
    got = {(r["host"], r["path"]): r["allowed"] for r in gated.collect()}
    assert got == {
        ("a.com", "/private/x"): False,
        ("a.com", "/ok"): True,
        ("b.com", "/only-for-us/a"): False,
        ("d.com", "/public/page"): True,   # Allow carve-out of Disallow: /
        ("d.com", "/secret"): False,
    }


# ---- property fuzz vs urllib.robotparser ----------------------------------------


def test_hypothesis_fuzz_vs_urllib():
    """Generated robots.txt files (agent runs, rules, delays, comments, blank
    lines, junk) must agree EXACTLY with urllib.robotparser.can_fetch on
    prefix-rule allowance for every generated path — two-sided parity, Allow
    carve-outs included. Deterministic (fixed seed/derandomize) so CI never
    flakes on example search."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    agents = st.sampled_from(["*", "webcrawler", "googlebot", "other-bot", "WebCrawler"])
    paths = st.sampled_from(
        ["/", "/a/", "/a/b", "/priv/", "/pub/x", "/tmp", "/x%20y", ""]
    )
    lines = st.lists(
        st.one_of(
            agents.map(lambda a: f"User-agent: {a}"),
            paths.map(lambda p: f"Disallow: {p}"),
            paths.map(lambda p: f"Allow: {p}"),
            st.integers(0, 99).map(lambda d: f"Crawl-delay: {d}"),
            st.sampled_from(["", "   ", "# comment", "junk line without colon",
                             "Sitemap: https://e.com/s.xml"]),
        ),
        min_size=0, max_size=25,
    )

    @settings(max_examples=300, deadline=None, derandomize=True,
              suppress_health_check=[HealthCheck.too_slow])
    @given(lines=lines)
    def _check(lines):
        body = "\n".join(lines)
        allows, disallows, _ = parse_robots_txt(body, UA)
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(body.splitlines())
        for path in ["/", "/a/b", "/priv/x", "/pub/x", "/tmp", "/zzz"]:
            ours = _gate(allows, disallows, path)
            theirs = rp.can_fetch(UA, f"https://example.com{path}")
            assert ours == theirs, (body, path, allows, disallows)
        # sitemap collection parity (site_maps() is None when empty)
        from webcrawler_spark.functions.robots import parse_sitemaps

        assert parse_sitemaps(body) == (rp.site_maps() or []), body

    _check()


def test_sitemap_parity_with_urllib():
    """Sitemap: lines are collected globally (any group or none), comment
    tails stripped, values percent-unquoted — exactly site_maps()."""
    from webcrawler_spark.functions.robots import parse_sitemaps

    body = "\n".join(
        [
            "Sitemap: https://e.com/before-any-group.xml",
            "User-agent: webcrawler",
            "Disallow: /x/",
            "Sitemap: https://e.com/in%20group.xml  # trailing comment",
            "",
            "User-agent: *",
            "sitemap: https://e.com/lowercase-field.xml",
            "Sitemap:",  # empty value KEPT — urllib appends it
            "# Sitemap: https://e.com/commented-out.xml",
        ]
    )
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(body.splitlines())
    assert parse_sitemaps(body) == rp.site_maps()
    assert parse_sitemaps(None) == [] and parse_sitemaps("") == []
    assert "https://e.com/in group.xml" in parse_sitemaps(body)


def test_sitemap_seeds_operator(spark):
    from webcrawler_spark.functions.robots import robots_table, sitemap_seeds

    raw = spark.createDataFrame(
        [
            ("a.com", "Sitemap: https://a.com/s1.xml\nSitemap: https://a.com/s2.xml\nUser-agent: *\nDisallow: /p/"),
            ("b.com", "User-agent: *\nAllow: /"),
            ("c.com", None),
        ],
        "host string, robots_txt string",
    )
    tbl = robots_table(raw, "WebCrawler/1.0")
    got = {(r["host"], r["sitemap_url"]) for r in sitemap_seeds(tbl).collect()}
    assert got == {("a.com", "https://a.com/s1.xml"), ("a.com", "https://a.com/s2.xml")}


# ---- RFC 9309 wildcard mode ----------------------------------------------------


def test_rfc_allowed_most_octets_semantics():
    from webcrawler_spark.functions.robots import rfc_allowed

    # longest (most octets) rule wins
    assert rfc_allowed("/page", [("/p", True), ("/", False)])
    assert not rfc_allowed("/else", [("/p", True), ("/", False)])
    # allow wins exact length ties
    assert rfc_allowed("/folder/x", [("/folder", False), ("/folder", True)])
    # wildcard rule outranks a shorter literal
    assert not rfc_allowed("/page.htm", [("/page", True), ("/*.htm", False)])
    # $ anchors the end
    assert not rfc_allowed("/index.php", [("/*.php$", False)])
    assert rfc_allowed("/index.php5", [("/*.php$", False)])
    assert rfc_allowed("/index.php?x=1", [("/*.php$", False)])
    # * mid-rule
    assert not rfc_allowed("/fishing/rods", [("/fish*", False)])
    assert not rfc_allowed("/a/b/c/secret.html", [("/a/*/secret*", False)])
    assert rfc_allowed("/a/secret.html", [("/a/*/secret*", False)])
    # no rules / no match => allowed
    assert rfc_allowed("/anything", [])
    assert rfc_allowed("/other", [("/priv/", False)])


def test_parse_robots_rules_preserves_wildcards():
    from webcrawler_spark.functions.robots import parse_robots_rules

    body = "\n".join(
        [
            "User-agent: webcrawler",
            "Disallow: /*.gif$",
            "Allow: /pub*",
            "Disallow:",  # empty => dropped in RFC mode
            "Crawl-delay: 4",
        ]
    )
    rules, delay = parse_robots_rules(body, "WebCrawler/1.0")
    assert rules == [("/*.gif$", False), ("/pub*", True)]
    assert delay == 4.0
    assert parse_robots_rules(None, "x") == ([], None)


def test_rfc_robots_filter_two_tier(spark):
    from webcrawler_spark.functions.robots import (
        rfc_allowed,
        parse_robots_rules,
        robots_table_rfc,
        rfc_robots_filter,
    )

    bodies = {
        "wild.com": "User-agent: *\nDisallow: /*.php$\nAllow: /shop\nDisallow: /shop/private*",
        "plain.com": "User-agent: *\nDisallow: /priv/\nAllow: /priv/ok",
        "none.com": None,
    }
    raw = spark.createDataFrame(
        list(bodies.items()), "host string, robots_txt string"
    )
    robots = robots_table_rfc(raw, "WebCrawler/1.0")
    # the wildcard flag routes hosts correctly
    flags = {r["host"]: r["has_wildcard"] for r in robots.collect()}
    assert flags == {"wild.com": True, "plain.com": False, "none.com": False}

    paths = [
        "/x.php", "/x.php5", "/shop/item.php", "/shop/private/x", "/shop/a",
        "/priv/", "/priv/ok/x", "/priv/no", "/free",
    ]
    urls = [(h, p) for h in bodies for p in paths]
    df = spark.createDataFrame(urls, "host string, path string")
    got = {
        (r["host"], r["path"]): r["robots_ok"]
        for r in rfc_robots_filter(df, robots).collect()
    }
    for h, p in urls:
        rules, _ = parse_robots_rules(bodies[h], "WebCrawler/1.0")
        assert got[(h, p)] == rfc_allowed(p, rules), (h, p)
    # spot semantics: .php anchored, shop carve-out, private override
    assert not got[("wild.com", "/x.php")]
    assert got[("wild.com", "/x.php5")]
    assert not got[("wild.com", "/shop/item.php")]
    assert not got[("wild.com", "/shop/private/x")]
    assert got[("wild.com", "/shop/a")]
    assert got[("plain.com", "/priv/ok/x")]
    assert not got[("plain.com", "/priv/no")]
    assert all(got[("none.com", p)] for p in paths)
