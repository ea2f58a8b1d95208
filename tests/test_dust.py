"""DUST rule mining (operators/dust.py): learned content-irrelevant URL
params from (url, content_hash) evidence — Bar-Yossef et al. WWW'07 shape."""

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.dust import mine_irrelevant_params


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, content_hash string")


def test_session_param_mined_irrelevant_page_relevant(spark):
    rows = []
    # page CHANGES content; sess does not. 3 alias groups per param.
    for item in (1, 2, 3):
        for page in (0, 1):
            for sess in ("a", "b"):
                rows.append(
                    (
                        f"https://s.ex.com/i/{item}?page={page}&sess={sess}",
                        f"hash-{item}-p{page}",
                    )
                )
    out = {
        r["param"]: r
        for r in mine_irrelevant_params(_pages(spark, rows), min_groups=3).collect()
    }
    assert out["sess"]["irrelevant"] is True
    # sess: 6 groups (item x page), all clean, one dup url saved per group
    assert out["sess"]["groups_multi"] == 6
    assert out["sess"]["clean_groups"] == 6
    assert out["sess"]["dup_urls_avoidable"] == 6
    # page: groups are hash-dirty -> relevant
    assert out["page"]["irrelevant"] is False
    assert out["page"]["clean_groups"] == 0


def test_min_support_gate(spark):
    # only 2 multi-valued groups -> below min_groups=3 -> not irrelevant
    rows = [
        ("https://s.ex.com/a?sid=1", "h-a"),
        ("https://s.ex.com/a?sid=2", "h-a"),
        ("https://s.ex.com/b?sid=1", "h-b"),
        ("https://s.ex.com/b?sid=2", "h-b"),
    ]
    out = mine_irrelevant_params(_pages(spark, rows), min_groups=3).collect()
    (row,) = out
    assert row["param"] == "sid"
    assert row["groups_multi"] == 2
    assert row["irrelevant"] is False


def test_other_params_partition_groups(spark):
    # sid clean only within matching 'page' context; a dirty group anywhere
    # on the host kills the verdict for that (host, param)
    rows = [
        ("https://s.ex.com/a?page=1&sid=1", "h1"),
        ("https://s.ex.com/a?page=1&sid=2", "h1"),
        ("https://s.ex.com/a?page=2&sid=1", "h2"),
        ("https://s.ex.com/a?page=2&sid=2", "h2"),
        ("https://s.ex.com/b?page=1&sid=1", "h3"),
        ("https://s.ex.com/b?page=1&sid=2", "DIFFERENT"),
    ]
    out = {
        r["param"]: r
        for r in mine_irrelevant_params(_pages(spark, rows), min_groups=3).collect()
    }
    assert out["sid"]["groups_multi"] == 3
    assert out["sid"]["clean_groups"] == 2
    assert out["sid"]["irrelevant"] is False


def test_no_query_string_urls_ignored(spark):
    rows = [("https://s.ex.com/plain", "h0"), ("https://s.ex.com/other", "h1")]
    assert mine_irrelevant_params(_pages(spark, rows)).count() == 0


def test_plan_has_no_python_and_no_join(spark):
    rows = [("https://s.ex.com/a?x=1&y=2", "h")]
    df = mine_irrelevant_params(_pages(spark, rows))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan  # two hash-aggs, zero joins


# ---------------------------------------------------------------------------
# in-loop wiring (CrawlConfig.mine_dust): rules learned from fetched evidence
# strip later aliases BEFORE the fetch


def _dust_web_dfs(spark, tmp_path_factory):
    from webcrawler_spark import synth

    web = synth.generate_web(seed=42, n_hosts=6, n_pages=60, dust_sessions=2)
    d = tmp_path_factory.mktemp("dustweb")
    synth.write_parquet(web, str(d))
    return (
        spark.read.parquet(f"{d}/pages.parquet"),
        spark.read.parquet(f"{d}/seeds.parquet"),
        spark.read.parquet(f"{d}/robots.parquet"),
    )


def test_mine_dust_skips_late_aliases_without_losing_content(
    spark, tmp_path_factory
):
    from webcrawler_spark.config import CrawlConfig
    from webcrawler_spark.plans import epoch as E
    from webcrawler_spark.storage.catalog import Catalog

    pages_df, seeds_df, robots_df = _dust_web_dfs(spark, tmp_path_factory)
    n_epochs = 4

    def run(tag, mine):
        # generous politeness budget so both crawls converge; the savings
        # metric is SCHEDULED fetch attempts (pages_fetched counts the
        # content-deduped web_content delta, which alias fetches never
        # enter by definition — they are duplicate bodies)
        cfg = CrawlConfig(epoch_seconds=60, hot_host_salt=2, mine_dust=mine,
                          dust_min_groups=2)
        root = tmp_path_factory.mktemp(tag)
        cat = Catalog(spark, str(root))
        counters = E.run_epochs(
            spark, cat, pages_df, seeds_df, robots_df, n_epochs, cfg
        )
        web = cat.read_delta_union("web_content", n_epochs - 1)
        hashes = {r["content_hash"] for r in web.select("content_hash").collect()}
        sched = cat.read_delta_union("schedule", n_epochs - 1)
        sched_urls = [r["url_norm"] for r in sched.select("url_norm").collect()]
        return counters, hashes, sched_urls

    c_off, h_off, s_off = run("dust_off", mine=False)
    c_on, h_on, s_on = run("dust_on", mine=True)

    # rules were learned (the ?affid evidence exists from epoch 1 on)
    assert any(c.get("dust_rule_hosts", 0) > 0 for c in c_on)
    # mining saves scheduled fetch attempts, all of them alias URLs
    assert len(s_on) < len(s_off)
    avoided = set(s_off) - set(s_on)
    assert avoided and all("affid" in u for u in avoided)
    # alias attempts specifically shrink
    assert (
        sum("affid" in u for u in s_on) < sum("affid" in u for u in s_off)
    )
    # no DISTINCT content was lost — only duplicate bodies were skipped
    assert h_off == h_on


def test_strip_params_by_rules_column(spark):
    from pyspark.sql import functions as F

    from webcrawler_spark.functions import columns as C

    df = spark.createDataFrame(
        [
            ("https://a.com/x?sid=1&page=2", ["sid"]),
            ("https://a.com/x?sid=1", ["sid"]),
            ("https://a.com/x?page=2", ["sid"]),
            ("https://a.com/x", ["sid"]),
            ("https://a.com/x?sid=1", []),
            ("https://a.com/x?sid=1", None),
        ],
        "url string, rules array<string>",
    )
    out = [
        r["out"]
        for r in df.select(
            C.strip_params_by_rules(F.col("url"), F.col("rules")).alias("out")
        ).collect()
    ]
    assert out == [
        "https://a.com/x?page=2",
        "https://a.com/x",
        "https://a.com/x?page=2",
        "https://a.com/x",
        "https://a.com/x?sid=1",
        "https://a.com/x?sid=1",
    ]


# ---------------------------------------------------------------------------
# derandomized fuzz: Spark implementations vs pure-Python references over a
# seeded random URL corpus (one Spark job per test, not per example)


def _py_strip(url, rules):
    rules = set(rules or [])
    if "?" not in url or not rules:
        return url
    base, qs = url.split("?", 1)
    kept = [p for p in qs.split("&") if p != "" and p.split("=", 1)[0] not in rules]
    return base + ("?" + "&".join(kept) if kept else "")


def test_strip_params_by_rules_fuzz_vs_python(spark):
    import random

    from pyspark.sql import functions as F

    from webcrawler_spark.functions import columns as C

    rng = random.Random(7)
    keys = ["a", "bb", "sid", "page", "x1", "ref", "q"]
    rows = []
    for i in range(400):
        nparams = rng.randrange(0, 5)
        params = [
            f"{rng.choice(keys)}={rng.randrange(10)}" if rng.random() < 0.9
            else rng.choice(keys)  # valueless param: name is the whole token
            for _ in range(nparams)
        ]
        url = f"https://h{rng.randrange(5)}.ex.com/p/{i}" + (
            "?" + "&".join(params) if params else ""
        )
        rules = sorted(rng.sample(keys, rng.randrange(0, 4)))
        rows.append((i, url, rules))
    df = spark.createDataFrame(rows, "i long, url string, rules array<string>")
    got = {
        r["i"]: r["out"]
        for r in df.select(
            "i", C.strip_params_by_rules(F.col("url"), F.col("rules")).alias("out")
        ).collect()
    }
    for i, url, rules in rows:
        assert got[i] == _py_strip(url, rules), (url, rules)


def _py_mine(pages, min_groups):
    """Brute-force reference for mine_irrelevant_params."""
    from collections import defaultdict
    from urllib.parse import urlsplit

    groups = defaultdict(lambda: (set(), set(), set()))  # values, hashes, urls
    for url, h in pages:
        sp = urlsplit(url)
        if not sp.query:
            continue
        params = [p for p in sp.query.split("&") if p != ""]
        for idx, p in enumerate(params):
            key = p.split("=", 1)[0]
            val = p.split("=", 1)[1] if "=" in p else None
            others = sorted(q for j, q in enumerate(params)
                            if q.split("=", 1)[0] != key)
            gk = (sp.hostname or "", key,
                  url.split("?", 1)[0] + "?" + "&".join(others))
            vs, hs, us = groups[gk]
            vs.add(val); hs.add(h); us.add(url)
    agg = defaultdict(lambda: [0, 0, 0])  # multi, clean, dup_urls
    for (host, key, _), (vs, hs, us) in groups.items():
        if len(vs) >= 2:
            agg[(host, key)][0] += 1
            if len(hs) == 1:
                agg[(host, key)][1] += 1
                agg[(host, key)][2] += len(us) - 1
    return {
        k: (m, c, d, m >= min_groups and c == m) for k, (m, c, d) in agg.items()
    }


def test_mine_irrelevant_params_fuzz_vs_python(spark):
    import random

    rng = random.Random(13)
    pages = []
    for i in range(600):
        host = f"h{rng.randrange(4)}.ex.com"
        path = f"/d/{rng.randrange(8)}"
        params = []
        if rng.random() < 0.8:
            params.append(f"page={rng.randrange(3)}")
        if rng.random() < 0.7:
            params.append(f"sess={rng.randrange(6)}")
        if rng.random() < 0.3:
            params.append(f"ref={rng.randrange(4)}")
        rng.shuffle(params)
        url = f"https://{host}{path}" + ("?" + "&".join(params) if params else "")
        page = next((p.split("=")[1] for p in params if p.startswith("page=")), "-")
        content_hash = f"hash-{host}-{path}-p{page}"  # sess/ref never matter
        pages.append((url, content_hash))
    pages = list(dict.fromkeys(pages))  # observed page set is distinct

    df = spark.createDataFrame(pages, "url string, content_hash string")
    got = {
        (r["host"], r["param"]): (
            r["groups_multi"], r["clean_groups"], r["dup_urls_avoidable"],
            r["irrelevant"],
        )
        for r in mine_irrelevant_params(df, min_groups=3).collect()
    }
    want = _py_mine(pages, min_groups=3)
    assert got == want
    # and the semantic ground truth holds: sess/ref always clean, page dirty
    for (host, param), (_, _, _, irrelevant) in got.items():
        if param in ("sess", "ref"):
            assert irrelevant or got[(host, param)][0] < 3
        if param == "page":
            assert not irrelevant
