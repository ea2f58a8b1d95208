"""robots.txt parsing: raw fetched content -> the robots dimension table.

The reference fetches robots.txt per domain, caches it, and gates URLs with
``urllib.robotparser.RobotFileParser.can_fetch`` (url-scheduler/
politeness_manager.py:99-149; crude cached path :92-95; fetch failure =>
allowed :140-149). Our epoch job consumes a pre-parsed dimension table
(host, allow_prefixes ARRAY<STRING>, disallow_prefixes ARRAY<STRING>,
crawl_delay DOUBLE) joined broadcast
against the schedule (SURVEY S11/P5). This module is the missing step
between the two: parse the fetched robots.txt bodies into that table.

Group selection follows RFC 9309 / urllib.robotparser semantics:

- lines are ``field: value`` with ``#`` comments stripped;
- consecutive ``User-agent`` lines open a group; ``Allow``/``Disallow``/
  ``Crawl-delay`` lines attach to the open group (a rule line closes the
  agent-accumulation state);
- the group for our agent is the first whose agent token is a substring
  match for the agent's product token (urllib lowercases both and matches
  ``agent_token in useragent`` after splitting at '/'), else the ``*`` group;
- empty/missing content or no matching group => no restrictions (allowed),
  matching the reference's fetch-failure behavior.

``Allow`` carve-outs (``Disallow: /`` + ``Allow: /public/``) are honored
with full urllib parity. urllib's ``Entry.allowance`` is FIRST-match-wins in
file order over the interleaved Allow/Disallow rules; an order-free
(allow_prefixes, disallow_prefixes) pair cannot express that directly, but
for plain prefix rules it becomes expressible after a parse-time pruning:
drop every rule shadowed by an EARLIER rule whose prefix is a prefix of it
(such a rule can never be the first match for any path). In the pruned set,
any two rules whose prefixes are nested have the longer one earlier, so
first-match-wins ≡ longest-match-wins — which the native gate
(columns.robots_allows) evaluates order-free from the two arrays. Empty-path
rules (``Disallow:`` = allow-all, per urllib's RuleLine) become the ""
prefix, which matches every path at length 0.

v1 delta (documented): rules are plain path prefixes — the ``*``/``$``
wildcard extensions are not expanded (urllib.robotparser treats them
literally too, so parity with the reference holds); percent-encoding is
preserved as-is.

Parsing runs in a vectorized pandas UDF: robots.txt bodies are a per-host
dimension (one row per host, ~10^7 rows at web scale — a fraction of a
percent of the frontier), entirely off the per-URL hot path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

_RULE_FIELDS = ("allow", "disallow")


def parse_robots_txt(
    content: str | None, user_agent: str
) -> tuple[list[str], list[str], float | None]:
    """Parse one robots.txt body for ``user_agent``. Returns
    (allow_prefixes, disallow_prefixes, crawl_delay). Empty lists =>
    everything allowed. Mirrors urllib.robotparser's group selection AND its
    first-match-wins rule ordering (via shadow pruning — see module
    docstring) so the native longest-match gate agrees with the reference's
    can_fetch on prefix rules, Allow carve-outs included."""
    if not content:
        return [], [], None
    # urllib matches on the product token: "MyBot/1.0" -> "mybot"
    agent_token = user_agent.split("/")[0].lower()

    # urllib.robotparser's exact state machine: 0 = start of group,
    # 1 = inside a user-agent run, 2 = inside the rule block. A blank line
    # terminates a group (rules after it with no new User-agent are DROPPED,
    # as urllib does); a User-agent line after rules opens a new group.
    groups: list[tuple[list[str], list[tuple[str, str]], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, str]] = []
    cur_delay: float | None = None
    state = 0

    def _flush() -> None:
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    def _discard() -> None:
        nonlocal cur_agents, cur_rules, cur_delay
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in content.splitlines():
        # urllib checks emptiness BEFORE comment/whitespace stripping: only a
        # truly empty line terminates a group (state 2 flushes, a rule-less
        # agent run in state 1 is discarded); whitespace- or comment-only
        # lines are no-ops
        if not raw:
            if state == 1:
                _discard()
            elif state == 2:
                _flush()
            state = 0
            continue
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if state == 2:
                _flush()
            cur_agents.append(value.lower())
            state = 1
        elif field in _RULE_FIELDS:
            if state != 0:
                cur_rules.append((field, value))
                state = 2
        elif field == "crawl-delay":
            if state != 0:
                try:
                    cur_delay = float(value)
                except ValueError:
                    pass
                state = 2
    # urllib's end-of-input: only a group that reached the rule block is
    # kept; a trailing rule-less User-agent run is dropped
    if state == 2:
        _flush()

    # urllib's _add_entry bookkeeping: a group containing '*' only ever
    # becomes default_entry (the first one; LATER '*'-groups are dropped
    # entirely); all other groups go to `entries`, consulted in order before
    # the default. Entry.applies_to: the group's agent string (lowercased)
    # must be a substring of our product token.
    default_entry = None
    entries = []
    for g in groups:
        if "*" in g[0]:
            if default_entry is None:
                default_entry = g
        else:
            entries.append(g)

    def _applies(agents: list[str]) -> bool:
        return any(a in agent_token for a in agents)

    chosen = next((g for g in entries if _applies(g[0])), None) or default_entry
    if chosen is None:
        return [], [], None
    # urllib's RuleLine: an empty-value Disallow means "allow all" — it
    # becomes an allow rule with the universal prefix "". Empty Allow is the
    # same rule already.
    rules = [
        (v, f == "allow" or not v)  # (prefix, allowance)
        for f, v in chosen[1]
    ]
    # Shadow pruning (first-match-wins -> longest-match-wins): a rule whose
    # prefix extends an EARLIER rule's prefix can never be the first match.
    kept: list[tuple[str, bool]] = []
    for prefix, allowance in rules:
        if any(prefix.startswith(p) for p, _ in kept):
            continue
        kept.append((prefix, allowance))
    allows = [p for p, a in kept if a]
    disallows = [p for p, a in kept if not a]
    return allows, disallows, chosen[2]


def parse_sitemaps(content: str | None) -> list[str]:
    """``Sitemap:`` directives of one robots.txt body, urllib-parity.

    urllib.robotparser collects sitemap lines GLOBALLY — outside the group
    state machine entirely (any line whose field is ``sitemap``, in any
    group or none, even before the first User-agent) — with the value
    percent-unquoted and the ``#`` comment tail stripped. ``site_maps()``
    returns None when none were seen; we return [] (the DataFrame-friendly
    spelling of the same thing)."""
    from urllib.parse import unquote

    if not content:
        return []
    out: list[str] = []
    for raw in content.splitlines():
        line = raw.split("#", 1)[0]
        field, sep, value = line.partition(":")
        if sep and field.strip().lower() == "sitemap":
            # urllib appends the unquoted value unconditionally — even an
            # empty one ("Sitemap:" with no URL); exact parity kept
            out.append(unquote(value.strip()))
    return out


def robots_table(raw: DataFrame, user_agent: str = "WebCrawler") -> DataFrame:
    """(host, robots_txt) -> the robots dimension table consumed by
    scheduler.schedule_epoch: (host, allow_prefixes, disallow_prefixes,
    crawl_delay, sitemaps). Hosts whose robots.txt failed to fetch (null
    body) get no restrictions, matching the reference
    (politeness_manager.py:140-149)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, DoubleType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("allow_prefixes", ArrayType(StringType())),
            StructField("disallow_prefixes", ArrayType(StringType())),
            StructField("crawl_delay", DoubleType()),
            StructField("sitemaps", ArrayType(StringType())),
        ]
    )

    @pandas_udf(schema)
    def _parse(content: pd.Series) -> pd.DataFrame:
        parsed = [parse_robots_txt(c, user_agent) for c in content]
        return pd.DataFrame(
            {
                "allow_prefixes": [p[0] for p in parsed],
                "disallow_prefixes": [p[1] for p in parsed],
                "crawl_delay": [p[2] for p in parsed],
                "sitemaps": [parse_sitemaps(c) for c in content],
            }
        )

    return raw.select(
        "host",
        _parse(F.col("robots_txt")).alias("_r"),
    ).select(
        "host",
        F.col("_r.allow_prefixes").alias("allow_prefixes"),
        F.col("_r.disallow_prefixes").alias("disallow_prefixes"),
        F.col("_r.crawl_delay").alias("crawl_delay"),
        F.col("_r.sitemaps").alias("sitemaps"),
    )


def sitemap_seeds(robots: DataFrame) -> DataFrame:
    """Distinct (host, sitemap_url) seed candidates from the parsed robots
    dimension — the crawl bootstraps a host's URL inventory from its
    declared sitemaps instead of link discovery alone. Dimension-scale
    (rows ~ hosts), one explode, no shuffle beyond the distinct."""
    from pyspark.sql import functions as F

    return (
        robots.select("host", F.explode("sitemaps").alias("sitemap_url"))
        .filter(F.col("sitemap_url") != "")  # urllib keeps empty values; seeds drop them
        .distinct()
    )
