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

Default-mode delta (documented, DELTAS #7): rules are plain path prefixes —
the ``*``/``$`` wildcard extensions are not expanded (urllib.robotparser
treats them literally too, so parity with the reference holds);
percent-encoding is preserved as-is. The opt-in RFC 9309 mode at the bottom
of this module (``parse_robots_rules`` / ``robots_table_rfc`` /
``rfc_robots_filter``) honors the wildcards with most-octets-wins
semantics for real-world robots files.

Parsing runs in a vectorized pandas UDF: robots.txt bodies are a per-host
dimension (one row per host, ~10^7 rows at web scale — a fraction of a
percent of the frontier), entirely off the per-URL hot path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

_RULE_FIELDS = ("allow", "disallow")


def _chosen_group(
    content: str, user_agent: str
) -> tuple[list[tuple[str, str]], float | None] | None:
    """urllib-parity state machine + group selection: the matched group's
    raw ``(field, value)`` rules in file order, plus its crawl-delay, or
    None when no group applies. Shared by the urllib-parity prefix mode
    (:func:`parse_robots_txt`) and the RFC 9309 wildcard mode
    (:func:`parse_robots_rules`)."""
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
        return None
    return chosen[1], chosen[2]


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
    chosen = _chosen_group(content, user_agent)
    if chosen is None:
        return [], [], None
    raw_rules, delay = chosen
    # urllib's RuleLine: an empty-value Disallow means "allow all" — it
    # becomes an allow rule with the universal prefix "". Empty Allow is the
    # same rule already.
    rules = [
        (v, f == "allow" or not v)  # (prefix, allowance)
        for f, v in raw_rules
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
    return allows, disallows, delay


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


# ---- RFC 9309 wildcard mode (opt-in; beyond urllib/reference parity) ----------
#
# urllib.robotparser (and therefore the reference's politeness gate) treats
# '*' and '$' in rule paths literally; real-world robots.txt relies on them
# (RFC 9309 §2.2.3, Google's parser). This mode implements the RFC
# semantics: '*' matches any octet sequence, a trailing '$' anchors the
# end, rules are prefix matches otherwise, the MOST OCTETS matching rule
# wins, allow wins length ties, no match => allowed. Group selection stays
# urllib's (first matching named group, else '*' group). Two-tier gate:
# hosts whose rules are wildcard-free use the native longest-prefix gate
# (columns.robots_allows — identical semantics for literal rules); only
# URLs of wildcard-bearing hosts cross into an Arrow UDF.

import re as _re
from functools import lru_cache


def parse_robots_rules(
    content: str | None, user_agent: str
) -> tuple[list[tuple[str, bool]], float | None]:
    """RFC-mode parse: the chosen group's rules as ordered
    (pattern, allowance) with wildcards preserved; empty-value rules are
    dropped (RFC: an empty Disallow is no rule)."""
    if not content:
        return [], None
    chosen = _chosen_group(content, user_agent)
    if chosen is None:
        return [], None
    raw_rules, delay = chosen
    return [(v, f == "allow") for f, v in raw_rules if v], delay


@lru_cache(maxsize=4096)
def rfc_rule_regex(pattern: str) -> "_re.Pattern[str]":
    """Translated, anchored regex for one RFC rule path."""
    end = pattern.endswith("$")
    core = pattern[:-1] if end else pattern
    body = "".join(".*" if ch == "*" else _re.escape(ch) for ch in core)
    return _re.compile("^" + body + ("$" if end else ""))


def rfc_allowed(path: str, rules: list[tuple[str, bool]]) -> bool:
    """RFC 9309 most-octets match over (pattern, allowance) rules; allow
    wins length ties; no matching rule => allowed."""
    best_len = -1
    best_allow = True
    for pattern, allow in rules:
        if rfc_rule_regex(pattern).match(path):
            n = len(pattern)
            if n > best_len:
                best_len, best_allow = n, allow
            elif n == best_len and allow:
                best_allow = True
    return best_allow


def robots_table_rfc(raw: DataFrame, user_agent: str = "WebCrawler") -> DataFrame:
    """(host, robots_txt) -> RFC-mode robots dimension:
    (host, rules ARRAY<STRUCT<pattern,allow>>, crawl_delay, has_wildcard,
    allow_prefixes, disallow_prefixes). The prefix arrays are valid ONLY
    for wildcard-free hosts (the native fast path); wildcard hosts carry
    has_wildcard=true and route through the UDF gate."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    rule_t = StructType(
        [StructField("pattern", StringType()), StructField("allow", BooleanType())]
    )
    schema = StructType(
        [
            StructField("rules", ArrayType(rule_t)),
            StructField("crawl_delay", DoubleType()),
            StructField("has_wildcard", BooleanType()),
        ]
    )

    @pandas_udf(schema)
    def _parse(content: pd.Series) -> pd.DataFrame:
        parsed = [parse_robots_rules(c, user_agent) for c in content]
        return pd.DataFrame(
            {
                "rules": [
                    [{"pattern": p, "allow": a} for p, a in rules]
                    for rules, _ in parsed
                ],
                "crawl_delay": [d for _, d in parsed],
                "has_wildcard": [
                    any("*" in p or p.endswith("$") for p, _ in rules)
                    for rules, _ in parsed
                ],
            }
        )

    out = raw.select("host", _parse(F.col("robots_txt")).alias("_r")).select(
        "host",
        F.col("_r.rules").alias("rules"),
        F.col("_r.crawl_delay").alias("crawl_delay"),
        F.col("_r.has_wildcard").alias("has_wildcard"),
    )
    # literal-rule prefix arrays for the native fast path
    return out.withColumn(
        "allow_prefixes",
        F.transform(
            F.filter(F.col("rules"), lambda r: r["allow"]), lambda r: r["pattern"]
        ),
    ).withColumn(
        "disallow_prefixes",
        F.transform(
            F.filter(F.col("rules"), lambda r: ~r["allow"]), lambda r: r["pattern"]
        ),
    )


def rfc_robots_filter(
    df: DataFrame, robots_rfc: DataFrame, path_col: str = "path"
) -> DataFrame:
    """Two-tier RFC gate: adds ``robots_ok`` to ``df`` (which carries
    ``host`` + ``path_col``). Wildcard-free hosts evaluate in the native
    longest-prefix gate (whole-stage codegen, identical semantics for
    literal rules); URLs of wildcard-bearing hosts — the rare tier — cross
    into a vectorized Arrow UDF running :func:`rfc_allowed` with
    lru-cached compiled patterns. Hosts with no robots row are allowed."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType

    from .columns import robots_allows

    @pandas_udf(BooleanType())
    def _gate(path: pd.Series, rules: pd.Series) -> pd.Series:
        return pd.Series(
            [
                rfc_allowed(
                    p or "",
                    [(r["pattern"], r["allow"]) for r in (rs if rs is not None else [])],
                )
                for p, rs in zip(path, rules)
            ]
        )

    joined = df.join(F.broadcast(robots_rfc), "host", "left")
    out_cols = [*df.columns, "robots_ok"]
    # real split, not a CASE: Spark evaluates an Arrow UDF appearing in any
    # CASE branch for EVERY row — a filter+union keeps wildcard-free rows
    # (the vast majority) entirely JVM-side
    native_side = joined.filter(
        F.col("rules").isNull() | (F.col("has_wildcard") == F.lit(False))
    ).withColumn(
        "robots_ok",
        F.when(F.col("rules").isNull(), F.lit(True)).otherwise(
            robots_allows(
                F.col("disallow_prefixes"), F.col(path_col), F.col("allow_prefixes")
            )
        ),
    )
    udf_side = joined.filter(F.col("has_wildcard") == F.lit(True)).withColumn(
        "robots_ok", _gate(F.col(path_col), F.col("rules"))
    )
    return native_side.select(*out_cols).unionByName(udf_side.select(*out_cols))
