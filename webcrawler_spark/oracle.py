"""Pure-Python crawl oracle — Spark-free replay of the epoch semantics.

The north rule requires matching the reference's crawl ordering and final
URL-seen set under the same seed list + politeness budget. The reference
itself is nondeterministic (Kafka interleaving, wall clocks, uuids), so per
SURVEY §4 we totalize its semantics: this oracle implements the *same
deterministic semantics* as plans/epoch.py using only the shared pure-Python
cores (urlnorm, htmllib) and plain dicts. Tests diff, per epoch:

- the fetch-schedule order (host, rank_in_host, url_norm),
- the seen set,
- the deferred set and counters.

Any divergence is a bug in one of the two implementations.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .config import CrawlConfig, DEFAULT_CONFIG
from .functions.htmllib import extract_links
from .functions.urlnorm import normalize_url, url_priority
from urllib.parse import urlparse


@dataclass
class OracleState:
    seen: set = field(default_factory=set)  # url_norm
    frontier: dict = field(default_factory=dict)  # url_norm -> row dict
    deferred: list = field(default_factory=list)
    host_stats: dict = field(default_factory=dict)  # host -> stats dict
    discovered: list = field(default_factory=list)  # candidates for next epoch
    schedules: list = field(default_factory=list)  # per-epoch ordered schedules
    counters: list = field(default_factory=list)


def _canon_host_path(url_norm: str) -> tuple[str, str]:
    p = urlparse(url_norm)
    return p.netloc, p.path


def _robots_allowed(rb: dict, path: str) -> bool:
    """Longest-match over the pruned allow/disallow prefix sets — same rule
    as columns.robots_allows (urllib can_fetch parity; see functions/robots).
    With no allow prefixes this reduces to 'no disallow prefix matches'."""
    best_dis = max(
        (len(p) for p in (rb.get("disallow_prefixes") or []) if path.startswith(p)),
        default=-1,
    )
    best_allow = max(
        (len(p) for p in (rb.get("allow_prefixes") or []) if path.startswith(p)),
        default=-1,
    )
    return best_dis <= best_allow


def run_oracle(
    pages: list[dict],
    seeds: list[dict],
    robots: list[dict],
    n_epochs: int,
    cfg: CrawlConfig = DEFAULT_CONFIG,
) -> OracleState:
    pages_by_norm = {}
    for p in pages:
        n = normalize_url(p["url"])
        if n is not None:
            pages_by_norm[n] = p
    robots_by_host = {r["host"]: r for r in robots}
    rate_cap = cfg.max_requests_per_minute * cfg.epoch_seconds // 60

    st = OracleState()

    for epoch in range(n_epochs):
        # ---- 1. candidates
        if epoch == 0:
            candidates = [
                {
                    "url": s["url"],
                    "source_url": None,
                    "depth": int(s["depth"]),
                    "source_priority": int(s["priority"]),
                }
                for s in seeds
            ]
        else:
            candidates = st.discovered
        st.discovered = []

        # ---- 2. canonicalize + within-batch merge (mirrors ingest_candidates)
        merged: dict[str, dict] = {}
        for c in candidates:
            n = normalize_url(c["url"])
            if n is None:
                continue
            host, path = _canon_host_path(n)
            row = merged.get(n)
            if row is None:
                merged[n] = {
                    "url_norm": n,
                    "host": host,
                    "path": path,
                    "url": c["url"],
                    "depth": c["depth"],
                    "source_priority": c["source_priority"],
                    "source_url": c["source_url"],
                }
            else:
                row["url"] = min(row["url"], c["url"])
                row["depth"] = min(row["depth"], c["depth"])
                row["source_priority"] = max(row["source_priority"], c["source_priority"])
                srcs = [s for s in (row["source_url"], c["source_url"]) if s is not None]
                row["source_url"] = min(srcs) if srcs else None

        new_rows = []
        for n, row in merged.items():
            if n in st.seen:
                continue
            st.seen.add(n)
            row["priority"] = url_priority(n, row["depth"], row["source_priority"])
            row["status"] = "pending"
            row["discovered_epoch"] = epoch
            row["attempts"] = 0
            st.frontier[n] = row
            new_rows.append(row)

        # ---- 3. pending pool = fresh pending ∪ ready deferred
        pending = [r for r in st.frontier.values() if r["status"] == "pending"]
        still_deferred = []
        for d in st.deferred:
            if d["ready_epoch"] <= epoch:
                pending.append(d)
            else:
                still_deferred.append(d)
        st.deferred = still_deferred

        # ---- 4. schedule under politeness budget (mirrors schedule_epoch)
        schedule = []
        new_deferrals = []
        rejected = []
        by_host: dict[str, list] = {}
        for r in pending:
            if r["attempts"] > cfg.max_attempts:
                rejected.append((r, "max_attempts"))
                continue
            rb = robots_by_host.get(r["host"])
            if rb is not None and not _robots_allowed(rb, r["path"]):
                rejected.append((r, "robots_disallowed"))
                continue
            by_host.setdefault(r["host"], []).append(r)

        for host in by_host:
            hs = st.host_stats.get(host)
            rb = robots_by_host.get(host)
            if hs is not None:
                delay = hs["crawl_delay"]
            elif rb is not None:
                delay = rb["crawl_delay"]
            else:
                delay = cfg.default_crawl_delay
            budget = min(int(float(cfg.epoch_seconds) // delay), int(rate_cap))
            rows = sorted(
                by_host[host],
                key=lambda r: (-r["priority"], r["discovered_epoch"], r["url_norm"]),
            )
            for i, r in enumerate(rows, start=1):
                if i <= budget:
                    schedule.append(
                        {**r, "rank_in_host": i, "epoch": epoch}
                    )
                else:
                    new_deferrals.append(
                        {
                            **r,
                            "ready_epoch": epoch + 1,
                            "reason": "politeness_budget",
                            "attempts": r["attempts"] + 1,
                        }
                    )

        # ---- 5. fetch = dict lookup; status transitions
        fetch_results = []
        for r in schedule:
            page = pages_by_norm.get(r["url_norm"])
            frow = st.frontier.get(r["url_norm"])
            if page is not None:
                if frow:
                    frow["status"] = "fetched"
                fetch_results.append((r["host"], True, len(page["html"]) / 1e6))
            else:
                if frow:
                    frow["status"] = "failed"
                fetch_results.append((r["host"], False, 0.0))
        for d in new_deferrals:
            frow = st.frontier.get(d["url_norm"])
            if frow:
                frow["status"] = "deferred"
        for r, reason in rejected:
            frow = st.frontier.get(r["url_norm"])
            if frow:
                frow["status"] = "rejected"
        st.deferred.extend(new_deferrals)

        # ---- 6. link discovery from fetched pages
        link_pairs = set()
        n_links = 0
        for r in schedule:
            page = pages_by_norm.get(r["url_norm"])
            if page is None:
                continue
            html = page["html"].decode("utf-8") if isinstance(page["html"], (bytes, bytearray)) else page["html"]
            for link in extract_links(html, r["url_norm"]):
                key = (r["url_norm"], link["url"])
                if key in link_pairs:
                    continue
                link_pairs.add(key)
                n_links += 1
                if link["link_type"] in ("internal", "external"):
                    st.discovered.append(
                        {
                            "url": link["url"],
                            "source_url": r["url_norm"],
                            "depth": r["depth"] + 1,
                            "source_priority": cfg.discovered_priority,
                        }
                    )

        # ---- 7. adaptive host stats (mirrors adaptive_host_stats)
        per_host: dict[str, list] = {}
        for host, success, rt in fetch_results:
            per_host.setdefault(host, []).append((success, rt))
        for host, results in per_host.items():
            dt = len(results)
            d_success = sum(1 for s, _ in results if s)
            d_failed = dt - d_success
            rts = [rt for _, rt in results if rt > 0]
            d_avg = (sum(rts) / len(rts)) if rts else 0.0
            prev = st.host_stats.get(host)
            total0 = prev["total_requests"] if prev else 0
            avg0 = prev["avg_response_time"] if prev else 0.0
            delay0 = prev["crawl_delay"] if prev else cfg.default_crawl_delay
            total_n = total0 + dt
            stats = {
                "total_requests": total_n,
                "successful_requests": (prev["successful_requests"] if prev else 0) + d_success,
                "failed_requests": (prev["failed_requests"] if prev else 0) + d_failed,
                "avg_response_time": ((avg0 * total0 + d_avg * dt) / total_n) if total_n else 0.0,
                "crawl_delay": delay0,
                "last_epoch": epoch,
            }
            if stats["total_requests"] >= 10:
                sr = stats["successful_requests"] / stats["total_requests"]
                if sr < 0.8 or stats["avg_response_time"] > 5.0:
                    stats["crawl_delay"] = min(delay0 * 1.5, 10.0)
                elif sr > 0.95 and stats["avg_response_time"] < 1.0:
                    stats["crawl_delay"] = max(delay0 * 0.8, 0.5)
            st.host_stats[host] = stats

        # hosts seen before but not fetched this epoch keep stats unchanged
        # (Spark full join recomputes the same values; ladder needs _dt>0?
        #  no — Spark applies the ladder to every host each epoch, so do we)
        for host, prev in st.host_stats.items():
            if host in per_host:
                continue
            total_n = prev["total_requests"]
            avg_n = (prev["avg_response_time"] * total_n + 0.0 * 0) / total_n if total_n else 0.0
            prev["avg_response_time"] = avg_n
            if total_n >= 10:
                sr = prev["successful_requests"] / total_n
                if sr < 0.8 or avg_n > 5.0:
                    prev["crawl_delay"] = min(prev["crawl_delay"] * 1.5, 10.0)
                elif sr > 0.95 and avg_n < 1.0:
                    prev["crawl_delay"] = max(prev["crawl_delay"] * 0.8, 0.5)

        ordered = sorted(schedule, key=lambda r: (r["host"], r["rank_in_host"]))
        st.schedules.append(
            [(r["host"], r["rank_in_host"], r["url_norm"]) for r in ordered]
        )
        st.counters.append(
            {
                "epoch": epoch,
                "urls_new": len(new_rows),
                "urls_scheduled": len(schedule),
                "urls_deferred": len(st.deferred),
                "links_discovered": n_links,
            }
        )

    return st
