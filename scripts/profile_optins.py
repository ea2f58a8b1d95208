"""Per-opt-in cost attribution for the all-opt-ins crawl bench block.

The r4 bench recorded the all-opt-ins crawl at ~7x the parity-default
crawl's wall (415s vs 60s at sf0.1 volumes, quiet box). This harness runs
the SAME crawl_bench workload with one opt-in enabled at a time (on top of
the parity default) and prints a cost table, so optimization effort lands
on the dominant flags instead of guesses.

Usage:  python scripts/profile_optins.py [n_pages] [n_epochs]
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from bench import crawl_bench  # noqa: E402
from webcrawler_spark.config import CrawlConfig  # noqa: E402
from webcrawler_spark.session import get_spark  # noqa: E402

BASE = dict(epoch_seconds=600, hot_host_salt=4)

# one entry per opt-in flag group (flags that only make sense together stay
# together, e.g. global_budget+use_host_rank)
VARIANTS: dict[str, dict] = {
    "default": {},
    "use_bloom": dict(use_bloom=True),
    "cluster_by_surt": dict(cluster_by_surt=True),
    "strip_tracking": dict(strip_tracking=True),
    "detect_traps": dict(detect_traps=True),
    "host_rank_budget": dict(global_budget=100_000, use_host_rank=True),
    "scrub_pii": dict(scrub_pii=True),
    "compact_every2": dict(compact_every=2),
    "meta_robots": dict(respect_meta_robots=True),
    "respect_canonical": dict(respect_canonical=True),
    "politeness_registrable": dict(politeness_by_registrable=True),
    "build_index": dict(build_index=True),
    "recrawl": dict(recrawl=True),
    "adaptive_salt": dict(adaptive_salt=True),
    "mine_dust": dict(mine_dust=True),
    "detect_soft404": dict(detect_soft404=True),
    "collapse_mirrors": dict(collapse_mirrors=True),
    "target_langs": dict(target_langs=("en", "de", "fr", "es")),
}


def _late_variants() -> None:
    # the canonical all-opt-ins set comes from config.ALL_OPTINS so this
    # profiler can never drift from what the bench's crawl_optins block runs
    from webcrawler_spark.config import ALL_OPTINS

    VARIANTS["all_optins"] = dict(ALL_OPTINS)


_late_variants()


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    spark = get_spark("profile-optins", cores=32, shuffle_partitions=32)
    rows = []
    base_s = None
    for name, extra in VARIANTS.items():
        if only and name not in only and name != "default":
            continue
        cfg = CrawlConfig(**{**BASE, **extra})
        out = crawl_bench(spark, n_pages=n_pages, n_epochs=n_epochs, cfg=cfg)
        if name == "default":
            base_s = out["seconds"]
        delta = out["seconds"] - (base_s or 0.0)
        rows.append(
            {
                "variant": name,
                "seconds": out["seconds"],
                "delta_vs_default": round(delta, 2),
                "epoch_seconds": out["epoch_seconds"],
                "fetched": out["pages_fetched"],
                "sys_busy": out["sys_busy_avg"],
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    print("\n=== cost table (sorted by delta) ===")
    for r in sorted(rows, key=lambda r: -r["delta_vs_default"]):
        print(
            f"{r['variant']:24s} {r['seconds']:8.1f}s  "
            f"+{r['delta_vs_default']:7.1f}s  epochs={r['epoch_seconds']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
