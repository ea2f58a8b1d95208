"""Fresh-JVM child for the crawl bench blocks.

The all-opt-ins crawl measured 2.3x slower inside the bench session's
aged JVM than in a fresh one (652s vs 285s, identical code+data+box —
cache clearing and a forced GC did not close the gap), so bench.py runs
it here the same way the scaling pairs run in their own JVMs: the child
measures the engine, the parent's session keeps its own aging out of the
record. Prints one `CHILD_RESULT {json}` line.

Usage: python run_crawl_bench.py --n-pages 20000 [--epochs 4] [--optins]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, required=True)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--optins", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from bench import crawl_bench
    from webcrawler_spark.config import CrawlConfig
    from webcrawler_spark.session import get_spark

    cores = args.cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # 2*cores shuffle partitions — the SAME conf the parent bench session
    # uses (bench.py main), so child-vs-in-session crawl numbers compare
    # engine against engine, not config against config
    spark = get_spark("crawl-bench-child", cores=cores, shuffle_partitions=2 * cores)
    if args.optins:
        cfg = CrawlConfig(
            epoch_seconds=600, hot_host_salt=4,
            use_bloom=True, cluster_by_surt=True, strip_tracking=True,
            detect_traps=True, global_budget=100_000, use_host_rank=True,
            scrub_pii=True, compact_every=2, respect_meta_robots=True,
            respect_canonical=True, politeness_by_registrable=True,
            build_index=True, recrawl=True, adaptive_salt=True,
            mine_dust=True, detect_soft404=True,
            target_langs=("en", "de", "fr", "es"),
        )
    else:
        cfg = CrawlConfig(epoch_seconds=600, hot_host_salt=4)
    out = crawl_bench(spark, n_pages=args.n_pages, n_epochs=args.epochs, cfg=cfg)
    print("CHILD_RESULT " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
