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
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--no-aqe", action="store_true")
    args = ap.parse_args()

    from bench import crawl_bench
    from webcrawler_spark.config import CrawlConfig, all_optins_config
    from webcrawler_spark.session import get_spark

    cores = args.cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sp = args.shuffle_partitions or 2 * cores
    if args.no_aqe:
        os.environ["SPARK_GRAFT_DISABLE_AQE"] = "1"
    spark = get_spark("crawl-bench-child", cores=cores, shuffle_partitions=sp)
    if args.optins:
        cfg = all_optins_config()
    else:
        cfg = CrawlConfig(epoch_seconds=600, hot_host_salt=4)
    out = crawl_bench(spark, n_pages=args.n_pages, n_epochs=args.epochs, cfg=cfg)
    print("CHILD_RESULT " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
