#!/usr/bin/env python
"""spark-submit child for the two-cluster-size scaling evidence.

Launched by ``bench.py`` in the north-rule deployment shape:

    spark-submit --master local[N] --py-files webcrawler_spark.zip \
        run_frontier_bench.py --n-urls 8000000

from a clean working directory, so ``webcrawler_spark`` must resolve from
the zip exactly as it would on a cluster's executors. The launcher pins
the whole process tree (JVM + python workers) to the core budget before
exec; this script only runs the workload and prints CHILD_RESULT lines.

Two modes:
  default        — one warmup pass, one timed trial, one CHILD_RESULT line
  --loop-stop-file F — one warmup pass, then timed trials back-to-back
                   until the file F exists (checked between trials) or
                   --max-trials is reached; one CHILD_RESULT line per
                   trial, flushed as it completes. Used as the hi side of
                   the concurrent lo∥hi scaling pair: the loop keeps the
                   box under symmetric load for the lo child's entire
                   timed window (the inter-trial seen-set rebuild is
                   untimed but still busies the same cores).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-urls", type=int, required=True)
    ap.add_argument("--loop-stop-file", default=None)
    ap.add_argument("--max-trials", type=int, default=50)
    ap.add_argument("--max-loop-seconds", type=float, default=1800.0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from webcrawler_spark.benchlib import frontier_bench

    # master / memory / confs come from the spark-submit command line
    spark = SparkSession.builder.appName("frontier-scaling-child").getOrCreate()
    frontier_bench(spark, max(args.n_urls // 20, 10_000))  # warmup: JIT + python workers
    if args.loop_stop_file is None:
        out = frontier_bench(spark, args.n_urls)
        print("CHILD_RESULT " + json.dumps(out))
    else:
        t_loop0 = time.time()
        for _ in range(args.max_trials):
            if os.path.exists(args.loop_stop_file):
                break
            if time.time() - t_loop0 > args.max_loop_seconds:
                break
            out = frontier_bench(spark, args.n_urls)
            print("CHILD_RESULT " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
