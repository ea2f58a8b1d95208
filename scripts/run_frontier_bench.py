#!/usr/bin/env python
"""spark-submit child for the two-cluster-size scaling evidence.

Launched by ``bench.py`` in the north-rule deployment shape:

    spark-submit --master local[N] --py-files webcrawler_spark.zip \
        run_frontier_bench.py --n-urls 8000000

from a clean working directory, so ``webcrawler_spark`` must resolve from
the zip exactly as it would on a cluster's executors. The launcher pins
the whole process tree (JVM + python workers) to the core budget before
exec; this script only runs the workload and prints one CHILD_RESULT line.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-urls", type=int, required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from webcrawler_spark.benchlib import frontier_bench

    # master / memory / confs come from the spark-submit command line
    spark = SparkSession.builder.appName("frontier-scaling-child").getOrCreate()
    frontier_bench(spark, max(args.n_urls // 20, 10_000))  # warmup: JIT + python workers
    out = frontier_bench(spark, args.n_urls)
    print("CHILD_RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
