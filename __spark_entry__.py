"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship W1 operator — the per-host priority frontier drain —
over the sf0.001 orders table (plus the full crawl flagship as the
``crawl_epoch0_schedule`` query). queries()/oracle_sql(): one entry per
implemented operator from SURVEY.md §2, DuckDB-checked where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from webcrawler_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["frontier_topk_per_host"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(ORACLE_SQL)
