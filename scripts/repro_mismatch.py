"""Reproduce driver-style oracle comparison for selected contract entries.

Usage: python scripts/repro_mismatch.py name1 name2 ...
Compares Spark vs DuckDB at sf0.01 with EXACT values (no float rounding)
and prints the first differing cells.
"""

import math
import sys

import duckdb

import __spark_entry__ as entry_mod
from webcrawler_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(rows, cols, ndigits=None):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, ndigits) if ndigits else v
        return v

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def main():
    names = sys.argv[1:]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    spark = get_spark("repro", cores=8, shuffle_partitions=8)
    for name in names:
        sdf = entry_mod.queries()[name](spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        res = con.execute(entry_mod.oracle_sql()[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        print(f"== {name}: spark {len(srows)} rows, duck {len(drows)} rows")
        a = norm(srows, scols)
        b = norm(drows, dcols)
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        print(f"   exact diffs: {len(diffs)}")
        for x, y in diffs[:5]:
            print("   spark:", x)
            print("   duck :", y)
        a9 = norm(srows, scols, 9)
        b9 = norm(drows, dcols, 9)
        d9 = [(x, y) for x, y in zip(a9, b9) if x != y]
        print(f"   9dp   diffs: {len(d9)}")
        for x, y in d9[:3]:
            print("   spark:", x)
            print("   duck :", y)
    spark.stop()


if __name__ == "__main__":
    main()
