"""Reproduce driver-style oracle comparison for selected contract entries.

Usage: python scripts/repro_mismatch.py name1 name2 ...
       python scripts/repro_mismatch.py --all        (every oracle entry)
Compares Spark vs DuckDB at sf0.01 with EXACT values (no float rounding)
AND result dtypes, and prints the first differing cells.

The dtype check exists because the driver's value-hash canonicalization is
type-sensitive: an uncast DuckDB ``sum(CASE ...)`` types as HUGEINT where
Spark emits BIGINT, hash-mismatching even when every value is identical
(the round-1 ``host_stats_adaptive`` and round-2 ``trap_signals`` reds were
exactly this). Every oracle SQL must pin aggregate dtypes with CASTs.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod
from webcrawler_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# spark simpleString dtype -> acceptable DuckDB type names. Anything not
# matching (notably HUGEINT from an uncast sum) is a pinning bug.
_DTYPE_OK = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "tinyint": {"TINYINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT", "REAL"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "timestamp_ntz": {"TIMESTAMP"},
}


def dtype_deltas(spark_dtypes, duck_names, duck_types):
    """[(col, spark_type, duck_type)] for columns whose DuckDB type is not
    the canonical counterpart of the Spark type (matched by column name)."""
    duck = {n: str(t).upper() for n, t in zip(duck_names, duck_types)}
    out = []
    for col, st in spark_dtypes:
        dt = duck.get(col)
        if dt is None:
            out.append((col, st, "<missing>"))
            continue
        if st.startswith("array<"):
            if not dt.endswith("[]"):
                out.append((col, st, dt))
            continue
        if st.startswith("decimal"):
            if not dt.startswith("DECIMAL"):
                out.append((col, st, dt))
            continue
        ok = _DTYPE_OK.get(st)
        if ok is not None and dt not in ok:
            out.append((col, st, dt))
    return out


def norm(rows, cols, ndigits=None):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, ndigits) if ndigits else v
        return v

    def sort_key(t):
        # None-safe total order (a NULL cell must not TypeError the sort)
        return tuple((v is None, str(type(v)), v if v is not None else 0) for v in t)

    return sorted(
        (tuple(cell(r[i]) for i in order) for r in rows), key=sort_key
    )


def main():
    names = sys.argv[1:]
    oracle = entry_mod.oracle_sql()
    if names == ["--all"]:
        names = sorted(oracle)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    spark = get_spark("repro", cores=8, shuffle_partitions=8)
    n_bad = 0
    for name in names:
        sdf = entry_mod.queries()[name](spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        rel = con.sql(oracle[name])
        dcols, dtypes = rel.columns, rel.types
        drows = rel.fetchall()
        print(f"== {name}: spark {len(srows)} rows, duck {len(drows)} rows")
        td = dtype_deltas(sdf.dtypes, dcols, dtypes)
        print(f"   dtype deltas: {len(td)}")
        for col, st, dt in td:
            print(f"   dtype {col}: spark={st} duck={dt}")
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
        if td or len(srows) != len(drows) or diffs:
            n_bad += 1
    spark.stop()
    print(f"TOTAL entries with deltas: {n_bad}/{len(names)}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
