"""Side-by-side Spark-vs-DuckDB check of every oracle-able query.

Mirrors the driver's correctness gate: row count, schema (column names),
and order-insensitive value comparison at sf0.01. Run:

    python scripts/oracle_check.py [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision repr — exact compare
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v)
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    wanted = sys.argv[1:] or None
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, sql in oracles.items():
        if wanted and name not in wanted:
            continue
        try:
            sdf = qs[name](spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        try:
            rel = con.sql(sql)
            d_cols = rel.columns
            d_rows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            continue
        if sorted(s_cols) != sorted(d_cols):
            failures.append(name)
            print(f"FAIL {name}: cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
            continue
        a = norm_rows(s_cols, s_rows)
        b = norm_rows(d_cols, d_rows)
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            sa, sb = set(a), set(b)
            for x in list(sa - sb)[:3]:
                print("   only-spark:", x)
            for x in list(sb - sa)[:3]:
                print("   only-duck :", x)
            continue
        if a != b:
            failures.append(name)
            diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
            print(f"FAIL {name}: {len(diff)} differing rows of {len(a)}")
            for i in diff[:3]:
                print("   spark:", a[i])
                print("   duck :", b[i])
            continue
        print(f"OK   {name}: {len(a)} rows")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all oracle queries match")


if __name__ == "__main__":
    main()
