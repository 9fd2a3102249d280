"""Driver-style strict oracle check: runs REGISTRY queries vs their DuckDB
twins and compares the sorted, column-name-ordered, STRINGIFIED value multiset
(stricter than pytest's == — catches int-vs-float renders like '3549.0').

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from web2llmstxt_spark.plans.queries import REGISTRY
from web2llmstxt_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 9)
                if v == -0.0:
                    v = 0.0
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(REGISTRY)
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failed = []
    for name in names:
        build, sql_fn = REGISTRY[name]
        if sql_fn is None:
            print(f"{name}: SKIP (no oracle)")
            continue
        sdf = build(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        ddf = con.execute(sql_fn()).fetchdf()
        dcols = list(ddf.columns)
        drows = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
        ok_cols = sorted(scols) == sorted(dcols)
        ok_rows = len(srows) == len(drows)
        a, b = norm(srows, scols), norm(drows, dcols)
        ok_vals = a == b
        status = "OK" if (ok_cols and ok_rows and ok_vals) else "FAIL"
        print(f"{name}: {status} rows={len(srows)}/{len(drows)} cols={ok_cols} vals={ok_vals}")
        if status == "FAIL":
            failed.append(name)
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            for d in diffs:
                print("   ", d)
    spark.stop()
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
