"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir;
compare row count, sorted column names, and an order-insensitive value
multiset (floats normalized to 9 significant digits).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if v is None:
        return "NULL"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir) and os.path.isdir(os.path.join("/root/testdata", sf_dir)):
        sf_dir = os.path.join("/root/testdata", sf_dir)  # allow bare "sf0.01"
    only = set(sys.argv[2:])

    from kgspark.querybank import PYTEST_ONLY, QUERIES
    from kgspark.session import get_session

    spark = get_session(master="local[8]", app_name="oracle-check",
                        shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    # PYTEST_ONLY entries ride along: oracle-bearing but outside the
    # 50-slot driver budget — checked here so folds never lose coverage
    for name, (fn, sql) in {**QUERIES, **PYTEST_ONLY}.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if sql is None:
            print(f"rows  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(sql)
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        s = canon(srows, scols)
        d = canon(drows, dcols)
        if not ok_cols:
            failures.append(name)
            print(f"FAIL  {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
        elif len(s) != len(d):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(s)} duck={len(d)}")
            _show_diff(name, s, d)
        elif s != d:
            failures.append(name)
            print(f"FAIL  {name}: value mismatch ({len(s)} rows)")
            _show_diff(name, s, d)
        else:
            print(f"OK    {name}: {len(s)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


def _show_diff(name, s, d, k=4):
    ss, ds = set(s), set(d)
    for r in list(ss - ds)[:k]:
        print(f"      spark-only: {r}")
    for r in list(ds - ss)[:k]:
        print(f"      duck-only:  {r}")


if __name__ == "__main__":
    main()
