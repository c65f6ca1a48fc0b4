#!/usr/bin/env python
"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark at the given sf dir, run the matching oracle_sql() in DuckDB, and
compare row count + column names + order-insensitive values.

Usage: python scripts/check_entry.py [sf_dir] [query ...]
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # kill -0.0 and representation jitter after the query's own rounding
        return f"{v + 0.0:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["\x01".join(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (SparkSession.builder.master("local[8]")
             .appName("check_entry")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time() - t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        ok_cols = sorted(c.lower() for c in scols) == sorted(ocols)
        a = norm_rows([c.lower() for c in scols], [tuple(r) for r in srows])
        b = norm_rows(ocols, orows)
        ok = ok_cols and a == b
        status = "OK   " if ok else "FAIL "
        print(f"{status} {name}: spark={len(srows)} duck={len(orows)} "
              f"cols={'=' if ok_cols else 'DIFF'} [{time.time() - t0:.1f}s]")
        if not ok:
            failures.append(name)
            if not ok_cols:
                print(f"      spark cols: {sorted(scols)}")
                print(f"      duck  cols: {sorted(ocols)}")
            diff_a = [x for x in a if x not in set(b)][:3]
            diff_b = [x for x in b if x not in set(a)][:3]
            for x in diff_a:
                print(f"      spark-only: {x[:200]}")
            for x in diff_b:
                print(f"      duck-only : {x[:200]}")
    print("\nFAILURES:", failures if failures else "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
