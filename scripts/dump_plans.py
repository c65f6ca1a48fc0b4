#!/usr/bin/env python
"""Dump .explain("formatted") for declared queries to plans/r06/.

Usage: python scripts/dump_plans.py <suffix> [query ...]
Writes plans/r06/<query>_<suffix>.txt for each named query (default: the
round-6 touched set). Uses sf0.001 so engine queries build quickly.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
DEFAULT = ["lsh_pairs", "minhash_sigs", "simhash", "ann_cosine_topk",
           "ngram_jaccard", "dedup_exact", "engine_drqa_topk",
           "engine_fast_topk"]


def main():
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    from pyspark.sql import SparkSession
    import __spark_entry__ as E

    spark = (SparkSession.builder.master("local[8]")
             .appName("dump-plans")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
