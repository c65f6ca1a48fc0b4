#!/usr/bin/env python
"""Round-6 optimization measurement harness (NOT the driver bench).

Phase-isolated timings with noop sinks (guide §1.4), build sub-phase
attribution (manifest stage sub_walls + per-stage walls), and repeated
warm laps so fixed per-batch costs separate from kernel time.

Usage: python bench_extra.py [build|queries|dedup|ann|all]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_SYNTH = int(os.environ.get("SPARK_GRAFT_BENCH_SYNTH", "30000"))


def _spark():
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("word2doc_spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def lap(label, fn, n=1):
    walls = []
    for _ in range(n):
        t0 = time.time()
        out = fn()
        walls.append(round(time.time() - t0, 3))
    print(f"  {label}: {walls}", flush=True)
    return out


def bench_build(spark, work):
    from word2doc_spark.config import IndexConfig
    from word2doc_spark.index.build import build_index
    from word2doc_spark.index.manifest import Manifest
    from word2doc_spark.sources.pages import (
        pages_from_documents, synthetic_pages)

    cfg = IndexConfig(hash_size=2 ** 22, num_shards=8)

    def one(pages, token, tag):
        d = os.path.join(work, tag)
        shutil.rmtree(d, ignore_errors=True)
        t0 = time.time()
        m = build_index(spark, pages, d, cfg, input_token=token)
        total = time.time() - t0
        marker = Manifest(d).read_marker("stage")
        sub = marker.get("sub_walls", {})
        stage_wall = marker.get("wall_s")
        enc = sum(r.get("wall_s", 0) for r in Manifest(d).shard_metrics())
        print(f"  {tag}: total={total:.2f} stage={stage_wall:.2f} "
              f"sub={json.dumps(sub)} encode={enc:.2f} "
              f"publish+rest={total - stage_wall - enc:.2f}", flush=True)

    pages = pages_from_documents(spark, SF_DIR)
    for rep in range(3):
        one(pages, "bench", f"docs_r{rep}")
    for rep in range(3):
        synth = synthetic_pages(spark, N_SYNTH, num_partitions=int(CPUS) * 2)
        one(synth, "bench-synth", f"synth_r{rep}")


def _bench_queries_df(spark):
    import itertools
    pool = ["key", "agg", "row", "scan", "slow", "fast", "table", "value",
            "part", "hash", "batch", "window", "spark", "order", "data",
            "column", "join", "small", "line", "customer", "query"]
    combos = itertools.combinations(pool, 3)
    rows = [(i, " ".join(c))
            for i, c in enumerate(itertools.islice(combos, 60))]
    return spark.createDataFrame(rows, "query_id long, query string")


def bench_queries(spark, work):
    from word2doc_spark.config import IndexConfig
    from word2doc_spark.index.build import build_index
    from word2doc_spark.query.exact import search_exact
    from word2doc_spark.query.fast import search_fast
    from word2doc_spark.query.wand import search_wand
    from word2doc_spark.sources.pages import pages_from_documents

    cfg = IndexConfig(hash_size=2 ** 22, num_shards=8)
    d = os.path.join(work, "qidx")
    if not os.path.isdir(d):
        pages = pages_from_documents(spark, SF_DIR)
        build_index(spark, pages, d, cfg, input_token="bench")
    qdf = _bench_queries_df(spark)
    qdf.count()
    lap("exact_drqa", lambda: search_exact(
        spark, d, qdf, k=10, score_mode="drqa").count(), n=4)
    lap("wand_drqa", lambda: search_wand(
        spark, d, qdf, k=10, score_mode="drqa").count(), n=4)
    lap("exact_bm25", lambda: search_exact(
        spark, d, qdf, k=10, score_mode="bm25").count(), n=4)
    lap("fast_drqa", lambda: search_fast(
        spark, d, qdf, k=10, score_mode="drqa").count(), n=4)


def bench_dedup(spark, work):
    from word2doc_spark.ops.dedup import (
        lsh_candidate_pairs, minhash_signatures, shingles)
    documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    documents.count()
    lap("shingles", lambda: _noop(shingles(documents, 3)), n=3)
    lap("minhash_sigs", lambda: _noop(
        minhash_signatures(documents, 8, 3)), n=3)
    lap("lsh_pairs_count", lambda: lsh_candidate_pairs(
        documents, num_perm=8, bands=4).count(), n=3)


def bench_ann(spark, work):
    import pyspark.sql.functions as F
    from word2doc_spark.ops.similarity import brute_force_topk
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = emb.count()
    print(f"  n_vectors={n}")
    qv = (emb.filter(F.col("vec_id") < 20)
          .select(F.col("vec_id").alias("query_vec_id"), "embedding"))
    lap("ann_brute_count", lambda: brute_force_topk(emb, qv, k=5).count(),
        n=3)


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = _spark()
    work = os.environ.get("W2D_EXTRA_WORK") or tempfile.mkdtemp(
        prefix="w2d_extra_")
    try:
        if what in ("build", "all"):
            print("== build ==", flush=True)
            bench_build(spark, work)
        if what in ("queries", "all"):
            print("== queries ==", flush=True)
            bench_queries(spark, work)
        if what in ("dedup", "all"):
            print("== dedup ==", flush=True)
            bench_dedup(spark, work)
        if what in ("ann", "all"):
            print("== ann ==", flush=True)
            bench_ann(spark, work)
    finally:
        if not os.environ.get("W2D_EXTRA_WORK"):
            shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
