#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the engine's headline phases at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {phase: sec, ...}, "sf": ...,
 "throughput": {docs_per_sec_build, qps_exact, qps_wand, ...}}

Phases:
  build_docs      — full index build over the sf documents table (as pages)
  build_synth30k  — index build over a 30k-doc synthetic HTML corpus
                    (extraction + analysis + range-segmented shard encode)
  query_exact     — 60-query DrQA batch, exact path, k=10
  query_wand      — same batch, block-max WAND path
  query_bm25      — same batch, bm25 exact
  dedup_lsh       — minhash-LSH candidate pairs over documents
  ann_brute       — brute-force cosine top-5, 20 query vectors
"""

import itertools
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

# 60 deterministic multi-term queries over the synthetic-doc vocabulary
_POOL = ["key", "agg", "row", "scan", "slow", "fast", "table", "value",
         "part", "hash", "batch", "window", "spark", "order", "data",
         "column", "join", "small", "line", "customer", "query"]


def _bench_queries():
    combos = itertools.combinations(_POOL, 3)
    return [(i, " ".join(c)) for i, c in enumerate(itertools.islice(combos, 60))]


def main():
    from pyspark.sql import SparkSession
    from word2doc_spark.config import IndexConfig
    from word2doc_spark.index.build import build_index
    from word2doc_spark.ops.dedup import lsh_candidate_pairs
    from word2doc_spark.ops.similarity import brute_force_topk
    from word2doc_spark.query.exact import search_exact
    from word2doc_spark.query.fast import search_fast
    from word2doc_spark.query.wand import search_wand
    from word2doc_spark.sources.pages import pages_from_documents, synthetic_pages
    import pyspark.sql.functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("word2doc_spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    cfg = IndexConfig(hash_size=2 ** 22, num_shards=8)
    work = tempfile.mkdtemp(prefix="w2d_bench_")
    phases: dict[str, float] = {}
    throughput: dict[str, float] = {}

    try:
        # --- phase: build over sf documents ------------------------------
        docs_dir = os.path.join(work, "idx_docs")
        pages = pages_from_documents(spark, SF_DIR)
        n_docs = pages.count()
        t0 = time.time()
        build_index(spark, pages, docs_dir, cfg, input_token="bench")
        dt = time.time() - t0
        phases["build_docs"] = round(dt, 3)
        throughput["docs_per_sec_build"] = round(n_docs / dt, 1)

        # --- phase: build over synthetic html corpus ---------------------
        synth_dir = os.path.join(work, "idx_synth")
        synth = synthetic_pages(spark, N_SYNTH,
                                num_partitions=int(CPUS) * 2)
        t0 = time.time()
        build_index(spark, synth, synth_dir, cfg, input_token="bench-synth")
        dt = time.time() - t0
        phases["build_synth30k"] = round(dt, 3)
        throughput["docs_per_sec_build_synth"] = round(N_SYNTH / dt, 1)

        # --- query phases over the docs index -----------------------------
        qdf = spark.createDataFrame(_bench_queries(),
                                    "query_id long, query string")
        n_q = qdf.count()

        t0 = time.time()
        n1 = search_exact(spark, docs_dir, qdf, k=10, score_mode="drqa").count()
        dt = time.time() - t0
        phases["query_exact"] = round(dt, 3)
        throughput["qps_exact"] = round(n_q / dt, 2)

        t0 = time.time()
        n2 = search_wand(spark, docs_dir, qdf, k=10, score_mode="drqa").count()
        dt = time.time() - t0
        phases["query_wand"] = round(dt, 3)
        throughput["qps_wand"] = round(n_q / dt, 2)
        assert n1 == n2, f"wand/exact row mismatch: {n1} vs {n2}"

        t0 = time.time()
        search_exact(spark, docs_dir, qdf, k=10, score_mode="bm25").count()
        dt = time.time() - t0
        phases["query_bm25"] = round(dt, 3)
        throughput["qps_bm25"] = round(n_q / dt, 2)

        t0 = time.time()
        n3 = search_fast(spark, docs_dir, qdf, k=10, score_mode="drqa").count()
        dt = time.time() - t0
        phases["query_fast"] = round(dt, 3)
        throughput["qps_fast"] = round(n_q / dt, 2)
        assert n3 == n1, f"fast/exact row mismatch: {n3} vs {n1}"

        # --- training-data ops --------------------------------------------
        documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        t0 = time.time()
        lsh_candidate_pairs(documents, num_perm=8, bands=4).count()
        phases["dedup_lsh"] = round(time.time() - t0, 3)

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        qv = (emb.filter(F.col("vec_id") < 20)
              .select(F.col("vec_id").alias("query_vec_id"), "embedding"))
        t0 = time.time()
        brute_force_topk(emb, qv, k=5).count()
        phases["ann_brute"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()

    total = round(sum(phases.values()), 3)
    print(json.dumps({
        "metric": "index_build+query_total_sec",
        "value": total,
        "unit": "sec",
        "queries": phases,
        "sf": SF_DIR,
        "cpus": int(CPUS),
        "throughput": throughput,
    }))


if __name__ == "__main__":
    main()
