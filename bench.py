#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the engine's headline phases at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {phase: sec, ...}, "sf": ...,
 "throughput": {docs_per_sec_build, qps_exact, qps_wand, ...},
 "reps": {phase: [w1, w2, w3]}}

Noise control: this shared-host VM has multi-minute CPU-steal bursts
(the BENCH_r04 artifact recorded one as a 1.5× "regression" that two
fresh judge re-runs could not reproduce). Every phase therefore runs
$SPARK_GRAFT_BENCH_REPS times (default 3) INTERLEAVED — rep loop
outside, phase loop inside, so a burst cannot bias one phase — and the
reported wall is the per-phase MIN; the raw reps ship alongside.
Builds rebuild from scratch each rep (cold-path cost, fresh dir);
query phases run against the rep-0 index, so reps ≥ 1 measure the
warm serving state (segment cache + executor-side decode caches) —
rep 0 in the raw array is the cold number.

Phases:
  build_docs      — full index build over the sf documents table (as pages)
  build_synth30k  — index build over a 30k-doc synthetic HTML corpus
                    (extraction + analysis + range-segmented shard encode)
  query_exact     — 60-query DrQA batch, exact path, k=10
  query_wand      — same batch, block-max WAND path
  query_bm25      — same batch, bm25 exact
  query_fast      — same batch, fast-DAAT path
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
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

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
    reps: dict[str, list[float]] = {}
    counts: dict[str, float] = {}

    def lap(phase: str, fn):
        t0 = time.time()
        out = fn()
        reps.setdefault(phase, []).append(round(time.time() - t0, 3))
        return out

    try:
        pages = pages_from_documents(spark, SF_DIR)
        n_docs = pages.count()
        counts["build_docs"] = n_docs
        counts["build_synth30k"] = N_SYNTH
        qdf = spark.createDataFrame(_bench_queries(),
                                    "query_id long, query string")
        n_q = qdf.count()
        for p in ("query_exact", "query_wand", "query_bm25", "query_fast"):
            counts[p] = n_q
        documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        qv = (emb.filter(F.col("vec_id") < 20)
              .select(F.col("vec_id").alias("query_vec_id"), "embedding"))
        # query phases run against the rep-0 index (stable build_id →
        # reps ≥ 1 exercise the warm serving caches)
        docs_dir0 = os.path.join(work, "idx_docs_r0")

        for rep in range(REPS):
            docs_dir = os.path.join(work, f"idx_docs_r{rep}")
            lap("build_docs",
                lambda d=docs_dir: build_index(spark, pages, d, cfg,
                                               input_token="bench"))
            synth_dir = os.path.join(work, f"idx_synth_r{rep}")
            synth = synthetic_pages(spark, N_SYNTH,
                                    num_partitions=int(CPUS) * 2)
            lap("build_synth30k",
                lambda d=synth_dir: build_index(spark, synth, d, cfg,
                                                input_token="bench-synth"))
            if rep > 0:  # rep-0 indexes stay for the query phases
                shutil.rmtree(docs_dir, ignore_errors=True)
                shutil.rmtree(synth_dir, ignore_errors=True)

            n1 = lap("query_exact",
                     lambda: search_exact(spark, docs_dir0, qdf, k=10,
                                          score_mode="drqa").count())
            n2 = lap("query_wand",
                     lambda: search_wand(spark, docs_dir0, qdf, k=10,
                                         score_mode="drqa").count())
            assert n1 == n2, f"wand/exact row mismatch: {n1} vs {n2}"
            lap("query_bm25",
                lambda: search_exact(spark, docs_dir0, qdf, k=10,
                                     score_mode="bm25").count())
            n3 = lap("query_fast",
                     lambda: search_fast(spark, docs_dir0, qdf, k=10,
                                         score_mode="drqa").count())
            assert n3 == n1, f"fast/exact row mismatch: {n3} vs {n1}"

            lap("dedup_lsh",
                lambda: lsh_candidate_pairs(documents, num_perm=8,
                                            bands=4).count())
            lap("ann_brute",
                lambda: brute_force_topk(emb, qv, k=5).count())
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()

    phases = {p: min(ws) for p, ws in reps.items()}
    throughput = {
        "docs_per_sec_build": round(counts["build_docs"]
                                    / phases["build_docs"], 1),
        "docs_per_sec_build_synth": round(counts["build_synth30k"]
                                          / phases["build_synth30k"], 1),
        "qps_exact": round(counts["query_exact"] / phases["query_exact"], 2),
        "qps_wand": round(counts["query_wand"] / phases["query_wand"], 2),
        "qps_bm25": round(counts["query_bm25"] / phases["query_bm25"], 2),
        "qps_fast": round(counts["query_fast"] / phases["query_fast"], 2),
    }
    total = round(sum(phases.values()), 3)
    print(json.dumps({
        "metric": "index_build+query_total_sec",
        "value": total,
        "unit": "sec",
        "queries": phases,
        "sf": SF_DIR,
        "cpus": int(CPUS),
        "throughput": throughput,
        "reps": reps,
    }))


if __name__ == "__main__":
    main()
