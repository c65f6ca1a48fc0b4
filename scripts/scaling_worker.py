#!/usr/bin/env python
"""One scaling-bench run at a fixed parallelism: build an index from a
pre-generated pages parquet and/or run batch-query phases against it;
print one JSON line with phase wall-times. Invoked by bench_scaling.py in
a fresh process per (parallelism, phase) — fresh JVM, cold Spark state,
same input.

--phase build  : build the index at --index-dir (wiped first), report
                 build_s / stage_s / shard_s
--phase query  : run wand/fast/exact batches against an existing index
--phase all    : both (legacy single-process mode)

The index layout is parallelism-independent (identical content at any
core count — tested), so query phases at N and 4N may share one index.
"""

import argparse
import itertools
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from word2doc_spark.sources.pages import _TOPICS  # noqa: E402


def scaling_queries(n: int) -> list[tuple[int, str]]:
    """Deterministic query batch: 3-term topical queries (dense postings)
    plus a rare-term tail (~10%)."""
    words = [w for _, ws in _TOPICS for w in ws]
    out = []
    combos = itertools.cycle(itertools.combinations(words, 3))
    for i in range(n):
        c = next(combos)
        q = " ".join(c)
        if i % 10 == 9:
            q += f" tok{(i * 37) % 99999}"
        out.append((i, q))
    return out


def selective_queries(n: int) -> list[tuple[int, str]]:
    """Rare term + dense topic term — the block-max WAND regime at k=1:
    the rare term (a title number, df≈1 → idf≈ln N) sets θ far above
    anything the dense term (df≈15%, deep posting runs) can reach alone,
    so a θ-seeded WAND skips the dense term's blocks in every doc range
    while the full scan must decode+accumulate them all. (A df>50% head
    term can't play this role: the drqa/bm25 idf clamp zeroes it out of
    the query.)"""
    words = [ws[0] for _, ws in _TOPICS]
    return [(i, f"{(i * 7919) % 100000} {words[i % len(words)]}")
            for i in range(n)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpus", type=int, required=True)
    p.add_argument("--corpus", required=True)
    p.add_argument("--n-queries", type=int, default=500)
    p.add_argument("--shards", type=int, default=4)
    p.add_argument("--n-ranges", type=int, default=128)
    p.add_argument("--phase", default="all", choices=["all", "build", "query"])
    p.add_argument("--shuffle-partitions", type=int, default=64,
                   help="pinned at BOTH parallelism levels: partitioning "
                        "is a property of the DATA (split sizes, range "
                        "layout), not of cluster size — a real cluster "
                        "runs the same 10k-partition job on 100 or 400 "
                        "executors. Scaling shuffle partitions with cores "
                        "(the pre-r5 convention, 4×cores) made N and 4N "
                        "run DIFFERENT jobs: the slot-group count tracks "
                        "shuffle partitions, so 4N scored 4× the range "
                        "groups per query and merged 4× the candidates — "
                        "a workload inflation booked as scaling loss. "
                        "Default 64 = the measured sweet spot for this "
                        "layout (candidate-merge volume per query scales "
                        "with the slot-group count; 64 beat 128 by 1.26× "
                        "and 32 by 1.14× absolute at local[32], fast "
                        "40k-query batch).")
    p.add_argument("--only", default=None,
                   help="comma subset of query sub-phases to run "
                        "(wand,fast,bm25,exact) — lets one orchestration "
                        "call fit a wall-clock budget")
    p.add_argument("--index-dir", default=None,
                   help="persistent index location (build writes, query "
                        "reads); default = temp dir (phase=all only)")
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from word2doc_spark.config import IndexConfig
    from word2doc_spark.index.build import build_index
    from word2doc_spark.query.exact import search_exact
    from word2doc_spark.query.stats import sample_worker_stats
    from word2doc_spark.query.fast import search_fast
    from word2doc_spark.query.wand import search_wand

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName(f"w2d-scaling-{args.cpus}")
        .config("spark.sql.shuffle.partitions",
                str(args.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # n_ranges fixed across parallelism levels (a dataset-layout property);
    # 128 keeps doc-partitioned query phases load-balanced at 4N cores
    cfg = IndexConfig(hash_size=2 ** 24, num_shards=args.shards,
                      n_ranges=args.n_ranges)
    work = None
    if args.index_dir:
        idx = args.index_dir
    else:
        work = tempfile.mkdtemp(prefix=f"w2d_scal_{args.cpus}_")
        idx = os.path.join(work, "idx")
    out: dict = {"cpus": args.cpus, "phase": args.phase,
                 "shuffle_partitions": args.shuffle_partitions}
    try:
        if args.phase in ("all", "build"):
            if args.index_dir:
                shutil.rmtree(idx, ignore_errors=True)
            pages = spark.read.parquet(args.corpus)
            out["n_docs"] = pages.count()
            t0 = time.time()
            build_index(spark, pages, idx, cfg, input_token="scaling")
            out["build_s"] = round(time.time() - t0, 2)
            from word2doc_spark.index.manifest import Manifest
            man = Manifest(idx)
            marker = man.read_marker("stage")
            out["stage_s"] = round(marker["wall_s"], 2)
            out["stage_sub"] = marker.get("sub_walls", {})
            out["shard_s"] = [round(r["wall_s"], 2)
                              for r in man.shard_metrics()]

        if args.phase in ("all", "query"):
            if "n_docs" not in out:
                from word2doc_spark.index.manifest import Manifest
                out["n_docs"] = Manifest(idx).load()[1]["n_docs"]
            # steady-state warmup (untimed, identical at every level):
            # first-touch costs — parquet footer reads, codegen, python
            # worker spin-up — are fixed wall that would otherwise bias
            # the N vs 4N ratio; batch serving throughput is the metric
            warm = spark.createDataFrame(scaling_queries(3),
                                         "query_id long, query string")
            search_wand(spark, idx, warm, k=5, score_mode="drqa").count()
            search_fast(spark, idx, warm, k=5, score_mode="drqa").count()
            search_exact(spark, idx, warm, k=5, score_mode="drqa").count()
            only = set((args.only or
                        "wand,fast,bm25,exact,selective").split(","))
            qdf = spark.createDataFrame(scaling_queries(args.n_queries),
                                        "query_id long, query string")
            out["n_queries"] = args.n_queries
            if "wand" in only:
                # WAND phase: topical (dense-posting) queries
                t0 = time.time()
                search_wand(spark, idx, qdf, k=10,
                            score_mode="drqa").count()
                out["query_wand_s"] = round(time.time() - t0, 2)

            if "fast" in only:
                # fast-DAAT phase at TWO batch sizes: the big-batch wall
                # is the headline; the small-batch wall lets the bench
                # page derive MARGINAL serving throughput
                # (Δqueries / Δwall), which strips per-batch fixed work
                # (prep, segment scan, shuffle barriers) out of the
                # N-vs-4N ratio
                n_small = args.n_queries * 20
                sq2 = spark.createDataFrame(scaling_queries(n_small),
                                            "query_id long, query string")
                out["n_queries_fast_small"] = n_small
                sample_worker_stats(spark, reset=True)
                t0 = time.time()
                search_fast(spark, idx, sq2, k=10,
                            score_mode="drqa").count()
                out["query_fast_small_s"] = round(time.time() - t0, 2)
                out["kern_fast_small"] = sample_worker_stats(spark)
                n_fast = args.n_queries * 80
                fq = spark.createDataFrame(scaling_queries(n_fast),
                                           "query_id long, query string")
                out["n_queries_fast"] = n_fast
                sample_worker_stats(spark, reset=True)
                t0 = time.time()
                search_fast(spark, idx, fq, k=10,
                            score_mode="drqa").count()
                out["query_fast_s"] = round(time.time() - t0, 2)
                out["kern_fast"] = sample_worker_stats(spark)

            if "bm25" in only:
                # bm25 phase (the north metric's scorer): fast path + the
                # per-range dl-blob cogroup, mid-sized batch
                n_bm25 = args.n_queries * 16
                bq = spark.createDataFrame(scaling_queries(n_bm25),
                                           "query_id long, query string")
                out["n_queries_bm25"] = n_bm25
                sample_worker_stats(spark, reset=True)
                t0 = time.time()
                search_fast(spark, idx, bq, k=10,
                            score_mode="bm25").count()
                out["query_bm25_s"] = round(time.time() - t0, 2)
                out["kern_bm25"] = sample_worker_stats(spark)

            if "selective" in only:
                # selective phase: WAND's pruning regime vs the full scan
                # on the SAME workload — rare+head queries, k=3
                n_sel = args.n_queries * 40
                sq = spark.createDataFrame(
                    selective_queries(n_sel),
                    "query_id long, query string")
                out["n_queries_sel"] = n_sel
                t0 = time.time()
                search_wand(spark, idx, sq, k=1,
                            score_mode="drqa").count()
                out["query_wand_sel_s"] = round(time.time() - t0, 2)
                t0 = time.time()
                search_fast(spark, idx, sq, k=1,
                            score_mode="drqa").count()
                out["query_fast_sel_s"] = round(time.time() - t0, 2)

            if "exact" in only:
                # exact join path: correctness twin; timed on the small
                # batch only (it shuffles every matched posting — not a
                # scaling phase)
                t0 = time.time()
                search_exact(spark, idx, qdf, k=10,
                             score_mode="drqa").count()
                out["query_exact_s"] = round(time.time() - t0, 2)
    finally:
        if work:
            shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    line = json.dumps(out)
    # insurance copy: persist each run so a killed orchestration loses
    # nothing (bench_scaling --reuse reads these back)
    with open(f"/tmp/w2d_scaling_result_{args.cpus}_{args.phase}_"
              f"{int(time.time())}.json", "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
