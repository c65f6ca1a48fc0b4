#!/usr/bin/env python
"""spark-submit entrypoint: build (or resume) an index.

    spark-submit --py-files word2doc_spark.zip scripts/build_index.py \\
        --pages /path/to/pages_parquet --index-dir /path/to/index \\
        [--lang en] [--hash-size 16777216] [--ngram 2] [--shards 32] \\
        [--score-mode bm25] [--input-token build-2024-01]

The pages input may be a parquet path with the canonical pages schema
(url, warc_ts, html, text, lang) or a documents-style table readable by
word2doc_spark.sources.pages.pages_from_documents (--from-documents).
On a cluster, point --index-dir at shared storage; the manifest makes
re-submission resume from completed shards.
"""

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True)
    p.add_argument("--index-dir", required=True)
    p.add_argument("--from-documents", action="store_true",
                   help="input is a documents-style dir (driver testdata)")
    p.add_argument("--lang", default=None)
    p.add_argument("--hash-size", type=int, default=2 ** 24)
    p.add_argument("--ngram", type=int, default=2)
    p.add_argument("--shards", type=int, default=32)
    p.add_argument("--block-size", type=int, default=128)
    p.add_argument("--score-mode", default="drqa", choices=["drqa", "bm25"])
    p.add_argument("--analyzer", default="simple",
                   choices=["simple", "regexp"])
    p.add_argument("--n-ranges", type=int, default=32,
                   help="doc-range buckets (skew salting + query "
                        "parallelism axis)")
    p.add_argument("--max-seg-postings", type=int, default=131072)
    p.add_argument("--shards-per-job", type=int, default=0,
                   help="0 = encode all shards in one job; k>0 = "
                        "sequential jobs of k shards (finer resume)")
    p.add_argument("--input-token", default="default")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from word2doc_spark.config import IndexConfig
    from word2doc_spark.index.build import build_index
    from word2doc_spark.sources.pages import pages_from_documents

    spark = SparkSession.builder.appName("w2d-build-index").getOrCreate()
    if args.from_documents:
        pages = pages_from_documents(spark, args.pages)
    else:
        pages = spark.read.parquet(args.pages)
    cfg = IndexConfig(
        ngram=args.ngram, hash_size=args.hash_size, num_shards=args.shards,
        block_size=args.block_size, score_mode=args.score_mode,
        analyzer=args.analyzer, n_ranges=args.n_ranges,
        max_seg_postings=args.max_seg_postings,
        shards_per_job=args.shards_per_job)
    metrics = build_index(spark, pages, args.index_dir, cfg,
                          lang_filter=args.lang, input_token=args.input_token)
    json.dump(metrics, sys.stdout, indent=1, default=str)
    print()


if __name__ == "__main__":
    main()
