"""Exact batch query path (the goldens-grade scorer).

Shape (SURVEY.md §3.2 Spark shape): queries → analyze UDF →
(query_id, term_id, qtf) → broadcast-join against the matched posting rows
(term_id-pruned shard scan) → decode+score inside one Arrow pass →
groupBy(query_id, doc_id) sum → per-query top-k window with deterministic
ties (score desc, doc_id asc).

Scale notes:
* the posting scan is pruned two ways: parquet row-group predicate
  pushdown on ``term_id IN (...)`` and hive partition pruning on
  ``shard_id IN (...)`` — a batch of queries touches only the shards its
  terms hash into, and reads only (term_id, df, payload) columns.
* the query side is tiny (thousands of terms) → broadcast hash join; the
  only shuffle is the final (query_id, doc_id) aggregation, whose input
  is already collapsed to per-term contributions.
* bm25 needs per-doc dl: contributions join the doclen table on doc_id
  (sort-merge/AQE); drqa needs no doc-side join at all.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from word2doc_spark.config import IndexConfig
from word2doc_spark.index.manifest import Manifest
from word2doc_spark.index.postings import decode_postings

QUERY_TERMS_SCHEMA = "query_id long, term_id long, qtf int"


def analyze_queries(queries: DataFrame, config: IndexConfig) -> DataFrame:
    """(query_id, query) → (query_id, term_id, qtf); identical analysis
    pipeline as documents (tfidf_doc_ranker.py:84-107 semantics)."""
    ngram, hash_size = config.ngram, config.hash_size

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from word2doc_spark.functions.tokenize import Analyzer
        analyzer = Analyzer(ngram=ngram, hash_size=hash_size)
        for pdf in it:
            if len(pdf) == 0:
                continue
            terms, tfs = analyzer.analyze_batch(pdf["query"].fillna("").tolist())
            lens = np.fromiter((t.size for t in terms), dtype=np.int64,
                               count=len(terms))
            if lens.sum() == 0:
                continue
            yield pd.DataFrame({
                "query_id": np.repeat(pdf["query_id"].to_numpy(), lens),
                "term_id": np.concatenate(terms),
                "qtf": np.concatenate(tfs).astype(np.int32),
            })

    return queries.select("query_id", "query").mapInPandas(
        run, schema=QUERY_TERMS_SCHEMA)


# above this many distinct query terms, an In() literal list stops being a
# useful parquet filter (and bloats the plan); switch to a semi-join
_ISIN_PRUNE_LIMIT = 20_000


def _matched_postings(spark: SparkSession, index_dir: str,
                      term_ids: list[int], num_shards: int) -> DataFrame:
    shards = spark.read.parquet(os.path.join(index_dir, "shards"))
    shard_ids = sorted({t % num_shards for t in term_ids})
    if len(shard_ids) < num_shards:
        shards = shards.filter(F.col("shard_id").isin(shard_ids))
    if len(term_ids) <= _ISIN_PRUNE_LIMIT:
        # row-group predicate pushdown on term_id
        shards = shards.filter(F.col("term_id").isin(term_ids))
    else:
        wanted = spark.createDataFrame(
            [(int(t),) for t in term_ids], "term_id long")
        shards = shards.join(F.broadcast(wanted), "term_id", "left_semi")
    return shards.select("term_id", "df", "payload")


def search_exact(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    score_mode: str | None = None,
) -> DataFrame:
    """→ (query_id long, rank int, doc_id long, url string, score double)."""
    manifest = Manifest(index_dir)
    config, stats = manifest.load()
    mode = score_mode or config.score_mode
    n_docs = int(stats["n_docs"])
    avgdl = float(stats["avgdl"])
    k1, b = config.k1, config.b

    q_terms = analyze_queries(queries, config)
    # the query side is small by construction — a local collect of its
    # distinct term ids drives scan pruning (SURVEY.md §3.2)
    term_ids = [r["term_id"] for r in q_terms.select("term_id").distinct().collect()]
    if not term_ids:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, url string, score double")

    postings = _matched_postings(spark, index_dir, term_ids, config.num_shards)
    joined = postings.join(F.broadcast(q_terms), "term_id")

    if mode == "drqa":
        out_schema = "query_id long, doc_id long, contrib double"
    else:
        out_schema = "query_id long, doc_id long, w double, tf double"

    def score_terms(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            outs = []
            dfs = pdf["df"].to_numpy()
            idfs = np.log((n_docs - dfs + 0.5) / (dfs + 0.5))
            np.maximum(idfs, 0.0, out=idfs)
            w_qs = np.log1p(pdf["qtf"].to_numpy().astype(np.float64)) * idfs
            for i in range(len(pdf)):
                if w_qs[i] == 0.0:
                    continue
                docs, tfs = decode_postings(pdf["payload"].iloc[i])
                tfs = tfs.astype(np.float64)
                if mode == "drqa":
                    contrib = w_qs[i] * idfs[i] * np.log1p(tfs)
                    outs.append(pd.DataFrame({
                        "query_id": np.full(docs.size, pdf["query_id"].iloc[i]),
                        "doc_id": docs.astype(np.int64),
                        "contrib": contrib,
                    }))
                else:
                    outs.append(pd.DataFrame({
                        "query_id": np.full(docs.size, pdf["query_id"].iloc[i]),
                        "doc_id": docs.astype(np.int64),
                        "w": np.full(docs.size, w_qs[i]),
                        "tf": tfs,
                    }))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    contribs = joined.mapInPandas(score_terms, schema=out_schema)

    if mode == "drqa":
        scored = contribs.groupBy("query_id", "doc_id").agg(
            F.sum("contrib").alias("score"))
    elif mode == "bm25":
        doclen = spark.read.parquet(os.path.join(index_dir, "doclen"))
        with_dl = contribs.join(doclen, "doc_id")
        per_term = with_dl.withColumn(
            "contrib",
            F.col("w") * (F.col("tf") * (k1 + 1.0)) /
            (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl)),
        )
        scored = per_term.groupBy("query_id", "doc_id").agg(
            F.sum("contrib").alias("score"))
    else:
        raise ValueError(mode)

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id"))
    topk = (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))
    # url lookup: top-k is ≤ Q·k rows — broadcast it so the (potentially
    # enormous) docs table is never shuffled
    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    return (docs.join(F.broadcast(topk), "doc_id")
                .select("query_id", "rank", "doc_id", "url", "score")
                .orderBy("query_id", "rank"))
