"""Vectorized per-query DAAT scoring ("fast exact" path).

The reference's hot loop is a scipy CSR sparse dot product
(tfidf_doc_ranker.py:62-63) — C-speed accumulation over all matching
postings. This path is its distributed analog: queries fan out via
``groupBy(query_id).applyInPandas``; inside each group the matched posting
payloads are decoded (vectorized varint) and accumulated with
``np.unique`` + ``np.add.at`` — no per-posting Python. Top-k via
argpartition, ties (score desc, doc_id asc).

Results are exact and identical to search_exact / search_wand
(differential-tested). Use this path when queries are plentiful and terms
are dense; WAND wins when k is small relative to very long posting lists
AND per-doc evaluation is expensive — at Python speeds the vectorized
full scan is usually faster, which is why this is the default fast path.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from word2doc_spark.index.manifest import Manifest
from word2doc_spark.index.postings import decode_postings
from word2doc_spark.query.exact import _matched_postings, analyze_queries

RESULT_SCHEMA = "query_id long, rank int, doc_id long, score double"


def fast_topk(
    term_rows: list[tuple[float, float, bytes]],
    k: int, mode: str, k1: float, b: float, avgdl: float,
    dl: np.ndarray | None,
) -> list[tuple[int, float]]:
    """Exact top-k by full vectorized accumulation. term_rows: (w_q, idf,
    payload)."""
    doc_parts: list[np.ndarray] = []
    score_parts: list[np.ndarray] = []
    for w, idf, payload in term_rows:
        if w <= 0.0:
            continue
        docs, tfs = decode_postings(payload)
        tfs = tfs.astype(np.float64)
        if mode == "drqa":
            contrib = (w * idf) * np.log1p(tfs)
        else:
            d = dl[docs.astype(np.int64)].astype(np.float64) \
                if dl is not None else np.full(docs.size, avgdl)
            contrib = w * (tfs * (k1 + 1.0)) / (
                tfs + k1 * (1.0 - b + b * d / avgdl))
        doc_parts.append(docs.astype(np.int64))
        score_parts.append(contrib)
    if not doc_parts:
        return []
    all_docs = np.concatenate(doc_parts)
    all_scores = np.concatenate(score_parts)
    uniq, inv = np.unique(all_docs, return_inverse=True)
    acc = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(acc, inv, all_scores)
    if uniq.size > k:
        # keep every doc scoring ≥ the k-th score so boundary ties resolve
        # by doc_id in the full sort below (exact-path tie semantics)
        thresh = np.partition(acc, uniq.size - k)[uniq.size - k]
        cand = np.flatnonzero(acc >= thresh)
    else:
        cand = np.arange(uniq.size)
    order = cand[np.lexsort((uniq[cand], -acc[cand]))][:k]
    return [(int(uniq[i]), float(acc[i])) for i in order]


def search_fast(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    score_mode: str | None = None,
) -> DataFrame:
    """Same output contract (and rows) as search_exact / search_wand."""
    manifest = Manifest(index_dir)
    config, stats = manifest.load()
    mode = score_mode or config.score_mode
    n_docs = int(stats["n_docs"])
    avgdl = float(stats["avgdl"])
    k1, b = config.k1, config.b

    q_terms = analyze_queries(queries, config)
    term_ids = [r["term_id"]
                for r in q_terms.select("term_id").distinct().collect()]
    if not term_ids:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, url string, score double")
    postings = _matched_postings(spark, index_dir, term_ids, config.num_shards)
    joined = postings.join(F.broadcast(q_terms), "term_id") \
                     .select("query_id", "qtf", "df", "payload")

    dl_bc = None
    if mode == "bm25":
        pdf = spark.read.parquet(os.path.join(index_dir, "doclen")).toPandas()
        dl_arr = np.zeros(n_docs, dtype=np.uint32)
        dl_arr[pdf["doc_id"].to_numpy()] = pdf["dl"].to_numpy()
        dl_bc = spark.sparkContext.broadcast(dl_arr)

    def run_query(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        dfs = pdf["df"].to_numpy().astype(np.float64)
        idfs = np.maximum(np.log((n_docs - dfs + 0.5) / (dfs + 0.5)), 0.0)
        w_qs = np.log1p(pdf["qtf"].to_numpy().astype(np.float64)) * idfs
        rows = [(float(w_qs[i]), float(idfs[i]), pdf["payload"].iloc[i])
                for i in range(len(pdf)) if w_qs[i] > 0.0]
        dl = dl_bc.value if dl_bc is not None else None
        top = fast_topk(rows, k, mode, k1, b, avgdl, dl)
        return pd.DataFrame({
            "query_id": np.full(len(top), qid, dtype=np.int64),
            "rank": np.arange(1, len(top) + 1, dtype=np.int32),
            "doc_id": np.array([d for d, _ in top], dtype=np.int64),
            "score": np.array([s for _, s in top], dtype=np.float64),
        })

    topk = joined.groupBy("query_id").applyInPandas(run_query, RESULT_SCHEMA)
    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    return (docs.join(F.broadcast(topk), "doc_id")
                .select("query_id", "rank", "doc_id", "url", "score")
                .orderBy("query_id", "rank"))
