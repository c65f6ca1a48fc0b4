"""Retrieval-quality evaluation: top-k accuracy and MAP.

Parity with the reference's evaluation harness:
* top-1/5/10 hit counting over result lists —
  /root/reference/src/evaluation.py:32-38,50-96
* average precision / MAP (incremental AP per query, mean over the set) —
  /root/reference/src/evaluation.py:139-140,182-191

Re-expressed as DataFrame aggregations: results ⋈ labels on (query_id,
doc key), windowed precision-at-hit for AP. No human-in-the-loop MAP
(the reference prompts a human at stdin; here relevance = label match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def topk_accuracy(results: DataFrame, labels: DataFrame,
                  ks: tuple[int, ...] = (1, 5, 10),
                  key: str = "url") -> DataFrame:
    """results(query_id, rank, <key>), labels(query_id, label_<key>) →
    one row: n_queries, acc@k for each k (fraction of queries whose
    label appears within the top k)."""
    hit = (results.join(labels, "query_id")
           .filter(F.col(key) == F.col(f"label_{key}"))
           .groupBy("query_id")
           .agg(F.min("rank").alias("hit_rank")))
    per_q = labels.select("query_id").distinct().join(hit, "query_id", "left")
    aggs = [F.count("*").alias("n_queries")]
    for k in ks:
        aggs.append(
            F.round(F.avg(F.when(F.col("hit_rank") <= k, 1.0).otherwise(0.0)),
                    6).alias(f"acc_at_{k}"))
    return per_q.agg(*aggs)


def mean_average_precision(results: DataFrame, relevant: DataFrame,
                           key: str = "url") -> DataFrame:
    """results(query_id, rank, <key>), relevant(query_id, <key>) with
    possibly several relevant docs per query → one row (n_queries, map).

    AP = mean over relevant hits of precision@hit_rank (precision counted
    over the returned ranking), matching the reference's incremental
    `calculate_ap` update (evaluation.py:186-191).
    """
    marked = (results.join(
        relevant.withColumn("_rel", F.lit(1)), ["query_id", key], "left")
        .withColumn("_rel", F.coalesce(F.col("_rel"), F.lit(0))))
    w = (Window.partitionBy("query_id").orderBy("rank")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    prec = marked.withColumn("_cumrel", F.sum("_rel").over(w)) \
                 .withColumn("_prec", F.col("_cumrel") / F.col("rank"))
    ap = (prec.filter(F.col("_rel") == 1)
          .groupBy("query_id")
          .agg(F.avg("_prec").alias("ap")))
    per_q = (relevant.select("query_id").distinct()
             .join(ap, "query_id", "left")
             .withColumn("ap", F.coalesce(F.col("ap"), F.lit(0.0))))
    return per_q.agg(F.count("*").alias("n_queries"),
                     F.round(F.avg("ap"), 6).alias("map"))


def first_paragraph_label(docs: DataFrame, min_len: int = 100,
                          text_col: str = "text") -> DataFrame:
    """(doc_id, label) — first paragraph (split on blank line) of length
    ≥ min_len; falls back to the first non-empty paragraph. Parity with
    the reference label extractor
    (/root/reference/src/word2doc/labels/extractor.py:20-39, MIN_PP_LENGTH
    at :12) expressed as pure column ops (split/filter/element_at)."""
    paras = F.split(F.col(text_col), "\n\n")
    long_enough = F.filter(paras, lambda p: F.length(p) >= min_len)
    non_empty = F.filter(paras, lambda p: F.length(p) > 0)
    label = F.when(F.size(long_enough) > 0, F.element_at(long_enough, 1)) \
             .otherwise(F.when(F.size(non_empty) > 0,
                               F.element_at(non_empty, 1)))
    return docs.select("doc_id", label.alias("label"))
