"""SQuAD-style JSON scan → queries table.

The reference builds its query set from SQuAD v1.1 JSON
(/root/reference/src/word2doc/util/constants.py:31-35, bin pipeline
src/word2doc/optimizer/pre_process.py:31-139: json.load → per-article
paragraphs → qas → question/label pairs). Spark shape: one
``spark.read.json`` + two explodes — no bins, no process pools.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F


def squad_queries(spark: SparkSession, path: str) -> DataFrame:
    """SQuAD-shaped JSON (possibly multiLine) →
    (query_id long, query string, label string) where label = the
    article title (the reference's training label, pre_process.py:101)."""
    raw = spark.read.option("multiLine", "true").json(path)
    arts = raw.select(F.explode("data").alias("article"))
    paras = arts.select(
        F.col("article.title").alias("label"),
        F.explode("article.paragraphs").alias("para"))
    qas = paras.select("label", F.explode("para.qas").alias("qa"))
    out = qas.select(
        F.col("qa.id").alias("squad_id"),
        F.col("qa.question").alias("query"),
        "label",
    )
    # dense deterministic query_id by (question, squad_id) sort
    from pyspark.sql import Window
    w = Window.orderBy("squad_id", "query")
    return out.withColumn("query_id",
                          (F.row_number().over(w) - 1).cast("long")) \
              .select("query_id", "query", "label", "squad_id")


def trim_queries_rake(queries: DataFrame,
                      query_col: str = "query") -> DataFrame:
    """Reference query-set prep step (pre_process.py:92): replace each
    question with its top RAKE phrase, lowercased — 'take most relevant
    part of query'. Arrow-batched; see functions/rake.py for the
    algorithm-parity note."""
    import pandas as pd

    def run(it):
        from word2doc_spark.functions.rake import rake_top_phrase
        for pdf in it:
            if len(pdf):
                pdf = pdf.copy()
                pdf[query_col] = [rake_top_phrase(q or "")
                                  for q in pdf[query_col]]
            yield pdf

    return queries.mapInPandas(run, schema=queries.schema)


def dedup_substring_questions(queries: DataFrame,
                              max_rows: int = 200_000) -> DataFrame:
    """Reference B6 semantics (pre_process.py:94-98,113-118): drop a
    question when another kept question is a substring of it; prefer the
    shorter (contained) question. Expressed as a self-join + left_anti.

    Mutual containment (exact-duplicate questions contain each other) must
    not drop BOTH rows: a row is dropped only when the other query is a
    strict substring (shorter), or — for exact duplicates — when the other
    row has the smaller query_id (keep-first semantics).

    GUARD: substring containment is a non-equi self-join (O(n²) compares)
    — correct for query-set prep (the reference runs it over the SQuAD
    question list), catastrophic if pointed at a corpus. ``max_rows``
    bounds the input; raise it explicitly only for query-set-sized data."""
    n = queries.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"dedup_substring_questions: input exceeds max_rows={max_rows} "
            "— this non-equi self-join is for query-set prep, not corpora; "
            "use ops.dedup (exact/minhash-LSH) for document dedup")
    a = queries.alias("a")
    b = queries.alias("b")
    shorter = F.length(F.col("a.query")) > F.length(F.col("b.query"))
    dup_keep_first = ((F.col("a.query") == F.col("b.query"))
                      & (F.col("a.query_id") > F.col("b.query_id")))
    contained = (a.join(
        b,
        F.col("a.query").contains(F.col("b.query"))
        & (shorter | dup_keep_first),
        "left_semi"))
    return queries.join(contained.select("query_id"), "query_id", "left_anti")
