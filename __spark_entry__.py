"""Driver contract for the spark-graft builder (PySpark target).

Two families of entries:

* SQL-twin queries — expressed with built-in pyspark.sql.functions over a
  simple ``[a-z0-9]+`` analyzer so DuckDB can run a bit-matching oracle
  (same tokenization, same double math, scores rounded to 6 dp on both
  sides). These cover the SQL-expressible operator rows of SURVEY.md §2
  (D1-D6, E1-E3, F1, G-ops, plus the training-data ops).
* engine_* queries — the real murmur-hashed inverted-index engine
  (build + exact/WAND query). Not SQL-expressible (murmur3 + regex-module
  tokenization); the driver records rows-only checks, and the strong
  rank/score-identity gate lives in tests/ against the numpy oracle.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.sql import Window

from word2doc_spark.config import IndexConfig
from word2doc_spark.functions.stopwords import (
    DE_STOPWORDS, FR_STOPWORDS, STOPWORDS,
)
from word2doc_spark.ops import dedup as D
from word2doc_spark.ops import similarity as S
from word2doc_spark.ops import textstats as TS

# ---------------------------------------------------------------------------
# fixed query set (simple analyzer: lower + split on non-alnum)
# ---------------------------------------------------------------------------

QUERY_SET = [
    (1, "spark shuffle partition join"),
    (2, "hash table scan fast"),
    (3, "window order data column"),
    (4, "customer line query batch value"),
    (5, "row row scan slow"),          # repeated term → qtf 2
]
TOPK = 10

# ANN-LSH fixture parameters: the hyperplanes are seeded constants, so the
# DuckDB oracle embeds them as SQL literals (testdata embeddings are 64-d)
_LSH_PLANES = 8
_LSH_SEED = 7
_LSH_TABLES = 4
_EMB_DIM = 64


def _tokenize_simple(q: str) -> list[str]:
    import re
    return [t for t in re.split(r"[^a-z0-9]+", q.lower()) if t]


def _query_terms() -> list[tuple[int, str, int]]:
    rows = []
    for qid, q in QUERY_SET:
        from collections import Counter
        for term, qtf in sorted(Counter(_tokenize_simple(q)).items()):
            rows.append((qid, term, qtf))
    return rows


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _docs_with_planted_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ a re-keyed copy of its first 25 docs — the sf fixtures
    contain no exact duplicates, so an oracle check on the raw table only
    proves both engines return nothing; the planted copies make the
    group/survivor semantics observable (keep = min doc_id)."""
    docs = _docs(spark, sf_dir)
    copies = (docs.filter(F.col("doc_id") < 25)
                  .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000)))
    return docs.unionByName(copies)


def _tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (TS.exploded_tokens(_docs(spark, sf_dir))
            .groupBy("doc_id", F.col("token").alias("term"))
            .agg(F.count("*").alias("tf")))


def _scored(spark: SparkSession, sf_dir: str, mode: str) -> DataFrame:
    """DrQA / BM25 scoring with the simple analyzer (SQL-twin path)."""
    docs = _docs(spark, sf_dir)
    n_docs = docs.count()
    tf = _tf(spark, sf_dir)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    qt = spark.createDataFrame(_query_terms(),
                               "query_id int, term string, qtf int")
    idf = F.greatest(
        F.lit(0.0),
        F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)))
    j = (tf.join(dfreq, "term").join(F.broadcast(qt), "term")
           .withColumn("idf", idf))
    if mode == "drqa":
        contrib = (F.log1p(F.col("qtf").cast("double")) * F.col("idf")
                   * F.col("idf") * F.log1p(F.col("tf").cast("double")))
        per = j.withColumn("contrib", contrib)
    else:
        dl = (TS.exploded_tokens(docs).groupBy("doc_id")
              .agg(F.count("*").alias("dl")))
        avgdl = dl.agg(F.avg("dl")).collect()[0][0]
        per = (j.join(dl, "doc_id")
                .withColumn(
                    "contrib",
                    F.log1p(F.col("qtf").cast("double")) * F.col("idf")
                    * (F.col("tf").cast("double") * 2.2)
                    / (F.col("tf").cast("double")
                       + 1.2 * (0.25 + 0.75 * F.col("dl") / F.lit(float(avgdl))))))
    scored = per.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("s"))
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= TOPK)
            .select("query_id", "rank", "doc_id",
                    F.round("s", 6).alias("score")))


# ---------------------------------------------------------------------------
# engine-path queries (murmur-hash index; rows-only driver check)
# ---------------------------------------------------------------------------

_ENGINE_CFG = IndexConfig(hash_size=2 ** 22, num_shards=8,
                          score_mode="drqa")


def _engine_index(spark: SparkSession, sf_dir: str) -> str:
    from word2doc_spark.index.build import build_index
    from word2doc_spark.index.manifest import Manifest
    from word2doc_spark.sources.pages import pages_from_documents

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    index_dir = f"/tmp/w2d_entry_index_{tag}"
    # a published cache is reused ONLY if it was built under the current
    # config — a stale cache from an older semantic version must rebuild
    manifest = Manifest(index_dir)
    fresh = False
    if manifest.is_published():
        try:
            cached_cfg, _ = manifest.load()
            fresh = cached_cfg.to_dict() == _ENGINE_CFG.to_dict()
        except Exception:
            fresh = False
    if not fresh:
        import shutil
        shutil.rmtree(index_dir, ignore_errors=True)
        pages = pages_from_documents(spark, sf_dir)
        build_index(spark, pages, index_dir, _ENGINE_CFG,
                    input_token=sf_dir)
    return index_dir


def _engine_queries_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(qid, q) for qid, q in QUERY_SET], "query_id long, query string")


def _engine_topk(spark, sf_dir, mode, path):
    from word2doc_spark.query.exact import search_exact
    from word2doc_spark.query.fast import search_fast
    from word2doc_spark.query.wand import search_wand
    index_dir = _engine_index(spark, sf_dir)
    fn = {"exact": search_exact, "wand": search_wand,
          "fast": search_fast}[path]
    out = fn(spark, index_dir, _engine_queries_df(spark), k=TOPK,
             score_mode=mode)
    return out.select("query_id", "rank", "url",
                      F.round("score", 6).alias("score"))


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full engine build + exact DrQA top-k at sf0.001."""
    return _engine_topk(spark, "/root/testdata/sf0.001", "drqa", "exact")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- retrieval core, SQL-twin analyzer (D1-D6, E2, F1) ---
    q["tf_per_doc"] = lambda s, d: _tf(s, d)
    def doc_freq_idf(s, d):
        n = float(_docs(s, d).count())
        return (_tf(s, d).groupBy("term").agg(F.count("*").alias("df"))
                .select("term", "df",
                        F.round(F.greatest(F.lit(0.0),
                                F.log((F.lit(n) - F.col("df") + 0.5)
                                      / (F.col("df") + 0.5))), 6).alias("idf")))
    q["doc_freq_idf"] = doc_freq_idf
    q["corpus_stats"] = lambda s, d: (
        TS.exploded_tokens(_docs(s, d))
        .agg(F.countDistinct("doc_id").alias("n_docs"),
             F.count("*").alias("n_tokens"),
             F.countDistinct("token").alias("n_terms"),
             F.round(F.count("*").cast("double")
                     / F.countDistinct("doc_id"), 6).alias("avgdl")))
    q["drqa_topk"] = lambda s, d: _scored(s, d, "drqa")
    q["bm25_topk"] = lambda s, d: _scored(s, d, "bm25")
    q["doc_id_assign"] = lambda s, d: (
        _docs(s, d).select(
            F.concat(F.lit("https://fixtures.local/"), F.col("source"),
                     F.lit("/"), F.col("doc_id").cast("string")).alias("url"))
        .withColumn("new_doc_id",
                    (F.row_number().over(Window.orderBy("url")) - 1)
                    .cast("long")))

    # --- training-data ops: text analysis ---
    q["token_counts"] = lambda s, d: TS.token_counts(_docs(s, d))
    q["lang_id"] = lambda s, d: TS.lang_id(_docs(s, d))
    q["quality_score"] = lambda s, d: TS.quality_score(_docs(s, d))
    q["fingerprint"] = lambda s, d: TS.fingerprint(_docs(s, d))
    q["bpe_ish_token_counts"] = lambda s, d: TS.bpe_ish_token_counts(
        _docs(s, d))

    # --- training-data ops: dedup ---
    q["dedup_exact"] = lambda s, d: (
        D.exact_duplicates(_docs_with_planted_dupes(s, d))
        .select("fp", "n_dups", "keep_doc_id"))
    q["minhash_sigs"] = lambda s, d: D.minhash_signatures(
        _docs(s, d), num_perm=8, shingle_n=3)
    q["ngram_jaccard"] = lambda s, d: D.ngram_jaccard_pairs(
        _docs(s, d), shingle_n=3, threshold=0.05)
    q["simhash"] = lambda s, d: D.simhash64(_docs(s, d))
    q["lsh_pairs"] = lambda s, d: D.lsh_candidate_pairs(
        _docs(s, d), num_perm=8, bands=4)

    # --- similarity search ---
    q["ann_cosine_topk"] = lambda s, d: S.brute_force_topk(
        _emb(s, d),
        _emb(s, d).filter(F.col("vec_id") < 5)
                  .select(F.col("vec_id").alias("query_vec_id"), "embedding"),
        k=5)
    q["ann_lsh_topk"] = lambda s, d: S.lsh_topk(
        _emb(s, d),
        _emb(s, d).filter(F.col("vec_id") < 5)
                  .select(F.col("vec_id").alias("query_vec_id"), "embedding"),
        k=5, n_planes=_LSH_PLANES, seed=_LSH_SEED, n_tables=_LSH_TABLES)
    # embedding-cosine near-dup sweep (threshold tuned to the random-vector
    # fixture, whose max pairwise cosine is ~0.4)
    q["emb_near_dup"] = lambda s, d: S.embedding_near_dupes(
        _emb(s, d), threshold=0.3, n_planes=_LSH_PLANES, seed=_LSH_SEED,
        n_tables=2)
    q["ann_ivf_topk"] = lambda s, d: S.ivf_topk(
        _emb(s, d),
        _emb(s, d).filter(F.col("vec_id") < 5)
                  .select(F.col("vec_id").alias("query_vec_id"), "embedding"),
        k=5, n_cells=16, n_probe=4)

    # recall@5 of the approximate paths vs the brute-force oracle — makes
    # ANN quality visible to the driver gate, not just pytest
    def ann_recall(s, d):
        qv = (_emb(s, d).filter(F.col("vec_id") < 5)
              .select(F.col("vec_id").alias("query_vec_id"), "embedding"))
        bf = S.brute_force_topk(_emb(s, d), qv, k=5)
        approx = {
            "lsh": S.lsh_topk(_emb(s, d), qv, k=5, n_planes=_LSH_PLANES,
                              seed=_LSH_SEED, n_tables=_LSH_TABLES,
                              dim=_EMB_DIM),
            "ivf": S.ivf_topk(_emb(s, d), qv, k=5, n_cells=16, n_probe=4),
        }
        qs = bf.select("query_vec_id").distinct()
        outs = []
        for method, res in approx.items():
            hits = (res.select("query_vec_id", "neighbor_id")
                    .join(bf.select("query_vec_id", "neighbor_id"),
                          ["query_vec_id", "neighbor_id"])
                    .groupBy("query_vec_id")
                    .agg((F.count("*") / F.lit(5.0)).alias("r")))
            outs.append(
                qs.join(hits, "query_vec_id", "left")
                  .agg(F.count("*").alias("n_queries"),
                       F.round(F.avg(F.coalesce(F.col("r"), F.lit(0.0))), 6)
                        .alias("recall_at_5"))
                  .select(F.lit(method).alias("method"), "n_queries",
                          "recall_at_5"))
        return outs[0].unionByName(outs[1])
    q["ann_recall"] = ann_recall

    # --- label extraction (C10 parity) ---
    def para_label(s, d):
        from word2doc_spark.ops.evaluation import first_paragraph_label
        return first_paragraph_label(_docs(s, d))
    q["first_paragraph_label"] = para_label

    # --- B5/C15: title sanitizer (pseudo-title = first 60 chars) ---
    def title_sanitize(s, d):
        from word2doc_spark.ops.textstats import sanitize_titles
        titled = _docs(s, d).select(
            "doc_id", F.substring("text", 1, 60).alias("title"))
        return sanitize_titles(titled).select("doc_id", "clean_title")
    q["title_sanitize"] = title_sanitize

    # --- D7/D8: retrieval-quality evaluation over the drqa ranking ---
    # labels/relevance are carved deterministically out of the ranking
    # itself (rank-3 doc = label; ranks {2,5,9} = relevant set) so the ops
    # exercise nontrivial hit/miss joins with an exact SQL twin
    def topk_acc(s, d):
        from word2doc_spark.ops.evaluation import topk_accuracy
        res = _scored(s, d, "drqa")
        labels = res.filter(F.col("rank") == 3).select(
            "query_id", F.col("doc_id").alias("label_doc_id"))
        return topk_accuracy(res, labels, ks=(1, 5, 10), key="doc_id")
    q["topk_accuracy"] = topk_acc

    def map_eval(s, d):
        from word2doc_spark.ops.evaluation import mean_average_precision
        res = _scored(s, d, "drqa")
        rel = res.filter(F.col("rank").isin([2, 5, 9])).select(
            "query_id", "doc_id")
        return mean_average_precision(res, rel, key="doc_id")
    q["mean_average_precision"] = map_eval

    # --- multimodal plumbing (payload = text bytes; decode is the
    # documented deterministic stub — no codecs in this container) ---
    def frame_plan(s, d):
        from word2doc_spark.ops.multimodal import (
            frame_sample_plan, media_from_documents)
        return frame_sample_plan(media_from_documents(_docs(s, d)),
                                 every_ms=1000)
    q["frame_plan"] = frame_plan

    def mm_features(s, d):                                     # rows-only
        from word2doc_spark.ops.multimodal import (
            decode_features, media_from_documents)
        feats = decode_features(media_from_documents(_docs(s, d)))
        # the driver's canonicalizer sorts columns — emit sortable scalars
        # (md5 of the 6-dp-rounded vector), not a raw array<double>
        return feats.select(
            "media_id", "kind", "decoder",
            F.md5(F.concat_ws(",", F.transform(
                F.col("features"),
                lambda x: F.round(x, 6).cast("string")))).alias("feat_hash"))
    q["multimodal_features"] = mm_features

    # --- relational coverage: windows + multi-join agg (D/E/F ops) ---
    def events_sessionize(s, d):
        ev = s.read.parquet(f"{d}/events.parquet")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        with_prev = ev.withColumn("prev_ts", F.lag("ts").over(w))
        # events.ts is TIMESTAMP_NTZ; to_utc_timestamp(ntz, 'UTC') fixes the
        # wall clock as UTC regardless of session timezone, so the gap math
        # is timezone-invariant like DuckDB's epoch_us
        def _us(c):
            return F.unix_micros(F.to_utc_timestamp(c, "UTC"))
        gap_us = _us(F.col("ts")) - _us(F.col("prev_ts"))
        per_ev = with_prev.withColumn(
            "new_sess",
            F.when(F.col("prev_ts").isNull() | (gap_us > 1800 * 1000000), 1)
             .otherwise(0))
        return (per_ev.groupBy("user_id")
                .agg(F.count("*").alias("n_events"),
                     F.sum("new_sess").alias("n_sessions")))
    q["events_sessionize"] = events_sessionize

    def top_customers(s, d):
        cust = s.read.parquet(f"{d}/customer.parquet")
        orders = s.read.parquet(f"{d}/orders.parquet")
        li = s.read.parquet(f"{d}/lineitem.parquet")
        rev = (li.join(orders, li.l_orderkey == orders.o_orderkey)
                 .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
                 .groupBy("c_custkey", "c_name")
                 .agg(F.round(F.sum(F.col("l_extendedprice")
                                    * (1 - F.col("l_discount"))), 2)
                      .alias("revenue"),
                      F.count("*").alias("n_items")))
        w = Window.orderBy(F.desc("revenue"), F.asc("c_custkey"))
        return (rev.withColumn("rank", F.row_number().over(w).cast("long"))
                   .filter(F.col("rank") <= 10)
                   .select("rank", "c_custkey", "c_name", "revenue", "n_items"))
    q["top_customers"] = top_customers

    # --- engine paths (murmur-hash index; rows-only) ---
    q["engine_drqa_topk"] = lambda s, d: _engine_topk(s, d, "drqa", "exact")
    q["engine_bm25_topk"] = lambda s, d: _engine_topk(s, d, "bm25", "exact")
    q["engine_wand_topk"] = lambda s, d: _engine_topk(s, d, "drqa", "wand")
    q["engine_fast_topk"] = lambda s, d: _engine_topk(s, d, "drqa", "fast")
    return q


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_TOK = ("list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
        "t -> t <> '')")


def _sql_array(words) -> str:
    inner = ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(words))
    return f"[{inner}]"


def _values_qterms() -> str:
    return ", ".join(f"({qid}, '{t}', {qtf})"
                     for qid, t, qtf in _query_terms())


def _topk_sql(mode: str) -> str:
    contrib = {
        "drqa": "ln(1 + q.qtf) * d.idf * d.idf * ln(1 + tf.tf)",
        "bm25": ("ln(1 + q.qtf) * d.idf * (tf.tf * 2.2) / "
                 "(tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / "
                 "(SELECT avg(dl) FROM dls)))"),
    }[mode]
    dl_join = "JOIN dls dl ON dl.doc_id = tf.doc_id" if mode == "bm25" else ""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2
), dls AS (
  SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1
), dfreq AS (
  SELECT term, count(*)::DOUBLE AS df,
         greatest(0.0, ln(((SELECT count(*) FROM documents) - count(*) + 0.5)
                          / (count(*) + 0.5))) AS idf
  FROM tf GROUP BY term
), q(query_id, term, qtf) AS (
  VALUES {_values_qterms()}
), contrib AS (
  SELECT q.query_id, tf.doc_id, {contrib} AS c
  FROM tf JOIN dfreq d USING (term) JOIN q USING (term) {dl_join}
), scored AS (
  SELECT query_id, doc_id, sum(c) AS s,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sum(c) DESC, doc_id) AS rank
  FROM contrib GROUP BY query_id, doc_id
)
SELECT query_id, rank, doc_id, round(s, 6) AS score
FROM scored WHERE rank <= {TOPK}
"""


def _ann_lsh_sql() -> str:
    """DuckDB twin of ann_lsh_topk: the seeded random hyperplanes become
    SQL array literals; bucket = sum of sign bits, tables unioned."""
    from word2doc_spark.ops.similarity import random_hyperplanes

    def bucket(col: str, planes) -> str:
        terms = []
        for i, plane in enumerate(planes):
            arr = "[" + ", ".join(repr(float(x)) for x in plane) + "]"
            terms.append(f"(CASE WHEN list_inner_product({col}, {arr}) > 0 "
                         f"THEN {1 << i} ELSE 0 END)")
        return " + ".join(terms)

    vb_parts, qb_parts = [], []
    for t in range(_LSH_TABLES):
        planes = random_hyperplanes(_EMB_DIM, _LSH_PLANES,
                                    _LSH_SEED + 101 * t)
        vb_parts.append(
            f"SELECT vec_id, {t} AS tbl, {bucket('e', planes)} AS bucket "
            f"FROM v")
        qb_parts.append(
            f"SELECT query_vec_id, {t} AS tbl, {bucket('qe', planes)} "
            f"AS bucket FROM q")
    vb = "\nUNION ALL\n".join(vb_parts)
    qb = "\nUNION ALL\n".join(qb_parts)
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id AS query_vec_id, embedding::DOUBLE[] AS qe
      FROM embeddings WHERE vec_id < 5),
vb AS ({vb}),
qb AS ({qb}),
cand AS (
  SELECT DISTINCT qb.query_vec_id, vb.vec_id AS neighbor_id
  FROM vb JOIN qb ON vb.tbl = qb.tbl AND vb.bucket = qb.bucket
  WHERE vb.vec_id <> qb.query_vec_id
),
scored AS (
  SELECT c.query_vec_id, c.neighbor_id,
         round(list_cosine_similarity(v.e, q.qe), 6) AS cosine,
         row_number() OVER (
           PARTITION BY c.query_vec_id
           ORDER BY round(list_cosine_similarity(v.e, q.qe), 6) DESC,
                    c.neighbor_id) AS rank
  FROM cand c JOIN v ON v.vec_id = c.neighbor_id
              JOIN q ON q.query_vec_id = c.query_vec_id
)
SELECT query_vec_id, rank, neighbor_id, cosine FROM scored WHERE rank <= 5"""


def _emb_near_dup_sql(threshold: float = 0.3, n_tables: int = 2) -> str:
    """DuckDB twin of emb_near_dup: same seeded hyperplane buckets as
    _ann_lsh_sql, self-join, exact-cosine threshold."""
    from word2doc_spark.ops.similarity import random_hyperplanes

    def bucket(col: str, planes) -> str:
        terms = []
        for i, plane in enumerate(planes):
            arr = "[" + ", ".join(repr(float(x)) for x in plane) + "]"
            terms.append(f"(CASE WHEN list_inner_product({col}, {arr}) > 0 "
                         f"THEN {1 << i} ELSE 0 END)")
        return " + ".join(terms)

    parts = []
    for t in range(n_tables):
        planes = random_hyperplanes(_EMB_DIM, _LSH_PLANES,
                                    _LSH_SEED + 101 * t)
        parts.append(
            f"SELECT vec_id, {t} AS tbl, {bucket('e', planes)} AS bucket "
            f"FROM v")
    vb = "\nUNION ALL\n".join(parts)
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
vb AS ({vb}),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM vb a JOIN vb b ON a.tbl = b.tbl AND a.bucket = b.bucket
                      AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
       round(list_cosine_similarity(va.e, vb2.e), 6) AS cosine
FROM cand c JOIN v va ON va.vec_id = c.vec_a
            JOIN v vb2 ON vb2.vec_id = c.vec_b
WHERE list_cosine_similarity(va.e, vb2.e) >= {threshold}"""


def oracle_sql() -> dict[str, str]:
    sw = _sql_array(STOPWORDS)
    de = _sql_array(DE_STOPWORDS)
    fr = _sql_array(FR_STOPWORDS)
    md5l = "(('0x' || substring(md5({x}), 1, 15))::BIGINT)"
    o: dict[str, str] = {}

    o["tf_per_doc"] = f"""
SELECT doc_id, term, count(*) AS tf
FROM (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
GROUP BY doc_id, term"""

    o["doc_freq_idf"] = f"""
WITH tf AS (
  SELECT doc_id, term FROM
    (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
  GROUP BY doc_id, term
)
SELECT term, count(*) AS df,
       round(greatest(0.0,
         ln(((SELECT count(*) FROM documents) - count(*) + 0.5)
            / (count(*) + 0.5))), 6) AS idf
FROM tf GROUP BY term"""

    o["corpus_stats"] = f"""
WITH tok AS (SELECT doc_id, unnest({_TOK}) AS token FROM documents)
SELECT count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_tokens,
       count(DISTINCT token) AS n_terms,
       round(count(*)::DOUBLE / count(DISTINCT doc_id), 6) AS avgdl
FROM tok"""

    o["drqa_topk"] = _topk_sql("drqa")
    o["bm25_topk"] = _topk_sql("bm25")

    o["doc_id_assign"] = """
SELECT url, row_number() OVER (ORDER BY url) - 1 AS new_doc_id
FROM (SELECT 'https://fixtures.local/' || source || '/' || doc_id AS url
      FROM documents)"""

    o["token_counts"] = f"""
SELECT doc_id,
       len({_TOK}) AS n_tokens,
       len(list_distinct({_TOK})) AS n_distinct,
       length(text) AS n_chars
FROM documents"""

    o["lang_id"] = f"""
WITH t AS (
  SELECT doc_id, list_distinct({_TOK}) AS toks FROM documents
), r AS (
  SELECT doc_id,
    len(list_intersect(toks, {sw}))::DOUBLE / greatest(len(toks), 1) AS en,
    len(list_intersect(toks, {de}))::DOUBLE / greatest(len(toks), 1) AS de,
    len(list_intersect(toks, {fr}))::DOUBLE / greatest(len(toks), 1) AS fr
  FROM t
)
SELECT doc_id,
  CASE WHEN greatest(en, de, fr) <= 0.0 THEN 'und'
       WHEN en = greatest(en, de, fr) THEN 'en'
       WHEN de = greatest(en, de, fr) THEN 'de'
       ELSE 'fr' END AS lang_guess
FROM r"""

    o["quality_score"] = f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
m AS (
  SELECT doc_id, len(toks) AS n,
    len(list_filter(toks, x -> list_contains({sw}, x)))::DOUBLE
      / greatest(len(toks), 1) AS swr,
    coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::DOUBLE
      / greatest(len(toks), 1) AS mtl
  FROM t
)
SELECT doc_id, n AS n_tokens, round(swr, 6) AS stopword_ratio,
       round(mtl, 6) AS mean_token_len,
       round(CASE WHEN n < 5 THEN 0.0 ELSE
         least(1.0, n / 100.0) * 0.4
         + CASE WHEN swr >= 0.05 AND swr <= 0.6 THEN 0.4 ELSE 0.0 END
         + CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 0.2 ELSE 0.0 END
       END, 6) AS quality
FROM m"""

    o["bpe_ish_token_counts"] = r"""
WITH c AS (
  SELECT doc_id,
         coalesce(len(regexp_extract_all(text,
                  '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')), 0) AS n_pieces,
         coalesce(len(list_filter(string_split_regex(text, '\s+'),
                  w -> w <> '')), 0) AS n_words
  FROM documents
)
SELECT doc_id, n_pieces, n_words,
       round(n_pieces::DOUBLE / greatest(n_words, 1), 6) AS pieces_per_word
FROM c"""

    o["fingerprint"] = f"""
SELECT doc_id, md5(array_to_string({_TOK}, ' ')) AS fp FROM documents"""

    o["dedup_exact"] = f"""
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 25
), fp AS (
  SELECT doc_id, md5(array_to_string({_TOK}, ' ')) AS fp FROM docs2
)
SELECT fp, count(*) AS n_dups, min(doc_id) AS keep_doc_id
FROM fp GROUP BY fp HAVING count(*) > 1"""

    # deterministic shingles straight off the token list (1-indexed lists)
    shingle_cte = f"""
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(len(toks) - 2),
                i -> toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]))
           AS shingle
  FROM (SELECT doc_id, {_TOK} AS toks FROM documents)
)"""

    o["minhash_sigs"] = f"""
WITH {shingle_cte},
perms AS (SELECT unnest(range(8)) AS perm)
SELECT doc_id, perm,
       min({md5l.format(x="perm::VARCHAR || ':' || shingle")}) AS minhash
FROM sh CROSS JOIN perms
GROUP BY doc_id, perm"""

    o["ngram_jaccard"] = f"""
WITH {shingle_cte},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
dfsh AS (SELECT shingle, count(*) AS df_sh FROM sh GROUP BY shingle),
rare AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfsh USING (shingle)
         WHERE df_sh <= 1000),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM rare a JOIN rare b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(inter::DOUBLE / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE inter::DOUBLE / (sa.n_sh + sb.n_sh - inter) >= 0.05"""

    o["lsh_pairs"] = f"""
WITH {shingle_cte},
perms AS (SELECT unnest(range(8)) AS perm),
sig AS (
  SELECT doc_id, perm,
         min({md5l.format(x="perm::VARCHAR || ':' || shingle")}) AS minhash
  FROM sh CROSS JOIN perms GROUP BY doc_id, perm
),
banded AS (
  SELECT doc_id, floor(perm / 2)::INT AS band,
         md5(array_to_string(list_sort(
             list(perm::VARCHAR || ':' || minhash::VARCHAR)), ',')) AS band_sig
  FROM sig GROUP BY doc_id, floor(perm / 2)::INT
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id"""

    o["ann_cosine_topk"] = """
WITH q AS (
  SELECT vec_id AS query_vec_id, embedding::DOUBLE[] AS qe
  FROM embeddings WHERE vec_id < 5
), scored AS (
  SELECT q.query_vec_id, v.vec_id AS neighbor_id,
         round(list_cosine_similarity(v.embedding::DOUBLE[], q.qe), 6)
           AS cosine,
         row_number() OVER (
           PARTITION BY q.query_vec_id
           ORDER BY round(list_cosine_similarity(v.embedding::DOUBLE[], q.qe),
                          6) DESC,
                    v.vec_id) AS rank
  FROM embeddings v CROSS JOIN q
  WHERE v.vec_id <> q.query_vec_id
)
SELECT query_vec_id, rank, neighbor_id, cosine FROM scored WHERE rank <= 5"""

    o["first_paragraph_label"] = """
SELECT doc_id, coalesce(
  list_filter(string_split(text, chr(10) || chr(10)),
              p -> length(p) >= 100)[1],
  list_filter(string_split(text, chr(10) || chr(10)),
              p -> length(p) > 0)[1]) AS label
FROM documents"""

    o["events_sessionize"] = """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id))
                      > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
)
SELECT user_id, count(*) AS n_events, sum(new_sess)::BIGINT AS n_sessions
FROM flagged GROUP BY user_id"""

    o["top_customers"] = """
WITH rev AS (
  SELECT c_custkey, c_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n_items
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  GROUP BY c_custkey, c_name
)
SELECT row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rank,
       c_custkey, c_name, revenue, n_items
FROM rev
ORDER BY rank LIMIT 10"""

    o["simhash"] = f"""
WITH toks AS (SELECT doc_id, unnest({_TOK}) AS token FROM documents),
h AS (SELECT doc_id, {md5l.format(x="token")} AS h FROM toks),
bits AS (
  SELECT doc_id, b.pos, ((h >> b.pos) & 1) * 2 - 1 AS vote
  FROM h CROSS JOIN (SELECT unnest(range(60)) AS pos) b
),
votes AS (SELECT doc_id, pos, sum(vote) AS v FROM bits GROUP BY 1, 2),
sim AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN (1::BIGINT << pos) ELSE 0 END)::BIGINT
           AS simhash
  FROM votes GROUP BY doc_id
)
SELECT d.doc_id, coalesce(sim.simhash, 0)::BIGINT AS simhash
FROM documents d LEFT JOIN sim ON sim.doc_id = d.doc_id"""

    o["ann_lsh_topk"] = _ann_lsh_sql()
    o["emb_near_dup"] = _emb_near_dup_sql()

    o["ann_ivf_topk"] = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cent AS (SELECT vec_id AS cell_id, e AS cemb FROM v
         ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16),
assign AS (
  SELECT vec_id, e, cell_id FROM (
    SELECT v.vec_id, v.e, c.cell_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY round(list_cosine_similarity(v.e, c.cemb), 6) DESC,
                      c.cell_id) AS r
    FROM v CROSS JOIN cent c) WHERE r = 1
),
q AS (SELECT vec_id AS query_vec_id, e AS qe FROM v WHERE vec_id < 5),
probes AS (
  SELECT query_vec_id, qe, cell_id FROM (
    SELECT q.query_vec_id, q.qe, c.cell_id,
           row_number() OVER (
             PARTITION BY q.query_vec_id
             ORDER BY round(list_cosine_similarity(q.qe, c.cemb), 6) DESC,
                      c.cell_id) AS r
    FROM q CROSS JOIN cent c) WHERE r <= 4
),
cand AS (SELECT p.query_vec_id, p.qe, a.vec_id AS neighbor_id, a.e
         FROM assign a JOIN probes p USING (cell_id)
         WHERE a.vec_id <> p.query_vec_id),
scored AS (
  SELECT query_vec_id, neighbor_id,
         round(list_cosine_similarity(qe, e), 6) AS cosine,
         row_number() OVER (
           PARTITION BY query_vec_id
           ORDER BY round(list_cosine_similarity(qe, e), 6) DESC,
                    neighbor_id) AS rank
  FROM cand)
SELECT query_vec_id, rank, neighbor_id, cosine FROM scored WHERE rank <= 5"""

    def _recall_leg(method: str, cte: str) -> str:
        return f"""
SELECT '{method}' AS method, count(*) AS n_queries,
       round(avg(coalesce(h.c, 0) / 5.0), 6) AS recall_at_5
FROM (SELECT DISTINCT query_vec_id FROM bf) q
LEFT JOIN (SELECT query_vec_id, count(*) AS c
           FROM {cte} JOIN bf USING (query_vec_id, neighbor_id)
           GROUP BY 1) h USING (query_vec_id)"""

    o["ann_recall"] = f"""
WITH bf AS (SELECT * FROM ({o['ann_cosine_topk']})),
lsh AS (SELECT * FROM ({o['ann_lsh_topk']})),
ivf AS (SELECT * FROM ({o['ann_ivf_topk']}))
{_recall_leg('lsh', 'lsh')}
UNION ALL
{_recall_leg('ivf', 'ivf')}"""

    o["title_sanitize"] = r"""
WITH t AS (
  SELECT doc_id,
         regexp_replace(lower(substring(text, 1, 60)),
                        '[^\p{L}\p{N} ]', '', 'g') AS clean_title
  FROM documents
)
SELECT doc_id, clean_title FROM t WHERE clean_title <> ''"""

    drqa_sql = _topk_sql("drqa")
    o["topk_accuracy"] = f"""
WITH res AS ({drqa_sql}),
labels AS (SELECT query_id, doc_id AS label FROM res WHERE rank = 3),
hit AS (
  SELECT r.query_id, min(r.rank) AS hit_rank
  FROM res r JOIN labels l ON r.query_id = l.query_id AND r.doc_id = l.label
  GROUP BY 1
),
perq AS (
  SELECT l.query_id, h.hit_rank
  FROM (SELECT DISTINCT query_id FROM labels) l
  LEFT JOIN hit h USING (query_id)
)
SELECT count(*) AS n_queries,
       round(avg(CASE WHEN hit_rank <= 1 THEN 1.0 ELSE 0.0 END), 6)
         AS acc_at_1,
       round(avg(CASE WHEN hit_rank <= 5 THEN 1.0 ELSE 0.0 END), 6)
         AS acc_at_5,
       round(avg(CASE WHEN hit_rank <= 10 THEN 1.0 ELSE 0.0 END), 6)
         AS acc_at_10
FROM perq"""

    o["mean_average_precision"] = f"""
WITH res AS ({drqa_sql}),
rel AS (SELECT query_id, doc_id FROM res WHERE rank IN (2, 5, 9)),
marked AS (
  SELECT r.query_id, r.rank,
         CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS relv
  FROM res r
  LEFT JOIN rel ON rel.query_id = r.query_id AND rel.doc_id = r.doc_id
),
prec AS (
  SELECT query_id, rank, relv,
         sum(relv) OVER (PARTITION BY query_id ORDER BY rank)::DOUBLE / rank
           AS p
  FROM marked
),
ap AS (SELECT query_id, avg(p) AS ap FROM prec WHERE relv = 1
       GROUP BY query_id),
perq AS (
  SELECT q.query_id, coalesce(ap.ap, 0.0) AS ap
  FROM (SELECT DISTINCT query_id FROM rel) q LEFT JOIN ap USING (query_id)
)
SELECT count(*) AS n_queries, round(avg(ap), 6) AS map FROM perq"""

    o["frame_plan"] = """
SELECT doc_id AS media_id, x.i::INT AS frame_idx, (x.i * 1000)::INT AS ts_ms
FROM documents, LATERAL (
  SELECT unnest(range(doc_id % 20 + 1)) AS i) x
WHERE doc_id % 3 = 2"""

    # rows-only (no SQL twin): multimodal_features (stub decoder is a
    # sha256 fake), engine_* — murmur3 / regex-module analysis aren't
    # expressible in DuckDB SQL.
    return o
