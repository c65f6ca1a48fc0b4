"""Similarity search over an embedding column (array<float>).

* brute_force_topk — exact cosine top-k: query side broadcast, dot
  products via built-in higher-order functions (zip_with + aggregate,
  JVM-side), window top-k. The correctness baseline; O(Q·N) but fully
  distributed and shuffle-free until the final per-query window.
* lsh_topk — scale path: random-hyperplane LSH bucket join; only
  candidates sharing a bucket are scored. Recall<1 by design; the
  baseline is the oracle for its quality tests.

All float math is double-precision and sequential (aggregate folds left),
so the brute-force op has an exact DuckDB twin (list_cosine_similarity
is double too); scores are rounded to 6 dp on both sides before compare.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(vectors: DataFrame, queries: DataFrame,
                     k: int = 5) -> DataFrame:
    """vectors(vec_id, embedding), queries(query_vec_id, embedding) →
    (query_vec_id, rank, neighbor_id, cosine). Excludes self-matches."""
    from pyspark.sql import Window

    q = queries.select(F.col("query_vec_id"),
                       F.col("embedding").cast("array<double>").alias("qe"))
    v = vectors.select(F.col("vec_id").alias("neighbor_id"),
                       F.col("embedding").cast("array<double>").alias("ve"))
    scored = (v.crossJoin(F.broadcast(q))
               .filter(F.col("neighbor_id") != F.col("query_vec_id"))
               .select("query_vec_id", "neighbor_id",
                       F.round(cosine_col(F.col("qe"), F.col("ve")), 6)
                        .alias("cosine")))
    w = Window.partitionBy("query_vec_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .filter(F.col("rank") <= k)
                  .select("query_vec_id", "rank", "neighbor_id", "cosine"))


def random_hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_bucket(df: DataFrame, planes: np.ndarray, id_col: str,
               emb_col: str = "embedding") -> DataFrame:
    """Sign-of-projection bucket id per vector, built with zip_with/aggregate
    (JVM) — one bucket per vector (single hash table; multiple tables =
    union of calls with different seeds)."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        proj = _dot(F.col(emb_col).cast("array<double>"), arr)
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.select(F.col(id_col), F.col(emb_col), bucket.alias("bucket"))


def ivf_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
             n_cells: int = 16, n_probe: int = 4) -> DataFrame:
    """IVF-flat approximate cosine top-k (the inverted-file ANN shape).

    Coarse quantizer: ``n_cells`` centroids picked deterministically (the
    vectors with the smallest md5(vec_id) — a seedless random sample both
    Spark and a SQL oracle can reproduce). Every vector is assigned to its
    max-cosine centroid (one broadcast of n_cells rows; assignment scan is
    embarrassingly parallel and would be persisted as the IVF index in
    production). A query probes its ``n_probe`` closest cells and scores
    only their members exactly. Recall < 1 by design; the brute-force path
    is the quality oracle.

    At 100-TB scale: n_cells grows to O(√N); the only shuffles are the
    candidate equi-join on cell_id and the final per-query window — the
    all-pairs product never materializes.
    """
    from pyspark.sql import Window

    cent = (vectors
            .withColumn("_h", F.md5(F.encode(
                F.col("vec_id").cast("string"), "UTF-8")))
            .orderBy("_h", "vec_id")
            .limit(n_cells)
            .select(F.col("vec_id").alias("cell_id"),
                    F.col("embedding").cast("array<double>").alias("cemb")))

    def _closest(df, id_col, emb_col, keep):
        scored = (df.crossJoin(F.broadcast(cent))
                  .select(id_col, emb_col,
                          "cell_id",
                          F.round(cosine_col(F.col(emb_col)
                                             .cast("array<double>"),
                                             F.col("cemb")), 6)
                          .alias("csim")))
        w = Window.partitionBy(id_col).orderBy(
            F.desc("csim"), F.asc("cell_id"))
        return (scored.withColumn("_r", F.row_number().over(w))
                      .filter(F.col("_r") <= keep)
                      .select(id_col, emb_col, "cell_id"))

    assign = _closest(vectors.select("vec_id", "embedding"),
                      "vec_id", "embedding", 1)
    probes = _closest(queries.select("query_vec_id",
                                     F.col("embedding").alias("qe")),
                      "query_vec_id", "qe", n_probe)
    cand = (assign.join(probes, "cell_id")
            .filter(F.col("vec_id") != F.col("query_vec_id")))
    scored = cand.select(
        "query_vec_id", F.col("vec_id").alias("neighbor_id"),
        F.round(cosine_col(F.col("qe").cast("array<double>"),
                           F.col("embedding").cast("array<double>")), 6)
         .alias("cosine"))
    w = Window.partitionBy("query_vec_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .filter(F.col("rank") <= k)
                  .select("query_vec_id", "rank", "neighbor_id", "cosine"))


def embedding_near_dupes(vectors: DataFrame, threshold: float = 0.9,
                         n_planes: int = 8, seed: int = 7,
                         n_tables: int = 2) -> DataFrame:
    """(vec_a, vec_b, cosine) — embedding-cosine near-duplicate pairs.

    Candidates = vector pairs sharing a random-hyperplane bucket in any of
    ``n_tables`` tables (equi-join on (table, bucket) — never all-pairs);
    survivors = exact cosine ≥ threshold. The standard embedding near-dup
    sweep for training-data dedup: at 100 TB the bucket join bounds the
    candidate fan-out the same way MinHash-LSH bands do for text."""
    dim = len(vectors.select("embedding").first()["embedding"])
    v = vectors.select("vec_id", "embedding")
    cands = None
    for t in range(n_tables):
        planes = random_hyperplanes(dim, n_planes, seed + 101 * t)
        vb = lsh_bucket(v, planes, "vec_id").withColumn("tbl", F.lit(t))
        a = vb.alias("a")
        b = vb.alias("b")
        c = (a.join(b, (F.col("a.tbl") == F.col("b.tbl"))
                    & (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")))
               .select(F.col("a.vec_id").alias("vec_a"),
                       F.col("b.vec_id").alias("vec_b"),
                       F.col("a.embedding").alias("ea"),
                       F.col("b.embedding").alias("eb")))
        cands = c if cands is None else cands.unionByName(c)
    cand = cands.dropDuplicates(["vec_a", "vec_b"])
    cos = cosine_col(F.col("ea").cast("array<double>"),
                     F.col("eb").cast("array<double>"))
    return (cand.filter(cos >= threshold)
                .select("vec_a", "vec_b", F.round(cos, 6).alias("cosine")))


def lsh_topk(vectors: DataFrame, queries: DataFrame, k: int = 5,
             n_planes: int = 8, seed: int = 7,
             n_tables: int = 1) -> DataFrame:
    """Approximate cosine top-k: candidates = vectors sharing a bucket with
    the query in ANY of ``n_tables`` independent hash tables (multi-probe
    by table union — the standard recall lever; one table keeps the old
    single-bucket behavior). Shuffle is keyed by (table, bucket); the
    all-pairs product never materializes."""
    from pyspark.sql import Window

    dim = len(vectors.select("embedding").first()["embedding"])
    v = vectors.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    cands = None
    for t in range(n_tables):
        planes = random_hyperplanes(dim, n_planes, seed + 101 * t)
        vb = lsh_bucket(v, planes, "neighbor_id").withColumn("tbl", F.lit(t))
        qb = (lsh_bucket(queries, planes, "query_vec_id")
              .withColumn("tbl", F.lit(t))
              .withColumnRenamed("embedding", "qe"))
        c = (vb.join(F.broadcast(qb), ["tbl", "bucket"])
               .filter(F.col("neighbor_id") != F.col("query_vec_id"))
               .select("query_vec_id", "neighbor_id", "qe", "embedding"))
        cands = c if cands is None else cands.unionByName(c)
    cand = cands.dropDuplicates(["query_vec_id", "neighbor_id"])
    scored = cand.select(
        "query_vec_id", "neighbor_id",
        F.round(cosine_col(F.col("qe").cast("array<double>"),
                           F.col("embedding").cast("array<double>")), 6)
         .alias("cosine"))
    w = Window.partitionBy("query_vec_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .filter(F.col("rank") <= k)
                  .select("query_vec_id", "rank", "neighbor_id", "cosine"))
