"""Doc-partitioned batch query execution (the scale path).

SURVEY.md §4.1 "per-shard bounded heap + final merge": matched posting
segments are scored WHERE THEIR DOC RANGE LIVES — one task per doc-range
bucket holds every matched segment for its range (all query terms), so
each document's full score is computed locally; the task emits only its
per-query top-k candidates, and a final window over the tiny
(n_ranges × Q × k) candidate set yields the exact global top-k.

Why this scales where per-query grouping does not: a groupBy(query_id)
plan ships every matched posting of a head term into ONE task; here the
shuffle is keyed by range_id, so no task ever holds more than one range's
slice of the index regardless of term df, and parallelism is n_ranges
(set ≫ cores at build time), not n_queries.

bm25 needs per-doc dl at scoring time: it is cogrouped in as the per-range
compressed dl blobs written at build (index/build.py doclen_seg) — one
small cell per (range, chunk), never a driver-side N-row materialization.

Exactness: per-range scores are complete (a doc's postings for every term
live in its range), and the global top-k is contained in the union of
per-range top-ks, so the final merge is exact — differential tests assert
identity with search_exact on every fixture.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from word2doc_spark.index.manifest import Manifest
from word2doc_spark.index.postings import decode_postings
from word2doc_spark.query.exact import (
    _empty_result, _matched_segments, attach_urls, prepare_weighted_terms,
)

CAND_SCHEMA = "query_id long, doc_id long, score double"

# θ seeding collects O(Q) (id, float) rows to the driver — safe far past
# the analysis threshold, but skip it for truly enormous batches
SEED_MAX_QUERIES = 200_000
# 'auto' seeding threshold: below this many doc ranges the per-range θ
# restart costs little and the seed pre-pass (an extra metadata job + one
# range's scoring) is pure overhead; above it, pruning loss compounds
# per range and seeding pays (measured: 32-range sf0.1 bench loses ~2×
# wall to always-on seeding; the 10^12-doc sizing uses 10^4+ ranges)
SEED_MIN_RANGES = 64


class SparseDL:
    """Doc-length lookup over the decoded per-range dl arrays: behaves like
    ``dl[doc_ids]`` on a dense array but stores only docs with dl > 0
    (every doc that has any posting does)."""

    __slots__ = ("docs", "vals")

    def __init__(self, docs: np.ndarray, vals: np.ndarray):
        self.docs = docs
        self.vals = vals

    def __getitem__(self, key):
        idx = np.searchsorted(self.docs, key)
        # loud failure on a doc absent from the dl blobs (e.g. a gap in
        # doclen_seg coverage) — silently returning a neighbor's dl would
        # mis-score bm25 without any signal
        if np.isscalar(key) or getattr(key, "ndim", 0) == 0:
            if idx >= len(self.docs) or self.docs[idx] != key:
                raise KeyError(f"doc_id {key} missing from dl blobs")
        else:
            if np.any(idx >= len(self.docs)) or \
                    np.any(self.docs[np.minimum(idx, len(self.docs) - 1)]
                           != key):
                raise KeyError("doc_id(s) missing from dl blobs")
        return self.vals[idx]


def decode_dl_blobs(dlpdf: pd.DataFrame) -> SparseDL | None:
    if dlpdf is None or len(dlpdf) == 0:
        return None
    parts = [decode_postings(bytes(p)) for p in
             dlpdf.sort_values("doc_lo")["payload"]]
    docs = np.concatenate([d for d, _ in parts])
    vals = np.concatenate([v for _, v in parts]).astype(np.float64)
    return SparseDL(docs, vals)


def _score_range(pdf: pd.DataFrame, dl, k: int, mode: str, k1: float,
                 b: float, avgdl: float, topk_fn,
                 seeds=None) -> pd.DataFrame:
    """Score one doc range: group matched segments per query, chain each
    term's segments in doc order, run the DAAT kernel, emit candidates.
    Grouping is one lexsort + numpy boundary walks (no per-group pandas
    frames — the hot loop runs once per (query, term), not per row).
    ``seeds``: optional {query_id: θ0} lower bounds (see search_wand
    seeding) passed through to the kernel."""
    qids = pdf["query_id"].to_numpy()
    tids = pdf["term_id"].to_numpy()
    dlos = pdf["doc_lo"].to_numpy()
    order = np.lexsort((dlos, tids, qids))
    qids, tids = qids[order], tids[order]
    ws = pdf["w"].to_numpy()[order]
    idfs = pdf["idf"].to_numpy()[order]
    payloads = pdf["payload"].to_numpy()[order]
    n = len(pdf)
    q_change = np.flatnonzero(
        np.concatenate(([True], qids[1:] != qids[:-1])))
    q_ends = np.concatenate((q_change[1:], [n]))
    t_change = np.concatenate(
        ([True], (qids[1:] != qids[:-1]) | (tids[1:] != tids[:-1])))
    out_q, out_d, out_s = [], [], []
    for qs, qe in zip(q_change, q_ends):
        starts = qs + np.flatnonzero(t_change[qs:qe])
        ends = np.concatenate((starts[1:], [qe]))
        term_rows = [
            (float(ws[s]), float(idfs[s]),
             [bytes(p) for p in payloads[s:e]])
            for s, e in zip(starts, ends)
        ]
        qid = int(qids[qs])
        theta0 = seeds.get(qid, -1.0) if seeds else -1.0
        for doc, score in topk_fn(term_rows, k, mode, k1, b, avgdl, dl,
                                  theta0=theta0):
            out_q.append(qid)
            out_d.append(doc)
            out_s.append(score)
    return pd.DataFrame({
        "query_id": np.asarray(out_q, dtype=np.int64),
        "doc_id": np.asarray(out_d, dtype=np.int64),
        "score": np.asarray(out_s, dtype=np.float64),
    })


def search_doc_partitioned(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int,
    score_mode: str | None,
    topk_fn,
    strict: bool = False,
    analysis: str = "auto",
    seed_theta: bool | str = False,
) -> DataFrame:
    """Shared driver for the fast and WAND paths. topk_fn: DAAT kernel
    (term_rows=[(w, idf, [payload,...])], k, mode, k1, b, avgdl, dl,
    theta0=) → [(doc_id, score)] ordered (score desc, doc_id asc).

    analysis: 'driver' | 'distributed' | 'auto' — see search_exact.

    seed_theta (WAND): True, False, or 'auto' (seed only when the index
    has ≥ SEED_MIN_RANGES doc ranges — where per-range θ restarts
    actually cost pruning power). Seeding runs a cheap pre-pass that
    scores, per query,
    only its densest doc range (chosen from segment METADATA — a
    payload-free column-pruned scan) and seeds every range task's pruning
    threshold with just-below that range's k-th score. A range's local
    k-th score is ≤ the global k-th score, and the seed sits strictly
    below it, so a doc scoring ≥ the global k-th can never be pruned —
    exactness (incl. doc_id tie-breaks) is preserved; differential tests
    assert identity. This restores cross-range pruning power that
    per-range θ restarts lose as n_ranges grows (10^4+ ranges at the
    10^12-doc sizing)."""
    manifest = Manifest(index_dir)
    config, stats = manifest.load()
    mode = score_mode or config.score_mode
    if mode not in ("drqa", "bm25"):
        raise ValueError(mode)
    n_docs = int(stats["n_docs"])
    avgdl = float(stats["avgdl"])
    k1, b = config.k1, config.b

    qdf, term_pred, bcast, nq = prepare_weighted_terms(
        spark, index_dir, queries, config, n_docs, strict, analysis)
    if qdf is None:
        return _empty_result(spark)
    n_q = nq if nq is not None else queries.count()
    segs = _matched_segments(spark, index_dir, term_pred,
                             config.num_shards)
    jqdf = F.broadcast(qdf) if bcast else qdf
    # sub-partition the scoring shuffle by query bucket too: join output is
    # already one row per (query, segment), so extra buckets add NO shuffle
    # volume — they turn n_ranges straggler-bound tasks into
    # n_ranges × n_buckets balanced ones for large batches
    n_buckets = int(min(32, max(1, n_q // 32)))
    joined = (segs.join(jqdf, "term_id")
              .withColumn("qb", F.pmod(F.col("query_id"), F.lit(n_buckets))
                          .cast("int"))
              .select("range_id", "qb", "query_id", "term_id", "w", "idf",
                      "doc_lo", "payload"))

    do_seed = (seed_theta is True
               or (seed_theta == "auto"
                   and config.n_ranges >= SEED_MIN_RANGES))
    seeds = None
    if do_seed and n_q <= SEED_MAX_QUERIES:
        seeds = _theta_seeds(spark, index_dir, jqdf, term_pred, config,
                             joined, k, mode, k1, b, avgdl, topk_fn,
                             n_buckets)
    bseeds = spark.sparkContext.broadcast(seeds) if seeds else None

    cand = _score_all_ranges(spark, index_dir, joined, k, mode, k1, b,
                             avgdl, topk_fn, n_buckets, bseeds)

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id"))
    topk = (cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k))
    return attach_urls(spark, index_dir, topk)


def _score_all_ranges(spark, index_dir, joined, k, mode, k1, b, avgdl,
                      topk_fn, n_buckets, bseeds=None,
                      pair_filter: DataFrame | None = None):
    """(range_id, qb)-partitioned scoring of a joined (segments × query
    terms) DataFrame → candidate rows. ``pair_filter``: optional tiny
    (query_id, range_id) DataFrame — broadcast-joined in to score only
    those slices (the θ-seed pre-pass)."""
    if pair_filter is not None:
        joined = joined.join(F.broadcast(pair_filter),
                             ["query_id", "range_id"])

    if mode == "bm25":
        # per-range dl blobs replicated once per query bucket (dl is a tiny
        # fraction of segment bytes, so ×n_buckets stays negligible)
        dlseg = (spark.read.parquet(os.path.join(index_dir, "doclen_seg"))
                 .select("range_id", "doc_lo", "payload")
                 .withColumn("qb", F.explode(F.array(
                     *[F.lit(i).cast("int") for i in range(n_buckets)]))))

        def run(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if len(left) == 0:
                return pd.DataFrame(
                    {"query_id": [], "doc_id": [], "score": []})
            dl = decode_dl_blobs(right)
            if dl is None:
                # bm25 must never silently fall back to avgdl: a range with
                # matched segments but no dl blobs is a broken index
                rid = (left["range_id"].iloc[0]
                       if "range_id" in left.columns else "?")
                raise RuntimeError(
                    "bm25 scoring: no doclen_seg blobs for a range with "
                    f"matched segments (range_id={rid})")
            return _score_range(left, dl, k, mode, k1, b, avgdl, topk_fn,
                                seeds=bseeds.value if bseeds else None)

        return (joined.groupby("range_id", "qb")
                .cogroup(dlseg.groupby("range_id", "qb"))
                .applyInPandas(run, CAND_SCHEMA))

    def run1(pdf: pd.DataFrame) -> pd.DataFrame:
        return _score_range(pdf, None, k, mode, k1, b, avgdl, topk_fn,
                            seeds=bseeds.value if bseeds else None)

    return (joined.groupBy("range_id", "qb")
            .applyInPandas(run1, CAND_SCHEMA))


def _theta_seeds(spark, index_dir, jqdf, term_pred, config, joined,
                 k, mode, k1, b, avgdl, topk_fn, n_buckets):
    """{query_id: θ0} — score each query's densest range only, take the
    k-th score, seed just BELOW it (np.nextafter) so equal-scoring docs in
    other ranges survive and tie-breaks stay exact. The densest range is
    picked from segment metadata (term_id, range_id, n_postings — payload
    never read). Queries with < k docs in their densest range get no seed.
    """
    meta = _matched_segments(spark, index_dir, term_pred,
                             config.num_shards, with_counts=True) \
        .select("term_id", "range_id", "n_postings")
    per = (meta.join(jqdf, "term_id")
           .groupBy("query_id", "range_id")
           .agg(F.sum("n_postings").alias("np")))
    wb = Window.partitionBy("query_id").orderBy(
        F.desc("np"), F.asc("range_id"))
    pairs = (per.withColumn("_r", F.row_number().over(wb))
             .filter(F.col("_r") == 1)
             .select("query_id", "range_id"))
    seed_cand = _score_all_ranges(spark, index_dir, joined, k, mode, k1,
                                  b, avgdl, topk_fn, n_buckets,
                                  pair_filter=pairs)
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id"))
    kth = (seed_cand.withColumn("_r", F.row_number().over(wk))
           .filter(F.col("_r") == k)
           .select("query_id", "score").collect())
    return {int(r["query_id"]): float(np.nextafter(r["score"], -np.inf))
            for r in kth} or None
