"""Vectorized DAAT scoring kernel + doc-partitioned "fast exact" path.

The reference's hot loop is a scipy CSR sparse dot product
(tfidf_doc_ranker.py:62-63) — C-speed accumulation over all matching
postings. This kernel is its per-range analog: the matched posting
segments of one doc range are decoded (vectorized varint) and accumulated
with one argsort + ``np.add.reduceat`` — no per-posting Python. Top-k via
argpartition, ties (score desc, doc_id asc).

Distribution: queries fan out over doc ranges (query/ranges.py) — every
range task scores its complete local slice for every query and emits only
top-k candidates; the global merge over n_ranges × Q × k candidates is
exact (window for small sets, packed-blob vectorized merge for large).

Results are exact and identical to search_exact / search_wand
(differential-tested). WAND wins when k is small relative to very long
posting lists AND per-doc evaluation is expensive — at Python speeds the
vectorized full scan is usually faster, which is why this is the default
fast path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from word2doc_spark.index.postings import decode_postings


def _decode_chain(payloads) -> tuple[np.ndarray, np.ndarray]:
    """One term's segment payloads (doc-ascending, disjoint) → full
    (doc_ids, tfs). Accepts a single payload for the unsegmented case."""
    if isinstance(payloads, (bytes, bytearray)):
        return decode_postings(payloads)
    parts = [decode_postings(p) for p in payloads]
    if len(parts) == 1:
        return parts[0]
    return (np.concatenate([d for d, _ in parts]),
            np.concatenate([t for _, t in parts]))


def fast_topk(
    term_rows,
    k: int, mode: str, k1: float, b: float, avgdl: float,
    dl,
    theta0: float = -1.0,
    cache: dict | None = None,
) -> list[tuple[int, float]]:
    """Exact top-k by full vectorized accumulation. term_rows: (w_q, idf,
    payload-or-[payloads]); dl: dense array, SparseDL, or None. theta0 is
    accepted for kernel-signature parity with wand_topk; a full scan has
    nothing to prune with it.

    cache: optional per-TASK dict shared across a batch's queries — a
    term's decoded chain is query-independent, so hot terms decode once
    per task instead of once per query (the dominant kernel cost for
    overlapping batches). Cache keys are CONTENT-stable: the scoring
    wrappers thread an explicit chain key (term_id + first doc_lo,
    carried in the same rows as the payloads) as an optional 4th element
    of each term row; direct kernel callers without one fall back to the
    payload bytes objects themselves as the key (dict equality = content
    equality — never object identity, whose ids can be reused after GC).
    When the cache exposes ``charge`` (query/kcache.py TaskCache), big
    entries are byte-accounted and the oldest evict beyond the budget."""
    doc_parts: list[np.ndarray] = []
    score_parts: list[np.ndarray] = []
    charge = getattr(cache, "charge", None)
    for row in term_rows:
        w, idf, payload = row[0], row[1], row[2]
        if w <= 0.0:
            continue
        # per-(chain, w, idf) CONTRIBUTION arrays are also shared across
        # queries (same term + same query-side tf → identical per-doc
        # scores; dl is task-constant) — cache them so a query's marginal
        # cost is just concat + accumulate
        if cache is not None:
            pid = row[3] if len(row) > 3 else (
                payload if isinstance(payload, (bytes, bytearray))
                else tuple(payload))
            ckey = ("contrib", pid, w, idf, mode)
            got = cache.get(ckey)
        else:
            got = None
        if got is None:
            chain = cache.get(("chain", pid)) if cache is not None else None
            if chain is None:
                d_raw, t_raw = _decode_chain(payload)
                chain = (d_raw.astype(np.int64),
                         t_raw.astype(np.float64))
                if cache is not None:
                    cache[("chain", pid)] = chain
                    if charge is not None:
                        charge(("chain", pid),
                               chain[0].nbytes + chain[1].nbytes)
            docs, tfs = chain
            if mode == "drqa":
                contrib = (w * idf) * np.log1p(tfs)
            else:
                d = np.asarray(dl[docs], dtype=np.float64) \
                    if dl is not None else np.full(docs.size, avgdl)
                contrib = w * (tfs * (k1 + 1.0)) / (
                    tfs + k1 * (1.0 - b + b * d / avgdl))
            got = (docs, contrib)
            if cache is not None:
                cache[ckey] = got
                if charge is not None:
                    charge(ckey, docs.nbytes + contrib.nbytes)
        doc_parts.append(got[0])
        score_parts.append(got[1])
    if not doc_parts:
        return []
    all_docs = np.concatenate(doc_parts)
    all_scores = np.concatenate(score_parts)
    # sort + reduceat accumulate (np.unique + np.add.at measured ~3× the
    # cost at typical per-range sizes — add.at is the slow path)
    order = np.argsort(all_docs, kind="stable")
    sdocs = all_docs[order]
    bounds = np.flatnonzero(
        np.concatenate(([True], sdocs[1:] != sdocs[:-1])))
    uniq = sdocs[bounds]
    acc = np.add.reduceat(all_scores[order], bounds)
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
    strict: bool = False,
    analysis: str = "auto",
) -> DataFrame:
    """Same output contract (and rows) as search_exact / search_wand."""
    from word2doc_spark.query.ranges import search_doc_partitioned
    return search_doc_partitioned(spark, index_dir, queries, k, score_mode,
                                  fast_topk, strict=strict,
                                  analysis=analysis)
