"""Block-max WAND top-k: document-at-a-time scoring with block skipping.

The fast query path (SURVEY.md §7 M6). The reference scores every matching
doc via a full sparse dot product (tfidf_doc_ranker.py:62-63); WAND visits
only docs whose term-upper-bound sum can beat the running k-th score θ, and
the *block-max* refinement (Ding & Suel, SIGMOD'11 — public literature)
skips whole compressed blocks whose block-level bound cannot beat θ,
without decoding them.

Distribution shape: queries are the parallel axis — after the same pruned
shard scan + broadcast join as the exact path, ``applyInPandas`` over
``groupBy(query_id)`` runs one WAND instance per query. Results are exact:
differential tests assert identity with the exact path on every fixture.

Upper bounds per block (monotone score contributions, §2.K):
* drqa : w_q · idf · ln(1+max_tf)                      (tight)
* bm25 : w_q · max_tf(k1+1)/(max_tf + k1(1−b))         (dl→0, conservative)

bm25 scoring needs per-doc dl at candidate-evaluation time; it is served
from a broadcast uint32 array (4 B/doc). That holds to ~10^9 docs per
executor; beyond that production would switch to quantized impact scores
stored in-block (documented limit, not needed for the rank-identity gate).
"""

from __future__ import annotations

import heapq
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from word2doc_spark.index.manifest import Manifest
from word2doc_spark.index.postings import block_directory, decode_block
from word2doc_spark.query.exact import _matched_postings, analyze_queries

RESULT_SCHEMA = ("query_id long, rank int, doc_id long, score double")


class _Cursor:
    """Lazy block-decoding posting cursor for one query term."""

    __slots__ = ("payload", "offs", "counts", "lasts", "block_ubs", "ub",
                 "w", "idf", "bi", "docs", "tfs", "pos", "exhausted",
                 "_nblocks", "_prev_last")

    def __init__(self, payload: bytes, w: float, idf: float,
                 block_ub_fn) -> None:
        self.payload = payload
        self.offs, self.counts, self.lasts, maxtfs = block_directory(payload)
        self._nblocks = len(self.offs)
        self.block_ubs = block_ub_fn(maxtfs.astype(np.float64))
        self.ub = float(self.block_ubs.max())
        self.w = w
        self.idf = idf
        self.bi = -1
        self.docs = None
        self.tfs = None
        self.pos = 0
        self.exhausted = False
        self._load_block(0)

    def _load_block(self, bi: int) -> None:
        if bi >= self._nblocks:
            self.exhausted = True
            return
        prev_last = int(self.lasts[bi - 1]) if bi > 0 else 0
        self.docs, self.tfs = decode_block(self.payload, int(self.offs[bi]),
                                           prev_last)
        self.bi = bi
        self.pos = 0

    @property
    def cur_doc(self) -> int:
        return int(self.docs[self.pos])

    @property
    def cur_block_ub(self) -> float:
        return float(self.block_ubs[self.bi])

    def block_last(self) -> int:
        return int(self.lasts[self.bi])

    def seek_block(self, target: int) -> None:
        """Advance block pointer (without decoding) until block may contain
        target; decodes only the landing block."""
        if self.exhausted:
            return
        bi = self.bi
        while bi < self._nblocks and int(self.lasts[bi]) < target:
            bi += 1
        if bi >= self._nblocks:
            self.exhausted = True
        elif bi != self.bi:
            self._load_block(bi)

    def seek(self, target: int) -> None:
        """Advance to first doc >= target."""
        self.seek_block(target)
        if self.exhausted:
            return
        pos = int(np.searchsorted(self.docs, target, side="left")) \
            if self.docs[self.pos] < target else self.pos
        if pos >= len(self.docs):  # cannot happen: block_last >= target
            pos = len(self.docs) - 1
        self.pos = pos

    def advance(self) -> None:
        self.pos += 1
        if self.pos >= len(self.docs):
            self._load_block(self.bi + 1)

    def cur_tf(self) -> float:
        return float(self.tfs[self.pos])


def wand_topk(
    term_rows: list[tuple[float, float, bytes]],
    k: int,
    mode: str,
    k1: float,
    b: float,
    avgdl: float,
    dl: np.ndarray | None,
) -> list[tuple[int, float]]:
    """One query's exact top-k via block-max WAND.

    term_rows: (w_q, idf, payload) per matched term. Returns
    [(doc_id, score)] ordered by (score desc, doc_id asc).
    """
    cursors: list[_Cursor] = []
    for w, idf, payload in term_rows:
        if w <= 0.0:
            continue
        if mode == "drqa":
            cursors.append(_Cursor(
                payload, w, idf,
                lambda mx, w=w, idf=idf: w * idf * np.log1p(mx)))
        else:
            cursors.append(_Cursor(
                payload, w, idf,
                lambda mx, w=w: w * (mx * (k1 + 1.0)) /
                                (mx + k1 * (1.0 - b))))
    cursors = [c for c in cursors if not c.exhausted]
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k
    theta = -1.0

    def score_at(c: _Cursor, doc: int) -> float:
        tf = c.cur_tf()
        if mode == "drqa":
            return c.w * c.idf * np.log1p(tf)
        d = float(dl[doc]) if dl is not None else avgdl
        return c.w * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * d / avgdl))

    while True:
        cursors = [c for c in cursors if not c.exhausted]
        if not cursors:
            break
        cursors.sort(key=lambda c: c.cur_doc)
        # find pivot: first prefix whose ub sum beats θ
        acc = 0.0
        pivot_idx = -1
        for i, c in enumerate(cursors):
            acc += c.ub
            if acc > theta:
                pivot_idx = i
                break
        if pivot_idx < 0:
            break  # no prefix can beat θ — done
        pivot_doc = cursors[pivot_idx].cur_doc
        if cursors[0].cur_doc == pivot_doc:
            # extend the prefix over ALL cursors parked at pivot_doc — they
            # contribute to it and to the skipped region just past it
            ext = pivot_idx
            while ext + 1 < len(cursors) and cursors[ext + 1].cur_doc == pivot_doc:
                ext += 1
            # block-max shallow check before full evaluation
            block_acc = 0.0
            for c in cursors[:ext + 1]:
                c.seek_block(pivot_doc)
                if not c.exhausted:
                    block_acc += c.cur_block_ub
            if block_acc <= theta:
                # skip to the earliest block boundary past pivot, capped by
                # the next cursor's doc (terms beyond the extended prefix
                # could contribute to docs in between — don't skip them)
                nxt = min((c.block_last() for c in cursors[:ext + 1]
                           if not c.exhausted), default=pivot_doc) + 1
                if ext + 1 < len(cursors):
                    nxt = min(nxt, cursors[ext + 1].cur_doc)
                nxt = max(nxt, pivot_doc + 1)
                for c in cursors[:ext + 1]:
                    if not c.exhausted and c.cur_doc < nxt:
                        c.seek(nxt)
                continue
            score = 0.0
            for c in cursors:
                if c.exhausted:
                    continue
                if c.cur_doc == pivot_doc:
                    score += score_at(c, pivot_doc)
                    c.advance()
                elif c.cur_doc > pivot_doc:
                    break
            if len(heap) < k:
                heapq.heappush(heap, (score, -pivot_doc))
                if len(heap) == k:
                    theta = heap[0][0]
            elif score > theta:
                heapq.heapreplace(heap, (score, -pivot_doc))
                theta = heap[0][0]
        else:
            # advance all pre-pivot cursors to the pivot doc
            for c in cursors[:pivot_idx]:
                if c.cur_doc < pivot_doc:
                    c.seek(pivot_doc)
    out = [(-nd, s) for s, nd in heap]
    out.sort(key=lambda t: (-t[1], t[0]))
    return out


def search_wand(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    score_mode: str | None = None,
) -> DataFrame:
    """→ (query_id, rank, doc_id, url, score); identical output contract
    (and, by differential test, identical rows) to ``search_exact``."""
    manifest = Manifest(index_dir)
    config, stats = manifest.load()
    mode = score_mode or config.score_mode
    n_docs = int(stats["n_docs"])
    avgdl = float(stats["avgdl"])
    k1, b = config.k1, config.b

    q_terms = analyze_queries(queries, config)
    term_ids = [r["term_id"] for r in q_terms.select("term_id").distinct().collect()]
    if not term_ids:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, url string, score double")
    postings = _matched_postings(spark, index_dir, term_ids, config.num_shards)
    joined = postings.join(F.broadcast(q_terms), "term_id") \
                     .select("query_id", "qtf", "df", "payload")

    dl_bc = None
    if mode == "bm25":
        doclen = spark.read.parquet(os.path.join(index_dir, "doclen"))
        pdf = doclen.toPandas()
        dl_arr = np.zeros(n_docs, dtype=np.uint32)
        dl_arr[pdf["doc_id"].to_numpy()] = pdf["dl"].to_numpy()
        dl_bc = spark.sparkContext.broadcast(dl_arr)

    def run_query(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        dfs = pdf["df"].to_numpy().astype(np.float64)
        idfs = np.maximum(np.log((n_docs - dfs + 0.5) / (dfs + 0.5)), 0.0)
        w_qs = np.log1p(pdf["qtf"].to_numpy().astype(np.float64)) * idfs
        rows = [
            (float(w_qs[i]), float(idfs[i]), pdf["payload"].iloc[i])
            for i in range(len(pdf)) if w_qs[i] > 0.0
        ]
        dl = dl_bc.value if dl_bc is not None else None
        top = wand_topk(rows, k, mode, k1, b, avgdl, dl)
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
