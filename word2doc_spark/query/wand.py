"""Block-max WAND top-k: document-at-a-time scoring with block skipping.

The reference scores every matching doc via a full sparse dot product
(tfidf_doc_ranker.py:62-63); WAND visits only docs whose term-upper-bound
sum can beat the running k-th score θ, and the *block-max* refinement
(Ding & Suel, SIGMOD'11 — public literature) skips whole compressed blocks
whose block-level bound cannot beat θ, without decoding them.

Distribution shape: doc ranges are the parallel axis (query/ranges.py) —
each range task runs one WAND instance per query over its local slice of
the matched segments (a term's segments chain into one cursor), keeps a
bounded heap of k candidates, and the global merge is exact. θ restarts
per range (slightly less pruning than a single global cursor, in exchange
for bounded tasks at any term df).

Upper bounds per block (monotone score contributions, §2.K):
* drqa : w_q · idf · ln(1+max_tf)                      (tight)
* bm25 : w_q · max_tf(k1+1)/(max_tf + k1(1−b))         (dl→0, conservative)

bm25 per-doc dl is served range-locally from the decoded doclen_seg blobs
(SparseDL searchsorted lookup) — no driver-side N-row materialization and
no broadcast that grows with corpus size.
"""

from __future__ import annotations

import heapq

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from word2doc_spark.index.postings import block_directory, decode_block

# per-process pruning counters (reset_stats/get_stats) — lets tests and
# local drivers measure block-skip rates; per-executor, not aggregated
STATS = {"blocks_decoded": 0, "blocks_skipped": 0}


def reset_stats() -> None:
    STATS["blocks_decoded"] = 0
    STATS["blocks_skipped"] = 0


def get_stats() -> dict:
    return dict(STATS)


class _Cursor:
    """Lazy block-decoding posting cursor for one query term, chaining the
    term's doc-ascending disjoint segments into one logical list."""

    __slots__ = ("payloads", "seg_of", "offs", "lasts", "prevs",
                 "block_ubs", "ub", "w", "idf", "bi", "docs", "tfs", "pos",
                 "exhausted", "_nblocks")

    def __init__(self, payloads, w: float, idf: float, block_ub_fn) -> None:
        if isinstance(payloads, (bytes, bytearray)):
            payloads = [payloads]
        self.payloads = payloads
        seg_of, offs, lasts, prevs, maxtfs = [], [], [], [], []
        for si, payload in enumerate(payloads):
            o, _c, l, m = block_directory(payload)
            seg_of.append(np.full(len(o), si, dtype=np.int64))
            offs.append(o)
            lasts.append(l)
            # delta chains restart per segment: block j's decode base is
            # block j-1's last doc WITHIN the same segment, 0 at the start
            p = np.zeros(len(o), dtype=np.uint64)
            p[1:] = l[:-1]
            prevs.append(p)
            maxtfs.append(m)
        self.seg_of = np.concatenate(seg_of)
        self.offs = np.concatenate(offs)
        self.lasts = np.concatenate(lasts)
        self.prevs = np.concatenate(prevs)
        self._nblocks = len(self.offs)
        self.block_ubs = block_ub_fn(
            np.concatenate(maxtfs).astype(np.float64))
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
        self.docs, self.tfs = decode_block(
            self.payloads[self.seg_of[bi]], int(self.offs[bi]),
            int(self.prevs[bi]))
        STATS["blocks_decoded"] += 1
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
            STATS["blocks_skipped"] += self._nblocks - self.bi - 1
            self.exhausted = True
        elif bi != self.bi:
            STATS["blocks_skipped"] += bi - self.bi - 1
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
    term_rows,
    k: int,
    mode: str,
    k1: float,
    b: float,
    avgdl: float,
    dl,
    theta0: float = -1.0,
) -> list[tuple[int, float]]:
    """One query's exact top-k via block-max WAND.

    term_rows: (w_q, idf, payload-or-[payloads]) per matched term; dl is a
    dense array, SparseDL, or None. Returns [(doc_id, score)] ordered by
    (score desc, doc_id asc).

    theta0: optional pruning seed — a STRICT lower bound just below some
    k actual document scores (query/ranges.py seeds it just below the
    densest range's k-th score). Docs scoring ≥ the true global k-th can
    never be pruned by it, so results stay exact; ranges whose best docs
    fall below the seed emit fewer (never wrong) candidates.
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
    theta = theta0

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
                    theta = max(heap[0][0], theta0)
            elif score > theta:
                heapq.heapreplace(heap, (score, -pivot_doc))
                theta = max(heap[0][0], theta0)
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
    strict: bool = False,
    analysis: str = "auto",
    seed_theta: bool | str = "auto",
) -> DataFrame:
    """→ (query_id, rank, doc_id, url, score); identical output contract
    (and, by differential test, identical rows) to ``search_exact``.
    seed_theta ('auto' = only on indexes with many doc ranges) pre-scores
    each query's densest range and seeds every range task's θ so pruning
    power survives large n_ranges (see ranges.search_doc_partitioned)."""
    from word2doc_spark.query.ranges import search_doc_partitioned
    return search_doc_partitioned(spark, index_dir, queries, k, score_mode,
                                  wand_topk, strict=strict,
                                  analysis=analysis, seed_theta=seed_theta)
