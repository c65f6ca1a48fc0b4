"""End-to-end: Spark build + exact query vs the numpy oracle.

Rank-identity contract: top-k (doc_id, url) sequences identical, scores
equal within 1e-9 (float64, different accumulation order).
"""

import math

import pytest

from word2doc_spark.config import IndexConfig
from word2doc_spark.functions.extract import extract_text
from word2doc_spark.index.build import build_index
from word2doc_spark.oracle import build_oracle_index, oracle_search
from word2doc_spark.query.exact import search_exact
from word2doc_spark.sources.pages import synthetic_pages, synthetic_pages_rows

N_DOCS = 240
# hash_size small enough to force real collisions, like the unit goldens
CFG = IndexConfig(hash_size=2 ** 18, num_shards=8, block_size=64,
                  n_ranges=6, max_seg_postings=64)

QUERIES = [
    (1, "spark shuffle partition"),
    (2, "posting wand block"),
    (3, "café naïve résumé"),
    (4, "crawl warc fetch html"),
    (5, "hash bucket collision idf"),
    (6, "the of and a is"),              # stopwords only → no results
    (7, "webscale"),                      # planted head term (df > N/2 → idf 0)
    (8, "spark spark shuffle shuffle shuffle"),  # qtf > 1
    (9, "tungsten codegen"),
    (10, "frontier dedup charset robots"),
]


def _oracle_docs():
    """(url, text) exactly as the engine sees them: text ?? extract(html)."""
    out = []
    for url, _ts, html, text, _lang in synthetic_pages_rows(N_DOCS, seed=42):
        t = text if text else extract_text(html)
        if t:
            out.append((url, t))
    return out


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("index"))
    pages = synthetic_pages(spark, N_DOCS, num_partitions=6)
    metrics = build_index(spark, pages, index_dir, CFG, input_token="e2e")
    return index_dir, metrics


@pytest.fixture(scope="module")
def oracle_idx():
    return build_oracle_index(_oracle_docs(), CFG)


def test_build_metrics(built):
    _, metrics = built
    assert metrics["n_docs"] == N_DOCS
    assert metrics["n_postings"] > 0
    assert metrics["avgdl"] > 0


def test_corpus_stats_match_oracle(built, oracle_idx):
    _, metrics = built
    assert metrics["n_docs"] == oracle_idx.n_docs
    assert metrics["n_terms"] == len(oracle_idx.postings)
    assert metrics["n_postings"] == sum(
        arr.shape[1] for arr in oracle_idx.postings.values())
    assert math.isclose(metrics["avgdl"], oracle_idx.avgdl, rel_tol=1e-12)


def _assert_rank_identical(spark, index_dir, oracle_idx, mode, k=10):
    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    got = search_exact(spark, index_dir, qdf, k=k, score_mode=mode).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    oracle_idx.config = IndexConfig(**{**CFG.to_dict(), "score_mode": mode,
                                       "extras": {}})
    for qid, qtext in QUERIES:
        want = oracle_search(oracle_idx, qtext, k=k)
        rows = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert len(rows) == len(want), (qid, qtext, len(rows), len(want))
        for row, (doc_id, url, score) in zip(rows, want):
            assert row["doc_id"] == doc_id, (qid, row, doc_id, url)
            assert row["url"] == url
            assert math.isclose(row["score"], score, rel_tol=1e-9, abs_tol=1e-12)


def test_drqa_rank_identity(spark, built, oracle_idx):
    _assert_rank_identical(spark, built[0], oracle_idx, "drqa")


def test_bm25_rank_identity(spark, built, oracle_idx):
    _assert_rank_identical(spark, built[0], oracle_idx, "bm25")


def test_extraction_byte_identity(spark, built):
    """Per-row invariant: Spark-extracted text == oracle extractor, per url."""
    import pyspark.sql.functions as F
    from word2doc_spark.index.analyze import extracted_docs

    pages = synthetic_pages(spark, 60, num_partitions=4)
    got = {r["url"]: r["text"]
           for r in extracted_docs(pages).collect()}
    for url, _ts, html, text, _lang in synthetic_pages_rows(60, seed=42):
        want = text if text else extract_text(html)
        if want:
            assert got[url].encode() == want.encode(), url
        else:
            assert url not in got


def test_sparse_dl_guard():
    """SparseDL raises loudly on doc_ids absent from the dl blobs instead
    of silently returning a neighbor's dl (ADVICE r2)."""
    import numpy as np
    import pytest
    from word2doc_spark.query.ranges import SparseDL

    dl = SparseDL(np.array([2, 5, 9]), np.array([10.0, 20.0, 30.0]))
    assert dl[5] == 20.0
    assert list(dl[np.array([2, 9])]) == [10.0, 30.0]
    with pytest.raises(KeyError):
        dl[4]
    with pytest.raises(KeyError):
        dl[11]
    with pytest.raises(KeyError):
        dl[np.array([2, 4])]
    with pytest.raises(KeyError):
        dl[np.array([9, 11])]


def test_distributed_analysis_identity(spark, built):
    """analysis='distributed' (executor-side tokenize + stats join) gives
    the same rows as the driver-side collect path on all three search
    surfaces (VERDICT r2 item 5)."""
    from word2doc_spark.query.fast import search_fast
    from word2doc_spark.query.wand import search_wand

    built, _ = built

    qdf = spark.createDataFrame(
        [(1, "spark shuffle partition"), (2, "crawl warc html"),
         (3, "zzz-no-such-term"), (4, "the and of")],
        "query_id long, query string")
    for fn in (search_exact, search_fast, search_wand):
        drv = fn(spark, built, qdf, k=5, score_mode="bm25",
                 analysis="driver").collect()
        dst = fn(spark, built, qdf, k=5, score_mode="bm25",
                 analysis="distributed").collect()
        assert sorted(((r["query_id"], r["rank"], r["doc_id"],
                        round(r["score"], 9)) for r in drv)) == \
            sorted(((r["query_id"], r["rank"], r["doc_id"],
                     round(r["score"], 9)) for r in dst)), fn.__name__


def test_distributed_strict_raises(spark, built):
    import pytest
    from word2doc_spark.query.fast import search_fast

    built, _ = built

    qdf = spark.createDataFrame(
        [(1, "spark shuffle"), (2, "the and of")],  # q2: stopwords only
        "query_id long, query string")
    with pytest.raises(RuntimeError, match="No valid word"):
        search_fast(spark, built, qdf, k=5, strict=True,
                    analysis="distributed").collect()


def test_auto_n_ranges():
    from word2doc_spark.config import IndexConfig
    from word2doc_spark.index.build import resolve_n_ranges

    assert resolve_n_ranges(IndexConfig(n_ranges=64), 10 ** 9) == 64
    auto = IndexConfig(n_ranges=0)
    assert resolve_n_ranges(auto, 500_000) == 32
    assert resolve_n_ranges(auto, 10 ** 12) == 31250
    assert resolve_n_ranges(auto, 0) == 32


@pytest.mark.parametrize("mode", ["drqa", "bm25"])
def test_packed_candidate_merge_identity(spark, built, mode, monkeypatch):
    """Force the big-batch packed-candidate merge (blobs + vectorized
    top-k) and assert row/score identity with the exact path — tiny
    test batches otherwise take the rows+window bypass."""
    import math
    import word2doc_spark.query.ranges as R
    from word2doc_spark.query.exact import search_exact
    from word2doc_spark.query.fast import search_fast
    from word2doc_spark.query.wand import search_wand

    index_dir, _ = built
    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    exact = search_exact(spark, index_dir, qdf, k=7,
                         score_mode=mode).collect()
    monkeypatch.setattr(R, "_PACK_MIN_CANDIDATES", 0)
    packed_fast = search_fast(spark, index_dir, qdf, k=7,
                              score_mode=mode).collect()
    packed_wand = search_wand(spark, index_dir, qdf, k=7, score_mode=mode,
                              seed_theta=True).collect()
    key = lambda r: (r["query_id"], r["rank"])
    for got in (packed_fast, packed_wand):
        assert sorted(map(key, got)) == sorted(map(key, exact))
        for a, b in zip(sorted(got, key=key), sorted(exact, key=key)):
            assert (a["doc_id"], a["url"]) == (b["doc_id"], b["url"])
            assert math.isclose(a["score"], b["score"], rel_tol=1e-9,
                                abs_tol=1e-12)
