"""C4/I2/B9 coverage: the regexp analyzer behind the registry is
rank-identical to the numpy oracle end-to-end, and strict mode raises on
zero-term queries on every query path (reference
tfidf_doc_ranker.py:98-103)."""

import math

import pytest

from word2doc_spark.config import IndexConfig
from word2doc_spark.index.build import build_index
from word2doc_spark.oracle import build_oracle_index, oracle_search
from word2doc_spark.query.exact import search_exact
from word2doc_spark.query.fast import search_fast
from word2doc_spark.query.wand import search_wand
from word2doc_spark.sources.pages import synthetic_pages, synthetic_pages_rows
from word2doc_spark.functions.extract import extract_text

CFG = IndexConfig(hash_size=2 ** 18, num_shards=4, block_size=64,
                  analyzer="regexp", n_ranges=4)

QUERIES = [
    (1, "spark shuffle partition"),
    (2, "can't won't state-of-the-art"),
    (3, "café naïve résumé"),
    (4, "dr. smith 3.14 ..."),
]


def _oracle_docs(n):
    out = []
    for url, _ts, html, text, _lang in synthetic_pages_rows(n, seed=42):
        t = text if text else extract_text(html)
        if t:
            out.append((url, t))
    return out


def test_regexp_analyzer_rank_identity(spark, tmp_path):
    idx = str(tmp_path / "ridx")
    build_index(spark, synthetic_pages(spark, 150, num_partitions=4),
                idx, CFG, input_token="regexp")
    oracle = build_oracle_index(_oracle_docs(150), CFG)
    qdf = spark.createDataFrame(QUERIES, "query_id long, query string")
    got = search_exact(spark, idx, qdf, k=8, score_mode="drqa").collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, q in QUERIES:
        want = oracle_search(oracle, q, k=8)
        rows = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [(r["doc_id"], r["url"]) for r in rows] == \
            [(d, u) for d, u, _ in want], (qid, q)
        for r, (_, _, s) in zip(rows, want):
            assert math.isclose(r["score"], s, rel_tol=1e-9, abs_tol=1e-12)


def test_regexp_differs_from_simple():
    from word2doc_spark.functions.tokenize import Analyzer
    text = "can't state-of-the-art 3.14,000"
    a = Analyzer(hash_size=2 ** 18, tokenizer="simple").analyze(text)[0]
    b = Analyzer(hash_size=2 ** 18, tokenizer="regexp").analyze(text)[0]
    assert a.tolist() != b.tolist()


@pytest.fixture(scope="module")
def strict_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("sidx"))
    cfg = IndexConfig(hash_size=2 ** 18, num_shards=2, block_size=64)
    build_index(spark, synthetic_pages(spark, 40, num_partitions=2),
                idx, cfg, input_token="strict")
    return idx


@pytest.mark.parametrize("fn", [search_exact, search_fast, search_wand])
def test_strict_raises_on_empty_query(spark, strict_idx, fn):
    qdf = spark.createDataFrame([(1, "the of and a is")],
                                "query_id long, query string")
    with pytest.raises(RuntimeError, match="No valid word in"):
        fn(spark, strict_idx, qdf, k=5, strict=True)
    # non-strict: silently empty
    assert fn(spark, strict_idx, qdf, k=5).count() == 0
