"""Oracle self-consistency: formula spot-checks with hand-computed values."""

import math

import numpy as np

from word2doc_spark.config import IndexConfig
from word2doc_spark.oracle import build_oracle_index, oracle_search


def _mini_corpus():
    return [
        ("u3", "spark shuffle spark"),
        ("u1", "spark partition"),
        ("u2", "shuffle exchange network"),
        ("u4", "unrelated words entirely"),
    ]


def test_doc_ids_sorted_by_url():
    idx = build_oracle_index(_mini_corpus())
    assert idx.doc_urls == ["u1", "u2", "u3", "u4"]
    assert idx.n_docs == 4


def test_drqa_score_hand_computed():
    idx = build_oracle_index(_mini_corpus(), IndexConfig(score_mode="drqa"))
    # query 'spark': df=2 (u1,u3), N=4 → idf = ln((4-2+0.5)/(2+0.5)) = 0 → all 0
    assert oracle_search(idx, "spark", k=4) == []
    # query 'partition': df=1 → idf = ln(3.5/1.5); doc u1 tf=1
    res = oracle_search(idx, "partition", k=4)
    idf = math.log(3.5 / 1.5)
    want = (math.log1p(1) * idf) * (idf * math.log1p(1))
    assert len(res) == 1
    doc_id, url, score = res[0]
    assert url == "u1"
    assert abs(score - want) < 1e-12


def test_bigram_contributes():
    idx = build_oracle_index(_mini_corpus())
    # 'shuffle exchange' bigram exists only in u2
    res = oracle_search(idx, "shuffle exchange", k=4)
    assert res and res[0][1] == "u2"


def test_bm25_mode():
    idx = build_oracle_index(_mini_corpus(), IndexConfig(score_mode="bm25"))
    res = oracle_search(idx, "partition", k=4)
    assert len(res) == 1
    doc_id, url, score = res[0]
    idf = math.log(3.5 / 1.5)
    dl = idx.doc_len[doc_id]
    denom = 1 + 1.2 * (1 - 0.75 + 0.75 * dl / idx.avgdl)
    want = math.log1p(1) * idf * (1 * 2.2 / denom)
    assert abs(score - want) < 1e-12


def test_tie_break_doc_id_asc():
    # need df < N/2 so idf > 0 (idf clamps to 0 otherwise)
    docs = [("a", "zebra apple"), ("b", "zebra apple"),
            ("c", "nothing common"), ("d", "more filler"), ("e", "padding doc")]
    idx = build_oracle_index(docs)
    res = oracle_search(idx, "zebra", k=3)
    assert [r[1] for r in res] == ["a", "b"]
    assert res[0][2] == res[1][2]


def test_strict_mode_raises():
    idx = build_oracle_index(_mini_corpus())
    try:
        oracle_search(idx, "the of and", strict=True)
        raise AssertionError("expected RuntimeError")
    except RuntimeError:
        pass
    assert oracle_search(idx, "the of and", strict=False) == []
