"""Vectorized fast path must be identical to exact and WAND paths."""

import math

import numpy as np
import pytest

from word2doc_spark.index.postings import encode_postings
from word2doc_spark.query.fast import fast_topk
from word2doc_spark.query.wand import wand_topk


@pytest.mark.parametrize("mode", ["drqa", "bm25"])
@pytest.mark.parametrize("seed", range(10))
def test_fast_matches_wand_random(mode, seed):
    rng = np.random.default_rng(seed + 100)
    n_docs = 4000
    dl = rng.integers(10, 300, size=n_docs).astype(np.uint32)
    avgdl = float(dl.mean())
    term_rows = []
    for _ in range(int(rng.integers(2, 6))):
        n_post = int(rng.integers(1, 1200))
        docs = np.sort(rng.choice(n_docs, size=n_post,
                                  replace=False)).astype(np.uint64)
        tfs = rng.integers(1, 15, size=n_post).astype(np.uint64)
        term_rows.append((float(rng.uniform(0.1, 3.0)),
                          float(rng.uniform(0.1, 5.0)),
                          encode_postings(docs, tfs, block_size=64)))
    dla = dl if mode == "bm25" else None
    for k in (1, 10, 50):
        a = fast_topk(term_rows, k, mode, 1.2, 0.75, avgdl, dla)
        b = wand_topk(term_rows, k, mode, 1.2, 0.75, avgdl, dla)
        assert [d for d, _ in a] == [d for d, _ in b], (mode, seed, k)
        for (d1, s1), (d2, s2) in zip(a, b):
            assert math.isclose(s1, s2, rel_tol=1e-9)


def test_fast_boundary_ties():
    # two docs with identical scores straddling the k boundary: the
    # smaller doc_id must win
    docs = np.array([5, 9], dtype=np.uint64)
    tfs = np.array([2, 2], dtype=np.uint64)
    rows = [(1.0, 1.0, encode_postings(docs, tfs))]
    top = fast_topk(rows, 1, "drqa", 1.2, 0.75, 10.0, None)
    assert len(top) == 1 and top[0][0] == 5


def test_fast_spark_differential(spark, tmp_path):
    from word2doc_spark.config import IndexConfig
    from word2doc_spark.index.build import build_index
    from word2doc_spark.query.exact import search_exact
    from word2doc_spark.query.fast import search_fast
    from word2doc_spark.sources.pages import synthetic_pages

    cfg = IndexConfig(hash_size=2 ** 18, num_shards=4, block_size=64)
    idx = str(tmp_path / "idx")
    build_index(spark, synthetic_pages(spark, 150, num_partitions=4),
                idx, cfg, input_token="fast")
    qdf = spark.createDataFrame(
        [(1, "spark shuffle partition"), (2, "café naïve"),
         (3, "posting wand block heap"), (4, "webscale crawl")],
        "query_id long, query string")
    for mode in ("drqa", "bm25"):
        a = search_exact(spark, idx, qdf, k=10, score_mode=mode).collect()
        b = search_fast(spark, idx, qdf, k=10, score_mode=mode).collect()
        key = lambda r: (r["query_id"], r["rank"])
        a.sort(key=key)
        b.sort(key=key)
        assert [(r["query_id"], r["rank"], r["doc_id"]) for r in a] == \
               [(r["query_id"], r["rank"], r["doc_id"]) for r in b]
        for x, y in zip(a, b):
            assert math.isclose(x["score"], y["score"], rel_tol=1e-9)


def test_pack_candidates_overflow_guard():
    """doc_ids beyond exact float64 range must fail loudly, never pack."""
    import pytest as _pytest
    from word2doc_spark.query.ranges import _pack_candidates

    ok = _pack_candidates([1, 2], [10 ** 12, (1 << 53) - 1], [0.5, 0.25],
                          n_qb=8)
    assert len(ok) == 2  # two distinct qb buckets
    with _pytest.raises(OverflowError):
        _pack_candidates([1], [1 << 53], [0.5], n_qb=8)


def test_pack_merge_roundtrip_semantics():
    """Packed triples decode back exactly, and the merge's lexsort order
    matches the window semantics (score desc, doc_id asc) incl. ties."""
    import numpy as np
    from word2doc_spark.query.ranges import _pack_candidates

    q = [7, 7, 7, 8]
    d = [5, 3, 9, 1]
    s = [1.5, 2.5, 2.5, 0.5]
    pdf = _pack_candidates(q, d, s, n_qb=4)
    a = np.concatenate([np.frombuffer(b, dtype=np.float64).reshape(-1, 3)
                        for b in pdf["blob"]])
    assert sorted(map(tuple, a.tolist())) == sorted(
        [(7.0, 5.0, 1.5), (7.0, 3.0, 2.5), (7.0, 9.0, 2.5),
         (8.0, 1.0, 0.5)])
    order = np.lexsort((a[:, 1], -a[:, 2], a[:, 0]))
    got = [tuple(map(float, a[i])) for i in order]
    # query 7: score 2.5 doc 3, score 2.5 doc 9 (tie -> doc asc), 1.5 doc 5
    assert got == [(7.0, 3.0, 2.5), (7.0, 9.0, 2.5), (7.0, 5.0, 1.5),
                   (8.0, 1.0, 0.5)]
