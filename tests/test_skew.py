"""Skew differential (SURVEY.md §5.4): the salted two-phase build must
produce bit-identical postings to the unsalted single-phase build on a
corpus with a planted head term (~55% of docs contain HEAD_TERM)."""

import hashlib
import os

from word2doc_spark.config import IndexConfig
from word2doc_spark.index.build import build_index
from word2doc_spark.index.postings import decode_postings
from word2doc_spark.sources.pages import synthetic_pages


def _postings_map(spark, index_dir):
    rows = (spark.read.parquet(os.path.join(index_dir, "shards"))
            .select("term_id", "df", "payload").collect())
    out = {}
    for r in rows:
        docs, tfs = decode_postings(bytes(r["payload"]))
        out[r["term_id"]] = (r["df"], docs.tolist(), tfs.tolist())
    return out


def test_salted_build_identical_to_unsalted(spark, tmp_path):
    pages = synthetic_pages(spark, 200, num_partitions=4)
    base = IndexConfig(hash_size=2 ** 18, num_shards=4, block_size=64)

    # unsalted: threshold higher than any df
    dir_a = str(tmp_path / "a")
    build_index(spark, pages, dir_a,
                IndexConfig(**{**base.to_dict(), "salt_df_threshold": 10 ** 9,
                               "extras": {}}),
                input_token="skew")
    # salted: threshold low enough that the head term (and more) salt
    dir_b = str(tmp_path / "b")
    build_index(spark, pages, dir_b,
                IndexConfig(**{**base.to_dict(), "salt_df_threshold": 20,
                               "salt_factor": 8, "extras": {}}),
                input_token="skew")

    a = _postings_map(spark, dir_a)
    b = _postings_map(spark, dir_b)
    assert a.keys() == b.keys()
    assert a == b  # df, doc order, tfs — everything identical


def test_head_terms_actually_salted(spark, tmp_path):
    from word2doc_spark.index.manifest import Manifest
    pages = synthetic_pages(spark, 200, num_partitions=4)
    d = str(tmp_path / "c")
    build_index(spark, pages, d,
                IndexConfig(hash_size=2 ** 18, num_shards=4, block_size=64,
                            salt_df_threshold=20, salt_factor=8),
                input_token="skew2")
    rows = Manifest(d).shard_metrics()
    assert sum(r.get("n_head_terms", 0) for r in rows) > 0
