"""M7: resumable build — a killed job must not recompute finished shards,
and the resumed index must be identical (north rule).

Also covers: fingerprint mismatch forces rebuild; manifest metrics exist
per shard (lineage contract).
"""

import hashlib
import os

import pytest

from word2doc_spark.config import IndexConfig
from word2doc_spark.index.build import build_index
from word2doc_spark.index.manifest import Manifest
from word2doc_spark.sources.pages import synthetic_pages

CFG = IndexConfig(hash_size=2 ** 18, num_shards=6, block_size=64)


def _index_digest(spark, index_dir):
    """Order-insensitive content hash of the published shards."""
    rows = (spark.read.parquet(os.path.join(index_dir, "shards"))
            .select("term_id", "df", "payload").collect())
    items = sorted((r["term_id"], r["df"], bytes(r["payload"])) for r in rows)
    h = hashlib.sha256()
    for t, d, p in items:
        h.update(f"{t}:{d}:".encode())
        h.update(p)
    return h.hexdigest()


def test_resume_skips_finished_shards(spark, tmp_path):
    index_dir = str(tmp_path / "idx")
    pages = synthetic_pages(spark, 150, num_partitions=4)

    # full build → digest + per-shard metrics
    m1 = build_index(spark, pages, index_dir, CFG, input_token="r1")
    digest1 = _index_digest(spark, index_dir)
    manifest = Manifest(index_dir)
    shard_rows = manifest.shard_metrics()
    assert len(shard_rows) == CFG.num_shards
    for row in shard_rows:
        assert row["fingerprint"] == m1["fingerprint"]
        for key in ("n_terms", "n_postings", "bytes", "wall_s"):
            assert key in row

    # simulate a kill after 2 shards: drop manifest rows for shards >= 2
    # and delete their data (as if the job died mid-write)
    import shutil
    for sid in range(2, CFG.num_shards):
        os.unlink(manifest.shard_path(sid))
        shutil.rmtree(os.path.join(index_dir, "shards", f"shard_id={sid}"))

    m2 = build_index(spark, pages, index_dir, CFG, input_token="r1")
    # finished work was NOT redone
    assert "stage" in m2["resumed_stages"]
    assert "shard_0" in m2["resumed_stages"]
    assert "shard_1" in m2["resumed_stages"]
    assert "shard_2" not in m2["resumed_stages"]
    # and the result is identical
    assert _index_digest(spark, index_dir) == digest1
    assert m2["n_postings"] == m1["n_postings"]


def test_fingerprint_change_invalidates(spark, tmp_path):
    index_dir = str(tmp_path / "idx2")
    pages = synthetic_pages(spark, 60, num_partitions=2)
    build_index(spark, pages, index_dir, CFG, input_token="a")
    m2 = build_index(spark, pages, index_dir, CFG, input_token="b")
    # different input fingerprint → nothing may be reused
    assert m2["resumed_stages"] == []


def test_noop_rerun_resumes_everything(spark, tmp_path):
    index_dir = str(tmp_path / "idx3")
    pages = synthetic_pages(spark, 60, num_partitions=2)
    build_index(spark, pages, index_dir, CFG, input_token="x")
    m2 = build_index(spark, pages, index_dir, CFG, input_token="x")
    assert "stage" in m2["resumed_stages"]
    assert sum(1 for s in m2["resumed_stages"] if s.startswith("shard_")) \
        == CFG.num_shards
