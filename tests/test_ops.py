"""Training-data ops: dedup (exact/minhash/jaccard/simhash), similarity
search, text stats, multimodal plumbing — on corpora with planted dups."""

import numpy as np
import pytest
import pyspark.sql.functions as F

from word2doc_spark.ops import dedup as D
from word2doc_spark.ops import multimodal as M
from word2doc_spark.ops import similarity as S
from word2doc_spark.ops import textstats as TS

BASE = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "while searching for tasty salmon in the early morning light"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE, "en"),
        (1, BASE, "en"),                                   # exact dup of 0
        (2, BASE + " extra trailing words here", "en"),    # near dup of 0
        (3, "Der schnelle braune Fuchs springt über den faulen Hund und "
            "die Katze ist auch nicht schlecht für den Wald", "de"),
        (4, "le renard brun rapide saute par dessus le chien paresseux "
            "dans la forêt pour une baguette", "fr"),
        (5, "completely different content about spark executors and "
            "shuffle partitions in a distributed cluster environment", "en"),
        (6, "THE  Quick   Brown FOX jumps over the lazy dog near the "
            "river bank while searching for tasty salmon in the early "
            "morning light", "en"),                        # ws/case dup of 0
        (7, "xz", "en"),                                   # tiny doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_duplicates(docs):
    groups = D.exact_duplicates(docs).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["n_dups"] == 3          # 0, 1, 6 (case/ws-insensitive tokens)
    assert g["keep_doc_id"] == 0
    assert g["doc_ids"] == [0, 1, 6]


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {(r["doc_a"], r["doc_b"])
             for r in D.lsh_candidate_pairs(docs, num_perm=16, bands=4).collect()}
    # exact dups always collide on every band
    assert (0, 1) in pairs and (0, 6) in pairs and (1, 6) in pairs
    # near-dup 2 shares most shingles with 0 → should share ≥1 band
    assert (0, 2) in pairs
    # unrelated docs must not pair
    assert (0, 5) not in pairs and (3, 4) not in pairs


def test_ngram_jaccard(docs):
    rows = D.ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.5).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    assert got[(0, 1)] == 1.0
    assert got[(0, 6)] == 1.0
    assert 0.5 <= got[(0, 2)] < 1.0
    assert (0, 5) not in got


def test_simhash_near_dups(docs):
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash64(docs).collect()}
    assert sh[0] == sh[1] == sh[6]   # identical token streams
    ham02 = bin(sh[0] ^ sh[2]).count("1")
    ham05 = bin(sh[0] ^ sh[5]).count("1")
    assert ham02 < ham05
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in D.simhash_near_dupes(docs, hamming_max=16).collect()}
    assert pairs[(0, 1)] == 0


def test_lang_id(docs):
    got = {r["doc_id"]: r["lang_guess"] for r in TS.lang_id(docs).collect()}
    assert got[0] == "en"
    assert got[3] == "de"
    assert got[4] == "fr"
    assert got[7] == "und"


def test_quality_and_counts(docs):
    q = {r["doc_id"]: r for r in TS.quality_score(docs).collect()}
    assert q[7]["quality"] == 0.0            # too short
    assert q[0]["quality"] > 0.5
    tc = {r["doc_id"]: r for r in TS.token_counts(docs).collect()}
    assert tc[0]["n_tokens"] == len(BASE.split())
    fp = {r["doc_id"]: r["fp"] for r in TS.fingerprint(docs).collect()}
    assert fp[0] == fp[1] == fp[6]
    assert fp[0] != fp[2]


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal((8, 16))
    rows = []
    vid = 0
    for c in range(8):
        for _ in range(12):
            v = base[c] + 0.15 * rng.standard_normal(16)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    return spark.createDataFrame(rows,
                                 "vec_id long, embedding array<float>, label int")


def test_brute_force_topk_recalls_cluster(vectors):
    q = (vectors.filter(F.col("vec_id") == 0)
         .select(F.col("vec_id").alias("query_vec_id"), "embedding"))
    res = S.brute_force_topk(vectors, q, k=5).collect()
    assert len(res) == 5
    labels = {r["vec_id"]: r["label"] for r in vectors.collect()}
    # all 5 nearest neighbours of vec 0 come from its own cluster
    assert all(labels[r["neighbor_id"]] == labels[0] for r in res)
    assert [r["rank"] for r in sorted(res, key=lambda r: r["rank"])] == \
        [1, 2, 3, 4, 5]


def test_lsh_topk_subset_of_brute(vectors):
    q = (vectors.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("query_vec_id"), "embedding"))
    brute = S.brute_force_topk(vectors, q, k=5).collect()
    lsh = S.lsh_topk(vectors, q, k=5, n_planes=6).collect()
    bs = {(r["query_vec_id"], r["neighbor_id"], r["cosine"]) for r in brute}
    # every LSH hit must be a genuine cosine (scores match brute force
    # when present) — recall may be < 1, precision of scores is exact
    brute_scores = {(r["query_vec_id"], r["neighbor_id"]): r["cosine"]
                    for r in brute}
    for r in lsh:
        key = (r["query_vec_id"], r["neighbor_id"])
        if key in brute_scores:
            assert abs(r["cosine"] - brute_scores[key]) < 1e-9
    del bs


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def test_multimodal_features(spark):
    media = M.synthetic_media(spark, 30)
    feats = M.decode_features(media, strict=False).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["features"]) == M.FEATURE_DIM
        n = sum(x * x for x in r["features"])
        assert abs(n - 1.0) < 1e-9  # unit-norm fake features
    # determinism
    again = M.decode_features(media, strict=False).collect()
    a = {r["media_id"]: r["features"] for r in feats}
    b = {r["media_id"]: r["features"] for r in again}
    assert a == b


def test_multimodal_strict_raises(spark):
    media = M.synthetic_media(spark, 3)
    with pytest.raises(Exception):
        M.decode_features(media, strict=True).collect()


def test_frame_sample_plan(spark):
    media = M.synthetic_media(spark, 30)
    plan = M.frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    vids = {r["media_id"] for r in media.filter("kind = 'video'").collect()}
    assert {r["media_id"] for r in rows} == vids
    for r in rows:
        assert r["ts_ms"] == r["frame_idx"] * 1000


def test_lsh_multi_table_recall(vectors):
    """Multi-table union is the recall lever: 4 tables must recover most
    of the brute-force top-5 on the clustered fixture (single table is
    allowed to miss; the union must not)."""
    q = (vectors.filter(F.col("vec_id") < 8)
         .select(F.col("vec_id").alias("query_vec_id"), "embedding"))
    brute = S.brute_force_topk(vectors, q, k=5).collect()
    lsh = S.lsh_topk(vectors, q, k=5, n_planes=6, n_tables=4).collect()
    want = {(r["query_vec_id"], r["neighbor_id"]) for r in brute}
    got = {(r["query_vec_id"], r["neighbor_id"]) for r in lsh}
    recall = len(want & got) / len(want)
    assert recall >= 0.8, recall


def test_embedding_near_dupes(vectors):
    """Clustered vectors: near-dup pairs (cosine >= .9) exist within
    clusters, every reported pair is within one cluster, and the reported
    cosine equals the exact cosine."""
    pairs = S.embedding_near_dupes(vectors, threshold=0.9, n_planes=6,
                                   n_tables=4).collect()
    assert pairs, "clustered fixture must yield near-dup pairs"
    labels = {r["vec_id"]: r["label"] for r in vectors.collect()}
    emb = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in vectors.collect()}
    for r in pairs:
        assert r["vec_a"] < r["vec_b"]
        assert labels[r["vec_a"]] == labels[r["vec_b"]], r
        a, b = emb[r["vec_a"]], emb[r["vec_b"]]
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r["cosine"] - round(want, 6)) < 1e-9
        assert want >= 0.9


def test_ivf_topk_recall(vectors):
    """IVF with a probe budget recovers most of the brute-force top-5 on
    the clustered fixture; every reported cosine is exact."""
    q = (vectors.filter(F.col("vec_id") < 8)
         .select(F.col("vec_id").alias("query_vec_id"), "embedding"))
    brute = S.brute_force_topk(vectors, q, k=5).collect()
    ivf = S.ivf_topk(vectors, q, k=5, n_cells=12, n_probe=4).collect()
    want = {(r["query_vec_id"], r["neighbor_id"]) for r in brute}
    got = {(r["query_vec_id"], r["neighbor_id"]) for r in ivf}
    recall = len(want & got) / len(want)
    assert recall >= 0.7, recall
    brute_scores = {(r["query_vec_id"], r["neighbor_id"]): r["cosine"]
                    for r in brute}
    for r in ivf:
        key = (r["query_vec_id"], r["neighbor_id"])
        if key in brute_scores:
            assert abs(r["cosine"] - brute_scores[key]) < 1e-9


def test_ivf_persisted_index_roundtrip(vectors, tmp_path):
    """build_ivf_index → load_ivf_index → ivf_topk(assignment=...) gives
    IDENTICAL results to the assign-on-the-fly path, and the persisted
    assignment is partitioned by cell_id (probe-time partition pruning)."""
    import os
    q = (vectors.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("query_vec_id"), "embedding"))
    path = str(tmp_path / "ivf_index")
    cent = S.build_ivf_index(vectors, path, n_cells=12)
    spark = vectors.sparkSession
    assign, cent2 = S.load_ivf_index(spark, path)
    assert cent == cent2
    assert any(p.startswith("cell_id=") for p in os.listdir(path)), \
        "assignment parquet must be hive-partitioned by cell_id"
    fresh = S.ivf_topk(vectors, q, k=5, n_cells=12, n_probe=4).collect()
    reused = S.ivf_topk(vectors, q, k=5, n_probe=4,
                        assignment=assign, centroids=cent2).collect()
    assert sorted((r["query_vec_id"], r["rank"], r["neighbor_id"])
                  for r in fresh) == \
        sorted((r["query_vec_id"], r["rank"], r["neighbor_id"])
               for r in reused)


def test_similarity_empty_vectors_guard(spark):
    """Empty vector tables return empty results instead of raising
    (the old .first() dim probe crashed with TypeError)."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    q = spark.createDataFrame([], "query_vec_id long, embedding array<float>")
    assert S.embedding_near_dupes(empty, threshold=0.5).count() == 0
    assert S.lsh_topk(empty, q, k=5).count() == 0
    assert S.ivf_topk(empty, q, k=5).count() == 0


def test_shingles_short_docs(spark):
    """Docs shorter than n tokens yield zero shingles (the sequence()
    guard), and shingles are distinct per doc."""
    docs = spark.createDataFrame(
        [(0, "one two"), (1, "a b c a b c a b"), (2, ""), (3, None)],
        "doc_id long, text string")
    rows = D.shingles(docs, n=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["shingle"])
    assert 0 not in by_doc and 2 not in by_doc and 3 not in by_doc
    # 8 tokens -> 6 positional 3-grams, 3 distinct after dedup
    assert sorted(by_doc[1]) == ["a b c", "b c a", "c a b"]


def test_ivf_pandas_codebook_path_matches_literal(vectors, monkeypatch):
    """The Arrow-batched large-codebook path returns the same top-k as
    the literal-expression path (tie semantics included)."""
    q = (vectors.filter(F.col("vec_id") < 4)
         .select(F.col("vec_id").alias("query_vec_id"), "embedding"))
    lit = S.ivf_topk(vectors, q, k=5, n_cells=12, n_probe=4).collect()
    monkeypatch.setattr(S, "_CENT_LITERAL_MAX_FLOATS", 1)
    pnd = S.ivf_topk(vectors, q, k=5, n_cells=12, n_probe=4).collect()
    assert sorted((r["query_vec_id"], r["rank"], r["neighbor_id"],
                   round(r["cosine"], 6)) for r in lit) == \
        sorted((r["query_vec_id"], r["rank"], r["neighbor_id"],
                round(r["cosine"], 6)) for r in pnd)


def test_bpe_ish_token_counts(spark):
    docs = spark.createDataFrame(
        [(0, "Hello, world! GPT-4 costs $0.03/1k"), (1, ""), (2, None)],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            TS.bpe_ish_token_counts(docs).collect()}
    # Hello , world ! GPT - 4 costs $ 0 . 03 / 1 k  -> 15 pieces, 5 words
    assert rows[0]["n_pieces"] == 15 and rows[0]["n_words"] == 5
    assert rows[0]["pieces_per_word"] == 3.0
    assert rows[1]["n_pieces"] == 0 and rows[1]["n_words"] == 0
    assert rows[2]["n_pieces"] == 0 and rows[2]["n_words"] == 0


def test_lsh_bucket_pandas_identity(vectors):
    """The Arrow-matmul bucket fallback produces the same buckets as the
    JVM literal expression, and the plan switch triggers on the literal
    budget (mapInPandas plan, no per-plane literal arrays)."""
    import word2doc_spark.ops.similarity as S2
    planes = S.random_hyperplanes(16, 6, seed=3)
    lit = {r["vec_id"]: r["bucket"]
           for r in S.lsh_bucket(vectors, planes, "vec_id").collect()}
    pdp = {r["vec_id"]: r["bucket"]
           for r in S2._lsh_bucket_pandas(vectors, planes, "vec_id",
                                          "embedding").collect()}
    assert lit == pdp and len(lit) > 0
    # budget switch: shrink the literal budget and check the plan path
    old = S2._CENT_LITERAL_MAX_FLOATS
    try:
        S2._CENT_LITERAL_MAX_FLOATS = 4
        df = S.lsh_bucket(vectors, planes, "vec_id")
        explain = df._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in explain
        got = {r["vec_id"]: r["bucket"] for r in df.collect()}
        assert got == lit
    finally:
        S2._CENT_LITERAL_MAX_FLOATS = old


def _bmp_fixture() -> bytes:
    """2×2 24-bpp bottom-up BMP, rows padded to 4 bytes."""
    import struct
    px = (bytes([255, 0, 0]) + bytes([0, 255, 0]) + b"\x00\x00"   # bottom
          + bytes([0, 0, 255]) + bytes([255, 255, 255]) + b"\x00\x00")
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(px),
                      2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
    return hdr + dib + px


def _wav_fixture() -> bytes:
    """Mono 16-bit PCM, 8 kHz, 4 samples."""
    import struct
    data = struct.pack("<4h", 0, 16384, -16384, 32767)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def test_bmp_decode_real():
    img = M.decode_bmp_pixels(_bmp_fixture())
    # stored bottom-up → returned top-down: row 0 = (0,0,255),(255,255,255)
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [0, 0, 255]      # BGR: red pixel
    assert img[0, 1].tolist() == [255, 255, 255]
    assert img[1, 0].tolist() == [255, 0, 0]      # BGR: blue pixel
    assert img[1, 1].tolist() == [0, 255, 0]
    assert M.decode_bmp_pixels(b"BMnot-a-real-bmp") is None


def test_wav_decode_real():
    got = M.decode_wav_samples(_wav_fixture())
    assert got is not None
    samples, rate = got
    assert rate == 8000 and samples.shape == (4, 1)
    assert abs(samples[1, 0] - 0.5) < 1e-9
    assert abs(samples[2, 0] + 0.5) < 1e-9
    assert M.decode_wav_samples(b"RIFFjunkWAVE") is None


def test_decode_features_real_formats_strict(spark):
    """BMP/WAV payloads decode for REAL — strict mode accepts them and
    the decoder column distinguishes real from fake."""
    rows = [
        (1, "image", _bmp_fixture(), "image/bmp", 2, 2, None),
        (2, "audio", _wav_fixture(), "audio/wav", None, None, 1),
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           M.decode_features(media, strict=True).collect()}
    assert got[1]["decoder"] == "bmp"
    assert got[2]["decoder"] == "wav"
    for r in got.values():
        n = sum(x * x for x in r["features"])
        assert abs(n - 1.0) < 1e-9
    # deterministic + distinct from the fake for the same bytes
    fake = M._fake_decode(_bmp_fixture())
    assert list(fake) != got[1]["features"]
