"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride in ``binary`` columns next to typed metadata, and
every transform is an Arrow-batched UDF over ``mapInPandas`` — the Spark
side (schemas, partitioning, batch shapes) is real and tested; the actual
codec calls are STUBBED deterministically because no image/audio libraries
exist in this container. Each stub either raises NotImplementedError
(strict mode) or produces a deterministic fake derived from the bytes
(test mode), clearly marked.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
import pyspark.sql.types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURE_DIM = 16


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """DETERMINISTIC FAKE decoder: sha256(payload) → unit-norm float vector.
    Stands in for image-decode + feature-extract; replace with a real
    codec (PIL/torchvision/ffmpeg) in production."""
    if payload is None:
        return np.zeros(dim, dtype=np.float64)
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((dim * 8) // len(digest) + 1))[:dim * 8],
                        dtype=np.uint64).astype(np.float64)
    v = (raw / 2 ** 64) - 0.5
    n = np.linalg.norm(v)
    return v / n if n else v


def decode_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """(media_id, kind, features array<double>) — batched feature extraction.

    strict=True raises NotImplementedError (no real codecs in this
    environment); strict=False uses the deterministic fake so the full
    Spark plumbing (schema, batching, downstream joins) is exercised.
    """

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real media decoding requires PIL/ffmpeg — not available; "
                "run with strict=False for the deterministic fake")
        for pdf in it:
            if len(pdf) == 0:
                continue
            feats = [
                _fake_decode(bytes(p) if p is not None else None).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "features": feats,
            })

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema="media_id long, kind string, features array<double>")


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """(media_id, frame_idx, ts_ms) — the frame-sampling plan for videos,
    pure column math (real frame extraction would consume this plan
    inside the decode UDF)."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.posexplode(F.sequence(
            F.lit(0),
            F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1,
                       F.lit(0)))).alias("frame_idx", "_s"),
    ).select("media_id", "frame_idx",
             (F.col("frame_idx") * every_ms).alias("ts_ms"))


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from a documents table: the text
    bytes stand in for an opaque payload (no codecs in this container), the
    metadata is pure column math — lets the driver exercise the multimodal
    schema/batching plumbing against a SQL twin without external data."""
    kind = (F.when(F.col("doc_id") % 3 == 0, "image")
             .when(F.col("doc_id") % 3 == 1, "audio")
             .otherwise("video"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.when(kind == "image", "image/jpeg")
         .when(kind == "audio", "audio/ogg")
         .otherwise("video/mp4").alias("mime"),
        F.when(kind != "audio", (F.col("doc_id") % 4 + 1) * 320)
         .cast("int").alias("width"),
        F.when(kind != "audio", (F.col("doc_id") % 4 + 1) * 240)
         .cast("int").alias("height"),
        F.when(kind != "image", (F.col("doc_id") % 20 + 1) * 1000)
         .cast("int").alias("duration_ms"),
    )


def synthetic_media(spark, n: int = 50, seed: int = 42) -> DataFrame:
    import random
    rng = random.Random(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 512)))
        rows.append((
            i, kind, payload,
            {"image": "image/jpeg", "audio": "audio/ogg",
             "video": "video/mp4"}[kind],
            rng.choice([320, 640, 1280]) if kind != "audio" else None,
            rng.choice([240, 480, 720]) if kind != "audio" else None,
            rng.randint(1000, 60000) if kind != "image" else None,
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
