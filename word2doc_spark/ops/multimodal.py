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
    Stands in for compressed-format decode + feature-extract; replace
    with a real codec (PIL/torchvision/ffmpeg) in production. Payloads in
    the UNCOMPRESSED formats this container can parse without media
    libraries (BMP, WAV PCM) take the real numpy decoders below instead."""
    if payload is None:
        return np.zeros(dim, dtype=np.float64)
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((dim * 8) // len(digest) + 1))[:dim * 8],
                        dtype=np.uint64).astype(np.float64)
    v = (raw / 2 ** 64) - 0.5
    n = np.linalg.norm(v)
    return v / n if n else v


def _unit(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v)
    return v / n if n else v


def decode_bmp_pixels(payload: bytes) -> np.ndarray | None:
    """REAL numpy BMP decoder (uncompressed 24/32-bit BI_RGB) → H×W×3
    uint8 (B, G, R). None when the payload isn't a parseable BMP."""
    try:
        if len(payload) < 54 or payload[:2] != b"BM":
            return None
        pix_off = int.from_bytes(payload[10:14], "little")
        dib = int.from_bytes(payload[14:18], "little")
        if dib < 40:
            return None
        width = int.from_bytes(payload[18:22], "little", signed=True)
        height = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        comp = int.from_bytes(payload[30:34], "little")
        if comp != 0 or bpp not in (24, 32) or width <= 0 or height == 0:
            return None
        bottom_up = height > 0
        height = abs(height)
        nb = bpp // 8
        stride = ((width * nb + 3) // 4) * 4
        need = pix_off + stride * height
        if len(payload) < need:
            return None
        rows = np.frombuffer(payload, dtype=np.uint8, count=stride * height,
                             offset=pix_off).reshape(height, stride)
        img = rows[:, :width * nb].reshape(height, width, nb)[:, :, :3]
        return img[::-1] if bottom_up else img
    except Exception:
        return None


def _bmp_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray | None:
    img = decode_bmp_pixels(payload)
    if img is None:
        return None
    f = img.astype(np.float64)
    h, w = f.shape[0], f.shape[1]
    luma = 0.114 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.299 * f[:, :, 2]
    edge = (float(np.abs(np.diff(luma, axis=1)).mean())
            if w > 1 else 0.0)
    v = np.array([
        w, h, w / h,
        f[:, :, 2].mean(), f[:, :, 1].mean(), f[:, :, 0].mean(),
        f[:, :, 2].std(), f[:, :, 1].std(), f[:, :, 0].std(),
        luma.mean(), luma.std(), edge,
        float(f.min()), float(f.max()), float(w * h), 1.0,
    ], dtype=np.float64)[:dim]
    return _unit(v)


def decode_wav_samples(payload: bytes) -> tuple[np.ndarray, int] | None:
    """REAL numpy WAV decoder (8/16-bit integer PCM) → (samples float64
    in [-1, 1] shaped (n, channels), sample_rate). None when the payload
    isn't parseable PCM WAV."""
    try:
        if len(payload) < 12 or payload[:4] != b"RIFF" \
                or payload[8:12] != b"WAVE":
            return None
        off = 12
        fmt = None
        data = None
        while off + 8 <= len(payload):
            cid = payload[off:off + 4]
            size = int.from_bytes(payload[off + 4:off + 8], "little")
            body = payload[off + 8:off + 8 + size]
            if cid == b"fmt ":
                fmt = body
            elif cid == b"data":
                data = body
            off += 8 + size + (size & 1)
        if fmt is None or data is None or len(fmt) < 16:
            return None
        audio_fmt = int.from_bytes(fmt[0:2], "little")
        channels = int.from_bytes(fmt[2:4], "little")
        rate = int.from_bytes(fmt[4:8], "little")
        bits = int.from_bytes(fmt[14:16], "little")
        if audio_fmt != 1 or channels < 1 or rate <= 0 \
                or bits not in (8, 16):
            return None
        if bits == 16:
            raw = np.frombuffer(data, dtype="<i2",
                                count=len(data) // 2)
            samples = raw.astype(np.float64) / 32768.0
        else:
            raw = np.frombuffer(data, dtype=np.uint8)
            samples = (raw.astype(np.float64) - 128.0) / 128.0
        n = (samples.size // channels) * channels
        if n == 0:
            return None
        return samples[:n].reshape(-1, channels), rate
    except Exception:
        return None


def _wav_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray | None:
    got = decode_wav_samples(payload)
    if got is None:
        return None
    samples, rate = got
    mono = samples.mean(axis=1)
    sign = np.signbit(mono)
    zcr = (float(np.count_nonzero(sign[1:] != sign[:-1]))
           / max(mono.size - 1, 1))
    v = np.array([
        mono.size / rate, rate / 1e5, samples.shape[1],
        float(np.sqrt(np.mean(mono ** 2))), float(mono.mean()),
        float(mono.std()), zcr, float(np.abs(mono).max()),
        float(mono.min()), float(mono.max()),
        float(np.abs(np.diff(mono)).mean()) if mono.size > 1 else 0.0,
        float(samples[:, 0].std()), mono.size, 0.0, 0.0, 1.0,
    ], dtype=np.float64)[:dim]
    return _unit(v)


def decode_payload_features(payload: bytes | None,
                            dim: int = FEATURE_DIM) -> tuple[np.ndarray, str]:
    """(features, decoder) — real BMP/WAV decode when the payload parses
    as one of those uncompressed formats, else the deterministic fake."""
    if payload is not None:
        feats = _bmp_features(payload, dim)
        if feats is not None:
            return feats, "bmp"
        feats = _wav_features(payload, dim)
        if feats is not None:
            return feats, "wav"
    return _fake_decode(payload, dim), "fake"


def decode_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """(media_id, kind, decoder, features array<double>) — batched feature
    extraction.

    Uncompressed formats decode for REAL with numpy alone: BMP (24/32-bit
    BI_RGB → pixel/luma/edge stats) and WAV integer PCM (duration / RMS /
    zero-crossing stats) — decoder = 'bmp' | 'wav'. Compressed formats
    need PIL/ffmpeg, which this container lacks: strict=True raises
    NotImplementedError for them; strict=False substitutes the clearly
    marked deterministic fake (decoder = 'fake') so the Spark plumbing
    (schema, batching, downstream joins) is still exercised end to end.
    """

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            feats, decs = [], []
            for p in pdf["payload"]:
                f, dec = decode_payload_features(
                    bytes(p) if p is not None else None)
                if strict and dec == "fake":
                    raise NotImplementedError(
                        "payload is not an uncompressed BMP/WAV; real "
                        "decode of compressed media requires PIL/ffmpeg "
                        "— not available; run with strict=False for the "
                        "deterministic fake")
                feats.append(f.tolist())
                decs.append(dec)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "decoder": decs,
                "features": feats,
            })

    return media.select("media_id", "kind", "payload").mapInPandas(
        run,
        schema="media_id long, kind string, decoder string, "
               "features array<double>")


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
