"""Multimodal column plumbing: opaque `binary` media payloads + typed
metadata, with decode/feature-extract as Arrow-batched pandas stages.

The image/audio codec libraries are not installed in this container, so
the actual decode is STUBBED (`decode_media` raises NotImplementedError;
`fake_decode_features` is the deterministic stand-in) — but the Spark-side
plumbing is real and tested: binary column schema, mapInPandas signature,
batch shape, and partition behavior are exactly what a PIL/ffmpeg-backed
decode would use (graft brief: make the plumbing real, stub the codec).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("content_sha", StringType()),
    StructField("n_bytes", LongType()),
    StructField("entropy", DoubleType()),
])


def decode_media(payload: bytes, media_type: str):  # pragma: no cover
    """Real codec hook (PIL decode / audio resample / video frame-sample).

    Not implementable in this container — no imaging/audio libs installed.
    Swap in: PIL.Image.open(io.BytesIO(payload)) for images, etc.
    """
    raise NotImplementedError(
        "media codecs unavailable in this environment; "
        "use fake_decode_features for the pipeline plumbing")


def _byte_entropy(payload: bytes) -> float:
    """Shannon entropy over byte values — numpy-vectorized (a per-byte
    python loop here measured ~100x slower on multi-KB payloads)."""
    if not payload:
        return 0.0
    counts = np.bincount(np.frombuffer(payload, np.uint8), minlength=256)
    p = counts[counts > 0] / len(payload)
    return round(float(-(p * np.log2(p)).sum()), 6)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["media"].tolist()
        yield pd.DataFrame({
            "media_id": pdf["media_id"],
            "media_type": pdf["media_type"],
            "content_sha": [hashlib.sha256(p or b"").hexdigest()[:16]
                            for p in payloads],
            "n_bytes": [len(p or b"") for p in payloads],
            "entropy": [_byte_entropy(p or b"") for p in payloads],
        })


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media feature extraction over a binary column.

    The `documents` table stands in for a media table: text bytes become
    the opaque blob (the pipeline never inspects them as text). Returns
    one typed feature row per blob.
    """
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").alias("media_id"),
                    F.encode("text", "UTF-8").alias("media"),
                    F.when(F.col("doc_id") % 3 == 0, "image")
                     .when(F.col("doc_id") % 3 == 1, "audio")
                     .otherwise("video").alias("media_type")))
    feats = docs.repartition(8, "media_id") \
        .mapInPandas(_feature_batches, schema=MEDIA_SCHEMA)
    return feats.orderBy("media_id")


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", LongType()),
    StructField("byte_offset", LongType()),
    StructField("frame_sha", StringType()),
    StructField("frame_bytes", LongType()),
])

N_FRAMES = 4


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """1-row-in -> N-rows-out frame sampling (the video-decode plumbing
    shape: a real implementation replaces the equal-split offsets with
    ffmpeg keyframe indices; everything else — schema, batch handling,
    row explosion — is identical)."""
    for pdf in batches:
        ids, idxs, offs, shas, lens = [], [], [], [], []
        for media_id, payload in zip(pdf["media_id"], pdf["media"]):
            p = payload or b""
            flen = len(p) // N_FRAMES
            if flen == 0:
                continue
            for i in range(N_FRAMES):
                chunk = p[i * flen:(i + 1) * flen]
                ids.append(media_id)
                idxs.append(i)
                offs.append(i * flen)
                shas.append(hashlib.sha256(chunk).hexdigest()[:16])
                lens.append(flen)
        yield pd.DataFrame({
            "media_id": pd.Series(ids, dtype="int64"),
            "frame_idx": pd.Series(idxs, dtype="int64"),
            "byte_offset": pd.Series(offs, dtype="int64"),
            "frame_sha": pd.Series(shas, dtype="object"),
            "frame_bytes": pd.Series(lens, dtype="int64"),
        })


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque media blobs: each blob yields N_FRAMES
    equal-split frames with per-frame digests.

    The driver query restricts to ASCII payloads (byte length == char
    length) so the DuckDB oracle can reconstruct the byte slices with
    character substr + sha256 — the operator itself is byte-based and
    works on any binary payload (pytest covers non-ASCII)."""
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.octet_length("text") == F.length("text"))
            .filter(F.octet_length("text") >= N_FRAMES)
            .select(F.col("doc_id").alias("media_id"),
                    F.encode("text", "UTF-8").alias("media")))
    frames = docs.repartition(8, "media_id") \
        .mapInPandas(_frame_batches, schema=FRAME_SCHEMA)
    return frames.orderBy("media_id", "frame_idx")


def media_features_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-correctness projection of media_features: the columns with
    exact DuckDB twins (sha256 / octet_length). Entropy stays in the full
    operator, pytest-covered — the sandbox DuckDB build has no blob byte
    access, so it can't express byte entropy in SQL."""
    return (media_features(spark, sf_dir)
            .select("media_id", "media_type", "content_sha", "n_bytes")
            .orderBy("media_id"))
