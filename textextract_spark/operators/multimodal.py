"""Multimodal column plumbing: opaque `binary` media payloads + typed
metadata, with decode/feature-extract as Arrow-batched pandas stages.

``decode_media`` REALLY decodes the two container formats expressible in
pure stdlib — BMP (BITMAPINFOHEADER) and WAV (RIFF/PCM) — parsing width/
height/bpp and channels/sample-rate/sample-count from the binary headers;
``media_decode`` runs it as the driver-oracled mapInPandas stage. Formats
that need codec libraries (JPEG/PNG/MP4/...) raise NotImplementedError
with a clear message — PIL/ffmpeg are not installed in this container;
swapping them in only changes ``decode_media``'s body, the Spark-side
plumbing (schema, batching, partitioning) is identical and tested.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("content_sha", StringType()),
    StructField("n_bytes", LongType()),
    StructField("entropy", DoubleType()),
])


def build_bmp(width: int, height: int) -> bytes:
    """Minimal valid 24bpp BMP (BITMAPINFOHEADER), deterministic pixels."""
    row = ((3 * width + 3) // 4) * 4  # rows pad to 4-byte boundaries
    data = bytes((x * 7 + y * 13) & 0xFF
                 for y in range(height) for x in range(row))
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0,
                         14 + 40)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(data), 2835, 2835, 0, 0)
    return header + dib + data


def build_wav(channels: int, sample_rate: int, bits: int,
              n_samples: int) -> bytes:
    """Minimal valid PCM WAV (RIFF fmt+data), deterministic samples."""
    frame = channels * bits // 8
    data = bytes((i * 31) & 0xFF for i in range(n_samples * frame))
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * frame, frame, bits)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_media(payload: bytes, media_type: str) -> dict:
    """Real stdlib container decode: BMP and WAV headers.

    Returns typed features ({kind, width, height} for BMP; {kind,
    channels, sample_rate, bits, n_samples} for WAV). Raises ValueError
    on malformed payloads of a supported container; NotImplementedError
    for formats that need codec libraries (not installed here — swapping
    PIL/ffmpeg in replaces only this function's body, see module doc).
    Reference analog: the payload-to-features step of src/ocr.py:43-67
    (screenshot bytes -> model features) re-expressed as a deterministic
    local decode."""
    if payload[:2] == b"BM":
        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        dib_size, width, height = struct.unpack_from("<Iii", payload, 14)
        if dib_size < 40:
            raise ValueError(f"unsupported DIB header size {dib_size}")
        _, bpp = struct.unpack_from("<HH", payload, 26)
        return {"kind": "bmp", "width": width, "height": abs(height),
                "bpp": bpp}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        pos, n = 12, len(payload)
        fmt = None
        data_size = None
        while pos + 8 <= n:
            cid, csize = payload[pos:pos + 4], struct.unpack_from(
                "<I", payload, pos + 4)[0]
            if cid == b"fmt ":
                fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
            elif cid == b"data":
                data_size = csize
            pos += 8 + csize + (csize & 1)  # chunks pad to even offsets
        if fmt is None or data_size is None:
            raise ValueError("WAV missing fmt/data chunk")
        _, channels, sample_rate, _, frame, bits = fmt
        return {"kind": "wav", "channels": channels,
                "sample_rate": sample_rate, "bits": bits,
                "n_samples": data_size // frame if frame else 0}
    raise NotImplementedError(
        f"no stdlib decoder for media_type={media_type!r} payload; "
        "JPEG/PNG/MP4/... need PIL/ffmpeg (not installed in this "
        "container)")


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


DECODE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", LongType()),
])


def _synth_media_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic BMP/WAV payload synthesis from media_id (test/driver
    corpus stand-in: this container has no real image/audio files)."""
    for pdf in batches:
        ids = pdf["media_id"].tolist()
        yield pd.DataFrame({
            "media_id": pdf["media_id"],
            "media": [build_bmp(1 + i % 31, 1 + i % 17) if i % 2 == 0
                      else build_wav(1 + i % 2, 8000 + i % 100, 16,
                                     16 + i % 50)
                      for i in ids]})


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {k: [] for k in ("media_id", "kind", "width", "height",
                                "channels", "sample_rate", "n_samples")}
        for mid, payload in zip(pdf["media_id"], pdf["media"]):
            f = decode_media(payload, "image" if payload[:2] == b"BM"
                             else "audio")
            rows["media_id"].append(mid)
            rows["kind"].append(f["kind"])
            # 0 = not-applicable for the other container's fields (typed
            # zero, not NULL: keeps the cross-engine compare free of
            # NULL-vs-NaN representation drift)
            rows["width"].append(f.get("width", 0))
            rows["height"].append(f.get("height", 0))
            rows["channels"].append(f.get("channels", 0))
            rows["sample_rate"].append(f.get("sample_rate", 0))
            rows["n_samples"].append(f.get("n_samples", 0))
        yield pd.DataFrame({
            "media_id": pd.Series(rows["media_id"], dtype="int64"),
            "kind": pd.Series(rows["kind"], dtype="object"),
            "width": pd.Series(rows["width"], dtype="int32"),
            "height": pd.Series(rows["height"], dtype="int32"),
            "channels": pd.Series(rows["channels"], dtype="int32"),
            "sample_rate": pd.Series(rows["sample_rate"], dtype="int32"),
            "n_samples": pd.Series(rows["n_samples"], dtype="int64"),
        })


def media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query exercising the REAL decode_media codec end-to-end:
    synthesize a BMP (even ids) / WAV (odd ids) payload per document id,
    then header-decode it back in an Arrow-batched stage. Every output
    column is a pure function of media_id, so the DuckDB oracle recomputes
    the full round trip (synth params -> binary header -> parsed values)
    from id arithmetic alone."""
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").alias("media_id")))
    media = docs.repartition(8, "media_id").mapInPandas(
        _synth_media_batches,
        schema="media_id long, media binary")
    return (media.mapInPandas(_decode_batches, schema=DECODE_SCHEMA)
            .orderBy("media_id"))


def media_features_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-correctness projection of media_features: the columns with
    exact DuckDB twins (sha256 / octet_length). Entropy stays in the full
    operator, pytest-covered — the sandbox DuckDB build has no blob byte
    access, so it can't express byte entropy in SQL."""
    return (media_features(spark, sf_dir)
            .select("media_id", "media_type", "content_sha", "n_bytes")
            .orderBy("media_id"))
