"""WARC source: read Common-Crawl-style WARC files into the pages schema.

A WARC file is a sequence of records, each ``WARC/1.0\\r\\n`` + header
lines + ``\\r\\n`` + Content-Length payload bytes + ``\\r\\n\\r\\n``;
crawl archives gzip each record as its own member and concatenate the
members (so the file is also one valid gzip stream). Response records
carry the HTTP response (status line + headers + body) as payload — the
page bytes are the body after the first blank line.

Scale shape: one WARC file = one row of ``binaryFile`` = one parse task
(crawl WARCs are ~1GB, the standard split unit — this is how production
Spark crawl readers work, e.g. the sparkcc pattern); record parsing is
an Arrow-batched ``mapInPandas`` stage emitting (url, warc_ts, html,
digest) rows, so the output plugs straight into
``pipeline.extract_pages(digest_col='digest')`` and the winner
aggregation never re-hashes payloads. Pure stdlib; total — malformed
records are skipped, never raised.

Reference analog: the capture step feeding the extractor
(/root/reference/src/ocr.py:126-170) — here the capture artifact is the
crawl archive itself.
"""

from __future__ import annotations

import datetime as dt
import gzip
import hashlib
import io
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType, TimestampType,
)

PAGES_FROM_WARC_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("digest", StringType()),
])

_CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# Writer (datagen/tests): build a valid WARC from page records
# ---------------------------------------------------------------------------

def warc_records(rows: list[dict], with_digest: bool = True) -> list[dict]:
    """datagen.generate_pages rows -> build_warc record dicts (tz-naive
    timestamps, optional md5 payload digests) — the conversion every
    test/bench/driver site needs."""
    recs = []
    for r in rows:
        rec = {"url": r["url"],
               "warc_ts": r["warc_ts"].replace(tzinfo=None),
               "html": r["html"]}
        if with_digest:
            rec["digest"] = hashlib.md5(r["html"] or b"").hexdigest()
        recs.append(rec)
    return recs


def build_warc(records: list[dict], compress: bool = True) -> bytes:
    """Serialize records ({url, warc_ts, html, digest?}) as WARC response
    records; ``compress`` gzips each record as its own member (the
    Common Crawl layout)."""
    out = bytearray()
    for r in records:
        body = r["html"] or b""
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Content-Length: " + str(len(body)).encode() + _CRLF
                + _CRLF + body)
        ts = r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        headers = [
            b"WARC/1.0",
            b"WARC-Type: response",
            b"WARC-Target-URI: " + r["url"].encode(),
            b"WARC-Date: " + ts.encode(),
        ]
        if r.get("digest"):
            headers.append(b"WARC-Payload-Digest: " + r["digest"].encode())
        headers.append(b"Content-Length: " + str(len(http)).encode())
        rec = _CRLF.join(headers) + _CRLF + _CRLF + http + _CRLF + _CRLF
        if compress:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(rec)
            out += buf.getvalue()
        else:
            out += rec
    return bytes(out)


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

def _next_marker(data: bytes, start: int) -> int:
    """Offset of the next plausible record marker at or after ``start``:
    ``WARC/<digit>`` — any version (0.x/1.x/a future 2.x), so one
    exotic-version record mid-archive can't end the resync scan. Returns
    -1 when none remains."""
    pos = start
    while True:
        nxt = data.find(b"WARC/", pos)
        if nxt < 0:
            return -1
        v = data[nxt + 5:nxt + 6]
        if v.isdigit():
            return nxt
        pos = nxt + 5


def _parse_warc_stream(data: bytes) -> Iterator[dict]:
    """Yield response records from raw (already-decompressed) WARC bytes.
    Total: a record that fails to parse ends the scan of this file rather
    than raising (truncated archives are routine at crawl scale)."""
    pos, n = 0, len(data)
    while pos < n:
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            return
        head = data[pos:head_end]
        if not head.startswith(b"WARC/"):
            # resync: find the next record marker
            nxt = _next_marker(data, pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        fields = {}
        for line in head.split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields[b"content-length"])
        except (KeyError, ValueError):
            # bad/missing Content-Length on an otherwise valid header:
            # without a length the payload boundary is unknowable, so skip
            # THIS record by resyncing on the next marker — aborting here
            # would silently discard every later intact record in the file
            nxt = _next_marker(data, head_end)
            if nxt < 0:
                return
            pos = nxt
            continue
        payload = data[head_end + 4:head_end + 4 + length]
        if len(payload) < length:
            # stream cut mid-payload: a truncated body must NOT be
            # yielded under the full-content header digest (it would
            # poison digest-keyed dedup downstream) — drop and stop
            return
        pos = head_end + 4 + length
        # consume the record separator if present (tolerate its absence)
        if data[pos:pos + 4] == _CRLF + _CRLF:
            pos += 4
        if fields.get(b"warc-type") != b"response":
            continue
        url = fields.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        raw_ts = fields.get(b"warc-date", b"").decode("ascii", "replace")
        ts = None
        # WARC 1.0 dates are second-granularity; WARC 1.1 allows
        # fractional seconds — accept both, else keep the record with a
        # NULL timestamp (the winner join is null-safe)
        for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
            try:
                ts = dt.datetime.strptime(raw_ts, fmt)
                break
            except ValueError:
                continue
        # page bytes = HTTP body after the header blank line (a payload
        # without an HTTP status line is taken verbatim)
        if payload.startswith(b"HTTP/"):
            body_at = payload.find(_CRLF + _CRLF)
            body = payload[body_at + 4:] if body_at >= 0 else b""
        else:
            body = payload
        digest = fields.get(b"warc-payload-digest")
        # digest-less records (WARC revisits, minimal writers) get a
        # content md5 HERE, while the bytes are in memory: extract_pages'
        # digest_col contract requires a non-null pure-content digest so
        # winner tie-breaks stay deterministic without the winner side
        # ever re-reading payloads
        yield {"url": url, "warc_ts": ts, "html": body,
               "digest": digest.decode("ascii", "replace")
               if digest else hashlib.md5(body).hexdigest()}


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members, KEEPING every member that
    decodes: a crawl archive cut mid-final-member must still yield its
    ~50k intact records (gzip.decompress raises on the torn tail and
    would discard the entire file)."""
    out = bytearray()
    while data[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            out += d.decompress(data)
            out += d.flush()
        except zlib.error:  # corrupt member: keep prior members only
            break
        if not d.eof:
            # torn final member: its partial inflate may end mid-record —
            # that's fine, the stream parser's Content-Length overrun
            # guard drops the incomplete tail record
            break
        data = d.unused_data
    return bytes(out)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse one WARC file's bytes (gzip multi-member or plain)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    return list(_parse_warc_stream(data))


def _warc_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        urls, tss, htmls, digests = [], [], [], []
        for content in pdf["content"]:
            for rec in parse_warc_bytes(bytes(content)):
                urls.append(rec["url"])
                tss.append(rec["warc_ts"])
                htmls.append(rec["html"])
                digests.append(rec["digest"])
        yield pd.DataFrame({
            "url": pd.Series(urls, dtype="object"),
            "warc_ts": pd.Series(tss, dtype="datetime64[us]"),
            "html": pd.Series(htmls, dtype="object"),
            "digest": pd.Series(digests, dtype="object"),
        })


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC file(s) at ``path`` (glob ok) into (url, warc_ts, html,
    digest) — ready for ``extract_pages(..., digest_col='digest')``."""
    files = (spark.read.format("binaryFile").load(path)
             .select("content"))
    return files.mapInPandas(_warc_batches, schema=PAGES_FROM_WARC_SCHEMA)
