"""Stateful streaming dedup: across micro-batches, the last emission per
url must equal the batch dedup-latest winner, and superseded crawls must
not re-emit."""

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from textextract_spark.datagen import PAGES_SCHEMA, generate_pages
from textextract_spark.streaming.stateful import dedup_latest_stream


def test_stream_dedup_matches_batch(spark):
    rows = generate_pages(200, seed=9)
    # split into 3 files -> 3 micro-batches with maxFilesPerTrigger=1
    d = tempfile.mkdtemp(prefix="stateful-")
    pages_dir = os.path.join(d, "pages")
    os.makedirs(pages_dir)
    third = len(rows) // 3
    for i, chunk in enumerate(
            (rows[:third], rows[third:2 * third], rows[2 * third:])):
        tbl = pa.table({
            "url": [r["url"] for r in chunk],
            "warc_ts": [r["warc_ts"].replace(tzinfo=None) for r in chunk],
            "html": [r["html"] for r in chunk],
            "text": [r["text"] for r in chunk],
            "lang": [r["lang"] for r in chunk],
        }, schema=PAGES_SCHEMA)
        pq.write_table(tbl, os.path.join(pages_dir, f"part-{i}.parquet"))

    stream = (spark.readStream.schema(
        "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, "
        "lang STRING")
        .option("maxFilesPerTrigger", "1").parquet(pages_dir))
    q = (dedup_latest_stream(stream)
         .writeStream.format("memory").queryName("dedup_out")
         .option("checkpointLocation", os.path.join(d, "ckpt"))
         .outputMode("update")
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    emitted = spark.sql(
        "SELECT url, warc_ts FROM dedup_out").collect()
    # last (max-ts) emission per url == batch winner
    got = {}
    for r in emitted:
        if r.url not in got or r.warc_ts > got[r.url]:
            got[r.url] = r.warc_ts
    expected = {}
    for r in rows:
        ts = r["warc_ts"].replace(tzinfo=None)
        if r["url"] not in expected or ts > expected[r["url"]]:
            expected[r["url"]] = ts
    assert got == expected
    # monotone: at most one emission per (url, warc_ts)
    assert len(emitted) <= len(rows)
    assert len({(r.url, r.warc_ts) for r in emitted}) == len(emitted)

def test_stream_dedup_tiebreak_matches_batch(spark):
    """Two crawls sharing the max warc_ts: the stream must keep the
    max-md5 payload, exactly like the batch winner key."""
    import datetime as dt
    import hashlib

    d = tempfile.mkdtemp(prefix="stateful-tie-")
    pages_dir = os.path.join(d, "pages")
    os.makedirs(pages_dir)
    ts = dt.datetime(2025, 5, 1, 12, 0, 0)
    payloads = [b"tie payload one", b"tie payload TWO"]
    tbl = pa.table({
        "url": ["u://t", "u://t"],
        "warc_ts": [ts, ts],
        "html": payloads,
        "text": ["", ""],
        "lang": ["en", "en"],
    }, schema=PAGES_SCHEMA)
    pq.write_table(tbl, os.path.join(pages_dir, "part-0.parquet"))

    stream = (spark.readStream.schema(
                  "url string, warc_ts timestamp_ntz, html binary, "
                  "text string, lang string")
              .parquet(pages_dir))
    q = (dedup_latest_stream(stream)
         .writeStream.format("memory").queryName("tie_dedup")
         .option("checkpointLocation", os.path.join(d, "ckpt"))
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from tie_dedup").collect()
    assert len(rows) == 1
    expected = max(payloads,
                   key=lambda p: hashlib.md5(p).hexdigest())
    assert bytes(rows[0].html) == expected
