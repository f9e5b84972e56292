"""Streaming-vs-batch equivalence: the foreachBatch stream over the corpus
directory must produce byte-identical extractions to the batch pipeline."""

import os
import shutil
import tempfile

from textextract_spark.datagen import generate_pages, golden_rows
from textextract_spark.io.table import ManifestTable
from textextract_spark.streaming.stream import stream_extract


def test_stream_matches_batch(spark, corpus_dir):
    workdir = tempfile.mkdtemp(prefix="textx-stream-")
    pages_dir = os.path.join(workdir, "pages")
    os.makedirs(pages_dir)
    shutil.copy(corpus_dir, os.path.join(pages_dir, "part-0.parquet"))

    q = stream_extract(
        spark, pages_dir,
        out_dir=os.path.join(workdir, "extracted"),
        checkpoint_dir=os.path.join(workdir, "ckpt"))
    q.awaitTermination(300)

    out = ManifestTable(os.path.join(workdir, "extracted")).read(spark)
    got = {r.url: (r.text, r.status) for r in out.collect()}
    golden = golden_rows(generate_pages(400, seed=42))
    assert got == {u: (g["text"], g["status"]) for u, g in golden.items()}


def test_stream_replayed_epochs_are_idempotent(spark, corpus_dir):
    """foreachBatch is at-least-once; a replay of already-committed epochs
    (same checkpoint identity, e.g. checkpoint lost after the manifest
    commit) must not duplicate output snapshots."""
    workdir = tempfile.mkdtemp(prefix="textx-replay-")
    pages_dir = os.path.join(workdir, "pages")
    os.makedirs(pages_dir)
    shutil.copy(corpus_dir, os.path.join(pages_dir, "part-0.parquet"))
    out_dir = os.path.join(workdir, "extracted")

    q = stream_extract(spark, pages_dir, out_dir=out_dir,
                       checkpoint_dir=os.path.join(workdir, "ckpt"))
    q.awaitTermination(300)
    tbl = ManifestTable(out_dir)
    n_snaps = len(tbl.snapshots())
    n_rows = tbl.read(spark).count()
    assert n_snaps > 0

    # replay: fresh checkpoint state, same checkpoint identity -> same
    # epoch ids re-delivered; the sink must skip them all
    shutil.rmtree(os.path.join(workdir, "ckpt"))
    q2 = stream_extract(spark, pages_dir, out_dir=out_dir,
                        checkpoint_dir=os.path.join(workdir, "ckpt"))
    q2.awaitTermination(300)
    assert len(tbl.snapshots()) == n_snaps
    assert tbl.read(spark).count() == n_rows


def test_watermarked_window_agg_matches_batch(spark):
    """Append-mode watermarked window counts over a drained stream must
    equal the batch window aggregation (every window finalized once)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from textextract_spark.datagen import PAGES_SCHEMA, generate_pages
    from textextract_spark.streaming.stream import PAGES_SCHEMA as READ_SCHEMA
    from textextract_spark.streaming.windowed import (
        crawl_rate_by_host, crawl_rate_by_host_batch)

    rows = generate_pages(300, seed=11)
    workdir = tempfile.mkdtemp(prefix="textx-window-")
    pages_dir = os.path.join(workdir, "pages")
    os.makedirs(pages_dir)
    half = len(rows) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        tbl = pa.table({
            "url": [r["url"] for r in chunk],
            "warc_ts": [r["warc_ts"].replace(tzinfo=None) for r in chunk],
            "html": [r["html"] for r in chunk],
            "text": [r["text"] for r in chunk],
            "lang": [r["lang"] for r in chunk],
        }, schema=PAGES_SCHEMA)
        pq.write_table(tbl, os.path.join(pages_dir, f"part-{i}.parquet"))

    stream = (spark.readStream.schema(READ_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(pages_dir))
    out_dir = os.path.join(workdir, "out")
    q = (crawl_rate_by_host(stream)
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", os.path.join(workdir, "ckpt"))
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = {(r.window_start, r.host): (r.crawls, r.bytes)
           for r in spark.read.parquet(out_dir).collect()}
    pages = spark.read.parquet(os.path.join(pages_dir, "*.parquet"))
    expected = {(r.window_start, r.host): (r.crawls, r.bytes)
                for r in crawl_rate_by_host_batch(pages).collect()}
    # append mode withholds windows the watermark hasn't passed — the
    # LAST windows may be missing; everything emitted must match batch,
    # and most windows must have been finalized
    assert got
    for k, v in got.items():
        assert expected[k] == v, k
    assert len(got) >= len(expected) * 0.8


def test_native_stream_dedup_drops_replays(spark):
    """dropDuplicatesWithinWatermark: a micro-batch replay of identical
    (url, warc_ts) crawl records must be dropped JVM-side; distinct
    records all survive; a drained stream equals batch dropDuplicates."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from textextract_spark.datagen import PAGES_SCHEMA, generate_pages
    from textextract_spark.streaming.dedup import drop_replayed_crawls

    rows = generate_pages(120, seed=21)
    d = tempfile.mkdtemp(prefix="natdedup-")
    pages_dir = os.path.join(d, "pages")
    os.makedirs(pages_dir)

    def write(chunk, name):
        tbl = pa.table({
            "url": [r["url"] for r in chunk],
            "warc_ts": [r["warc_ts"].replace(tzinfo=None) for r in chunk],
            "html": [r["html"] for r in chunk],
            "text": [r["text"] for r in chunk],
            "lang": [r["lang"] for r in chunk],
        }, schema=PAGES_SCHEMA)
        pq.write_table(tbl, os.path.join(pages_dir, name))

    half = len(rows) // 2
    write(rows[:half], "part-0.parquet")
    # second file REPLAYS the first half (byte-identical records) and
    # adds the rest — replays land in a later micro-batch
    write(rows[:half] + rows[half:], "part-1.parquet")

    stream = (spark.readStream.schema(
        "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, "
        "lang STRING")
        .option("maxFilesPerTrigger", "1").parquet(pages_dir))
    q = (drop_replayed_crawls(stream)
         .writeStream.format("memory").queryName("nat_dedup")
         .option("checkpointLocation", os.path.join(d, "ckpt"))
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = [(r.url, r.warc_ts) for r in
           spark.sql("SELECT url, warc_ts FROM nat_dedup").collect()]
    expected = {(r["url"], r["warc_ts"].replace(tzinfo=None))
                for r in rows}
    assert len(got) == len(expected), (len(got), len(expected))
    assert set(got) == expected


def test_stream_canonical_url_dedup(spark):
    """drop_recrawled_urls: url VARIANTS of the same page (casing, default
    port, fragment, utm params, trailing slash) arriving across
    micro-batches collapse to one emitted row per canonical url; distinct
    pages all survive."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from textextract_spark.streaming.dedup import drop_recrawled_urls

    d = tempfile.mkdtemp(prefix="urldedup-")
    pages_dir = os.path.join(d, "pages")
    os.makedirs(pages_dir)
    base = __import__("datetime").datetime(2025, 1, 1)

    def write(recs, name):
        tbl = pa.table({
            "url": [u for u, _ in recs],
            "warc_ts": pa.array([base.replace(second=s) for _, s in recs],
                                pa.timestamp("us")),
        })
        pq.write_table(tbl, os.path.join(pages_dir, name))

    # batch 1: three distinct pages; batch 2: variant re-crawls of the
    # first two + one genuinely new page
    write([("http://example.com/a", 0),
           ("https://example.com/b?id=1", 1),
           ("http://other.org/c", 2)], "part-0.parquet")
    write([("HTTP://Example.COM:80/a/", 10),
           ("https://example.com:443/b?utm_source=x&id=1#f", 11),
           ("http://other.org/d", 12)], "part-1.parquet")

    stream = (spark.readStream.schema("url STRING, warc_ts TIMESTAMP")
              .option("maxFilesPerTrigger", "1").parquet(pages_dir))
    q = (drop_recrawled_urls(stream)
         .writeStream.format("memory").queryName("url_dedup_stream")
         .option("checkpointLocation", os.path.join(d, "ckpt"))
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = {r.canonical_url for r in
           spark.sql("SELECT canonical_url FROM url_dedup_stream")
           .collect()}
    assert got == {"http://example.com/a", "https://example.com/b?id=1",
                   "http://other.org/c", "http://other.org/d"}
    # exactly one row per canonical url (variants were dropped, not
    # re-emitted)
    n = spark.sql("SELECT count(*) c FROM url_dedup_stream").collect()[0].c
    assert n == 4


def test_stream_extract_warc_end_to_end(spark):
    """The full streaming WARC journey (r5): binaryFile stream over a
    GROWING crawl dir -> WARC parse -> frontier dedup -> extract with
    checkpoint/resume. Wave 2 contains canonical-url variant RECRAWLS of
    wave-1 pages (different payloads): the restored frontier state must
    drop them across query restarts, the extracted table must equal the
    batch pipeline over wave1 + the genuinely-new wave-2 pages, and a
    rerun on the same checkpoint must add nothing."""
    import datetime as dt
    import hashlib

    from pyspark.sql import functions as F

    from textextract_spark.io.warc import build_warc, read_warc
    from textextract_spark.pipeline import extract_pages
    from textextract_spark.streaming.stream import stream_extract_warc

    t0 = dt.datetime(2025, 1, 1, 12, 0, 0)

    def rec(url, text, sec):
        html = (f"<html><body><nav><a href='/x'>nav</a></nav><article>"
                f"<p>{text}</p></article></body></html>").encode()
        return {"url": url, "warc_ts": t0 + dt.timedelta(seconds=sec),
                "html": html,
                "digest": hashlib.md5(html).hexdigest()}

    pad = "sufficient body words for the density scorer to keep"
    wave1 = [rec(f"https://example.com/p/{i}",
                 f"original content {i} {pad}", i)
             for i in range(30)]
    # variant recrawls (same canonical url, new payload, +120 s) + new
    recrawl = [rec(f"https://Example.COM:443/p/{i}",
                   f"recrawled content {i} {pad}", 120 + i)
               for i in range(0, 30, 3)]
    new2 = [rec(f"https://example.com/q/{i}",
                f"second wave {i} {pad}", 200 + i)
            for i in range(10)]

    workdir = tempfile.mkdtemp(prefix="textx-warcstream-")
    crawl = os.path.join(workdir, "crawl")
    os.makedirs(crawl)
    out_dir = os.path.join(workdir, "extracted")
    ckpt = os.path.join(workdir, "ckpt")

    def write_warc(recs, name):
        with open(os.path.join(crawl, name), "wb") as f:
            f.write(build_warc(recs, compress=True))

    write_warc(wave1[:15], "crawl-000.warc.gz")
    write_warc(wave1[15:], "crawl-001.warc.gz")
    q = stream_extract_warc(spark, crawl, out_dir, ckpt)
    q.awaitTermination(300)

    # the crawl grows; restart the stream on the SAME checkpoint
    write_warc(recrawl + new2[:5], "crawl-002.warc.gz")
    write_warc(new2[5:], "crawl-003.warc.gz")
    q = stream_extract_warc(spark, crawl, out_dir, ckpt)
    q.awaitTermination(300)

    tbl = ManifestTable(out_dir)
    got = {r.url: (r.text, r.status) for r in tbl.read(spark).collect()}
    # recrawl variants dropped by the RESTORED frontier state: neither
    # their raw urls nor a second canonical copy appear
    assert set(got) == ({r["url"] for r in wave1}
                        | {r["url"] for r in new2})
    for i in range(0, 30, 3):
        assert got[f"https://example.com/p/{i}"][0] == \
            f"original content {i} {pad}"

    # batch equivalence over the same accepted record set
    batch_dir = os.path.join(workdir, "batch")
    os.makedirs(batch_dir)
    with open(os.path.join(batch_dir, "all.warc.gz"), "wb") as f:
        f.write(build_warc(wave1 + new2, compress=True))
    batch = extract_pages(
        read_warc(spark, batch_dir)
        .withColumn("lang", F.lit(None).cast("string")),
        num_parts=16, n_salts=4, digest_col="digest")
    want = {r.url: (r.text, r.status) for r in batch.collect()}
    assert got == want

    # resume idempotence: nothing new -> no new snapshots
    n_snaps = len(tbl.snapshots())
    q = stream_extract_warc(spark, crawl, out_dir, ckpt)
    q.awaitTermination(300)
    assert len(tbl.snapshots()) == n_snaps
