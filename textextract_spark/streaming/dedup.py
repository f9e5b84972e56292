"""JVM-native bounded-state streaming dedup: exact crawl-record
duplicates (replayed WARC segments — same url + warc_ts re-delivered
across micro-batches) dropped with ``dropDuplicatesWithinWatermark``.

This is the SCALE default next to the custom stateful operator
(stateful.dedup_latest_stream): the native operator keeps its state in
the streaming state store (RocksDB) entirely JVM-side, evicts it as the
watermark advances (bounded by the watermark horizon, not stream
length), and needs no Python worker round trip. The custom
applyInPandasWithState operator remains for the semantics the native one
cannot express — keep-best-winner with the md5 tie-break — while THIS
one covers the exact-duplicate replay case the batch pipeline handles
with its per-task seen-url guard (pipeline._extract_batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_replayed_crawls(pages_stream: DataFrame,
                         watermark: str = "30 minutes") -> DataFrame:
    """Drop exact (url, warc_ts) duplicate crawl records arriving within
    the watermark horizon of each other.

    Semantics: the first arrival wins; re-deliveries within the horizon
    are dropped; a duplicate arriving LATER than the horizon is treated
    as new (the bounded-state tradeoff — at crawl scale an unbounded
    exact-dedup would hold 10^12 keys forever). Downstream content-hash
    dedup (textdata.dedup_exact) remains the unbounded batch remedy.
    """
    return (pages_stream
            .withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
            .withWatermark("warc_ts", watermark)
            .dropDuplicatesWithinWatermark(["url", "warc_ts"]))


def drop_recrawled_urls(pages_stream: DataFrame,
                        watermark: str = "30 minutes") -> DataFrame:
    """Crawl-frontier dedup on the stream: drop re-crawls of the SAME
    PAGE — url variants that collapse to one canonical form
    (urls.canonicalize_url: casing/default-port/fragment/utm/trailing
    slash) — arriving within the watermark horizon of each other.

    First arrival wins within the horizon (the frontier decision: "we
    already fetched this recently"); the batch-side
    urls.dedup_by_canonical_url keeps LATEST-capture semantics for the
    unbounded historical table. Same bounded-RocksDB-state /
    JVM-native shape as drop_replayed_crawls.
    """
    from ..operators.urls import canonicalize_url

    return (pages_stream
            .withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
            .withColumn("canonical_url", canonicalize_url(F.col("url")))
            .withWatermark("warc_ts", watermark)
            .dropDuplicatesWithinWatermark(["canonical_url"]))
