"""Watermarked event-time window aggregation over the crawl stream.

The streaming twin of the batch rate-limit/lineage windows (SURVEY.md
§2.4 A5): per (window, host) crawl counts with a watermark bounding how
late a warc_ts may arrive before its window is finalized and emitted
(append mode — a window row is output exactly once, when the watermark
passes its end). This is the standard Structured Streaming shape for
late data: state is bounded by the watermark horizon, not the stream
length, so it runs indefinitely at crawl scale.

Reference analog: the in-memory per-IP rate-limit window
(/root/reference/backend/routes/auth_routes.py:88-120) — re-expressed as
an event-time aggregation instead of wall-clock dict counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _host_window_agg(pages: DataFrame, window: str) -> DataFrame:
    """The shared aggregation: one definition so the stream and its
    batch equivalence oracle cannot drift apart."""
    host = F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1)
    return (pages
            .groupBy(F.window("warc_ts", window).alias("w"),
                     host.alias("host"))
            .agg(F.count("*").alias("crawls"),
                 F.sum(F.length("html")).alias("bytes"))
            .select(F.col("w.start").alias("window_start"), "host",
                    "crawls", "bytes"))


def crawl_rate_by_host(pages_stream: DataFrame,
                       window: str = "15 minutes",
                       watermark: str = "30 minutes") -> DataFrame:
    """Tumbling event-time crawl counts per host with late-data bound.

    Returns (window_start, host, crawls, bytes) in append mode: rows
    emit only after the watermark passes the window end, so every
    emitted row is final (exactly-once per window+host downstream).
    """
    # watermarks require TIMESTAMP (not NTZ); session TZ is pinned UTC
    return _host_window_agg(
        pages_stream.withColumn("warc_ts",
                                F.col("warc_ts").cast("timestamp"))
                    .withWatermark("warc_ts", watermark), window)


def crawl_rate_by_host_batch(pages: DataFrame,
                             window: str = "15 minutes") -> DataFrame:
    """Batch twin of crawl_rate_by_host (equivalence oracle: on a fully
    drained stream, the streaming result must equal this)."""
    return _host_window_agg(
        pages.withColumn("warc_ts", F.col("warc_ts").cast("timestamp")),
        window)
