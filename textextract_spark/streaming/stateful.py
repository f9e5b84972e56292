"""Custom stateful streaming operator: cross-batch dedup-latest via
applyInPandasWithState (graft brief: custom stateful operators for
Structured Streaming).

The batch pipeline dedups within its input snapshot; a continuous crawl
stream sees the SAME url across micro-batches. Per-url GroupState holds
the best (warc_ts, md5(html)) seen so far — the IDENTICAL winner key the
batch pipeline and golden_rows use, so timestamp ties resolve the same
way in all three places. A row is emitted only when it improves on the
state, so downstream extraction work is monotone: every emitted row is a
new winner for its url, and the last emission per url equals the batch
dedup-latest result (asserted in tests/test_stateful.py).

State is (LONG epoch-micros, 32-char digest) per url — at 10^12 urls
state lives in the streaming state store (RocksDB on executors),
partitioned by the same url hash as everything else.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("lang", StringType()),
])

STATE_SCHEMA = StructType([
    StructField("best_micros", LongType()),
    StructField("best_digest", StringType()),
])


def _dedup_fn(key: Any, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    # vectorized per batch: argmax over the timestamp column; md5 is
    # computed only for the (rare) rows tied at the batch max — the
    # same (warc_ts, md5(html)) winner key as the batch pipeline
    best: tuple[int, str] | None = (
        (state.get[0], state.get[1]) if state.exists else None)
    winner: tuple[int, str, pd.DataFrame] | None = None
    for pdf in pdfs:
        if pdf.empty:
            continue
        ns = pdf["warc_ts"].to_numpy().astype("datetime64[ns]").view("int64")
        mx = int(ns.max())
        tied = (ns == mx).nonzero()[0]
        digests = [hashlib.md5(pdf["html"].iloc[int(i)] or b"").hexdigest()
                   for i in tied]
        k = max(range(len(tied)), key=digests.__getitem__)
        cand = (mx // 1000, digests[k], pdf.iloc[[int(tied[k])]])
        if winner is None or (cand[0], cand[1]) > (winner[0], winner[1]):
            winner = cand
    if winner is not None and (best is None
                               or (winner[0], winner[1]) > best):
        state.update((winner[0], winner[1]))
        yield winner[2][["url", "warc_ts", "html", "lang"]]


def dedup_latest_stream(pages_stream: DataFrame) -> DataFrame:
    """Streaming dedup-latest: emits a url's row only when its
    (warc_ts, md5(html)) beats every previously seen crawl of that url."""
    return (pages_stream
            .select("url", "warc_ts", "html", "lang")
            .groupBy("url")
            .applyInPandasWithState(
                _dedup_fn, OUTPUT_SCHEMA, STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))
