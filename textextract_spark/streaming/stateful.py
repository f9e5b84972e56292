"""Custom stateful streaming operator: cross-batch dedup-latest via
applyInPandasWithState (graft brief: custom stateful operators for
Structured Streaming).

The batch pipeline dedups within its input snapshot; a continuous crawl
stream sees the SAME url across micro-batches. Per-url GroupState holds
the best warc_ts seen so far; a row is emitted only when it improves on
the state, so downstream extraction work is monotone: every emitted row
is a new winner for its url, and the last emission per url equals the
batch dedup-latest result (asserted in tests/test_stateful.py).

State is one LONG (epoch micros) per url — at 10^12 urls state lives in
the streaming state store (RocksDB on executors), partitioned by the
same url hash as everything else.
"""

from __future__ import annotations

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

STATE_SCHEMA = StructType([StructField("best_micros", LongType())])


def _dedup_fn(key: Any, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    # vectorized per batch: one argmax over the timestamp column (first
    # occurrence wins ties, matching the batch dedup tie order) — no
    # per-row python loop
    best = state.get[0] if state.exists else None
    winner: tuple[int, pd.DataFrame] | None = None
    for pdf in pdfs:
        if pdf.empty:
            continue
        ns = pdf["warc_ts"].to_numpy().astype("datetime64[ns]").view("int64")
        i = int(ns.argmax())
        micros = int(ns[i]) // 1000
        if winner is None or micros > winner[0]:
            winner = (micros, pdf.iloc[[i]])
    if winner is not None and (best is None or winner[0] > best):
        state.update((winner[0],))
        yield winner[1][["url", "warc_ts", "html", "lang"]]


def dedup_latest_stream(pages_stream: DataFrame) -> DataFrame:
    """Streaming dedup-latest: emits a url's row only when its warc_ts
    beats every previously seen crawl of that url."""
    return (pages_stream
            .select("url", "warc_ts", "html", "lang")
            .groupBy("url")
            .applyInPandasWithState(
                _dedup_fn, OUTPUT_SCHEMA, STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))
