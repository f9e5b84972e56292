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
    best = state.get[0] if state.exists else None
    winner = None  # (micros, row-dict)
    for pdf in pdfs:
        for _, row in pdf.iterrows():
            micros = int(row["warc_ts"].value // 1000)
            if (best is None or micros > best) and \
               (winner is None or micros > winner[0]):
                winner = (micros, row)
    if winner is not None:
        state.update((winner[0],))
        row = winner[1]
        yield pd.DataFrame({
            "url": [row["url"]],
            "warc_ts": [row["warc_ts"]],
            "html": [row["html"]],
            "lang": [row["lang"]],
        })


def dedup_latest_stream(pages_stream: DataFrame) -> DataFrame:
    """Streaming dedup-latest: emits a url's row only when its warc_ts
    beats every previously seen crawl of that url."""
    return (pages_stream
            .select("url", "warc_ts", "html", "lang")
            .groupBy("url")
            .applyInPandasWithState(
                _dedup_fn, OUTPUT_SCHEMA, STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))
