"""Upsert/MERGE maintenance ops (SURVEY.md §2.4 A2/A4).

The reference does read-modify-write counter upserts per request
(/root/reference/backend/database/models.py:397-425 daily counters,
models.py:290-308 credit decrement). The Spark rebuild NEVER does per-row
RMW: usage is aggregated once per batch, then applied with a single
set-based merge — on Iceberg this is `MERGE INTO metrics USING updates ON
keys WHEN MATCHED THEN UPDATE ... WHEN NOT MATCHED THEN INSERT`; here the
same semantics over the ManifestTable stand-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.table import ManifestTable


def merge_counters(spark: SparkSession, table: ManifestTable,
                   updates: DataFrame, keys: list[str],
                   counter_cols: list[str]) -> DataFrame:
    """Set-based MERGE of counter increments into a keyed table.

    Matched keys add counters; unmatched insert. Returns the merged
    DataFrame after committing it as the table's new state (snapshot
    overwrite = the Iceberg MERGE commit).
    """
    current = table.read(spark)
    if current is None:
        merged = updates
    else:
        cur = current.select(
            *keys, *[F.col(c).alias(f"__cur_{c}") for c in counter_cols])
        upd = updates.select(
            *keys, *[F.col(c).alias(f"__upd_{c}") for c in counter_cols])
        merged = cur.join(upd, keys, "full_outer").select(
            *keys,
            *[(F.coalesce(F.col(f"__cur_{c}"), F.lit(0))
               + F.coalesce(F.col(f"__upd_{c}"), F.lit(0))).alias(c)
              for c in counter_cols])
    table.overwrite(merged)
    return table.read(spark)


def decrement_credits(spark: SparkSession, table: ManifestTable,
                      usage: DataFrame, key: str, credit_col: str,
                      used_col: str) -> DataFrame:
    """A4 credit decrement with floor at 0, as one set-based merge."""
    current = table.read(spark)
    merged = (current.join(usage.select(key, used_col), key, "left")
              .withColumn(
                  credit_col,
                  F.greatest(
                      F.lit(0),
                      F.col(credit_col)
                      - F.coalesce(F.col(used_col), F.lit(0))))
              .drop(used_col))
    table.overwrite(merged)
    return table.read(spark)
