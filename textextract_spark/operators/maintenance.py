"""Upsert/MERGE maintenance ops (SURVEY.md §2.4 A2/A4).

The reference does read-modify-write counter upserts per request
(/root/reference/backend/database/models.py:397-425 daily counters,
models.py:290-308 credit decrement). The Spark rebuild NEVER does per-row
RMW: usage is aggregated once per batch, then applied with a single
set-based merge — on Iceberg this is `MERGE INTO metrics USING updates ON
keys WHEN MATCHED THEN UPDATE ... WHEN NOT MATCHED THEN INSERT`.

Scale shape: the table is hash-bucketed on the merge keys and a merge
rewrites ONLY the buckets its updates touch (ManifestTable
.replace_partitions — the Iceberg dynamic-partition-overwrite analog).
At 10^9 counter rows a batch touching 1% of keys re-reads and rewrites
~1% of buckets, not the whole table (the r1 stand-in was O(table) per
merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.table import ManifestTable

N_BUCKETS = 16
BUCKET_COL = "__bucket"


def _with_bucket(df: DataFrame, keys: list[str],
                 n_buckets: int) -> DataFrame:
    cols = [F.col(k).cast("string") for k in keys]
    return df.withColumn(
        BUCKET_COL,
        F.pmod(F.xxhash64(*cols), F.lit(n_buckets)).cast("int"))


def merge_counters(spark: SparkSession, table: ManifestTable,
                   updates: DataFrame, keys: list[str],
                   counter_cols: list[str],
                   n_buckets: int = N_BUCKETS) -> DataFrame:
    """Set-based MERGE of counter increments into a keyed table.

    Matched keys add counters; unmatched insert. Only the key-hash
    buckets present in ``updates`` are re-read and re-committed.
    Returns the merged table state (bucket column dropped).
    """
    # pre-aggregate: duplicate keys in updates would fan out the merge
    # join (double-adding counters and committing duplicate key rows)
    updates = updates.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in counter_cols])
    upd = _with_bucket(updates, keys, n_buckets)
    touched = sorted(r[0] for r in
                     upd.select(BUCKET_COL).distinct().collect())
    if not touched:
        # empty updates on a fresh table: committing a zero-row snapshot
        # would poison reads (parquet writes no schema for zero rows) —
        # return current state (or the empty updates frame, schema intact)
        current = table.read_keyed(spark, BUCKET_COL)
        return (current.drop(BUCKET_COL) if current is not None
                else updates)
    current = table.read_keyed(spark, BUCKET_COL)
    if current is None:
        merged = upd
    else:
        cur = (current.filter(F.col(BUCKET_COL).isin(touched))
               .select(*keys, *[F.col(c).alias(f"__cur_{c}")
                                for c in counter_cols]))
        u = upd.select(*keys, *[F.col(c).alias(f"__upd_{c}")
                                for c in counter_cols])
        merged = _with_bucket(
            cur.join(u, keys, "full_outer").select(
                *keys,
                *[(F.coalesce(F.col(f"__cur_{c}"), F.lit(0))
                   + F.coalesce(F.col(f"__upd_{c}"), F.lit(0))).alias(c)
                  for c in counter_cols]),
            keys, n_buckets)
    table.replace_partitions(merged, BUCKET_COL, touched)
    out = table.read_keyed(spark, BUCKET_COL)
    return out.drop(BUCKET_COL)


def decrement_credits(spark: SparkSession, table: ManifestTable,
                      usage: DataFrame, key: str, credit_col: str,
                      used_col: str,
                      n_buckets: int = N_BUCKETS) -> DataFrame:
    """A4 credit decrement with floor at 0, as one set-based merge over
    only the buckets with usage. The credits table must have been
    committed via merge_counters/seed_credits (bucketed layout)."""
    # pre-aggregate per key: the reference emits per-request usage rows
    # (models.py:290-308 decrements once per request), so duplicate keys
    # are the EXPECTED input shape — joining them raw would fan out the
    # left join and commit duplicate key rows with conflicting credit
    # values (merge_counters has the same guard)
    usage = (usage.select(key, used_col)
             .groupBy(key).agg(F.sum(used_col).alias(used_col)))
    ug = _with_bucket(usage, [key], n_buckets)
    current = table.read_keyed(spark, BUCKET_COL)
    if current is None:
        raise ValueError(
            f"credits table at {table.path} is not seeded — call "
            "seed_credits/merge_counters before decrement_credits")
    # only buckets that exist in the credits table can be decremented —
    # usage rows for unknown keys are a no-op, and committing an empty
    # bucket snapshot would poison reads (parquet writes no schema for
    # zero rows)
    have = {r[0] for r in
            current.select(BUCKET_COL).distinct().collect()}
    touched = sorted({r[0] for r in
                      ug.select(BUCKET_COL).distinct().collect()} & have)
    if not touched:
        return current.drop(BUCKET_COL)
    merged = (current.filter(F.col(BUCKET_COL).isin(touched))
              .join(ug.drop(BUCKET_COL), key, "left")
              .withColumn(
                  credit_col,
                  F.greatest(
                      F.lit(0),
                      F.col(credit_col)
                      - F.coalesce(F.col(used_col), F.lit(0))))
              .drop(used_col))
    table.replace_partitions(merged, BUCKET_COL, touched)
    return table.read_keyed(spark, BUCKET_COL).drop(BUCKET_COL)


def seed_credits(spark: SparkSession, table: ManifestTable,
                 df: DataFrame, key: str,
                 n_buckets: int = N_BUCKETS) -> None:
    """Initial commit of a credits table in the bucketed layout."""
    seeded = _with_bucket(df, [key], n_buckets)
    table.replace_partitions(seeded, BUCKET_COL, list(range(n_buckets)))
