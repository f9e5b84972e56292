"""Release-feed operators: the update-check path (SURVEY.md §3.3) as one
declarative plan over a JSON source.

Reference: GET releases JSON -> skip draft/prerelease -> pick newest by
version -> match platform asset suffix -> force_update if CRITICAL in
body (/root/reference/backend/routes/update_routes.py:62-277, version
compare at 167-183). The reference does this in Python over the parsed
list; here it is spark.read.json (S4) + filters (P6) + a version-ordering
window (W1/W2/F6) + array filtering (F4/F7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

_FEED_EPOCH = 1735689600  # 2025-01-01T00:00:00Z
_FEED_SIZE = 24


def parse_version(col):
    """'v1.2.3' -> [1,2,3] (F5/F6: strip prefix, split, cast)."""
    return F.transform(
        F.split(F.regexp_replace(col, r"^v", ""), r"\."),
        lambda x: x.cast("int"))


def latest_release(releases: DataFrame, platform_suffix: str = ".exe") -> DataFrame:
    """Top-1 non-draft, non-prerelease release by semantic version, with
    the platform asset and the force-update flag."""
    w = Window.orderBy(F.desc("version_parts"), F.desc("published_at"))
    return (releases
            .filter(~F.col("draft") & ~F.col("prerelease"))
            .withColumn("version_parts", parse_version(F.col("tag_name")))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "tag_name", "published_at",
                F.filter("assets",  # a["name"]: .name collides with
                         # Column.name (the alias method)
                         lambda a: a["name"].endswith(platform_suffix))
                 .getItem(0).alias("asset"),
                F.upper(F.col("body")).contains("CRITICAL")
                 .alias("force_update")))


def synth_feed(spark: SparkSession) -> DataFrame:
    """Deterministic synthetic releases feed (no external data): version
    parts, draft/prerelease flags, CRITICAL bodies, and per-platform
    assets are all pure functions of the row index, so a DuckDB oracle
    can reconstruct the feed exactly (operators.oracles latest_release).
    """
    i = F.col("id")
    tag = F.concat(F.lit("v"), (i % 4).cast("string"), F.lit("."),
                   ((i * 7) % 10).cast("string"), F.lit("."),
                   ((i * 3) % 8).cast("string"))
    return spark.range(_FEED_SIZE).select(
        tag.alias("tag_name"),
        F.timestamp_seconds(F.lit(_FEED_EPOCH) + i * 86400)
         .alias("published_at"),
        (i % 11 == 0).alias("draft"),
        (i % 7 == 0).alias("prerelease"),
        F.when(i % 5 == 0, F.lit("Critical security fix"))
         .otherwise(F.lit("routine notes")).alias("body"),
        F.array(
            F.struct(F.concat(F.lit("TextExtract-"), tag, F.lit(".exe"))
                      .alias("name")),
            F.struct(F.concat(F.lit("TextExtract-"), tag, F.lit(".dmg"))
                      .alias("name"))).alias("assets"))


def latest_release_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-correctness entry for the update-check path (SURVEY §3.3,
    P6/W1/W2/F4-F7): top release of the synthetic feed, flattened to
    oracle-comparable columns."""
    top = latest_release(synth_feed(spark))
    return top.select(
        "tag_name",
        F.date_format("published_at", "yyyy-MM-dd HH:mm:ss")
         .alias("published_at"),
        F.col("asset.name").alias("asset_name"),
        "force_update")


_FEED_CACHE: dict[str, DataFrame] = {}


def cached_feed(spark: SparkSession) -> DataFrame:
    """S4 cache analog: the reference caches the releases feed in memory
    for 10 minutes with a file fallback
    (/root/reference/backend/routes/update_routes.py:62-165). The Spark
    analog is ``df.cache()`` of the (tiny) dim — every query in the
    session reuses the InMemoryRelation instead of re-reading the source;
    the TTL becomes an explicit ``invalidate_feed_cache`` (on a real
    deployment, re-reading an Iceberg snapshot id). Payload tables are
    deliberately NEVER cached (SCALE.md: feeding an exchange from
    InMemoryColumnar measured ~4x slower than re-scanning parquet)."""
    key = spark.sparkContext.applicationId
    df = _FEED_CACHE.get(key)
    if df is None:
        df = synth_feed(spark).cache()
        _FEED_CACHE[key] = df
    return df


def invalidate_feed_cache(spark: SparkSession) -> None:
    """The 10-min-TTL-expiry analog: drop the cached dim."""
    key = spark.sparkContext.applicationId
    df = _FEED_CACHE.pop(key, None)
    if df is not None:
        df.unpersist()


def is_newer(candidate, current) -> F.Column:
    """W2 version gate (updater.py:168-193): candidate > current by
    numeric part-wise comparison — array comparison is lexicographic."""
    return parse_version(candidate) > parse_version(current)
