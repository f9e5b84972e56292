"""Update-check path (§3.3): JSON source -> draft/prerelease filter ->
version-ordered top-1 -> platform asset match -> force_update flag."""

import json
import os
import tempfile

from pyspark.sql import functions as F

from textextract_spark.operators.releases import is_newer, latest_release

RELEASES = [
    {"tag_name": "v1.9.0", "published_at": "2025-01-01T00:00:00Z",
     "draft": False, "prerelease": False, "body": "fixes",
     "assets": [{"name": "TextExtract-1.9.0.exe", "size": 100},
                {"name": "TextExtract-1.9.0.dmg", "size": 90}]},
    {"tag_name": "v1.10.2", "published_at": "2025-03-01T00:00:00Z",
     "draft": False, "prerelease": False,
     "body": "CRITICAL security fix",
     "assets": [{"name": "TextExtract-1.10.2.exe", "size": 120}]},
    {"tag_name": "v2.0.0-rc", "published_at": "2025-04-01T00:00:00Z",
     "draft": False, "prerelease": True, "body": "rc",
     "assets": [{"name": "TextExtract-2.0.0.exe", "size": 130}]},
    {"tag_name": "v1.10.3", "published_at": "2025-05-01T00:00:00Z",
     "draft": True, "prerelease": False, "body": "draft",
     "assets": [{"name": "TextExtract-1.10.3.exe", "size": 121}]},
]


def test_latest_release_json_source(spark):
    d = tempfile.mkdtemp(prefix="releases-")
    path = os.path.join(d, "releases.json")
    with open(path, "w") as f:
        for r in RELEASES:
            f.write(json.dumps(r) + "\n")
    releases = spark.read.json(path)

    row = latest_release(releases, ".exe").collect()[0]
    # v1.10.2 wins: drafts/prereleases skipped, 1.10 > 1.9 numerically
    # (string compare would pick 1.9 — the F6 split+cast matters)
    assert row.tag_name == "v1.10.2"
    assert row.asset.name == "TextExtract-1.10.2.exe"
    assert row.force_update is True


def test_is_newer_version_gate(spark):
    df = spark.createDataFrame(
        [("v1.10.2", "1.9.9"), ("v1.2.0", "1.10.0"), ("v1.2.3", "1.2.3")],
        "candidate STRING, current STRING")
    got = [r.newer for r in df.select(
        is_newer(F.col("candidate"), F.col("current")).alias("newer"))
        .collect()]
    assert got == [True, False, False]


def test_cached_feed_reuses_inmemory_relation(spark):
    """S4 cache analog: second use of the cached dim must read the
    InMemoryRelation, not re-evaluate the source; invalidation drops it."""
    from textextract_spark.operators.releases import (
        cached_feed, invalidate_feed_cache, latest_release)

    invalidate_feed_cache(spark)
    feed = cached_feed(spark)
    first = latest_release(feed).collect()
    again = latest_release(cached_feed(spark))
    plan = again._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    assert again.collect() == first
    invalidate_feed_cache(spark)
