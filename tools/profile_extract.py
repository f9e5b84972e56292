"""One-off profiler: time each stage of the extraction plan at a given
core count to find where local[32] loses vs local[8]."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from textextract_spark.pipeline import (
    extract_pages, with_format, with_partitioning, _extract_batches,
    _RAW_SCHEMA)
from textextract_spark.session import get_spark
from tools.bench_scaling import _warm_python_workers


def t(label, df):
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    print(f"{label:35s} {time.perf_counter() - t0:7.2f}s", flush=True)


def main():
    cores = sys.argv[1] if len(sys.argv) > 1 else "32"
    corpus = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/repo/.bench_cache/pages_20000_s42.parquet"
    spark = get_spark(app_name=f"profile-{cores}", cores=cores)
    _warm_python_workers(spark, 64)
    pages = spark.read.parquet(corpus)
    pages.count()

    t("scan only", pages)
    winners = pages.groupBy("url").agg(F.max("warc_ts").alias("warc_ts"))
    latest = pages.join(winners, ["url", "warc_ts"], "left_semi")
    t("scan+dedup semi join", latest)
    gated = with_format(latest)
    t("+format gate", gated)
    parted = with_partitioning(gated, 64, 8)
    t("+salted repartition(64)", parted)
    narrowed = parted.select("url", "warc_ts", "html", "lang", "fmt",
                             "part_key")
    raw = narrowed.mapInPandas(_extract_batches, schema=_RAW_SCHEMA)
    t("+mapInPandas extract", raw)
    full = extract_pages(pages, num_parts=64, n_salts=8)
    t("full plan (repeat 1)", full)
    t("full plan (repeat 2)", full)
    # variant: no repartition — extract straight off the scan partitions
    raw2 = (narrowed.drop("part_key")
            .withColumn("part_key",
                        F.pmod(F.xxhash64("url"), F.lit(64)).cast("int"))
            .mapInPandas(_extract_batches, schema=_RAW_SCHEMA))
    t("extract WITHOUT repartition", raw2)
    spark.stop()


if __name__ == "__main__":
    main()
