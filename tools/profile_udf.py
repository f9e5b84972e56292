"""Compare wall time vs in-UDF python time for the extraction stage."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from textextract_spark.pipeline import extract_pages
from textextract_spark.session import get_spark
from tools.bench_scaling import _warm_python_workers


def main():
    cores = sys.argv[1] if len(sys.argv) > 1 else "32"
    corpus = "/root/repo/.bench_cache/pages_20000_s42.parquet"
    spark = get_spark(app_name=f"profudf-{cores}", cores=cores)
    sc = spark.sparkContext
    _warm_python_workers(spark, 64)
    pages = spark.read.parquet(corpus)
    pages.count()
    ext = extract_pages(pages, num_parts=64, n_salts=8)
    agg = ext.agg(F.sum("meta.ms").alias("ms"), F.count("*").alias("n"))
    for i in range(6):
        t0 = time.perf_counter()
        row = agg.collect()[0]
        wall = time.perf_counter() - t0
        status = sc.statusTracker()
        print(f"run {i}: wall={wall:6.2f}s  udf_py={row.ms/1000:7.1f}s "
              f"(x{row.ms/1000/wall:4.1f} parallel)  docs={row.n}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
