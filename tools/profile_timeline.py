"""Worker-concurrency timeline for the extraction stage: each UDF batch
logs (pid, t_start, t_end, n_rows, pull_wait) to a shared tmp file."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd
from pyspark.sql import functions as F

from textextract_spark.pipeline import (
    extract_pages, with_format, with_partitioning, _extract_batches,
    _RAW_SCHEMA)
from textextract_spark.session import get_spark
from tools.bench_scaling import _warm_python_workers

LOG = "/tmp/udf_timeline.log"


def _traced(batches):
    first_pull = time.time()
    for pdf in batches:
        t0 = time.time()
        out = list(_extract_batches(iter([pdf])))[0]
        t1 = time.time()
        with open(LOG, "a") as f:
            f.write(f"{os.getpid()},{first_pull:.3f},{t0:.3f},{t1:.3f},"
                    f"{len(pdf)}\n")
        yield out
        first_pull = time.time()


def main():
    cores = sys.argv[1] if len(sys.argv) > 1 else "32"
    corpus = "/root/repo/.bench_cache/pages_20000_s42.parquet"
    spark = get_spark(app_name=f"tl-{cores}", cores=cores)
    _warm_python_workers(spark, 64)
    pages = spark.read.parquet(corpus)
    pages.count()
    winners = pages.groupBy("url").agg(F.max("warc_ts").alias("warc_ts"))
    latest = pages.join(winners, ["url", "warc_ts"], "left_semi")
    df = with_partitioning(with_format(latest), 64, 8)
    df = df.select("url", "warc_ts", "html", "lang", "fmt", "part_key")
    raw = df.mapInPandas(_traced, schema=_RAW_SCHEMA)
    for run in range(3):
        if os.path.exists(LOG):
            os.remove(LOG)
        t0 = time.perf_counter()
        raw.write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        rows = []
        with open(LOG) as f:
            for line in f:
                pid, pull, s, e, n = line.strip().split(",")
                rows.append((int(pid), float(pull), float(s), float(e),
                             int(n)))
        df_log = pd.DataFrame(rows, columns=["pid", "pull", "s", "e", "n"])
        base = df_log["pull"].min()
        busy = (df_log["e"] - df_log["s"]).sum()
        span = df_log["e"].max() - base
        waits = (df_log["s"] - df_log["pull"]).sum()
        print(f"run {run}: wall={wall:6.2f}s span={span:6.2f}s "
              f"batches={len(df_log)} pids={df_log.pid.nunique()} "
              f"busy={busy:6.1f}s pull_wait={waits:6.1f}s "
              f"eff_par={busy/span:4.1f}", flush=True)
        # concurrency histogram at 0.5s resolution
        import numpy as np
        ts = np.arange(0, span, 0.5)
        conc = [((df_log["s"] - base <= t) & (df_log["e"] - base > t)).sum()
                for t in ts]
        print("   conc:", " ".join(str(c) for c in conc), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
