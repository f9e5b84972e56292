"""Round-7 optimization harness (guide §1.4): per-query noop-sink
isolation timings and .explain("formatted") plan capture, WITHOUT
touching the frozen driver-facing bench.py.

Usage:
    python bench_extra.py time  [sf_dir] [q1 q2 ...]   # noop timings
    python bench_extra.py plans [sf_dir] [out_dir] [q1 q2 ...]

`time` prints one JSON line {"queries": {name: best_sec}, "sf": ...}
with best-of-N (default 2, $BENCH_EXTRA_REPS) after one untimed warm
rep per query. `plans` writes <out_dir>/<query>.txt with the formatted
physical plan. Jobs are labelled via setJobDescription (guide §1.5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _spark(cores: str):
    from textextract_spark.session import get_spark
    return get_spark(app_name="textextract-bench-extra", cores=cores)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    sf_dir = (sys.argv[2] if len(sys.argv) > 2
              else os.environ.get("SPARK_GRAFT_SF_DIR",
                                  "/root/testdata/sf0.1"))
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    import __spark_entry__ as entry_mod
    qmap = entry_mod.queries()

    if mode == "plans":
        out_dir = sys.argv[3] if len(sys.argv) > 3 else "plans/r07"
        names = sys.argv[4:] or list(qmap)
        suffix = os.environ.get("BENCH_EXTRA_PLAN_SUFFIX", "")
        os.makedirs(out_dir, exist_ok=True)
        spark = _spark(cores)
        for name in names:
            df = qmap[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            path = os.path.join(out_dir, f"{name}{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(name, "->", path)
        spark.stop()
        return

    names = sys.argv[3:]
    if not names:
        import bench
        names = list(bench.BENCH_QUERIES)
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "2"))
    spark = _spark(cores)

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    # steady-state warmup (mirrors bench.py's policy): exercise the
    # parquet/shuffle/Arrow paths before timing anything
    noop(spark.read.parquet(f"{sf_dir}/lineitem.parquet")
         .groupBy("l_returnflag").count())
    from tools.bench_scaling import _warm_python_workers
    _warm_python_workers(spark, 64)

    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        noop(qmap[name](spark, sf_dir))  # untimed warm rep
        best = float("inf")
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"time:{name}:{r}")
            t0 = time.perf_counter()
            noop(qmap[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]}", file=sys.stderr)
    spark.stop()
    print(json.dumps({"queries": timings, "sf": sf_dir,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
