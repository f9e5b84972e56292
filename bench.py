"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], plus the flagship extraction pipeline on a
deterministic generated corpus, and print ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys: extract_docs, extract_docs_per_sec (the BASELINE.json target
metric). Query timings force full computation via the noop sink (no driver
collect cost, no output I/O cost).

Steal self-description (r5): this box has documented multi-minute
co-tenant CPU-steal bursts (0-40%); a bench captured inside one records
the box, not the code (the r4 driver artifact did exactly that — see
BENCH/NOTES_r04.md). Every emitted JSON carries its own control:
`steal_factor` = best flagship control sample / the quiet-window
reference. Raw timings stay canonical.

Line-size contract (r6, VERDICT r5 "what's wrong #2"): the driver tails
stdout with a ~2.2 KB buffer, and the r5 line (control sample arrays +
a full queries_normalized block) outgrew it — BENCH_r05.json recorded
`parsed: null`. The driver-facing line now stays under 2 KB: timings
rounded to 2 dp, and the control samples + normalized block + run
config live in the BENCH/control_r.json sidecar instead
(`control_sidecar` in the line names the file). A guard asserts the
emitted line is < 2000 bytes so a future key can't silently regrow it.

steal_factor config guard (r5 ADVICE #3): the hard-coded 3.4 s control
reference is only valid at the canonical config (sf0.1, 20000 docs,
32 cores). At any other config without SPARK_GRAFT_CONTROL_REF the
factor is meaningless, so it is emitted as null; and it is clamped to
>= 1.0 — on a faster-than-reference machine normalization must not
inflate timings above raw.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "pricing_summary",
    "fk_broadcast_join",
    "quota_case",
    "daily_counters",
    "approx_stats",
    "window_ratelimit",
    "latest_event_per_user",
    "topk_orders",
    "dedup_exact",
    "winnow_fingerprint",
    "quality_score",
    "gopher_report",
    "repetition_stats",
    "line_dedup",
    "span_dedup_stats",
    "split_report",
    "url_dedup",
    "host_stats",
    "host_cap",
    "token_stats",
    "mixture_sample",
    "temp_mixture",
    "pii_scrub",
    "char_lm_ppl",
    "decontam",
    "chunk_docs",
    "pack_report",
    "pack_texts",
    "mix_budget",
    "bigram_pmi",
    "bm25_topk",
    "tfidf_keywords",
    "dsir_sample",
    "robots_verdicts",
    "robots_sitemaps",
    "recrawl_schedule",
    "anchor_terms",
    "crawl_diff",
    "link_graph",
    "host_pagerank",
    "host_degree_stats",
    "minhash_neardup",
    "simhash_neardup",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "embed_docs",
    "ivf_topk",
    "ann_lsh_pairs",
    "embedding_dedup",
    "keyset_pagination",
    "latest_release",
    "lang_trigram",
    "media_decode",
    "audio_features",
    "resize_media",
    "curate_docs",
]


def _bench_corpus(n_docs: int) -> str:
    """Generated pages corpus, cached by (n, seed) under .bench_cache."""
    from textextract_spark.datagen import write_pages_parquet
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    # v2: corpus generator now emits FlateDecode PDFs
    path = os.path.join(cache, f"pages_{n_docs}_s42_v2.parquet")
    if not os.path.exists(path):
        write_pages_parquet(path, n_docs, seed=42)
    return path


def _bench_warc(n_docs: int) -> str:
    """The same corpus as gzip-member WARC files (crawl layout), cached."""
    from textextract_spark.datagen import generate_pages
    from textextract_spark.io.warc import build_warc, warc_records
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")
    d = os.path.join(cache, f"warc_{n_docs}_s42_v1")
    if not os.path.isdir(d):
        os.makedirs(d, exist_ok=True)
        recs = warc_records(generate_pages(n_docs, seed=42))
        per_file = max(1, len(recs) // 8)  # 8 archives -> 8 parse tasks
        for i in range(0, len(recs), per_file):
            with open(os.path.join(d, f"crawl-{i:07d}.warc.gz"),
                      "wb") as f:
                f.write(build_warc(recs[i:i + per_file], compress=True))
    return d


def run_bench(sf_dir: str, cores: str, n_docs: int,
              queries: list[str] | None = None) -> dict:
    import __spark_entry__ as entry_mod
    from textextract_spark.pipeline import extract_pages
    from textextract_spark.session import get_spark

    corpus = _bench_corpus(n_docs)
    spark = get_spark(app_name="textextract-bench", cores=cores)

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    # JVM/codegen warmup so the first timed query doesn't pay session
    # startup (steady-state measurement)
    noop(spark.read.parquet(f"{sf_dir}/lineitem.parquet")
         .groupBy("l_returnflag").count())

    # Steady-state measurement policy (see SCALE.md "bench variance"):
    # the target metric is sustained throughput of a multi-hour crawl job,
    # so every timing below excludes one-time JVM JIT warmup (a fresh JVM
    # burns minutes of CPU interpreting the Arrow/parquet/shuffle paths on
    # its first run — measured 5-10x first-run inflation) and takes the
    # min over repeats to ride out this box's co-tenant CPU-steal bursts
    # (measured 0-40% steal).
    # flagship extraction (the BASELINE.json metric) is sampled BOTH
    # before and after the query suite — the samples sit minutes apart,
    # so one co-tenant CPU-steal burst (they last minutes here) cannot
    # claim every sample; min across all is the steady-state number
    from tools.bench_scaling import _warm_python_workers
    _warm_python_workers(spark, 64)
    pages = spark.read.parquet(corpus)
    ext_plan = extract_pages(pages, num_parts=64, n_salts=8)
    # untimed warmup RUNS (plural): measured trajectory on this box is
    # ~4 runs / ~2.5 min from fresh-JVM to steady state (tiered JIT over
    # the whole Arrow/shuffle/codegen surface), e.g. 26s, 66s, 30s, 19s,
    # then stable 4-5s — timing before steady state measures warmup
    for _ in range(3):
        noop(ext_plan)

    control_samples: list[float] = []

    def timed_extract(reps: int = 2) -> None:
        for _ in range(reps):
            t0 = time.perf_counter()
            noop(ext_plan)
            control_samples.append(time.perf_counter() - t0)

    timed_extract()

    timings: dict[str, float] = {}
    qmap = entry_mod.queries()
    for name in queries or BENCH_QUERIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            noop(qmap[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # WARC-source extraction: gunzip + record parse + digest-driven
    # winner selection + extract, over the same corpus in crawl layout
    from pyspark.sql import functions as F

    from textextract_spark.io.warc import read_warc
    warc_dir = _bench_warc(n_docs // 4)  # smaller: adds parse-path signal
    warc_plan = extract_pages(
        read_warc(spark, warc_dir).withColumn(
            "lang", F.lit(None).cast("string")),
        num_parts=64, n_salts=8, digest_col="digest")
    noop(warc_plan)  # warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        noop(warc_plan)
        best = min(best, time.perf_counter() - t0)
    timings["extract_warc"] = round(best, 3)

    timed_extract()
    extract_sec = min(control_samples)
    timings["extract_corpus"] = round(extract_sec, 3)
    n_urls = pages.select("url").distinct().count()
    spark.stop()

    # quiet-window steady-state reference for the flagship control at the
    # canonical config (sf0.1, 20k docs, 32 cores): measured 3.16-3.47 s
    # across r3-r5 quiet sessions. Only valid AT that config; elsewhere
    # it must come from SPARK_GRAFT_CONTROL_REF or steal_factor is null.
    canonical = (sf_dir.rstrip("/").endswith("sf0.1")
                 and n_docs == 20000 and cores == "32")
    ref_env = os.environ.get("SPARK_GRAFT_CONTROL_REF")
    if ref_env is not None:
        control_ref: float | None = float(ref_env)
    elif canonical:
        control_ref = 3.4
    else:
        control_ref = None
    steal_factor = (max(1.0, round(extract_sec / control_ref, 3))
                    if control_ref else None)
    total = round(sum(timings.values()), 3)
    timings = {k: round(v, 2) for k, v in timings.items()}
    result = {
        "metric": "headline_queries_plus_extraction_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "extract_docs": n_urls,
        "extract_docs_per_sec": round(n_urls / extract_sec, 1),
        "cores": cores,
        "steal_factor": steal_factor,
        "control_sidecar": "BENCH/control_r.json",
    }
    # full control detail + the normalized block go to the sidecar so the
    # driver-facing line stays parseable (see module docstring)
    sidecar = {
        "control": {
            "query": "extract_corpus",
            "samples_sec": [round(s, 3) for s in control_samples],
            "reference_sec": control_ref,
            "config": {"sf": sf_dir, "n_docs": n_docs, "cores": cores,
                       "canonical": canonical},
        },
        "steal_factor": steal_factor,
        # raw / steal_factor: what the same code measures in a quiet
        # window, assuming the burst scales all queries alike (NOTES_r04
        # validated that assumption within ~10% across the suite)
        "queries_normalized": (
            {k: round(v / steal_factor, 3) for k, v in timings.items()}
            if steal_factor else None),
    }
    sidecar_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), result["control_sidecar"])
    try:
        os.makedirs(os.path.dirname(sidecar_path), exist_ok=True)
        with open(sidecar_path, "w") as f:
            json.dump(sidecar, f, indent=1)
    except OSError:
        pass  # sidecar is best-effort; the canonical line must still print
    return result


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))
    line = json.dumps(run_bench(sf_dir, cores, n_docs))
    # hard guard on the driver's stdout tail buffer (~2.2 KB): a line
    # this size parses; anything bigger risks another parsed:null round
    assert len(line) < 2000, f"bench line too long: {len(line)} bytes"
    print(line)


if __name__ == "__main__":
    main()
