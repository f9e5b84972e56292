"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: run the full extraction pipeline (dedup-latest →
format gate → salted repartition → Arrow-batched mapInPandas extractor)
over pages synthesized deterministically from sf0.001 documents.

queries()    — SURVEY.md §2 operator inventory + training-data ops, each a
(spark, sf_dir) -> DataFrame callable.

oracle_sql() — DuckDB ANSI-SQL twins for every SQL-expressible query
(textextract_spark.operators.oracles). Hash-sketch / UDF-based ops are
rows-only by design (no portable cross-engine hash); their correctness is
asserted in pytest against brute-force oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from textextract_spark.operators import (
    multimodal, relational, releases, similarity, sketch, textdata)
from textextract_spark.operators.oracles import ORACLES
from textextract_spark.pipeline import extract_pages


def _pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a pages table (input_hint schema) from the driver's
    documents table — deterministic, no external data."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    html = F.encode(
        F.concat(F.lit("<html><head><title>doc</title></head><body>"
                       "<nav><a href=\"/a\">home</a> <a href=\"/b\">about</a>"
                       " <a href=\"/c\">contact</a></nav><article><p>"),
                 F.col("text"),
                 F.lit("</p></article><footer><a href=\"/tos\">terms</a>"
                       "</footer></body></html>")),
        "UTF-8")
    return docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
         .alias("url"),
        F.timestamp_seconds(F.lit(1735689600) + F.col("doc_id"))
         .alias("warc_ts"),
        html.alias("html"),
        F.col("text"),
        F.col("lang"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    pages = _pages_from_documents(spark, "/root/testdata/sf0.001")
    out = extract_pages(pages, num_parts=16, n_salts=4)
    return out.select("url", "part_key", "text", "spans", "status",
                      F.col("meta.fmt").alias("fmt"),
                      F.col("meta.in_bytes").alias("in_bytes"))


def _extract_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The extraction pipeline as a driver query WITH a full DuckDB
    oracle: the synthesized pages wrap documents.text in a fixed HTML
    chrome, and the extractor's output for that chrome is exactly
    trim(text) with one <p> span — so the oracle reconstructs the
    byte-identical expected text in pure SQL. (The broader byte-identity
    oracle over the mixed html/pdf/plain corpus runs in pytest against
    golden files.)"""
    pages = _pages_from_documents(spark, sf_dir)
    out = extract_pages(pages, num_parts=16, n_salts=4)
    return (out.select("url", "status",
                       F.col("meta.fmt").alias("fmt"),
                       "text",
                       F.length("text").alias("text_len"),
                       F.size("spans").alias("n_spans"))
            .orderBy("url"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # relational inventory (SURVEY.md §2.2-2.7)
        "filter_eq_project": relational.filter_eq_project,
        "range_filter": relational.range_filter,
        "quota_case": relational.quota_case,
        "fk_broadcast_join": relational.fk_broadcast_join,
        "anti_join_missing": relational.anti_join_missing,
        "semi_join_active": relational.semi_join_active,
        "pricing_summary": relational.pricing_summary,
        "period_sum": relational.period_sum,
        "daily_counters": relational.daily_counters,
        "window_ratelimit": relational.window_ratelimit,
        "resp_stats": relational.resp_stats,
        "month_rollup": relational.month_rollup,
        "distinct_users": relational.distinct_users,
        "latest_event_per_user": relational.latest_event_per_user,
        "top1_per_type": relational.top1_per_type,
        "version_rank": relational.version_rank,
        "topk_orders": relational.topk_orders,
        "pagination": relational.pagination,
        "keyset_pagination": relational.keyset_pagination,
        "union_branches": relational.union_branches,
        "json_props_stats": relational.json_props_stats,
        # text analysis / dedup (graft brief)
        "dedup_exact": textdata.dedup_exact,
        "doc_fingerprint": textdata.doc_fingerprint,
        "token_stats": textdata.token_stats,
        "quality_score": textdata.quality_score,
        "lang_guess": textdata.lang_guess,
        # release-feed path (SURVEY §3.3: P6/W1/W2/F4-F7)
        "latest_release": releases.latest_release_feed,
        # similarity
        "cosine_topk": similarity.cosine_topk,
        "ivf_topk": similarity.ivf_topk,                    # rows-only
        "ann_lsh_pairs": similarity.ann_lsh_planted,        # oracled via
        #   planted duplicates (all-pairs cosine in DuckDB)
        # sketch dedup
        "minhash_neardup": sketch.minhash_neardup,          # rows-only:
        #   engine-specific xxhash64 signatures (pytest brute-force oracle)
        "ngram_jaccard_pairs": sketch.ngram_jaccard_pairs,  # oracled:
        #   exact jaccard, all-pairs twin in DuckDB
        "simhash_neardup": sketch.simhash_neardup,          # rows-only:
        #   engine-specific xxhash64 bit votes (pytest pigeonhole oracle)
        # multimodal plumbing (sha/size columns oracled; entropy pytest-only)
        "media_features": multimodal.media_features_checked,
        "frame_sample": multimodal.frame_sample,
        # the extraction pipeline itself — full text oracle (see
        # _extract_docs docstring); mixed-format byte identity in pytest
        "extract_docs": _extract_docs,
    }


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
