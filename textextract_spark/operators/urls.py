"""URL canonicalization + crawl-side URL dedup (graft brief: the step a
Common-Crawl-scale pipeline runs BEFORE content dedup — the same page is
re-crawled under casing/port/fragment/tracking-param variants, and
deduping on the raw url string misses all of them).

Canonicalization is a pure column expression (regexp_extract decompose ->
normalize -> rebuild): whole-stage codegen, zero shuffle, no UDF. The
dedup itself is one hash aggregation on the canonical key keeping the
LATEST capture per url (max_by warc_ts — crawl freshness wins), which is
map-side combinable and therefore survives a hot url (a page crawled 10^6
times arrives at its reducer as partials).

Regex dialect note: every pattern here is shared verbatim by Java regex
(Spark) and RE2 (DuckDB) — character classes and capture groups only, no
lookaround, no backreferences.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TRACKING_PREFIX = "utm_"  # the industry-standard tracking-param family


def canonicalize_url(u: Column) -> Column:
    """Canonical form of an absolute http(s) URL:

    - scheme and host lowercased
    - default ports dropped (http:80, https:443); explicit non-default
      ports kept
    - fragment dropped (never sent to the server)
    - ``utm_*`` tracking params removed; the ``?`` dropped if the query
      becomes empty; non-tracking params kept in original order (param
      reordering changes semantics for some endpoints, so no sort)
    - trailing slashes stripped from the path; empty path becomes ``/``
    """
    scheme = F.lower(F.regexp_extract(u, r"^([^:/?#]+)://", 1))
    hostport = F.regexp_extract(u, r"^[^:/?#]+://([^/?#]*)", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    rest = F.regexp_extract(u, r"^[^:/?#]+://[^/?#]*([^#]*)", 1)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)

    path_c = F.regexp_replace(path, r"/+$", "")
    path_c = F.when(path_c == "", F.lit("/")).otherwise(path_c)
    default_port = (((scheme == "http") & (port == "80"))
                    | ((scheme == "https") & (port == "443")))
    port_part = F.when((port == "") | default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), port))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.startswith(TRACKING_PREFIX))
    qs = F.array_join(params, "&")
    q_part = F.when(qs == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), qs))
    return F.concat(scheme, F.lit("://"), host, port_part, path_c, q_part)


def dedup_by_canonical_url(pages: DataFrame,
                           url_col: str = "url",
                           ts_col: str = "warc_ts",
                           id_col: str = "doc_id") -> DataFrame:
    """One row per canonical url: the LATEST capture wins (recrawl
    freshness), with capture count and first/last timestamps — the
    crawl-frontier dedup decision. One shuffle on the canonical key.
    id_col names the keeper column (any schema works, not just the
    documents table's doc_id — ADVICE r4)."""
    return (pages
            .withColumn("canonical_url", canonicalize_url(F.col(url_col)))
            .groupBy("canonical_url")
            .agg(F.max_by(id_col, ts_col).alias("keeper_doc_id"),
                 F.count("*").alias("n_captures"),
                 F.min(ts_col).alias("first_ts"),
                 F.max(ts_col).alias("last_ts"))
            .orderBy("canonical_url"))


def _synth_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table carries no urls, so messy crawl urls are
    SYNTHESIZED deterministically from doc_id (same construction in the
    DuckDB twins) — four variant families where residue classes 0/1 and
    2/3 collapse to the same canonical url (casing+default-port+
    trailing-slash variants, and fragment+tracking-param variants), with
    warc_ts = epoch + doc_id seconds so "latest capture" is decidable on
    both engines."""
    d = F.col("doc_id")
    g = (d / 4).cast("long").cast("string")
    raw = (F.when(d % 4 == 0,
                  F.concat(F.lit("HTTP://Example.COM:80/a/"), g, F.lit("/")))
           .when(d % 4 == 1,
                 F.concat(F.lit("http://example.com/a/"), g))
           .when(d % 4 == 2,
                 F.concat(F.lit("https://Example.com:443/b/"), g,
                          F.lit("?utm_source=x&id="), g, F.lit("#frag")))
           .otherwise(
                 F.concat(F.lit("https://example.com/b/"), g,
                          F.lit("?id="), g)))
    ts = F.timestamp_seconds(F.lit(1735689600) + d)  # 2025-01-01 + id sec
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", raw.alias("url"), ts.alias("warc_ts")))


def url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: canonical-url dedup over the synthesized messy
    crawl (see _synth_crawl)."""
    return dedup_by_canonical_url(_synth_crawl(spark, sf_dir))


def host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-operations / frontier monitoring: per-host capture counts,
    distinct canonical pages, and the capture-time range — the query a
    politeness scheduler and a crawl dashboard run per cycle. One
    map-side-combinable hash aggregation on the lowercased host (port
    stripped); at 10^12 docs hosts are the classic skewed key, which is
    exactly why this is a groupBy (partial aggs absorb the hot host),
    never a window."""
    pages = _synth_crawl(spark, sf_dir)
    authority = F.regexp_extract(F.col("url"), r"^[^:/?#]+://([^/?#]*)", 1)
    host = F.lower(F.regexp_extract(authority, r"^([^:]*)", 1))
    return (pages
            .select(host.alias("host"),
                    canonicalize_url(F.col("url")).alias("canonical_url"),
                    "warc_ts")
            .groupBy("host")
            .agg(F.count("*").alias("n_captures"),
                 F.countDistinct("canonical_url").alias("n_pages"),
                 F.min("warc_ts").alias("first_ts"),
                 F.max("warc_ts").alias("last_ts"))
            .orderBy("host"))
