"""Hash-sketch near-duplicate detection: MinHash+LSH, SimHash, and exact
n-gram Jaccard verification (graft brief: dedup family for training-data
pipelines).

Spark-first: shingling, the K minhash permutations, banding, bit-votes and
Hamming distances are ALL built-in higher-order / bit functions — zero
Python UDFs. Hash values are Spark's xxhash64, so these are rows-only
checks for the driver (no portable cross-engine hash); exactness is
asserted in pytest against brute-force Jaccard on planted duplicates
(tests/test_dedup.py).

Scale shape (10^9 docs): the only shuffles are (a) groupBy(band_key) with
~(K/R) small keys per doc and (b) the candidate-pair self-join on band
buckets — never an all-pairs cross join. Skewed buckets (boilerplate-heavy
shingles) are capped via size limits before the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

K_HASHES = 64          # minhash permutations
BANDS = 16             # LSH bands (K/BANDS rows per band)
ROWS_PER_BAND = K_HASHES // BANDS
SHINGLE = 3            # word shingle width
MAX_BUCKET = 50        # cap candidate fan-out per band bucket (skew guard)
SIMHASH_BITS = 64


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _with_tokens(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "tokens", F.split(F.trim(F.lower(F.col("text"))), r"\s+"))


def with_minhash(df: DataFrame) -> DataFrame:
    """Add `shingles` and the K-element `minhash` array, all JVM-side."""
    df = _with_tokens(df).filter(F.size("tokens") >= SHINGLE)
    df = df.withColumn(
        "shingles",
        F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.size("tokens") - SHINGLE),
            lambda i: F.concat_ws(" ", F.slice("tokens", i + 1, SHINGLE)))))
    return df.withColumn(
        "minhash",
        F.transform(
            F.sequence(F.lit(0), F.lit(K_HASHES - 1)),
            lambda seed: F.array_min(
                F.transform("shingles", lambda s: F.xxhash64(s, seed)))))


def minhash_bands(df: DataFrame) -> DataFrame:
    """Explode the minhash signature into (band_id, band_key) rows."""
    return df.select(
        "doc_id", "minhash",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(BANDS - 1)),
                lambda b: F.md5(F.concat_ws(
                    ",",
                    F.transform(
                        F.slice("minhash", b * ROWS_PER_BAND + 1,
                                ROWS_PER_BAND),
                        lambda x: x.cast("string"))))))
        .alias("band_id", "band_key"))


def minhash_neardup(spark: SparkSession, sf_dir: str,
                    threshold: float = 0.5) -> DataFrame:
    """Candidate near-dup pairs by MinHash LSH + signature-estimated
    Jaccard >= threshold."""
    mh = with_minhash(_docs(spark, sf_dir)).select("doc_id", "minhash")
    bands = minhash_bands(mh)
    # skew guard: drop degenerate buckets (a boilerplate shingle shared by
    # thousands of docs would otherwise quadratically explode the join)
    sized = (bands.groupBy("band_id", "band_key")
             .agg(F.collect_list("doc_id").alias("ids"))
             .filter((F.size("ids") > 1) & (F.size("ids") <= MAX_BUCKET)))
    pairs = (sized.select(F.explode(
                F.filter(
                    F.flatten(F.transform(
                        "ids", lambda a: F.transform(
                            "ids", lambda b: F.struct(
                                a.alias("a_id"), b.alias("b_id"))))),
                    lambda p: p.a_id < p.b_id)).alias("p"))
             .select("p.a_id", "p.b_id").distinct())
    a = mh.select(F.col("doc_id").alias("a_id"),
                  F.col("minhash").alias("mh_a"))
    b = mh.select(F.col("doc_id").alias("b_id"),
                  F.col("minhash").alias("mh_b"))
    est = F.round(
        F.aggregate(F.zip_with("mh_a", "mh_b",
                               lambda x, y: (x == y).cast("int")),
                    F.lit(0), lambda acc, x: acc + x) / F.lit(K_HASHES), 4)
    return (pairs.join(a, "a_id").join(b, "b_id")
            .select("a_id", "b_id", est.alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= threshold)
            .orderBy(F.desc("est_jaccard"), "a_id", "b_id"))


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str,
                        threshold: float = 0.4) -> DataFrame:
    """Exact shingle-set Jaccard for the LSH candidate pairs (verify pass
    after minhash_neardup — the two-stage dedup a real pipeline runs)."""
    docs = with_minhash(_docs(spark, sf_dir))
    cand = minhash_neardup(spark, sf_dir, threshold=0.2) \
        .select("a_id", "b_id")
    a = docs.select(F.col("doc_id").alias("a_id"),
                    F.col("shingles").alias("sh_a"))
    b = docs.select(F.col("doc_id").alias("b_id"),
                    F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (cand.join(a, "a_id").join(b, "b_id")
            .select("a_id", "b_id",
                    F.round(inter / union, 4).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
            .orderBy(F.desc("jaccard"), "a_id", "b_id"))


def with_simhash(df: DataFrame) -> DataFrame:
    """64-bit SimHash per doc via token-hash bit votes (two hash-aggs)."""
    toks = (_with_tokens(df)
            .select("doc_id", F.explode("tokens").alias("tok"))
            .withColumn("h", F.xxhash64("tok")))
    votes = (toks.select(
                "doc_id",
                F.posexplode(F.array(*[
                    F.when(F.shiftright("h", b)
                            .bitwiseAND(F.lit(1)) == 1,
                           F.lit(1)).otherwise(F.lit(-1))
                    for b in range(SIMHASH_BITS)]))
                .alias("bit_pos", "vote"))
             .groupBy("doc_id", "bit_pos")
             .agg(F.sum("vote").alias("v")))
    return (votes.groupBy("doc_id")
            .agg(F.sum(F.when(
                F.col("v") > 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), bit_pos)"))
                .otherwise(F.lit(0).cast("long"))).alias("simhash")))


def simhash_neardup(spark: SparkSession, sf_dir: str,
                    max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming,
    candidate-generated by 16-bit chunk equality (pigeonhole: any pair
    within hamming 3 of 4 chunks shares at least one exact chunk)."""
    sh = with_simhash(_docs(spark, sf_dir))
    chunks = sh.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned("simhash", i * 16)
             .bitwiseAND(F.lit(0xFFFF)) for i in range(4)]))
        .alias("chunk_id", "chunk_val"))
    a = chunks.select(F.col("doc_id").alias("a_id"),
                      F.col("simhash").alias("sh_a"),
                      "chunk_id", "chunk_val")
    b = chunks.select(F.col("doc_id").alias("b_id"),
                      F.col("simhash").alias("sh_b"),
                      "chunk_id", "chunk_val")
    return (a.join(b, ["chunk_id", "chunk_val"])
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id",
                    F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
                     .alias("hamming"))
            .dropDuplicates(["a_id", "b_id"])
            .filter(F.col("hamming") <= max_hamming)
            .orderBy("hamming", "a_id", "b_id"))
