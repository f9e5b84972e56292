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

import random as _random
from functools import reduce

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


# Universal-hash coefficients for the K permutations, seeded once.
# Kept < 2^30 so a*h32+b stays under 2^63 — overflow-free in ANSI mode.
_rng = _random.Random(9176)
_MH_A = [(_rng.randrange(1, 1 << 30)) | 1 for _ in range(K_HASHES)]
_MH_B = [_rng.randrange(0, (1 << 31) - 1) for _ in range(K_HASHES)]


def with_minhash(df: DataFrame) -> DataFrame:
    """Add `shingles` and the K-element `minhash` array, all JVM-side.

    Each shingle string is hashed ONCE (xxhash64 -> low 32 bits); the K
    permutations are cheap linear hashes a_k*h+b_k over that value —
    64x less string hashing than per-seed rehashing.
    """
    df = _with_tokens(df).filter(F.size("tokens") >= SHINGLE)
    df = df.withColumn(
        "shingles",
        F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.size("tokens") - SHINGLE),
            lambda i: F.concat_ws(" ", F.slice("tokens", i + 1, SHINGLE)))))
    df = df.withColumn(
        "h32",
        F.transform("shingles",
                    lambda s: F.xxhash64(s)
                               .bitwiseAND(F.lit((1 << 32) - 1))))
    # mod prime must be far below a*h's range so the hash wraps many
    # times — otherwise min(a*h+b) stays monotone in h and every
    # "permutation" degenerates to the same argmin shingle. With
    # p = 2^31-1 and a*h up to ~2^62 each permutation wraps ~2^31 times.
    p31 = (1 << 31) - 1

    def _perm(a: int, b: int):
        return lambda x: F.pmod(x * F.lit(a) + F.lit(b), F.lit(p31))

    return df.withColumn(
        "minhash",
        F.array(*[F.array_min(F.transform("h32", _perm(a, b)))
                  for a, b in zip(_MH_A, _MH_B)])).drop("h32")


def minhash_bands(df: DataFrame, keep: tuple[str, ...] = ("minhash",)) -> DataFrame:
    """Explode the minhash signature into (band_id, band_key) rows,
    carrying the `keep` payload columns along."""
    return df.select(
        "doc_id", *keep,
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


def _candidate_pairs(bands: DataFrame, payload_col: str) -> DataFrame:
    """LSH band buckets -> deduped candidate pairs carrying each side's
    payload (signature or shingles), in ONE aggregation + ONE dedup —
    no join back to the source, nothing recomputed.

    Skew guard: degenerate buckets (a boilerplate band shared by
    thousands of docs) are dropped before pair expansion, capping the
    quadratic blowup at MAX_BUCKET^2 per bucket.
    """
    members = (bands.groupBy("band_id", "band_key")
               .agg(F.collect_list(F.struct("doc_id", payload_col))
                    .alias("members"))
               .filter((F.size("members") > 1)
                       & (F.size("members") <= MAX_BUCKET)))
    pairs = members.select(F.explode(F.filter(
        F.flatten(F.transform(
            "members",
            lambda a: F.transform(
                "members",
                lambda b: F.struct(a.doc_id.alias("a_id"),
                                   b.doc_id.alias("b_id"),
                                   a[payload_col].alias("pa"),
                                   b[payload_col].alias("pb"))))),
        lambda p: p.a_id < p.b_id)).alias("p")).select("p.*")
    return pairs.dropDuplicates(["a_id", "b_id"])


def minhash_neardup(spark: SparkSession, sf_dir: str,
                    threshold: float = 0.5) -> DataFrame:
    """Candidate near-dup pairs by MinHash LSH + signature-estimated
    Jaccard >= threshold. One pass: signature -> bands -> bucket pairs."""
    mh = with_minhash(_docs(spark, sf_dir)).select("doc_id", "minhash")
    pairs = _candidate_pairs(minhash_bands(mh), "minhash")
    est = F.round(
        F.aggregate(F.zip_with("pa", "pb",
                               lambda x, y: (x == y).cast("int")),
                    F.lit(0), lambda acc, x: acc + x) / F.lit(K_HASHES), 4)
    return (pairs.select("a_id", "b_id", est.alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= threshold)
            .orderBy(F.desc("est_jaccard"), "a_id", "b_id"))


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str,
                        threshold: float = 0.4) -> DataFrame:
    """Exact shingle-set Jaccard for the LSH candidate pairs (verify pass
    after minhash banding — the two-stage dedup a real pipeline runs).
    Shingle sets ride along through the band buckets; no re-join."""
    docs = with_minhash(_docs(spark, sf_dir))
    pairs = _candidate_pairs(minhash_bands(docs, keep=("shingles",)),
                             "shingles")
    inter = F.size(F.array_intersect("pa", "pb"))
    union = F.size(F.array_union("pa", "pb"))
    return (pairs.select("a_id", "b_id",
                         F.round(inter / union, 4).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold)
            .orderBy(F.desc("jaccard"), "a_id", "b_id"))


def with_simhash(df: DataFrame) -> DataFrame:
    """64-bit SimHash per doc via token-hash bit votes (two hash-aggs)."""
    toks = (_with_tokens(df)
            .select("doc_id", F.explode("tokens").alias("tok"))
            .withColumn("h", F.xxhash64("tok")))
    # one hash-agg with 64 vote sums (partial aggregation map-side) —
    # no 64x row blowup, single shuffle keyed on doc_id
    votes = toks.groupBy("doc_id").agg(*[
        F.sum(F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1,
                     F.lit(1)).otherwise(F.lit(-1))).alias(f"v{b}")
        for b in range(SIMHASH_BITS)])
    sim = reduce(
        lambda acc, b: acc + F.when(F.col(f"v{b}") > 0,
                                    F.lit(1 << b).cast("long"))
                             .otherwise(F.lit(0).cast("long")),
        range(1, SIMHASH_BITS - 1),
        F.when(F.col("v0") > 0, F.lit(1).cast("long"))
         .otherwise(F.lit(0).cast("long")))
    # top bit via unsigned-safe arithmetic: 1<<63 overflows signed long,
    # so place it with a negative literal (two's complement)
    sim = sim + F.when(F.col(f"v{SIMHASH_BITS - 1}") > 0,
                       F.lit(-(1 << 63)).cast("long")) \
                 .otherwise(F.lit(0).cast("long"))
    return votes.select("doc_id", sim.alias("simhash"))


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
