"""Similarity search over the `embeddings` table (graft brief: ANN over an
array<float> column — brute-force cosine top-k baseline + an LSH-bucketed
scale path).

All vector math is JVM-side higher-order functions (zip_with/aggregate) —
no Python in the hot path. At 100 TB the brute-force variant is the
per-bucket kernel of the LSH path, not a global cross join.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOPK = 20
LSH_TABLES = 4
PLANES_PER_TABLE = 8
N_PLANES = LSH_TABLES * PLANES_PER_TABLE
_PLANE_SEED = 1337


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the TOPK vectors nearest to vec_id=0.

    The probe side is one broadcast row; the scan side streams once with
    no shuffle (TakeOrderedAndProject for the top-k). Oracle: DuckDB
    list_cosine_similarity.
    """
    emb = _emb(spark, sf_dir).withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double")))
    q = (emb.filter(F.col("vec_id") == 0)
         .select(F.col("embedding").alias("q_vec")))
    return (emb.filter(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(q))
            .select(
                "vec_id", "label",
                F.round(_dot(F.col("embedding"), F.col("q_vec"))
                        / (_norm(F.col("embedding"))
                           * _norm(F.col("q_vec"))), 4).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(TOPK))


def ivf_topk(spark: SparkSession, sf_dir: str, probe_id: int = 0,
             nprobe: int = 3, k: int = 10) -> DataFrame:
    """IVF (inverted-file) ANN: coarse cells -> probe nearest nprobe cells
    -> exact cosine inside probed cells only.

    The 10^9-vector scale path: centroids are a tiny broadcast table; the
    big side is partition-pruned to nprobe cells before any exact math.
    Here the coarse quantizer is the existing `label` clustering (centroid
    = per-dimension mean via posexplode + hash-agg, all JVM-side).
    """
    emb = _emb(spark, sf_dir).withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double")))
    # per-label centroids: explode dims -> avg -> reassemble ordered array
    cents = (emb.select("label", F.posexplode("embedding")
                        .alias("dim", "val"))
             .groupBy("label", "dim").agg(F.avg("val").alias("v"))
             .groupBy("label")
             .agg(F.array_sort(F.collect_list(F.struct("dim", "v")))
                  .alias("dv"))
             .select("label",
                     F.transform("dv", lambda s: s.v).alias("centroid")))
    q = (emb.filter(F.col("vec_id") == probe_id)
         .select(F.col("embedding").alias("q_vec")))
    probed = (cents.crossJoin(F.broadcast(q))
              .select("label",
                      (_dot(F.col("centroid"), F.col("q_vec"))
                       / (_norm(F.col("centroid")) * _norm(F.col("q_vec"))))
                      .alias("cell_cos"))
              .orderBy(F.desc("cell_cos")).limit(nprobe)
              .select("label"))
    return (emb.join(F.broadcast(probed), "label")
            .filter(F.col("vec_id") != probe_id)
            .crossJoin(F.broadcast(q))
            .select("vec_id", "label",
                    F.round(_dot(F.col("embedding"), F.col("q_vec"))
                            / (_norm(F.col("embedding"))
                               * _norm(F.col("q_vec"))), 4).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(k))


def _planes(dim: int) -> list[list[float]]:
    """Deterministic ±1 random hyperplanes (seeded; no runtime RNG)."""
    rng = random.Random(_PLANE_SEED)
    return [[float(rng.choice((-1, 1))) for _ in range(dim)]
            for _ in range(N_PLANES)]


def ann_lsh_pairs(spark: SparkSession, sf_dir: str, dim: int = 64,
                  min_cosine: float = 0.8) -> DataFrame:
    """Scale-path near-dup vector pairs: banded random-hyperplane LSH
    (LSH_TABLES independent tables of PLANES_PER_TABLE bits), bucket
    self-join, exact cosine inside buckets only.

    At 10^9 vectors each table's bucket join shuffles on an 8-bit-plus-
    table-id key instead of cross-joining; banding (match in ANY table)
    gives ~1-(1-p^8)^4 recall. Recall vs brute force is asserted on
    planted duplicates in tests/test_dedup.py.
    """
    emb = _emb(spark, sf_dir).withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double")))
    return _ann_lsh_over(emb, dim, min_cosine)


def ann_lsh_planted(spark: SparkSession, sf_dir: str, dim: int = 64,
                    min_cosine: float = 0.9, n_planted: int = 10) -> DataFrame:
    """ann_lsh_pairs over the embeddings table UNION deterministic planted
    duplicates (scaled copies of the first n_planted vectors — scaling
    preserves cosine exactly, so each plant pairs with its source at
    cosine 1.0). This is the driver-correctness entry: the r1 query
    returned 0 rows at sf0.01 (vacuously green); with plants the row set
    is non-trivial AND oracle-checkable against DuckDB all-pairs cosine
    (at this threshold brute force and LSH agree: same-direction vectors
    share every hyperplane sign, so plant recall is 1).
    """
    emb = _emb(spark, sf_dir).withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double")))
    plants = (emb.filter(F.col("vec_id") < n_planted)
              .select((F.col("vec_id") + 100000).alias("vec_id"),
                      F.transform("embedding",
                                  lambda x: x * F.lit(1.0009765625))
                       .alias("embedding")))
    return _ann_lsh_over(
        emb.select("vec_id", "embedding")
           .unionByName(plants), dim, min_cosine)


def _ann_lsh_over(emb: DataFrame, dim: int,
                  min_cosine: float) -> DataFrame:
    planes = _planes(dim)  # N_PLANES = LSH_TABLES * PLANES_PER_TABLE

    def sig_bit(plane: list[float]):
        lit_plane = F.array(*[F.lit(v) for v in plane])
        return (_dot(F.col("embedding"), lit_plane) > 0).cast("long")

    buckets = []
    for t in range(LSH_TABLES):
        sig = F.lit(t).cast("long")
        for p in planes[t * PLANES_PER_TABLE:(t + 1) * PLANES_PER_TABLE]:
            sig = F.shiftleft(sig, 1) + sig_bit(p)
        buckets.append(sig)
    # explode_outer: plain explode gets an inferred size()>0 filter that
    # re-evaluates all 32 interpreted hyperplane dot products per row.
    # The explicit repartition on the join key makes the self-join's two
    # sides share ONE exchange (ReusedExchange, plan-asserted): without
    # it the 32-plane signature computation runs twice.
    with_b = (emb.select("vec_id", "embedding",
                         F.explode_outer(F.array(*buckets)).alias("bucket"))
              .repartition("bucket"))
    left = with_b.select(F.col("vec_id").alias("a_id"),
                         F.col("embedding").alias("a_vec"), "bucket")
    right = with_b.select(F.col("vec_id").alias("b_id"),
                          F.col("embedding").alias("b_vec"), "bucket")
    pairs = (left.join(right, "bucket")
             .filter(F.col("a_id") < F.col("b_id"))
             .dropDuplicates(["a_id", "b_id"]))
    raw = (_dot(F.col("a_vec"), F.col("b_vec"))
           / (_norm(F.col("a_vec")) * _norm(F.col("b_vec"))))
    # raw-threshold filter, rounded display (matches the DuckDB oracle)
    return (pairs.select("a_id", "b_id", raw.alias("__raw"))
            .filter(F.col("__raw") >= min_cosine)
            .select("a_id", "b_id", F.round("__raw", 4).alias("cosine"))
            .orderBy(F.desc("cosine"), "a_id", "b_id"))
