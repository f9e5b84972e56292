"""Hash-sketch near-duplicate detection: MinHash+LSH, SimHash, and exact
n-gram Jaccard verification (graft brief: dedup family for training-data
pipelines).

Spark-first: the K minhash permutations, banding, bit-votes and Hamming
distances are ALL built-in functions. MinHash signatures are computed via
explode + a 64-column hash aggregation (whole-stage codegen) rather than
64 higher-order ``transform`` calls: lambda functions are interpreted per
element, and 64 × shingles × docs interpreted evals measured ~10x slower
than the codegen agg path. The one Arrow-batched pandas UDF is the r7
shingling stage (with_shingles — measured 6x vs the interpreted
per-window transform; semantics replicated exactly, see its docstring).

Scale shape (10^9 docs): the only shuffles are (a) the doc_id hash-agg
for signatures, (b) groupBy(band/chunk key) bucketing, and (c) a
broadcast-sized join of surviving candidate pairs back to shingle sets —
never an all-pairs cross join, never payload arrays through the bucket
shuffle. Degenerate buckets are capped (MAX_BUCKET) before pair expansion
on BOTH the minhash and simhash paths.
"""

from __future__ import annotations

import random as _random

import pandas as pd  # module-level: pandas_udf type hints resolve here
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

K_HASHES = 64          # minhash permutations
BANDS = 16             # LSH bands (K/BANDS rows per band)
ROWS_PER_BAND = K_HASHES // BANDS
SHINGLE = 3            # word shingle width (space-segmented scripts)
CHAR_SHINGLE = 5       # char n-gram width (unsegmented scripts: CJK etc.)
SIMHASH_CHAR_TOKEN = 3  # char token width for simhash votes, unsegmented
SPACELESS_MAX_WS = 0.05  # whitespace density below this = unsegmented
MAX_BUCKET = 50        # cap candidate fan-out per band bucket (skew guard)
# row-wise pre-sample threshold for monster buckets: below this the exact
# first-MAX_BUCKET-by-doc_id sample is taken; above it a deterministic
# doc-hash rate filter thins the bucket to ~this many rows BEFORE the
# per-bucket collect, bounding aggregation state (see _candidate_pairs)
_PRESAMPLE_TARGET = 64 * MAX_BUCKET
SIMHASH_BITS = 64


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _spread(df: DataFrame) -> DataFrame:
    """Ensure enough partitions to parallelize the CPU-heavy tokenize/
    shingle stages: a small single-file parquet scan yields ONE partition
    and would serialize the stage (measured: the whole minhash signature
    job ran on 1 of 32 cores). At crawl scale the scan already has
    thousands of splits and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _is_spaceless(norm):
    """Script predicate: text whose whitespace density is below
    SPACELESS_MAX_WS is unsegmented (CJK and other space-free scripts) —
    word tokenization degenerates to whole-line tokens there, silently
    collapsing near-dup recall (~20% of a Common-Crawl corpus). ASCII
    whitespace only (Java regex and RE2 both scope \\s to ASCII, so the
    Spark operator and the DuckDB twin agree byte-for-byte)."""
    ws = F.length(norm) - F.length(F.regexp_replace(norm, r"\s", ""))
    return (F.length(norm) > 0) & (ws / F.length(norm) < SPACELESS_MAX_WS)


def with_shingles(df: DataFrame) -> DataFrame:
    """Add the distinct `shingles` array — script-aware: SHINGLE-word
    windows for space-segmented text, CHAR_SHINGLE-char n-grams when the
    whitespace-density predicate flags unsegmented script (CJK etc.).
    Both branches of a near-dup pair take the same branch (the predicate
    is a property of the text), so pairwise Jaccard semantics are
    unchanged; cross-script pairs share no shingles by construction.

    Execution strategy (r7): ONE Arrow-batched pandas UDF over the
    JVM-normalized text — trim+lower stays in Spark so its semantics
    cannot drift — replacing the interpreted per-window slice+concat_ws
    transform (measured 3.3 s -> ~0.5 s at sf1.0/local[32] for this
    stage alone; the winnow_fingerprint / lang_trigram tradeoff).
    Token semantics are replicated exactly: re.ASCII scopes Python's
    \\s to the Java \\s charset, re.split keeps the same leading
    empty token as Spark's split, " ".join matches concat_ws over
    non-null strings, and dict.fromkeys preserves array_distinct's
    first-occurrence order (BMP corpus assumption as elsewhere: Java
    indexes UTF-16 units, Python codepoints — the full-value oracles
    on the dedup family would flag an astral-plane divergence).

    Docs qualifying for neither branch carry shingles = NULL where the
    r6 two-branch union dropped their rows — inert for every consumer
    (minhash_signatures explode_outer-filters nulls; the jaccard
    verify join only ever fetches pair members, which have bands and
    therefore shingles)."""
    import re
    from pyspark.sql.types import ArrayType, StringType

    ws_run = re.compile(r"\s+", re.ASCII)
    ws_one = re.compile(r"\s", re.ASCII)
    k_c, k_w = CHAR_SHINGLE, SHINGLE

    @F.pandas_udf(ArrayType(StringType()))
    def shingles_of(norms: pd.Series) -> pd.Series:
        out = []
        for t in norms:
            n = len(t)
            if n and (n - len(ws_one.sub("", t))) / n < SPACELESS_MAX_WS:
                out.append(list(dict.fromkeys(
                    t[i:i + k_c] for i in range(n - k_c + 1)))
                    if n >= k_c else None)
            elif n:
                toks = ws_run.split(t)
                out.append(list(dict.fromkeys(
                    " ".join(toks[i:i + k_w])
                    for i in range(len(toks) - k_w + 1)))
                    if len(toks) >= k_w else None)
            else:
                out.append(None)
        return pd.Series(out)

    return _spread(df).withColumn(
        "shingles", shingles_of(F.trim(F.lower(F.col("text")))))


# Universal-hash coefficients for the K permutations, seeded once.
# Kept < 2^30 so a*h32+b stays under 2^63 — overflow-free in ANSI mode.
_rng = _random.Random(9176)
_MH_A = [(_rng.randrange(1, 1 << 30)) | 1 for _ in range(K_HASHES)]
_MH_B = [_rng.randrange(0, (1 << 31) - 1) for _ in range(K_HASHES)]

# mod prime must be far below a*h's range so the hash wraps many times —
# otherwise min(a*h+b) stays monotone in h and every "permutation"
# degenerates to the same argmin shingle. With p = 2^31-1 and a*h up to
# ~2^62 each permutation wraps ~2^31 times.
_P31 = (1 << 31) - 1


def minhash_signatures(df: DataFrame,
                       emit_shingles: bool = False) -> DataFrame:
    """(doc_id, minhash[, shingles]): the K-element signature array.

    emit_shingles=True additionally returns the distinct shingle array
    the signature was computed FROM (r7): the candidate/verify shape
    (exact_jaccard_pairs) needs both, and emitting them from this one
    kernel removes a second full tokenize+shingle pass over the corpus
    (with_shingles ran the identical Python loop again — measured
    ~0.7 s duplicated work at 50k docs / local[32]).

    ONE Arrow-batched stage over the JVM-normalized text (r7, guide
    §4.2): shingle exactly like with_shingles (same script-aware
    tokenizer, same dict.fromkeys distinct — duplicate shingles can't
    change a min anyway), hash each distinct shingle once through
    xxh64_bytes (bit-identical to F.xxhash64, per-batch memo), keep
    the low 32 bits, and take the K permutation minima as one
    (shingles x K) vectorized numpy min. This replaces with_shingles
    -> explode (one row per SHINGLE) -> a 64-column min aggregation
    and its shuffle: signature stage measured 1.45s -> ~0.9s at 50k
    docs / local[32], zero exchange left in the stage. All values are
    exact int64 arithmetic on both paths (h32 < 2^32, a < 2^30, so
    a*h32+b < 2^63 — overflow-free in numpy int64 exactly as in ANSI
    SQL), so signatures are bit-identical — pinned by
    tests/test_dedup.py::test_minhash_arrow_matches_jvm_agg. Docs
    qualifying for neither shingle branch emit no signature row (the
    explode_outer + null-filter behavior of the r6 form)."""
    import re

    import numpy as np

    ws_run = re.compile(r"\s+", re.ASCII)
    ws_one = re.compile(r"\s", re.ASCII)
    k_c, k_w = CHAR_SHINGLE, SHINGLE
    max_ws = SPACELESS_MAX_WS
    A = np.asarray(_MH_A, dtype=np.int64)
    B = np.asarray(_MH_B, dtype=np.int64)

    def sig_kernel(batches):
        memo: dict[str, int] = {}

        def h32_of(t: str) -> int:
            v = memo.get(t)
            if v is None:
                v = xxh64_bytes(t.encode("utf-8")) & 0xFFFFFFFF
                memo[t] = v
            return v

        for pdf in batches:
            ids, sigs, shs = [], [], []
            for doc_id, t in zip(pdf["doc_id"], pdf["__norm"]):
                n = len(t)
                if n and (n - len(ws_one.sub("", t))) / n < max_ws:
                    if n < k_c:
                        continue
                    sh = dict.fromkeys(
                        t[i:i + k_c] for i in range(n - k_c + 1))
                elif n:
                    toks = ws_run.split(t)
                    if len(toks) < k_w:
                        continue
                    sh = dict.fromkeys(
                        " ".join(toks[i:i + k_w])
                        for i in range(len(toks) - k_w + 1))
                else:
                    continue
                hs = np.fromiter((h32_of(s) for s in sh),
                                 dtype=np.int64, count=len(sh))
                sigs.append((hs[:, None] * A[None, :] + B[None, :])
                            % _P31)
                ids.append(doc_id)
                if emit_shingles:
                    shs.append(list(sh))
            out = {
                # input dtype, not a hard-coded int64: the curation
                # path keys this kernel by url STRINGS (see
                # exact_jaccard_pairs)
                "doc_id": pd.Series(ids, dtype=pdf["doc_id"].dtype),
                "minhash": pd.Series(
                    [s.min(axis=0) for s in sigs], dtype="object"),
            }
            if emit_shingles:
                out["shingles"] = pd.Series(shs, dtype="object")
            yield pd.DataFrame(out)

    id_type = df.schema["doc_id"].dataType.simpleString()
    schema = f"doc_id {id_type}, minhash array<long>"
    if emit_shingles:
        schema += ", shingles array<string>"
    return (_spread(df)
            .select("doc_id",
                    F.trim(F.lower(F.col("text"))).alias("__norm"))
            .mapInPandas(sig_kernel, schema=schema))


def minhash_bands(df: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Explode the minhash signature into (band_id, band_key) rows,
    carrying the `keep` payload columns along. Default carries NOTHING
    beyond doc_id (r7): the band rows are checkpointed and shuffled 16x
    per doc inside _candidate_pairs, so a kept 64-long signature
    multiplies that stage's bytes ~30x — survivors join signatures
    back instead (minhash_neardup).

    Band key is xxhash64 of the band's signature slice — ONE LONG (r7,
    guide §2.3 "narrower types"), replacing the r6 32-hex-char md5
    string that rode the band checkpoint plus three bucket shuffles at
    ~6x the bytes. Bucket membership is decided by key equality and
    equal slices hash equal under either function, so the candidate
    set — and every downstream verified pair — is unchanged (a 64-bit
    collision merging two buckets could only ADD a candidate, which
    the exact-jaccard / est-jaccard verify then filters identically in
    both engines)."""
    # posexplode_outer: a plain posexplode gets an inferred size()>0
    # filter that re-evaluates the interpreted 16-band hash transform a
    # second time per row (see minhash_signatures note)
    return (df.select(
        "doc_id", *keep,
        F.posexplode_outer(
            F.transform(
                F.sequence(F.lit(0), F.lit(BANDS - 1)),
                lambda b: F.xxhash64(F.concat_ws(
                    ",",
                    F.transform(
                        F.slice("minhash", b * ROWS_PER_BAND + 1,
                                ROWS_PER_BAND),
                        lambda x: x.cast("string"))))))
        .alias("band_id", "band_key"))
        .filter(F.col("band_key").isNotNull()))


def _candidate_pairs(bands: DataFrame, payload_col: str | None) -> DataFrame:
    """Bucketed candidates -> deduped pairs, optionally carrying each
    side's payload, in ONE shuffle + ONE dedup — no join back to the
    source. Input needs columns (band_id, band_key, doc_id[, payload]).

    Skew guard: degenerate buckets (a boilerplate band / low-entropy
    chunk shared by thousands of docs) are SAMPLED down to their first
    MAX_BUCKET members by doc_id before pair expansion, capping the
    quadratic blowup at MAX_BUCKET^2 per bucket. Sampling (not dropping,
    the pre-r4 behavior) keeps recall for mass-duplicated content — the
    primary dedup target lands in over-cap buckets in EVERY band, and
    dropping those buckets zeroed its pair recall. First-by-doc_id is
    deterministic and keeps the canonical keeper (min id) in the sample,
    so downstream cluster formation still anchors on it.

    Hot-key shape (r5, replaces the r4 row_number window): SCALE.md's
    rule — hot-key stages must be aggregations or joins, never windows —
    applies to this sampler itself; the r4 window funneled an entire
    10^9-copy bucket through ONE task's sort before the cap filter.
    Now: (1) a bounded-state hash agg computes per-bucket size + keeper
    (count/min are map-side combinable — a 10^9-row bucket arrives at
    its reducer as partials); (2) buckets over _PRESAMPLE_TARGET are
    thinned row-wise by a deterministic doc-hash rate filter (keeper
    always survives) BEFORE any per-bucket collection, so expected
    per-bucket agg state is ~_PRESAMPLE_TARGET, never the raw bucket;
    (3) one collect_list + sort_array + slice takes the first
    MAX_BUCKET by doc_id. Buckets <= _PRESAMPLE_TARGET hit rate 1, so
    the sample is byte-identical to the r4 first-MAX_BUCKET-by-id
    semantics at any realistic bucket size (and at every oracle/test
    scale); only >64x-over-cap monster buckets switch to the hash
    sample, which still contains the min-id keeper by construction.
    The stats join back is key-equality on (band_id, band_key) and
    AQE-splittable when one bucket dominates.

    The stats/join diamond would otherwise evaluate the bands frame —
    and its whole upstream (signature UDF / 64-hash agg) — TWICE
    (Catalyst does not share subplans across branches; measured as a
    duplicated ArrowEvalPython in the LSH plan), so bands is lazily
    localCheckpoint'ed: one materialization feeds both branches, the
    same "write signatures/bands to a scratch table" step a production
    dedup pipeline performs anyway. Blocks are MEMORY_AND_DISK, per
    query, reclaimed by ContextCleaner when the plan is dropped.
    """
    member = (F.struct("doc_id", payload_col) if payload_col
              else F.struct("doc_id"))
    bands = bands.localCheckpoint(eager=False)
    stats = (bands.groupBy("band_id", "band_key")
             .agg(F.count("*").alias("__sz"),
                  F.min("doc_id").alias("__keep_id"))
             .filter(F.col("__sz") > 1))  # singletons never pair
    rate = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.col("__sz") / F.lit(_PRESAMPLE_TARGET)).cast("long"))
    survivors = (bands.join(stats, ["band_id", "band_key"])
                 .filter((F.col("doc_id") == F.col("__keep_id"))
                         | (F.pmod(F.xxhash64("doc_id", "band_key"), rate)
                            == 0)))
    members = (survivors.groupBy("band_id", "band_key")
               .agg(F.slice(F.sort_array(F.collect_list(member)),
                            1, MAX_BUCKET).alias("members"))
               .filter(F.size("members") > 1))

    def mk_pair(a, b):
        fields = [a.doc_id.alias("a_id"), b.doc_id.alias("b_id")]
        if payload_col:
            fields += [a[payload_col].alias("pa"), b[payload_col].alias("pb")]
        return F.struct(*fields)

    pairs = members.select(F.explode(F.filter(
        F.flatten(F.transform(
            "members",
            lambda a: F.transform("members", lambda b: mk_pair(a, b)))),
        lambda p: p.a_id < p.b_id)).alias("p")).select("p.*")
    return pairs.dropDuplicates(["a_id", "b_id"])


def minhash_neardup(spark: SparkSession, sf_dir: str,
                    threshold: float = 0.5) -> DataFrame:
    """Candidate near-dup pairs by MinHash LSH + signature-estimated
    Jaccard >= threshold: signature -> payload-free bands -> bucket
    pairs -> signatures joined back for the surviving pairs only.

    r7 (guide §8 decide-small/attach-once): the bands used to carry
    the full 64-long signature per (doc, band) row — ~30x the id-only
    bytes through the checkpoint, the bucket shuffle and the
    collect_list; now the pair ids are decided payload-free (the
    ngram_jaccard shape) and the two signature join-backs touch only
    the pair survivors. The signature table is lazily checkpointed so
    the band branch and both join-backs share ONE materialization."""
    mh = (minhash_signatures(_docs(spark, sf_dir))
          .localCheckpoint(eager=False))
    pairs = _candidate_pairs(minhash_bands(mh), None)
    joined = (pairs
              .join(mh.select(F.col("doc_id").alias("a_id"),
                              F.col("minhash").alias("pa")), "a_id")
              .join(mh.select(F.col("doc_id").alias("b_id"),
                              F.col("minhash").alias("pb")), "b_id"))
    # filter on the RAW estimate; round only for display (filtering on
    # the rounded value disagrees with a raw-threshold oracle at the
    # boundary, e.g. raw 0.39997 rounds to 0.4)
    est_raw = (F.aggregate(F.zip_with("pa", "pb",
                                      lambda x, y: (x == y).cast("int")),
                           F.lit(0), lambda acc, x: acc + x)
               / F.lit(K_HASHES))
    return (joined.select("a_id", "b_id", est_raw.alias("__raw"))
            .filter(F.col("__raw") >= threshold)
            .select("a_id", "b_id",
                    F.round("__raw", 4).alias("est_jaccard"))
            .orderBy(F.desc("est_jaccard"), "a_id", "b_id"))


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str,
                        threshold: float = 0.4) -> DataFrame:
    """Exact shingle-set Jaccard for the LSH candidate pairs (verify pass
    after minhash banding — the two-stage dedup a real pipeline runs).

    The banding shuffle is payload-free (doc ids only); shingle sets are
    joined back ONLY for the surviving candidate pairs — at 10^9 docs the
    pair set is orders of magnitude smaller than docs x 16 bands, so the
    shingle payload never rides the bucket shuffle (r1 carried it 16x).
    """
    return (exact_jaccard_pairs(_docs(spark, sf_dir), threshold)
            .orderBy(F.desc("jaccard"), "a_id", "b_id"))


def exact_jaccard_pairs(docs: DataFrame, threshold: float) -> DataFrame:
    """LSH-candidates -> exact-jaccard-verified pairs over any
    (doc_id, text) frame (doc_id may be any orderable type — the
    curation path passes urls). Shared by ngram_jaccard_pairs and the
    near-dup curation stage (pipeline.curation_decisions_neardup) — one
    implementation of the candidate/verify shape.

    r7: signatures and shingle sets come out of ONE Arrow kernel pass
    (minhash_signatures emit_shingles=True), lazily checkpointed so the
    banding branch and both verify join-backs share a single
    materialization — the r6 form ran the full tokenize+shingle Python
    loop twice (once inside the signature kernel, once in
    with_shingles). Shingle arrays still never ride the bucket shuffle:
    bands project (doc_id, minhash) only."""
    sig = (minhash_signatures(docs, emit_shingles=True)
           .localCheckpoint(eager=False))
    pairs = _candidate_pairs(
        minhash_bands(sig.select("doc_id", "minhash")), None)
    sh = sig.select("doc_id", "shingles")
    joined = (pairs
              .join(sh.select(F.col("doc_id").alias("a_id"),
                              F.col("shingles").alias("pa")), "a_id")
              .join(sh.select(F.col("doc_id").alias("b_id"),
                              F.col("shingles").alias("pb")), "b_id"))
    inter = F.size(F.array_intersect("pa", "pb"))
    union = F.size(F.array_union("pa", "pb"))
    # raw-threshold filter (see minhash_neardup note) — matches the
    # DuckDB oracle's WHERE on the unrounded jaccard
    return (joined.select("a_id", "b_id",
                          (inter / union).alias("__raw"))
            .filter(F.col("__raw") >= threshold)
            .select("a_id", "b_id", F.round("__raw", 4).alias("jaccard")))


# Spark-compatible XXH64 (seed 42) over raw bytes — bit-for-bit equal to
# F.xxhash64 on a string column (validated against Spark for empty,
# ASCII, multi-byte UTF-8 and >=32-byte inputs; pinned by
# tests/test_dedup.py::test_pyxxh64_matches_spark). Pure Python: callers
# run it behind a per-batch distinct-token memo, so the cost is per
# distinct token, not per occurrence.
_XXH_M = (1 << 64) - 1
_XXH_P1 = 0x9E3779B185EBCA87
_XXH_P2 = 0xC2B2AE3D27D4EB4F
_XXH_P3 = 0x165667B19E3779F9
_XXH_P4 = 0x85EBCA77C2B2AE63
_XXH_P5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _XXH_M


def xxh64_bytes(data: bytes, seed: int = 42) -> int:
    """Unsigned XXH64; subtract 2^64 when bit 63 is set to get Spark's
    signed long."""
    M, P1, P2, P3, P4, P5 = (_XXH_M, _XXH_P1, _XXH_P2, _XXH_P3,
                             _XXH_P4, _XXH_P5)
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i + 32 <= n:
            k = int.from_bytes(data[i:i + 8], "little")
            v1 = (_rotl64((v1 + k * P2) & M, 31) * P1) & M
            k = int.from_bytes(data[i + 8:i + 16], "little")
            v2 = (_rotl64((v2 + k * P2) & M, 31) * P1) & M
            k = int.from_bytes(data[i + 16:i + 24], "little")
            v3 = (_rotl64((v3 + k * P2) & M, 31) * P1) & M
            k = int.from_bytes(data[i + 24:i + 32], "little")
            v4 = (_rotl64((v4 + k * P2) & M, 31) * P1) & M
            i += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12)
             + _rotl64(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h = ((h ^ (_rotl64((v * P2) & M, 31) * P1) & M) * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        h = (_rotl64(h ^ (_rotl64((k * P2) & M, 31) * P1) & M, 27)
             * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i:i + 4], "little")
        h = (_rotl64(h ^ (k * P1) & M, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h = (_rotl64(h ^ (data[i] * P5) & M, 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def with_simhash(df: DataFrame) -> DataFrame:
    """64-bit SimHash per doc via token-hash bit votes.

    Script-aware votes: whitespace tokens for segmented text, char
    trigrams when the whitespace-density predicate flags unsegmented
    script (an unsegmented doc otherwise casts ONE whole-line vote and
    its signature is just that line's hash — any edit flips ~32 bits).

    Execution strategy (r7, guide §4.2): ONE Arrow-batched stage over
    the JVM-normalized text computes the 64 per-bit ones-counts + the
    token count per doc — tokenize, hash (xxh64_bytes, bit-identical
    to F.xxhash64 behind a per-batch distinct-token memo) and a numpy
    unpackbits/sum. This replaces tokenize -> explode (one row per
    TOKEN) -> 64-column hash aggregation + its shuffle: measured
    2.9s -> 1.6s for the vote stage at 50k docs,
    local[32], zero shuffle left before signature assembly. Token
    semantics replicated exactly (re.ASCII \\s split keeping empty
    tokens like Java split with limit -1; trim/lower stays in the JVM;
    BMP assumption for the char branch as in with_shingles — Java
    substr slices UTF-16 units, Python codepoints).

    The signature is assembled IN the kernel (r7, second pass): the
    majority test 2*ones_b > n over the per-bit ones-counts, packed
    little-endian via np.unpackbits' inverse — bit-identical to the
    former 64-branch JVM CASE ladder (the ±1 vote sum is exactly
    2*ones_b - n, so "vote > 0" is the majority test), which shipped
    65 long columns across Arrow and evaluated a 64-term sum per row.
    One (doc_id, simhash) column pair crosses the boundary instead.
    Pinned end-to-end by test_simhash_arrow_votes_match_jvm_agg
    (final signatures vs the r6 JVM explode+agg reference).
    """
    import re

    import numpy as np

    ws_run = re.compile(r"\s+", re.ASCII)
    ws_one = re.compile(r"\s", re.ASCII)
    k_c = SIMHASH_CHAR_TOKEN
    max_ws = SPACELESS_MAX_WS

    def votes_kernel(batches):
        memo: dict[str, int] = {}

        def h_of(t: str) -> int:
            v = memo.get(t)
            if v is None:
                v = xxh64_bytes(t.encode("utf-8"))
                memo[t] = v
            return v

        for pdf in batches:
            ids, ns, rows = [], [], []
            for doc_id, norm in zip(pdf["doc_id"], pdf["__norm"]):
                n = len(norm)
                if n and (n - len(ws_one.sub("", norm))) / n < max_ws:
                    if n < k_c:  # no char n-grams: no vote row at all
                        continue
                    toks = [norm[i:i + k_c] for i in range(n - k_c + 1)]
                else:
                    # keeps leading/trailing empty tokens exactly like
                    # Java split(limit=-1); an empty norm votes once
                    # with the hash of "" — both match the r6 explode
                    toks = ws_run.split(norm)
                hs = np.fromiter((h_of(t) for t in toks),
                                 dtype=np.uint64, count=len(toks))
                rows.append(np.unpackbits(
                    hs.view(np.uint8), bitorder="little")
                    .reshape(-1, SIMHASH_BITS).sum(
                        axis=0, dtype=np.int64))
                ids.append(doc_id)
                ns.append(len(toks))
            if rows:
                ones = np.vstack(rows)
                n_vec = np.asarray(ns, dtype=np.int64)
                bits = (2 * ones) > n_vec[:, None]
                # little-endian pack: bit b contributes 1<<b; the
                # int64 view realizes the top bit as two's complement
                # exactly like the former JVM assembly
                sims = np.packbits(bits, axis=1, bitorder="little") \
                    .view(np.int64).ravel()
            else:
                sims = np.empty(0, dtype=np.int64)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "simhash": pd.Series(sims, dtype="int64")})

    base = _spread(df).select(
        "doc_id", F.trim(F.lower(F.col("text"))).alias("__norm"))
    return base.mapInPandas(votes_kernel,
                            schema="doc_id long, simhash long")


def _simhash_chunks(max_hamming: int) -> list[tuple[int, int]]:
    """(shift, width) for max_hamming+1 chunks covering all 64 bits.

    Pigeonhole: a pair within Hamming distance d <= max_hamming differs
    in at most d chunks, so with d+1 chunks at least one chunk matches
    exactly — candidate recall is guaranteed at the advertised radius.

    Key-width / radius tradeoff (why the at-scale default is d=3): the
    chunk key space is 2^(64/(d+1)) per chunk. d=3 gives the classic
    4x16-bit scheme (65,536 buckets/chunk — Manku et al., WWW'07); d=8
    gives 9 chunks of only 7-8 bits (128-256 buckets/chunk), which
    SATURATES once the corpus exceeds ~MAX_BUCKET * 256 docs: every
    bucket blows past the skew cap and is sampled down to MAX_BUCKET
    members, collapsing the recall the pigeonhole scheme guarantees (a
    given pair survives only if both sides land in the sample). Wide
    radii are therefore a small-corpus option only; tests/test_dedup.py
    asserts both the d<=8 guarantee at small n and the d=3 default's
    recall in the saturated regime.
    """
    n = max_hamming + 1
    base, extra = divmod(SIMHASH_BITS, n)
    chunks = []
    shift = 0
    for i in range(n):
        width = base + (1 if i < extra else 0)
        chunks.append((shift, width))
        shift += width
    return chunks


def simhash_pairs(sh: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Pairs with Hamming(simhash) <= max_hamming from a (doc_id, simhash)
    DataFrame. Candidates via (max_hamming+1)-chunk equality buckets with
    the same MAX_BUCKET skew cap as the minhash path. Default radius 3 =
    the 4x16-bit scheme that stays below the cap at crawl scale (see
    _simhash_chunks); radii up to 8 keep the pigeonhole guarantee but
    saturate on large corpora."""
    chunks = _simhash_chunks(max_hamming)

    def chunk_key(shift: int, width: int):
        expr = F.shiftrightunsigned("simhash", shift)
        if width < 64:  # (1<<64)-1 overflows LongType; width 64 = identity
            expr = expr.bitwiseAND(F.lit((1 << width) - 1))
        return expr

    buckets = sh.select(
        "doc_id", F.col("simhash"),
        F.posexplode_outer(F.array(*[
            chunk_key(shift, width) for shift, width in chunks]))
        .alias("band_id", "band_key"))
    pairs = _candidate_pairs(buckets, "simhash")
    return (pairs.select(
                "a_id", "b_id",
                F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
                 .alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .orderBy("hamming", "a_id", "b_id"))


def simhash_neardup(spark: SparkSession, sf_dir: str,
                    max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    Default radius 3 (16-bit chunk keys): the configuration whose recall
    guarantee survives crawl scale — wider radii shrink the key space
    below the MAX_BUCKET skew cap's saturation point (_simhash_chunks)."""
    return simhash_pairs(with_simhash(_docs(spark, sf_dir)), max_hamming)


def connected_components(edges: DataFrame,
                         max_iters: int = 20) -> DataFrame:
    """Connected components over an (a_id, b_id) pair graph: the step
    that turns pairwise matches into dedup DECISIONS — every node in a
    component gets cluster_id = min(id) of its component (the canonical
    keeper), so `keep = (doc_id == cluster_id)` is the final winner
    predicate. Shared by the text near-dup path (neardup_clusters) and
    the embedding SemDeDup path (similarity.embedding_dedup).

    Algorithm: Hash-Min label propagation (the standard Spark CC shape —
    Rastogi et al., "Finding Connected Components in Map-Reduce"):
    iterate label[v] = min(label[v], min(label[neighbors])) until a
    fixpoint. Each round is one shuffle join + hash agg; rounds needed =
    O(component diameter), and near-dup components are shallow (dup
    clusters, not long chains), so this converges in a handful of rounds
    at any corpus size. The driver-side loop checks ONLY a changed-row
    count per round (an aggregate, not collected data). Restricted to
    nodes that appear in at least one pair — singletons are trivially
    their own cluster and would dominate the output for no information.

    Returns (doc_id, cluster_id) ordered by doc_id.
    """
    # symmetric neighbor list, materialized once — every iteration reuses
    # it (at scale: write to a temp table / cache; here .cache())
    sym = (edges.union(edges.select(F.col("b_id").alias("a_id"),
                                    F.col("a_id").alias("b_id")))
           .withColumnRenamed("a_id", "src")
           .withColumnRenamed("b_id", "dst")
           .cache())
    labels = (sym.select(F.col("src").alias("doc_id")).distinct()
              .withColumn("cluster_id", F.col("doc_id")))
    changed = 0
    for _ in range(max_iters):
        # min label among self and neighbors; the changed flag rides the
        # SAME join (r7): the old shape re-joined new vs old labels in a
        # separate count job every round — with shallow dup components
        # (2-4 rounds typical) that convergence check was half the
        # loop's jobs and a full extra shuffle join per round. Now the
        # checkpointed round output carries __chg and the check is one
        # narrow agg over in-memory blocks.
        neighbor_min = (sym.join(labels,
                                 sym.dst == labels.doc_id)
                        .groupBy("src")
                        .agg(F.min("cluster_id").alias("nmin")))
        new_labels = (labels.join(neighbor_min,
                                  labels.doc_id == neighbor_min.src,
                                  "left")
                      .select("doc_id",
                              F.least("cluster_id",
                                      F.coalesce("nmin", "cluster_id"))
                               .alias("cluster_id"),
                              (F.coalesce("nmin", "cluster_id")
                               < F.col("cluster_id")).alias("__chg")))
        # LAZY checkpoint + the changed-count agg as its first action:
        # one job both materializes the round (lineage cut) and answers
        # the convergence question — 1 job/round where r6 ran 2 (the
        # eager checkpoint, then a new-vs-old shuffle join + count)
        new_labels = new_labels.localCheckpoint(eager=False)
        changed = (new_labels
                   .agg(F.sum(F.col("__chg").cast("long")).alias("c"))
                   .collect()[0]["c"]) or 0
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    sym.unpersist()
    if changed != 0:
        # a silent non-fixpoint would return WRONG cluster ids (labels
        # still propagating through a >max_iters-diameter chain) — fail
        # loudly instead; callers with genuinely deep graphs raise
        # max_iters (rounds needed = O(component diameter))
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            f"rounds ({changed} labels still changing); component "
            f"diameter exceeds max_iters — raise max_iters")
    return labels.orderBy("doc_id")


def neardup_clusters(spark: SparkSession, sf_dir: str,
                     threshold: float = 0.5,
                     max_iters: int = 20) -> DataFrame:
    """Near-dup cluster formation over the verified text pair graph:
    ngram_jaccard_pairs edges -> Hash-Min connected components (see
    connected_components for the algorithm and scale shape)."""
    edges = (ngram_jaccard_pairs(spark, sf_dir, threshold=threshold)
             .select("a_id", "b_id"))
    return connected_components(edges, max_iters=max_iters)
