"""Document deduplication operators (exact → MinHash-LSH → SimHash).

100 TB posture:
- exact dedup: one shuffle on the content fingerprint (hash-groupBy) —
  linear, the scale workhorse;
- exact n-gram Jaccard: quadratic in docs sharing a shingle — correct
  but only for verification/small corpora; the scale path is MinHash-LSH
  (linear in (doc, shingle) pairs + bucket-local joins) whose bucket
  join only pairs docs agreeing on a full band signature;
- SimHash: linear signature computation; candidate pairing via
  same-bucket join on the signature's high bits.

MinHash/SimHash use xxhash64 (Spark-native, deterministic) — not
portable to the DuckDB oracle, so their queries verify candidates with
the exact Jaccard (making the *output* oracle-checkable) or use
rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, word_shingles

JACCARD_THRESHOLD = 0.8


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Content-hash dedup groups: fingerprint, dup_count, canonical id
    (min doc_id). Single shuffle on md5(normalized text)."""
    return (
        docs.select(
            "doc_id", F.md5(F.lower(F.trim("text"))).alias("fingerprint")
        )
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("dup_count"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


def shingle_table(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) exploded distinct word n-gram shingles.

    Repartitions first: document corpora often arrive as few large (or
    one small) parquet row groups, and shingling is CPU-heavy per row —
    without the spread a 32-core machine runs one task."""
    para = docs.sparkSession.sparkContext.defaultParallelism
    return docs.repartition(para, "doc_id").select(
        "doc_id", F.explode(word_shingles("text", n)).alias("shingle")
    )


def jaccard_pairs(
    docs: DataFrame, threshold: float = JACCARD_THRESHOLD, n: int = 3
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (doc_a < doc_b).

    Self-join on shingle → per-pair intersection counts → Jaccard from
    set sizes. Quadratic in per-shingle doc frequency: at scale, feed
    this only LSH candidate pairs (see minhash_lsh_pairs)."""
    sh = shingle_table(docs, n).localCheckpoint()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("intersection"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "intersection",
            (F.col("n_a") + F.col("n_b") - F.col("intersection")).alias(
                "union_size"
            ),
            (
                F.col("intersection").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("intersection")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 64, n: int = 3
) -> DataFrame:
    """MinHash signatures: min over shingles of xxhash64(shingle, seed_j)
    for each of num_hashes seeds — one shuffle on doc_id."""
    sh = shingle_table(docs, n)
    aggs = [
        F.min(F.xxhash64("shingle", F.lit(j))).alias(f"mh_{j}")
        for j in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = JACCARD_THRESHOLD,
    n: int = 3,
) -> DataFrame:
    """MinHash + banded LSH candidate generation, exact-Jaccard verify.

    bands=16 × rows=4: P(candidate | J=0.8) ≈ 1-(1-0.8^4)^16 ≈ 0.9997 —
    near-exact recall at the target threshold, linear cost. The verify
    join makes the output equal to jaccard_pairs() w.h.p., so the same
    SQL oracle applies.
    """
    rows_per_band = num_hashes // bands
    # One materialization of the shingle table feeds signatures, sizes,
    # and the verify join (otherwise Spark re-shingles three times).
    # Shingles are carried as xxhash64 LONGS, not strings: ~4x smaller
    # state and shuffles. Jaccard over hashes equals Jaccard over
    # strings absent 64-bit collisions (P ≈ n²/2^65; verified
    # collision-free on the test corpora, and deterministic either way).
    sh = (
        shingle_table(docs, n)
        .select("doc_id", F.xxhash64("shingle").alias("shingle"))
        .localCheckpoint()
    )
    aggs = [
        F.min(F.xxhash64("shingle", F.lit(j))).alias(f"mh_{j}")
        for j in range(num_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    band_cols = [
        F.xxhash64(
            F.lit(b), *[f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)]
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_idx"), band_cols[b].alias("bh"))
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.bh")
    left = banded.select(
        F.col("doc_id").alias("doc_a"), "band_idx", "bh"
    )
    right = banded.select(
        F.col("doc_id").alias("doc_b"), "band_idx", "bh"
    )
    candidates = (
        left.join(right, ["band_idx", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # Exact verify on candidates only (cheap: candidate set is tiny).
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        candidates.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("intersection"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "intersection",
            (F.col("n_a") + F.col("n_b") - F.col("intersection")).alias(
                "union_size"
            ),
            (
                F.col("intersection").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("intersection")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """64-bit SimHash per document from token xxhash64 bits.

    Linear: explode tokens → per-(doc, bit) vote sums in one shuffle.
    """
    para = docs.sparkSession.sparkContext.defaultParallelism
    tok = (
        docs.repartition(para, "doc_id")
        .select("doc_id", F.explode(tokens("text")).alias("tok"))
        .withColumn("h", F.xxhash64("tok"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v_{b}")
        for b in range(64)
    ]
    per_doc = tok.groupBy("doc_id").agg(*votes)
    sig = None
    for b in range(64):
        bit = F.when(F.col(f"v_{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, b)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return per_doc.select("doc_id", sig.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-dup candidates: pairs within Hamming distance of SimHashes.

    All-pairs here (correctness scale); at 100 TB block on the top-16
    bits (4 rotations) so only same-block pairs compare."""
    sig = simhash_signatures(docs)
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )
