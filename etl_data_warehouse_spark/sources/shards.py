"""Training-shard writer: deterministic, reproducible, size-balanced
parquet shards of a packed LM training stream.

The last pipeline stage before a trainer reads the corpus: assign every
document to a shard (md5 hash — reproducible, source-independent),
give it a deterministic *shuffle* position within the shard (a second
md5 — the "global shuffle" pretraining needs, without a random() that
would break replay), pack the shard's stream into fixed-token context
chunks (the q45 concatenate-then-chop discipline), and write ONE
parquet directory partitioned by shard.

Extends the reference's loader family (loaders/warehouse_loader.py
writes row batches to Postgres; loaders/s3_loader.py writes whole
files) to the training-data case where the *layout* is the contract:
same input -> byte-identical shard contents, any shard readable alone.

100 TB posture: one hash-partition shuffle on `shard` (partitionBy on
the write side, no global sort); the within-shard window sorts
shard-local rows only, so each sort fits one executor when n_shards is
sized to ~executor-count x a small factor. Shard count also bounds
parquet file sizes — pick n_shards ~ corpus_tokens / 2^31 to keep
row groups cache-friendly. The writer is one-shot + atomic swap
(temp dir, rename) — replays are idempotent by construction; for
daily *appends* use the `batch=N` overwrite-partition protocol of
ann_index/cdc_stream instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..operators.sampling import hash_bucket
from .sinks import _atomic_swap_write

_ORDER_SPACE = 1 << 31  # shuffle-position space; collisions broken by doc_id


def pack_training_shards(
    docs: DataFrame,
    n_shards: int = 64,
    budget: int = 512,
    salt: str = "shard",
    key: str = "doc_id",
) -> DataFrame:
    """The pure (testable, plan-only) half of the writer: shard
    assignment + deterministic in-shard shuffle + context-chunk packing.

    Returns doc-grain rows: (key, text-carrying columns.., shard,
    shuffle_pos, n_tokens, chunk_offset, chunk_in_shard,
    offset_in_chunk). A document starting at running offset o spans
    chunks from ``o div budget`` — exactly q45's packing math, applied
    per shard after the hash shuffle."""
    w = (
        Window.partitionBy("shard")
        .orderBy("shuffle_pos", key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.withColumn(
            "shard", hash_bucket(key, salt, n_shards).cast("int")
        )
        .withColumn(
            "shuffle_pos",
            hash_bucket(key, f"{salt}_order", _ORDER_SPACE).cast("long"),
        )
        .withColumn("n_tokens", token_count("text"))
        .withColumn(
            "chunk_offset",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long")),
        )
        .withColumn("chunk_in_shard", F.expr(f"chunk_offset div {budget}"))
        .withColumn(
            "offset_in_chunk",
            F.expr(f"chunk_offset % {budget}").cast("long"),
        )
    )


def write_training_shards(
    docs: DataFrame,
    path: str,
    n_shards: int = 64,
    budget: int = 512,
    salt: str = "shard",
    key: str = "doc_id",
) -> DataFrame:
    """Pack and write the corpus as ``path/shard=N/`` parquet; returns
    the shard manifest (shard, n_docs, n_tokens, n_chunks) computed
    from the WRITTEN files (so the manifest can never disagree with
    the data a trainer will read)."""
    packed = pack_training_shards(
        docs, n_shards=n_shards, budget=budget, salt=salt, key=key
    )
    spark = docs.sparkSession
    _atomic_swap_write_partitioned(packed, path)
    return shard_manifest(spark, path)


def shard_manifest(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            (F.max("chunk_in_shard") + 1).cast("long").alias("n_chunks"),
        )
        .orderBy("shard")
    )


def _atomic_swap_write_partitioned(df: DataFrame, path: str) -> None:
    """partitionBy('shard') variant of sinks._atomic_swap_write."""
    import os
    import shutil
    import uuid

    tmp = f"{path}.__tmp_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").partitionBy("shard").parquet(tmp)
    old = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def append_training_batch(
    docs: DataFrame,
    path: str,
    batch_id: int,
    n_shards: int = 64,
    budget: int = 512,
    salt: str = "shard",
    key: str = "doc_id",
) -> None:
    """Daily-append variant of the writer: pack a new batch of documents
    into ``path/batch=N/shard=M/`` so each shard's packed token stream
    EXTENDS across batches — per-shard chunk offsets continue from the
    totals of all other batches, so chunks a trainer already consumed
    never move (the packed-prefix property).

    Crash/replay protocol is the ann_index/cdc one: the re-crawl guard
    anti-joins doc ids against every batch EXCEPT this one, and the
    batch dir is written with mode=overwrite — a replay of a partial
    write re-packs the identical full batch (append-mode would
    duplicate rows when a replay races a partial write). Per-batch
    marginal cost is O(batch + n_shards), never O(corpus)."""
    import os

    spark = docs.sparkSession
    have_prior = os.path.exists(path) and any(
        d.startswith("batch=") for d in os.listdir(path)
    )
    if have_prior:
        allb = spark.read.option("basePath", path).parquet(path)
        other = allb.filter(F.col("batch") != batch_id)
        docs = docs.join(
            other.select(F.col(key)).distinct(), key, "left_anti"
        )
        base = other.groupBy("shard").agg(
            F.sum("n_tokens").alias("base_off")
        )
    else:
        base = None
    packed = pack_training_shards(
        docs, n_shards=n_shards, budget=budget, salt=salt, key=key
    )
    if base is not None:
        packed = (
            packed.join(F.broadcast(base), "shard", "left")
            .withColumn(
                "chunk_offset",
                F.col("chunk_offset")
                + F.coalesce("base_off", F.lit(0).cast("long")),
            )
            .drop("base_off")
            .withColumn(
                "chunk_in_shard", F.expr(f"chunk_offset div {budget}")
            )
            .withColumn(
                "offset_in_chunk",
                F.expr(f"chunk_offset % {budget}").cast("long"),
            )
        )
    packed = packed.localCheckpoint()
    if not packed.take(1):
        return  # every id was a re-crawl; replay keeps the dir absent
    packed.write.mode("overwrite").partitionBy("shard").parquet(
        f"{path}/batch={batch_id}"
    )
