"""Deterministic sampling / splitting / packing for training-data prep.

The ops a 100 TB pretraining pipeline runs between "corpus cleaned" and
"tokens on disk":

- hash split: stable train/val/test assignment from a salted md5 of the
  document key — pure per-row projection, ZERO shuffles, and adding
  documents never reassigns existing ones (the property random splits
  lack). Portable: the DuckDB oracle computes the identical buckets.
- stratified sampling: per-stratum rates from a second salt; same
  zero-shuffle shape.
- sequence packing: concatenate-then-chop assignment of documents to
  fixed-token-budget training chunks via a running-sum window inside
  each corpus shard (``source``) — the standard LM data-prep layout.

All expressions are Catalyst built-ins (no Python in the row path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count

SPLIT_BUCKETS = 100


def hash_bucket(key: Column | str, salt: str, buckets: int = SPLIT_BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets) from md5(salt || key).

    Uses the first 8 hex digits (32 bits — unbiased enough for split
    work at any corpus size) parsed to a long; bit-identical in DuckDB
    via ``('0x' || substring(md5(...), 1, 8))::BIGINT``.
    """
    k = F.col(key) if isinstance(key, str) else key
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), k.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return h % F.lit(buckets)


def bucket_sql(key_sql: str, salt: str, buckets: int = SPLIT_BUCKETS) -> str:
    """DuckDB twin of :func:`hash_bucket` (for composing oracles)."""
    return (
        f"(('0x' || substring(md5('{salt}' || {key_sql}), 1, 8))::BIGINT"
        f" % {buckets})"
    )


def train_test_split(
    df: DataFrame,
    key: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Adds ``split_bucket`` + ``split`` ('train'/'val'/'test').

    Assignment depends only on (salt, key) — stable across runs and
    across corpus growth. No shuffle: the plan is scan + project.
    """
    b = hash_bucket(key, salt)
    return df.withColumn("split_bucket", b).withColumn(
        "split",
        F.when(F.col("split_bucket") < train_pct, "train")
        .when(F.col("split_bucket") < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def stratified_sample_flag(
    df: DataFrame,
    rates_pct: dict[str, int],
    default_pct: int,
    stratum: str = "lang",
    key: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Adds ``sample_bucket`` + boolean ``sampled``: keep ~rate% of each
    stratum, chosen deterministically by hash (re-runs keep the same
    rows). Independent salt from the split hash so sampling doesn't
    correlate with split assignment."""
    rate = F.lit(default_pct)
    for value, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(stratum) == value, pct).otherwise(rate)
    b = hash_bucket(key, salt)
    return df.withColumn("sample_bucket", b).withColumn(
        "sampled", F.col("sample_bucket") < rate
    )


def sequence_packing(
    docs: DataFrame,
    budget: int = 512,
    shard: str = "source",
    key: str = "doc_id",
) -> DataFrame:
    """Concatenate-then-chop packing: documents ordered by ``key``
    within each ``shard`` fill fixed-``budget`` token chunks; a document
    starting at running offset ``o`` lands in chunk ``o div budget`` at
    offset ``o mod budget`` (long documents span chunk boundaries, as
    concatenated LM training streams do).

    Scale: ONE shuffle on ``shard``; the running-sum window sorts within
    each shard only — never a global single-partition window. At 100 TB
    shards are the ingest partitions, so each window stays
    executor-sized; chunk ids are (shard, local_chunk) pairs, globally
    unique without global coordination.
    """
    w = (
        Window.partitionBy(shard)
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.withColumn("n_tokens", token_count("text"))
        .withColumn(
            "chunk_offset",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long")),
        )
        .select(
            key,
            shard,
            "n_tokens",
            "chunk_offset",
            F.expr(f"chunk_offset div {budget}").alias("chunk_in_shard"),
            F.expr(f"chunk_offset % {budget}").cast("long").alias(
                "offset_in_chunk"
            ),
        )
    )
