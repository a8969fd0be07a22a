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


def packing_efficiency(
    docs: DataFrame,
    budget: int = 512,
    shard: str = "source",
) -> DataFrame:
    """Per-shard packing-efficiency report for the concatenate-then-chop
    strategy (sequence_packing): chunks used, tail waste, and the chunk
    count a naive one-doc-per-chunk padding scheme would have needed —
    the telemetry that justifies packing in an LM data pipeline (waste
    is ONE partial chunk per shard vs per-document padding loss).

    Columns: shard, n_docs, total_tokens, n_chunks (= ceil(total /
    budget)), tail_waste (= n_chunks*budget - total), waste_pct,
    padded_chunks (= sum of per-doc ceil(n_tokens/budget)),
    chunks_saved (= padded_chunks - n_chunks). One token-count
    projection + one shard-keyed aggregation — a single shuffle, no
    window; integer arithmetic throughout so both engines agree
    bit-for-bit (waste_pct is the only double, an identical int/int
    division)."""
    t = docs.select(
        F.col(shard).alias("shard"),
        token_count("text").alias("n_tokens"),
    )
    # ceil(x / b) as (x + b - 1) div b — positive operands only, where
    # truncating and flooring integer division agree in BOTH engines
    # (a negate-based ceil would diverge: Spark `div` truncates toward
    # zero, DuckDB `//` floors)
    total = F.sum("n_tokens").cast("long")
    n_chunks = F.expr(
        f"(sum(n_tokens) + {budget - 1}) div {budget}"
    ).cast("long")
    padded = F.sum(
        F.expr(f"(n_tokens + {budget - 1}) div {budget}")
    ).cast("long")
    return (
        t.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            total.alias("total_tokens"),
            n_chunks.alias("n_chunks"),
            (n_chunks * budget - total).alias("tail_waste"),
            F.when(
                n_chunks > 0,
                (n_chunks * budget - total).cast("double")
                / (n_chunks * budget).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("waste_pct"),
            padded.alias("padded_chunks"),
            (padded - n_chunks).alias("chunks_saved"),
        )
        .orderBy("shard")
    )


def weighted_sample_topk(
    df: DataFrame,
    weight: Column | str,
    k: int,
    key: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (one pass).

    Efraimidis–Spirakis A-ES: each row draws priority
    ``ln(u) / w`` with ``u ~ U(0,1)``; the k LARGEST priorities are an
    exact weighted sample without replacement. The uniform is not
    random but hashed — ``u = (md5_32(salt||key)+1) / 2^32`` — so the
    selection is reproducible across runs/engines and stable under
    re-partitioning (the property ``F.rand`` lacks), and adding rows
    never perturbs other rows' priorities: an incremental corpus keeps
    its previous picks unless a new row out-ranks one.

    Scale: zero-shuffle projection + global TakeOrdered top-k (partial
    per-partition top-k then a k-row driver merge — never a full sort).
    Rows with non-positive weight are excluded (they would carry
    priority -inf anyway).
    """
    w = (F.col(weight) if isinstance(weight, str) else weight).cast("double")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1).cast("double")) / F.lit(4294967296.0)
    pri = F.log(u) / w
    return (
        df.filter(w > 0)
        .withColumn("_pri", pri)
        .orderBy(F.col("_pri").desc(), F.col(key))
        .limit(k)
        .drop("_pri")
    )


def weighted_sample_sql(
    table: str, weight_sql: str, k: int, key_sql: str, salt: str = "wsample"
) -> str:
    """DuckDB twin of :func:`weighted_sample_topk` (for oracles):
    identical md5-derived uniform, identical ``ln(u)/w`` priority.

    ``key_sql`` is the RAW key expression: the ::VARCHAR cast the md5
    input needs is applied here, so the ORDER BY tiebreaker compares the
    key in its native type exactly like the Spark side (a caller-side
    cast would break numeric ties lexicographically: '10' < '2')."""
    u = (
        f"((('0x' || substring(md5('{salt}' ||"
        f" ({key_sql})::VARCHAR), 1, 8))::BIGINT"
        f" + 1) / 4294967296.0)"
    )
    return (
        f"SELECT * EXCLUDE (_pri) FROM ("
        f"SELECT *, ln({u}) / CAST({weight_sql} AS DOUBLE) AS _pri"
        f" FROM {table} WHERE CAST({weight_sql} AS DOUBLE) > 0"
        f" ORDER BY _pri DESC, {key_sql} LIMIT {k})"
    )
