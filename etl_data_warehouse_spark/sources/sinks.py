"""Sinks: idempotent merge-upsert and append-dedup over Parquet.

The reference's warehouse loads are Postgres ``INSERT ... ON CONFLICT
(key) DO UPDATE / DO NOTHING`` in 5,000-row batches
(reference: loaders/warehouse_loader.py:24-83, 90-143). Parquet has no
single-call upsert, so (SURVEY.md §4.2):

- ``merge_upsert``  ≡ DO UPDATE: keep incoming row for conflicting keys,
  existing row otherwise → anti-join + unionByName, then ATOMIC swap
  (write to a temp dir, rename) so a failed job never half-overwrites.
- ``append_dedup``  ≡ DO NOTHING: drop incoming rows whose key already
  exists, then append.

Both are idempotent — re-running the same batch leaves the table
unchanged (the reference re-runs daily over overlapping extracts).

100 TB posture: this rewrite-the-table merge is correct but O(table);
for big facts partition the table by a date column and overwrite only
touched partitions (dynamic partition overwrite), or use a table format
with MERGE (Delta/Iceberg). The date-partitioned variant is
``merge_upsert_partitioned``.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _atomic_swap_write(df: DataFrame, path: str) -> None:
    """Write df to a temp sibling dir, then swap into place."""
    tmp = f"{path}.__tmp_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    old = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def merge_upsert(
    spark: SparkSession, incoming: DataFrame, path: str, keys: list[str]
) -> dict:
    """Upsert incoming rows into the Parquet table at path by key.

    Returns counts {'inserted': n, 'updated': n} like the reference's
    load_dimension result dict (warehouse_loader.py:24-83).
    """
    incoming = incoming.dropDuplicates(keys)
    if not os.path.exists(path):
        n = incoming.count()
        _atomic_swap_write(incoming, path)
        return {"inserted": n, "updated": 0}
    existing = spark.read.parquet(path)
    kept_existing = existing.join(
        incoming.select(*keys).distinct(), keys, "left_anti"
    )
    n_incoming = incoming.count()
    n_existing = existing.count()
    n_kept = kept_existing.count()
    # Materialize BEFORE the swap: merged lazily reads the old files.
    merged = incoming.unionByName(kept_existing).localCheckpoint()
    _atomic_swap_write(merged, path)
    return {
        "inserted": n_incoming - (n_existing - n_kept),
        "updated": n_existing - n_kept,
    }


def append_dedup(
    spark: SparkSession, incoming: DataFrame, path: str, keys: list[str]
) -> int:
    """INSERT ... DO NOTHING twin: append only new keys; returns count
    (reference: warehouse_loader.py:90-143)."""
    incoming = incoming.dropDuplicates(keys)
    if not os.path.exists(path):
        n = incoming.count()
        _atomic_swap_write(incoming, path)
        return n
    existing_keys = spark.read.parquet(path).select(*keys).distinct()
    # the anti-join reorders columns key-first; restore the incoming
    # order so every file in the sink carries ONE column order (parquet
    # directory schema inference picks an arbitrary footer — mixed
    # orders make downstream `df.columns` nondeterministic)
    new_rows = incoming.join(existing_keys, keys, "left_anti").select(
        *incoming.columns
    )
    n = new_rows.count()
    if n:
        new_rows.write.mode("append").parquet(path)
    return n


def assign_stable_keys(
    existing: DataFrame | None,
    incoming: DataFrame,
    business_keys: list[str],
    key_col: str,
) -> DataFrame:
    """Surrogate keys that SURVIVE re-runs (reference semantics: the
    Postgres upsert excludes the SERIAL key from SET, so an updated row
    keeps its key — warehouse_loader.py:56-69; the repo's full-rebuild
    ROW_NUMBER marts renumber instead, SURVEY.md §7.4).

    Rows of ``incoming`` whose business key exists in ``existing`` keep
    the existing ``key_col``; genuinely new rows get
    ``max(existing key) + ROW_NUMBER`` ordered by business key.
    ``incoming``'s own ``key_col`` (if present) is ignored.

    ``incoming`` is deduplicated on the business key first (keep-first
    under a deterministic full-column ordering) — otherwise duplicate
    business keys in one batch would each draw a DIFFERENT fresh
    surrogate, breaking key uniqueness downstream.

    Scale: the key map is (key, business_key) — dimension-scale, joined
    on the business key. The ROW_NUMBER window over NEW rows only is an
    unpartitioned sort, acceptable at dim scale per the W9 rule
    (star.py scale notes); facts never take this path.
    """
    incoming = incoming.drop(key_col)
    other = [c for c in incoming.columns if c not in business_keys]
    w_dedup = Window.partitionBy(*business_keys).orderBy(
        *(other or business_keys)
    )
    incoming = (
        incoming.withColumn("_sk_rn", F.row_number().over(w_dedup))
        .filter(F.col("_sk_rn") == 1)
        .drop("_sk_rn")
    )
    if existing is None:
        w = Window.orderBy(*business_keys)
        return incoming.select(
            F.row_number().over(w).cast("long").alias(key_col), "*"
        )
    key_map = existing.select(key_col, *business_keys)
    max_key = existing.agg(F.max(key_col)).first()[0] or 0
    joined = incoming.join(key_map, business_keys, "left")
    kept = joined.filter(F.col(key_col).isNotNull())
    w = Window.orderBy(*business_keys)
    fresh = (
        joined.filter(F.col(key_col).isNull())
        .drop(key_col)
        .select(
            (F.row_number().over(w) + F.lit(max_key))
            .cast("long")
            .alias(key_col),
            "*",
        )
    )
    cols = [key_col] + [c for c in incoming.columns]
    return kept.select(*cols).unionByName(fresh.select(*cols))


def merge_upsert_stable(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    business_keys: list[str],
    key_col: str,
) -> tuple[dict, DataFrame]:
    """merge_upsert with reference-style stable surrogate keys: re-keys
    ``incoming`` against the table at ``path`` (existing business keys
    keep their surrogate key) before the idempotent merge. Returns
    (counts, keyed_df) — the keyed frame is what fact FK resolution must
    join against so facts reference the keys actually stored."""
    existing = spark.read.parquet(path) if os.path.exists(path) else None
    keyed = assign_stable_keys(existing, incoming, business_keys, key_col)
    # Materialize: the merge below both counts and rewrites the same
    # files the lazy plan would re-read mid-swap.
    keyed = keyed.localCheckpoint()
    counts = merge_upsert(spark, keyed, path, business_keys)
    return counts, keyed


def merge_upsert_partitioned(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    keys: list[str],
    partition_col: str,
) -> int:
    """Scale path: merge only the date partitions present in incoming
    (dynamic partition overwrite) — O(touched partitions), not O(table).
    Returns the number of rows written."""
    incoming = incoming.dropDuplicates(keys)
    prev_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        if os.path.exists(path):
            parts = [
                r[0] for r in incoming.select(partition_col).distinct().collect()
            ]
            existing = spark.read.parquet(path).filter(
                F.col(partition_col).isin(parts)
            )
            kept = existing.join(
                incoming.select(*keys).distinct(), keys, "left_anti"
            )
            merged = incoming.unionByName(kept).localCheckpoint()
        else:
            merged = incoming
        n = merged.count()
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(path)
        return n
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)


def scd2_upsert(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    business_key: str,
    tracked_cols: list[str],
    effective_date: str,
) -> dict:
    """Type-2 slowly-changing-dimension merge (beyond the reference's
    SCD1 ON CONFLICT DO UPDATE, warehouse_loader.py:24-83): when a
    tracked attribute changes, the current version row is CLOSED
    (``valid_to`` = effective_date, ``is_current`` = false) and a new
    version is appended, preserving full history.

    Table columns = incoming columns + (valid_from, valid_to,
    is_current, version). Idempotent: re-running the same batch on the
    same effective_date changes nothing (change detection compares
    tracked-attribute hashes, and an unchanged hash short-circuits).

    Scale: one equi-join incoming ⋈ current on the business key
    (dimension-scale → broadcast), one union rewrite via atomic swap;
    use date-partitioned history tables for very large dims.
    """
    incoming = incoming.dropDuplicates([business_key])
    change_hash = F.md5(
        F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                      for c in tracked_cols]
        )
    )
    stamped = (
        incoming.withColumn("valid_from", F.lit(effective_date).cast("date"))
        .withColumn("valid_to", F.lit(None).cast("date"))
        .withColumn("is_current", F.lit(True))
        .withColumn("version", F.lit(1).cast("int"))
    )
    if not os.path.exists(path):
        n = stamped.count()
        _atomic_swap_write(stamped, path)
        return {"inserted": n, "changed": 0, "unchanged": 0}

    existing = spark.read.parquet(path)
    current = existing.filter(F.col("is_current"))
    history = existing.filter(~F.col("is_current"))

    inc = incoming.withColumn("__new_hash", change_hash)
    cur = current.withColumn("__cur_hash", change_hash)
    joined = inc.alias("i").join(
        F.broadcast(
            cur.select(
                F.col(business_key).alias("__bk"),
                "__cur_hash",
                F.col("version").alias("__cur_version"),
            )
        ),
        F.col(f"i.{business_key}") == F.col("__bk"),
        "left",
    )
    brand_new = joined.filter(F.col("__bk").isNull())
    changed = joined.filter(
        F.col("__bk").isNotNull() & (F.col("__new_hash") != F.col("__cur_hash"))
    )
    n_new = brand_new.count()
    n_changed = changed.count()
    n_unchanged = inc.count() - n_new - n_changed

    changed_keys = changed.select(F.col("__bk").alias(business_key))
    closed = (
        current.join(changed_keys, business_key, "left_semi")
        .withColumn("valid_to", F.lit(effective_date).cast("date"))
        .withColumn("is_current", F.lit(False))
    )
    untouched_current = current.join(changed_keys, business_key, "left_anti")

    inc_cols = incoming.columns
    new_versions = changed.select(
        *[F.col(f"i.{c}").alias(c) for c in inc_cols],
        F.lit(effective_date).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
        (F.col("__cur_version") + 1).cast("int").alias("version"),
    )
    first_versions = brand_new.select(
        *[F.col(f"i.{c}").alias(c) for c in inc_cols],
        F.lit(effective_date).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
        F.lit(1).cast("int").alias("version"),
    )
    out_cols = existing.columns
    merged = (
        history.select(*out_cols)
        .unionByName(closed.select(*out_cols))
        .unionByName(untouched_current.select(*out_cols))
        .unionByName(new_versions.select(*out_cols))
        .unionByName(first_versions.select(*out_cols))
        .localCheckpoint()
    )
    _atomic_swap_write(merged, path)
    return {"inserted": n_new, "changed": n_changed, "unchanged": n_unchanged}


def scd2_upsert_partitioned(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    business_key: str,
    tracked_cols: list[str],
    effective_date: str,
) -> dict:
    """Date-partitioned Type-2 SCD merge — same semantics as
    ``scd2_upsert`` but the history table is partitioned on
    ``scd_part`` ('current' | 'closed_YYYY-MM' of valid_to), so one
    run rewrites ONLY the current partition plus the single month
    partition receiving newly closed rows. Months closed in earlier
    runs are never touched again.

    This is the 100 TB variant: ``scd2_upsert`` re-unions the FULL
    history every run (cost grows with table age); here run cost is
    ∝ |current dim| + |this month's closures|, constant over time,
    and the as-of read path (``scd2_snapshot``) partition-prunes to
    'current' + months after the snapshot date.
    """
    incoming = incoming.dropDuplicates([business_key])
    part_of_eff = "closed_" + effective_date[:7]
    change_hash = F.md5(
        F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                      for c in tracked_cols]
        )
    )
    stamped = (
        incoming.withColumn("valid_from", F.lit(effective_date).cast("date"))
        .withColumn("valid_to", F.lit(None).cast("date"))
        .withColumn("is_current", F.lit(True))
        .withColumn("version", F.lit(1).cast("int"))
        .withColumn("scd_part", F.lit("current"))
    )
    if not os.path.exists(path):
        n = stamped.count()
        stamped.write.partitionBy("scd_part").mode("overwrite").parquet(path)
        return {"inserted": n, "changed": 0, "unchanged": 0}

    table = spark.read.parquet(path)
    # partition-pruned: only the 'current' directory is scanned
    current = table.filter(F.col("scd_part") == "current").drop("scd_part")

    inc = incoming.withColumn("__new_hash", change_hash)
    cur = current.withColumn("__cur_hash", change_hash)
    joined = inc.alias("i").join(
        F.broadcast(
            cur.select(
                F.col(business_key).alias("__bk"),
                "__cur_hash",
                F.col("version").alias("__cur_version"),
            )
        ),
        F.col(f"i.{business_key}") == F.col("__bk"),
        "left",
    )
    brand_new = joined.filter(F.col("__bk").isNull())
    changed = joined.filter(
        F.col("__bk").isNotNull() & (F.col("__new_hash") != F.col("__cur_hash"))
    )
    n_new = brand_new.count()
    n_changed = changed.count()
    n_unchanged = inc.count() - n_new - n_changed

    changed_keys = changed.select(F.col("__bk").alias(business_key))
    closed = (
        current.join(changed_keys, business_key, "left_semi")
        .withColumn("valid_to", F.lit(effective_date).cast("date"))
        .withColumn("is_current", F.lit(False))
    )
    untouched_current = current.join(changed_keys, business_key, "left_anti")

    inc_cols = incoming.columns
    new_versions = changed.select(
        *[F.col(f"i.{c}").alias(c) for c in inc_cols],
        F.lit(effective_date).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
        (F.col("__cur_version") + 1).cast("int").alias("version"),
    )
    first_versions = brand_new.select(
        *[F.col(f"i.{c}").alias(c) for c in inc_cols],
        F.lit(effective_date).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
        F.lit(1).cast("int").alias("version"),
    )
    data_cols = [c for c in table.columns if c != "scd_part"]
    new_current = (
        untouched_current.select(*data_cols)
        .unionByName(new_versions.select(*data_cols))
        .unionByName(first_versions.select(*data_cols))
        .withColumn("scd_part", F.lit("current"))
    )
    out = new_current
    if n_changed > 0:
        # rewrite exactly one closed month: prior closures of that month
        # (partition-pruned scan) + this run's closures
        month_existing = table.filter(
            F.col("scd_part") == part_of_eff
        ).drop("scd_part")
        month_rows = (
            month_existing.select(*data_cols)
            .unionByName(closed.select(*data_cols))
            .withColumn("scd_part", F.lit(part_of_eff))
        )
        out = new_current.unionByName(month_rows)

    out = out.localCheckpoint()  # sever self-read-overwrite lineage
    prev_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.partitionBy("scd_part").mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    return {"inserted": n_new, "changed": n_changed, "unchanged": n_unchanged}


def scd2_snapshot(spark: SparkSession, path: str, as_of: str) -> DataFrame:
    """Dimension state as of ``as_of`` (inclusive) from a
    ``scd2_upsert_partitioned`` table.

    Partition pruning does the heavy lifting: rows closed in months
    BEFORE the snapshot month cannot satisfy ``valid_to > as_of``
    ('closed_YYYY-MM' sorts lexicographically, and 'current' > any
    'closed_*'), so their directories are never scanned.
    """
    floor_part = "closed_" + as_of[:7]
    return (
        spark.read.parquet(path)
        .filter(F.col("scd_part") >= floor_part)  # partition filter
        .filter(
            (F.col("valid_from") <= F.lit(as_of).cast("date"))
            & (
                F.col("valid_to").isNull()
                | (F.col("valid_to") > F.lit(as_of).cast("date"))
            )
        )
        .drop("scd_part")
    )
