"""Bucketed table layout: shuffle-free co-located joins.

The reference leans on Postgres B-tree indexes for join performance
(reference: warehouse/target_schema.sql:105-110); at Spark scale the
equivalent physical design is BUCKETING: pre-hash-partition both join
sides into the same number of buckets on the join key at write time.
Every subsequent equi-join (or aggregation) on that key reads bucket i
against bucket i — ZERO shuffle at query time, amortizing one write-time
shuffle across every downstream join. This is the 100 TB answer for the
recurring fact↔fact joins (orders ↔ lineitem) that are too big for
broadcast.
"""

from __future__ import annotations

import json
import os
import re
import warnings

from pyspark.sql import DataFrame, SparkSession

# Spark bucketed-output file names encode the bucket id as a 5-digit
# suffix before the codec extension: part-00000-<uuid>_00012.c000...
_BUCKET_FILE_RE = re.compile(r"_(\d{5})\.c\d+")


def _spec_path(path: str) -> str:
    # underscore-prefixed: parquet/Spark directory readers skip it,
    # like _SUCCESS
    return os.path.join(path, "_bucket_spec.json")


def write_bucket_spec(path: str, keys: list[str], buckets: int) -> None:
    with open(_spec_path(path), "w") as f:
        json.dump({"keys": keys, "buckets": buckets}, f)


def validate_bucket_layout(
    path: str, keys: list[str], buckets: int
) -> None:
    """Refuse to (re-)register ``path`` as a bucketed table unless the
    files really were bucket-written with exactly (keys, buckets).

    Spark does NOT validate a declared CLUSTERED BY spec against the
    files at LOCATION — registering a plain-parquet directory (or one
    bucketed differently) yields silently WRONG Exchange-free join
    results, not an error. Primary check: the ``_bucket_spec.json``
    sidecar write_bucketed drops next to the data. Fallback for
    directories written before the sidecar existed: bucket-id-encoded
    file names must be present and every encoded id must fit the
    declared bucket count (this catches plain parquet and too-few
    declared buckets; it cannot catch a directory bucketed into FEWER
    buckets than declared — rebuild pre-sidecar indexes to close that
    hole)."""
    if not os.path.isdir(path):
        # remote filesystem (s3://, hdfs://) — not inspectable through
        # os; the sidecar/file-name checks are local-layout guards, and
        # remote object stores should gate registration on their own
        # manifest instead of silently passing a wrong spec here.
        # Surface the bypass LOUDLY: a silently-skipped check on a
        # mis-bucketed remote layout is exactly the wrong-results mode
        # this validator exists to close.
        warnings.warn(
            f"validate_bucket_layout: {path!r} is not a local "
            "directory — bucket layout NOT verified; ensure the remote "
            f"layout really is keys={keys} buckets={buckets} (e.g. via "
            "its own manifest) before trusting Exchange-free joins",
            stacklevel=2,
        )
        return
    spec_file = _spec_path(path)
    if os.path.exists(spec_file):
        with open(spec_file) as f:
            spec = json.load(f)
        if spec.get("keys") != keys or spec.get("buckets") != buckets:
            raise ValueError(
                f"bucket spec mismatch at {path}: files were written "
                f"with {spec}, registration asked for keys={keys} "
                f"buckets={buckets}"
            )
        return
    ids = [
        int(m.group(1))
        for name in os.listdir(path)
        if name.endswith(".parquet")
        for m in [_BUCKET_FILE_RE.search(name)]
        if m
    ]
    if not ids:
        raise ValueError(
            f"{path} has no bucket-id-encoded parquet file names — "
            "plain (unbucketed) parquet cannot be registered as a "
            "bucketed table (the Exchange-free join would be silently "
            "wrong); rebuild the index with write_bucketed"
        )
    if max(ids) >= buckets:
        raise ValueError(
            f"{path} contains bucket id {max(ids)} >= declared bucket "
            f"count {buckets} — the directory was bucketed differently"
        )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str | list[str],
    buckets: int,
    path: str,
    mode: str = "overwrite",
) -> None:
    """Persist df hash-bucketed (and sorted) by key — single column or
    composite key list — as an external parquet table; both join sides
    must use the same bucket count. ``mode="append"`` adds files with
    the same bucket spec (Spark rejects a mismatched spec). Drops a
    ``_bucket_spec.json`` sidecar so later sessions can validate the
    layout before re-registering it (validate_bucket_layout)."""
    keys = [key] if isinstance(key, str) else list(key)
    (
        df.write.format("parquet")
        .bucketBy(buckets, keys[0], *keys[1:])
        .sortBy(keys[0], *keys[1:])
        .option("path", path)
        .mode(mode)
        .saveAsTable(table_name)
    )
    write_bucket_spec(path, keys, buckets)


def register_bucketed_table(
    spark: SparkSession,
    name: str,
    path: str,
    keys: list[str],
    buckets: int,
) -> None:
    """(Re-)attach an existing bucketed directory as an external table
    in THIS session's catalog: CREATE TABLE IF NOT EXISTS with the
    bucket spec and LOCATION re-attaches the files with zero data
    movement, so Exchange-free joins survive session turnover
    (saveAsTable registers only in the writing session). Column schema
    comes from the parquet footers (cannot drift from the files); the
    bucket LAYOUT is validated first (validate_bucket_layout) because
    Spark itself never checks the declared spec against the files.
    The validation runs even when the table name is already registered
    (a stale catalog entry can point at a since-rewritten directory —
    the DDL no-op must not skip the layout check); only the DDL is
    skipped in that case."""
    validate_bucket_layout(path, keys, buckets)
    if spark.catalog.tableExists(name):
        return
    ddl = spark.read.parquet(path).schema.toDDL()
    keys_sql = ", ".join(keys)
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({ddl}) USING parquet "
        f"CLUSTERED BY ({keys_sql}) SORTED BY ({keys_sql}) "
        f"INTO {buckets} BUCKETS LOCATION '{path}'"
    )


def ctas_bucketed(
    spark: SparkSession,
    table_name: str,
    select_sql: str,
    key: str,
    buckets: int,
    path: str,
) -> None:
    """SQL CTAS surface for the same physical design: CREATE TABLE ..
    USING parquet CLUSTERED BY (key) INTO n BUCKETS AS SELECT ... —
    the declarative twin of ``write_bucketed`` for SQL-first users
    (mirrors the reference's CREATE TABLE AS staging DDL,
    reference: warehouse/target_schema.sql)."""
    spark.sql(
        f"CREATE TABLE {table_name} USING parquet "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {buckets} BUCKETS "
        f"LOCATION '{path}' "
        f"AS {select_sql}"
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — Catalyst
    recognizes the matching hash distribution and plans a sort-merge
    join with NO Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
