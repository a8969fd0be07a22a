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

from pyspark.sql import DataFrame, SparkSession


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
    the same bucket spec (Spark rejects a mismatched spec)."""
    keys = [key] if isinstance(key, str) else list(key)
    (
        df.write.format("parquet")
        .bucketBy(buckets, keys[0], *keys[1:])
        .sortBy(keys[0], *keys[1:])
        .option("path", path)
        .mode(mode)
        .saveAsTable(table_name)
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
