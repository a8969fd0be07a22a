"""MERGE INTO surface: the reference's ``INSERT ... ON CONFLICT``
(reference: loaders/warehouse_loader.py:55-83) as a first-class Spark
statement, capability-gated on the session's catalog.

Spark's SQL parser accepts ANSI ``MERGE INTO`` but plain parquet tables
cannot execute it — row-level mutation needs a table format with
transactional file rewrite (Delta ``DeltaSparkSessionExtension``,
Iceberg ``IcebergSparkSessionExtensions``; neither ships in this
container, so the MERGE execution path is exercised only when such a
catalog is attached). ``merge_into`` therefore:

1. generates the exact MERGE statement (``merge_sql``) and runs it when
   the session is MERGE-capable — one transactional statement, no table
   rewrite beyond touched files, the 100 TB shape;
2. otherwise falls back to the join-merge twin (``sinks.merge_upsert``:
   anti-join + union + atomic swap), which is SEMANTICALLY IDENTICAL to
   ``WHEN MATCHED UPDATE ALL / WHEN NOT MATCHED INSERT ALL`` — the
   parity contract is pinned in tests (TestMergeInto).

``DO NOTHING`` (insert-only) maps to a MERGE with no MATCHED clause and
falls back to ``sinks.append_dedup``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sinks import append_dedup, merge_upsert

_MERGE_EXTENSIONS = (
    "io.delta.sql.DeltaSparkSessionExtension",
    "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
)


def catalog_supports_merge(spark: SparkSession) -> bool:
    """True iff a MERGE-executing catalog extension is attached to this
    session (Delta or Iceberg). Config probe only — no classloading."""
    exts = spark.conf.get("spark.sql.extensions", "") or ""
    return any(e in exts for e in _MERGE_EXTENSIONS)


def merge_sql(
    target_table: str,
    source: str,
    keys: list[str],
    columns: list[str],
    insert_only: bool = False,
) -> str:
    """The ANSI MERGE statement equal to the reference's ON CONFLICT.

    DO UPDATE  → WHEN MATCHED THEN UPDATE SET <non-key cols>
    DO NOTHING → (insert_only) no MATCHED clause
    Both end with WHEN NOT MATCHED THEN INSERT (all columns).
    """
    if not keys:
        raise ValueError("merge requires at least one key column")
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    col_list = ", ".join(columns)
    val_list = ", ".join(f"s.{c}" for c in columns)
    clauses = [f"MERGE INTO {target_table} t", f"USING {source} s", f"ON {on}"]
    non_keys = [c for c in columns if c not in keys]
    if not insert_only and non_keys:
        sets = ", ".join(f"t.{c} = s.{c}" for c in non_keys)
        clauses.append(f"WHEN MATCHED THEN UPDATE SET {sets}")
    clauses.append(
        f"WHEN NOT MATCHED THEN INSERT ({col_list}) VALUES ({val_list})"
    )
    return "\n".join(clauses)


def merge_into(
    spark: SparkSession,
    incoming: DataFrame,
    keys: list[str],
    target_table: str | None = None,
    path: str | None = None,
    insert_only: bool = False,
) -> dict:
    """Upsert ``incoming`` into the target by key.

    MERGE-capable session + ``target_table`` → one MERGE INTO statement.
    Otherwise → the parquet join-merge twin at ``path`` (same result;
    returns the same {'inserted', 'updated'} counts shape — the MERGE
    path reports -1s because catalog metrics are format-specific).
    """
    if catalog_supports_merge(spark) and target_table:
        view = f"__merge_src_{abs(hash(target_table)) % 10**8}"
        incoming.createOrReplaceTempView(view)
        try:
            spark.sql(
                merge_sql(
                    target_table, view, keys, incoming.columns, insert_only
                )
            )
        finally:
            spark.catalog.dropTempView(view)
        return {"inserted": -1, "updated": -1}
    if path is None:
        raise ValueError(
            "session has no MERGE-capable catalog: pass path= for the "
            "parquet join-merge fallback"
        )
    if insert_only:
        return {"inserted": append_dedup(spark, incoming, path, keys),
                "updated": 0}
    return merge_upsert(spark, incoming, path, keys)
