"""External source adapters: JDBC scans and semi-structured JSON.

The reference extracts from PostgreSQL/MySQL via SQL with explicit
column lists + incremental predicates (reference: extractors/
postgres_extractor.py:18-66, mysql_extractor.py:18-66) and from MongoDB
as flat JSON documents (reference: extractors/mongo_extractor.py:19-80).

Spark twins:
- ``read_jdbc`` — the same SELECT/WHERE shape, but the predicate and
  projection are handed to the source engine by Spark's JDBC pushdown;
  ``partition_column`` splits the read into parallel range queries
  (the reference reads single-threaded). No JDBC driver ships in this
  container, so this is exercised only when a driver jar is present.
- ``read_json_documents`` — schema-on-read for document sources:
  explicit schema (no costly inference at scale), flat struct
  projection ≡ the reference's pandas flattening, `_id`-style metadata
  dropped by simply not selecting it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    columns: list[str] | None = None,
    predicate: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound=None,
    upper_bound=None,
) -> DataFrame:
    """Parallel JDBC scan with pushdown (S1-S4 twin).

    The incremental WHERE of the reference becomes ``predicate``; Spark
    pushes both it and the column projection into the remote engine.
    """
    projection = ", ".join(columns) if columns else "*"
    query = f"SELECT {projection} FROM {table}"
    if predicate:
        query += f" WHERE {predicate}"
    reader = spark.read.format("jdbc").option("url", url).option(
        "query", query
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()


def read_json_documents(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    drop_fields: tuple[str, ...] = ("_id",),
    predicate: Column | None = None,
) -> DataFrame:
    """Schema-on-read document ingestion (S5-S6 twin).

    Explicit schema (never inferSchema at scale), flatten by selecting
    the declared fields, drop Mongo-ish metadata by omission, apply the
    incremental predicate so it prunes at the scan."""
    df = spark.read.schema(schema).json(path)
    keep = [f.name for f in schema.fields if f.name not in drop_fields]
    df = df.select(*keep)
    if predicate is not None:
        df = df.filter(predicate)
    return df


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
    quarantine_malformed: bool = True,
) -> tuple[DataFrame, DataFrame | None]:
    """CSV ingestion with malformed-row quarantine (the reference's
    pandas ``read_csv`` + dropna cleaning, done scale-safe).

    Explicit schema (never inferSchema at scale — it double-reads).
    PERMISSIVE mode captures unparseable lines in ``_corrupt_record``;
    returns (clean_rows, quarantined_rows) so bad lines are auditable
    instead of silently dropped. Pass ``quarantine_malformed=False``
    for a plain single-frame read.
    """
    full_schema = T.StructType(
        schema.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    df = (
        spark.read.schema(full_schema if quarantine_malformed else schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    if not quarantine_malformed:
        return df, None
    # caching avoids the double-scan Spark needs to resolve the
    # corrupt-record column across the split
    df = df.cache()
    keep = [f.name for f in schema.fields]
    clean = df.filter(F.col("_corrupt_record").isNull()).select(*keep)
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    return clean, bad


def write_orc(df: DataFrame, path: str, compression: str = "zstd") -> None:
    """ORC sink — the columnar interchange format for Hive-side
    consumers (parquet stays the native format, sinks.py). zstd default
    matches the parquet sink's codec posture."""
    df.write.mode("overwrite").option("compression", compression).orc(path)


def read_orc(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """ORC scan with explicit projection (column pruning reaches the
    ORC reader exactly as it does parquet)."""
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df
