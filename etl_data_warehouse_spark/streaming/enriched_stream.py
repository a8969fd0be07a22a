"""Stream-static enrichment join: streaming facts × static dimension.

The streaming twin of the batch fact-assembly FK resolution
(reference: dbt_warehouse/models/marts/fact_orders.sql:14-20 left-joins
the customer dim at load time). In streaming form the dimension is a
STATIC DataFrame: Spark re-resolves it per microbatch, so a dim refresh
between triggers is picked up without restarting the query — the
streaming analog of the reference's daily dim-load-before-fact-load
ordering (etl_daily_pipeline.py task graph).

100 TB posture:
- The dim side is broadcast (stream-static joins can't shuffle the
  unbounded side into a static hash table any other way) — explicit
  ``F.broadcast`` keeps the planner honest at any stats quality.
- Enrich FIRST, then window-aggregate: the groupBy is keyed on
  (window, segment) — cardinality segments × days, map-side partial
  aggs, watermark-bounded state.
- Unmatched stream rows are kept (left join) under segment 'UNKNOWN':
  an orphan fact must surface in the rollup, not vanish (same policy as
  the batch orphan-detection path, plans/warehouse.py q11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.numeric import dec

ENRICH_ORDER_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.LongType()),
        T.StructField("customer_id", T.LongType()),
        T.StructField("order_ts", T.TimestampType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def read_enrich_order_stream(
    spark: SparkSession, input_dir: str, max_files: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(ENRICH_ORDER_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def enrich_orders(orders: DataFrame, customers: DataFrame) -> DataFrame:
    """Left-broadcast the static customer dim onto the (possibly
    streaming) orders frame; orphans get segment 'UNKNOWN'."""
    dim = customers.select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return orders.join(F.broadcast(dim), "customer_id", "left").withColumn(
        "segment", F.coalesce("segment", F.lit("UNKNOWN"))
    )


def segment_revenue_aggregate(
    enriched: DataFrame, watermark: str = "1 day"
) -> DataFrame:
    """Daily revenue by customer market segment over the enriched feed."""
    return (
        enriched.withWatermark("order_ts", watermark)
        .groupBy(F.window("order_ts", "1 day").alias("day"), "segment")
        .agg(
            F.sum(dec("amount")).cast("double").alias("revenue"),
            F.count("*").alias("order_count"),
        )
        .select(
            F.to_date(F.col("day.start")).alias("sales_date"),
            "segment",
            "revenue",
            "order_count",
        )
    )


def start_enriched_stream(
    spark: SparkSession,
    input_dir: str,
    customers: DataFrame,
    output_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Run the enrichment + rollup, upserting each microbatch on
    (sales_date, segment)."""
    from ..sources.sinks import merge_upsert

    agg = segment_revenue_aggregate(
        enrich_orders(read_enrich_order_stream(spark, input_dir), customers)
    )

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert(
            batch_df.sparkSession,
            batch_df,
            output_path,
            keys=["sales_date", "segment"],
        )

    writer = (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(upsert_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
