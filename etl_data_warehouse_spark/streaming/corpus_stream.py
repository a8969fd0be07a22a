"""Structured Streaming twin of the corpus cleaning funnel (q52).

A pretraining corpus is ingested continuously, not in one batch; the
cleaning gates are stateless projections, so they stream as-is:

    readStream(documents dir)
      → language + quality gates (plans/mixture.py semantics)
      → per-batch canonical dedup (min doc_id per fingerprint)
      → foreachBatch append_dedup sink (cross-batch ON CONFLICT DO
        NOTHING on the fingerprint)

Cross-batch dedup state lives in the SINK, not in streaming state: the
fingerprint anti-join against the already-written table is bounded by
the output (which a 100 TB pipeline keeps anyway), so there is no
unbounded dropDuplicates state and no watermark requirement on a
timestamp-less corpus. First-arrived fingerprint wins — identical to
the batch funnel's min-doc_id canonicalization whenever ingestion is
doc_id-ordered (the test proves batch == streaming on a split corpus).

100 TB posture: each microbatch shuffles once on the fingerprint (the
batch-local dedup window); the sink anti-join is one broadcast/SMJ per
batch against fingerprint-bucketed output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import punct_count, stopword_hits, token_count

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_document_stream(
    spark: SparkSession, input_dir: str, max_files: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def clean_document_stream(docs: DataFrame) -> DataFrame:
    """The q52 language + quality gates as stateless streaming
    projections; emits surviving docs with their fingerprint."""
    tc = token_count("text")
    stop_ratio = stopword_hits("text").cast("double") / tc.cast("double")
    punct_ratio = punct_count("text").cast("double") / F.length("text").cast(
        "double"
    )
    quality = (
        stop_ratio * 0.5
        + (F.lit(1.0) - punct_ratio) * 0.3
        + F.when(tc.between(20, 500), 0.2).otherwise(0.0)
    )
    return (
        docs.filter(F.col("lang") == "en")
        .filter(quality >= 0.35)
        .select(
            "doc_id",
            "text",
            "lang",
            "source",
            tc.alias("n_tokens"),
            F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"),
        )
    )


def start_corpus_clean_stream(
    spark: SparkSession,
    input_dir: str,
    output_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Run the streaming funnel; each microbatch is canonicalized
    (min doc_id per fingerprint) then appended with sink-side dedup."""
    from ..sources.sinks import append_dedup

    cleaned = clean_document_stream(read_document_stream(spark, input_dir))

    def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy("fingerprint").orderBy("doc_id")
        canonical = (
            batch_df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        append_dedup(
            batch_df.sparkSession,
            canonical,
            output_path,
            keys=["fingerprint"],
        )

    writer = (
        cleaned.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
