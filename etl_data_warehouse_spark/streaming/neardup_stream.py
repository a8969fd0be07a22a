"""Streaming near-duplicate materializer: dedup a document stream
against the PERSISTED MinHash-LSH index, then make each batch part of
the corpus.

The batch operator family (operators/dedup_index.py) already gives the
100 TB daily-crawl shape — per-batch cost O(batch), never O(corpus);
this module is its Structured Streaming driver:

    readStream(documents dir)
      → foreachBatch:
          1. anti-join away doc_ids already indexed (replay/idempotency
             guard AND re-crawl suppression)
          2. incremental_dedup(batch vs index): exact-Jaccard-verified
             near-dup pairs touching the batch
          3. write pairs to pairs_dir/batch_id=N (OVERWRITE — a
             replayed microbatch rewrites the same deterministic
             content instead of appending duplicates)
          4. append_to_index(batch) — after the pair write, so a crash
             between 3 and 4 replays into a still-unindexed batch and
             recomputes the same pairs; a crash after 4 replays into an
             indexed batch, which step 1 reduces to a no-op (its pairs
             are already on disk from step 3)

Exactly-once effectiveness without a transactional sink: every step is
either idempotent (1, 3, 4 — ``append_to_index(skip_indexed=True)``
anti-joins re-appends away) or deterministic given the batch (2), and
the ordering guarantees the index never contains a batch whose pairs
were not written first.

The reference has no incremental near-dedup at all (its dedup is a
pandas drop_duplicates, reference: transformers/data_transformer.py:39,
:92, :144); SURVEY.md §2.9's streaming-twin rule is applied to the
brief's training-data extension here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import JACCARD_THRESHOLD
from ..operators.dedup_index import (
    _read_shingles,
    append_to_index,
    incremental_dedup,
)
from .corpus_stream import read_document_stream


def read_neardup_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """All near-dup pairs materialized so far (across microbatches)."""
    return (
        spark.read.option("basePath", pairs_dir)
        .parquet(pairs_dir)
        .drop("batch_id")
    )


def start_neardup_stream(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    threshold: float = JACCARD_THRESHOLD,
    bands_table: str | None = None,
    shingles_table: str | None = None,
    buckets: int | None = None,
    table_prefix: str | None = None,
    available_now: bool = True,
    max_files: int = 16,
):
    """Start (or drain with AvailableNow) the near-dup materializer.

    The index at ``index_dir`` must exist (build_minhash_index) — the
    empty-corpus bootstrap is a plain build, not a streaming concern.
    Pass ``buckets``/``table_prefix`` when the index is bucketed so
    appends preserve the Exchange-free join layout.
    """

    def dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        # 1. replay/re-crawl guard: only genuinely new docs proceed
        indexed = (
            _read_shingles(
                sess, index_dir,
                f"{table_prefix}_shingles" if table_prefix else shingles_table,
            )
            .select("doc_id")
            .distinct()
        )
        fresh = batch_df.join(indexed, "doc_id", "left_anti").localCheckpoint()
        if not fresh.take(1):
            return
        # 2. near-dup pairs of this batch vs (corpus ∪ batch)
        pairs = incremental_dedup(
            sess,
            fresh,
            index_dir,
            threshold=threshold,
            bands_table=(
                f"{table_prefix}_bands" if table_prefix else bands_table
            ),
            shingles_table=(
                f"{table_prefix}_shingles" if table_prefix else shingles_table
            ),
        )
        # 3. deterministic per-batch output path → replay-idempotent
        pairs.write.mode("overwrite").parquet(
            f"{pairs_dir}/batch_id={batch_id}"
        )
        # 4. the batch joins the corpus (idempotent via skip_indexed)
        append_to_index(
            fresh,
            index_dir,
            buckets=buckets,
            table_prefix=table_prefix,
        )

    writer = (
        read_document_stream(spark, input_dir, max_files=max_files)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(dedup_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
