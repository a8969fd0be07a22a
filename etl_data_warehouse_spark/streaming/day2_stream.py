"""Structured Streaming twin of the COMPOSED day-2 ingest pipeline —
the engine's answer to the reference's daily DAG trigger
(reference: airflow/dags/etl_daily_pipeline.py:352 ``@daily``): instead
of cron-invoking the batch entry point, a running stream watches the
crawl-drop directory and drives the WHOLE chain
(plans/day2_pipeline.run_day2_ingest — curation cap → clean funnel →
incremental MinHash + semantic dedup vs persisted indexes → cluster
maintenance → index/vector/shard appends) once per arriving batch of
files via ``foreachBatch``.

Nothing is re-implemented here: the sink calls the SAME
``run_day2_ingest`` the batch/cron entry point uses, so the two
orchestration styles cannot diverge (the cap_and_write_batch sharing
discipline, lifted to the whole pipeline). What the stream adds:

- batch ids come from the streaming epoch (checkpoint-tracked), so a
  crashed microbatch is RE-DELIVERED under the same id and lands on
  run_day2_ingest's replay idempotency (every sink overwrite-by-batch
  or guarded — pinned by tests/test_day2_pipeline.py);
- the embeddings side is re-read per batch from ``vectors_dir`` and
  semi-joined to the batch's doc_ids — stream-static enrichment, so
  vectors may land on their own cadence as long as a doc's vector
  arrives no later than its text (run_day2_ingest raises on missing
  coverage rather than silently skipping the semantic arm).

Ordering contract: the file source delivers oldest-first (mod time);
the pipeline's id discipline ("earlier == smaller doc_id") therefore
holds exactly when crawl files land in doc_id order — the same
discipline the cron'd batch caller owns, stated here because the
stream makes it ambient rather than per-call.

Equality contract (tests/test_day2_stream.py): a drained stream over
day-files == the same days driven through run_day2_ingest by hand,
bit-for-bit across every state table (shards, clean sink, clusters,
indexes); a restart under the SAME checkpoint processes only files
that arrived since (incremental resume), and a re-drain with nothing
new is a no-op.

KEEP THE CHECKPOINT. Replay safety means crash-replay of an epoch the
checkpoint still owns — every sink re-decides that batch identically.
It does NOT mean historical re-delivery: wiping the checkpoint
re-delivers old days against ADVANCED state, and the as-of-day keep
rule then re-decides them under the CURRENT cluster mapping — day-1
keepers since dethroned by a day-2 merge (or, with the containment
arm on, named as the inner of a later superset's containment pair)
get dropped from the rewritten batch=1 shards. (That rewrite actually equals the one-shot
rebuild's keeps — the same repair shard compaction performs — but it
mutates shipped shards as a side effect, which is exactly what the
immutable-sink contract exists to forbid. Compact deliberately with
sources/shards.compact_training_shards instead.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.day2_pipeline import run_day2_ingest
from .corpus_stream import read_document_stream


def start_day2_stream(
    spark: SparkSession,
    input_dir: str,
    vectors_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    max_files: int = 1,
    **pipeline_cfg,
):
    """Drive the composed day-2 chain from a readStream over the
    crawl-drop directory. Returns the StreamingQuery (availableNow
    trigger — drain current files, then stop; run under a timed
    trigger in production). ``pipeline_cfg`` forwards to
    run_day2_ingest (config-pinned at bootstrap as usual).

    ``max_files`` defaults to 1 — one crawl FILE per microbatch, so
    each logical day gets its own batch_id and the curated/vectors
    ``batch=N`` partitions and cross-day domain-cap sequencing are
    IDENTICAL to driving run_day2_ingest per day by hand (the
    bit-for-bit equality contract in tests/test_day2_stream.py is
    pinned at this value). Raising it coalesces several day-files into
    ONE microbatch: still correct and replay-safe, but the coalesced
    days share one batch_id — state-table partition layout and the
    within-batch cap ordering then differ from the per-day batch
    driver (one drain == one logical day made of several files, not
    day-per-file)."""
    stream = read_document_stream(spark, input_dir, max_files=max_files)

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        vecs = spark.read.parquet(vectors_dir).join(
            batch_df.select(F.col("doc_id").alias("vec_id")),
            "vec_id",
            "left_semi",
        )
        run_day2_ingest(
            batch_df,
            vecs,
            state_dir,
            batch_id=int(batch_id) + 1,
            **pipeline_cfg,
        )

    return (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
