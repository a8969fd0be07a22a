"""Streaming ANN materializer: index an embedding stream against the
PERSISTED IVF-PQ index and materialize each batch's nearest neighbors.

Streaming twin of ``operators/ann_index.py`` — the embedding analogue
of ``neardup_stream``: per batch the cost is O(batch) encode/assign +
a probe-bounded ADC scan, never O(corpus).

    readStream(embeddings dir)
      → foreachBatch:
          1. fresh = batch anti-joined against packed ∪ assigned ids
             of OTHER batches (re-crawl suppression; probing the UNION
             means an id half-written by a crashed batch is skipped by
             later batches yet completed by its own replay — the same
             guard rule as ann_index.append_to_ivf_index, whose own
             batch is likewise excluded so replays always re-process)
          2. append_to_ivf_index(fresh, batch_id=N) — frozen quantizer
             state, per-batch overwrite partitions
          3. write fresh raw vectors to vectors_dir/batch=N
             (overwrite — the corpus-of-record the refine stage reads)
          4. query_ivf_pq_index(all vectors, fresh as queries, k) and
             write the neighbor lists to neighbors_dir/batch=N
             (overwrite) — within-batch neighbors are found because
             step 2 ran first

Exactly-once effectiveness without a transactional sink: EVERY write
is a per-batch overwrite of deterministic content, so replays rewrite
byte-identical data. Write order matters: the index commit PRECEDES
the raw-vector write, so an id can only appear in vectors_dir if its
index rows committed — a crash anywhere leaves either nothing (later
batches adopt the ids; the replay's empty fresh set is correct) or an
indexed-but-vectorless batch (later batches skip those ids, and only
the replay — which excludes its own partitions from the guard —
rewrites everything). The reverse order would let a crashed batch
leak stale raw vectors that a later batch re-adopts, duplicating
refine candidates. Bootstrap: ``build_ivf_pq_index`` on the existing
corpus (and its raw vectors copied to vectors_dir/batch=0) — training
is a batch concern, exactly like the LSH index build.

The reference has no vector search at all; SURVEY.md §2.9's
streaming-twin rule applied to the brief's training-data extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.ann_index import append_to_ivf_index, query_ivf_pq_index

EMBEDDING_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def read_embedding_stream(
    spark: SparkSession, input_dir: str, max_files: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(EMBEDDING_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def read_corpus_vectors(spark: SparkSession, vectors_dir: str) -> DataFrame:
    """All raw vectors ingested so far (across microbatches)."""
    return (
        spark.read.option("basePath", vectors_dir)
        .parquet(vectors_dir)
        .drop("batch")
    )


def read_ann_neighbors(spark: SparkSession, neighbors_dir: str) -> DataFrame:
    """All materialized neighbor lists so far (across microbatches)."""
    return (
        spark.read.option("basePath", neighbors_dir)
        .parquet(neighbors_dir)
        .drop("batch")
    )


def start_ann_index_stream(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    vectors_dir: str,
    neighbors_dir: str,
    checkpoint_dir: str,
    k: int = 3,
    nprobe: int = 8,
    assign_arrow: bool = False,
    available_now: bool = True,
    max_files: int = 16,
):
    """Start (or drain with AvailableNow) the ANN materializer.

    The index at ``index_dir`` must exist (build_ivf_pq_index) and
    ``vectors_dir/batch=0`` must hold the built corpus's raw vectors —
    the empty-corpus bootstrap is a plain build, not a streaming
    concern."""

    def index_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        bid = int(batch_id) + 1  # batch=0 is the bootstrap build
        from pyspark.sql import functions as F

        other = F.col("batch") != bid
        seen = (
            sess.read.option("basePath", f"{index_dir}/packed")
            .parquet(f"{index_dir}/packed")
            .filter(other)
            .select("vec_id")
            .unionByName(
                sess.read.option("basePath", f"{index_dir}/assigned")
                .parquet(f"{index_dir}/assigned")
                .filter(other)
                .select("vec_id")
            )
        )
        fresh = batch_df.join(seen, "vec_id", "left_anti").localCheckpoint()
        if not fresh.take(1):
            return
        append_to_ivf_index(
            fresh, index_dir, batch_id=bid, assign_arrow=assign_arrow
        )
        fresh.write.mode("overwrite").parquet(f"{vectors_dir}/batch={bid}")
        corpus = read_corpus_vectors(sess, vectors_dir)
        neighbors = query_ivf_pq_index(
            corpus,
            fresh,
            index_dir,
            k=k,
            nprobe=nprobe,
            assign_arrow=assign_arrow,
        )
        neighbors.write.mode("overwrite").parquet(
            f"{neighbors_dir}/batch={bid}"
        )

    writer = (
        read_embedding_stream(spark, input_dir, max_files=max_files)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(index_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
