"""Persisted unigram LM: train once, score any batch, append new
training slices WITHOUT rescanning the old corpus.

Completes the persisted-state family (LSH index: dedup_index; ANN
index: ann_index; CDC snapshot: cdc_stream) for the LM quality scorer
(corpus.lm_perplexity_score / q104): token counts are a MERGEABLE
aggregate, so incremental model maintenance is exact —
``merge(counts(A), counts(B)) == counts(A ∪ B)`` bit-for-bit, giving
append the same fresh-rebuild-equivalence contract the LSH index has.

Layout at model_dir/:
- ``counts/batch=N/`` (token, cnt)  — per-slice token counts,
  per-batch OVERWRITE partitions (replay-idempotent, the
  playbook rule for persisted appends)

The model is the SUM over batches at load time (vocabulary-sized —
one tiny agg), so append never rewrites old batches and a replayed
batch rewrites identical bytes. Scoring joins the summed model
broadcast-side exactly as q104 does.

Why not persist the summed model? Then append would need
read-modify-write of the one file — a lost-update window under
concurrent/replayed appends. Summing at load is the classic
log-structured answer; compaction (rewrite all batches as batch=0)
is an offline rebuild, same cadence as ANN quantizer retraining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens


def _slice_counts(train_docs: DataFrame) -> DataFrame:
    return (
        train_docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def build_lm_model(train_docs: DataFrame, model_dir: str) -> None:
    """Train the initial model (batch 0)."""
    _slice_counts(train_docs).write.mode("overwrite").parquet(
        f"{model_dir}/counts/batch=0"
    )


def append_to_lm_model(
    train_docs: DataFrame, model_dir: str, batch_id: int
) -> None:
    """Fold a new training slice into the model in O(batch): counts
    merge by summation, so the loaded model equals a fresh full-corpus
    build exactly. Per-batch overwrite → replays rewrite identical
    content. Caller contract: each corpus slice appears in at most one
    batch_id (slices are partitions of the corpus, not re-crawls — for
    re-crawled DOCUMENT feeds dedup upstream; counts have no doc
    identity to guard on)."""
    _slice_counts(train_docs).write.mode("overwrite").parquet(
        f"{model_dir}/counts/batch={batch_id}"
    )


def load_lm_counts(spark: SparkSession, model_dir: str) -> DataFrame:
    """The merged (token, cnt) model across all batches."""
    return (
        spark.read.option("basePath", f"{model_dir}/counts")
        .parquet(f"{model_dir}/counts")
        .groupBy("token")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def score_with_lm_model(
    docs: DataFrame, model_dir: str, buckets: int = 3
) -> DataFrame:
    """Score documents against the persisted model — identical math to
    corpus.lm_perplexity_score (add-one smoothing, decimal-summed 9dp
    logp, ntile buckets), with the model loaded instead of trained."""
    from pyspark.sql import Window

    spark = docs.sparkSession
    model = load_lm_counts(spark, model_dir)
    consts = model.agg(
        (F.sum("cnt") + F.count("*") + F.lit(1))
        .cast("double")
        .alias("denom")
    )
    para = spark.sparkContext.defaultParallelism
    tok = docs.repartition(para, "doc_id").select(
        "doc_id", F.explode(tokens("text")).alias("token")
    )
    logp = F.round(
        F.log(
            (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1)).cast("double")
            / F.col("denom")
        ),
        9,
    ).cast("decimal(18,9)")
    scored = (
        tok.join(F.broadcast(model), "token", "left")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            logp.alias("logp"),
            F.when(F.col("cnt").isNull(), 1).otherwise(0).alias("oov"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum("oov").cast("bigint").alias("oov_tokens"),
        F.round(
            -(F.sum("logp").cast("double")) / F.count("*").cast("double"),
            6,
        ).alias("avg_nll"),
    )
    w = Window.orderBy("avg_nll", "doc_id")
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "oov_tokens",
        "avg_nll",
        F.ntile(buckets).over(w).cast("int").alias("quality_bucket"),
    ).orderBy("doc_id")
