"""End-to-end training-data pipeline: the corpus twin of the warehouse
DAG (plans/pipeline.py).

clean/gate → exact-dedup → split/sample → eval-set decontamination →
pack → contamination audit → mixture report, as one lazy Spark program
with idempotent sinks:

- gates reuse the streaming funnel's stateless projections
  (streaming/corpus_stream.py ≡ q52 semantics), so batch and streaming
  ingestion produce byte-identical survivors;
- the deduped corpus lands via ``append_dedup`` keyed on the content
  fingerprint — re-running a day is absorbed by the sink (the same ON
  CONFLICT DO NOTHING twin the warehouse facts use);
- split/sample/pack are zero-or-one-shuffle operators
  (operators/sampling.py) whose assignments are hash-stable, so a
  re-run never moves a document between train and test;
- the audit dict mirrors the warehouse pipeline's etl_run_log twin.

100 TB posture: one fingerprint shuffle (dedup), one shard shuffle
(packing), one shingle shuffle (contamination) — everything else is
projection. Each stage reads the previous stage's Parquet, so a stage
can be re-run alone.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..operators import corpus, sampling
from ..sources.catalog import load_table
from ..sources.sinks import append_dedup
from ..streaming.corpus_stream import clean_document_stream
from .text_quality import decontaminate_spans


def run_corpus_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    pack_budget: int = 512,
    contamination_threshold: float = 0.5,
    curate: bool = False,
    domain_cap: int | None = None,
) -> dict:
    """Run the corpus pipeline into ``out_dir``; returns the audit
    summary. Idempotent: re-running changes nothing.

    ``curate=True`` prepends the URL/domain curation stage (q148/q149
    semantics, plans/web_curation.curate_documents): blocklisted hosts
    dropped and, with ``domain_cap``, at most that many docs kept per
    host — the position URL filtering holds in a real crawl pipeline.
    The audit then carries ``curation_dropped``."""
    os.makedirs(out_dir, exist_ok=True)
    started = datetime.datetime.now()
    docs = load_table(spark, "documents", sf_dir)
    n_ingested = docs.count()
    curation_dropped = 0
    if curate:
        from .web_curation import curate_documents

        # stage pattern (module docstring): persist the curated corpus
        # and read it back, so the audit count AND every downstream
        # consumer read the materialized stage — counting the lazy
        # frame would re-run the host-keyed curation shuffle once per
        # consumer (r9 self-review finding)
        curated_path = os.path.join(out_dir, "curated_documents")
        curate_documents(docs, domain_cap=domain_cap).drop(
            "host"
        ).write.mode("overwrite").parquet(curated_path)
        docs = spark.read.parquet(curated_path)
        curation_dropped = n_ingested - docs.count()

    # --- gate + canonical dedup into the clean-corpus sink -------------
    cleaned = clean_document_stream(docs)  # stateless: batch == stream
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    canonical = (
        cleaned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    clean_path = os.path.join(out_dir, "clean_documents")
    n_new = append_dedup(spark, canonical, clean_path, keys=["fingerprint"])
    clean = spark.read.parquet(clean_path)
    n_clean = clean.count()

    # --- deterministic split + stratified sample ------------------------
    split = sampling.train_test_split(clean)
    split = sampling.stratified_sample_flag(split, {"en": 50}, 10)
    split_path = os.path.join(out_dir, "splits")
    split.write.mode("overwrite").parquet(split_path)
    split = spark.read.parquet(split_path)

    # --- eval-set decontamination of the train split --------------------
    # Before anything is packed/sharded, cut every train-side token span
    # covered by an 8-gram of the HELD-OUT test split (q128 semantics:
    # the q95 span-cut pointed at the eval set) — written shards are
    # provably free of eval n-grams (tests/test_decontamination.py).
    train_raw = split.filter(F.col("split") == "train")
    eval_docs = split.filter(F.col("split") == "test").select(
        "doc_id", "text"
    )
    decon = decontaminate_spans(
        train_raw.select("doc_id", "text"), eval_docs
    )
    train = train_raw.drop("text", "n_tokens").join(
        decon.select(
            "doc_id",
            F.col("clean_text").alias("text"),
            "n_removed",
        ),
        "doc_id",
    ).withColumn("n_tokens", token_count("text"))
    decon_path = os.path.join(out_dir, "train_decontaminated")
    train.write.mode("overwrite").parquet(decon_path)
    train = spark.read.parquet(decon_path)
    spans_removed = train.agg(
        F.coalesce(F.sum("n_removed"), F.lit(0)).cast("long")
    ).collect()[0][0]

    # --- pack the train split into fixed-token chunks -------------------
    packed = sampling.sequence_packing(train, budget=pack_budget)
    packed_path = os.path.join(out_dir, "packed_train")
    packed.write.mode("overwrite").parquet(packed_path)

    # --- contamination audit over the clean corpus ----------------------
    contaminated = (
        corpus.contamination_check(
            clean, threshold=contamination_threshold
        )
        .filter(F.col("is_contaminated"))
        .count()
    )

    # --- mixture report --------------------------------------------------
    mixture = train.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_tokens")).alias("n_tokens"),
    )
    mixture_path = os.path.join(out_dir, "train_mixture")
    mixture.write.mode("overwrite").parquet(mixture_path)

    split_counts = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n_chunks = (
        spark.read.parquet(packed_path)
        .select("source", "chunk_in_shard")
        .distinct()
        .count()
    )
    return {
        "started": started.isoformat(),
        "finished": datetime.datetime.now().isoformat(),
        "records_ingested": n_ingested,
        "curation_dropped": curation_dropped,
        "new_clean_docs": n_new,
        "clean_corpus_size": n_clean,
        "split_counts": split_counts,
        "train_chunks": n_chunks,
        "contaminated_test_docs": contaminated,
        "decontaminated_tokens_removed": int(spans_removed),
        "status": "SUCCESS",
    }
