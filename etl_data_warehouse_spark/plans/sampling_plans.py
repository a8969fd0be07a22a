"""Training-data prep queries (q43-q46): deterministic splits,
stratified sampling, sequence packing, vocabulary, contamination.

All four are fully hash-checked: the split/sample hash is a salted md5
both engines compute digit-for-digit (operators/sampling.py
``hash_bucket`` ≡ ``bucket_sql``), and everything downstream is integer
arithmetic, window sums, and count aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import corpus, sampling
from ..sources.catalog import load_table

_SPLIT_B = sampling.bucket_sql("doc_id::VARCHAR", "split")
_SAMPLE_B = sampling.bucket_sql("doc_id::VARCHAR", "sample")


# --- q43: deterministic train/val/test split + stratified sampling ----------
# Zero-shuffle projection: assignment is a salted md5 of doc_id, so it
# is stable across runs AND across corpus growth (appending documents
# never reassigns existing ones). Stratified keep-rates: en 50%,
# everything else 10%, from an independent salt.

_RATES = {"en": 50}
_DEFAULT_RATE = 10


def q43_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    out = sampling.train_test_split(docs)
    out = sampling.stratified_sample_flag(out, _RATES, _DEFAULT_RATE)
    return out.select(
        "doc_id",
        "lang",
        "split_bucket",
        "split",
        "sample_bucket",
        "sampled",
    ).orderBy("doc_id")


Q43_ORACLE = f"""
SELECT doc_id, lang,
       {_SPLIT_B} AS split_bucket,
       CASE WHEN {_SPLIT_B} < 80 THEN 'train'
            WHEN {_SPLIT_B} < 90 THEN 'val'
            ELSE 'test' END AS split,
       {_SAMPLE_B} AS sample_bucket,
       {_SAMPLE_B} < (CASE WHEN lang = 'en' THEN 50 ELSE 10 END) AS sampled
FROM documents
ORDER BY doc_id
"""


# --- q44: corpus vocabulary top-k (term + document frequency) ---------------
# One token-explode + one agg shuffle; the top-k is a TakeOrdered, not
# a global sort. Ties broken by token text in both engines.

def q44_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return corpus.vocab_topk(docs, k=100)


Q44_ORACLE = """
WITH tok AS (
    SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS token
    FROM documents
),
v AS (
    SELECT token,
           COUNT(*)               AS term_freq,
           COUNT(DISTINCT doc_id) AS doc_freq
    FROM tok GROUP BY 1
),
top AS (SELECT * FROM v ORDER BY term_freq DESC, token LIMIT 100)
SELECT row_number() OVER (ORDER BY term_freq DESC, token)::INT AS rank,
       token, term_freq, doc_freq,
       doc_freq::DOUBLE / (SELECT COUNT(*) FROM documents)::DOUBLE AS df_ratio
FROM top
ORDER BY rank
"""


# --- q45: sequence packing (concatenate-then-chop into token chunks) --------
# Running-sum window inside each corpus shard (source) — one shuffle on
# the shard key, never a global window. A doc starting at running
# offset o lands in chunk o div 512, offset o % 512.

_BUDGET = 512


def q45_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return sampling.sequence_packing(docs, budget=_BUDGET).orderBy("doc_id")


Q45_ORACLE = f"""
WITH t AS (
    SELECT doc_id, source,
           len(string_split_regex(trim(text), ' +'))::BIGINT AS n_tokens
    FROM documents
),
packed AS (
    SELECT doc_id, source, n_tokens,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0)::BIGINT AS chunk_offset
    FROM t
)
SELECT doc_id, source, n_tokens, chunk_offset,
       chunk_offset // {_BUDGET}          AS chunk_in_shard,
       (chunk_offset % {_BUDGET})::BIGINT AS offset_in_chunk
FROM packed
ORDER BY doc_id
"""


# --- q46: train/test contamination (benchmark-leakage scan) -----------------
# For every test-split doc: fraction of its distinct 3-gram shingles
# that occur in ANY train-split doc. Shingle-level semi-join (shuffle
# on the shingle); all test docs present (zero-shingle docs -> 0.0).

def q46_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return corpus.contamination_check(docs, n=3, threshold=0.5)


Q46_ORACLE = f"""
WITH split AS (
    SELECT doc_id, text,
           CASE WHEN {_SPLIT_B} < 80 THEN 'train'
                WHEN {_SPLIT_B} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
),
docs AS (
    SELECT doc_id, split, string_split_regex(trim(text), ' +') AS toks
    FROM split
),
sh AS (
    SELECT doc_id, split,
           unnest(list_distinct(
               CASE WHEN len(toks) >= 3
                    THEN list_transform(generate_series(1, len(toks) - 2),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                    ELSE [] END)) AS shingle
    FROM docs
),
train_set AS (SELECT DISTINCT shingle FROM sh WHERE split = 'train'),
test_sh AS (SELECT doc_id, shingle FROM sh WHERE split = 'test'),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM test_sh GROUP BY 1),
hits AS (
    SELECT doc_id, COUNT(*) AS n_contaminated
    FROM test_sh SEMI JOIN train_set USING (shingle)
    GROUP BY 1
)
SELECT b.doc_id,
       COALESCE(s.n_shingles, 0)::BIGINT     AS n_shingles,
       COALESCE(h.n_contaminated, 0)::BIGINT AS n_contaminated,
       CASE WHEN COALESCE(s.n_shingles, 0) > 0
            THEN COALESCE(h.n_contaminated, 0)::DOUBLE
                   / s.n_shingles::DOUBLE
            ELSE 0.0 END AS contamination_ratio,
       (CASE WHEN COALESCE(s.n_shingles, 0) > 0
             THEN COALESCE(h.n_contaminated, 0)::DOUBLE
                    / s.n_shingles::DOUBLE
             ELSE 0.0 END) >= 0.5 AS is_contaminated
FROM (SELECT doc_id FROM split WHERE split = 'test') b
LEFT JOIN sizes s USING (doc_id)
LEFT JOIN hits h USING (doc_id)
ORDER BY doc_id
"""


# --- q88: weighted sampling without replacement (Efraimidis-Spirakis) -------
# 1000 orders drawn with probability proportional to o_totalprice, via
# deterministic hashed uniforms (ln(u)/w priority, top-k). Zero-shuffle
# projection + TakeOrdered; both engines compute the identical md5
# uniform, so the picked set hash-matches.

_WS_K = 1000


def q88_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(
        spark, "orders", sf_dir,
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    return sampling.weighted_sample_topk(
        orders, "o_totalprice", _WS_K, key="o_orderkey"
    ).orderBy("o_orderkey")


Q88_ORACLE = f"""
SELECT * FROM (
  {sampling.weighted_sample_sql(
      "(SELECT o_orderkey, o_custkey, o_totalprice FROM orders)",
      "o_totalprice", _WS_K, "o_orderkey")}
) ORDER BY o_orderkey
"""



# --- q144: stratified sample with largest-remainder apportionment ------------


def q144_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional stratified sampling with EXACT integer
    apportionment (largest-remainder / Hamilton method) and
    deterministic within-stratum selection — how eval/calibration sets
    are cut from a corpus so every stratum is represented in exact
    proportion with a reproducible member list:

    - global target n = N div 10; stratum quota = n*N_h; base =
      quota div N; the n - Σbase leftover units go to the largest
      remainders (ties -> priority asc) — pure BIGINT arithmetic, so
      Σ alloc == n EXACTLY (float-proportional rounding can be off by
      several units and differs across engines);
    - within a stratum the sample is the alloc_n smallest md5 ranks
      ((hash, key) total order) — the q43/q88 seeded-hash policy, so
      membership is stable under re-runs and engine changes.

    The apportionment happens on the STRATUM-GRAIN frame (5 rows; the
    global sums fold in as all-rows window sums, never a second agg of
    the fact — the q122 totals rule); the fact contributes one count
    agg and one per-stratum rank window. Sample membership is
    fingerprinted per stratum (sum/min/max of selected keys) so the
    gate pins the exact member set without a row-per-member result.

    Reference scope: the reference has no sampling surface at all
    (reference: transformers/data_transformer.py is cleaning/derivation
    only); brief extension — deterministic stratified eval/calibration
    set construction for the training-data pipeline."""
    orders = load_table(
        spark, "orders", sf_dir, columns=["o_orderkey", "o_orderpriority"]
    )
    wall = Window.partitionBy()
    strata = (
        orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("stratum_n"))
        .withColumn("total_n", F.sum("stratum_n").over(wall).cast("long"))
        .withColumn("target_n", F.expr("total_n div 10").cast("long"))
        .withColumn(
            "base_n",
            F.expr("(target_n * stratum_n) div total_n").cast("long"),
        )
        .withColumn(
            "rem",
            F.expr("(target_n * stratum_n) % total_n").cast("long"),
        )
        .withColumn(
            "leftover",
            (F.col("target_n") - F.sum("base_n").over(wall)).cast("long"),
        )
        .withColumn(
            "rem_rank",
            F.row_number().over(
                Window.orderBy(
                    F.col("rem").desc(), F.col("o_orderpriority").asc()
                )
            ),
        )
        .withColumn(
            "alloc_n",
            (
                F.col("base_n")
                + F.when(F.col("rem_rank") <= F.col("leftover"), 1)
                .otherwise(0)
            ).cast("long"),
        )
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(F.concat(F.lit("ssamp"), F.col("o_orderkey").cast("string"))),
        F.col("o_orderkey"),
    )
    picked = (
        orders.withColumn("rn", F.row_number().over(w))
        .join(
            F.broadcast(strata.select("o_orderpriority", "alloc_n")),
            "o_orderpriority",
        )
        .filter(F.col("rn") <= F.col("alloc_n"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("picked_n"),
            F.sum("o_orderkey").cast("long").alias("sum_keys"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )
    return (
        strata.select("o_orderpriority", "stratum_n", "alloc_n")
        .join(picked, "o_orderpriority")
        .orderBy("o_orderpriority")
    )


Q144_ORACLE = """
WITH strata0 AS (
    SELECT o_orderpriority, COUNT(*)::BIGINT AS stratum_n FROM orders
    GROUP BY 1
),
strata1 AS (
    SELECT *,
           SUM(stratum_n) OVER ()::BIGINT AS total_n
    FROM strata0
),
strata2 AS (
    SELECT *,
           (total_n // 10)::BIGINT AS target_n,
           (((total_n // 10) * stratum_n) // total_n)::BIGINT AS base_n,
           (((total_n // 10) * stratum_n) % total_n)::BIGINT AS rem
    FROM strata1
),
strata3 AS (
    SELECT *,
           (target_n - SUM(base_n) OVER ())::BIGINT AS leftover,
           row_number() OVER (
               ORDER BY rem DESC, o_orderpriority ASC) AS rem_rank
    FROM strata2
),
alloc AS (
    SELECT o_orderpriority, stratum_n,
           (base_n + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END)
               ::BIGINT AS alloc_n
    FROM strata3
),
ranked AS (
    SELECT o_orderpriority, o_orderkey,
           row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY md5('ssamp' || o_orderkey::VARCHAR), o_orderkey
           ) AS rn
    FROM orders
),
picked AS (
    SELECT r.o_orderpriority,
           COUNT(*)::BIGINT AS picked_n,
           SUM(r.o_orderkey)::BIGINT AS sum_keys,
           MIN(r.o_orderkey) AS min_key,
           MAX(r.o_orderkey) AS max_key
    FROM ranked r JOIN alloc a USING (o_orderpriority)
    WHERE r.rn <= a.alloc_n
    GROUP BY 1
)
SELECT a.o_orderpriority, a.stratum_n, a.alloc_n,
       p.picked_n, p.sum_keys, p.min_key, p.max_key
FROM alloc a JOIN picked p USING (o_orderpriority)
ORDER BY a.o_orderpriority
"""


# --- q162: packing-efficiency report (the q45 telemetry) --------------------
# Per-shard chunks used / tail waste / chunks a naive pad-per-doc
# scheme would need — the report that justifies concat-then-chop
# packing. Ceil divisions written as (x + b - 1) div b (positive
# operands: truncating Spark `div` == flooring DuckDB `//`); waste_pct
# is the only double, an identical int/int division in both engines.

def q162_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return sampling.packing_efficiency(docs, budget=_BUDGET)


Q162_ORACLE = f"""
WITH t AS (
    SELECT source AS shard,
           len(string_split_regex(trim(text), ' +'))::BIGINT AS n_tokens
    FROM documents
),
agg AS (
    SELECT shard,
           COUNT(*)::BIGINT AS n_docs,
           SUM(n_tokens)::BIGINT AS total_tokens,
           ((SUM(n_tokens) + {_BUDGET - 1}) // {_BUDGET})::BIGINT
               AS n_chunks,
           SUM((n_tokens + {_BUDGET - 1}) // {_BUDGET})::BIGINT
               AS padded_chunks
    FROM t GROUP BY shard
)
SELECT shard, n_docs, total_tokens, n_chunks,
       (n_chunks * {_BUDGET} - total_tokens)::BIGINT AS tail_waste,
       CASE WHEN n_chunks > 0
            THEN (n_chunks * {_BUDGET} - total_tokens)::DOUBLE
                 / (n_chunks * {_BUDGET})::DOUBLE
            ELSE 0.0 END AS waste_pct,
       padded_chunks,
       (padded_chunks - n_chunks)::BIGINT AS chunks_saved
FROM agg
ORDER BY shard
"""


QUERIES = {
    "q144_stratified_sample": q144_stratified_sample,
    "q43_train_test_split": q43_train_test_split,
    "q44_vocab_topk": q44_vocab_topk,
    "q45_sequence_packing": q45_sequence_packing,
    "q46_contamination": q46_contamination,
    "q88_weighted_sample": q88_weighted_sample,
    "q162_packing_efficiency": q162_packing_efficiency,
}

ORACLES = {
    "q144_stratified_sample": Q144_ORACLE,
    "q43_train_test_split": Q43_ORACLE,
    "q44_vocab_topk": Q44_ORACLE,
    "q45_sequence_packing": Q45_ORACLE,
    "q46_contamination": Q46_ORACLE,
    "q88_weighted_sample": Q88_ORACLE,
    "q162_packing_efficiency": Q162_ORACLE,
}
