"""Model-scored data curation: linear quality-classifier inference
(q133) and RLHF preference-pair construction (q134).

q133 is fastText-shaped classifier INFERENCE (Joulin et al. 2016,
"Bag of Tricks for Efficient Text Classification") as a pure
DataFrame plan: hashing-trick unigram features (md5 -> 2^16 buckets),
a broadcast weight table joined on the bucket, and the document score
as the mean feature weight — the exact shape CCNet/GPT-3-style
quality filtering runs over every crawled document ("does a linear
model think this looks like the target corpus?"). The weights here
are derived deterministically from the bucket id (md5 milli-units in
[-1000, 1000]) because no trained artifact ships with the repo — the
PLUMBING (featurize, broadcast the model, score, threshold) is what
the query proves; swapping in trained weights is a parquet write.
All score math is BIGINT milli-units (exact both engines); the one
double is the mean-weight divide at the output boundary.

q134 builds preference pairs (chosen, rejected) per prompt group by
best-of-n under a reward score — the RLHF/DPO data-prep step — using
q133's logit as the reward model and doc_id div N as the prompt
group. Both extrema use fully deterministic tiebreaks (best: logit
DESC, doc_id ASC; worst: logit ASC, doc_id DESC — so an all-tied
group still yields two DISTINCT documents), groups of one candidate
are dropped, and margin = chosen - rejected is BIGINT.

Scale shape: q133 is one explode + one broadcast join + one doc-grain
agg (the weight table is 2^16 rows — always broadcastable; a real
300M-bucket model would bucket-partition both sides instead). q134
adds one prompt-grain shuffle over doc-grain rows with
WindowGroupLimit pruning via row_number() = 1. No Python UDFs, no
driver-side loops.

Reference scope: the reference has no model-scored filtering — its
quality gates are rule counts (reference: transformers/
text_transformer.py clean/tokenize; warehouse/analytics_queries.sql
aggregates). These queries extend the quality family (Q1-Q7,
operators/quality.py) to the scored-curation case a pretraining
pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources.catalog import load_table

HASH_DIM = 1 << 16  # feature buckets; collisions are part of the trick
_W_RANGE = 2001  # weight milli-units in [-1000, 1000]
_PROMPT_GROUP = 5  # q134: docs per synthetic prompt group


def _md5_mod(salt: str, key: F.Column, mod: int) -> F.Column:
    """First-8-hex md5 bucket — the operators/sampling.hash_bucket
    recipe over an arbitrary column expression."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), key)), 1, 8), 16, 10
        ).cast("long")
        % F.lit(mod)
    )


def hashed_weights(spark: SparkSession) -> DataFrame:
    """The 'model': bucket -> weight (milli-units). Deterministic
    md5-derived stand-in for trained fastText/logistic weights; always
    2^16 rows, broadcast at every scale."""
    return spark.range(HASH_DIM).select(
        F.col("id").alias("bucket"),
        (
            _md5_mod("w", F.col("id").cast("string"), _W_RANGE)
            - F.lit(1000)
        ).alias("w_milli"),
    )


def doc_logits(docs: DataFrame, weights: DataFrame) -> DataFrame:
    """Per-document classifier output: (doc_id, n_tokens, logit_milli)
    with logit = sum of hashed-unigram weights. One explode, one
    broadcast join, one doc-grain agg."""
    feats = docs.select(
        "doc_id", F.explode(tokens("text")).alias("token")
    ).select(
        "doc_id", _md5_mod("f", F.col("token"), HASH_DIM).alias("bucket")
    )
    return (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("w_milli").cast("long").alias("logit_milli"),
        )
    )


# DuckDB twin of the feature/weight derivation, inlined (the oracle
# recomputes the weight from the bucket id instead of joining a table
# — same values by construction).
_DUCK_LOGITS = """
feats AS (
    SELECT doc_id,
           (('0x' || substring(md5('f' || tok), 1, 8))::BIGINT % 65536)
               AS bucket
    FROM (
        SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
        FROM documents
    )
),
scored AS (
    SELECT doc_id,
           COUNT(*)::BIGINT AS n_tokens,
           SUM((('0x' || substring(md5('w' || bucket::VARCHAR), 1, 8))
                ::BIGINT % 2001) - 1000)::BIGINT AS logit_milli
    FROM feats
    GROUP BY doc_id
)
"""


def q133_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier inference over the corpus: hashed features, broadcast
    weight table, per-doc logit, mean token weight, and the keep/drop
    decision at threshold 0."""
    docs = load_table(spark, "documents", sf_dir)
    scored = doc_logits(docs, hashed_weights(spark))
    return scored.select(
        "doc_id",
        "n_tokens",
        "logit_milli",
        (
            F.col("logit_milli").cast("double")
            / (F.col("n_tokens") * F.lit(1000)).cast("double")
        ).alias("mean_weight"),
        (F.col("logit_milli") > 0).alias("keep"),
    ).orderBy("doc_id")


Q133_ORACLE = f"""
WITH {_DUCK_LOGITS.strip().lstrip()}
SELECT doc_id, n_tokens, logit_milli,
       logit_milli::DOUBLE / (n_tokens * 1000)::DOUBLE AS mean_weight,
       logit_milli > 0 AS keep
FROM scored
ORDER BY doc_id
"""


def q134_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-n preference pairs per prompt group under the q133
    reward: one prompt-grain shuffle, extrema via row_number with
    deterministic DISTINCT-document tiebreaks, singleton groups
    dropped. doc_id is nonnegative, so Spark ``div`` (truncating) and
    DuckDB ``//`` (flooring) agree on the group key."""
    docs = load_table(spark, "documents", sf_dir)
    scored = doc_logits(docs, hashed_weights(spark)).select(
        F.expr(f"doc_id div {_PROMPT_GROUP}").alias("prompt_id"),
        "doc_id",
        "logit_milli",
    )
    w_best = Window.partitionBy("prompt_id").orderBy(
        F.desc("logit_milli"), F.asc("doc_id")
    )
    w_worst = Window.partitionBy("prompt_id").orderBy(
        F.asc("logit_milli"), F.desc("doc_id")
    )
    ranked = scored.select(
        "prompt_id",
        "doc_id",
        "logit_milli",
        F.row_number().over(w_best).alias("rn_best"),
        F.row_number().over(w_worst).alias("rn_worst"),
        F.count(F.lit(1))
        .over(Window.partitionBy("prompt_id"))
        .cast("int")
        .alias("n_candidates"),
    ).filter(F.col("n_candidates") >= 2)
    best = ranked.filter(F.col("rn_best") == 1).select(
        "prompt_id",
        "n_candidates",
        F.col("doc_id").alias("chosen_doc_id"),
        F.col("logit_milli").alias("chosen_logit_milli"),
    )
    worst = ranked.filter(F.col("rn_worst") == 1).select(
        "prompt_id",
        F.col("doc_id").alias("rejected_doc_id"),
        F.col("logit_milli").alias("rejected_logit_milli"),
    )
    return (
        best.join(worst, "prompt_id")
        .select(
            "prompt_id",
            "n_candidates",
            "chosen_doc_id",
            "rejected_doc_id",
            "chosen_logit_milli",
            "rejected_logit_milli",
            (
                F.col("chosen_logit_milli")
                - F.col("rejected_logit_milli")
            ).alias("margin_milli"),
        )
        .orderBy("prompt_id")
    )


Q134_ORACLE = f"""
WITH {_DUCK_LOGITS.strip().lstrip()},
g AS (
    SELECT doc_id // {_PROMPT_GROUP} AS prompt_id, doc_id, logit_milli,
           row_number() OVER (
               PARTITION BY doc_id // {_PROMPT_GROUP}
               ORDER BY logit_milli DESC, doc_id ASC) AS rn_best,
           row_number() OVER (
               PARTITION BY doc_id // {_PROMPT_GROUP}
               ORDER BY logit_milli ASC, doc_id DESC) AS rn_worst,
           COUNT(*) OVER (
               PARTITION BY doc_id // {_PROMPT_GROUP})::INT
               AS n_candidates
    FROM scored
)
SELECT b.prompt_id, b.n_candidates,
       b.doc_id AS chosen_doc_id,
       w.doc_id AS rejected_doc_id,
       b.logit_milli AS chosen_logit_milli,
       w.logit_milli AS rejected_logit_milli,
       (b.logit_milli - w.logit_milli)::BIGINT AS margin_milli
FROM g b JOIN g w USING (prompt_id)
WHERE b.rn_best = 1 AND w.rn_worst = 1 AND b.n_candidates >= 2
ORDER BY prompt_id
"""


QUERIES = {
    "q133_quality_classifier": q133_quality_classifier,
    "q134_preference_pairs": q134_preference_pairs,
}
ORACLES = {
    "q133_quality_classifier": Q133_ORACLE,
    "q134_preference_pairs": Q134_ORACLE,
}
