"""Text-hygiene queries (q48-q49): PII scrubbing and repetition stats.

q48 redacts emails/SSNs/phones with shared regexes
(functions/text.py PII_PATTERNS) and hash-checks the md5 of every
redacted document — the synthetic corpus contains ~no PII, so the
planted-PII cross-engine test (tests/test_text_quality.py) is the
behavioral proof and the oracle is the plumbing proof. q49 computes
per-document repetition / lexical-diversity signals, the standard
boilerplate-detection features of a pretraining quality filter.

Scale: q48 is a pure projection (zero shuffles). q49 is one explode +
one (doc_id, token) aggregation + a per-document top-1 window — all
partitioned by doc_id, never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import PII_PATTERNS, pii_count, redact_pii, tokens
from ..operators import corpus
from ..sources.catalog import load_table


def q48_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    out = docs.select(
        "doc_id",
        *[
            pii_count("text", pattern).alias(f"n_{name}")
            for name, pattern, _ in PII_PATTERNS
        ],
        F.md5(redact_pii("text")).alias("redacted_md5"),
    )
    total = sum(F.col(f"n_{name}") for name, _, _ in PII_PATTERNS)
    return out.withColumn("was_redacted", total > 0).orderBy("doc_id")


def _q48_oracle() -> str:
    counts = ",\n       ".join(
        f"len(regexp_extract_all(text, '{p}'))::BIGINT AS n_{name}"
        for name, p, _ in PII_PATTERNS
    )
    redacted = "text"
    for _name, p, repl in PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{p}', '{repl}', 'g')"
    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    return f"""
SELECT doc_id,
       {counts},
       md5({redacted}) AS redacted_md5,
       ({total}) > 0 AS was_redacted
FROM documents
ORDER BY doc_id
"""


Q48_ORACLE = _q48_oracle()


def q49_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition / lexical diversity: top-token share and
    type-token ratio (ties on the top token broken by token text)."""
    docs = load_table(spark, "documents", sf_dir)
    para = spark.sparkContext.defaultParallelism
    tok = docs.repartition(para, "doc_id").select(
        "doc_id", F.explode(tokens("text")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("freq"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("freq"), "token")
    top = (
        tf.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("token").alias("top_token"),
            F.col("freq").alias("top_freq"),
        )
    )
    stats = tf.groupBy("doc_id").agg(
        F.sum("freq").alias("n_tokens"),
        F.count("*").alias("n_distinct_tokens"),
    )
    return (
        stats.join(top, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct_tokens",
            "top_token",
            "top_freq",
            (F.col("top_freq").cast("double") / F.col("n_tokens").cast("double")).alias(
                "repetition_ratio"
            ),
            (
                F.col("n_distinct_tokens").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("type_token_ratio"),
        )
        .orderBy("doc_id")
    )


Q49_ORACLE = """
WITH tok AS (
    SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS token
    FROM documents
),
tf AS (
    SELECT doc_id, token, COUNT(*) AS freq FROM tok GROUP BY 1, 2
),
top AS (
    SELECT doc_id, token AS top_token, freq AS top_freq
    FROM (SELECT *, row_number() OVER (
              PARTITION BY doc_id ORDER BY freq DESC, token) AS rn
          FROM tf)
    WHERE rn = 1
),
stats AS (
    SELECT doc_id, SUM(freq)::BIGINT AS n_tokens,
           COUNT(*)::BIGINT AS n_distinct_tokens
    FROM tf GROUP BY 1
)
SELECT s.doc_id, s.n_tokens, s.n_distinct_tokens, t.top_token, t.top_freq,
       t.top_freq::DOUBLE / s.n_tokens::DOUBLE AS repetition_ratio,
       s.n_distinct_tokens::DOUBLE / s.n_tokens::DOUBLE AS type_token_ratio
FROM stats s JOIN top t USING (doc_id)
ORDER BY s.doc_id
"""

def q50_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return corpus.tf_idf_topk(docs, k=3)


Q50_ORACLE = """
WITH tok AS (
    SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS token
    FROM documents
),
tf AS (
    SELECT doc_id, token, COUNT(*) AS term_freq FROM tok GROUP BY 1, 2
),
dfreq AS (SELECT token, COUNT(*) AS doc_freq FROM tf GROUP BY 1),
scored AS (
    SELECT tf.doc_id, tf.token, tf.term_freq, dfreq.doc_freq,
           round(tf.term_freq::DOUBLE
                 * ln((SELECT COUNT(*) FROM documents)::DOUBLE
                      / dfreq.doc_freq::DOUBLE), 6) AS tf_idf
    FROM tf JOIN dfreq USING (token)
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tf_idf DESC, token)::INT AS rank
    FROM scored
)
SELECT doc_id, rank, token, term_freq, doc_freq, tf_idf
FROM ranked
WHERE rank <= 3
ORDER BY doc_id, rank
"""

QUERIES = {
    "q48_pii_scrub": q48_pii_scrub,
    "q49_repetition_stats": q49_repetition_stats,
    "q50_tfidf_topk": q50_tfidf_topk,
}

ORACLES = {
    "q48_pii_scrub": Q48_ORACLE,
    "q49_repetition_stats": Q49_ORACLE,
    "q50_tfidf_topk": Q50_ORACLE,
}
