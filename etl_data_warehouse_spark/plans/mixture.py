"""Corpus composition queries (q51-q52): source-mixture weights and the
end-to-end cleaning funnel.

q51 computes per-source sampling weights to hit a target token budget
with a uniform source mix — the "data mixing" step of a pretraining
recipe (keep fractions as exact-integer-derived doubles; the per-doc
keep decision threshold is an integer in [0, 10000] so the decision is
an integer compare, never a float one).

q52 is the flagship one-pass cleaning funnel: ingest → language filter
→ quality filter → exact dedup (canonical = min doc_id per
fingerprint) → train split, reporting surviving docs + tokens per
stage. All predicates are computed as cumulative booleans in a SINGLE
scan (plus one fingerprint window) — at 100 TB this is one shuffle on
the fingerprint, not five passes over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import (
    EN_STOPWORDS,
    punct_count,
    stopword_hits,
    token_count,
)
from ..operators.sampling import bucket_sql, hash_bucket
from ..sources.catalog import load_table

_BUDGET_TOKENS = 100_000
_DECISION_SCALE = 10_000


def q51_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    stats = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count("text")).alias("n_tokens"),
    )
    totals = stats.agg(
        F.count("*").alias("n_sources"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    out = stats.crossJoin(F.broadcast(totals))
    target = F.lit(float(_BUDGET_TOKENS)) / F.col("n_sources").cast("double")
    keep_fraction = F.least(
        F.lit(1.0), target / F.col("n_tokens").cast("double")
    )
    return out.select(
        "source",
        "n_docs",
        "n_tokens",
        (
            F.col("n_tokens").cast("double")
            / F.col("total_tokens").cast("double")
        ).alias("share_of_corpus"),
        target.alias("target_tokens"),
        keep_fraction.alias("keep_fraction"),
        F.floor(keep_fraction * _DECISION_SCALE)
        .cast("long")
        .alias("keep_threshold"),
        F.floor(F.col("n_tokens").cast("double") * keep_fraction)
        .cast("long")
        .alias("expected_tokens"),
    ).orderBy("source")


Q51_ORACLE = f"""
WITH stats AS (
    SELECT source,
           COUNT(*)::BIGINT AS n_docs,
           SUM(len(string_split_regex(trim(text), ' +')))::BIGINT AS n_tokens
    FROM documents GROUP BY 1
),
totals AS (
    SELECT COUNT(*)::BIGINT AS n_sources, SUM(n_tokens)::BIGINT AS total_tokens
    FROM stats
)
SELECT source, n_docs, n_tokens,
       n_tokens::DOUBLE / total_tokens::DOUBLE AS share_of_corpus,
       {float(_BUDGET_TOKENS)} / n_sources::DOUBLE AS target_tokens,
       least(1.0, ({float(_BUDGET_TOKENS)} / n_sources::DOUBLE)
                    / n_tokens::DOUBLE) AS keep_fraction,
       floor(least(1.0, ({float(_BUDGET_TOKENS)} / n_sources::DOUBLE)
                          / n_tokens::DOUBLE) * {_DECISION_SCALE})::BIGINT
           AS keep_threshold,
       floor(n_tokens::DOUBLE
             * least(1.0, ({float(_BUDGET_TOKENS)} / n_sources::DOUBLE)
                            / n_tokens::DOUBLE))::BIGINT AS expected_tokens
FROM stats, totals
ORDER BY source
"""


_STAGES = ["ingest", "lang_en", "quality", "dedup", "train_split"]


def q52_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
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
    flagged = docs.select(
        "doc_id",
        tc.alias("n_tokens"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"),
        (F.col("lang") == "en").alias("pass_lang"),
        ((F.col("lang") == "en") & (quality >= 0.35)).alias("pass_quality"),
        (hash_bucket("doc_id", "split") < 80).alias("in_train"),
    )
    # canonical = min doc_id among quality survivors of each fingerprint
    w = Window.partitionBy("fingerprint")
    flagged = flagged.withColumn(
        "canonical_id",
        F.min(F.when(F.col("pass_quality"), F.col("doc_id"))).over(w),
    ).withColumn(
        "pass_dedup",
        F.col("pass_quality") & (F.col("doc_id") == F.col("canonical_id")),
    )
    flagged = flagged.withColumn(
        "pass_split", F.col("pass_dedup") & F.col("in_train")
    )
    gates = ["pass_lang", "pass_quality", "pass_dedup", "pass_split"]
    agg = flagged.agg(
        F.count("*").alias("d0"),
        F.sum("n_tokens").alias("t0"),
        *[
            F.count(F.when(F.col(g), 1)).alias(f"d{i + 1}")
            for i, g in enumerate(gates)
        ],
        *[
            F.coalesce(
                F.sum(F.when(F.col(g), F.col("n_tokens"))), F.lit(0)
            ).alias(f"t{i + 1}")
            for i, g in enumerate(gates)
        ],
    )
    stack = ", ".join(
        f"{i}, '{name}', d{i}, t{i}" for i, name in enumerate(_STAGES)
    )
    return (
        agg.selectExpr(
            f"stack({len(_STAGES)}, {stack}) AS "
            "(stage, stage_name, n_docs, n_tokens)"
        )
        .select(
            F.col("stage").cast("int").alias("stage"),
            "stage_name",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
        .orderBy("stage")
    )


_SPLIT_B = bucket_sql("doc_id::VARCHAR", "split")
_STOP_SQL = ", ".join(f"'{s}'" for s in EN_STOPWORDS)

Q52_ORACLE = f"""
WITH t AS (
    SELECT doc_id,
           len(string_split_regex(trim(text), ' +'))::BIGINT AS n_tokens,
           md5(lower(trim(text))) AS fingerprint,
           lang = 'en' AS pass_lang,
           lang = 'en' AND (
             (len(list_filter(string_split_regex(trim(text), ' +'),
                  x -> lower(x) IN ({_STOP_SQL})))::DOUBLE
               / len(string_split_regex(trim(text), ' +'))::DOUBLE) * 0.5
             + (1.0 - len(regexp_extract_all(text, '[^A-Za-z0-9 ]'))::DOUBLE
                        / length(text)::DOUBLE) * 0.3
             + (CASE WHEN len(string_split_regex(trim(text), ' +'))
                          BETWEEN 20 AND 500 THEN 0.2 ELSE 0.0 END)
           ) >= 0.35 AS pass_quality,
           {_SPLIT_B} < 80 AS in_train
    FROM documents
),
d AS (
    SELECT *,
           pass_quality AND doc_id = MIN(CASE WHEN pass_quality THEN doc_id END)
               OVER (PARTITION BY fingerprint) AS pass_dedup
    FROM t
),
f AS (SELECT *, pass_dedup AND in_train AS pass_split FROM d),
agg AS (
    SELECT COUNT(*)::BIGINT AS d0, SUM(n_tokens)::BIGINT AS t0,
           COUNT(CASE WHEN pass_lang THEN 1 END)::BIGINT AS d1,
           COALESCE(SUM(CASE WHEN pass_lang THEN n_tokens END), 0)::BIGINT AS t1,
           COUNT(CASE WHEN pass_quality THEN 1 END)::BIGINT AS d2,
           COALESCE(SUM(CASE WHEN pass_quality THEN n_tokens END), 0)::BIGINT AS t2,
           COUNT(CASE WHEN pass_dedup THEN 1 END)::BIGINT AS d3,
           COALESCE(SUM(CASE WHEN pass_dedup THEN n_tokens END), 0)::BIGINT AS t3,
           COUNT(CASE WHEN pass_split THEN 1 END)::BIGINT AS d4,
           COALESCE(SUM(CASE WHEN pass_split THEN n_tokens END), 0)::BIGINT AS t4
    FROM f
)
SELECT 0::INT AS stage, 'ingest' AS stage_name, d0 AS n_docs, t0 AS n_tokens FROM agg
UNION ALL SELECT 1::INT, 'lang_en', d1, t1 FROM agg
UNION ALL SELECT 2::INT, 'quality', d2, t2 FROM agg
UNION ALL SELECT 3::INT, 'dedup', d3, t3 FROM agg
UNION ALL SELECT 4::INT, 'train_split', d4, t4 FROM agg
ORDER BY stage
"""

def q107_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted token-budget planner — the upsampling half q51's
    uniform planner lacks: given per-source target WEIGHTS and a token
    budget of 2x the corpus (so high-weight sources must oversample),
    emit per-source target tokens, sampling rate and EPOCHS (the
    repeat count a mixture-aware loader runs each source for — DoReMi/
    Pile-style domain reweighting, public method).

    Determinism: targets and epochs are BIGINT arithmetic (budget *
    weight DIV total_weight; ceil via (t + a - 1) DIV a) — bit-exact
    both engines; only the reported sampling_rate is a boundary DOUBLE.
    Weights derive from the source id (idx % 4 + 1) — a stand-in for
    the config table a real pipeline would broadcast-join; the plan
    shape (agg + 1-row broadcast + projection) is the real one.
    Scale: one agg shuffle on source; everything after is broadcast.
    """
    docs = load_table(spark, "documents", sf_dir)
    stats = docs.groupBy("source").agg(
        F.sum(token_count("text")).cast("long").alias("available_tokens")
    )
    weight = (
        (F.regexp_extract("source", "src(\\d+)", 1).cast("int") % 4) + 1
    ).cast("long")
    per = stats.select("source", "available_tokens", weight.alias("weight"))
    totals = per.agg(
        F.sum("available_tokens").cast("long").alias("corpus_tokens"),
        F.sum("weight").cast("long").alias("total_weight"),
    )
    j = per.crossJoin(F.broadcast(totals))
    budget = F.lit(2).cast("long") * F.col("corpus_tokens")
    target = F.expr(
        "CAST(2 * corpus_tokens * weight AS BIGINT) div total_weight"
    ).cast("long")
    return (
        j.select(
            "source",
            "available_tokens",
            "weight",
            budget.alias("budget_tokens"),
            target.alias("target_tokens"),
        )
        .select(
            "*",
            (
                F.col("target_tokens").cast("double")
                / F.col("available_tokens").cast("double")
            ).alias("sampling_rate"),
            F.expr(
                "(target_tokens + available_tokens - 1)"
                " div available_tokens"
            ).cast("long").alias("epochs"),
        )
        .orderBy("source")
    )


Q107_ORACLE = """
WITH stats AS (
    SELECT source,
           SUM(len(string_split_regex(trim(text), ' +')))::BIGINT
             AS available_tokens,
           ((regexp_extract(source, 'src(\\d+)', 1)::INT % 4) + 1)::BIGINT
             AS weight
    FROM documents GROUP BY source
),
totals AS (
    SELECT SUM(available_tokens)::BIGINT AS corpus_tokens,
           SUM(weight)::BIGINT AS total_weight
    FROM stats
)
SELECT source, available_tokens, weight,
       (2 * corpus_tokens)::BIGINT AS budget_tokens,
       ((2 * corpus_tokens * weight) // total_weight)::BIGINT
         AS target_tokens,
       (((2 * corpus_tokens * weight) // total_weight)::DOUBLE
        / available_tokens::DOUBLE) AS sampling_rate,
       ((((2 * corpus_tokens * weight) // total_weight)
         + available_tokens - 1) // available_tokens)::BIGINT AS epochs
FROM stats, totals
ORDER BY source
"""


QUERIES = {
    "q51_source_mixture": q51_source_mixture,
    "q52_corpus_funnel": q52_corpus_funnel,
    "q107_token_budget_plan": q107_token_budget_plan,
}

ORACLES = {
    "q51_source_mixture": Q51_ORACLE,
    "q52_corpus_funnel": Q52_ORACLE,
    "q107_token_budget_plan": Q107_ORACLE,
}


_SAMPLE_BUDGET_TOKENS = 10_000


def q113_apply_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE the q51 mixture plan: down-sample every source to its
    computed keep fraction with the deterministic md5 bucket
    (operators/sampling.hash_bucket, the q43 split machinery) — the
    step between planning a mixture and materializing the training
    corpus. A doc survives iff bucket(doc_id) < keep_threshold of its
    source; thresholds come from the same agg q51 reports, broadcast
    onto the scan, so the whole sample is one shuffle (the per-source
    agg) + a broadcast-filtered projection. Reproducible: re-running
    selects the SAME documents (hash, not rand). The budget is tighter
    than q51's reporting budget so the sample is actually selective on
    the test corpora."""
    docs = load_table(spark, "documents", sf_dir)
    stats = docs.groupBy("source").agg(
        F.sum(token_count("text")).alias("n_tokens")
    )
    n_sources = stats.agg(
        F.count("*").cast("double").alias("n_sources")
    )
    target = F.lit(float(_SAMPLE_BUDGET_TOKENS)) / F.col("n_sources")
    thresholds = stats.crossJoin(F.broadcast(n_sources)).select(
        "source",
        F.floor(
            F.least(F.lit(1.0), target / F.col("n_tokens").cast("double"))
            * _DECISION_SCALE
        )
        .cast("long")
        .alias("keep_threshold"),
    )
    bucket = hash_bucket("doc_id", "mixture", _DECISION_SCALE)
    return (
        docs.join(F.broadcast(thresholds), "source")
        .withColumn("bucket", bucket)
        .filter(F.col("bucket") < F.col("keep_threshold"))
        .select("doc_id", "source", "bucket", "keep_threshold")
        .orderBy("doc_id")
    )


Q113_ORACLE = f"""
WITH stats AS (
    SELECT source,
           SUM(len(string_split_regex(trim(text), ' +')))::BIGINT AS n_tokens
    FROM documents GROUP BY source
),
n AS (SELECT COUNT(*)::DOUBLE AS n_sources FROM stats),
thresholds AS (
    SELECT source,
           floor(least(1.0, ({float(_SAMPLE_BUDGET_TOKENS)} / n_sources)
                              / n_tokens::DOUBLE)
                 * {_DECISION_SCALE})::BIGINT AS keep_threshold
    FROM stats, n
)
SELECT d.doc_id, d.source,
       {bucket_sql("d.doc_id", "mixture", 10_000)} AS bucket,
       t.keep_threshold
FROM documents d JOIN thresholds t USING (source)
WHERE {bucket_sql("d.doc_id", "mixture", 10_000)} < t.keep_threshold
ORDER BY d.doc_id
"""


QUERIES["q113_apply_mixture_sample"] = q113_apply_mixture_sample
ORACLES["q113_apply_mixture_sample"] = Q113_ORACLE


_UPSAMPLE_BUDGET_TOKENS = 60_000
_EPOCH_CAP = 4.0


def q114_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE an UPSAMPLING mixture — the other half of q113: sources
    under their uniform token target are repeated for multiple epochs
    (the standard pretraining move for small high-quality sources,
    e.g. Wikipedia x4 in GPT-3's mix), capped at ``_EPOCH_CAP``.

    Per source: ``epochs = min(cap, target_tokens / n_tokens)`` — NO
    least(1.0) cap, so it generalizes q113 (epochs < 1 is a fractional
    downsample). Per doc the copy count is
    ``floor(epochs) + (bucket(doc_id) < floor(frac(epochs)*SCALE))``
    with the md5 bucket, so re-running materializes the SAME corpus.
    Copies come from ``explode(sequence(1, n_copies))`` — a zero-join
    projection after the one per-source agg + broadcast; at 100 TB the
    plan is one shuffle (source agg) + a scan-speed explode whose
    output volume is exactly the planned token budget.
    """
    docs = load_table(spark, "documents", sf_dir)
    stats = docs.groupBy("source").agg(
        F.sum(token_count("text")).alias("n_tokens")
    )
    n_sources = stats.agg(F.count("*").cast("double").alias("n_sources"))
    target = F.lit(float(_UPSAMPLE_BUDGET_TOKENS)) / F.col("n_sources")
    epochs = F.least(
        F.lit(_EPOCH_CAP), target / F.col("n_tokens").cast("double")
    )
    plan = stats.crossJoin(F.broadcast(n_sources)).select(
        "source",
        F.floor(epochs).cast("long").alias("full_epochs"),
        F.floor((epochs - F.floor(epochs)) * _DECISION_SCALE)
        .cast("long")
        .alias("frac_threshold"),
    )
    bucket = hash_bucket("doc_id", "epoch", _DECISION_SCALE)
    n_copies = F.col("full_epochs") + F.when(
        bucket < F.col("frac_threshold"), F.lit(1)
    ).otherwise(F.lit(0)).cast("long")
    return (
        docs.join(F.broadcast(plan), "source")
        .withColumn("n_copies", n_copies)
        .filter(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "source",
            "n_copies",
            F.explode(F.sequence(F.lit(1).cast("long"), "n_copies")).alias(
                "copy_id"
            ),
        )
        .orderBy("doc_id", "copy_id")
    )


Q114_ORACLE = f"""
WITH stats AS (
    SELECT source,
           SUM(len(string_split_regex(trim(text), ' +')))::BIGINT AS n_tokens
    FROM documents GROUP BY source
),
n AS (SELECT COUNT(*)::DOUBLE AS n_sources FROM stats),
plan AS (
    SELECT source,
           floor(ep)::BIGINT AS full_epochs,
           floor((ep - floor(ep)) * {_DECISION_SCALE})::BIGINT
               AS frac_threshold
    FROM (
        SELECT source,
               least({_EPOCH_CAP},
                     ({float(_UPSAMPLE_BUDGET_TOKENS)} / n_sources)
                         / n_tokens::DOUBLE) AS ep
        FROM stats, n)
),
copies AS (
    SELECT d.doc_id, d.source,
           p.full_epochs
             + CASE WHEN {bucket_sql("d.doc_id", "epoch", 10_000)}
                        < p.frac_threshold THEN 1 ELSE 0 END AS n_copies
    FROM documents d JOIN plan p USING (source)
)
SELECT doc_id, source, n_copies,
       unnest(generate_series(1, n_copies)) AS copy_id
FROM copies
WHERE n_copies > 0
ORDER BY doc_id, copy_id
"""

QUERIES["q114_epoch_upsample"] = q114_epoch_upsample
ORACLES["q114_epoch_upsample"] = Q114_ORACLE


_TRIM_BUDGET_TOKENS = 800


def q116_budget_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-source corpus trim to a hard token budget: docs are
    taken in a deterministic pseudo-random priority order (md5 bucket,
    doc_id tiebreak — a reproducible shuffle) and a doc is kept iff it
    STARTS before the budget line, i.e. the running token total of all
    higher-priority docs is under budget. This is the "cut the corpus
    to what the run can afford, fairly across shards" op that follows
    q107's planning — executed, not planned.

    One window shuffle (partitioned by source); everything else is a
    projection. The running sum uses BIGINT token counts — no float
    accumulation to drift cross-engine.
    """
    docs = load_table(spark, "documents", sf_dir)
    pri = hash_bucket("doc_id", "trim", _DECISION_SCALE)
    w = (
        Window.partitionBy("source")
        .orderBy("priority", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.select(
            "doc_id",
            "source",
            token_count("text").alias("n_tokens"),
            pri.alias("priority"),
        )
        .withColumn(
            "tokens_before",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("bigint")),
        )
        .filter(F.col("tokens_before") < _TRIM_BUDGET_TOKENS)
        .select("doc_id", "source", "n_tokens", "priority", "tokens_before")
        .orderBy("doc_id")
    )


Q116_ORACLE = f"""
WITH ranked AS (
    SELECT doc_id, source,
           len(string_split_regex(trim(text), ' +'))::BIGINT AS n_tokens,
           {bucket_sql("doc_id", "trim", 10_000)} AS priority
    FROM documents
),
cum AS (
    SELECT doc_id, source, n_tokens, priority,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY priority, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0)::BIGINT AS tokens_before
    FROM ranked
)
SELECT doc_id, source, n_tokens, priority, tokens_before
FROM cum
WHERE tokens_before < {_TRIM_BUDGET_TOKENS}
ORDER BY doc_id
"""

QUERIES["q116_budget_trim"] = q116_budget_trim
ORACLES["q116_budget_trim"] = Q116_ORACLE


_TEMP_BUDGET_TOKENS = 100_000
_SQRT_SCALE = 1_000_000  # n_tokens * SCALE must stay < 2^53 for exact sqrt


def q117_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (multilingual sampling a la
    XLM-R / mT5): source sampling weight proportional to p_i^(1/T)
    with T = 2, i.e. proportional to sqrt(n_tokens) — upweights small
    sources relative to proportional sampling without the uniform
    mix's full flattening.

    Cross-engine determinism without float accumulation: the weight
    numerator is ``floor(sqrt(n_tokens * SCALE))`` — IEEE-754 sqrt is
    correctly rounded, so the double is IDENTICAL in Spark and DuckDB
    and its floor is a stable BIGINT; the denominator is an exact
    BIGINT sum of those; planned tokens are integer
    ``(budget * s_i) div sum_s``. The only doubles in the output are
    single divisions of exact integers (bit-exact by IEEE). One
    source-level agg + a 1-row broadcast — scan-proportional at any
    corpus size.
    """
    docs = load_table(spark, "documents", sf_dir)
    stats = docs.groupBy("source").agg(
        F.sum(token_count("text")).alias("n_tokens")
    )
    s = F.floor(
        F.sqrt((F.col("n_tokens") * _SQRT_SCALE).cast("double"))
    ).cast("long")
    scaled = stats.select("source", "n_tokens", s.alias("sqrt_scaled"))
    totals = scaled.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("sqrt_scaled").alias("sum_sqrt"),
    )
    out = scaled.crossJoin(F.broadcast(totals))
    # TRUE integer division (`div`), matching DuckDB's `//`: floor of a
    # double quotient can round up across an integer boundary and
    # disagree with exact integer division
    planned = F.expr(
        f"(CAST({_TEMP_BUDGET_TOKENS} AS BIGINT) * sqrt_scaled) div sum_sqrt"
    )
    return out.select(
        "source",
        "n_tokens",
        (
            F.col("n_tokens").cast("double")
            / F.col("total_tokens").cast("double")
        ).alias("share_raw"),
        (
            F.col("sqrt_scaled").cast("double")
            / F.col("sum_sqrt").cast("double")
        ).alias("weight_t2"),
        planned.alias("planned_tokens"),
        (
            planned.cast("double") / F.col("n_tokens").cast("double")
        ).alias("epochs_needed"),
    ).orderBy("source")


Q117_ORACLE = f"""
WITH stats AS (
    SELECT source,
           SUM(len(string_split_regex(trim(text), ' +')))::BIGINT AS n_tokens
    FROM documents GROUP BY source
),
scaled AS (
    SELECT source, n_tokens,
           floor(sqrt((n_tokens * {_SQRT_SCALE})::DOUBLE))::BIGINT
               AS sqrt_scaled
    FROM stats
),
totals AS (
    SELECT SUM(n_tokens)::BIGINT AS total_tokens,
           SUM(sqrt_scaled)::BIGINT AS sum_sqrt
    FROM scaled
)
SELECT source, n_tokens,
       n_tokens::DOUBLE / total_tokens::DOUBLE AS share_raw,
       sqrt_scaled::DOUBLE / sum_sqrt::DOUBLE AS weight_t2,
       ({_TEMP_BUDGET_TOKENS}::BIGINT * sqrt_scaled) // sum_sqrt
           AS planned_tokens,
       (({_TEMP_BUDGET_TOKENS}::BIGINT * sqrt_scaled) // sum_sqrt)::DOUBLE
           / n_tokens::DOUBLE AS epochs_needed
FROM scaled, totals
ORDER BY source
"""

QUERIES["q117_temperature_mixture"] = q117_temperature_mixture
ORACLES["q117_temperature_mixture"] = Q117_ORACLE


_CURRICULUM_BUCKETS = 10


def q121_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-based curriculum ordering (Bengio et al. 2009 applied the
    way pretraining pipelines do it): bucket documents into difficulty
    deciles by token count (shorter = easier), then emit the global
    training order — deciles in sequence, a deterministic hash shuffle
    inside each decile so each difficulty band is internally unordered
    but reproducible.

    All-integer math (counts, ntile, row_number with unique
    tiebreaks) — hash-exact with no float policy. Two window passes
    over the corpus (decile assignment, then the global order): the
    global row_number is the one single-partition stage, acceptable
    because the OUTPUT is a training manifest that is inherently a
    total order; at 100 TB you'd shard it by (decile, priority range)
    and number within shards."""
    docs = load_table(spark, "documents", sf_dir)
    wd = Window.orderBy("n_tokens", "doc_id")
    wp = Window.orderBy("decile", "priority", "doc_id")
    return (
        docs.select(
            "doc_id", "source", token_count("text").alias("n_tokens")
        )
        .withColumn(
            "decile", F.ntile(_CURRICULUM_BUCKETS).over(wd).cast("int")
        )
        .withColumn("priority", hash_bucket("doc_id", "curr", _DECISION_SCALE))
        .withColumn(
            "curriculum_pos", F.row_number().over(wp).cast("long")
        )
        .select(
            "doc_id", "source", "n_tokens", "decile", "priority",
            "curriculum_pos",
        )
        .orderBy("curriculum_pos")
    )


Q121_ORACLE = f"""
WITH t AS (
    SELECT doc_id, source,
           len(string_split_regex(trim(text), ' +'))::BIGINT AS n_tokens
    FROM documents
),
d AS (
    SELECT doc_id, source, n_tokens,
           ntile({_CURRICULUM_BUCKETS}) OVER (
               ORDER BY n_tokens, doc_id)::INT AS decile,
           {bucket_sql("doc_id", "curr", 10_000)} AS priority
    FROM t
)
SELECT doc_id, source, n_tokens, decile, priority,
       row_number() OVER (
           ORDER BY decile, priority, doc_id)::BIGINT AS curriculum_pos
FROM d
ORDER BY curriculum_pos
"""

QUERIES["q121_curriculum_schedule"] = q121_curriculum_schedule
ORACLES["q121_curriculum_schedule"] = Q121_ORACLE


# --- q122: DSIR importance weights -------------------------------------------

_DSIR_BUCKETS = 4096     # hashed bigram feature space (2^12)
_DSIR_TARGET_PCT = 10    # md5 bucket 0 of 10 = the "target domain" sample


def _dsir_doc_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): estimate hashed-bigram
    unigram models over a TARGET domain sample and the RAW pool, then
    score every raw document by its log importance weight
    log w(x) = sum over features f in x of [log p_target(f) - log
    p_raw(f)] (add-one smoothing over the hashed feature space).
    Resampling by this weight shifts the raw pool toward the target
    distribution — the standard pretraining-data selection recipe.

    Determinism playbook (same as q104's decimal logp): each feature's
    two log-probs are engine-divergent in the last ulp, so both are
    rounded to 9dp and carried as DECIMAL(18,9); the per-doc weight is
    an exact decimal sum of cnt x (lt - lr) — order-independent —
    cast to DOUBLE only at the output boundary (no rounding of the
    double). Feature hashing and the target-sample split are md5
    buckets, bit-identical in DuckDB.

    Scale shape: ONE corpus scan + bigram explode feeding ONE
    (doc_id, bucket) aggregate; everything downstream is derived from
    that doc-bucket-grain frame — the bucket models by a conditional
    re-agg (so the target/raw filter never splits the shared subplan:
    a pushed-down filter below the Exchange would defeat ReuseExchange,
    which is exactly what the first cut of this query got wrong), the
    totals from the 4096-row model, and the scoring join from the same
    Exchange via ReuseExchange (plan-asserted in
    tests/test_dsir_fim.py). The target-docs filter runs LAST, on
    doc-grain rows. Models and totals broadcast at <= 4096 rows. Linear
    in corpus tokens. Returns the doc-grain weight frame (doc_id,
    source, n_feats, n_buckets, w_dec) BEFORE ranking: q122 closes
    with the global row_number (the single-partition stage), q130 with
    the sharded keyed_global_rank manifest closer.
    """
    from ..functions.text import word_ngrams

    para = spark.sparkContext.defaultParallelism
    docs = load_table(spark, "documents", sf_dir)
    docfeat = (
        docs.filter(token_count("text") >= 2)
        # explicit, for the same ReuseExchange reason as the bucket
        # filter below: the closing source join implies isnotnull(doc_id)
        # in only one consumer branch otherwise
        .filter(F.col("doc_id").isNotNull())
        .repartition(para)  # single-row-group parquet: parallelize entry
        .select(
            "doc_id",
            (hash_bucket("doc_id", "dsir_t", _DSIR_TARGET_PCT) == 0).alias(
                "is_target"
            ),
            F.explode(word_ngrams("text", 2)).alias("gram"),
        )
        .select(
            "doc_id",
            "is_target",
            hash_bucket("gram", "dsir_f", _DSIR_BUCKETS).alias("bucket"),
        )
        # explicit, so the scoring join's implicit isnotnull(join key)
        # doesn't make ITS copy of this subplan differ from the model
        # branch's — canonical equality is what ReuseExchange keys on
        .filter(F.col("bucket").isNotNull())
        .groupBy("doc_id", "bucket")
        # is_target is doc-constant; carrying it as an AGG OUTPUT (not a
        # grouping key) stops predicate pushdown at this aggregate, so
        # the later target filter can never split the shared subplan.
        .agg(F.count("*").alias("cnt"), F.max("is_target").alias("is_target"))
    )
    wall = Window.partitionBy()  # all-rows window over the 4096-row model
    model = (
        docfeat.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("is_target"), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("t_cnt"),
            F.sum(F.when(F.col("is_target"), 0).otherwise(F.col("cnt")))
            .cast("long")
            .alias("r_cnt"),
        )
        # totals as window sums, NOT a separate agg frame — a second
        # consts frame would be a third consumer of docfeat's lineage
        # and a third corpus scan+explode
        .withColumn("n_t", F.sum("t_cnt").over(wall).cast("long"))
        .withColumn("n_r", F.sum("r_cnt").over(wall).cast("long"))
    )
    lt = F.round(
        F.log(
            (F.col("t_cnt") + 1).cast("double")
            / (F.col("n_t") + F.lit(_DSIR_BUCKETS)).cast("double")
        ),
        9,
    ).cast("decimal(18,9)")
    lr = F.round(
        F.log(
            (F.col("r_cnt") + 1).cast("double")
            / (F.col("n_r") + F.lit(_DSIR_BUCKETS)).cast("double")
        ),
        9,
    ).cast("decimal(18,9)")
    per_doc = (
        docfeat.join(F.broadcast(model), "bucket")
        .select(
            "doc_id",
            "is_target",
            "cnt",
            (F.col("cnt").cast("decimal(10,0)") * (lt - lr)).alias(
                "contrib"
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("contrib").alias("w_dec"),
            F.sum("cnt").cast("long").alias("n_feats"),
            F.count("*").cast("long").alias("n_buckets"),
            F.max("is_target").alias("is_target"),
        )
        .filter(~F.col("is_target"))  # LAST: keeps the shared subplan
        .drop("is_target")
    )
    return per_doc.join(docs.select("doc_id", "source"), "doc_id")


def q122_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.orderBy(F.col("w_dec").desc(), "doc_id")
    return (
        _dsir_doc_weights(spark, sf_dir)
        .withColumn("dsir_rank", F.row_number().over(w).cast("int"))
        .select(
            "dsir_rank",
            "doc_id",
            "source",
            "n_feats",
            "n_buckets",
            F.col("w_dec").cast("double").alias("log_weight"),
        )
        .orderBy("dsir_rank")
    )


Q122_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, string_split_regex(trim(text), ' +') AS tok
    FROM documents
),
f AS (
    SELECT doc_id,
           ({bucket_sql("doc_id", "dsir_t", _DSIR_TARGET_PCT)} = 0)
             AS is_target,
           {bucket_sql("gram", "dsir_f", _DSIR_BUCKETS)} AS bucket
    FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(tok) - 1),
                   i -> tok[i] || ' ' || tok[i + 1])) AS gram
        FROM tok WHERE len(tok) >= 2)
),
tm AS (
    SELECT bucket, COUNT(*)::BIGINT AS t_cnt FROM f
    WHERE is_target GROUP BY 1
),
rm AS (
    SELECT bucket, COUNT(*)::BIGINT AS r_cnt FROM f
    WHERE NOT is_target GROUP BY 1
),
model AS (
    SELECT COALESCE(tm.bucket, rm.bucket) AS bucket,
           COALESCE(t_cnt, 0) AS t_cnt, COALESCE(r_cnt, 0) AS r_cnt
    FROM tm FULL OUTER JOIN rm ON tm.bucket = rm.bucket
),
c AS (
    SELECT SUM(CASE WHEN is_target THEN 1 ELSE 0 END)::BIGINT AS n_t,
           SUM(CASE WHEN is_target THEN 0 ELSE 1 END)::BIGINT AS n_r
    FROM f
),
df AS (
    SELECT doc_id, bucket, COUNT(*)::BIGINT AS cnt FROM f
    WHERE NOT is_target GROUP BY 1, 2
),
s AS (
    SELECT df.doc_id, df.cnt,
           round(ln((m.t_cnt + 1)::DOUBLE
                    / (c.n_t + {_DSIR_BUCKETS})::DOUBLE),
                 9)::DECIMAL(18,9) AS lt,
           round(ln((m.r_cnt + 1)::DOUBLE
                    / (c.n_r + {_DSIR_BUCKETS})::DOUBLE),
                 9)::DECIMAL(18,9) AS lr
    FROM df JOIN model m USING (bucket) CROSS JOIN c
),
pd AS (
    SELECT doc_id, SUM(cnt::DECIMAL(10,0) * (lt - lr)) AS w_dec,
           SUM(cnt)::BIGINT AS n_feats, COUNT(*)::BIGINT AS n_buckets
    FROM s GROUP BY 1
)
SELECT row_number() OVER (ORDER BY w_dec DESC, pd.doc_id)::INT AS dsir_rank,
       pd.doc_id, d.source, n_feats, n_buckets, w_dec::DOUBLE AS log_weight
FROM pd JOIN documents d ON d.doc_id = pd.doc_id
ORDER BY dsir_rank
"""

QUERIES["q122_dsir_weights"] = q122_dsir_weights
ORACLES["q122_dsir_weights"] = Q122_ORACLE


# --- q129/q130: sharded manifest closers (VERDICT r7 #4) ---------------------
#
# q121 and q122 end in a global row_number — the single-partition stage
# their docstrings flagged for sharding at 100 TB. These variants
# produce BIT-IDENTICAL output through operators/manifest.py's
# histogram-sort numbering (range-aligned shard key + within-shard
# distributed row_number + broadcast prefix-sum offsets), and are
# registered against the SAME DuckDB oracles as their global twins —
# the hash row IS the proof that the sharded renumbering equals the
# global order exactly.

_CURR_SHARDS = 8
_DSIR_GRID = 64  # weight-cell quantization: cells per unit log-weight


def q129_sharded_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q121 with BOTH global windows sharded. The ntile becomes
    `ntile_from_rank` over a (n_tokens)-keyed exact rank (the decile
    boundary stat pass is a value-histogram, not a global sort); the
    closing order becomes a (decile x priority-range)-keyed rank —
    priority is already a uniform md5 hash in [0, 10000), so carving
    it into `_CURR_SHARDS` contiguous ranges per decile gives balanced,
    range-aligned shards. Each shard numbers locally (distributed
    window) and lifts by the broadcast prefix sum of shard counts.

    The doc-grain token frame is localCheckpoint'd: keyed_global_rank
    consumes its input twice (stat pass + data pass, the histogram-sort
    shape — the same double pass Spark's own range-partitioned sort
    performs); at cluster scale persist it instead."""
    from ..operators.manifest import keyed_global_rank, ntile_from_rank

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", "source", token_count("text").alias("n_tokens")
    ).localCheckpoint()
    ranked = keyed_global_rank(
        toks, "n_tokens", ["doc_id"], out="_grank", total_col="_total"
    )
    staged = (
        ranked.withColumn(
            "decile",
            ntile_from_rank(
                F.col("_grank"), F.col("_total"), _CURRICULUM_BUCKETS
            ),
        )
        .withColumn(
            "priority", hash_bucket("doc_id", "curr", _DECISION_SCALE)
        )
        .withColumn(
            "shard",
            (
                F.col("decile").cast("long") * _CURR_SHARDS
                + F.expr(
                    f"(priority * {_CURR_SHARDS}) div {_DECISION_SCALE}"
                )
            ).cast("long"),
        )
        .drop("_grank", "_total")
    )
    return (
        keyed_global_rank(
            staged, "shard", ["priority", "doc_id"], out="curriculum_pos"
        )
        .select(
            "doc_id", "source", "n_tokens", "decile", "priority",
            "curriculum_pos",
        )
        .orderBy("curriculum_pos")
    )


def q130_sharded_dsir_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q122 with the closing global rank sharded: weights quantize into
    coarse cells (floor(w_dec * 64) — data-independent, monotone in the
    sort key, so cells are range-aligned by construction), each cell
    numbers (w_dec desc, doc_id) locally and lifts by the broadcast
    prefix sum of cell counts, descending. Cell count is bounded by the
    log-weight RANGE x 64 (thousands), not the corpus. The doc-grain
    weight frame is localCheckpoint'd for the stat+data double pass
    (persist at cluster scale)."""
    from ..operators.manifest import keyed_global_rank

    base = (
        _dsir_doc_weights(spark, sf_dir)
        .withColumn(
            "_cell",
            F.floor(F.col("w_dec").cast("double") * _DSIR_GRID).cast(
                "long"
            ),
        )
        .localCheckpoint()
    )
    return (
        keyed_global_rank(
            base,
            "_cell",
            [F.col("w_dec").desc(), "doc_id"],
            out="_pos",
            key_desc=True,
        )
        .select(
            F.col("_pos").cast("int").alias("dsir_rank"),
            "doc_id",
            "source",
            "n_feats",
            "n_buckets",
            F.col("w_dec").cast("double").alias("log_weight"),
        )
        .orderBy("dsir_rank")
    )


QUERIES["q129_sharded_curriculum"] = q129_sharded_curriculum
ORACLES["q129_sharded_curriculum"] = Q121_ORACLE
QUERIES["q130_sharded_dsir_manifest"] = q130_sharded_dsir_manifest
ORACLES["q130_sharded_dsir_manifest"] = Q122_ORACLE
