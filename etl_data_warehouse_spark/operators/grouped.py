"""Grouped-map Arrow operator (``applyInPandas``) with a Catalyst twin.

Completes the repo's Pandas-API family: ``mapInPandas`` (multimodal.py),
``applyInPandasWithState`` (streaming/stateful_sessions.py), and here
the batch grouped-map — the escape hatch for per-group logic a
Catalyst expression can't express (per-group model fits, library calls).

The demo computation (per-group z-score) deliberately IS expressible in
Catalyst, so ``groupwise_zscore_native`` can prove the Arrow path
value-equal in tests — the point of the module is the verified plumbing
(schema contract, group batching, double math), not the statistic.

100 TB posture: one shuffle on the group keys either way. The Arrow
path additionally materializes each group as a pandas DataFrame in a
python worker — per-group memory is the group size, so it needs
bounded groups (salt or pre-aggregate skewed keys first); the native
twin streams. Use the native form whenever the expression exists —
CLAUDE.md's zero-UDF rule for registered queries stands; this operator
is for the cases where it can't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def groupwise_zscore(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Arrow grouped-map: z-score of ``value_col`` within each group
    (population stddev; z = 0 where the group is constant)."""
    import pandas as pd  # noqa: F401 — worker-side import

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, zscore double"

    def per_group(pdf):
        v = pdf[value_col].astype("float64")
        sd = v.std(ddof=0)
        pdf = pdf.copy()
        pdf["zscore"] = 0.0 if (sd == 0 or v.isna().all()) else (v - v.mean()) / sd
        return pdf

    return df.groupBy(*keys).applyInPandas(per_group, schema=schema)


def groupwise_zscore_native(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Catalyst twin of ``groupwise_zscore`` — same output, no Python."""
    w = Window.partitionBy(*keys)
    v = F.col(value_col).cast("double")
    mean = F.avg(v).over(w)
    sd = F.stddev_pop(v).over(w)
    return df.withColumn(
        "zscore",
        F.when(sd == 0, F.lit(0.0)).otherwise((v - mean) / sd),
    )
