"""OLAP surface extension (q53): exact discrete quantiles.

q53: discrete (rank-selection) quantiles of order value per month —
exact and engine-portable BY CONSTRUCTION: the quantile is the VALUE at
row ceil(q*n) in value-sorted order, a selection, never an
interpolation (interpolated quantiles multiply doubles in
engine-specific association order; selection is bit-stable).

(ROLLUP/CUBE already live in plans/warehouse.py q17/q18.)

Scale: one window per month partition — the month grain bounds every
sort; no global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import sketches as sketches_mod
from ..sources.catalog import load_table

_QS = [("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p90", 0.9)]


def q53_order_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(
        spark, "orders", sf_dir, columns=["o_orderkey", "o_totalprice", "o_orderdate"]
    )
    month = F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    base = orders.select(month, "o_totalprice", "o_orderkey")
    w = Window.partitionBy("order_month").orderBy("o_totalprice", "o_orderkey")
    ranked = base.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("order_month"))
    )
    aggs = [F.count("*").alias("n_orders")] + [
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(q) * F.col("n")),
                F.col("o_totalprice"),
            )
        ).alias(name)
        for name, q in _QS
    ]
    # count("*") over ranked double-counts nothing: ranked is row-per-order
    return (
        ranked.groupBy("order_month")
        .agg(*aggs)
        .withColumn("n_orders", F.col("n_orders").cast("long"))
        .orderBy("order_month")
    )


Q53_ORACLE = f"""
WITH ranked AS (
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           o_totalprice,
           row_number() OVER (
               PARTITION BY strftime(o_orderdate, '%Y-%m')
               ORDER BY o_totalprice, o_orderkey) AS rn,
           COUNT(*) OVER (
               PARTITION BY strftime(o_orderdate, '%Y-%m')) AS n
    FROM orders
)
SELECT order_month,
       COUNT(*)::BIGINT AS n_orders,
       {", ".join(
           f"MAX(CASE WHEN rn = ceil({q} * n) THEN o_totalprice END) AS {name}"
           for name, q in _QS
       )}
FROM ranked
GROUP BY order_month
ORDER BY order_month
"""


_STATUSES = ["F", "O", "P"]


def q57_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue/order-count PIVOTED by order status.

    The pivot value list is PINNED (never inferred with a distinct
    collect — that's a full extra pass at 100 TB and nondeterministic
    column order); empty cells coalesce to 0 so the wide frame is
    null-free. Money via exact decimal sums.
    """
    orders = load_table(
        spark, "orders", sf_dir,
        columns=["o_orderstatus", "o_totalprice", "o_orderdate"],
    )
    wide = (
        orders.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            "o_orderstatus",
            "o_totalprice",
        )
        .groupBy("order_month")
        .pivot("o_orderstatus", _STATUSES)
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return wide.select(
        "order_month",
        *[
            F.coalesce(F.col(f"{s}_rev"), F.lit(0.0)).alias(f"rev_{s.lower()}")
            for s in _STATUSES
        ],
        *[
            F.coalesce(F.col(f"{s}_cnt"), F.lit(0).cast("long")).alias(
                f"cnt_{s.lower()}"
            )
            for s in _STATUSES
        ],
    ).orderBy("order_month")


Q57_ORACLE = f"""
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       {", ".join(
           "COALESCE(CAST(SUM(CASE WHEN o_orderstatus = '" + s
           + "' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0)"
           + " AS rev_" + s.lower()
           for s in _STATUSES
       )},
       {", ".join(
           "COUNT(CASE WHEN o_orderstatus = '" + s + "' THEN 1 END)::BIGINT"
           + " AS cnt_" + s.lower()
           for s in _STATUSES
       )}
FROM orders
GROUP BY 1
ORDER BY 1
"""


def q58_status_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) the wide status frame back to long form —
    (order_month, status, revenue) — the wide↔long round-trip every
    reporting layer needs. Null-free input ⇒ identical row counts in
    both engines regardless of INCLUDE-NULLS dialect defaults."""
    wide = q57_status_pivot(spark, sf_dir)
    long = wide.unpivot(
        ids=["order_month"],
        values=[f"rev_{s.lower()}" for s in _STATUSES],
        variableColumnName="status_col",
        valueColumnName="revenue",
    )
    return long.select(
        "order_month",
        F.upper(F.substring("status_col", 5, 1)).alias("status"),
        "revenue",
    ).orderBy("order_month", "status")


Q58_ORACLE = f"""
WITH wide AS ({Q57_ORACLE.replace("ORDER BY 1", "")})
{" UNION ALL ".join(
    "SELECT order_month, '" + s + "' AS status, rev_" + s.lower()
    + " AS revenue FROM wide"
    for s in _STATUSES
)}
ORDER BY order_month, status
"""

def q60_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — ((year, status), (year), (status)) —
    the general form ROLLUP (q17) / CUBE (q18) specialize. Native
    ``groupingSets`` API (one Expand node, single shuffle — NOT a
    UNION ALL of three scans, which would read the fact 3×). grp_id
    disambiguates the NULLs of the superaggregate rows from data NULLs.
    """
    orders = load_table(
        spark, "orders", sf_dir, columns=["o_orderdate", "o_orderstatus", "o_totalprice"]
    )
    base = orders.select(
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.col("o_orderstatus").alias("status"),
        "o_totalprice",
    )
    return (
        base.groupingSets(
            [["order_year", "status"], ["order_year"], ["status"]],
            "order_year",
            "status",
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("order_count"),
            F.grouping_id().cast("int").alias("grp_id"),
        )
        .orderBy("grp_id", "order_year", "status")
    )


Q60_ORACLE = """
SELECT year(o_orderdate)::INT AS order_year,
       o_orderstatus          AS status,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*)               AS order_count,
       (GROUPING(year(o_orderdate)::INT) * 2
        + GROUPING(o_orderstatus))::INT AS grp_id
FROM orders
GROUP BY GROUPING SETS ((year(o_orderdate)::INT, o_orderstatus),
                        (year(o_orderdate)::INT),
                        (o_orderstatus))
ORDER BY grp_id, order_year, status
"""


def q61_distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-window suite over the month partition:
    PERCENT_RANK / CUME_DIST / FIRST_VALUE / LAST_VALUE / NTH_VALUE /
    LEAD. Rank-derived ratios are exact in both engines ((rank-1)/(n-1)
    — one division, no accumulation order); every window carries the
    o_orderkey tiebreak (repo ranking rule). LAST_VALUE gets the full
    frame — the default RANGE..CURRENT ROW frame is the classic
    'last_value returns current row' trap this query pins down.

    Scale: all six functions share ONE window spec → one shuffle on
    order_month, one partition-local sort.
    """
    orders = load_table(
        spark, "orders", sf_dir, columns=["o_orderkey", "o_totalprice", "o_orderdate"]
    )
    base = orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        "o_orderkey",
        "o_totalprice",
    )
    w = Window.partitionBy("order_month").orderBy("o_totalprice", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    out = base.select(
        "order_month",
        "o_orderkey",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_totalprice").over(wfull).alias("month_min"),
        F.last("o_totalprice").over(wfull).alias("month_max"),
        F.nth_value("o_totalprice", 2).over(wfull).alias("month_2nd"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
    )
    # top-5 per month keeps the result driver-sized at any SF while
    # still exercising every function (lead is NULL on the last row)
    return (
        out.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("order_month").orderBy(
                    F.desc("o_totalprice"), F.desc("o_orderkey")
                )
            ),
        )
        .filter(F.col("rn") <= 5)
        .drop("rn")
        .orderBy("order_month", "o_totalprice", "o_orderkey")
    )


Q61_ORACLE = """
WITH win AS (
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           o_orderkey,
           o_totalprice,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume,
           first_value(o_totalprice) OVER wf AS month_min,
           last_value(o_totalprice)  OVER wf AS month_max,
           nth_value(o_totalprice, 2) OVER wf AS month_2nd,
           lead(o_totalprice, 1) OVER w AS next_price,
           row_number() OVER (
               PARTITION BY strftime(o_orderdate, '%Y-%m')
               ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
    FROM orders
    WINDOW w AS (PARTITION BY strftime(o_orderdate, '%Y-%m')
                 ORDER BY o_totalprice, o_orderkey),
           wf AS (PARTITION BY strftime(o_orderdate, '%Y-%m')
                  ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT order_month, o_orderkey, o_totalprice, pct_rank, cume,
       month_min, month_max, month_2nd, next_price
FROM win
WHERE rn <= 5
ORDER BY order_month, o_totalprice, o_orderkey
"""


def q80_sliding_window_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows in BATCH: 1-hour windows advancing
    every 15 minutes over the events table — the overlapping-window
    rollup Structured Streaming runs with the same ``F.window`` call
    (each event lands in window/slide = 4 windows; Spark plans this as
    one generate + aggregate, no self-joins).

    Oracle: DuckDB reproduces the window fan-out with an UNNEST of the
    4 slide offsets off each event's 15-minute bucket; with window =
    4 x slide every generated window qualifies, so the twin needs no
    range filter. Distinct users per window exercises the
    expand-then-aggregate path under fan-out.

    100 TB: fan-out multiplies rows by 4 BEFORE the shuffle; the
    partial aggregation collapses each partition's (window, user)
    duplicates map-side, so the shuffle carries near-distinct pairs —
    same reasoning that makes streaming sliding windows viable.
    """
    events = load_table(spark, "events", sf_dir, columns=["ts", "user_id", "value"])
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            (F.unix_micros(F.col("w.start")) / F.lit(1000)).cast("long")
            .alias("window_start_ms"),
            "n_events",
            "n_users",
        )
        .orderBy("window_start_ms")
    )


Q80_ORACLE = """
SELECT (epoch_ms(time_bucket(INTERVAL '15 minutes', ts))
          - offs.i * 900000)::BIGINT AS window_start_ms,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events
CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS i) offs
GROUP BY window_start_ms
ORDER BY window_start_ms
"""


def q86_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnosis: top-20 heaviest l_suppkey values
    with their share of the table, plus the global skew factor
    (max-key rows / mean rows-per-key) — the measurement that decides
    when operators/skew.py salting or AQE skew-join splitting is worth
    it at 100 TB. One shuffle on the key, one tiny global aggregate
    broadcast back; the rank<=20 filter runs as a partial
    WindowGroupLimit, so only each partition's top rows reach the
    final sort."""
    li = load_table(spark, "lineitem", sf_dir, columns=["l_suppkey"])
    counts = li.groupBy("l_suppkey").agg(F.count("*").alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("total_rows"),
        F.count("*").alias("n_keys"),
        F.max("n_rows").alias("max_rows"),
    )
    w = Window.orderBy(F.desc("n_rows"), "l_suppkey")
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 20)
        .crossJoin(F.broadcast(totals))
        .select(
            "rank",
            "l_suppkey",
            "n_rows",
            (
                F.col("n_rows").cast("double")
                / F.col("total_rows").cast("double")
            ).alias("share_of_table"),
            (
                F.col("max_rows").cast("double")
                * F.col("n_keys").cast("double")
                / F.col("total_rows").cast("double")
            ).alias("skew_factor"),
        )
        .orderBy("rank")
    )


Q86_ORACLE = """
WITH counts AS (
    SELECT l_suppkey, COUNT(*)::BIGINT AS n_rows
    FROM lineitem GROUP BY 1
),
totals AS (
    SELECT SUM(n_rows)::BIGINT AS total_rows,
           COUNT(*)::BIGINT AS n_keys,
           MAX(n_rows)::BIGINT AS max_rows
    FROM counts
),
ranked AS (
    SELECT *, row_number() OVER (ORDER BY n_rows DESC, l_suppkey)::INT AS rank
    FROM counts
)
SELECT r.rank, r.l_suppkey, r.n_rows,
       r.n_rows::DOUBLE / t.total_rows::DOUBLE AS share_of_table,
       t.max_rows::DOUBLE * t.n_keys::DOUBLE / t.total_rows::DOUBLE
           AS skew_factor
FROM ranked r CROSS JOIN totals t
WHERE r.rank <= 20
ORDER BY r.rank
"""


_N_BINS = 20


def q89_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of o_totalprice (the ANALYZE-style column
    profile a CBO consumes): exact min/max bounds, 20 bins, per-bin
    row count + decimal-exact revenue. Two scans (tiny bounds agg
    broadcast back) + ONE shuffle on the 20-value bin key; bit-stable
    because bin = floor((x-lo)/width) is the identical IEEE double op
    sequence in both engines, and the money sum stays DECIMAL until the
    output boundary."""
    orders = load_table(
        spark, "orders", sf_dir, columns=["o_totalprice"]
    )
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    ).withColumn("width", (F.col("hi") - F.col("lo")) / F.lit(float(_N_BINS)))
    binned = orders.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(_N_BINS - 1).cast("long"),
            F.floor((F.col("o_totalprice") - F.col("lo")) / F.col("width")),
        ).alias("bin"),
        "lo",
        "width",
        "o_totalprice",
    )
    return (
        binned.groupBy("bin", "lo", "width")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_rev"),
        )
        .select(
            "bin",
            (F.col("lo") + F.col("bin").cast("double") * F.col("width")).alias(
                "bin_lo"
            ),
            (
                F.col("lo")
                + (F.col("bin") + F.lit(1)).cast("double") * F.col("width")
            ).alias("bin_hi"),
            "n_orders",
            F.col("_rev").cast("double").alias("sum_value"),
        )
        .orderBy("bin")
    )


Q89_ORACLE = f"""
WITH bounds AS (
    SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
           (MAX(o_totalprice) - MIN(o_totalprice)) / {float(_N_BINS)} AS width
    FROM orders
),
binned AS (
    SELECT LEAST({_N_BINS - 1},
                 FLOOR((o_totalprice - b.lo) / b.width)::BIGINT) AS bin,
           b.lo, b.width, o_totalprice
    FROM orders CROSS JOIN bounds b
)
SELECT bin,
       lo + bin::DOUBLE * width            AS bin_lo,
       lo + (bin + 1)::DOUBLE * width      AS bin_hi,
       COUNT(*)::BIGINT                    AS n_orders,
       SUM(o_totalprice::DECIMAL(18,2))::DOUBLE AS sum_value
FROM binned
GROUP BY bin, lo, width
ORDER BY bin
"""


# --- q132: portable HLL register sketch (hash-exact cross-engine) -----------


def q132_hll_register_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user HLL sketch per event type PLUS the merged-total
    grain, with the register math itself under the hash gate: the
    DataSketches paths (operators/sketches.py daily_distinct_sketches)
    are the production sketches but their binary state cannot be
    reproduced in DuckDB, so this query implements the HLL registers
    portably (md5 60-bit hash, 8 register bits, bit_length rho,
    register-wise MAX) and the oracle recomputes them token-for-token
    — the first sketch in the registry whose ESTIMATE is hash-checked,
    not test-pinned. The harmonic denominator stays an exact BIGINT
    (sum of 2^(53-M_j) + closed-form empty-register correction); the
    single float op is one literal/BIGINT divide at the boundary.

    The '__all__' grain is stacked into the SAME scan (explode of
    [event_type, '__all__']) — per-grain registers and the union
    sketch come out of one shuffle; register-wise-MAX mergeability
    (what a 100 TB rollup would do instead of restacking) is pinned by
    TestPortableHll. exact_distinct is carried for accuracy
    visibility at test SFs — it is the expensive exact path a real
    deployment would DROP (that's the point of the sketch).

    Reference scope: the reference's analytics use exact
    COUNT(DISTINCT) only (reference: warehouse/analytics_queries.sql);
    this is the scale substitute."""
    from ..operators import sketches

    events = load_table(spark, "events", sf_dir)
    stacked = events.select(
        F.explode(
            F.array(F.col("event_type"), F.lit("__all__"))
        ).alias("grain"),
        "user_id",
    )
    per_user = stacked.groupBy("grain", "user_id").agg(
        F.count(F.lit(1)).alias("n_rows_u")
    )
    idx, rho = sketches.hll_register_cols("user_id")
    regs = (
        per_user.select("grain", "n_rows_u", idx, rho)
        .groupBy("grain", "hll_idx")
        .agg(
            F.max("hll_rho").alias("m_j"),
            F.sum("n_rows_u").alias("n_rows_part"),
            F.count(F.lit(1)).cast("long").alias("n_users_part"),
        )
    )
    est = sketches.hll_estimate(regs, ["grain"])
    totals = regs.groupBy("grain").agg(
        F.sum("n_rows_part").cast("long").alias("n_rows"),
        F.sum("n_users_part").cast("long").alias("exact_distinct"),
    )
    return (
        est.join(totals, "grain")
        .select(
            "grain",
            "n_rows",
            "exact_distinct",
            "n_registers_hit",
            "sketch_sum",
            "hll_estimate",
        )
        .orderBy("grain")
    )


Q132_ORACLE = f"""
WITH stacked AS (
    SELECT event_type AS grain, user_id FROM events
    UNION ALL
    SELECT '__all__' AS grain, user_id FROM events
),
per_user AS (
    SELECT grain, user_id, COUNT(*)::BIGINT AS n_rows_u
    FROM stacked GROUP BY grain, user_id
),
hashed AS (
    SELECT grain, n_rows_u,
           ('0x' || substring(md5('hll' || user_id::VARCHAR), 1, 15))::BIGINT
               AS h
    FROM per_user
),
rowsx AS (
    SELECT grain, n_rows_u, (h & 255)::INT AS hll_idx,
           (CASE WHEN (h >> 8) = 0 THEN 53
                 ELSE 53 - length(bin(h >> 8)) END)::INT AS rho
    FROM hashed
),
regs AS (
    SELECT grain, hll_idx, MAX(rho) AS m_j,
           SUM(n_rows_u)::BIGINT AS n_rows_part,
           COUNT(*)::BIGINT AS n_users_part
    FROM rowsx GROUP BY grain, hll_idx
)
SELECT grain,
       SUM(n_rows_part)::BIGINT AS n_rows,
       SUM(n_users_part)::BIGINT AS exact_distinct,
       COUNT(*)::INT AS n_registers_hit,
       (SUM(1::BIGINT << (53 - m_j))
        + (256 - COUNT(*)) * 9007199254740992)::BIGINT AS sketch_sum,
       {sketches_mod.HLL_EST_NUMERATOR!r} / (SUM(1::BIGINT << (53 - m_j))
        + (256 - COUNT(*)) * 9007199254740992)::DOUBLE AS hll_estimate
FROM regs
GROUP BY grain
ORDER BY grain
"""


QUERIES = {
    "q53_order_value_quantiles": q53_order_value_quantiles,
    "q132_hll_register_sketch": q132_hll_register_sketch,
    "q57_status_pivot": q57_status_pivot,
    "q58_status_unpivot": q58_status_unpivot,
    "q60_grouping_sets": q60_grouping_sets,
    "q61_distribution_windows": q61_distribution_windows,
    "q80_sliding_window_activity": q80_sliding_window_activity,
    "q86_key_skew_report": q86_key_skew_report,
    "q89_value_histogram": q89_value_histogram,
}
ORACLES = {
    "q53_order_value_quantiles": Q53_ORACLE,
    "q57_status_pivot": Q57_ORACLE,
    "q58_status_unpivot": Q58_ORACLE,
    "q60_grouping_sets": Q60_ORACLE,
    "q61_distribution_windows": Q61_ORACLE,
    "q80_sliding_window_activity": Q80_ORACLE,
    "q86_key_skew_report": Q86_ORACLE,
    "q89_value_histogram": Q89_ORACLE,
    "q132_hll_register_sketch": Q132_ORACLE,
}
