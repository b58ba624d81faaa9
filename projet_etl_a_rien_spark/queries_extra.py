"""Additional relational-surface registrations: pivot, cube, grouping
sets (via the SQL entry point), ordered-arg aggregates, approximate
distinct — completing the generalized analytics surface of SURVEY.md
§2.10 beyond what queries.py covers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .functions.exactmath import sum_money
from .queries import register


@register(
    "pivot_status_by_priority",
    """
SELECT o_orderpriority,
       COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = 'F'), 0) AS F,
       COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = 'O'), 0) AS O,
       COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = 'P'), 0) AS P
FROM orders
GROUP BY o_orderpriority
""",
    doc="Pivot (explicit value list → conditional aggregation); absent cells coalesced to 0.",
)
def q_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("F", "O", "P")],
    )


@register(
    "cube_returnflag_status",
    """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    doc="CUBE super-aggregates (all 4 grouping sets).",
)
def q_cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), sum_money("l_extendedprice").alias("sum_price")
    )


@register(
    "sql_grouping_sets",
    """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
""",
    doc="Explicit GROUPING SETS through the engine's SQL entry point (spark.sql over temp views).",
)
def q_sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "nation_customer_extremes",
    """
SELECT c_nationkey,
       arg_max(c_name, c_custkey) AS last_customer,
       arg_min(c_name, c_custkey) AS first_customer,
       MAX(c_acctbal) AS max_acctbal
FROM customer
GROUP BY c_nationkey
""",
    doc="Ordered-argument aggregates max_by/min_by (↔ arg_max/arg_min) on a unique key.",
)
def q_nation_customer_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.max_by("c_name", "c_custkey").alias("last_customer"),
        F.min_by("c_name", "c_custkey").alias("first_customer"),
        F.max("c_acctbal").alias("max_acctbal"),
    )


@register(
    "approx_distinct_parts",
    """
SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
       COUNT(DISTINCT l_suppkey) AS exact_suppliers,
       TRUE AS parts_within_5pct,
       TRUE AS suppliers_within_5pct
FROM lineitem
""",
    doc="approx_count_distinct (HLL): the 100 TB substitute for exact distinct "
    "(SURVEY.md §4.2). HLL sketches are engine-specific, so the cross-engine "
    "contract is an error-bound assertion: the query runs the HLL estimate AND "
    "the exact count, returning the exact counts plus within-5%% booleans; the "
    "oracle asserts the booleans are TRUE. The hash still fails if Spark's "
    "estimate drifts outside the bound, so the sketch is genuinely exercised.",
)
def q_approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def within(approx: str, exact: str):
        a, e = F.col(approx).cast("double"), F.col(exact)
        return F.abs(a - e) / e <= 0.05

    agg = li.agg(
        F.count_distinct(F.col("l_partkey")).alias("exact_parts"),
        F.count_distinct(F.col("l_suppkey")).alias("exact_suppliers"),
        F.approx_count_distinct("l_partkey").alias("_ap"),
        F.approx_count_distinct("l_suppkey").alias("_as"),
    )
    return agg.select(
        "exact_parts",
        "exact_suppliers",
        within("_ap", "exact_parts").alias("parts_within_5pct"),
        within("_as", "exact_suppliers").alias("suppliers_within_5pct"),
    )


@register(
    "orders_lag_lead_gap",
    """
SELECT o_custkey, o_orderkey,
       CAST(EXTRACT(EPOCH FROM o_orderdate
            - LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey)) AS BIGINT)
         AS gap_seconds
FROM orders
""",
    doc="lag/lead analytic windows: inter-order gap per customer in seconds.",
)
def q_orders_lag_lead_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # unix_micros needs TIMESTAMP; the ntz→ts cast is exact because the
    # session timezone is pinned UTC (session.RUNTIME_CONFS).
    as_ts = F.col("o_orderdate").cast("timestamp")
    prev = F.lag(as_ts).over(w)
    gap = (F.unix_micros(as_ts) - F.unix_micros(prev)) / F.lit(1_000_000)
    return o.select(
        "o_custkey", "o_orderkey", gap.cast("long").alias("gap_seconds")
    )


@register(
    "order_price_percentiles",
    """
SELECT o_orderpriority,
       quantile_cont(o_totalprice, 0.25) AS p25,
       quantile_cont(o_totalprice, 0.50) AS p50,
       quantile_cont(o_totalprice, 0.90) AS p90,
       quantile_cont(o_totalprice, 0.99) AS p99
FROM orders GROUP BY o_orderpriority
""",
    doc="Exact order statistics per group: Spark's `percentile` aggregate "
    "and DuckDB's quantile_cont share the linear-interpolation definition "
    "(rank = p*(n-1)), so the doubles match bit-for-bit — the exact "
    "baseline approx_percentile trades against at 100 TB (exact needs the "
    "per-group value multiset; approx_percentile is a mergeable sketch).",
)
def q_order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    p = F.expr("percentile(o_totalprice, array(0.25, 0.50, 0.90, 0.99))")
    return o.groupBy("o_orderpriority").agg(
        p[0].alias("p25"), p[1].alias("p50"), p[2].alias("p90"), p[3].alias("p99")
    )


@register(
    "events_latest_per_user",
    """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
       ts AS last_ts
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
""",
    doc="Changelog compaction (SCD-1 / CDC upsert collapse): newest event "
    "per user with a total tie-break — one key shuffle, no global sort "
    "(operators/compaction.py latest_by_key).",
)
def q_events_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.compaction import latest_by_key

    ev = load_table(spark, sf_dir, "events")
    return latest_by_key(
        ev, ["user_id"], "ts", tiebreak_cols=["event_id"]
    ).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("ts").alias("last_ts"),
    )


@register(
    "events_time_rollup",
    """
WITH m AS (
    SELECT date_trunc('minute', ts) AS bucket_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events GROUP BY 1
),
h AS (
    SELECT date_trunc('hour', bucket_start) AS bucket_start,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(sum_cents) AS BIGINT) AS sum_cents
    FROM m GROUP BY 1
),
d AS (
    SELECT date_trunc('day', bucket_start) AS bucket_start,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(sum_cents) AS BIGINT) AS sum_cents
    FROM h GROUP BY 1
)
SELECT 'minute' AS grain, * FROM m
UNION ALL SELECT 'hour', * FROM h
UNION ALL SELECT 'day', * FROM d
""",
    doc="Hypertable-style hierarchical time rollup (operators/rollup.py): "
    "minute/hour/day grains from ONE fact shuffle — each coarser grain "
    "re-aggregates the previous one (additive count + exact-cent sums), "
    "the continuous-aggregate pyramid pattern; no Expand row "
    "multiplication, no per-grain rescans.",
)
def q_events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.rollup import time_rollup

    return time_rollup(load_table(spark, sf_dir, "events"))


@register(
    "order_price_sketch_bounds",
    """
SELECT o_orderpriority, true AS p50_ok, true AS p90_ok
FROM orders GROUP BY o_orderpriority
""",
    doc="Mergeable percentile sketch with an in-query accuracy contract: "
    "approx_percentile (KLL-style, map-side combinable — the 100 TB path "
    "exact percentiles can't take) must land within 2% relative of the "
    "exact per-group quantile, asserted INSIDE the query so the oracle "
    "just states the contract holds — same pattern as "
    "approx_distinct_parts.",
)
def q_order_price_sketch_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    exact = F.expr("percentile(o_totalprice, array(0.5, 0.9))")
    approx = F.expr("approx_percentile(o_totalprice, array(0.5, 0.9), 1000)")

    def within(i: int):
        return (
            F.abs(approx[i] - exact[i]) / exact[i] < 0.02
        )

    return o.groupBy("o_orderpriority").agg(
        within(0).alias("p50_ok"), within(1).alias("p90_ok")
    )


@register(
    "events_rolling_hour_value",
    """
SELECT event_id,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
         AS BIGINT) AS roll_cents
FROM events
""",
    doc="Time-RANGE window frame (not ROWS): per-user rolling 1-hour value "
    "sum — the frame is event-time width, so it is insensitive to event "
    "density, the property rows-frames can't give. One key shuffle, "
    "per-partition ordered scan; exact cents keep it order-independent.",
)
def q_events_rolling_hour_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # interval RANGE frames are SQL-only (the PySpark Window API's
    # rangeBetween takes numeric offsets); the ntz->ts cast is exact
    # under the pinned-UTC session
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "events_rolling_src"
    )
    return spark.sql(
        """
SELECT event_id,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
         AS roll_cents
FROM events_rolling_src"""
    )


@register(
    "order_price_histogram",
    """
SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
            WHEN o_totalprice >= 600000 THEN 13
            ELSE FLOOR(o_totalprice / 50000) + 1 END AS BIGINT) AS bucket,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1
""",
    doc="Equi-width histogram via width_bucket: the one-shuffle "
    "distribution profile (overflow rows land in bucket n+1 per the SQL "
    "spec, which both engines implement).",
)
def q_order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.expr("CAST(width_bucket(o_totalprice, 0, 600000, 12) AS BIGINT)").alias(
            "bucket"
        )
    ).agg(F.count("*").alias("n_orders"))


@register(
    "data_quality_report",
    """
SELECT 'orders_custkey_fk' AS constraint_name,
       (SELECT COUNT(*) FROM orders o LEFT JOIN customer c
        ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) AS violations
UNION ALL
SELECT 'lineitem_orderkey_fk',
       (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
        ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
UNION ALL
SELECT 'orders_orderkey_unique',
       (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
UNION ALL
SELECT 'orders_totalprice_nonneg',
       (SELECT COUNT(*) FROM orders WHERE o_totalprice < 0)
UNION ALL
SELECT 'customer_name_not_null',
       (SELECT COUNT(*) FROM customer WHERE c_name IS NULL)
""",
    doc="Expectations-style data-quality report (DeeQu/dbt-test shape): "
    "referential integrity via anti joins, key uniqueness, domain and "
    "not-null constraints — each one shuffle at most, no forced broadcasts "
    "(AQE chooses broadcast when a side fits); the report is the artifact "
    "a 100 TB ingest gate actually blocks on.",
)
def q_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    l = load_table(spark, sf_dir, "lineitem")

    def one(name, cnt_df):
        return cnt_df.select(
            F.lit(name).alias("constraint_name"),
            F.col("violations").cast("long").alias("violations"),
        )

    checks = [
        one(
            "orders_custkey_fk",
            # No broadcast hint: `customer` grows with the fact tables, so a
            # forced broadcast OOMs at 100×. AQE picks broadcast when the
            # post-scan size actually fits (r3 VERDICT "What's wrong" #1).
            o.join(c, o.o_custkey == c.c_custkey, "left_anti").agg(
                F.count("*").alias("violations")
            ),
        ),
        one(
            "lineitem_orderkey_fk",
            l.join(o, l.l_orderkey == o.o_orderkey, "left_anti").agg(
                F.count("*").alias("violations")
            ),
        ),
        one(
            "orders_orderkey_unique",
            o.agg(
                (F.count("*") - F.count_distinct("o_orderkey")).alias("violations")
            ),
        ),
        one(
            "orders_totalprice_nonneg",
            o.where("o_totalprice < 0").agg(F.count("*").alias("violations")),
        ),
        one(
            "customer_name_not_null",
            c.where("c_name IS NULL").agg(F.count("*").alias("violations")),
        ),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionByName(ch)
    return out


@register(
    "table_stats_orders",
    """
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT o_custkey) AS n_customers,
       MIN(o_orderdate) AS min_date,
       MAX(o_orderdate) AS max_date,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       COUNT(DISTINCT o_orderstatus) AS n_statuses
FROM orders
""",
    doc="ANALYZE-style table statistics in one pass (row count, per-column "
    "distinct counts and min/max) — the CBO/stats-collection shape; a "
    "single aggregation, partials combined map-side.",
)
def q_table_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("o_custkey").alias("n_customers"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.count_distinct("o_orderstatus").alias("n_statuses"),
    )


@register(
    "events_funnel_counts",
    """
WITH stages AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
           MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
    FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       COUNT(t_signup) AS reached_signup,
       CAST(SUM(CASE WHEN t_click > t_signup THEN 1 ELSE 0 END) AS BIGINT)
         AS signup_then_click,
       CAST(SUM(CASE WHEN t_purchase > t_click AND t_click > t_signup
                THEN 1 ELSE 0 END) AS BIGINT) AS full_funnel
FROM stages
""",
    doc="Ordered funnel analysis: per-user first-touch timestamps per "
    "stage via conditional MIN (one shuffle, no joins, no window sort), "
    "then strict ordering predicates count stage-to-stage progression — "
    "the product-analytics shape sessionization doesn't answer.",
)
def q_events_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))
    stages = ev.groupBy("user_id").agg(
        first("signup").alias("t_signup"),
        first("click").alias("t_click"),
        first("purchase").alias("t_purchase"),
    )
    return stages.agg(
        F.count("*").alias("n_users"),
        F.count("t_signup").alias("reached_signup"),
        F.sum(
            F.when(F.col("t_click") > F.col("t_signup"), 1).otherwise(0)
        ).alias("signup_then_click"),
        F.sum(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_signup")),
                1,
            ).otherwise(0)
        ).alias("full_funnel"),
    )


@register(
    "events_user_anomalies",
    """
WITH s AS (
    SELECT user_id,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sc,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT) * CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sq
    FROM events GROUP BY user_id
),
z AS (
    SELECT e.user_id,
           abs(CAST(ROUND(e.value * 100) AS BIGINT) - s.sc / s.n)
             / sqrt(GREATEST(s.sq / s.n - (s.sc / s.n) * (s.sc / s.n), 1e-9)) AS zscore
    FROM events e JOIN s ON e.user_id = s.user_id
)
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN zscore > 2.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM z GROUP BY user_id
""",
    doc="Per-user anomaly counts by z-score: mean and variance from EXACT "
    "integer-cent sums (population variance = sq/n - mean^2 — every term "
    "is a deterministic fp op over identical int64s, so thresholding is "
    "engine-exact even at the boundary). Two shuffles on the user key; "
    "the stats join is a shuffle join — the per-user aggregate has "
    "unbounded cardinality (one row per user), so broadcasting it would "
    "OOM at scale; the groupBy already partitioned both sides by user_id "
    "so the join reuses that exchange.",
)
def q_events_user_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("long")
    s = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(c).alias("sc"),
        F.sum(c * c).alias("sq"),
    )
    mean = F.col("sc") / F.col("n")
    var = F.greatest(F.col("sq") / F.col("n") - mean * mean, F.lit(1e-9))
    z = (
        ev.join(s, "user_id")
        .select(
            "user_id",
            (F.abs(c - mean) / F.sqrt(var)).alias("zscore"),
        )
    )
    return z.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("zscore") > 2.5, 1).otherwise(0)).alias("n_anomalies"),
    )


@register(
    "orders_cohort_retention",
    """
WITH fm AS (
    SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS cohort
    FROM orders GROUP BY o_custkey
),
act AS (
    SELECT DISTINCT o_custkey, date_trunc('month', o_orderdate) AS om
    FROM orders
)
SELECT strftime(f.cohort, '%Y-%m') AS cohort_month,
       CAST(date_diff('month', f.cohort, a.om) AS BIGINT) AS months_since,
       CAST(COUNT(DISTINCT a.o_custkey) AS BIGINT) AS n_customers
FROM act a JOIN fm f ON a.o_custkey = f.o_custkey
GROUP BY 1, 2
""",
    doc="Cohort retention triangle: customers grouped by first-order "
    "month, counted in every later month they stay active — the "
    "engagement-decay rollup every subscription/marketplace analytics "
    "stack runs. Two custkey-keyed shuffles (first-order min, distinct "
    "activity) whose join reuses the same partitioning, then one small "
    "cohort×offset rollup; nothing global, nothing collected.",
)
def q_orders_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    fm = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", F.col("o_orderdate"))).alias("cohort")
    )
    act = o.select(
        "o_custkey", F.date_trunc("month", F.col("o_orderdate")).alias("om")
    ).distinct()
    return (
        act.join(fm, "o_custkey")
        .groupBy(
            F.date_format("cohort", "yyyy-MM").alias("cohort_month"),
            F.months_between(F.col("om"), F.col("cohort"))
            .cast("long")
            .alias("months_since"),
        )
        .agg(F.count_distinct("o_custkey").alias("n_customers"))
    )


@register(
    "events_key_skew_profile",
    """
WITH cnt AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
),
tot AS (
    SELECT CAST(SUM(n_events) AS BIGINT) AS total,
           CAST(COUNT(*) AS BIGINT) AS n_keys
    FROM cnt
)
SELECT user_id, n_events,
       n_events / total AS share,
       n_events * n_keys / total AS skew_ratio
FROM cnt, tot
ORDER BY n_events DESC, user_id
LIMIT 10
""",
    doc="Heavy-hitter key profiler for shuffle planning: the top-10 "
    "hottest join/agg keys with their share of all rows and their "
    "skew ratio vs the mean key (ratio >> 1 on a join key = salt it, "
    "or let AQE skew-split — SCALE_NOTES' own decision rule, computed "
    "from the data instead of discovered in a straggler task). One "
    "key-keyed count, a 1-row totals broadcast, TakeOrdered top-10; "
    "exact-int operands so both ratios are engine-identical.",
)
def q_events_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    tot = cnt.agg(
        F.sum("n_events").alias("total"), F.count("*").alias("n_keys")
    )
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n_events",
            (F.col("n_events") / F.col("total")).alias("share"),
            (F.col("n_events") * F.col("n_keys") / F.col("total")).alias(
                "skew_ratio"
            ),
        )
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(10)
    )


# ----------------------------------------------- zone maps / file skipping ----

# The fixed probe predicates the zone map is evaluated against: a time
# slice (correlates with arrival layout -> most zones skip) and a value
# slice (uncorrelated with layout -> almost nothing skips). The contrast
# IS the lesson: min/max zone stats prune only along columns the layout
# clusters, which is exactly what the Z-order export (events_zorder_values)
# buys for multi-column predicates.
ZM_TS_LO, ZM_TS_HI = "2024-01-10 00:00:00", "2024-01-12 00:00:00"
ZM_VAL_LO, ZM_VAL_HI = 30.0, 40.0


@register(
    "events_zone_map",
    f"""
SELECT date_trunc('hour', ts) AS zone_hour,
       COUNT(*) AS n_rows,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       CAST(MAX(ts) < TIMESTAMP '{ZM_TS_LO}'
            OR MIN(ts) > TIMESTAMP '{ZM_TS_HI}' AS BIGINT) AS skip_time_pred,
       CAST(MAX(value) < {ZM_VAL_LO}
            OR MIN(value) > {ZM_VAL_HI} AS BIGINT) AS skip_value_pred
FROM events
GROUP BY 1
""",
    doc="Zone-map (min/max/count) statistics per hourly zone — the "
    "file-skipping index a 100 TB lake consults before scanning: a zone "
    "whose [min, max] misses the predicate range is pruned without "
    "touching its rows. Emits skip flags for a time-slice predicate "
    "(layout-correlated: nearly every zone outside the slice skips) and "
    "a value-slice predicate (layout-uncorrelated: nearly none skip) — "
    "the contrast that motivates Z-order clustering. One map-side "
    "combinable aggregate; zone count, not row count, leaves the "
    "exchange.",
)
def q_events_zone_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(F.date_trunc("hour", F.col("ts")).alias("zone_hour")).agg(
        F.count("*").alias("n_rows"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        (
            (F.max("ts") < F.lit(ZM_TS_LO).cast("timestamp_ntz"))
            | (F.min("ts") > F.lit(ZM_TS_HI).cast("timestamp_ntz"))
        )
        .cast("long")
        .alias("skip_time_pred"),
        ((F.max("value") < ZM_VAL_LO) | (F.min("value") > ZM_VAL_HI))
        .cast("long")
        .alias("skip_value_pred"),
    )
