"""Deep relational coverage: TPC-H-shaped join/agg/subquery patterns plus
the as-of join operator — widening SURVEY.md §2.10's generalized surface
with the query shapes a warehouse actually runs (star joins with local
predicates, correlated EXISTS, scalar subqueries, argmax-by-group,
conditional-aggregate ratios, as-of enrichment).

Same parity rules as queries.py: exact-cents money math, identical column
aliases both sides, total tie-break ordering on every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .functions.exactmath import avg_money, sum_money, sum_product_money
from .operators.asof import asof_join
from .queries import register

_REV = "CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) / 100.0"


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@register(
    "tpch_q5_local_supplier_volume",
    f"""
SELECT n.n_name AS nation, {_REV} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
""",
    doc="TPC-H Q5 shape: 6-way star join with the local-supplier equality "
    "(customer and supplier share a nation) — the join-reorder stress case; "
    "dims broadcast, single fact shuffle.",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        "o_orderdate >= TIMESTAMP_NTZ'1996-01-01 00:00:00'"
        " AND o_orderdate < TIMESTAMP_NTZ'1997-01-01 00:00:00'"
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            sum_product_money("l_extendedprice", 1 - F.col("l_discount")).alias(
                "revenue"
            )
        )
    )


@register(
    "tpch_q7_nation_volume",
    f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
       {_REV} AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY n1.n_name, n2.n_name, 3
""",
    doc="TPC-H Q7 shape: bidirectional nation-pair volume (disjunctive join "
    "predicate over two aliases of the same dim) by ship year.",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            sum_product_money("l_extendedprice", 1 - F.col("l_discount")).alias(
                "revenue"
            )
        )
    )


@register(
    "tpch_q10_returned_top_customers",
    f"""
SELECT c.c_custkey, c.c_name, {_REV} AS revenue, n.n_name AS nation
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    doc="TPC-H Q10 shape: lost-revenue ranking over returned items in a "
    "quarter; deterministic top-20.",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        "o_orderdate >= TIMESTAMP_NTZ'1996-10-01 00:00:00'"
        " AND o_orderdate < TIMESTAMP_NTZ'1997-01-01 00:00:00'"
    )
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            sum_product_money("l_extendedprice", 1 - F.col("l_discount")).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "nation")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q14_promo_revenue",
    """
SELECT 100.0 * CAST(SUM(CAST(ROUND(CASE WHEN p.p_type = 'PROMO'
                 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END * 100) AS BIGINT)) AS BIGINT)
             / CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT)
       AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
""",
    doc="TPC-H Q14 shape: conditional-aggregate ratio (promo revenue share) "
    "— integer-cents numerator and denominator, one deterministic division.",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").where(
        "l_shipdate >= TIMESTAMP_NTZ'1996-03-01 00:00:00'"
        " AND l_shipdate < TIMESTAMP_NTZ'1996-04-01 00:00:00'"
    )
    p = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    promo_cents = F.sum(F.round(promo * 100).cast("long"))
    total_cents = F.sum(F.round(disc * 100).cast("long"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg((F.lit(100.0) * promo_cents / total_cents).alias("promo_revenue_pct"))
    )


@register(
    "tpch_q15_top_supplier",
    f"""
WITH rev AS (
    SELECT l_suppkey, {_REV} AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
    doc="TPC-H Q15 shape: argmax over an aggregated subquery (top supplier "
    "by quarterly revenue, ties kept) — scalar-subquery-as-filter pattern.",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").where(
        "l_shipdate >= TIMESTAMP_NTZ'1996-01-01 00:00:00'"
        " AND l_shipdate < TIMESTAMP_NTZ'1996-04-01 00:00:00'"
    )
    rev = l.groupBy("l_suppkey").agg(
        sum_product_money("l_extendedprice", 1 - F.col("l_discount")).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("mx"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q18_large_orders",
    """
SELECT c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       SUM(l.l_quantity) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
)
GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 10
""",
    doc="TPC-H Q18 shape: large-volume orders via IN over a grouped HAVING "
    "subquery (semi join on an aggregate).",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > 300)
        .select("l_orderkey")
    )
    return (
        l.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q22_idle_rich_customers",
    """
WITH avg_bal AS (
    SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0 / COUNT(c_acctbal) AS ab
    FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0 AS totacctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.ab
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c.c_nationkey
""",
    doc="TPC-H Q22 shape: scalar subquery (above-average balance) + "
    "correlated NOT EXISTS (no recent orders — every fixture customer has "
    "SOME order, so the recency predicate keeps the anti join non-trivial), "
    "grouped by nation.",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    ab = c.where(F.col("c_acctbal") > 0.0).agg(avg_money("c_acctbal").alias("ab"))
    recent = o.where("o_orderdate >= TIMESTAMP_NTZ'1999-01-01 00:00:00'")
    return (
        c.crossJoin(F.broadcast(ab))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            sum_money("c_acctbal").alias("totacctbal"),
        )
    )


@register(
    "salted_segment_revenue",
    """
SELECT c.c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_totalprice
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
    doc="Skew-salted join (operators/joins.py): the orders->customer join "
    "run through an 8-way salt — hot keys spread over 8 reducers, right "
    "side replicated 8x. The oracle is the PLAIN join: result must be "
    "invariant to the physical salting.",
)
def q_salted_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.joins import salted_join

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(o, c, "o_custkey", "c_custkey", n_salt=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        sum_money("o_totalprice").alias("sum_totalprice"),
    )


@register(
    "events_orders_asof",
    """
WITH u AS (
    SELECT user_id AS k, ts AS t, 1 AS side, event_id, NULL::BIGINT AS o_orderkey
    FROM events
    UNION ALL
    SELECT o_custkey, o_orderdate, 0, NULL, o_orderkey FROM orders
),
w AS (
    SELECT event_id, k, t, side,
           LAST_VALUE(o_orderkey IGNORE NULLS) OVER (
               PARTITION BY k ORDER BY t, side, o_orderkey
               ROWS UNBOUNDED PRECEDING) AS asof_o_orderkey
    FROM u
)
SELECT event_id, k AS user_id, t AS ts, asof_o_orderkey
FROM w WHERE side = 1
""",
    doc="As-of join (operators/asof.py): each event enriched with the "
    "latest order of the same user at or before event time — union + one "
    "window pass, sort-merge cost, no range cross-join. An operator "
    "Spark's API lacks, composed per SURVEY.md §2.10 rule (a).",
)
def q_events_orders_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_orderkey")
    out = asof_join(
        e, o,
        left_on="user_id", right_on="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        payload=["o_orderkey"],
    )
    return out.select("event_id", "user_id", "ts", "asof_o_orderkey")


@register(
    "events_in_hot_windows",
    """
WITH big AS (
    SELECT event_id AS window_id,
           ts - INTERVAL 30 MINUTE AS w_start,
           ts + INTERVAL 30 MINUTE AS w_end
    FROM events ORDER BY value DESC, event_id LIMIT 20
)
SELECT b.window_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
FROM events e JOIN big b ON e.ts >= b.w_start AND e.ts <= b.w_end
GROUP BY b.window_id
""",
    doc="Bucketized range join (operators/joins.py range_join): all events "
    "inside the hour-wide window around each of the 20 highest-value "
    "events — no equality key, so the naive plan is a nested-loop scan; "
    "the operator explodes each interval onto hour buckets and equi-joins "
    "on the bucket id (each pair meets in exactly one bucket: the "
    "point's). Oracle is the plain non-equi join DuckDB runs directly.",
)
def q_events_in_hot_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.joins import range_join

    e = _t(spark, sf_dir, "events").select("ts", "value")
    big = (
        _t(spark, sf_dir, "events")
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(20)
        .select(
            F.col("event_id").alias("window_id"),
            F.expr("ts - INTERVAL 30 MINUTES").alias("w_start"),
            F.expr("ts + INTERVAL 30 MINUTES").alias("w_end"),
        )
    )
    joined = range_join(e, big, "ts", "w_start", "w_end", bucket_seconds=3_600)
    return joined.groupBy("window_id").agg(
        F.count("*").alias("n_events"),
        (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("sum_value"),
    )


@register(
    "events_orders_asof_cogroup",
    """
WITH u AS (
    SELECT user_id AS k, ts AS t, 1 AS side, event_id, NULL::BIGINT AS o_orderkey
    FROM events
    UNION ALL
    SELECT o_custkey, o_orderdate, 0, NULL, o_orderkey FROM orders
),
w AS (
    SELECT event_id, k, t, side,
           LAST_VALUE(o_orderkey IGNORE NULLS) OVER (
               PARTITION BY k ORDER BY t, side, o_orderkey
               ROWS UNBOUNDED PRECEDING) AS asof_o_orderkey
    FROM u
)
SELECT event_id, k AS user_id, t AS ts, asof_o_orderkey
FROM w WHERE side = 1
""",
    doc="The SAME as-of semantics as events_orders_asof, computed via "
    "cogroup().applyInPandas (pandas merge_asof per key batch) — the "
    "cogrouped-map escape hatch for as-of variants the union+window trick "
    "can't express; proven equivalent by sharing the window-form oracle.",
)
def q_events_orders_asof_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.pandas_agg import cogrouped_asof_join

    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.col("user_id"), "ts"
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ots"),
        "o_orderkey",
    )
    return cogrouped_asof_join(
        ev,
        orders,
        key="user_id",
        left_ts="ts",
        right_ts="ots",
        payload_col="o_orderkey",
        left_cols=("event_id", "user_id", "ts"),
    )
