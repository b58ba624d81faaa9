"""Substep decomposition of the co-purchase triangle family (r14).

Times each stage of the shared pipeline in isolation (noop sink per
guide §1.4, labeled jobs per §1.5) so the optimization targets the
measured cost, not the suspected one:

  1. raw pair derivation (lineitem self-join)
  2. + md5 coin filter (p = 1/2)
  3. + distinct (the dedup exchange)
  4. enumeration alone over a pre-materialized canonical edge set
     (deg -> orient -> adjacency -> intersect), totals vs per-node

Usage: python tools/tri_decompose.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from projet_etl_a_rien_spark.queries import _load_extensions
from projet_etl_a_rien_spark.session import get_spark


def t(spark, label, df, runs=2):
    best = float("inf")
    for _ in range(runs):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{best:7.3f}  {label}", flush=True)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    _load_extensions()
    from projet_etl_a_rien_spark.queries_round8 import _copurchase_edges

    spark = get_spark("tri-decompose")
    spark.range(1000).selectExpr("sum(id)").collect()

    raw = _copurchase_edges(spark, sf_dir)
    t(spark, "1 raw pairs (self-join)", raw)

    und = raw.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    ).where(F.col("u") != F.col("v"))
    coin = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("u").cast("string"),
                        F.lit(":"),
                        F.col("v").cast("string"),
                        F.lit(":tri8"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    t(spark, "2 + coin filter p=1/2", und.where(coin < 1))
    t(spark, "3a + distinct (p=1)", und.distinct())
    t(spark, "3b + distinct (p=1/2)", und.where(coin < 1).distinct())

    # groupBy+explode alternative derivation (canonical, pre-distinct)
    from projet_etl_a_rien_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    alt = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps) - i - 1), "
                    "y -> struct(x AS u, y AS v))))"
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
    )
    t(spark, "4 alt derivation (groupBy+explode, pre-distinct)", alt)
    t(spark, "4b alt + distinct", alt.distinct())

    # enumeration alone over a materialized canonical edge set
    e = und.distinct().localCheckpoint(eager=True)
    print(f"         edge set: {e.count()} rows")
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("n"))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    t(spark, "5 degree agg", deg)
    withdeg = e.join(
        deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u"
    ).join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
    oriented = (
        withdeg.select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
            )
            .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
            .alias("e")
        )
        .select(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
    )
    t(spark, "6 orient (deg joins)", oriented)
    om = oriented.localCheckpoint(eager=True)
    adj = om.groupBy("a").agg(F.collect_list("b").alias("nbrs"))
    t(spark, "7 adjacency build", adj)
    am = adj.localCheckpoint(eager=True)
    # current 2-join intersect
    tri2 = (
        om.join(am.withColumnRenamed("a", "xk"), F.col("a") == F.col("xk"))
        .withColumnRenamed("nbrs", "na")
        .drop("xk")
        .join(am.withColumnRenamed("a", "yk"), F.col("b") == F.col("yk"))
        .withColumnRenamed("nbrs", "nb")
        .drop("yk")
    )
    t(
        spark,
        "8a intersect 2-join + corner explode + groupBy (current)",
        tri2.select(
            F.col("a").alias("x"),
            F.col("b").alias("y"),
            F.explode(F.array_intersect("na", "nb")).alias("z"),
        )
        .select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles")),
    )
    t(
        spark,
        "8b intersect 2-join, SUM of sizes (totals)",
        tri2.select(F.size(F.array_intersect("na", "nb")).alias("c")).agg(
            F.coalesce(F.sum("c"), F.lit(0)).alias("n")
        ),
    )
    # 1-join variant: edge side re-derived from adjacency explode
    base = am.select(
        F.col("a").alias("x"), F.col("nbrs").alias("na"), F.explode("nbrs").alias("y")
    )
    tri1 = base.join(
        am.select(F.col("a").alias("yk"), F.col("nbrs").alias("nb")),
        F.col("y") == F.col("yk"),
    )
    t(
        spark,
        "8c intersect 1-join (adj-explode), totals",
        tri1.select(F.size(F.array_intersect("na", "nb")).alias("c")).agg(
            F.coalesce(F.sum("c"), F.lit(0)).alias("n")
        ),
    )
    t(
        spark,
        "8d intersect 1-join, per-node corners",
        tri1.select(
            "x", F.col("y"), F.explode(F.array_intersect("na", "nb")).alias("z")
        )
        .select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles")),
    )
    spark.stop()


if __name__ == "__main__":
    main()
