"""Round-4 batch-3 additions: diversity-balanced sampling and zone-map
file skipping — semantic invariants beyond the oracle hash gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_etl_a_rien_spark.queries import REGISTRY, _load_extensions

_load_extensions()


def test_diversity_sample_caps_and_determinism(spark, sf_dir):
    from projet_etl_a_rien_spark.queries_llm import DIVERSITY_CAP

    q = REGISTRY["corpus_diversity_sample"].fn
    out = q(spark, sf_dir).persist()
    per_cell = out.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    assert per_cell, "sample is empty"
    assert all(r["n"] <= DIVERSITY_CAP for r in per_cell)
    # rank is dense 1..n within each cell
    mx = out.groupBy("cluster").agg(
        F.max("rn").alias("mx"), F.count("*").alias("n")
    ).collect()
    assert all(r["mx"] == r["n"] for r in mx)
    # deterministic: a second run selects the identical id set
    again = {r["doc_id"] for r in q(spark, sf_dir).select("doc_id").collect()}
    assert {r["doc_id"] for r in out.select("doc_id").collect()} == again
    out.unpersist()


def test_zone_map_skipping_is_conservative(spark, sf_dir):
    """Pruning on the zone map must never drop a matching row: every row
    satisfying the predicate lives in a zone the map did NOT flag as
    skippable — and the time predicate actually skips most zones while
    the value predicate skips almost none (the layout-correlation
    contrast the query documents)."""
    from projet_etl_a_rien_spark.catalog import load_table
    from projet_etl_a_rien_spark.queries_extra import (
        ZM_TS_HI,
        ZM_TS_LO,
        ZM_VAL_HI,
        ZM_VAL_LO,
    )

    zones = REGISTRY["events_zone_map"].fn(spark, sf_dir).persist()
    e = load_table(spark, sf_dir, "events").withColumn(
        "zone_hour", F.date_trunc("hour", F.col("ts"))
    )
    in_time = e.where(
        (F.col("ts") >= F.lit(ZM_TS_LO).cast("timestamp_ntz"))
        & (F.col("ts") <= F.lit(ZM_TS_HI).cast("timestamp_ntz"))
    )
    escaped = in_time.join(
        zones.where(F.col("skip_time_pred") == 1).select("zone_hour"),
        "zone_hour",
        "left_semi",
    )
    assert escaped.count() == 0
    in_val = e.where(
        (F.col("value") >= ZM_VAL_LO) & (F.col("value") <= ZM_VAL_HI)
    )
    escaped_v = in_val.join(
        zones.where(F.col("skip_value_pred") == 1).select("zone_hour"),
        "zone_hour",
        "left_semi",
    )
    assert escaped_v.count() == 0
    stats = zones.agg(
        F.count("*").alias("n"),
        F.sum("skip_time_pred").alias("st"),
        F.sum("skip_value_pred").alias("sv"),
    ).collect()[0]
    assert stats["st"] > stats["n"] * 0.8, "time predicate should skip most zones"
    # the layout-correlation contrast: the value slice straddles the
    # median, so it prunes strictly fewer zones than the layout-aligned
    # time slice (at sf0.01+ it prunes almost none; sparse sf0.001 zones
    # miss the slice by chance more often, hence relative not absolute)
    assert stats["sv"] < stats["st"], "value predicate should skip fewer zones"
    zones.unpersist()


def test_triangle_counts_known_graph(spark):
    from projet_etl_a_rien_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4} (4 triangles, each node in 3) + pendant 5 + an
    # isolated triangle {6,7,8}; edges fed with duplicates, reversals
    # and a self-loop to exercise normalization
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (2, 1), (3, 1),          # reversed duplicates
        (4, 4),                   # self-loop
        (4, 5),                   # pendant, no triangle
        (6, 7), (7, 8), (8, 6),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(df).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 6: 1, 7: 1, 8: 1}


def test_triangle_counts_string_ids(spark):
    from projet_etl_a_rien_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")], "src string, dst string"
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}
