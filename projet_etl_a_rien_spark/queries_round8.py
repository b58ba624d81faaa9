"""Round-8 registrations: the at-scale approximate twin for triangle
counting (DOULION edge sampling).

Imported for its registration side effects by ``queries._load_extensions``;
same parity rules as every other registration module (adjacent DuckDB
oracle, identical aliases, exact integer arithmetic wherever both engines
must hash-agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .operators import graph
from .queries import register

# DOULION sampling constants — interpolated verbatim into the oracle.
TRI_KEEP_NUM = 1
TRI_KEEP_DEN = 2
TRI_SALT = "tri8"


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same co-purchase edge derivation as parts_triangle_counts
    (queries_round4): parts sharing an order form an edge."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    return (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
    )


@register(
    "parts_triangle_estimate",
    f"""
WITH pairs AS (
    SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                    GREATEST(a.l_partkey, b.l_partkey) AS v
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sampled AS (
    SELECT u, v FROM pairs
    WHERE CAST('0x' || substr(md5(CAST(u AS VARCHAR) || ':'
                || CAST(v AS VARCHAR) || ':{TRI_SALT}'), 1, 8) AS BIGINT)
          % {TRI_KEEP_DEN} < {TRI_KEEP_NUM}
),
tri AS (
    SELECT e1.u AS x, e1.v AS y, e2.v AS z
    FROM sampled e1
    JOIN sampled e2 ON e1.u = e2.u AND e1.v < e2.v
    JOIN sampled e3 ON e3.u = e1.v AND e3.v = e2.v
)
SELECT (SELECT COUNT(*) FROM sampled) AS n_sampled_edges,
       (SELECT COUNT(*) FROM tri) AS n_sampled_triangles,
       CAST((SELECT COUNT(*) FROM tri) * {TRI_KEEP_DEN ** 3}
            / {TRI_KEEP_NUM ** 3} AS BIGINT) AS est_triangles
""",
    doc="DOULION approximate triangle count over the co-purchase graph "
    f"(operators/graph.py:triangle_count_estimate): every undirected "
    f"edge survives a deterministic salted-md5 coin with p = "
    f"{TRI_KEEP_NUM}/{TRI_KEEP_DEN}, triangles in the sparsified graph "
    "are enumerated exactly (degree-oriented intersection) and scaled "
    "by 1/p**3 — the documented 100 TB path for triangle statistics, "
    "cutting the Theta(E^1.5) intersection work ~2.8x at p=1/2 and "
    "~31x at p=1/10 while staying unbiased. The hash coin makes the "
    "sampled subgraph partition-independent and exactly replayable, "
    "which is what lets the oracle pin the estimate hash-exactly.",
)
def q_parts_triangle_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return graph.triangle_count_estimate(
        _copurchase_edges(spark, sf_dir),
        keep_num=TRI_KEEP_NUM,
        keep_den=TRI_KEEP_DEN,
        salt=TRI_SALT,
    )
