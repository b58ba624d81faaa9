"""Hypertable-style hierarchical time rollup.

One scan, many grains: the minute-grain aggregate pays the ONLY
fact-table shuffle; hour derives from minute and day from hour — each a
re-aggregation of an already-tiny table. The naive alternatives both
lose at scale: GROUPING SETS/Expand multiplies every map-side row by the
number of grains before the shuffle, and per-grain separate queries scan
the fact once per grain. Hierarchical reuse is how time-series stores
(continuous aggregates / materialized rollups) maintain their grain
pyramid, expressed here as one DataFrame lineage.

Additivity is what makes the derivation legal: count and exact-cent sums
re-aggregate losslessly (avg is derived at read time as sum/count;
non-additive aggs like distinct counts need sketches — see
approx_distinct_parts for the mergeable-HLL pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    grains: tuple[str, ...] = ("minute", "hour", "day"),
) -> DataFrame:
    """(grain, bucket_start, n_events, sum_cents) for each grain, finest
    grain aggregated from the raw events, each coarser grain from the
    previous one. ``grains`` must be ordered fine → coarse."""
    finest = grains[0]
    # Each grain table is persisted: it feeds BOTH the output union and
    # the next-coarser aggregation, and without the cache every union
    # branch re-runs its whole upstream lineage — the plan shows one
    # FileScan of the fact per grain instead of one total. The cached
    # tables are one row per bucket (minutes of history), negligible at
    # any scale.
    cur = (
        events.groupBy(F.date_trunc(finest, F.col(ts_col)).alias("bucket_start"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias("sum_cents"),
        )
        .persist()
    )
    out = cur.select(F.lit(finest).alias("grain"), "*")
    for grain in grains[1:]:
        cur = (
            cur.groupBy(
                F.date_trunc(grain, F.col("bucket_start")).alias("bucket_start")
            )
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_cents").alias("sum_cents"),
            )
            .persist()
        )
        out = out.unionByName(cur.select(F.lit(grain).alias("grain"), "*"))
    return out
