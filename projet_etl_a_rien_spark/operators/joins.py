"""Join strategies Spark doesn't pick on its own: skew salting and
bucketized range joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions, but it cannot split a
single hot KEY whose build-side rows must colocate. ``salted_join`` is
the classic manual remedy for that case: spread each left key over
``n_salt`` sub-keys and replicate the right side ``n_salt`` times, so one
hot key's probe rows land on ``n_salt`` different reducers instead of
one. Cost model: right side is replicated n_salt× (use only when right
is small relative to the skew, and broadcast is impossible because the
right side exceeds the broadcast threshold).

The salt assignment is round-robin-ish (hash of a per-row unique id); the
join RESULT is invariant to which salt each row gets — only the physical
distribution changes — so correctness is oracle-checkable against the
plain join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with an ``n_salt``-way salt on the shuffle key.

    Only inner/left-family joins are valid: the right side is replicated
    ``n_salt`` times, so a right or full outer join would emit every
    unmatched right row once per replica — ``n_salt`` phantom rows.
    Inner and semi/anti drop the replicas via the salt-equality match;
    left outer matches at most one replica per left row.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is unsupported — the right side is "
            f"replicated {n_salt}x, so right/full outer joins would emit "
            "each unmatched right row once per replica. Use inner or a "
            "left-family join."
        )
    l = left.withColumn(
        "_salt_l", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salt))
    )
    r = right.withColumn(
        "_salt_r", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    cond: Column = (F.col(left_on) == F.col(right_on)) & (
        F.col("_salt_l") == F.col("_salt_r")
    )
    return l.join(r, cond, how).drop("_salt_l", "_salt_r")


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Point-in-interval join WITHOUT an equality key, made shuffle-joinable.

    A bare ``p BETWEEN start AND end`` predicate gives Catalyst no equi
    key, so the plan degenerates to BroadcastNestedLoopJoin — O(|points|
    × |ranges|) comparisons, a non-starter at scale. The classic fix
    (Flink interval join / Databricks RANGE_JOIN hint semantics):
    discretize time into coarse buckets, explode each interval onto every
    bucket it overlaps, bucket each point once, equi-join on the bucket id,
    then re-apply the exact predicate. Each (point, range) pair can meet
    in at most one bucket — the point's — so no dedup is needed.

    Cost: ranges are replicated ceil(len/bucket)+1×; points shuffle once
    on the bucket id. Pick ``bucket_seconds`` near the typical interval
    length so replication stays O(1) per range. Skewed buckets (rush-hour
    points) are AQE-split like any other shuffle skew.

    Both time columns may be timestamp or timestamp_ntz; epoch extraction
    is exact under the session's pinned-UTC timezone.
    """
    p_epoch = F.unix_micros(F.col(point_col).cast("timestamp"))
    s_epoch = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_epoch = F.unix_micros(F.col(end_col).cast("timestamp"))
    us = F.lit(bucket_seconds * 1_000_000)

    pb = points.withColumn("_rj_bucket", F.floor(p_epoch / us))
    rb = ranges.withColumn(
        "_rj_bucket",
        F.explode(F.sequence(F.floor(s_epoch / us), F.floor(e_epoch / us))),
    )
    cond = (
        (pb["_rj_bucket"] == rb["_rj_bucket"])
        & (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    return pb.join(rb, cond).drop("_rj_bucket")


def grid_proximity_join(
    df: DataFrame,
    radius: float,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Spatial self-join: all point pairs within planar distance
    ``radius``, via GRID-CELL BLOCKING — the standard scale shape for
    proximity joins (geohash/S2 bucketing reduced to its essence).

    Each point lands in cell (floor(x/r), floor(y/r)). If two points are
    within r, their cell coordinates differ by at most 1 in each axis,
    so probing the 3x3 neighborhood is LOSSLESS. Only the left side
    explodes (9 rows/point); the probe joins the right side's single
    actual cell with ``id_a < id_b``, so every qualifying pair is
    produced exactly once — no distinct needed. The exact distance
    predicate then verifies candidates.

    Scale: candidate volume is sum over cells of |cell| x |3x3
    neighborhood| — local density, never n². The join is an equality
    join on (cx, cy), shuffled once each side; a hot cell (degenerate
    clustering) is AQE-skew-splittable because the verify is stateless.
    Returns (id_a, id_b, dist).
    """
    r = F.lit(float(radius))
    pts = df.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
        F.floor(F.col(x_col) / r).cast("long").alias("cx"),
        F.floor(F.col(y_col) / r).cast("long").alias("cy"),
    )
    probes = (
        pts.select("id", "x", "y", "cx", "cy")
        .withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            F.col("id").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            (F.col("cx") + F.col("dx")).alias("pcx"),
            (F.col("cy") + F.col("dy")).alias("pcy"),
        )
    )
    right = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        "cx",
        "cy",
    )
    return (
        probes.join(
            right,
            (F.col("pcx") == F.col("cx"))
            & (F.col("pcy") == F.col("cy"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select(
            "id_a",
            "id_b",
            F.sqrt(
                (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
                + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
            ).alias("dist"),
        )
        .where(F.col("dist") <= F.lit(float(radius)))
    )
