"""Mergeable frequency sketches — Count-Min (Cormode & Muthukrishnan
2005, J. Algorithms: "An improved data stream summary: the count-min
sketch and its applications").

The 100 TB problem this solves: exact token frequencies need a
vocab-sized aggregation (fine once, expensive to keep consulting), and
SERVING frequency lookups from a multi-billion-row count table means a
join against corpus-derived state. A count-min sketch is a fixed
``d × w`` integer grid (d hash rows, w buckets — kilobytes to megabytes
regardless of corpus size) that answers point frequency queries with a
one-sided guarantee: ``estimate >= true`` always, and
``estimate <= true + e/w · N`` with probability ``1 - e^-d`` (N = total
token count). The sketch is ADDITIVE — per-partition/per-batch grids
sum cell-wise — so it builds with one map-side-combinable aggregation,
merges across shards or micro-batches like the aggregate-MV partials,
and broadcasts to wherever a frequency gate is needed (stopword
detection, heavy-hitter candidates, noise floors for PMI/TF-IDF).

Determinism discipline: bucket hashes are salted md5 (the engine's
standard replayable coin), so the grid — and therefore every estimate —
is bit-identical across partitionings AND across engines; the DuckDB
oracle rebuilds the identical grid from the same SQL arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import widen_narrow_input


def _bucket(j, token, width: int):
    """Row-j bucket of a token: first 8 md5 hex digits of "j:token",
    mod width — identical arithmetic in the SQL oracle."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(j.cast("string"), F.lit(":"), token)), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def token_cms(
    df: DataFrame,
    depth: int = 4,
    width: int = 1024,
    text_col: str = "text",
) -> DataFrame:
    """Build the count-min grid over whitespace tokens: (j, b, cnt)
    with one row per non-empty cell (at most depth × width rows, ever).

    Shape: one corpus-scale token explode, a ``depth``-way per-token
    fan-out to (row, bucket) pairs (a transform over a literal
    sequence, JVM-side), then ONE groupBy whose key space is bounded by
    d·w — partial aggregation collapses each task's contribution to at
    most d·w cells before the exchange, so shuffle volume is
    O(tasks · d · w), independent of corpus size.
    """
    toks = (
        widen_narrow_input(df)
        .select(F.explode(F.split(F.col(text_col), " ")).alias("t"))
        .where(F.col("t") != "")
    )
    cells = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda j: F.struct(
                    j.alias("j"), _bucket(j, F.col("t"), width).alias("b")
                ),
            )
        ).alias("cell")
    )
    return (
        cells.groupBy(
            F.col("cell.j").alias("j"), F.col("cell.b").alias("b")
        )
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    depth: int = 4,
    width: int = 1024,
    token_col: str = "token",
) -> DataFrame:
    """Point-frequency estimates for probe tokens: min over the d rows
    of the probed cells (the count-min estimator — every row
    overestimates by its collisions, the minimum is the tightest).
    The probe side fans out to d (row, bucket) keys and joins the grid;
    the grid side is at most d·w rows, so Spark broadcasts it and the
    lookup never shuffles the probe set. Missing cells are true zeros.
    Emits (token, cms_est)."""
    keys = (
        probes.select(F.col(token_col).alias("token"))
        .select(
            "token",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(depth - 1)),
                    lambda j: F.struct(
                        j.alias("j"),
                        _bucket(j, F.col("token"), width).alias("b"),
                    ),
                )
            ).alias("cell"),
        )
        .select(
            "token", F.col("cell.j").alias("j"), F.col("cell.b").alias("b")
        )
    )
    return (
        keys.join(F.broadcast(cms), ["j", "b"], "left")
        .groupBy("token")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est")
        )
    )
