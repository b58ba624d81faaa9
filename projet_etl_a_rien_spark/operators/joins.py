"""Skew-mitigation join strategies.

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
    """Equi-join with an ``n_salt``-way salt on the shuffle key."""
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
