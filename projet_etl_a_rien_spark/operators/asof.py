"""As-of (most-recent-match) join — an operator Spark's DataFrame API lacks.

Attaches to each left row the payload of the latest right row with the
same key and ``right_ts <= left_ts`` — the standard shape for "state as
of event time" enrichment (latest order before a click, last quote
before a trade, current dimension version for a fact).

Expressed as a composition of existing DataFrame ops (SURVEY.md §2.10
custom-operator rule (a)): union both sides tagged, one window pass with
``last(payload, ignorenulls=True)`` over rows-unbounded-preceding, keep
the left rows. Scale shape: ONE shuffle of left ∪ right on the key, one
sort within partitions — the same cost as a sort-merge join, with no
per-key lateral scans and no range cross-join blow-up. Skewed keys are
window partitions, so AQE's skew handling does not apply — at 100 TB a
hot key would need salting plus a per-salt boundary fix-up; documented
trade-off, fine for key cardinalities where max-per-key fits a partition.

Determinism: right-side ties on the timestamp resolve to the largest
``tie_col`` (sort is (ts, side, tie_col) with right rows before left
rows at equal ts — "as of" includes same-instant versions). Null
ordering never matters: side separates left from right at equal ts, and
equal-ts left rows see identical preceding frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """Left as-of join; payload columns are NULL when no right row precedes.

    ``payload`` columns must be non-null on the right side (they mark
    which union rows are right rows); ``tie_col`` (default: first payload
    column) breaks equal-timestamp ties deterministically.
    """
    tie = tie_col or payload[0]
    lcols = [c for c in left.columns]
    l = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[p].dataType).alias(p) for p in payload],
    )
    r = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(p) for p in payload],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col(tie).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l.unionByName(r)
    return (
        u.select(
            "_side",
            *lcols,
            *[F.last(p, ignorenulls=True).over(w).alias(f"asof_{p}") for p in payload],
        )
        .where(F.col("_side") == 1)
        .drop("_side")
    )
