"""Arrow grouped-map custom aggregation (``applyInPandas``).

The batch half of the engine's Python escape hatch (the streaming half is
``applyInPandasWithState``, streaming/windows.py): when an aggregate
genuinely isn't expressible in JVM column algebra — robust statistics,
model scoring, scipy-style numerics — the grouped-map form ships each
group to Python ONCE as an Arrow batch and returns a result frame, vs a
per-row UDF's 10-100× serialization tax.

Scale shape: one shuffle on the group key (identical to a built-in
groupBy), then per-group vectorized pandas. The constraint to respect at
100 TB is group size — a group must fit in one executor's memory as a
pandas frame, so key cardinality must be high relative to data volume
(here: per-language groups of document stats). For unbounded groups,
pre-aggregate in the JVM or switch to mapInPandas over sorted
partitions.

Median/MAD are the demonstration because they are *order statistics* —
the canonical "not a streaming-mergeable aggregate" case built-in aggs
can't do without exact percentile machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_robust_stats(
    df: DataFrame, group_col: str = "lang", value_col: str = "n_chars"
) -> DataFrame:
    """Per-group robust location/spread: median and MAD (median absolute
    deviation) via numpy inside an Arrow grouped-map.

    numpy's median (linear interpolation at the midpoint) matches
    SQL ``quantile_cont(0.5)`` exactly on integer inputs — midpoints are
    exact halves in double — so the DuckDB oracle reproduces the floats
    bit-for-bit.
    """
    import numpy as np
    import pandas as pd

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype("float64")
        med = float(np.median(v))
        mad = float(np.median(np.abs(v - med)))
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n_docs": [len(v)],
                "median_val": [med],
                "mad_val": [mad],
            }
        )

    return df.groupBy(group_col).applyInPandas(
        stats,
        schema=f"{group_col} string, n_docs bigint, median_val double, mad_val double",
    )


def cogrouped_asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_col: str,
    left_cols: tuple[str, ...],
) -> DataFrame:
    """As-of join via ``cogroup().applyInPandas`` — the cogrouped-map
    Pandas API: both sides are shuffled on the key ONCE, and each key's
    (left, right) pair of Arrow batches meets one Python call where
    ``pandas.merge_asof`` (backward) does the per-key work.

    Exists alongside operators/asof.py's pure-JVM union+window form as
    the escape hatch for as-of variants the window trick can't express
    (nearest-within-tolerance, interpolation between versions, multi
    column state carry-forward) — same shuffle cost, batch-level Python.
    Ties on equal timestamps resolve to the largest payload value,
    matching asof_join's tie rule (sorted merge takes the last equal
    row).

    Cogroups on ``n_buckets`` COARSE hash buckets of the key, not the
    key itself: applyInPandas pays a Python round-trip per group, so a
    million tiny keys would mean a million calls (measured 27 s for 1.5k
    keys at sf0.1). Bucketing gives few large Arrow batches (64 calls →
    4.6 s) and ``merge_asof(by=key)`` restores per-key semantics inside
    each batch. The generic rule for every grouped-map operator: group on
    what sizes the BATCH, push the real key into the kernel.
    """
    import pandas as pd

    lcols = list(left_cols)
    # Payload output type follows the right side's schema (not a hardcoded
    # bigint); the kernel's nullable-integer cast only applies when the
    # payload is integral.
    payload_type = dict(right.dtypes)[payload_col]
    integral = payload_type in ("tinyint", "smallint", "int", "bigint")
    out_schema = ", ".join(
        [f"{c} {dict(left.dtypes)[c]}" for c in lcols]
        + [f"asof_{payload_col} {payload_type}"]
    )
    n_buckets = 64

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=lcols + [f"asof_{payload_col}"])
        lpdf = lpdf.sort_values(left_ts, kind="mergesort")
        if rpdf.empty:
            out = lpdf[lcols].copy()
            out[f"asof_{payload_col}"] = pd.array(
                [None] * len(out), dtype="Int64" if integral else "object"
            )
            return out
        rpdf = rpdf.sort_values(
            [right_ts, payload_col], kind="mergesort"
        )[[right_ts, key, payload_col]]
        merged = pd.merge_asof(
            lpdf,
            rpdf.rename(columns={right_ts: left_ts}),
            on=left_ts,
            by=key,
            direction="backward",
        )
        out = merged[lcols].copy()
        out[f"asof_{payload_col}"] = (
            merged[payload_col].astype("Int64") if integral else merged[payload_col]
        )
        return out

    # Hash-then-pmod so string (or any) key types bucket correctly; a bare
    # pmod(key) would fail analysis for non-numeric keys.
    lb = left.withColumn("_b", F.pmod(F.hash(F.col(key)), F.lit(n_buckets)))
    rb = right.withColumn("_b", F.pmod(F.hash(F.col(key)), F.lit(n_buckets)))
    return (
        lb.groupBy("_b")
        .cogroup(rb.groupBy("_b"))
        .applyInPandas(merge, schema=out_schema)
    )
