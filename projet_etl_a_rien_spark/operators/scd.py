"""SCD Type-2 dimension build from an append-only event log.

Warehouse staple the reference's keyed-aggregation surface (SURVEY.md
§2.10, spark_airports_final.py:67-74) stops short of: collapse each
key's attribute history into validity intervals — one row per run of
equal attribute values, ``valid_from`` = first event of the run,
``valid_to`` = start of the next run (NULL while current). The classic
gaps-and-islands form: lag-flag change points, running-sum version
ordinals, per-run aggregate, lead for the closing edge.

Scale shape: everything partitions by the dimension key — the lag
window, the running sum, the run groupBy, and the lead window all reuse
ONE hash partitioning on ``key`` (Catalyst plans a single Exchange; the
sort order is shared too). No join, no broadcast, no driver state: at
100 TB of events this is one shuffle of (key, attr, ts) triples, and
AQE handles key skew. Ordering is made total with the event-id
tiebreaker so re-runs over re-partitioned input are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_from_log(
    events: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(key, version, status, valid_from, valid_to, is_current, n_events)
    — one row per maximal run of equal ``attr_col`` values in each key's
    event sequence, ordered by (ts, tiebreaker). ``version`` numbers runs
    from 1 in time order; ``valid_to`` is NULL only on the current row.
    """
    w_ord = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    attr = F.col(attr_col)
    changed = (
        F.when(F.lag(attr).over(w_ord).isNull() | (F.lag(attr).over(w_ord) != attr), 1)
        .otherwise(0)
        .alias("_chg")
    )
    runs = events.select(key_col, attr.alias("status"), ts_col, tiebreak_col, changed)
    versioned = runs.select(
        key_col,
        "status",
        ts_col,
        F.sum("_chg").over(w_ord).alias("version"),
    )
    dim = versioned.groupBy(key_col, "version", "status").agg(
        F.min(ts_col).alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    w_ver = Window.partitionBy(key_col).orderBy("version")
    valid_to = F.lead("valid_from").over(w_ver)
    return dim.select(
        key_col,
        "version",
        "status",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
        "n_events",
    )
