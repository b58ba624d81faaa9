"""Changelog compaction and file compaction — the table-maintenance pair.

``latest_by_key`` is SCD-1 / CDC-upsert semantics as a batch operator:
collapse an append-only changelog to the newest row per key. One shuffle
on the key; the window never sorts globally. At 100 TB this is the
nightly compaction every upsert-ingest table needs (the reference's JDBC
``overwrite`` sink is the degenerate whole-table form of it —
spark_airports_final.py:75-84).

``compact_files`` rewrites a directory to a bounded file count — the
small-files remedy for streaming sinks (a foreachBatch sink lands one
directory per micro-batch; readers want few large row groups instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Newest row per key from an append-only changelog.

    ``order_col`` descending picks the latest; ``tiebreak_cols`` (default:
    the key itself is not enough — pass a unique column like an event id)
    make the choice total when versions share a timestamp, so the result
    is deterministic under any partitioning.
    """
    order = [F.col(order_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def compact_files(
    spark: SparkSession, path: str, out_path: str, target_files: int, fmt: str = "parquet"
) -> None:
    """Rewrite ``path`` into exactly ``target_files`` files at ``out_path``.

    ``coalesce`` (not ``repartition``): narrowing to fewer files must not
    pay a shuffle — each output task just concatenates input splits.
    """
    df = spark.read.format(fmt).load(path)
    df.coalesce(target_files).write.format(fmt).mode("overwrite").save(out_path)


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Lakehouse-style MERGE (CDC apply): fold a changelog of
    upserts/deletes into a base snapshot and return the final state.

    ``changes`` carries the base's columns plus ``op_col`` ('U' upsert /
    'D' delete) and ``seq_col`` (change order, > 0); base rows join the
    merge as version 0 inserts. Latest version per key wins (op as
    deterministic tiebreak within a version); keys whose latest op is
    'D' disappear. This is ``latest_by_key`` (SCD-1 compaction) extended
    with tombstones — the batch form of what Delta/Iceberg MERGE INTO
    executes, as one key-partitioned window: one shuffle, no global
    sort, no driver state, any number of change batches unioned in.
    """
    data_cols = [c for c in base.columns]
    snap = base.select(
        *data_cols,
        F.lit("I").alias(op_col),
        F.lit(0).cast("long").alias(seq_col),
    )
    merged = snap.unionByName(
        changes.select(*data_cols, op_col, F.col(seq_col).cast("long").alias(seq_col))
    )
    latest = latest_by_key(merged, key_cols, seq_col, tiebreak_cols=[op_col])
    return latest.where(F.col(op_col) != "D").drop(op_col, seq_col)
