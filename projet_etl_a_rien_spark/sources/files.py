"""File-format sources and sinks (parquet / json / csv / orc).

The engine's primary scale path: parquet scans get filter pushdown,
column pruning, and partition pruning from Catalyst for free; writes
support directory partitioning — the layout primitives a 100 TB table
actually relies on (partition columns prune whole directories before any
I/O; ``maxRecordsPerFile`` bounds file sizes for downstream readers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import apply_runtime_confs


def scan(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options: str,
) -> DataFrame:
    """Lazy scan of a file-based table; schema explicit where inference
    would be a correctness trap (csv/json), inferred from footers for
    parquet/orc."""
    apply_runtime_confs(spark)
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).load(path)


def write(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    **options: str,
) -> None:
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.save(path)


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int,
    fmt: str = "parquet",
) -> None:
    """Totally-ordered export: range-partition on the sort key (sampled
    range exchange — each output file owns a disjoint, ordered key
    range) then sort within partitions. File i's max key < file i+1's
    min key, so downstream range predicates prune to single files and
    merge-readers get global order without a merge. This is the
    Z-order-lite layout primitive for a 100 TB sorted export."""
    from pyspark.sql import functions as F

    (
        df.repartitionByRange(num_files, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )
