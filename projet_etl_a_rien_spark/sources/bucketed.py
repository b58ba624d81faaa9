"""Bucketed tables: pre-shuffled storage for co-located joins.

The one shuffle a big fact↔fact join can't avoid at runtime can be paid
ONCE at write time instead: ``bucketBy(n, key)`` hash-partitions rows
into a fixed number of files per partition, and records the bucketing in
the catalog. Two tables bucketed by the same key into the same bucket
count then join with NO Exchange on either side — at 100 TB that deletes
the dominant cost of every recurring fact-fact join (a daily
lineitem↔orders reconciliation re-shuffles terabytes every run;
bucketed, it streams matching buckets file-against-file). ``sortBy``
additionally pre-sorts within buckets so SortMergeJoin skips its Sort.

Bucket-count choice at scale: buckets are per-partition files, so
``n_buckets`` × avg row size / bucket should land in the 128 MB–1 GB
range; too many buckets → small-file explosion, too few → no
parallelism. Bucket pruning (``spark.sql.sources.bucketing.enabled``,
on by default) also turns point predicates on the bucket key into
single-bucket scans.

Tables are written as EXTERNAL (explicit ``path``) so the data location
is caller-controlled; the bucketing metadata lives in the session
catalog (in-memory here; a Hive metastore or Unity/Glue catalog in a
real deployment — the write API is identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    n_buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external bucketed (and optionally sorted) table."""
    writer = (
        df.write.format(fmt)
        .mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table through the catalog — reading the parquet
    path directly would silently DROP the bucketing metadata and
    reintroduce the shuffle; the catalog route is what makes the
    exchange-free join plan possible."""
    return spark.table(table)
