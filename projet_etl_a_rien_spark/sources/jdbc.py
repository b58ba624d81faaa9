"""JDBC source/sink wrappers — reference S3/K1 semantics.

Mirrors the reference's Postgres read-back scan
(``/root/reference/spark_airports_final.py:91-97``) and its overwrite
sink (``:77-86``), with the scale-hardening SURVEY.md §4.2 calls for:

- ``overwrite`` + ``truncate=true`` by default: TRUNCATE-and-load instead
  of DROP-and-recreate, preserving table DDL/grants and making the
  replace idempotent;
- optional ``partitionColumn``/bounds for parallel reads — the reference
  reads on one connection, which at scale serializes the whole scan
  through a single executor;
- ``batchsize`` for write batching.

No SERVER database exists in this sandbox, but the wrappers are
data-tested against embedded Derby (Spark ships the jars):
``tests/test_jdbc_embedded.py`` pushes real rows through a real JDBC
URL — write, read-back, overwrite idempotence, parallel partitioned
read. Unreachable endpoints raise a clear RuntimeError (add the server
driver jar + url in production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_MISSING = (
    "JDBC endpoint unreachable or driver jar absent; supply a reachable "
    "url and the driver (e.g. org.postgresql:postgresql) on the classpath"
)


def jdbc_source(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """JDBC scan (ref spark_airports_final.py:91-97), optionally parallel."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # str(None) would reach Spark's JDBC reader as the literal
            # 'None' and fail with an opaque parse error — reject here.
            raise ValueError(
                "partition_column requires explicit lower_bound and "
                "upper_bound (and ideally num_partitions) for parallel reads"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    try:
        return reader.load()
    except Exception as e:
        raise RuntimeError(_MISSING) from e


def jdbc_overwrite_sink(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
    truncate: bool = True,
    batchsize: int = 10_000,
    column_types: str | None = None,
) -> None:
    """Idempotent full-replace (ref spark_airports_final.py:77-86, hardened).

    ``column_types`` maps to ``createTableColumnTypes`` — needed when the
    dialect's default string mapping is unusable downstream (e.g. Derby
    maps StringType to CLOB, which cannot appear in comparison
    predicates, so MERGE-consumed tables declare VARCHAR explicitly).
    """
    try:
        w = (
            df.write.format("jdbc")
            .option("url", url)
            .option("dbtable", table)
            .option("user", user)
            .option("password", password)
            .option("driver", driver)
            .option("truncate", str(truncate).lower())
            .option("batchsize", str(batchsize))
        )
        if column_types is not None:
            w = w.option("createTableColumnTypes", column_types)
        w.mode("overwrite").save()
    except Exception as e:
        raise RuntimeError(_MISSING) from e
