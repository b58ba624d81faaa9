"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``projet_etl_a_rien_spark``; this module is the
thin re-export the driver imports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from projet_etl_a_rien_spark.queries import oracle_sql as _oracle_sql
from projet_etl_a_rien_spark.queries import queries as _queries

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's signature computation (spark_airports_final.py:19-74):
    JSON message parse → variant-A clean → 6-aggregate global stats.
    """
    from projet_etl_a_rien_spark.queries import REGISTRY

    return REGISTRY["airports_flagship"].fn(spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (where expressible)."""
    return _oracle_sql()
