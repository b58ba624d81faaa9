"""Broker-free stand-ins for the reference's Kafka wire input.

The reference's input is a Kafka topic of one-JSON-per-airport messages
(FIXTURES.md §1.1). The sandbox has no broker, so we derive an equivalent
message stream deterministically from the ``customer`` fixture: each row
becomes a JSON ``value`` string with the airports payload shape
(``{"id","name","icao","lat","lon"}`` — all strings, as NiFi attributes
are), including the dirty variants the cleaning operator is defined over
(ref ``spark_airports_final.py:53-60``): empty strings, JSON nulls,
non-numeric coordinates, and duplicate ids.

The mapping is pure column arithmetic so the DuckDB oracle can reproduce
the *semantics* without the JSON round-trip (each engine round-trips its
own double→string→double losslessly; the oracle skips the string hop).

Dirty-data rules (keyed on c_custkey, deterministic at every sf):
- ``% 13 == 0`` → lat = ""            (empty-string coordinate)
- ``% 29 == 0`` → lat = "not-a-number" (uncastable coordinate)
- ``% 17 == 0`` → lon = NULL           (missing field; to_json drops it)
- id = c_custkey div 10 → forced duplicate ids (countDistinct < count)
- otherwise lat = c_acctbal/100, lon = c_acctbal/50 as strings
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table


def airports_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(key, value) JSON message DataFrame — the Kafka-wire analogue."""
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    lat = (
        F.when(k % 13 == 0, F.lit(""))
        .when(k % 29 == 0, F.lit("not-a-number"))
        .otherwise((F.col("c_acctbal") / 100).cast("string"))
    )
    lon = F.when(k % 17 == 0, F.lit(None).cast("string")).otherwise(
        (F.col("c_acctbal") / 50).cast("string")
    )
    payload = F.struct(
        F.expr("c_custkey div 10").cast("string").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("icao"),
        lat.alias("lat"),
        lon.alias("lon"),
    )
    return c.select(
        payload["id"].alias("key"), F.to_json(payload).alias("value")
    )


def airports_messages_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric-JSON variant for the permissive (variant-B) parse path.

    ``from_json`` with DoubleType fields does NOT coerce JSON strings — a
    string token in a double field nulls just that field (verified
    empirically; this is the "silent null" behavior SURVEY.md §2.11
    documents for variant B). So this fixture emits lat/lon as JSON
    *numbers*, with dirty variants that exercise exactly that semantics:

    - ``% 13 == 0`` → lat is the string token ``"not-a-number"`` → NULL field
    - ``% 17 == 0`` → lon key absent → NULL field
    """
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    lat_tok = F.when(k % 13 == 0, F.lit('"not-a-number"')).otherwise(
        (F.col("c_acctbal") / 100).cast("string")
    )
    lon_part = F.when(k % 17 == 0, F.lit("")).otherwise(
        F.concat(F.lit(',"lon":'), (F.col("c_acctbal") / 50).cast("string"))
    )
    value = F.concat(
        F.lit('{"id":"'),
        F.expr("c_custkey div 10").cast("string"),
        F.lit('","name":"'),
        F.col("c_name"),
        F.lit('","icao":"'),
        F.col("c_mktsegment"),
        F.lit('","lat":'),
        lat_tok,
        lon_part,
        F.lit("}"),
    )
    return c.select(
        F.expr("c_custkey div 10").cast("string").alias("key"), value.alias("value")
    )


def documents_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ planted exact duplicates (every 50th doc re-appears
    with doc_id+1_000_000) — the fixture corpus has no natural exact
    dups, so dedup operators need these to produce non-trivial output.
    Deterministic at every scale factor; oracle mirror below.
    """
    d = load_table(spark, sf_dir, "documents")
    dups = d.where(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    return d.unionByName(dups)


DOCUMENTS_WITH_DUPS_ORACLE_CTE = """
docs_dup AS (
    SELECT doc_id, text, lang, source, n_chars FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
    FROM documents WHERE doc_id % 50 = 0
)
"""


AIRPORTS_MESSAGES_NUMERIC_ORACLE_CTE = """
airports_msgs_num AS (
    SELECT CAST(c_custkey // 10 AS VARCHAR) AS id,
           c_name AS name,
           c_mktsegment AS icao,
           CASE WHEN c_custkey % 13 = 0 THEN NULL
                ELSE c_acctbal / 100 END AS lat,
           CASE WHEN c_custkey % 17 = 0 THEN NULL
                ELSE c_acctbal / 50 END AS lon
    FROM customer
)
"""


# The same derivation in ANSI SQL (DuckDB), skipping the JSON round-trip:
# produces (id, name, icao, lat, lon) all-varchar, ready for the oracle's
# TRY_CAST/NULLIF clean step. Kept adjacent to the Python so the two cannot
# drift silently.
AIRPORTS_MESSAGES_ORACLE_CTE = """
airports_msgs AS (
    SELECT CAST(c_custkey // 10 AS VARCHAR) AS id,
           c_name AS name,
           c_mktsegment AS icao,
           CASE WHEN c_custkey % 13 = 0 THEN ''
                WHEN c_custkey % 29 = 0 THEN 'not-a-number'
                ELSE CAST(c_acctbal / 100 AS VARCHAR) END AS lat,
           CASE WHEN c_custkey % 17 = 0 THEN NULL
                ELSE CAST(c_acctbal / 50 AS VARCHAR) END AS lon
    FROM customer
)
"""
