"""Reference-parity pipeline operators: parse → clean → stats.

Re-expresses the reference batch job's semantics
(``/root/reference/spark_airports_final.py:19-74``, "variant A" per
SURVEY.md §2.11) as composable operators over any DataFrame with a JSON
``value`` column — the Kafka wire shape (``CAST(value AS STRING)``,
ref ``spark_airports_final.py:31``) without requiring a broker.

Semantics preserved exactly:

- parse with an all-string declared StructType (ref ``:35-41``) — schema is
  static and hand-declared, never inferred (SURVEY.md §1.3);
- clean: empty-string/null coordinate → NULL, else cast to double
  (ref ``:53-59``); a failed cast also yields NULL — the reference runs
  pre-ANSI Spark where ``cast`` is null-on-error, so under ANSI (Spark 4
  default) this is ``try_cast``, not ``cast``;
- filter rows where either coordinate is NULL (ref ``:60``);
- flagship global stats: count / countDistinct(id) / avg / min / max
  (ref ``:67-74``).

Variant B (``/root/reference/spark-jars/spark_airports_final.py:40-49``) is
kept as the documented permissive mode: typed-at-parse, nulls pass through,
distinct on ``icao``.

Scale notes (100 TB): every op here is a narrow projection or a global
aggregate with map-side partial aggregation; nothing shuffles except the
final single-row agg exchange. ``count_distinct`` is exact like the
reference; ``stats(approx=True)`` swaps in HLL ``approx_count_distinct``
for the 1000-executor design point where an exact distinct over ids would
shuffle the full key set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType, StringType

# Ref spark_airports_final.py:35-41 — all five fields parsed as strings.
AIRPORT_SCHEMA_STRICT = StructType(
    [
        StructField("id", StringType(), True),
        StructField("name", StringType(), True),
        StructField("icao", StringType(), True),
        StructField("lat", StringType(), True),
        StructField("lon", StringType(), True),
    ]
)

# Ref spark-jars/spark_airports_final.py:40-45 — lat/lon typed at parse.
AIRPORT_SCHEMA_PERMISSIVE = StructType(
    [
        StructField("id", StringType(), True),
        StructField("name", StringType(), True),
        StructField("icao", StringType(), True),
        StructField("lat", DoubleType(), True),
        StructField("lon", DoubleType(), True),
    ]
)


def parse_json_messages(
    df: DataFrame, value_col: str = "value", schema: StructType = AIRPORT_SCHEMA_STRICT
) -> DataFrame:
    """``from_json`` + struct flatten (ref spark_airports_final.py:44-46)."""
    return df.select(
        F.from_json(F.col(value_col).cast("string"), schema).alias("data")
    ).select("data.*")


def _clean_coord(col: str) -> Column:
    # Ref spark_airports_final.py:55-59: when(col != '' AND col IS NOT NULL,
    # cast-to-double).otherwise(NULL); try_cast keeps the reference's
    # null-on-uncastable behavior under ANSI mode.
    c = F.col(col)
    return (
        F.when((c != "") & c.isNotNull(), c.cast("string").try_cast("double"))
        .otherwise(F.lit(None).cast("double"))
    )


def clean_coords(
    df: DataFrame, lat_col: str = "lat", lon_col: str = "lon", drop_invalid: bool = True
) -> DataFrame:
    """Variant-A cleaning (ref spark_airports_final.py:53-64).

    Derives ``latitude``/``longitude`` doubles, then (by default) keeps only
    rows with both present — the authoritative table contract
    (ref ``:77``, README.md:22).
    """
    out = df.withColumn("latitude", _clean_coord(lat_col)).withColumn(
        "longitude", _clean_coord(lon_col)
    )
    out = out.select("id", "name", "icao", "latitude", "longitude")
    if drop_invalid:
        out = out.filter(
            F.col("latitude").isNotNull() & F.col("longitude").isNotNull()
        )
    return out


def airport_stats(
    df: DataFrame,
    distinct_key: str = "id",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    approx: bool = False,
) -> DataFrame:
    """Flagship 6-aggregate global stats (ref spark_airports_final.py:67-74).

    Averages are computed as exact integer cents (ROUND(x*100) summed as
    bigint, divided back at the end): at 60k rows a double sum's result
    depends on partial-aggregation order, so cross-engine comparison —
    and cross-run stability under AQE re-partitioning — need an
    order-independent accumulation. Exact at any partition count.
    """
    distinct = (
        F.approx_count_distinct(distinct_key) if approx else F.count_distinct(F.col(distinct_key))
    )
    lat_cents = F.sum(F.round(F.col(lat_col) * 100).cast("long"))
    lon_cents = F.sum(F.round(F.col(lon_col) * 100).cast("long"))
    n_lat = F.count(lat_col)
    n_lon = F.count(lon_col)
    return df.agg(
        F.count("*").alias("total_records"),
        distinct.alias("unique_airports"),
        (lat_cents / 100.0 / n_lat).alias("avg_latitude"),
        (lon_cents / 100.0 / n_lon).alias("avg_longitude"),
        F.min(lat_col).alias("min_latitude"),
        F.max(lat_col).alias("max_latitude"),
    )


def ingest_openaip_response(responses: DataFrame, json_col: str = "json") -> DataFrame:
    """NiFi-flow equivalent, one declarative lineage (SURVEY.md §2.8).

    SplitJson ``$.items[*]`` (tp.xml:2142) → explode; EvaluateJsonPath
    (tp.xml:543-559) → struct/array element access with GeoJSON positional
    order lon=coords[0], lat=coords[1] (tp.xml:551,555); AttributesToJSON
    (tp.xml:1281) → ``to_json(struct(...))`` with the Kafka key = id
    (tp.xml:875). Returns ``(key, value)`` ready for any sink.
    """
    items_schema = (
        "struct<items: array<struct<_id: string, name: string, icao: string,"
        " geometry: struct<type: string, coordinates: array<double>>>>>"
    )
    parsed = responses.select(
        F.explode(F.from_json(F.col(json_col), items_schema)["items"]).alias("item")
    )
    fields = parsed.select(
        F.col("item._id").alias("id"),
        F.col("item.icao").alias("icao"),
        F.col("item.name").alias("name"),
        F.col("item.geometry.coordinates")[1].cast("string").alias("lat"),
        F.col("item.geometry.coordinates")[0].cast("string").alias("lon"),
    )
    return fields.select(
        F.col("id").alias("key"),
        F.to_json(F.struct("id", "icao", "name", "lat", "lon")).alias("value"),
    )
