"""Reference-parity semantics tests (spark_airports_final.py variant A/B)."""

from __future__ import annotations

import pyspark.sql.functions as F

from projet_etl_a_rien_spark.fixtures import airports_messages
from projet_etl_a_rien_spark.operators.airports import (
    AIRPORT_SCHEMA_PERMISSIVE,
    airport_stats,
    clean_coords,
    ingest_openaip_response,
    parse_json_messages,
)


def _messages(spark, rows):
    return spark.createDataFrame(rows, "key string, value string")


DIRTY = [
    ("1", '{"id":"1","name":"CDG","icao":"LFPG","lat":"49.0097","lon":"2.5478"}'),
    ("2", '{"id":"2","name":"Empty","icao":"XXXX","lat":"","lon":"1.5"}'),
    ("3", '{"id":"3","name":"Bad","icao":"YYYY","lat":"oops","lon":"1.5"}'),
    ("4", '{"id":"4","name":"NullLon","icao":"ZZZZ","lat":"1.0"}'),
    ("1", '{"id":"1","name":"CDG dup","icao":"LFPG","lat":"49.0097","lon":"2.5478"}'),
]


def test_parse_then_clean_drops_invalid(spark):
    msgs = _messages(spark, DIRTY)
    clean = clean_coords(parse_json_messages(msgs))
    rows = {r.id: r for r in clean.collect()}
    # only id=1 (twice) survives: empty lat, uncastable lat, missing lon drop
    assert set(rows) == {"1"}
    assert clean.count() == 2
    assert rows["1"].latitude == 49.0097
    assert rows["1"].longitude == 2.5478
    assert clean.columns == ["id", "name", "icao", "latitude", "longitude"]


def test_clean_keep_invalid_as_nulls(spark):
    msgs = _messages(spark, DIRTY)
    clean = clean_coords(parse_json_messages(msgs), drop_invalid=False)
    assert clean.count() == 5
    bad = clean.filter(F.col("latitude").isNull()).count()
    assert bad == 2  # empty-string and uncastable lat


def test_flagship_stats_semantics(spark):
    msgs = _messages(spark, DIRTY)
    stats = airport_stats(clean_coords(parse_json_messages(msgs))).collect()[0]
    assert stats.total_records == 2
    assert stats.unique_airports == 1
    assert stats.min_latitude == 49.0097
    assert stats.max_latitude == 49.0097
    # cents-exact average: round(49.0097*100)=4901 → 49.01
    assert abs(stats.avg_latitude - 49.01) < 1e-12


def test_permissive_parse_types(spark):
    msgs = _messages(spark, DIRTY)
    parsed = parse_json_messages(msgs, schema=AIRPORT_SCHEMA_PERMISSIVE)
    assert dict(parsed.dtypes)["lat"] == "double"


def test_fixture_messages_deterministic(spark, sf_dir):
    a = airports_messages(spark, sf_dir).orderBy("key", "value").collect()
    b = airports_messages(spark, sf_dir).orderBy("key", "value").collect()
    assert a == b
    assert len(a) == 150  # sf0.001 customer rows


def test_ingest_openaip_response(spark):
    doc = (
        '{"items": [{"_id": "a1", "name": "CDG", "icao": "LFPG",'
        ' "geometry": {"type": "Point", "coordinates": [2.5478, 49.0097]}},'
        ' {"_id": "a2", "name": "Orly", "icao": "LFPO",'
        ' "geometry": {"type": "Point", "coordinates": [2.3794, 48.7262]}}]}'
    )
    responses = spark.createDataFrame([(doc,)], "json string")
    out = ingest_openaip_response(responses).collect()
    assert [r.key for r in out] == ["a1", "a2"]
    # GeoJSON positional semantics: lat = coordinates[1] (tp.xml:551,555)
    parsed = parse_json_messages(
        spark.createDataFrame([(r.key, r.value) for r in out], "key string, value string")
    )
    got = {r.id: (r.lat, r.lon) for r in parsed.collect()}
    assert got["a1"] == ("49.0097", "2.5478")
