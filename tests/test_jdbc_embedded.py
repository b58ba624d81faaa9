"""Live-bytes JDBC coverage via embedded Derby (ships in Spark's jars/).

The reference's S3/K1 edges (spark_airports_final.py:77-97) run against
a real Postgres; this sandbox has no server, so until round 5 the
``sources/jdbc.py`` wrappers were only error-path-tested. Derby's
embedded driver needs no server process — the database lives in a temp
directory inside this JVM — so these tests push real rows through a real
JDBC URL: overwrite-sink write, scan read-back, overwrite idempotence,
and the parallel partitioned read (the scale-hardening option the
reference's single-connection scan lacks).
"""

from __future__ import annotations

import tempfile

import pytest

from projet_etl_a_rien_spark.sources.jdbc import jdbc_overwrite_sink, jdbc_source

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark):
    """File-backed embedded Derby database in a temp dir; skip cleanly if
    the Derby jars ever leave the Spark distribution."""
    tmp = tempfile.mkdtemp(prefix="derby_")
    # keep derby.log out of the repo working directory
    spark._jvm.System.setProperty("derby.stream.error.file", f"{tmp}/derby.log")
    url = f"jdbc:derby:{tmp}/db;create=true"
    try:
        spark._jvm.java.lang.Class.forName(DRIVER)
    except Exception:
        pytest.skip("Derby embedded driver not on the Spark classpath")
    return url


def _fixture_df(spark):
    rows = [
        (1, "LFPG", "Charles de Gaulle", 49.0097),
        (2, "LFPO", "Orly", 48.7262),
        (3, "KJFK", "John F. Kennedy", 40.6413),
        (4, "EGLL", "Heathrow", 51.4700),
    ]
    return spark.createDataFrame(
        rows, "id bigint, ident string, name string, lat double"
    )


def test_jdbc_write_then_read_back(spark, derby_url):
    df = _fixture_df(spark)
    jdbc_overwrite_sink(
        df, derby_url, "airports", user="app", password="app", driver=DRIVER
    )
    back = jdbc_source(
        spark, derby_url, "airports", user="app", password="app", driver=DRIVER
    )
    assert set(back.columns) == {"id", "ident", "name", "lat"}
    got = {(r.id, r.ident, r.name, r.lat) for r in back.collect()}
    want = {tuple(r) for r in df.collect()}
    assert got == want


def test_jdbc_overwrite_is_idempotent(spark, derby_url):
    """The reference's mode('overwrite') full-replace (K1): two identical
    writes leave exactly one copy of the rows, not an append."""
    df = _fixture_df(spark)
    for _ in range(2):
        jdbc_overwrite_sink(
            df, derby_url, "airports_idem", user="app", password="app", driver=DRIVER
        )
    back = jdbc_source(
        spark, derby_url, "airports_idem", user="app", password="app", driver=DRIVER
    )
    assert back.count() == 4


def test_jdbc_parallel_partitioned_read(spark, derby_url):
    """partitionColumn/bounds split the scan into numPartitions range
    queries — the option that keeps a 100 TB-side JDBC ingest from
    serializing through one connection. Every row must arrive exactly
    once across the stride boundaries."""
    df = spark.range(0, 100).selectExpr("id", "id * 2 AS v")
    jdbc_overwrite_sink(
        df, derby_url, "nums", user="app", password="app", driver=DRIVER
    )
    back = jdbc_source(
        spark,
        derby_url,
        "nums",
        user="app",
        password="app",
        driver=DRIVER,
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert sorted((r.id, r.v) for r in back.collect()) == [
        (i, 2 * i) for i in range(100)
    ]


def test_jdbc_missing_endpoint_still_fails_clearly(spark):
    with pytest.raises(RuntimeError, match="JDBC endpoint unreachable"):
        jdbc_source(
            spark,
            "jdbc:postgresql://localhost:1/nope",
            "t",
            user="u",
            password="p",
        ).collect()
