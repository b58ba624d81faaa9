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


def test_jdbc_auth_enforced_and_credentials_passed(spark):
    """Authenticated Derby: with BUILTIN auth required, a credential-less
    DriverManager connection is REJECTED while the user/password path the
    wrappers (and run_cdc_merge_jdbc's control-plane statements) use
    succeeds — the data-tested closure of the r5 advisor finding that
    _exec_sql ignored its credentials."""
    import tempfile

    tmp = tempfile.mkdtemp(prefix="derbyauth_")
    spark._jvm.System.setProperty("derby.stream.error.file", f"{tmp}/derby.log")
    jvm = spark._jvm
    try:
        jvm.java.lang.Class.forName(DRIVER)
    except Exception:
        pytest.skip("Derby embedded driver not on the Spark classpath")
    boot = f"jdbc:derby:{tmp}/db;create=true"
    conn = jvm.java.sql.DriverManager.getConnection(boot)
    st = conn.createStatement()
    for k, v in [
        ("derby.connection.requireAuthentication", "true"),
        ("derby.authentication.provider", "BUILTIN"),
        ("derby.user.app", "secret"),
        # without propertiesOnly, absent SYSTEM-level auth properties
        # override the database-level ones and auth silently stays off
        ("derby.database.propertiesOnly", "true"),
    ]:
        st.execute(
            "CALL SYSCS_UTIL.SYSCS_SET_DATABASE_PROPERTY"
            f"('{k}', '{v}')"
        )
    st.close()
    conn.close()
    # auth only applies from the next boot: shut the database down
    try:
        jvm.java.sql.DriverManager.getConnection(f"jdbc:derby:{tmp}/db;shutdown=true")
    except Exception:
        pass  # clean shutdown raises SQLException 08006 by contract
    url = f"jdbc:derby:{tmp}/db"
    with pytest.raises(Exception, match="[Aa]uthenticat|08004"):
        jvm.java.sql.DriverManager.getConnection(url)
    authed = jvm.java.sql.DriverManager.getConnection(url, "app", "secret")
    authed.close()
    with pytest.raises(Exception, match="[Aa]uthenticat|08004"):
        jvm.java.sql.DriverManager.getConnection(url, "app", "wrong")
    # the Spark wrappers authenticate end-to-end
    df = _fixture_df(spark)
    jdbc_overwrite_sink(
        df, url, "airports_auth", user="app", password="secret", driver=DRIVER
    )
    back = jdbc_source(
        spark, url, "airports_auth", user="app", password="secret", driver=DRIVER
    )
    assert back.count() == 4
    # ...including the CDC MERGE sink's driver-side control-plane
    # statements (CREATE INDEX / MERGE INTO) — the exact path the r5
    # advisor flagged for dropping its credentials
    from projet_etl_a_rien_spark.streaming.windows import run_cdc_merge_jdbc

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string")
    src = f"{tmp}/changes"
    spark.createDataFrame(
        [(2, "b2", "U", 1), (3, "c", "U", 1), (1, None, "D", 2)],
        "k bigint, v string, op string, seq long",
    ).coalesce(1).write.mode("overwrite").parquet(src)
    change_stream = spark.readStream.schema(
        "k bigint, v string, op string, seq long"
    ).parquet(src)
    final = run_cdc_merge_jdbc(
        change_stream,
        base,
        url,
        "cdc_auth_target",
        key_col="k",
        driver=DRIVER,
        user="app",
        password="secret",
        # op-only override: v stays CLOB so the NULL payload on the
        # tombstone row setNulls with the dialect's CLOB type (22005
        # trap documented in run_cdc_merge_jdbc)
        column_types="op VARCHAR(1)",
    )
    assert {(r.k, r.v) for r in final.collect()} == {(2, "b2"), (3, "c")}
