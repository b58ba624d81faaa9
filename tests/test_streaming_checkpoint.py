"""Checkpoint-restart continuation for the production streaming path.

The reference's streaming job runs with NO checkpoint — its running count
lives in executor memory only and any restart silently starts from zero
(``/root/reference/spark_kafka_direct.py:43-44``, SURVEY.md §4.2). This
test proves the engine's watermarked append-mode aggregation actually
fixes that: a bounded run is stopped, new data arrives, and a second run
restarted from the same checkpoint

- does NOT reprocess the first batch of files (no duplicate windows),
- completes windows whose events straddle the stop/restart boundary
  (per-window counts survive in the state store),
- ends with exactly the batch-equivalent result under the append-mode
  emission rule (window_end <= max event time - watermark delay).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_etl_a_rien_spark.catalog import load_table
from projet_etl_a_rien_spark.streaming.windows import events_stream, tumbling_counts

SF = "/root/testdata/sf0.001"


def _raw_events(spark):
    # catalog-normalized: ts is timestamp_ntz µs whatever the file stores
    return load_table(spark, SF, "events")


def _run_stream(spark, src, sink, ckpt) -> None:
    stream = events_stream(spark, str(src), glob="*.parquet")
    query = (
        tumbling_counts(stream, "1 hour", watermark="2 hours")
        .writeStream.format("parquet")
        .option("path", str(sink))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def test_checkpoint_restart_continues_state(spark, tmp_path):
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    raw = _raw_events(spark)

    # chronological split at the median timestamp: run 1 sees the first
    # half, run 2 the rest — so the window containing the split gets
    # events from BOTH runs and is only correct if state survived
    split = int(
        raw.agg(F.expr("percentile(unix_micros(cast(ts AS timestamp)), 0.5)")).first()[0]
    )
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    raw.where(ts_us <= split).coalesce(1).write.mode("append").parquet(str(src))
    _run_stream(spark, src, sink, ckpt)
    n_first = spark.read.parquet(str(sink)).count()
    assert n_first > 0  # run 1 emitted the finalized prefix

    raw.where(ts_us > split).coalesce(1).write.mode("append").parquet(str(src))
    _run_stream(spark, src, sink, ckpt)  # restart from the same checkpoint

    got = spark.read.parquet(str(sink)).select(
        "window_start", "window_end", "n_events", "sum_value"
    )
    # batch ground truth under the append emission rule (ts already µs ntz)
    ev = raw
    wm = ev.agg(F.max("ts")).first()[0]
    expected = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("window_start"))
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
                "sum_value"
            ),
        )
        .withColumn("window_end", F.col("window_start") + F.expr("INTERVAL 1 HOUR"))
        .where(
            F.col("window_end")
            <= F.lit(wm).cast("timestamp_ntz") - F.expr("INTERVAL 2 HOURS")
        )
        .select("window_start", "window_end", "n_events", "sum_value")
    )
    exp_rows = {tuple(r) for r in expected.collect()}
    got_rows = {tuple(r) for r in got.collect()}
    assert got_rows == exp_rows
    assert len(exp_rows) > n_first  # run 2 added windows (incl. the straddler)
    # exactly-once emission across the restart: one row per window
    assert got.count() == got.select("window_start").distinct().count()
