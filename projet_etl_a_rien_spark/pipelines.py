"""End-to-end pipeline compositions — the reference's jobs as functions.

``airports_batch_pipeline`` is the whole of
``/root/reference/spark_airports_final.py`` (variant A) re-expressed as
one composable function: messages → parse → clean → stats → persist →
read-back verify. Differences from the reference, by design (SURVEY.md
§4.2):

- the cleaned lineage is **persisted once** before the multi-action
  fan-out — the reference recomputes the full Kafka scan→parse→clean for
  every one of its 6+ actions;
- the sink is pluggable (parquet here, `sources.jdbc` in production) and
  the verify step re-reads through the sink's own scan — the reference's
  only correctness mechanism (read-your-writes via Postgres, §5.2) —
  preserved;
- the ``count > 0`` guard (ref :29) stays: result-dependent driver-side
  orchestration is part of the observed contract.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.airports import airport_stats, clean_coords, parse_json_messages


@dataclass
class PipelineResult:
    raw_count: int
    clean_count: int
    stats: DataFrame
    verified_count: int


def airports_batch_pipeline(
    spark: SparkSession, messages: DataFrame, sink_path: str
) -> PipelineResult:
    """Run the full reference batch job against any (key,value) message set."""
    raw_count = messages.count()  # guard action (ref :26-29)
    if raw_count == 0:
        return PipelineResult(0, 0, airport_stats(clean_coords(parse_json_messages(messages))), 0)

    clean = clean_coords(parse_json_messages(messages))
    # one materialization for the stats + sink fan-out (ref recomputes)
    clean.persist()
    try:
        clean_count = clean.count()  # (ref :62)
        stats = airport_stats(clean)  # (ref :67-74)
        clean.write.mode("overwrite").parquet(sink_path)  # (ref :77-86, K1)
        # read-your-writes verification through an independent scan (ref :91-101)
        verified_count = spark.read.parquet(sink_path).count()
    finally:
        clean.unpersist()
    return PipelineResult(raw_count, clean_count, stats, verified_count)
