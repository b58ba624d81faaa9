"""Round-13 registrations: the KMV value-sample sink served as a
registered, oracled query (r12 verdict ask #1 — the operator, fold
algebra, legacy migration and regression pins all landed in r12; the
registration was deferred by the documented driver-sample budget rule
at operators/sketches.py). One new name this round: the r7 staleness
bucket holds exactly 50 names against the driver's ~50-slot sample, so
every additional registration pushes one more r7 name to r14 (see
queries._DRIVER_PRIORITY).

Imported for its registration side effects by
``queries._load_extensions``; same parity rules as every other
registration module (adjacent DuckDB oracle, identical aliases, exact
integer arithmetic wherever both engines must hash-agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register
from .queries_round11 import SAMPLE_K, _kmv_sample_oracle

# ---------------------------------------------------------------------------
# streaming_user_value_sample_kmv — the consistent distinct-value
# sampler served from STREAMING SINK STATE. Batch twin:
# events_user_distinct_sample_kmv (queries_round11). The sink keeps the
# (h, v) pairs instead of bare hashes, so after ingest the pipeline can
# serve "a stable uniform sample of each segment's distinct users"
# without ever rescanning the corpus — the eval-set primitive at
# 100 TB: the corpus-scale pass happens once in foreachBatch; every
# later sample read is O(keys × k) sink state. Min-k idempotence makes
# foreachBatch's at-least-once replay contract exact (same argument as
# the counting sink, property-pinned in tests/test_round12.py), and
# the min-k fold's associativity makes stream-built == one-shot — which
# is why the oracle is literally the batch twin's SQL.
# ---------------------------------------------------------------------------


@register(
    "streaming_user_value_sample_kmv",
    _kmv_sample_oracle(),
    doc=f"The events_user_distinct_sample_kmv bottom-{SAMPLE_K} "
    "consistent user sample served from STREAMING SINK STATE (r12 "
    "verdict ask #1): a checkpointed availableNow foreachBatch stream "
    "reduces each micro-batch to its per-event-type bottom-k (hash, "
    "user) VALUE partials (operators/sketches.py "
    "write_kmv_sample_partial — flat (key, h, v, gate) rows, <= k per "
    "key per batch), compact_kmv_sample folds them under the pre-fold "
    "max_b bound (the r12 mid-compaction crash contract, shared with "
    "every sketch sink), and the serve side reads the folded sample "
    "through the same min-gate + refilter theta-union fold as the "
    "batch twin. Emitted exploded as (event_type, rn, h, user_id) "
    "with rn the hash-order position — identical to the batch twin, "
    "because min-k idempotence + associativity make stream-built == "
    "one-shot (the oracle IS the batch twin's SQL). At 100 TB the "
    "corpus pass happens once at ingest; every later eval-set or "
    "inspection-sample read is O(segments x k) sink state.",
)
def q_streaming_user_value_sample_kmv(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from .operators import sketches as S
    from .streaming.windows import replay_events_stream

    path = tempfile.mkdtemp(prefix="kmvsample_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_kmvsample_")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # keep_ppm default None matches the oracle's ungated build
        # (micro-batches are not file-backed; a >1e7-row production
        # batch threads keep_ppm="auto", n_rows=... — sketches.py docs)
        S.write_kmv_sample_partial(
            batch_df.select("event_type", "user_id"),
            path,
            batch_id,
            "event_type",
            "user_id",
            k=SAMPLE_K,
        )

    try:
        q = (
            replay_events_stream(spark, sf_dir)
            .writeStream.foreachBatch(write_batch)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        S.compact_kmv_sample(spark, path, k=SAMPLE_K)
        folded = S.read_kmv_sample(spark, path, k=SAMPLE_K)
        return (
            folded.select(
                F.col("key").alias("event_type"),
                F.posexplode("sample").alias("pos", "hv"),
            )
            .select(
                "event_type",
                (F.col("pos") + 1).cast("long").alias("rn"),
                F.col("hv.h").alias("h"),
                F.col("hv.v").alias("user_id"),
            )
            # the sink dirs are deleted in finally — materialize before
            # the temp state disappears from under the lazy plan
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(path, ignore_errors=True)
