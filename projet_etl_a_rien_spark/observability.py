"""Edge observability — the engine's answer to NiFi's LogAttribute hops.

The reference flow logs flowfile attributes on every success/failure edge
(four LogAttribute processors, ``/root/reference/nifi_data/tp.xml:430,
1067,1206,1973``). In a declarative Spark engine the equivalent is NOT a
row-at-a-time logger (that would force a Python hot path); it is

1. ``observe()`` metrics — named aggregates attached to the plan and
   collected as a side effect of whatever action runs, zero extra passes;
2. a driver-side log line when the edge is wired, recording the edge name
   and schema (the "attributes" NiFi would print).

``observed_edge`` returns the instrumented DataFrame plus the
``Observation`` handle whose ``.get`` yields the metrics after any action
— usable on every ingest edge (Kafka/JDBC/HTTP/file) without touching
the data path.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

logger = logging.getLogger("projet_etl_a_rien_spark.edges")


def observed_edge(df: DataFrame, edge_name: str) -> tuple[DataFrame, Observation]:
    """Instrument an ingest/egress edge with passive row/null metrics.

    Metrics ride along with the next action on the returned DataFrame
    (no extra job): total rows and per-column null counts — the two
    things the reference's LogAttribute hops made visible.
    """
    obs = Observation(edge_name)
    metrics = [F.count(F.lit(1)).alias("rows")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}") for c in df.columns
    ]
    logger.info("edge %s wired: schema=%s", edge_name, df.schema.simpleString())
    return df.observe(obs, *metrics), obs


class BatchProgressRecorder:
    """Streaming-side observability: a ``StreamingQueryListener`` that
    records per-micro-batch progress (rows in, processing duration,
    stateful-operator rows) — what the reference's LogAttribute hops
    showed for NiFi flowfiles, as structured records instead of log
    lines. Attach before starting queries; ``.progress`` accumulates one
    dict per finished batch, the feed for lag/throughput alerting in a
    production pipeline."""

    def __init__(self) -> None:
        from pyspark.sql.streaming import StreamingQueryListener

        recorder = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                recorder.progress.append(
                    {
                        "query": p.name,
                        "batch_id": p.batchId,
                        "num_input_rows": p.numInputRows,
                        "duration_ms": (p.durationMs or {}).get("triggerExecution"),
                    }
                )

            def onQueryTerminated(self, event):
                pass

            def onQueryIdle(self, event):
                pass

        self.progress: list[dict] = []
        self._listener = _L()

    def attach(self, spark) -> "BatchProgressRecorder":
        spark.streams.addListener(self._listener)
        return self

    def detach(self, spark) -> None:
        spark.streams.removeListener(self._listener)
