"""Round-12 registrations: the DOULION auto-tier default for triangle
statistics (r11 verdict task #6 — the policy-in-the-output idiom the
KMV family established, applied to the one registry operator whose
exact path is super-linear at 10×), and the sliding-KMV window
dashboard served from STREAMING SINK STATE (task #7 — the r11 batch
fold composed with the foreachBatch KMV sink, the way HLL's sliding
form composes with its MV).

Imported for its registration side effects by
``queries._load_extensions``; same parity rules as every other
registration module (adjacent DuckDB oracle, identical aliases, exact
integer arithmetic wherever both engines must hash-agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .queries import register
from .queries_round8 import (
    TRI_SALT,
    _copurchase_degree_bound,
    _copurchase_edge_pairs_canonical,
)
from .queries_round11 import _kmv_sliding_oracle, sliding_kmv_dashboard

# ---------------------------------------------------------------------------
# parts_triangle_counts_auto — the policy-routed DEFAULT for triangle
# statistics. The policy input is the COMBINATORIAL pair bound
# Σ_orders C(cnt, 2): one O(scan) keyed aggregate over lineitem — NO
# self-join, so sizing the work never pays a slice of the work — that
# both engines compute identically. It upper-bounds the raw pair
# volume (equal-partkey lineitem pairs are counted here but excluded
# by the join's strict <), and an upper bound can only pick a
# MORE-sampled tier — the conservative direction for work. At the
# correctness sf the bound sits below the 10⁷ exact threshold, so the
# entry is hash-exact against the exact enumerator (p = 1 degenerates
# triangle_count_estimate to it); past 10⁷ both engines' CASE ladders
# flip to the same DOULION coin, so the oracle stays correct at ANY
# sf — the scale-dependence lives in the (shared, deterministic)
# policy, never in an engine/oracle mismatch (the r11 ADVICE-#1
# lesson applied from the start).
# ---------------------------------------------------------------------------


def _tri_auto_oracle() -> str:
    # the same tier ladder as graph.doulion_keep_policy, as SQL — kept
    # textually adjacent so a policy edit must touch both or the gate
    # catches it (tests/test_round12.py pins the Python ladder)
    return f"""
WITH ocnt AS (
    SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey
),
pol AS (
    -- COALESCE mirrors the engine's F.coalesce(F.sum(...), 0): SUM
    -- over zero groups is NULL, and NULL < x is NULL, so an empty
    -- lineitem would fall through every WHEN to the 32 tier while
    -- the engine picks (1, 1) — caught by review, pinned by test
    SELECT CAST(1 AS BIGINT) AS keep_num,
           CAST(CASE WHEN COALESCE(SUM(c * (c - 1) // 2), 0)
                          < 10000000 THEN 1
                     WHEN COALESCE(SUM(c * (c - 1) // 2), 0)
                          < 1000000000 THEN 2
                     WHEN COALESCE(SUM(c * (c - 1) // 2), 0)
                          < 100000000000 THEN 10
                     ELSE 32 END AS BIGINT) AS keep_den
    FROM ocnt
),
pairs AS (
    SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                    GREATEST(a.l_partkey, b.l_partkey) AS v
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sampled AS (
    SELECT u, v FROM pairs
    WHERE CAST('0x' || substr(md5(CAST(u AS VARCHAR) || ':'
                || CAST(v AS VARCHAR) || ':{TRI_SALT}'), 1, 8) AS BIGINT)
          % (SELECT keep_den FROM pol) < (SELECT keep_num FROM pol)
),
tri AS (
    SELECT e1.u AS x, e1.v AS y, e2.v AS z
    FROM sampled e1
    JOIN sampled e2 ON e1.u = e2.u AND e1.v < e2.v
    JOIN sampled e3 ON e3.u = e1.v AND e3.v = e2.v
)
SELECT (SELECT keep_num FROM pol) AS policy_keep_num,
       (SELECT keep_den FROM pol) AS policy_keep_den,
       (SELECT COUNT(*) FROM sampled) AS n_sampled_edges,
       (SELECT COUNT(*) FROM tri) AS n_sampled_triangles,
       CAST((SELECT COUNT(*) FROM tri)
            * (SELECT keep_den * keep_den * keep_den FROM pol)
            // (SELECT keep_num * keep_num * keep_num FROM pol)
            AS BIGINT) AS est_triangles
"""


@register(
    "parts_triangle_counts_auto",
    _tri_auto_oracle(),
    doc="Global triangle count through the doulion_keep_policy "
    "auto-tier (operators/graph.py:triangle_count_auto) — the "
    "KMV-gate pattern applied to triangle statistics (r11 verdict "
    "task #6): the combinatorial pair bound sum-over-orders C(cnt,2) "
    "(one O(scan) keyed aggregate over lineitem — no self-join, so "
    "sizing the work never pays a slice of the work; identical in "
    "both engines) resolves the DOULION coin from the documented tier "
    "ladder (exact below 1e7 edges, p=1/2 then 1/10 then 1/32 per "
    "decade pair), the chosen policy travels in the OUTPUT as "
    "(policy_keep_num, policy_keep_den) columns, and p=1 degenerates "
    "the estimator to the exact degree-oriented enumerator (coin < 1 "
    "keeps every edge, scale-up is *1). Both engines evaluate the "
    "SAME ladder on the SAME count, so the oracle stays correct at "
    "any sf — the recommended default for triangle statistics at "
    "100 TB, where the ladder lands on p=1/10 or deeper and the "
    "Theta(E^1.5) intersection work drops ~31x+.",
)
def q_parts_triangle_counts_auto(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators import graph

    edges = _copurchase_edge_pairs_canonical(spark, sf_dir)
    # the policy input: the combinatorial pair bound Σ C(cnt, 2) over
    # orders — an O(scan) keyed aggregate (first SCALE_BENCH_r12 cut
    # measured the naive self-join count at ~1/3 of the enumeration
    # itself; sizing must stay metadata-priced). Upper-bounds raw
    # pairs (equal-partkey lineitem pairs excluded by the join's
    # strict <), so it can only pick a more-sampled tier. The oracle's
    # pol CTE evaluates the same sum.
    li = load_table(spark, sf_dir, "lineitem")
    n_pairs = (
        li.groupBy("l_orderkey")
        .agg(F.count("*").alias("c"))
        .agg(
            F.coalesce(
                F.sum(F.expr("c * (c - 1) DIV 2")), F.lit(0)
            ).alias("n")
        )
        .collect()[0]["n"]
    )
    return graph.triangle_count_auto(
        edges, n_edges=n_pairs, salt=TRI_SALT,
        max_degree_bound=_copurchase_degree_bound(spark, sf_dir),
    )


# ---------------------------------------------------------------------------
# streaming_sliding_kmv_windows — the r11 sliding dashboard served from
# SINK STATE: a real foreachBatch stream lands per-HOUR bottom-k
# partials (corpus-scale work at ingest; the sink holds O(hours × k)
# state), compaction folds them, and the window/intersection dashboard
# reads the folded sketches through the SAME gate-aware kmv_merge fold
# as the batch twin. Min-k idempotence + associativity make
# stream-built == one-shot build, which is why the oracle is literally
# the batch twin's SQL.
# ---------------------------------------------------------------------------


@register(
    "streaming_sliding_kmv_windows",
    _kmv_sliding_oracle(),
    doc="The events_sliding_kmv_windows dashboard served from "
    "STREAMING SINK STATE (r11 verdict task #7): a checkpointed "
    "availableNow foreachBatch stream reduces each micro-batch to its "
    "per-hour bottom-64 partial inside the batch callback "
    "(write_kmv_partial keyed by the hour; min-k idempotence makes "
    "foreachBatch's at-least-once replay contract exact — pinned on "
    "the MV twin), compact_kmv folds "
    "the landed partials, and the 3-hour sliding windows + window-"
    "over-window intersections are computed from the folded sink "
    "sketches by the same associative gate-aware kmv_merge fold as "
    "the batch twin (queries_round11.sliding_kmv_dashboard — shared "
    "code, shared oracle: stream-built == one-shot is the end-to-end "
    "guarantee). At 100 TB the corpus-scale pass happens once at "
    "ingest; every later window/intersection/churn question reads "
    "O(hours x k) sink state.",
)
def q_streaming_sliding_kmv_windows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from .operators import sketches as S
    from .streaming.windows import replay_events_stream

    path = tempfile.mkdtemp(prefix="kmvslide_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_kmvslide_")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # key = the hour as its canonical string (sink keys are
        # strings); parsed back to timestamp_ntz on the serve side
        hourly = batch_df.select(
            F.date_trunc("hour", F.col("ts"))
            .cast("string")
            .alias("hr_s"),
            "user_id",
        )
        S.write_kmv_partial(hourly, path, batch_id, "hr_s", "user_id")

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
        S.compact_kmv(spark, path)
        sk_h = (
            S.read_kmv(spark, path)
            .select(
                F.to_timestamp_ntz("key").alias("key"), "hs", "gate"
            )
            .localCheckpoint(eager=True)
        )
        ev = load_table(spark, sf_dir, "events")
        return sliding_kmv_dashboard(ev, sk_h)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(path, ignore_errors=True)
