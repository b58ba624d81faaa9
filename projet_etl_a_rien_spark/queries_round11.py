"""Round-11 registrations: the keyed drift dashboard and the sliding
set-algebra window — the r10 verdict's asks #5 and #6.

- ``source_length_drift_ks_by_lang``: per-LANGUAGE two-sample KS drift
  between the min-named source and the rest of the corpus, served
  entirely from keyed quantile-sketch grids
  (operators/quantiles.py quantile_sketch_ks_keyed).
- ``events_sliding_kmv_windows``: distinct users per 3-hour sliding
  window from KMV min-k ALGEBRA — the set-operation twin of
  ``events_sliding_hll_windows``, additionally serving the
  window-over-window INTERSECTION (retained users), which register-MAX
  sketches cannot provide.

Imported for its registration side effects by
``queries._load_extensions``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import load_table
from .queries import register
from .queries_round10 import QSK_M

# ---------------------------------------------------------------------------
# Keyed KS drift — "did THIS language's length distribution move in
# THIS source?" answered per key from two bounded grids. The global
# corpus_length_drift_ks_sketch entry is the alarm; this is the
# dashboard behind it: same integer CDF walk, one row per language,
# state stays grid-sized per key, no rescans.
# ---------------------------------------------------------------------------


def _ks_keyed_oracle(m: int) -> str:
    from .operators.quantiles import _log2m

    lm = _log2m(m)
    g = "GREATEST(val, CAST(1 AS BIGINT))"
    p2 = f"CAST(pow(2, length(bin({g})) - 1) AS BIGINT)"
    bucket = f"""CASE WHEN val <= 0 THEN CAST(-1 AS BIGINT)
           ELSE CAST(length(bin({g})) - 1 AS BIGINT) * {m}
                + (CASE WHEN length(bin({g})) - 1 >= {lm}
                   THEN ({g} - {p2}) // ({p2} // {m})
                   ELSE ({g} - {p2}) * {m} // {p2} END)
           END"""
    return f"""
WITH v AS (SELECT lang AS key, CAST(n_chars AS BIGINT) AS val,
                  source = (SELECT MIN(source) FROM documents) AS is_a
           FROM documents),
b AS (SELECT key, {bucket} AS bucket, is_a FROM v),
s AS (SELECT key, bucket,
             CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT)
                 AS cnt_a,
             CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT)
                 AS cnt_b
      FROM b GROUP BY key, bucket),
c AS (SELECT key, bucket,
             SUM(cnt_a) OVER (PARTITION BY key ORDER BY bucket) AS cum_a,
             SUM(cnt_b) OVER (PARTITION BY key ORDER BY bucket) AS cum_b,
             SUM(cnt_a) OVER (PARTITION BY key) AS n_a,
             SUM(cnt_b) OVER (PARTITION BY key) AS n_b
      FROM s),
d AS (SELECT key, bucket, CAST(n_a AS BIGINT) AS n_a,
             CAST(n_b AS BIGINT) AS n_b,
             CASE WHEN n_a > 0 AND n_b > 0 THEN
               ABS(cum_a * CAST(1000000 AS BIGINT) // n_a
                   - cum_b * CAST(1000000 AS BIGINT) // n_b)
             END AS diff_ppm
      FROM c),
p AS (SELECT key, n_a, n_b, diff_ppm, bucket,
             row_number() OVER (PARTITION BY key
                 ORDER BY diff_ppm DESC NULLS LAST, bucket ASC) AS rn
      FROM d)
SELECT key AS lang, n_a, n_b, CAST(diff_ppm AS BIGINT) AS ks_ppm,
       CAST(bucket AS BIGINT) AS at_bucket
FROM p WHERE rn = 1
"""


@register(
    "source_length_drift_ks_by_lang",
    _ks_keyed_oracle(QSK_M),
    doc="Per-LANGUAGE Kolmogorov-Smirnov drift between the min-named "
    "source's document-length distribution and the rest of the corpus "
    "— the drift DASHBOARD behind the global alarm entry, computed "
    "entirely from two KEYED quantile-sketch grids "
    "(quantile_sketch_ks_keyed): per-key full-outer cell join "
    "(<= 64*m+1 cells per key), integer ppm CDFs, max |CDF_a - CDF_b| "
    "at bucket boundaries with deterministic min-bucket tie-break and "
    "explicit NULLS LAST in the per-key pick so both engines agree "
    "even on guarded keys (a language absent from one side surfaces "
    "n_a/n_b with ks_ppm = NULL instead of an engine-dependent "
    "divide-by-zero). At 100 TB this is the hourly per-tenant drift "
    "page: every population lives as bounded mergeable state, the "
    "whole comparison is grid-sized, nothing is rescanned.",
)
def q_source_length_drift_ks_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from .operators import quantiles as Q

    docs = load_table(spark, sf_dir, "documents")
    msrc = docs.agg(F.min("source").alias("min_src"))
    flagged = docs.crossJoin(F.broadcast(msrc)).withColumn(
        "is_a", F.col("source") == F.col("min_src")
    )
    sk_a = Q.quantile_sketch_build_keyed(
        flagged.where(F.col("is_a")), "lang", "n_chars", QSK_M
    )
    sk_b = Q.quantile_sketch_build_keyed(
        flagged.where(~F.col("is_a")), "lang", "n_chars", QSK_M
    )
    return Q.quantile_sketch_ks_keyed(sk_a, sk_b, QSK_M).select(
        F.col("key").alias("lang"), "n_a", "n_b", "ks_ppm", "at_bucket"
    )


# ---------------------------------------------------------------------------
# Sliding-window distinct users from KMV MIN-K ALGEBRA — the sliding
# twin of events_sliding_hll_windows, built on the r10 verdict's #6
# ask: per-hour bottom-k sketches are the one corpus-scale pass, every
# window is the associative kmv_merge of its member hours (min-k of a
# union == union of min-k's, property-pinned), and because KMV keeps a
# SAMPLE instead of registers, adjacent windows also yield their
# intersection — "how many of this window's users were already in the
# previous one" — from the same O(hours x k) state.
# ---------------------------------------------------------------------------

KMV_WIN_HOURS = 3


def _kmv_sliding_oracle() -> str:
    from .operators import sketches as S

    k, full, win = S.KMV_K, S.KMV_FULL, KMV_WIN_HOURS
    return f"""
WITH e AS (SELECT date_trunc('hour', ts) AS hr,
                  CAST(user_id AS VARCHAR) AS v
           FROM events),
hh AS (SELECT DISTINCT hr,
              CAST('0x' || substr(md5('kmv:' || v), 1, 12) AS BIGINT) AS h
       FROM e),
hours AS (SELECT DISTINCT hr FROM e),
fan AS (SELECT DISTINCT f.tgt, f.h
        FROM (SELECT hh.hr + to_hours(i.i) AS tgt, hh.h
              FROM hh, (SELECT unnest(range(0, {win})) AS i) i) f
        JOIN hours x ON f.tgt = x.hr),
r AS (SELECT tgt, h, row_number() OVER (PARTITION BY tgt ORDER BY h)
          AS rn
      FROM fan),
bk AS (SELECT tgt, h, rn FROM r WHERE rn <= {k}),
st AS (SELECT tgt,
              CAST(COUNT(*) AS BIGINT) AS kmv_size,
              CAST(CASE WHEN COUNT(*) < {k} THEN {full}
                   ELSE MAX(CASE WHEN rn = {k} THEN h END)
                   END AS BIGINT) AS theta,
              CAST(SUM(h) AS BIGINT) AS hs_sum,
              CAST(CASE WHEN COUNT(*) < {k} THEN COUNT(*)
                   ELSE {(k - 1) * full}
                        // MAX(CASE WHEN rn = {k} THEN h END)
                   END AS BIGINT) AS est
       FROM bk GROUP BY tgt),
pair AS (SELECT cur.tgt, prev.theta AS tp, cur.theta AS tc
         FROM st cur JOIN st prev
           ON prev.tgt = cur.tgt - INTERVAL 1 HOUR),
pi AS (SELECT b.tgt, a.h FROM bk a JOIN bk b
         ON a.h = b.h AND b.tgt = a.tgt + INTERVAL 1 HOUR),
m AS (SELECT pair.tgt, LEAST(pair.tp, pair.tc) AS theta_min,
             CAST(COUNT(CASE WHEN pi.h <= LEAST(pair.tp, pair.tc)
                        THEN 1 END) AS BIGINT) AS n_match
      FROM pair LEFT JOIN pi ON pi.tgt = pair.tgt
      GROUP BY 1, 2),
f AS (SELECT tgt,
             CAST(CASE WHEN theta_min >= {full} THEN n_match
                  ELSE n_match * {full} // theta_min
                  END AS BIGINT) AS est_inter
      FROM m),
du AS (SELECT DISTINCT date_trunc('hour', ts) AS hr, user_id
       FROM events),
tfan AS (SELECT DISTINCT f.tgt, f.user_id
         FROM (SELECT du.hr + to_hours(i.i) AS tgt, du.user_id
               FROM du, (SELECT unnest(range(0, {win})) AS i) i) f
         JOIN hours x ON f.tgt = x.hr),
tru AS (SELECT tgt, CAST(COUNT(*) AS BIGINT) AS true_distinct
        FROM tfan GROUP BY tgt)
SELECT st.tgt AS window_end_hour, st.kmv_size, st.theta, st.hs_sum,
       st.est, COALESCE(f.est_inter, 0) AS est_inter_prev,
       tru.true_distinct
FROM st LEFT JOIN f ON st.tgt = f.tgt
JOIN tru ON st.tgt = tru.tgt
"""


@register(
    "events_sliding_kmv_windows",
    _kmv_sliding_oracle(),
    doc=f"Distinct users per {KMV_WIN_HOURS}-hour SLIDING window from "
    "KMV MIN-K ALGEBRA: per-hour bottom-64 sketches are built in the "
    "one corpus-scale pass, each window is the associative kmv_merge "
    "of its member hours (window fold == build-on-window-rows when "
    ">= k survive — min-k associativity, property-pinned in "
    "tests/test_round11.py), and est_inter_prev serves the window-"
    "over-window INTERSECTION (retained users vs the previous window) "
    "per row over the two bounded arrays — the set operation HLL's "
    "register-MAX destroys, now available per window from the same "
    "O(hours x k) state (first window coalesces to 0: no "
    "predecessor). hs_sum pins the full retained hash set through the "
    "gate; true_distinct carried per window for the accuracy "
    "property. The oracle computes each window's bottom-k directly "
    "from the fanned distinct set — equal by min-k associativity, "
    "which is exactly the property the engine exploits.",
)
def q_events_sliding_kmv_windows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from .operators import sketches as S

    ev = load_table(spark, sf_dir, "events")
    hr = F.date_trunc("hour", F.col("ts")).alias("hr")
    sk_h = S.kmv_sketch(ev.select(hr, "user_id"), "hr", "user_id")
    hours = ev.select(hr).distinct()
    off = F.explode(
        F.sequence(F.lit(0), F.lit(KMV_WIN_HOURS - 1))
    ).alias("i")
    fan = (
        sk_h.select(F.col("key").alias("hr"), "hs", "gate", off)
        .select(
            F.expr("hr + make_interval(0, 0, 0, 0, i, 0, 0)").alias(
                "key"
            ),
            "hs",
            "gate",
        )
        .join(hours.withColumnsRenamed({"hr": "key"}), "key")
    )
    win = S.kmv_merge(fan)
    st = S.kmv_stats(win).select(
        "key",
        "kmv_size",
        "theta",
        F.aggregate(
            "hs", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("hs_sum"),
        "est",
    )
    a = win.select(
        F.expr("key + make_interval(0, 0, 0, 0, 1, 0, 0)").alias("key"),
        F.col("hs").alias("hs_a"),
        F.col("gate").alias("gate_a"),
    )
    b = win.select("key", F.col("hs").alias("hs_b"), F.col("gate").alias("gate_b"))
    inter = (
        S.kmv_adjacent_overlap(
            a.join(b, "key"), gate_a_col="gate_a", gate_b_col="gate_b"
        )
        .select("key", F.col("est_inter").alias("est_inter_prev"))
    )
    du = ev.select(hr, "user_id").distinct()
    off2 = F.explode(
        F.sequence(F.lit(0), F.lit(KMV_WIN_HOURS - 1))
    ).alias("i")
    tfan = du.select("hr", "user_id", off2).select(
        F.expr("hr + make_interval(0, 0, 0, 0, i, 0, 0)").alias("key"),
        "user_id",
    )
    tru = (
        tfan.join(hours.withColumnsRenamed({"hr": "key"}), "key")
        .groupBy("key")
        .agg(F.countDistinct("user_id").alias("true_distinct"))
    )
    return (
        st.join(inter, "key", "left")
        .join(tru, "key")
        .select(
            F.col("key").alias("window_end_hour"),
            "kmv_size",
            "theta",
            "hs_sum",
            "est",
            F.coalesce("est_inter_prev", F.lit(0).cast("long")).alias(
                "est_inter_prev"
            ),
            "true_distinct",
        )
    )
