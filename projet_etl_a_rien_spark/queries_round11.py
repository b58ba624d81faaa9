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
- ``events_value_drift_daily_ks``: day-over-trailing-window drift of
  the event value distribution — sketch ADDITIVITY composed over time
  (trailing reference = SUM-merge of predecessor grids) feeding the
  keyed KS.
- ``source_shingle_kmv_overlap_gated``: the shingle overlap matrix at
  the 50000 ppm operating point, sized to straddle k so every branch
  of the gate-aware fixed-threshold estimator is oracle-checked.

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
    # keep_ppm pinned to the oracle's ungated build (r11 ADVICE #1)
    sk_h = S.kmv_sketch(
        ev.select(hr, "user_id"), "hr", "user_id", keep_ppm=None
    )
    return sliding_kmv_dashboard(ev, sk_h)


def sliding_kmv_dashboard(ev: DataFrame, sk_h: DataFrame) -> DataFrame:
    """The sliding-window fold + window-over-window intersection served
    from ANY per-hour KMV sketch frame (key = hour timestamp, hs,
    gate) — shared by the batch build above and the r12 sink-state twin
    (queries_round12: the sketches come from read_kmv over streamed
    partials; min-k idempotence/associativity makes both equal the
    one-shot build, so both run against the same oracle SQL). ``ev`` is
    used only for the hour domain and the per-window true_distinct
    accuracy column."""
    from pyspark.sql import functions as F

    from .operators import sketches as S

    hr = F.date_trunc("hour", F.col("ts")).alias("hr")
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


# ---------------------------------------------------------------------------
# Trailing-window daily drift monitor — sketch ADDITIVITY composed over
# TIME, then keyed KS: per-day value grids are built once (the only
# corpus-scale pass), each day's TRAILING-3-DAY reference distribution
# is the SUM-merge of its three predecessors' grids (additive fold —
# no event is rescanned), and the day-vs-trailing drift is the keyed
# two-sample KS. This is the production "did today's ingest move vs
# the trailing window" alarm: O(days x grid) state answers every day's
# comparison, and both the window fold and the comparison are
# grid-sized.
# ---------------------------------------------------------------------------

DRIFT_TRAIL_DAYS = 3


def _daily_drift_oracle(m: int) -> str:
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
    w = DRIFT_TRAIL_DAYS
    return f"""
WITH v AS (SELECT date_trunc('day', ts) AS d,
                  CAST(ROUND(value * 100) AS BIGINT) AS val
           FROM events),
b AS (SELECT d, {bucket} AS bucket FROM v),
s AS (SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM b GROUP BY d, bucket),
days AS (SELECT DISTINCT d FROM v),
valid AS (SELECT f.tgt FROM
            (SELECT days.d + to_days(CAST(i.i AS INTEGER)) AS tgt, days.d AS src
             FROM days, (SELECT unnest(range(1, {w + 1})) AS i) i) f
          JOIN days x ON f.src = x.d
          JOIN days y ON f.tgt = y.d
          GROUP BY f.tgt HAVING COUNT(DISTINCT f.src) = {w}),
trail AS (SELECT f.tgt AS key, s.bucket,
                 CAST(SUM(s.cnt) AS BIGINT) AS cnt_a
          FROM s, (SELECT unnest(range(1, {w + 1})) AS i) i,
               LATERAL (SELECT s.d + to_days(CAST(i.i AS INTEGER)) AS tgt) f
          WHERE f.tgt IN (SELECT tgt FROM valid)
          GROUP BY 1, 2),
cur AS (SELECT d AS key, bucket, cnt AS cnt_b FROM s
        WHERE d IN (SELECT tgt FROM valid)),
cells AS (SELECT COALESCE(t.key, c.key) AS key,
                 COALESCE(t.bucket, c.bucket) AS bucket,
                 COALESCE(t.cnt_a, 0) AS cnt_a,
                 COALESCE(c.cnt_b, 0) AS cnt_b
          FROM trail t FULL OUTER JOIN cur c
            ON t.key = c.key AND t.bucket = c.bucket),
cum AS (SELECT key, bucket,
               SUM(cnt_a) OVER (PARTITION BY key ORDER BY bucket)
                   AS cum_a,
               SUM(cnt_b) OVER (PARTITION BY key ORDER BY bucket)
                   AS cum_b,
               SUM(cnt_a) OVER (PARTITION BY key) AS n_a,
               SUM(cnt_b) OVER (PARTITION BY key) AS n_b
        FROM cells),
d2 AS (SELECT key, bucket, CAST(n_a AS BIGINT) AS n_a,
              CAST(n_b AS BIGINT) AS n_b,
              CASE WHEN n_a > 0 AND n_b > 0 THEN
                ABS(cum_a * CAST(1000000 AS BIGINT) // n_a
                    - cum_b * CAST(1000000 AS BIGINT) // n_b)
              END AS diff_ppm
       FROM cum),
p AS (SELECT key, n_a, n_b, diff_ppm, bucket,
             row_number() OVER (PARTITION BY key
                 ORDER BY diff_ppm DESC NULLS LAST, bucket ASC) AS rn
      FROM d2)
SELECT key AS day, n_a AS n_trailing, n_b AS n_day,
       CAST(diff_ppm AS BIGINT) AS ks_ppm,
       CAST(bucket AS BIGINT) AS at_bucket
FROM p WHERE rn = 1
"""


@register(
    "events_value_drift_daily_ks",
    _daily_drift_oracle(QSK_M),
    doc=f"Day-over-trailing-{DRIFT_TRAIL_DAYS}-day drift of the event "
    "VALUE distribution, one KS row per day: per-day quantile-sketch "
    "grids are built in the one corpus-scale pass, each day's "
    "trailing reference is the ADDITIVE SUM-merge of its three "
    "predecessors' grids (sketch additivity composed over time — no "
    "event rescanned, the same fan-out shape as the sliding HLL/KMV "
    "windows), and day-vs-trailing drift is the keyed two-sample KS "
    "(integer ppm CDFs, min-bucket tie-break, NULLS LAST). Only days "
    "with a complete trailing window emit (contributing-day count "
    "pinned = 3). This is the nightly ingest-monitoring alarm at "
    "100 TB: O(days x grid) state serves every day's comparison and "
    "the whole evaluation is grid-sized. Values enter as exact cents "
    "so both engines bucket identically.",
)
def q_events_value_drift_daily_ks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from .operators import quantiles as Q

    w = DRIFT_TRAIL_DAYS
    ev = load_table(spark, sf_dir, "events")
    rows = ev.select(
        F.date_trunc("day", F.col("ts")).alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("val"),
    )
    grids = Q.quantile_sketch_build_keyed(rows, "d", "val", QSK_M)
    days = rows.select("d").distinct()
    off = F.explode(F.sequence(F.lit(1), F.lit(w))).alias("i")
    # valid targets: days whose full trailing window exists
    fan_days = days.select("d", off).select(
        F.col("d").alias("src"),
        F.expr("d + make_interval(0, 0, 0, i, 0, 0, 0)").alias("tgt"),
    )
    valid = (
        fan_days.join(days.withColumnsRenamed({"d": "tgt"}), "tgt")
        .groupBy("tgt")
        .agg(F.countDistinct("src").alias("n_days"))
        .where(F.col("n_days") == w)
        .select("tgt")
    )
    trail = (
        grids.select("key", "bucket", "cnt", off)
        .select(
            F.expr(
                "key + make_interval(0, 0, 0, i, 0, 0, 0)"
            ).alias("tgt"),
            "bucket",
            "cnt",
        )
        .join(valid, "tgt")
        .groupBy(F.col("tgt").alias("key"), F.col("bucket"))
        .agg(F.sum("cnt").alias("cnt"))
    )
    cur = grids.join(
        valid.withColumnsRenamed({"tgt": "key"}), "key"
    ).select("key", "bucket", "cnt")
    return Q.quantile_sketch_ks_keyed(trail, cur, QSK_M).select(
        F.col("key").alias("day"),
        F.col("n_a").alias("n_trailing"),
        F.col("n_b").alias("n_day"),
        "ks_ppm",
        "at_bucket",
    )


# ---------------------------------------------------------------------------
# The gated source-overlap matrix — the 100 TB operating point of
# source_shingle_kmv_overlap, registered so the GATE-AWARE pair
# arithmetic (the r10 ADVICE composition fix) sits inside the hash
# gate end-to-end: at 50000 ppm the per-source shingle sketches
# straddle k (some under-full, some full), so theta takes BOTH
# branches (gate vs h_(k)), under-full estimates scale by the inverse
# keep rate, and est_inter scales by full/theta_min — every branch of
# the fixed-threshold estimator oracle-checked.
# ---------------------------------------------------------------------------

SRC_KMV_GATE_PPM = 50_000


def _src_kmv_gated_oracle() -> str:
    from .operators import sketches as S
    from .queries_round10 import SRC_KMV_N

    k, full, n = S.KMV_K, S.KMV_FULL, SRC_KMV_N
    gate = (full * SRC_KMV_GATE_PPM) // 1_000_000
    gram_list = (
        f"list_distinct(list_transform("
        f"range(len(string_split(text, ' ')) - {n - 1}),"
        f" i -> array_to_string(string_split(text, ' ')[i + 1:i + {n}], ' ')))"
    )
    return f"""
WITH e AS (
    SELECT DISTINCT source AS key, unnest({gram_list}) AS v
    FROM documents
    WHERE len(string_split(text, ' ')) >= {n}
),
hh AS (SELECT DISTINCT key,
              CAST('0x' || substr(md5('kmv:' || v), 1, 12) AS BIGINT) AS h
       FROM e),
gg AS (SELECT key, h FROM hh WHERE h < {gate}),
r AS (SELECT key, h,
             row_number() OVER (PARTITION BY key ORDER BY h) AS rn
      FROM gg),
bk AS (SELECT key, h, rn FROM r WHERE rn <= {k}),
st AS (SELECT key,
              CAST(COUNT(*) AS BIGINT) AS kmv_size,
              CAST(CASE WHEN COUNT(*) < {k} THEN {gate}
                   ELSE MAX(CASE WHEN rn = {k} THEN h END)
                   END AS BIGINT) AS theta
       FROM bk GROUP BY key),
est AS (SELECT key, kmv_size, theta,
               CAST(CASE WHEN kmv_size < {k}
                    THEN kmv_size * {full} // {gate}
                    ELSE {(k - 1) * full} // theta END AS BIGINT) AS est
        FROM st),
p AS (SELECT a.key AS key_a, b.key AS key_b, a.h
      FROM bk a JOIN bk b ON a.h = b.h AND a.key < b.key),
pj AS (SELECT p.key_a, p.key_b, p.h,
             LEAST(sa.theta, sb.theta) AS theta_min,
             sa.est AS est_a, sb.est AS est_b
      FROM p JOIN est sa ON p.key_a = sa.key
             JOIN est sb ON p.key_b = sb.key),
agg AS (SELECT key_a, key_b, theta_min, est_a, est_b,
               CAST(SUM(CASE WHEN h <= theta_min THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_match
        FROM pj GROUP BY 1, 2, 3, 4, 5),
fin AS (SELECT key_a, key_b, n_match, theta_min, est_a, est_b,
               CAST(CASE WHEN theta_min >= {full} THEN n_match
                    ELSE n_match * {full} // theta_min
                    END AS BIGINT) AS est_inter
        FROM agg)
SELECT key_a AS source_a, key_b AS source_b, n_match, theta_min,
       est_a, est_b, est_inter,
       CAST(est_a + est_b - est_inter AS BIGINT) AS est_union,
       CAST(est_inter * 1000000
            // (est_a + est_b - est_inter) AS BIGINT) AS jaccard_ppm
FROM fin
"""


@register(
    "source_shingle_kmv_overlap_gated",
    _src_kmv_gated_oracle(),
    doc=f"The source-overlap shingle matrix at a {SRC_KMV_GATE_PPM} "
    "ppm keep gate — the 100 TB operating point where only 1-in-20 "
    "hashes reaches the distinct exchange. Deliberately sized so the "
    "per-source sketches STRADDLE k: under-full sources take theta = "
    "gate and est = size * 2^48 DIV gate (the inverse-keep-rate "
    "scale-up), full sources take the classic h_(k) form, and the "
    "pair intersection scales by 2^48 DIV theta_min — every branch "
    "of the gate-aware fixed-threshold estimator (the r10 ADVICE "
    "composition fix, gate carried inside the sketch) verified "
    "hash-exact through the oracle. Ungated twin stays registered as "
    "the exact-content baseline.",
)
def q_source_shingle_kmv_overlap_gated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from .operators import sketches as S
    from .operators.dedup import shingles
    from .queries_round10 import SRC_KMV_N

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        F.col("source").alias("key"),
        F.explode(shingles("text", SRC_KMV_N)).alias("g"),
    )
    sk = S.kmv_sketch(grams, "key", "g", keep_ppm=SRC_KMV_GATE_PPM)
    return S.kmv_pair_overlap(sk).select(
        F.col("key_a").alias("source_a"),
        F.col("key_b").alias("source_b"),
        "n_match",
        "theta_min",
        "est_a",
        "est_b",
        "est_inter",
        "est_union",
        "jaccard_ppm",
    )


# ---------------------------------------------------------------------------
# Consistent distinct-value sampling — the KMV sketch keeping VALUES:
# bottom-k hashing doubles as a coordinated uniform sample of each
# key's distinct values (Broder 1997 min-wise sampling / Cohen-Kaplan
# bottom-k sketches). Unlike TABLESAMPLE or rand()-based picks, the
# sample is deterministic across partitionings/replays/engines,
# uniform over DISTINCT values (not row-frequency-biased), stable
# day-over-day (the same value keeps the same hash — re-sampling
# reselects yesterday's survivors plus/minus real churn), and
# mergeable by the same min-k fold as the counting sketch. This is how
# a 100 TB pipeline maintains per-segment eval sets and inspection
# samples from sketch-sized state.
# ---------------------------------------------------------------------------

SAMPLE_K = 16


def _kmv_sample_oracle() -> str:
    return f"""
WITH e AS (SELECT event_type AS key, CAST(user_id AS VARCHAR) AS v
           FROM events),
hh AS (SELECT DISTINCT key, v,
              CAST('0x' || substr(md5('kmv:' || v), 1, 12) AS BIGINT) AS h
       FROM e),
r AS (SELECT key, h, v,
             row_number() OVER (PARTITION BY key ORDER BY h, v) AS rn
      FROM hh)
SELECT key AS event_type, CAST(rn AS BIGINT) AS rn, h,
       v AS user_id
FROM r WHERE rn <= {SAMPLE_K}
"""


@register(
    "events_user_distinct_sample_kmv",
    _kmv_sample_oracle(),
    doc=f"Bottom-{SAMPLE_K} CONSISTENT uniform sample of distinct "
    "users per event type (operators/sketches.py kmv_sample): "
    "membership is decided by the fixed salted-md5 hash order, so the "
    "sample is uniform over DISTINCT users (row frequency cannot bias "
    "it), deterministic across partitionings/replays/engines, "
    "COORDINATED across segments and across days (stable eval sets: "
    "re-sampling tomorrow reselects today's survivors plus/minus real "
    "churn), and mergeable by the same min-k fold as the counting "
    "sketch (merge == one-shot, property-pinned). Emitted exploded as "
    "(event_type, rn, h, user_id) with rn the hash-order position — "
    "the whole sample is sketch-sized state, built in one corpus "
    "pass. The same bottom-k arrays also serve the distinct COUNT and "
    "set-operation entries: one structure, counter AND sample.",
)
def q_events_user_distinct_sample_kmv(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from .operators import sketches as S

    ev = load_table(spark, sf_dir, "events")
    parts = [
        # keep_ppm pinned to the oracle's ungated build (ADVICE #1)
        S.kmv_sample(
            ev.where(F.col("event_id") % 2 == b),
            "event_type",
            "user_id",
            k=SAMPLE_K,
            keep_ppm=None,
        )
        for b in range(2)
    ]
    merged = S.kmv_sample_merge(*parts, k=SAMPLE_K)
    return merged.select(
        F.col("key").alias("event_type"),
        F.posexplode("sample").alias("pos", "hv"),
    ).select(
        "event_type",
        (F.col("pos") + 1).cast("long").alias("rn"),
        F.col("hv.h").alias("h"),
        F.col("hv.v").alias("user_id"),
    )
