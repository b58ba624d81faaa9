"""Corpus-curation registry: quality gates, repetition, PII, sampling,
mixing, sessionization.

The pretraining-curation slice of the LLM-pipeline surface (the dedup /
similarity / fingerprinting half lives in queries_llm.py): Gopher/C4-ish
quality filters, n-gram repetition signals, PII scanning, reproducible
stratified sampling, source-mix reweighting, and batch sessionization
over the events log. Same parity rules as queries.py — exact-integer
aggregates wrapped BIGINT in the oracles, identical aliasing, divisions
written with identical operand shapes on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .operators import text
from .operators.dedup import dedup_exact
from .operators.scd import scd2_from_log
from .operators.sessions import sessionize
from .queries import register


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


_STOPLIST_SQL = "['the', 'a', 'of', 'and', 'to', 'in']"


@register(
    "doc_gopher_quality_flags",
    f"""
WITH s AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace,
           CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                                   {_STOPLIST_SQL})) AS BIGINT) AS n_stopword_kinds,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
    FROM documents
)
SELECT doc_id, n_words,
       n_nonspace / n_words AS mean_word_len,
       n_stopword_kinds,
       n_uniq / n_words AS frac_unique_words,
       (n_words >= 20 AND n_words <= 100000
        AND n_nonspace / n_words >= 2.0 AND n_nonspace / n_words <= 12.0
        AND n_stopword_kinds >= 2
        AND n_uniq / n_words >= 0.1) AS passes_quality
FROM s
""",
    doc="Gopher/C4-style per-doc quality gate: word-count bounds, mean "
    "word length bounds, >=2 distinct stopwords, unique-word fraction, "
    "composite pass verdict. All-JVM column algebra; exact-int operands "
    "so every derived double is engine-identical.",
)
def q_doc_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.gopher_quality_flags(_docs(spark, sf_dir))


@register(
    "doc_repetition_stats",
    """
WITH base AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
           string_split(text, ' ') AS toks
    FROM documents
    WHERE len(string_split(text, ' ')) >= 2
),
bg AS (
    SELECT doc_id, n_words, n_uniq,
           unnest(list_transform(range(1, CAST(n_words AS INTEGER)),
                                 i -> toks[i] || ' ' || toks[i + 1])) AS bigram
    FROM base
),
counts AS (
    SELECT doc_id, n_words, n_uniq, bigram, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM bg GROUP BY 1, 2, 3, 4
)
SELECT doc_id,
       1.0 - n_uniq / n_words AS dup_token_frac,
       bigram AS top_bigram,
       cnt AS top_bigram_count,
       cnt / (n_words - 1) AS top_bigram_frac
FROM counts
QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bigram) = 1
""",
    doc="Gopher repetition signals: duplicate-token fraction and the top "
    "bigram's share of all bigrams (the n-gram-loop detector). Bigram "
    "lists built per-row JVM-side, one explode + per-doc window argmax; "
    "ties to the lexicographically smallest bigram.",
)
def q_doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.repetition_stats(_docs(spark, sf_dir))


@register(
    "doc_pii_scan",
    r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))
            AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_digit_runs,
       md5(regexp_replace(text, '[0-9]+', '<NUM>', 'g')) AS redacted_fingerprint
FROM documents
""",
    doc="PII surface scan: email-shaped and digit-run match counts plus "
    "the md5 of the digit-redacted text (corpus-wide pre-redaction "
    "audit). RE2-safe patterns run verbatim in both engines; Spark's "
    "regexp_replace is global by default = DuckDB's 'g'.",
)
def q_doc_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.pii_scan(_docs(spark, sf_dir))


# keep-rates per language, out of 100 hash buckets: downsample the
# over-represented language, keep the tail intact
SAMPLE_RATES = {"en": 40, "fr": 80}
SAMPLE_DEFAULT_RATE = 100
SAMPLE_SALT = "sample:"


@register(
    "doc_stratified_sample",
    f"""
WITH s AS (
    SELECT doc_id, lang,
           CAST('0x' || substr(md5('{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8)
                AS BIGINT) % 100 AS bucket
    FROM documents
)
SELECT doc_id, lang
FROM s
WHERE bucket < CASE lang WHEN 'en' THEN {SAMPLE_RATES["en"]}
                         WHEN 'fr' THEN {SAMPLE_RATES["fr"]}
                         ELSE {SAMPLE_DEFAULT_RATE} END
""",
    doc="Reproducible stratified downsampling: per-language keep-rate "
    "applied via salted-md5 hash bucket of the doc id — membership is "
    "stable across runs, engines, partitionings, and corpus growth "
    "(rand(seed) is partition-order sensitive and reshuffles every "
    "plan change). Returns the surviving rows, not just counts.",
)
def q_doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = text.split_bucket("doc_id", salt=SAMPLE_SALT)
    rate = (
        F.when(F.col("lang") == "en", SAMPLE_RATES["en"])
        .when(F.col("lang") == "fr", SAMPLE_RATES["fr"])
        .otherwise(SAMPLE_DEFAULT_RATE)
    )
    return _docs(spark, sf_dir).where(b < rate).select("doc_id", "lang")


@register(
    "source_mixing_weights",
    """
WITH per_source AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
),
tot AS (
    SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs,
           CAST(COUNT(*) AS BIGINT) AS n_sources
    FROM per_source
)
SELECT source, n_docs, n_tokens,
       n_docs / total_docs AS corpus_share,
       1.0 / n_sources AS target_share,
       (1.0 / n_sources) / (n_docs / total_docs) AS mix_weight
FROM per_source, tot
""",
    doc="Domain-mixing reweighting: per-source doc/token counts, corpus "
    "share, uniform target share, and the sampling weight that equalizes "
    "the mix (the input every weighted-sampling data loader needs). "
    "Identical division shapes both engines; one tiny aggregate "
    "broadcast-joined back.",
)
def q_source_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    per_source = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(text.token_count("text")).alias("n_tokens"),
    )
    tot = per_source.agg(
        F.sum("n_docs").alias("total_docs"), F.count("*").alias("n_sources")
    )
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_docs") / F.col("total_docs")).alias("corpus_share"),
        (F.lit(1.0) / F.col("n_sources")).alias("target_share"),
        ((F.lit(1.0) / F.col("n_sources")) / (F.col("n_docs") / F.col("total_docs"))).alias(
            "mix_weight"
        ),
    )


SESSION_GAP_SECONDS = 1800


@register(
    "events_sessionization",
    f"""
WITH flagged AS (
    SELECT user_id, ts, epoch_us(ts) AS us,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_SECONDS} * 1000000
                THEN 1 ELSE 0 END AS new_session,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sid AS (
    SELECT user_id, ts, us, cents,
           CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM flagged
)
SELECT user_id, session_id,
       MIN(ts) AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us,
       CAST(SUM(cents) AS BIGINT) AS sum_value_cents
FROM sid
GROUP BY user_id, session_id
""",
    doc="Batch gap-sessionization (30 min): lag-flag session starts, "
    "running-sum session ordinals, per-session rollup — the classic "
    "two-window form, one user-key shuffle reused by both windows and "
    "the final groupBy. Gap compares exact epoch microseconds. The "
    "batch twin of streaming_session_windows.",
)
def q_events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(
        load_table(spark, sf_dir, "events"), gap_seconds=SESSION_GAP_SECONDS
    )


SEG_TOKENS = 10


@register(
    "doc_segment_dup_stats",
    f"""
WITH base AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    WHERE len(string_split(text, ' ')) >= {SEG_TOKENS}
),
segs AS (
    SELECT doc_id,
           md5(unnest(list_transform(
               range(0, CAST(len(toks) // {SEG_TOKENS} AS INTEGER)),
               i -> array_to_string(list_slice(toks, i * {SEG_TOKENS} + 1,
                                               i * {SEG_TOKENS} + {SEG_TOKENS}), ' '))))
             AS seg_h
    FROM base
),
cnt AS (
    SELECT seg_h, CAST(COUNT(*) AS BIGINT) AS c FROM segs GROUP BY seg_h
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segments,
       CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
         / CAST(COUNT(*) AS BIGINT) AS dup_segment_frac
FROM segs JOIN cnt USING (seg_h)
GROUP BY doc_id
""",
    doc="CCNet/RefinedWeb-style segment-level duplication profile: fixed "
    "10-token segments, corpus-wide occurrence counts, per-doc duplicated-"
    "segment fraction. Segments built row-local with higher-order array "
    "functions; every shuffle keys on md5(segment), never the text.",
)
def q_doc_segment_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.segment_dup_stats(_docs(spark, sf_dir), seg_tokens=SEG_TOKENS)


@register(
    "corpus_segment_dedup_rewrite",
    f"""
WITH base AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    WHERE len(string_split(text, ' ')) >= {SEG_TOKENS}
),
segs AS (
    SELECT doc_id, i AS pos,
           array_to_string(list_slice(toks, i * {SEG_TOKENS} + 1,
                                      i * {SEG_TOKENS} + {SEG_TOKENS}), ' ') AS seg
    FROM base, UNNEST(range(0, CAST(len(toks) // {SEG_TOKENS} AS BIGINT))) AS u(i)
),
ranked AS (
    SELECT doc_id, pos, seg,
           ROW_NUMBER() OVER (PARTITION BY md5(seg) ORDER BY doc_id, pos) AS rn
    FROM segs
)
SELECT doc_id,
       COALESCE(string_agg(seg, ' ' ORDER BY pos) FILTER (WHERE rn = 1), '')
           AS clean_text,
       CAST(COUNT(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
       CAST(COUNT(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_removed
FROM ranked
GROUP BY doc_id
""",
    doc="C4-style corpus segment dedup as a REWRITE, not a report "
    "(operators/text.py:segment_dedup_rewrite): keep the first "
    "(doc_id, pos) occurrence of every 10-token segment corpus-wide, "
    "drop all later occurrences, reassemble each document from its "
    "surviving segments in position order. The transform a 100 TB "
    "curation run applies after doc_segment_dup_stats has measured the "
    "duplication — one md5(segment)-keyed window shuffle, one doc-id "
    "reassembly shuffle.",
)
def q_corpus_segment_dedup_rewrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return text.segment_dedup_rewrite(_docs(spark, sf_dir), seg_tokens=SEG_TOKENS)


@register(
    "events_user_scd2",
    """
WITH o AS (
    SELECT user_id, event_type, ts, event_id,
           CASE WHEN lag(event_type) OVER w IS NULL
                  OR lag(event_type) OVER w <> event_type
                THEN 1 ELSE 0 END AS chg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
    SELECT user_id, event_type AS status, ts,
           CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
    FROM o
),
dim AS (
    SELECT user_id, version, status,
           MIN(ts) AS valid_from,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM runs GROUP BY user_id, version, status
)
SELECT user_id, version, status, valid_from,
       lead(valid_from) OVER w2 AS valid_to,
       lead(valid_from) OVER w2 IS NULL AS is_current,
       n_events
FROM dim
WINDOW w2 AS (PARTITION BY user_id ORDER BY version)
""",
    doc="SCD Type-2 dimension build from the event log: collapse each "
    "user's event_type history into validity intervals (gaps-and-islands "
    "lag-flag + running-sum versions), close each interval with lead. "
    "Every window and the groupBy share ONE hash partitioning on "
    "user_id; ordering made total with the event_id tiebreaker.",
)
def q_events_user_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scd2_from_log(load_table(spark, sf_dir, "events"))


@register(
    "corpus_curation_funnel",
    """
WITH f AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           (CAST(len(string_split(text, ' ')) AS BIGINT) >= 20
            AND CAST(len(string_split(text, ' ')) AS BIGINT) <= 100000
            AND CAST(length(replace(text, ' ', '')) AS BIGINT)
                  / CAST(len(string_split(text, ' ')) AS BIGINT) >= 2.0
            AND CAST(length(replace(text, ' ', '')) AS BIGINT)
                  / CAST(len(string_split(text, ' ')) AS BIGINT) <= 12.0
            AND CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                         ['the', 'a', 'of', 'and', 'to', 'in'])) AS BIGINT) >= 2
            AND CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                  / CAST(len(string_split(text, ' ')) AS BIGINT) >= 0.1) AS g,
           md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fp
    FROM documents
),
r AS (
    SELECT n_tokens, g,
           (g AND ROW_NUMBER() OVER (PARTITION BY fp, g ORDER BY doc_id) = 1)
               AS keeper
    FROM f
)
SELECT 'stage0_raw' AS stage,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM r
UNION ALL
SELECT 'stage1_quality',
       CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN g THEN n_tokens ELSE 0 END) AS BIGINT)
FROM r
UNION ALL
SELECT 'stage2_dedup',
       CAST(SUM(CASE WHEN keeper THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN keeper THEN n_tokens ELSE 0 END) AS BIGINT)
FROM r
""",
    doc="Curation funnel report: docs/tokens surviving each pipeline "
    "stage (raw -> Gopher quality gate -> exact dedup) — the ops "
    "artifact a curation run publishes so a collapsed stage is visible "
    "as a number, not a downstream surprise. ONE pass: cumulative "
    "boolean stage flags per doc (keeper ranked within (fingerprint, "
    "gate) so dedup applies among quality survivors, matching the "
    "pipeline's stage order), a single-row conditional aggregate, and a "
    "3-row unpivot — no per-stage rescans, the only shuffle is the "
    "fingerprint window.",
)
def q_corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = _docs(spark, sf_dir).select(
        "doc_id",
        text.token_count("text").alias("n_tokens"),
        text.gopher_passes("text").alias("g"),
        text.fingerprint("text").alias("fp"),
    )
    w = Window.partitionBy("fp", "g").orderBy("doc_id")
    r = d.select(
        "n_tokens",
        "g",
        (F.col("g") & (F.row_number().over(w) == 1)).alias("keeper"),
    )
    one = r.agg(
        F.count("*").alias("d0"),
        F.sum("n_tokens").alias("t0"),
        F.sum(F.when(F.col("g"), 1).otherwise(0)).cast("long").alias("d1"),
        F.sum(F.when(F.col("g"), F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("t1"),
        F.sum(F.when(F.col("keeper"), 1).otherwise(0)).cast("long").alias("d2"),
        F.sum(F.when(F.col("keeper"), F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("t2"),
    )
    return one.selectExpr(
        "stack(3, 'stage0_raw', d0, t0,"
        " 'stage1_quality', d1, t1,"
        " 'stage2_dedup', d2, t2) AS (stage, n_docs, n_tokens)"
    )



@register(
    "corpus_curation_pipeline",
    """
WITH gated AS (
    SELECT doc_id, lang, text,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
    WHERE CAST(len(string_split(text, ' ')) AS BIGINT) >= 20
      AND CAST(len(string_split(text, ' ')) AS BIGINT) <= 100000
      AND CAST(length(replace(text, ' ', '')) AS BIGINT)
            / CAST(len(string_split(text, ' ')) AS BIGINT) >= 2.0
      AND CAST(length(replace(text, ' ', '')) AS BIGINT)
            / CAST(len(string_split(text, ' ')) AS BIGINT) <= 12.0
      AND CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                   ['the', 'a', 'of', 'and', 'to', 'in'])) AS BIGINT) >= 2
      AND CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
            / CAST(len(string_split(text, ' ')) AS BIGINT) >= 0.1
),
deduped AS (
    SELECT doc_id, lang, n_tokens FROM gated
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g'))
        ORDER BY doc_id) = 1
),
split_assigned AS (
    SELECT lang, n_tokens,
           CASE WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                     AS BIGINT) % 100 < 90 THEN 'train'
                WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                     AS BIGINT) % 100 < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM deduped
)
SELECT split, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM split_assigned
GROUP BY split, lang
""",
    doc="The composed end-to-end curation pipeline: Gopher quality gate "
    "-> exact dedup (min-id keeper per normalized-md5 fingerprint) -> "
    "reproducible 90/5/5 hash split -> per-(split, lang) doc/token "
    "totals. One fingerprint shuffle + one tiny final aggregate; the "
    "gate is a pushed-down scan filter, so at 100 TB rejected docs "
    "never reach the shuffle.",
)
def q_corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).where(text.gopher_passes("text"))
    kept = dedup_exact(d)
    b = text.split_bucket("doc_id")
    split = (
        F.when(b < 90, "train").when(b < 95, "val").otherwise("test").alias("split")
    )
    return (
        kept.select("lang", split, text.token_count("text").alias("n_tokens"))
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


TOKEN_BUDGET = 15_000
QB_BUCKETS = 1000


@register(
    "corpus_token_budget_selection",
    f"""
WITH d AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           ({QB_BUCKETS} * CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT))
               // CAST(len(string_split(text, ' ')) AS BIGINT) AS qb
    FROM documents
),
sel AS (
    SELECT doc_id, qb, n_tokens,
           COALESCE(CAST(SUM(n_tokens) OVER (
               ORDER BY qb DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
             0) AS tokens_before
    FROM d
)
SELECT doc_id, qb, n_tokens, tokens_before
FROM sel WHERE tokens_before < {TOKEN_BUDGET}
""",
    doc="Greedy highest-quality-first corpus selection under a total "
    "token budget. The oracle IS the naive spec — one global window over "
    "(quality DESC, id) — while the engine computes the identical prefix "
    "sum with no global sort: per-bucket totals, a broadcast cumulative "
    "over <=1000 bucket rows, and bucket-partitioned per-doc windows "
    "(operators/text.py:token_budget_selection). Hash-equality of the "
    "two is the proof the decomposition is exact.",
)
def q_corpus_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_budget_selection(
        _docs(spark, sf_dir), budget=TOKEN_BUDGET, quality_buckets=QB_BUCKETS
    )


SOURCE_CAP = 15
CAP_SALT = "cap:"


@register(
    "doc_source_caps",
    f"""
SELECT doc_id, source FROM (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY CAST('0x' || substr(md5('{CAP_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8)
                             AS BIGINT) % 2147483647,
                        doc_id) AS rn
    FROM documents) t
WHERE rn <= {SOURCE_CAP}
""",
    doc="Per-source document cap: keep at most N docs per source, chosen "
    "by salted-md5 hash order (id tiebreak) so the kept subset is a "
    "reproducible uniform sample of each source rather than scan-order "
    "head. The domain-limiter of web-corpus mixes; one per-source "
    "window, no global structure.",
)
def q_doc_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.source_cap_sample(
        _docs(spark, sf_dir), cap=SOURCE_CAP, salt=CAP_SALT
    )


ZBITS = 16
_Z_TERMS = " + ".join(
    f"((((ux >> {j}) & 1)::BIGINT) << {2 * j})"
    f" + ((((uy >> {j}) & 1)::BIGINT) << {2 * j + 1})"
    for j in range(ZBITS)
)


@register(
    "events_zorder_values",
    f"""
WITH c AS (
    SELECT event_id,
           ((user_id % {1 << ZBITS}) + {1 << ZBITS}) % {1 << ZBITS} AS ux,
           ((CAST(ROUND(value * 100) AS BIGINT) % {1 << ZBITS}) + {1 << ZBITS})
               % {1 << ZBITS} AS uy
    FROM events
)
SELECT event_id, CAST({_Z_TERMS} AS BIGINT) AS zval FROM c
""",
    doc="Morton/Z-order interleave of (user_id, value-cents) low 16 bits "
    "(sources/files.py:zorder_value) — the multi-dimensional clustering "
    "key write_zordered lays files out by, so min/max stats stay tight "
    "on BOTH dimensions and either predicate prunes. Closed-form int64 "
    "bit algebra, bit-identical across engines by construction.",
)
def q_events_zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.files import zorder_value

    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return ev.select(
        "event_id", zorder_value(F.col("user_id"), cents, ZBITS).alias("zval")
    )


_SCD2_DIM_CTES = """
o AS (
    SELECT user_id, event_type, ts, event_id,
           CASE WHEN lag(event_type) OVER w IS NULL
                  OR lag(event_type) OVER w <> event_type
                THEN 1 ELSE 0 END AS chg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
    SELECT user_id, event_type AS status, ts,
           CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
    FROM o
),
dim AS (
    SELECT user_id, version, status, MIN(ts) AS valid_from
    FROM runs GROUP BY user_id, version, status
),
dim2 AS (
    SELECT user_id, version, status, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to
    FROM dim
)"""


@register(
    "events_scd2_pit_join",
    f"""
WITH {_SCD2_DIM_CTES}
SELECT e.event_id, e.user_id, d.version, d.status
FROM events e
JOIN dim2 d
  ON e.user_id = d.user_id
 AND e.ts >= d.valid_from
 AND (d.valid_to IS NULL OR e.ts < d.valid_to)
""",
    doc="Point-in-time join: each event enriched with the SCD2 dimension "
    "version VALID AT ITS EVENT TIME (the feature-store correctness "
    "pattern — training rows must see dimension state as-of the event, "
    "never later). Equi-join on the dimension key with validity-range "
    "post-filter, so the plan is one key-partitioned join, no broadcast "
    "of unbounded history. Interval semantics make the match total and "
    "unique: half-open [valid_from, valid_to), boundary events resolve "
    "to the later version, zero-length intervals match nothing.",
)
def q_events_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").alias("e")
    dim = scd2_from_log(load_table(spark, sf_dir, "events")).alias("d")
    return ev.join(
        dim,
        (F.col("e.user_id") == F.col("d.user_id"))
        & (F.col("e.ts") >= F.col("d.valid_from"))
        & (F.col("d.valid_to").isNull() | (F.col("e.ts") < F.col("d.valid_to"))),
    ).select(
        F.col("e.event_id").alias("event_id"),
        F.col("e.user_id").alias("user_id"),
        F.col("d.version").alias("version"),
        F.col("d.status").alias("status"),
    )


API_PAGES = 4
API_PAGE_SIZE = 250


@register(
    "api_airports_ingest",
    f"""
WITH k AS (SELECT unnest(range(1, {API_PAGES * API_PAGE_SIZE + 1})) AS k),
rec AS (
    SELECT CAST(k // 10 AS VARCHAR) AS id,
           CASE WHEN k % 13 = 0 THEN ''
                WHEN k % 29 = 0 THEN 'not-a-number'
                ELSE CAST((k * 7) % 180 - 90 AS VARCHAR) END AS lat,
           CASE WHEN k % 17 = 0 THEN NULL
                ELSE CAST((k * 11) % 360 - 180 AS VARCHAR) END AS lon
    FROM k
),
clean AS (
    SELECT id,
           TRY_CAST(NULLIF(lat, '') AS BIGINT) AS lat,
           TRY_CAST(lon AS BIGINT) AS lon
    FROM rec
)
SELECT CAST(COUNT(*) AS BIGINT) AS total_records,
       CAST(COUNT(DISTINCT id) AS BIGINT) AS unique_airports,
       CAST(SUM(lat) AS BIGINT) AS sum_lat,
       MIN(lat) AS min_lat,
       MAX(lat) AS max_lat,
       CAST(SUM(lon) AS BIGINT) AS sum_lon
FROM clean
WHERE lat IS NOT NULL AND lon IS NOT NULL
""",
    doc="Ingest through the custom Python DataSource (sources/pyds.py — "
    "Spark 4 pyspark.sql.datasource): API pages are InputPartitions, so "
    "page fetches run as parallel scan tasks inside the plan (BatchScan "
    "airports_api), not a driver download loop — the engine-native form "
    "of the reference's NiFi InvokeHTTP edge. Then the reference's "
    "clean-and-aggregate shape over the landed records; integer-only "
    "payload derivations make the oracle replication exact.",
)
def q_api_airports_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources import pyds

    pyds.register(spark)
    raw = (
        spark.read.format("airports_api")
        .option("pages", API_PAGES)
        .option("page_size", API_PAGE_SIZE)
        .load()
    )
    lat = F.nullif(F.col("lat"), F.lit("")).try_cast("bigint")
    lon = F.col("lon").try_cast("bigint")
    clean = raw.select("id", lat.alias("lat"), lon.alias("lon")).where(
        F.col("lat").isNotNull() & F.col("lon").isNotNull()
    )
    return clean.agg(
        F.count("*").alias("total_records"),
        F.count_distinct(F.col("id")).alias("unique_airports"),
        F.sum("lat").alias("sum_lat"),
        F.min("lat").alias("min_lat"),
        F.max("lat").alias("max_lat"),
        F.sum("lon").alias("sum_lon"),
    )


@register(
    "streaming_api_ingest",
    f"""
WITH k AS (SELECT unnest(range(1, {API_PAGES * API_PAGE_SIZE + 1})) AS k),
rec AS (
    SELECT CAST((k - 1) // {API_PAGE_SIZE} AS INTEGER) AS page,
           CASE WHEN k % 13 = 0 THEN ''
                WHEN k % 29 = 0 THEN 'not-a-number'
                ELSE CAST((k * 7) % 180 - 90 AS VARCHAR) END AS lat,
           CASE WHEN k % 17 = 0 THEN NULL
                ELSE CAST((k * 11) % 360 - 180 AS VARCHAR) END AS lon
    FROM k
),
clean AS (
    SELECT page,
           TRY_CAST(NULLIF(lat, '') AS BIGINT) AS lat,
           TRY_CAST(lon AS BIGINT) AS lon
    FROM rec
)
SELECT page,
       CAST(COUNT(*) AS BIGINT) AS n_clean,
       CAST(SUM(lat) AS BIGINT) AS sum_lat,
       CAST(SUM(lon) AS BIGINT) AS sum_lon
FROM clean
WHERE lat IS NOT NULL AND lon IS NOT NULL
GROUP BY page
""",
    doc="Streaming ingest through the custom Python DataSource's "
    "SimpleDataSourceStreamReader: each availableNow run drains ONE poll "
    "(page) and commits its {{page}} offset to the checkpoint, so "
    "successive runs walk the feed exactly once (the reference's NiFi "
    "timer-poll, engine-native). The query replays pages+1 runs against "
    "one checkpoint — the +1 proves the exhausted feed appends nothing — "
    "then cleans and aggregates per page; the oracle regenerates the "
    "deterministic pages relationally.",
)
def q_streaming_api_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from .sources import pyds

    pyds.register(spark)
    sink = tempfile.mkdtemp(prefix="api_sink_")
    ckpt = tempfile.mkdtemp(prefix="api_ckpt_")
    try:
        for _ in range(API_PAGES + 1):
            q = (
                spark.readStream.format("airports_api")
                .option("pages", API_PAGES)
                .option("page_size", API_PAGE_SIZE)
                .load()
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        landed = spark.read.parquet(sink)
        lat = F.nullif(F.col("lat"), F.lit("")).try_cast("bigint")
        lon = F.col("lon").try_cast("bigint")
        clean = landed.select("page", lat.alias("lat"), lon.alias("lon")).where(
            F.col("lat").isNotNull() & F.col("lon").isNotNull()
        )
        return (
            clean.groupBy("page")
            .agg(
                F.count("*").alias("n_clean"),
                F.sum("lat").alias("sum_lat"),
                F.sum("lon").alias("sum_lon"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(sink, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


@register(
    "events_props_variant_stats",
    """
SELECT event_type,
       CAST(COUNT(k) AS BIGINT) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k
FROM (
    SELECT event_type, CAST(props::JSON ->> 'k' AS BIGINT) AS k FROM events
)
GROUP BY event_type
""",
    doc="Semi-structured ingestion via Spark 4's VARIANT type: parse_json "
    "with NO declared schema, then typed path extraction "
    "(try_variant_get $.k) — the schema-on-read path for payloads whose "
    "shape drifts, complementing events_json_kpi's declared-StructType "
    "parse (SURVEY.md P7). The open-format variant encoding keeps "
    "extraction JVM-side and shreddable; oracle reads the same JSON "
    "path relationally.",
)
def q_events_props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "orders_status_unpivot",
    """
SELECT o_orderpriority, o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY o_orderpriority, o_orderstatus
""",
    doc="unpivot/melt — the inverse of pivot_status_by_priority: the wide "
    "per-status count matrix relationalized back to long "
    "(priority, status, n) rows via DataFrame.unpivot, absent "
    "combinations dropped. Round-tripping pivot->unpivot equals the "
    "plain two-key aggregate, which is exactly what the oracle states.",
)
def q_orders_status_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return (
        wide.unpivot(
            ids=["o_orderpriority"],
            values=["F", "O", "P"],
            variableColumnName="status",
            valueColumnName="n",
        )
        .where(F.col("n").isNotNull())
    )


CHUNK_SIZE, CHUNK_STRIDE, CHUNK_MIN = 32, 24, 8


@register(
    "doc_chunk_windows",
    f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, toks, unnest(range(0, len(toks), {CHUNK_STRIDE})) AS strt FROM t),
c AS (SELECT doc_id, CAST(strt // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
             list_slice(toks, strt + 1, strt + {CHUNK_SIZE}) AS ch FROM s)
SELECT doc_id, chunk_id, CAST(len(ch) AS BIGINT) AS n_tokens,
       array_to_string(ch, ' ') AS chunk_text
FROM c WHERE len(ch) >= {CHUNK_MIN}
""",
    doc="Overlapping token-window chunking (operators/text.py:"
    "chunk_documents): context-window prep — 32-token chunks every 24 "
    "tokens, sub-8-token tails dropped, (doc_id, chunk_id) stable key. "
    "Map-only: per-row array slice + posexplode, zero shuffle; chunking "
    "100 TB inherits the scan's partitioning end to end.",
)
def q_doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.chunk_documents(
        _docs(spark, sf_dir),
        chunk_size=CHUNK_SIZE,
        stride=CHUNK_STRIDE,
        min_tokens=CHUNK_MIN,
    )


@register(
    "doc_chunk_windows_udtf",
    f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (SELECT doc_id, toks, unnest(range(0, len(toks), {CHUNK_STRIDE})) AS strt FROM t),
c AS (SELECT doc_id, CAST(strt // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
             list_slice(toks, strt + 1, strt + {CHUNK_SIZE}) AS ch FROM s)
SELECT doc_id, chunk_id, CAST(len(ch) AS BIGINT) AS n_tokens,
       array_to_string(ch, ' ') AS chunk_text
FROM c WHERE len(ch) >= {CHUNK_MIN}
""",
    doc="Python UDTF twin of doc_chunk_windows (operators/text.py:"
    "chunk_documents_udtf): the Spark 4 user-defined TABLE function API "
    "— @udtf class applied per row via DataFrame.lateralJoin with an "
    ".outer() correlated column, Arrow-batched (ArrowEvalPythonUDTF, "
    "never row-pickled). Same oracle as the relational form: the "
    "relational chunker stays the codegen'd hot path; the UDTF is the "
    "pinned escape hatch for chunkers that genuinely need imperative "
    "Python (sentence segmenters, tokenizer-aware splitters).",
)
def q_doc_chunk_windows_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.chunk_documents_udtf(
        _docs(spark, sf_dir),
        chunk_size=CHUNK_SIZE,
        stride=CHUNK_STRIDE,
        min_tokens=CHUNK_MIN,
    )


RARITY_HEAD_MAX, RARITY_TAIL_MIN = 29.3, 40.0


@register(
    "doc_token_rarity",
    f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
freq AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY 1),
tot AS (SELECT SUM(cnt) AS n_total FROM freq),
wt AS (SELECT token, CAST(FLOOR(n_total / cnt) AS BIGINT) AS wt FROM freq, tot)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(wt) AS BIGINT) AS sum_inv_freq,
       SUM(wt) / COUNT(*) AS rarity,
       CASE WHEN SUM(wt) / COUNT(*) <= {RARITY_HEAD_MAX} THEN 'head'
            WHEN SUM(wt) / COUNT(*) >= {RARITY_TAIL_MIN} THEN 'tail'
            ELSE 'middle' END AS ppl_bucket
FROM tok JOIN wt USING (token) GROUP BY doc_id
""",
    doc="CCNet-style corpus-frequency gate (operators/text.py:"
    "token_rarity_stats): per-doc mean inverse token frequency with an "
    "exact-int kernel (floor(N/cnt) per token — partition-order-free "
    "int64 sums instead of libm log-prob floats, per the repo's rational-"
    "kernel rule), bucketed head/middle/tail like the published "
    "perplexity filter. One vocab-sized count, one token join, one "
    "doc agg.",
)
def q_doc_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_rarity_stats(
        _docs(spark, sf_dir),
        head_max=RARITY_HEAD_MAX,
        tail_min=RARITY_TAIL_MIN,
    )


_CLS_W = ", ".join(str(w) for w in text.classifier_weights())


@register(
    "doc_classifier_gate",
    f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tw AS (SELECT doc_id,
              ([{_CLS_W}])[CAST(CAST('0x' || substr(md5(token), 1, 8) AS BIGINT)
                                % {text.CLASSIFIER_BUCKETS} AS INTEGER) + 1] AS wt
       FROM tok)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       SUM(wt) / (1000 * COUNT(*)) AS score,
       (SUM(wt) >= 0) AS label
FROM tw GROUP BY doc_id
""",
    doc="fastText-style hashed linear classifier gate (operators/text.py:"
    "hashed_classifier_score): md5-bucketed bag-of-tokens features, fixed "
    "integer weight table (deterministic fixture stand-in for trained "
    "weights — the inference shape is exactly a trained model's), "
    "per-doc mean weight score and keep/drop label. Weight table is a "
    "plan literal; exact-int sums; one doc-keyed agg is the only "
    "shuffle.",
)
def q_doc_classifier_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.hashed_classifier_score(_docs(spark, sf_dir))
