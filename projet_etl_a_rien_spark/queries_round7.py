"""Round-7 registrations: bounded-model LM scoring, raw-web text
normalization, and governance erasure over the stateful sinks.

Imported for its registration side effects by ``queries._load_extensions``;
same parity rules as every other registration module (adjacent DuckDB
oracle, identical aliases, exactmath quantization for transcendental or
accumulation-order-sensitive float work).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .operators import retrieval
from .queries import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


BB_BUCKETS = 4096
UB_BUCKETS = 1024


@register(
    "doc_bigram_logprob_hashed",
    f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    WHERE len(string_split(text, ' ')) >= 2
),
occ AS (
    SELECT doc_id AS id,
           unnest(list_transform(range(1, len(ts)),
                   i -> struct_pack(b := ts[i] || chr(31) || ts[i + 1],
                                    t := ts[i]))) AS u
    FROM toks
),
o2 AS (
    SELECT id,
           CAST('0x' || substr(md5(u.b), 1, 8) AS BIGINT) % {BB_BUCKETS} AS bb,
           CAST('0x' || substr(md5(u.t), 1, 8) AS BIGINT) % {UB_BUCKETS} AS ub
    FROM occ
),
bbm AS (
    SELECT bb, CAST(ROUND(ln(COUNT(*)) * 1000000000) AS BIGINT) AS lnb_nano
    FROM o2 GROUP BY bb
),
ubm AS (
    SELECT ub, CAST(ROUND(ln(COUNT(*)) * 1000000000) AS BIGINT) AS lnu_nano
    FROM o2 GROUP BY ub
)
SELECT id AS doc_id, COUNT(*) AS n_bigrams,
       CAST(SUM(lnb_nano - lnu_nano) AS BIGINT) / COUNT(*) / 1e9
           AS mean_logprob
FROM o2 JOIN bbm USING (bb) JOIN ubm USING (ub)
GROUP BY id
""",
    doc="Mean bigram log-probability per doc under a HASHED bucket model "
    f"P(t2|t1) ~ cnt_bb[h(t1,t2) % {BB_BUCKETS}] / cnt_ub[h(t1) % "
    f"{UB_BUCKETS}] — the bounded-model twin of doc_bigram_logprob: the "
    "exact model's stat table grows with vocabulary squared (3.6x at 10x "
    "rows), this one is O(1)-sized and broadcastable at any corpus scale "
    "(DSIR-style feature hashing). Per-bucket nano-grid ln, exact BIGINT "
    "per-doc sums.",
)
def q_doc_bigram_logprob_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retrieval.hashed_bigram_logprob_scores(
        _docs(spark, sf_dir),
        n_bigram_buckets=BB_BUCKETS,
        n_unigram_buckets=UB_BUCKETS,
    )


# ---------------------------------------------------------------------------
# Raw-web normalization (html strip, mojibake repair) + composed quality
# ---------------------------------------------------------------------------
#
# The dirty input is synthesized DETERMINISTICALLY from the plain-text
# corpus on BOTH engines (no raw-web crawl in the sandbox); the SQL
# builders below interpolate the very same literal constants the Spark
# noise/clean operators use (operators/text.py), so the two sides cannot
# drift. RE2 (DuckDB) and java.util.regex agree on every construct used:
# inline (?is), non-greedy .*?, \b, character classes, \s.

from .operators import text as _text


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _replace_chain_sql(expr: str, table) -> str:
    for a, b in table:
        expr = f"replace({expr}, {_sq(a)}, {_sq(b)})"
    return expr


def _html_dirty_sql() -> str:
    return (
        f"{_sq(_text.HTML_PAGE_TITLE_PREFIX)} || CAST(doc_id AS VARCHAR)"
        f" || {_sq(_text.HTML_PAGE_HEAD_REST)}"
        " || CASE WHEN doc_id % 3 = 0 THEN replace(text, ' ', '</p><p>')"
        " ELSE text END"
        f" || {_sq(_text.HTML_PAGE_SUFFIX)}"
    )


def _html_clean_sql(expr: str) -> str:
    expr = (
        f"regexp_replace({expr},"
        " '(?is)<script\\b[^>]*>.*?</script>', ' ', 'g')"
    )
    expr = (
        f"regexp_replace({expr},"
        " '(?is)<style\\b[^>]*>.*?</style>', ' ', 'g')"
    )
    expr = f"regexp_replace({expr}, '(?s)<!--.*?-->', ' ', 'g')"
    expr = f"regexp_replace({expr}, '<[^>]+>', ' ', 'g')"
    expr = _replace_chain_sql(expr, _text.HTML_ENTITIES)
    return f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"


def _moji_dirty_sql() -> str:
    return (
        f"CASE WHEN doc_id % 2 = 0 THEN {_sq(_text.MOJI_PREFIX_EVEN)}"
        f" ELSE {_sq(_text.MOJI_PREFIX_ODD)} END"
        f" || text || {_sq(_text.MOJI_SUFFIX)}"
    )


def _moji_clean_sql(expr: str) -> str:
    expr = _replace_chain_sql(expr, _text.MOJIBAKE_REPAIRS)
    expr = _replace_chain_sql(expr, _text.PUNCT_FOLDS)
    expr = (
        f"regexp_replace({expr},"
        " '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g')"
    )
    return f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"


@register(
    "doc_html_to_text",
    f"""
WITH dirty AS (
    SELECT doc_id, {_html_dirty_sql()} AS html FROM documents
)
SELECT doc_id,
       CAST(length(html) AS BIGINT) AS n_chars_html,
       CAST(length({_html_clean_sql('html')}) AS BIGINT) AS n_chars_clean,
       {_html_clean_sql('html')} AS text_clean
FROM dirty
""",
    doc="HTML/markup strip + entity decode over deterministically "
    "synthesized dirty pages (script/style/comment blocks dropped whole, "
    "tags to spaces, named+numeric entities decoded with &amp; last so "
    "double-escapes yield literals, whitespace collapsed). Pure "
    "regexp_replace/replace chain — per-row projection, no shuffle, "
    "whole-stage codegen; the raw-web step that runs BEFORE every "
    "quality gate.",
)
def q_doc_html_to_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    dirty = d.select(
        "doc_id", _text.html_noise("text", "doc_id").alias("html")
    )
    return dirty.select(
        "doc_id",
        F.length("html").cast("long").alias("n_chars_html"),
        F.length(_text.html_to_text("html")).cast("long").alias(
            "n_chars_clean"
        ),
        _text.html_to_text("html").alias("text_clean"),
    )


@register(
    "doc_unicode_normalize",
    f"""
WITH dirty AS (
    SELECT doc_id, {_moji_dirty_sql()} AS raw FROM documents
)
SELECT doc_id,
       CAST(length(raw) AS BIGINT) AS n_chars_raw,
       CAST(length({_moji_clean_sql('raw')}) AS BIGINT) AS n_chars_clean,
       {_moji_clean_sql('raw')} AS text_clean
FROM dirty
""",
    doc="Encoding-damage repair over deterministically synthesized "
    "mojibake (cp1252-decoded UTF-8 undone longest-sequence-first, "
    "curly quotes/dashes/NBSP folded to ASCII, control chars stripped, "
    "whitespace collapsed) — the ftfy/NFC stand-in as a pure "
    "replace/regexp chain with the repair table as the swappable part.",
)
def q_doc_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    dirty = d.select(
        "doc_id", _text.mojibake_noise("text", "doc_id").alias("raw")
    )
    return dirty.select(
        "doc_id",
        F.length("raw").cast("long").alias("n_chars_raw"),
        F.length(_text.unicode_repair("raw")).cast("long").alias(
            "n_chars_clean"
        ),
        _text.unicode_repair("raw").alias("text_clean"),
    )


def _quality_after_strip_oracle() -> str:
    from .queries_llm import QUALITY_SQL

    return f"""
WITH dirty AS (
    SELECT doc_id, {_html_dirty_sql()} AS html FROM documents
),
cleaned AS (
    SELECT doc_id, {_html_clean_sql('html')} AS text FROM dirty
)
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       {QUALITY_SQL} AS quality_score
FROM cleaned
"""


@register(
    "doc_quality_after_html_strip",
    _quality_after_strip_oracle(),
    doc="The existing composite quality gate RE-RUN COMPOSED on top of "
    "the html_to_text normalizer (strip first, then score) — the order "
    "a raw-web pipeline actually executes: Gopher/C4-style flags assume "
    "plain text, so markup strip must precede them. Same thresholds as "
    "doc_quality_score (shared QUALITY_SQL constant).",
)
def q_doc_quality_after_html_strip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _docs(spark, sf_dir)
    cleaned = d.select(
        "doc_id",
        _text.html_to_text(_text.html_noise("text", "doc_id")).alias("text"),
    )
    return _text.quality_score(cleaned)


# ---------------------------------------------------------------------------
# Governance: right-to-erasure propagated into the stateful index sink
# ---------------------------------------------------------------------------

ERASE_MOD = 50


@register(
    "postings_erasure_index",
    f"""
WITH docs2 AS (
    SELECT doc_id, text FROM documents WHERE doc_id % {ERASE_MOD} <> 0
),
toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM docs2),
occ AS (
    SELECT doc_id AS id,
           unnest(list_transform(range(1, len(ts) + 1),
                                 i -> struct_pack(p := i, t := ts[i]))) AS u
    FROM toks
),
o2 AS (SELECT id, u.p AS pos, u.t AS token FROM occ),
post AS (
    SELECT token, id, COUNT(*) AS tf,
           CAST(MIN(pos) AS BIGINT) AS first_pos,
           CAST(MAX(pos) AS BIGINT) AS last_pos
    FROM o2 GROUP BY 1, 2
),
st AS (
    SELECT token, COUNT(*) AS df_docs, CAST(SUM(tf) AS BIGINT) AS cf
    FROM post GROUP BY 1
),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM docs2)
SELECT post.token, post.id AS doc_id, tf, first_pos, last_pos, df_docs, cf,
       CAST(ROUND(ln((n_docs + 1.0) / (df_docs + 1.0)) * 1000000000) AS BIGINT)
           / 1e9 AS idf
FROM post JOIN st ON post.token = st.token, n
""",
    doc="Right-to-erasure PROPAGATED INTO THE POSTINGS SINK: ingest the "
    "corpus as two compacted partials plus one uncompacted one, erase "
    f"doc_id % {ERASE_MOD} == 0 via compaction.postings_erase_ids "
    "(physically rewrites every retained snapshot AND partial — time "
    "travel cannot resurrect erased docs), then serve the index from "
    "the sink. Oracle = the one-shot batch index over the surviving "
    "documents; read-time df/cf/idf derive from the folded postings, so "
    "the statistics reflect the erasure with no stored-stat "
    "invalidation.",
)
def q_postings_erasure_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from .operators.compaction import (
        compact_postings_sink,
        postings_erase_ids,
        read_postings_sink,
        write_postings_partial,
    )

    d = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="erasink_")
    try:
        write_postings_partial(d.where(F.col("doc_id") % 3 == 0), path, 0)
        write_postings_partial(d.where(F.col("doc_id") % 3 == 1), path, 1)
        v = compact_postings_sink(spark, path, retain_snapshots=2)
        write_postings_partial(d.where(F.col("doc_id") % 3 == 2), path, v + 1)
        erase = d.where(F.col("doc_id") % ERASE_MOD == 0).select(
            F.col("doc_id").alias("id")
        )
        postings_erase_ids(spark, path, erase)
        return retrieval.postings_with_stats(
            read_postings_sink(spark, path)
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)
