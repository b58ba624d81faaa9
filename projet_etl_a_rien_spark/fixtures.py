"""Broker-free stand-ins for the reference's Kafka wire input.

The reference's input is a Kafka topic of one-JSON-per-airport messages
(FIXTURES.md §1.1). The sandbox has no broker, so we derive an equivalent
message stream deterministically from the ``customer`` fixture: each row
becomes a JSON ``value`` string with the airports payload shape
(``{"id","name","icao","lat","lon"}`` — all strings, as NiFi attributes
are), including the dirty variants the cleaning operator is defined over
(ref ``spark_airports_final.py:53-60``): empty strings, JSON nulls,
non-numeric coordinates, and duplicate ids.

The mapping is pure column arithmetic so the DuckDB oracle can reproduce
the *semantics* without the JSON round-trip (each engine round-trips its
own double→string→double losslessly; the oracle skips the string hop).

Dirty-data rules (keyed on c_custkey, deterministic at every sf):
- ``% 13 == 0`` → lat = ""            (empty-string coordinate)
- ``% 29 == 0`` → lat = "not-a-number" (uncastable coordinate)
- ``% 17 == 0`` → lon = NULL           (missing field; to_json drops it)
- id = c_custkey div 10 → forced duplicate ids (countDistinct < count)
- otherwise lat = c_acctbal/100, lon = c_acctbal/50 as strings
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table


def airports_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(key, value) JSON message DataFrame — the Kafka-wire analogue."""
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    lat = (
        F.when(k % 13 == 0, F.lit(""))
        .when(k % 29 == 0, F.lit("not-a-number"))
        .otherwise((F.col("c_acctbal") / 100).cast("string"))
    )
    lon = F.when(k % 17 == 0, F.lit(None).cast("string")).otherwise(
        (F.col("c_acctbal") / 50).cast("string")
    )
    payload = F.struct(
        F.expr("c_custkey div 10").cast("string").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("icao"),
        lat.alias("lat"),
        lon.alias("lon"),
    )
    return c.select(
        payload["id"].alias("key"), F.to_json(payload).alias("value")
    )


def airports_messages_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric-JSON variant for the permissive (variant-B) parse path.

    ``from_json`` with DoubleType fields does NOT coerce JSON strings — a
    string token in a double field nulls just that field (verified
    empirically; this is the "silent null" behavior SURVEY.md §2.11
    documents for variant B). So this fixture emits lat/lon as JSON
    *numbers*, with dirty variants that exercise exactly that semantics:

    - ``% 13 == 0`` → lat is the string token ``"not-a-number"`` → NULL field
    - ``% 17 == 0`` → lon key absent → NULL field
    """
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    lat_tok = F.when(k % 13 == 0, F.lit('"not-a-number"')).otherwise(
        (F.col("c_acctbal") / 100).cast("string")
    )
    lon_part = F.when(k % 17 == 0, F.lit("")).otherwise(
        F.concat(F.lit(',"lon":'), (F.col("c_acctbal") / 50).cast("string"))
    )
    value = F.concat(
        F.lit('{"id":"'),
        F.expr("c_custkey div 10").cast("string"),
        F.lit('","name":"'),
        F.col("c_name"),
        F.lit('","icao":"'),
        F.col("c_mktsegment"),
        F.lit('","lat":'),
        lat_tok,
        lon_part,
        F.lit("}"),
    )
    return c.select(
        F.expr("c_custkey div 10").cast("string").alias("key"), value.alias("value")
    )


def documents_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ planted exact duplicates (every 50th doc re-appears
    with doc_id+1_000_000) — the fixture corpus has no natural exact
    dups, so dedup operators need these to produce non-trivial output.
    Deterministic at every scale factor; oracle mirror below.
    """
    d = load_table(spark, sf_dir, "documents")
    dups = d.where(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    return d.unionByName(dups)


# ---------------------------------------------------------------------------
# Tokenizer-training enrichment corpus (r10 verdict ask #3): the
# synthetic documents table draws from a 61-pre-token vocabulary, so a
# BBPE ladder learned over it alone exhausts at rank 127 — far below a
# production table size. This deterministic enrichment widens the
# TRAINING corpus's morphology (stem x suffix inflections), adds
# code-like punctuation runs, digit runs, contractions, and
# multilingual/multibyte words, so the exhaustion rank clears 500 and
# the frozen production ladder is learned at a real-vocab plan width.
#
# Design rules:
# - pure Python list builder (no RNG, no I/O) so the pure-Python
#   provenance test re-learns over EXACTLY the same corpus;
# - every line starts with the fixed word "x", so each enrichment form
#   contributes exactly ONE pre-token type (the leading-space variant);
# - the line set is emitted twice with reversed neighborhoods, so every
#   pre-token type occurs exactly twice (>= min_pair_count) and every
#   type fully collapses — the ladder is the complete merge curriculum
#   of the widened vocabulary;
# - total mass (~5 KB) stays tiny vs the sf0.01 corpus (~150 KB), so
#   the high-count head of the ladder remains corpus-driven and the
#   vocab-budget cut still reflects the corpus's own statistics.
# ---------------------------------------------------------------------------

_ENRICH_STEMS = [
    "transform", "deploy", "token", "shard", "merge", "filter",
    "cluster", "sample", "encode", "decode", "stream", "batch",
    "index", "vector", "partition", "shuffle", "broadcast", "quantil",
    "sketch", "bucket", "anchor", "window", "session", "replay",
    "compact", "ingest", "parse", "rank", "split", "fold",
]
_ENRICH_SUFFIXES = ["", "s", "ed", "ing", "er", "ers", "ation", "ment"]
_ENRICH_CODE = [
    "x+=1;", "f(x,y)", "[0..9]", "{a:b}", "->>", "!=", "::", "&&",
    "##", "()=>",
]
_ENRICH_NUMBERS = [str(1900 + 7 * i) for i in range(20)] + [
    str(3 + 97 * i) for i in range(12)
]
_ENRICH_MULTILINGUAL = [
    "café", "naïve", "übermäßig", "中文分词", "模型", "données",
    "reseña", "straße",
]
_ENRICH_CONTRACTIONS = [
    "we'll", "it's", "don't", "they're", "I've", "he'd", "I'm",
]


def enrichment_texts() -> list[str]:
    """The deterministic tokenizer-training enrichment lines (pure
    Python — shared verbatim by the Spark training corpus, the offline
    ladder tool, and the pure-Python provenance test)."""
    words = (
        [s + x for s in _ENRICH_STEMS for x in _ENRICH_SUFFIXES]
        + _ENRICH_CODE
        + _ENRICH_NUMBERS
        + _ENRICH_MULTILINGUAL
        + _ENRICH_CONTRACTIONS
    )
    lines: list[str] = []
    per = 8
    for rep in range(2):
        for i in range(0, len(words), per):
            chunk = words[i : i + per]
            if rep == 1:
                chunk = list(reversed(chunk))
            lines.append("x " + " ".join(chunk))
    return lines


def training_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer-TRAINING corpus: the documents table's text plus
    the enrichment lines (tools/learn_bbpe_ladder.py trains the frozen
    production ladder over this; the registered encode entries apply
    the frozen table to the plain corpus — train-wide, apply-anywhere,
    exactly like a production tokenizer)."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    enrich = spark.createDataFrame(
        [(t,) for t in enrichment_texts()], "text string"
    )
    return docs.unionByName(enrich)


DOCUMENTS_WITH_DUPS_ORACLE_CTE = """
docs_dup AS (
    SELECT doc_id, text, lang, source, n_chars FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
    FROM documents WHERE doc_id % 50 = 0
)
"""


AIRPORTS_MESSAGES_NUMERIC_ORACLE_CTE = """
airports_msgs_num AS (
    SELECT CAST(c_custkey // 10 AS VARCHAR) AS id,
           c_name AS name,
           c_mktsegment AS icao,
           CASE WHEN c_custkey % 13 = 0 THEN NULL
                ELSE c_acctbal / 100 END AS lat,
           CASE WHEN c_custkey % 17 = 0 THEN NULL
                ELSE c_acctbal / 50 END AS lon
    FROM customer
)
"""


# The same derivation in ANSI SQL (DuckDB), skipping the JSON round-trip:
# produces (id, name, icao, lat, lon) all-varchar, ready for the oracle's
# TRY_CAST/NULLIF clean step. Kept adjacent to the Python so the two cannot
# drift silently.
AIRPORTS_MESSAGES_ORACLE_CTE = """
airports_msgs AS (
    SELECT CAST(c_custkey // 10 AS VARCHAR) AS id,
           c_name AS name,
           c_mktsegment AS icao,
           CASE WHEN c_custkey % 13 = 0 THEN ''
                WHEN c_custkey % 29 = 0 THEN 'not-a-number'
                ELSE CAST(c_acctbal / 100 AS VARCHAR) END AS lat,
           CASE WHEN c_custkey % 17 = 0 THEN NULL
                ELSE CAST(c_acctbal / 50 AS VARCHAR) END AS lon
    FROM customer
)
"""
