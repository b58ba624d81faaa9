"""Round-10 registrations: the PRODUCTION byte-level tokenizer — the
GPT-2-faithful pre-tokenizer (contractions + letter/digit/punct
category runs, bpe.GPT2_PRETOKEN_RE) driving a production-sized frozen
merge table (bpe.FIXED_BYTE_MERGES_V2: the vocab-budget cut of the
exhaustion ladder learned by tools/learn_bbpe_ladder.py), plus the full
ladder as the plan-depth proof point.

The r9 verdict's asks #1 and #4. The 10-merge v1 entries in
queries_round9 stay registered as the engine-parity pins; these v2
entries are what a production trainer's packing/budget/chunk layout
would actually consume (English bytes/token ≈ 2.86 at the cut, pinned
in the 2-4 band by test, vs ~1.1 at 10 merges).

Imported for its registration side effects by
``queries._load_extensions``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import load_table
from .operators import bpe
from .queries import register
from .queries_round9 import _bbpe_encode_oracle, _bbpe_learn_oracle


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# Learning under the GPT-2 pre-tokenizer (operators/bpe.py:
# learn_bbpe_merges with pretoken_re=GPT2_PRETOKEN_RE) — the category
# structure changes WHICH merges are learned (contraction suffixes and
# punctuation runs pre-tokenize separately), so the learner gets its own
# hash-exact pin at a bounded depth; the full exhaustion run (rank 586
# over the enriched training corpus, r11) is pinned by the pure-Python
# provenance test in tests/test_round10.py.
# ---------------------------------------------------------------------------

GPT2_LEARN_MERGES = 32


@register(
    "bpe_learn_merges_bytes_gpt2",
    _bbpe_learn_oracle(
        num_merges=GPT2_LEARN_MERGES,
        min_count=2,
        pretoken_re=bpe.GPT2_PRETOKEN_RE,
    ),
    doc="Byte-level BPE merge learning under the GPT-2-FAITHFUL "
    "pre-tokenizer (contraction splits 's/'t/'re/'ve/'m/'ll/'d, "
    "letter/digit/punctuation category runs each taking at most one "
    "leading space — lookahead-free so java.util.regex and RE2 run it "
    "bit-identically, pre-token parity pinned Spark==DuckDB==pure-"
    f"Python in tests/test_round10.py). {GPT2_LEARN_MERGES} merges, "
    "same distributed loop and tie-break as the v1 learner; the oracle "
    "unrolls the bounded loop into MATERIALIZED CTEs. The v1 "
    "whitespace-split learner entry stays as the r9 parity pin.",
)
def q_bpe_learn_merges_bytes_gpt2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return bpe.bbpe_merge_table(
        spark,
        _docs(spark, sf_dir),
        num_merges=GPT2_LEARN_MERGES,
        pretoken_re=bpe.GPT2_PRETOKEN_RE,
    )


# ---------------------------------------------------------------------------
# Encoding under the PRODUCTION cut (FIXED_BYTE_MERGES_V2, rank <= 80 of
# the exhaustion ladder): per-doc token stats a real trainer would see.
# ---------------------------------------------------------------------------


@register(
    "corpus_bbpe_encode_stats_v2",
    _bbpe_encode_oracle(
        bpe.FIXED_BYTE_MERGES_V2, pretoken_re=bpe.GPT2_PRETOKEN_RE
    ),
    doc="Tokenizer-application under the PRODUCTION-SIZED frozen table: "
    f"the rank-{bpe.DEFAULT_VOCAB_CUT} vocab-budget cut of the "
    "exhaustion ladder (operators/bbpe_merges_v2.py — learned once "
    "over sf0.01 + the deterministic morphology enrichment "
    "(fixtures.enrichment_texts, the r10 verdict's #3 ask) with the "
    "GPT-2 pre-tokenizer, offered 2000 slots, exhausted at rank "
    f"{bpe.EXHAUSTION_RANK}; the ~3%-mass enrichment widens the "
    "vocabulary past 500 merges while the cut region stays "
    "corpus-driven — count ~900 at the cut vs 2-digit enrichment "
    "pairs). English bytes_per_token ≈ 2.86 at this cut — the 2-4 "
    "band a real BPE vocab yields — vs ~1.1 at the 10-merge pin, so "
    "downstream packing/budget/chunk numbers match what a trainer "
    "sees. Oracle: 80-step anchored replace chain, materialized every "
    "16 steps.",
)
def q_corpus_bbpe_encode_stats_v2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return bpe.apply_bbpe_merges(
        _docs(spark, sf_dir),
        bpe.FIXED_BYTE_MERGES_V2,
        pretoken_re=bpe.GPT2_PRETOKEN_RE,
        checkpoint_every=8,
    )


# ---------------------------------------------------------------------------
# Encoding under the FULL exhaustion ladder (586 merges) — the deepest
# merge table the training data defines, exercising the encode path at
# a REAL-VOCAB plan width (the r10 verdict's stress-test ask). At this
# depth the chained-fold engine would pay ~45 s of pure plan
# construction, so the auto engine takes the Arrow-batched encoder:
# ONE mapInPandas over the vocab-sized distinct-pre-token table, plan
# depth O(1), fold/arrow equality property-pinned.
# ---------------------------------------------------------------------------


@register(
    "corpus_bbpe_encode_stats_ladder",
    _bbpe_encode_oracle(
        bpe.BBPE_MERGES_V2, pretoken_re=bpe.GPT2_PRETOKEN_RE
    ),
    doc="Tokenizer-application under the FULL exhaustion ladder "
    f"({bpe.EXHAUSTION_RANK} merges — every merge the training corpus "
    "admits): at this depth every pre-token is one token, so "
    "bytes_per_token equals mean pre-token byte length (~5.5) — the "
    "memorization asymptote that motivates shipping the rank-80 cut "
    "instead. Registered to pin the encode path at PRODUCTION table "
    "width: 586 rank-ordered greedy merges applied by the "
    "Arrow-batched distinct-pre-token encoder (one mapInPandas stage, "
    "plan depth O(1) — the fold-chain twin is property-pinned equal "
    "and remains the engine for bounded tables), against a 586-step "
    "replace-chain oracle (materialized every 16).",
)
def q_corpus_bbpe_encode_stats_ladder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return bpe.apply_bbpe_merges(
        _docs(spark, sf_dir),
        bpe.BBPE_MERGES_V2,
        pretoken_re=bpe.GPT2_PRETOKEN_RE,
        checkpoint_every=8,
    )


# ---------------------------------------------------------------------------
# Fertility + chunk layout under the production tokenizer — the
# datacard and loader-placement numbers recomputed from v2 counts.
# ---------------------------------------------------------------------------


def _bbpe_fertility_oracle_v2() -> str:
    per_doc = _bbpe_encode_oracle(
        bpe.FIXED_BYTE_MERGES_V2, pretoken_re=bpe.GPT2_PRETOKEN_RE
    )
    return f"""
WITH per_doc AS ({per_doc})
SELECT d.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(p.n_bytes) AS BIGINT) AS n_bytes,
       CAST(SUM(p.n_bbpe_tokens) AS BIGINT) AS n_bbpe_tokens,
       CAST(ROUND(CAST(SUM(p.n_bbpe_tokens) AS DOUBLE)
            / SUM(p.n_bytes) * 1000000) AS BIGINT) AS fertility_ppm
FROM per_doc p JOIN documents d ON p.doc_id = d.doc_id
GROUP BY d.lang
"""


@register(
    "corpus_bbpe_fertility_by_lang_v2",
    _bbpe_fertility_oracle_v2(),
    doc="Per-language tokenizer fertility under the PRODUCTION cut "
    "table + GPT-2 pre-tokenizer (tokens per byte, ppm-quantized after "
    "exact BIGINT sums — same parity discipline as the v1 entry). At a "
    "production-sized vocab the per-language spread is the real "
    "merge-budget-allocation signal: languages the 80-merge English-"
    "heavy cut under-serves stay near 1 token/byte while English "
    "drops to ~0.35.",
)
def q_corpus_bbpe_fertility_by_lang_v2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    per_doc = bpe.apply_bbpe_merges(
        _docs(spark, sf_dir),
        bpe.FIXED_BYTE_MERGES_V2,
        pretoken_re=bpe.GPT2_PRETOKEN_RE,
        checkpoint_every=8,
    )
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    return (
        per_doc.join(d, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("n_bytes"),
            F.sum("n_bbpe_tokens").alias("n_bbpe_tokens"),
            F.round(
                F.sum("n_bbpe_tokens").cast("double")
                / F.sum("n_bytes")
                * 1_000_000
            )
            .cast("long")
            .alias("fertility_ppm"),
        )
    )


V2_CHUNK_TOKENS = 512
V2_CHUNK_SALT = "bbchunk10:"
V2_CHUNK_BUCKETS = 256


def _bbpe_chunk_oracle_v2() -> str:
    per_doc = _bbpe_encode_oracle(
        bpe.FIXED_BYTE_MERGES_V2, pretoken_re=bpe.GPT2_PRETOKEN_RE
    )
    return f"""
WITH per_doc AS ({per_doc}),
d AS (
    SELECT doc_id, n_bbpe_tokens AS n_tokens,
           md5('{V2_CHUNK_SALT}' || CAST(doc_id AS VARCHAR)) AS hx
    FROM per_doc
),
b AS (
    SELECT doc_id, n_tokens, hx,
           CAST('0x' || substr(hx, 1, 8) AS BIGINT) % {V2_CHUNK_BUCKETS}
               AS bkt
    FROM d
),
o AS (
    SELECT doc_id, n_tokens,
           COALESCE(CAST(SUM(n_tokens) OVER (
               ORDER BY bkt, hx, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
             0) AS global_start
    FROM b
)
SELECT doc_id, n_tokens, global_start,
       global_start // {V2_CHUNK_TOKENS} AS chunk_first,
       (global_start + n_tokens - 1) // {V2_CHUNK_TOKENS} AS chunk_last
FROM o
"""


@register(
    "corpus_stream_chunk_index_bbpe_v2",
    _bbpe_chunk_oracle_v2(),
    doc="GPT-style token-stream chunk layout computed from the "
    "PRODUCTION tokenizer's per-doc counts (rank-80 cut + GPT-2 "
    "pre-tokenizer): the loader-placement index a real trainer uses, "
    "now fed counts in the realistic 2-4 bytes/token regime instead "
    "of the near-byte-identity 10-merge counts. Same no-global-sort "
    "bucket decomposition as the v1 entry; oracle composes the 80-step "
    "encode chain with the naive global-order prefix-sum spec.",
)
def q_corpus_stream_chunk_index_bbpe_v2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators import text as _t

    docs = _docs(spark, sf_dir)
    counts = bpe.apply_bbpe_merges(
        docs,
        bpe.FIXED_BYTE_MERGES_V2,
        pretoken_re=bpe.GPT2_PRETOKEN_RE,
        checkpoint_every=8,
    ).select("doc_id", "n_bbpe_tokens")
    return _t.stream_chunk_index(
        counts,
        chunk_tokens=V2_CHUNK_TOKENS,
        salt=V2_CHUNK_SALT,
        order_buckets=V2_CHUNK_BUCKETS,
        n_tokens_col="n_bbpe_tokens",
    )


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (operators/quantiles.py) — the r9 verdict's
# #5 ask: percentile SERVING from bounded state instead of a per-query
# exact percentile scan. Log-linear grid, all-integer bucket arithmetic,
# so even the sketch is hash-exact against DuckDB.
# ---------------------------------------------------------------------------

QSK_M = 16
QSK_QPPMS = [250_000, 500_000, 900_000, 990_000]


def _qsketch_oracle(m: int, q_ppms: list[int], value_sql: str) -> str:
    """DuckDB rebuild of the identical grid + rank walk (the operator's
    _lo_sql/_hi_sql bound expressions reused verbatim with DIV → //).
    The oracle builds the sketch in ONE pass over the corpus; the Spark
    side folds per-batch partials — their equality IS the additivity
    contract under test (same pattern as streaming_bbpe_learn_mv)."""
    from .operators.quantiles import MAX_LONG, _hi_sql, _lo_sql, _log2m

    lm = _log2m(m)
    vals = ", ".join(f"({p})" for p in q_ppms)
    g = "GREATEST(val, CAST(1 AS BIGINT))"
    p2 = f"CAST(pow(2, length(bin({g})) - 1) AS BIGINT)"
    lo = _lo_sql("bucket", m).replace(" DIV ", " // ")
    hi = _hi_sql("bucket", m).replace(" DIV ", " // ")
    top = 62 * m + m - 1
    return f"""
WITH v AS (SELECT CAST({value_sql} AS BIGINT) AS val FROM documents),
b AS (
    SELECT CASE WHEN val <= 0 THEN CAST(-1 AS BIGINT)
           ELSE CAST(length(bin({g})) - 1 AS BIGINT) * {m}
                + (CASE WHEN length(bin({g})) - 1 >= {lm}
                   THEN ({g} - {p2}) // ({p2} // {m})
                   ELSE ({g} - {p2}) * {m} // {p2} END)
           END AS bucket
    FROM v
),
s AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY bucket),
c AS (SELECT bucket, cnt,
             SUM(cnt) OVER (ORDER BY bucket) AS cum,
             SUM(cnt) OVER () AS n
      FROM s),
qs(q_ppm) AS (VALUES {vals}),
t AS (SELECT CAST(q_ppm AS BIGINT) AS q_ppm, CAST(n AS BIGINT) AS n_total,
             (q_ppm * n + 999999) // 1000000 AS target_rank
      FROM qs, (SELECT DISTINCT n FROM c)),
p AS (SELECT t.q_ppm, t.n_total, t.target_rank,
             MIN(c.bucket) AS bucket
      FROM t JOIN c ON c.cum >= t.target_rank
      GROUP BY 1, 2, 3)
SELECT q_ppm, n_total, CAST(target_rank AS BIGINT) AS target_rank,
       CAST(bucket AS BIGINT) AS bucket,
       CAST(CASE WHEN bucket < 0 THEN 0 ELSE {lo} END AS BIGINT) AS est_lo,
       CAST(CASE WHEN bucket < 0 THEN 1
            WHEN bucket >= {top} THEN {MAX_LONG}
            ELSE {hi} END AS BIGINT) AS est_hi
FROM p
"""


@register(
    "corpus_length_quantiles_sketch",
    _qsketch_oracle(QSK_M, QSK_QPPMS, "n_chars"),
    doc="Document-length quantiles (p25/p50/p90/p99) served from a "
    f"MERGEABLE log-linear histogram sketch (m={QSK_M} sub-buckets per "
    "octave, DDSketch-family relative-error contract with integer "
    "bucket boundaries): the corpus is split into three disjoint "
    "batches, each builds its bounded (bucket, cnt) grid "
    "independently, the grids MERGE cell-wise (additivity pinned "
    "exact by test), and quantiles are extracted by a rank walk over "
    "the <= 64*m-cell array — est_lo <= true < est_hi with relative "
    "error <= 1/m, one-sided under-estimate property-pinned. Build "
    "shuffle is O(tasks * grid), corpus-size-independent; serving "
    "never rescans data. Oracle rebuilds the identical grid in one "
    "pass — equality IS the additive-merge contract.",
)
def q_corpus_length_quantiles_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from .operators import quantiles as Q

    docs = _docs(spark, sf_dir)
    parts = [
        Q.quantile_sketch_build(
            docs.where(F.col("doc_id") % 3 == k), "n_chars", QSK_M
        )
        for k in range(3)
    ]
    merged = Q.quantile_sketch_merge(*parts)
    return Q.quantile_sketch_query(merged, QSK_QPPMS, QSK_M)


@register(
    "streaming_length_quantiles_mv",
    _qsketch_oracle(QSK_M, QSK_QPPMS, "n_chars"),
    doc="The same quantile sketch maintained as a SINK-IS-THE-STATE "
    "additive MV: three document batches land as (bucket, cnt) "
    "partials (map-side combine to the sink), a compaction folds the "
    "first two into a snapshot, the third stays as an uncompacted "
    "partial — and quantiles are served from the folded sink. Crash "
    "contract inherited from the agg-MV sink (_SUCCESS-gated dirs, "
    "idempotent partial replays, snapshot-then-vacuum). The oracle is "
    "the one-shot grid — sink-served == one-shot is exactly the "
    "additivity equivalence.",
)
def q_streaming_length_quantiles_mv(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from .operators import quantiles as Q

    docs = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="qsketchsink_")
    try:
        for k in range(2):
            Q.write_sketch_partial(
                docs.where(F.col("doc_id") % 3 == k), path, k, "n_chars",
                QSK_M,
            )
        Q.compact_sketch(spark, path)
        Q.write_sketch_partial(
            docs.where(F.col("doc_id") % 3 == 2), path, 2, "n_chars", QSK_M
        )
        sk = Q.read_sketch(spark, path).localCheckpoint(eager=True)
        return Q.quantile_sketch_query(sk, QSK_QPPMS, QSK_M)
    finally:
        shutil.rmtree(path, ignore_errors=True)


# ---------------------------------------------------------------------------
# HLL-style distinct sketch (operators/sketches.py) — the r9 verdict's
# #6 ask: "distinct users per key" served from MAX-mergeable register
# state, integer-exact estimates on both engines.
# ---------------------------------------------------------------------------


def _hll_oracle() -> str:
    from .operators import sketches as S

    m, wbits = S.HLL_M, S.HLL_W
    pw = 1 << wbits
    lc = S._hll_lc_table(m)
    lc_list = "[" + ", ".join(str(x) for x in lc) + "]"
    return f"""
WITH e AS (SELECT event_type AS key, CAST(user_id AS VARCHAR) AS v
           FROM events),
r AS (
    SELECT key,
           CAST('0x' || substr(md5('hll:r:' || v), 1, 8) AS BIGINT) % {m}
               AS j,
           CAST('0x' || substr(md5('hll:v:' || v), 1, 8) AS BIGINT) % {pw}
               AS w
    FROM e
),
g AS (SELECT key, j,
             MAX(CASE WHEN w = 0 THEN {wbits + 1}
                 ELSE {wbits + 1} - length(bin(w)) END) AS mx
      FROM r GROUP BY key, j),
k AS (SELECT key,
             CAST({m} - COUNT(*) AS BIGINT) AS n_zero_registers,
             CAST(SUM(CAST(pow(2, {wbits} - mx) AS BIGINT))
                  + ({m} - COUNT(*)) * {pw} AS BIGINT) AS s24
      FROM g GROUP BY key),
est AS (SELECT key, n_zero_registers, s24,
               CAST({S.HLL_ALPHA_NUM} AS BIGINT) * {m * m} * {pw}
                   // ({S.HLL_ALPHA_DEN} * s24) AS hll_raw_est
        FROM k),
tru AS (SELECT event_type AS key,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS true_distinct
        FROM events GROUP BY 1)
SELECT est.key AS event_type, tru.true_distinct,
       est.n_zero_registers, est.s24,
       CAST(est.hll_raw_est AS BIGINT) AS hll_raw_est,
       CAST(CASE WHEN est.hll_raw_est <= {int(2.5 * m)}
                  AND est.n_zero_registers > 0
            THEN {lc_list}[est.n_zero_registers]
            ELSE est.hll_raw_est END AS BIGINT) AS est
FROM est JOIN tru ON est.key = tru.key
"""


@register(
    "events_user_hll_distinct",
    _hll_oracle(),
    doc="Distinct users per event type served from a HyperLogLog "
    "register sketch (Flajolet et al. 2007): three disjoint event "
    "batches build register grids independently, grids MAX-merge "
    "(associative, commutative, IDEMPOTENT — replay-safe by "
    "construction; pinned by test), and the estimate reads the folded "
    "registers — never the events. Engine parity all the way through "
    "the estimator: salted-md5 register/rank hashes, 24-bit rank tail "
    "so the harmonic denominator is the exact integer "
    "sum(2^(24-M_j)), integer alpha correction (709/1000 = alpha_64), "
    "and the small-range linear-counting branch reads a shared "
    "precomputed 64-entry table instead of computing ln — so even the "
    "corrected estimate is hash-exact vs DuckDB. true_distinct column "
    "carried for the accuracy property (rel err pinned < 25% by "
    "test).",
)
def q_events_user_hll_distinct(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from .operators import sketches as S

    ev = load_table(spark, sf_dir, "events")
    parts = [
        S.hll_registers(
            ev.where(F.col("event_id") % 3 == k), "event_type", "user_id"
        )
        for k in range(3)
    ]
    grid = S.hll_merge(*parts)
    est = S.hll_estimate(grid)
    tru = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("true_distinct")
    )
    return est.join(tru, est.key == tru.event_type).select(
        "event_type",
        "true_distinct",
        "n_zero_registers",
        "s24",
        "hll_raw_est",
        "est",
    )


@register(
    "streaming_user_hll_mv",
    _hll_oracle(),
    doc="The same HLL registers maintained as SINK-IS-THE-STATE: three "
    "event batches land as register-grid partials, a compaction "
    "MAX-folds the first two into a snapshot, the third stays "
    "uncompacted, and batch 1 is REPLAYED after compaction (register "
    "MAX is idempotent, so the replay is exactly harmless — stronger "
    "than the additive sinks' overwrite discipline, exercised here on "
    "purpose). Estimates served from the folded sink == one-shot "
    "build, which is why the oracle is the same one-pass SQL.",
)
def q_streaming_user_hll_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from .operators import sketches as S

    ev = load_table(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="hllsink_")
    try:
        for k in range(2):
            S.write_hll_partial(
                ev.where(F.col("event_id") % 3 == k),
                path,
                k,
                "event_type",
                "user_id",
            )
        S.compact_hll(spark, path)
        S.write_hll_partial(
            ev.where(F.col("event_id") % 3 == 2),
            path,
            2,
            "event_type",
            "user_id",
        )
        # replay batch 2's partial after the fold — idempotence means
        # the re-landed dir changes nothing
        S.write_hll_partial(
            ev.where(F.col("event_id") % 3 == 2),
            path,
            2,
            "event_type",
            "user_id",
        )
        grid = S.read_hll(spark, path).localCheckpoint(eager=True)
        est = S.hll_estimate(grid)
        tru = ev.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("true_distinct")
        )
        return est.join(tru, est.key == tru.event_type).select(
            "event_type",
            "true_distinct",
            "n_zero_registers",
            "s24",
            "hll_raw_est",
            "est",
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


# ---------------------------------------------------------------------------
# CMS as sink state — completing the sketch family's serve-from-state
# story (CMS fold = SUM, HLL fold = MAX, quantile histogram fold = SUM).
# ---------------------------------------------------------------------------


def _cms_topk_oracle() -> str:
    """The corpus_token_cms_topk oracle verbatim (queries_round9
    registered it before this module loads): one-shot grid == sink-
    folded grid is the additivity equivalence under test."""
    from .queries import REGISTRY

    return REGISTRY["corpus_token_cms_topk"].oracle


@register(
    "streaming_token_cms_mv",
    _cms_topk_oracle(),
    doc="The count-min grid maintained as SINK-IS-THE-STATE: three "
    "document batches land as (j, b, cnt) partial grids (map-side "
    "combine to the sink), a compaction folds the first two into a "
    "snapshot, the third stays as an uncompacted partial — and the "
    "exact-top-20 probe estimates are served from the folded sink. "
    "Grid cells are additive, so sink-served == one-shot build — the "
    "oracle is corpus_token_cms_topk's SQL verbatim. Completes the "
    "sketch family's state story: CMS folds by SUM, HLL by MAX, the "
    "quantile histogram by SUM, all under the same _SUCCESS-gated "
    "crash contract.",
)
def q_streaming_token_cms_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from .operators import sketches as S
    from .queries_round9 import CMS_DEPTH, CMS_TOPK, CMS_WIDTH

    docs = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="cmssink_")
    try:
        for k in range(2):
            S.write_cms_partial(
                docs.where(F.col("doc_id") % 3 == k),
                path,
                k,
                depth=CMS_DEPTH,
                width=CMS_WIDTH,
            )
        S.compact_cms(spark, path)
        S.write_cms_partial(
            docs.where(F.col("doc_id") % 3 == 2),
            path,
            2,
            depth=CMS_DEPTH,
            width=CMS_WIDTH,
        )
        cms = S.read_cms(spark, path).localCheckpoint(eager=True)
        tokc = (
            docs.select(F.explode(F.split(F.col("text"), " ")).alias("t"))
            .where(F.col("t") != "")
            .groupBy("t")
            .agg(F.count("*").alias("c"))
        )
        top = tokc.orderBy(F.desc("c"), F.asc("t")).limit(CMS_TOPK)
        est = S.cms_estimate(
            cms,
            top.select(F.col("t").alias("token")),
            depth=CMS_DEPTH,
            width=CMS_WIDTH,
        )
        return (
            top.join(est, top.t == est.token)
            .select("token", F.col("c").alias("true_cnt"), "cms_est")
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


# ---------------------------------------------------------------------------
# KMV / theta-style bottom-k distinct sketch (operators/sketches.py) —
# the set-operation capability the HLL registers cannot provide:
# |A ∩ B| / |A ∪ B| / Jaccard between keyed distinct-value sets, served
# from k·8-byte sketches instead of corpus rescans. Completes the
# sketch-family fold algebra: CMS = SUM, quantile histogram = SUM,
# HLL = MAX, KMV = MIN-K — the last two idempotent, all bounded.
# ---------------------------------------------------------------------------


def _kmv_bk_ctes(keep_ppm: int | None = None) -> str:
    """Shared oracle CTEs: per-event-type bottom-k of distinct salted
    48-bit hashes + the per-key theta/est stats — the operator's exact
    fixed-threshold theta-sketch arithmetic in DuckDB. ``keep_ppm``
    mirrors the build gate: hashes at or above the threshold never
    enter the sketch, and an undersized sketch's effective theta IS
    the gate (2^48 ungated — where the estimator degrades to the exact
    count)."""
    from .operators import sketches as S

    k, full = S.KMV_K, S.KMV_FULL
    gate = full if keep_ppm is None else (full * keep_ppm) // 1_000_000
    gate_where = "" if keep_ppm is None else f" WHERE h < {gate}"
    return f"""
e AS (SELECT event_type AS key, CAST(user_id AS VARCHAR) AS v FROM events),
hh0 AS (SELECT DISTINCT key,
               CAST('0x' || substr(md5('kmv:' || v), 1, 12) AS BIGINT) AS h
        FROM e),
hh AS (SELECT key, h FROM hh0{gate_where}),
r AS (SELECT key, h,
             row_number() OVER (PARTITION BY key ORDER BY h) AS rn
      FROM hh),
bk AS (SELECT key, h, rn FROM r WHERE rn <= {k}),
st AS (SELECT key,
              CAST(COUNT(*) AS BIGINT) AS kmv_size,
              CAST(CASE WHEN COUNT(*) < {k} THEN {gate}
                   ELSE MAX(CASE WHEN rn = {k} THEN h END)
                   END AS BIGINT) AS theta,
              CAST(SUM(h) AS BIGINT) AS hs_sum
       FROM bk GROUP BY key),
est AS (SELECT key, kmv_size, theta, hs_sum,
               CAST(CASE WHEN kmv_size < {k}
                    THEN kmv_size * CAST({full} AS BIGINT) // {gate}
                    ELSE {(k - 1) * full} // theta END AS BIGINT) AS est
        FROM st)
"""


def _kmv_distinct_oracle(keep_ppm: int | None = None) -> str:
    return f"""
WITH {_kmv_bk_ctes(keep_ppm)},
tru AS (SELECT event_type AS key,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS true_distinct
        FROM events GROUP BY 1)
SELECT est.key AS event_type, est.kmv_size, est.theta, est.hs_sum,
       est.est, tru.true_distinct
FROM est JOIN tru ON est.key = tru.key
"""


def _kmv_overlap_oracle() -> str:
    from .operators import sketches as S

    full = S.KMV_FULL
    return f"""
WITH {_kmv_bk_ctes()},
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
        FROM agg),
du AS (SELECT DISTINCT event_type, user_id FROM events),
tru2 AS (SELECT a.event_type AS key_a, b.event_type AS key_b,
                CAST(COUNT(*) AS BIGINT) AS true_inter
         FROM du a JOIN du b
           ON a.user_id = b.user_id AND a.event_type < b.event_type
         GROUP BY 1, 2)
SELECT f.key_a AS type_a, f.key_b AS type_b, f.n_match, f.theta_min,
       f.est_a, f.est_b, f.est_inter,
       CAST(f.est_a + f.est_b - f.est_inter AS BIGINT) AS est_union,
       CAST(f.est_inter * 1000000
            // (f.est_a + f.est_b - f.est_inter) AS BIGINT) AS jaccard_ppm,
       t.true_inter
FROM fin f JOIN tru2 t ON f.key_a = t.key_a AND f.key_b = t.key_b
"""


def _kmv_stats_with_truth(
    spark: SparkSession, sf_dir: str, sk, keep_ppm: int | None = None
) -> DataFrame:
    from pyspark.sql import functions as F

    from .operators import sketches as S

    ev = load_table(spark, sf_dir, "events")
    st = S.kmv_stats(sk, keep_ppm=keep_ppm).select(
        "key",
        "kmv_size",
        "theta",
        F.aggregate(
            "hs", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("hs_sum"),
        "est",
    )
    tru = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("true_distinct")
    )
    return st.join(tru, st.key == tru.event_type).select(
        "event_type", "kmv_size", "theta", "hs_sum", "est", "true_distinct"
    )


@register(
    "events_user_kmv_distinct",
    _kmv_distinct_oracle(),
    doc="Distinct users per event type served from a KMV bottom-k "
    "sketch (Bar-Yossef et al. 2002 / Beyer et al. SIGMOD 2007): three "
    "disjoint event batches build bottom-64 sketches independently, "
    "sketches MIN-K-merge (associative, commutative, IDEMPOTENT — set "
    "semantics; merge == one-shot build pinned by test), and the "
    "estimate (k-1)*2^48 DIV h_(k) reads the folded sketch. All-"
    "integer 48-bit salted-md5 arithmetic makes sketch content AND "
    "estimate hash-exact vs DuckDB — hs_sum pins the full retained "
    "hash set through the gate, not just the estimate. A sketch that "
    "saw < k distinct hashes is exact by construction (theta = 2^48). "
    "true_distinct carried for the accuracy property (rel err pinned "
    "by test at ~1/sqrt(k-2)). Builds PIN keep_ppm=None so the result "
    "matches this entry's ungated oracle SQL at every sf (r11 ADVICE "
    "#1: 'auto' re-resolves per scale and would diverge from a static "
    "oracle past 10^7 rows). The library default stays keep_ppm='auto' "
    "(kmv_keep_policy decade tiers, resolved O(metadata) from parquet "
    "footers so deep tiers are reached without caller row counts — "
    "r11 verdict #3), the chosen gate travels inside the sketch (gate "
    "column) to every downstream estimator, and the gated operating "
    "point is its own oracled twin (events_user_kmv_distinct_gated).",
)
def q_events_user_kmv_distinct(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from .operators import sketches as S

    ev = load_table(spark, sf_dir, "events")
    parts = [
        # keep_ppm pinned: this entry's oracle SQL hard-codes the
        # UNGATED build, so the build must not re-resolve through the
        # scale-dependent "auto" policy at a larger sf (r11 ADVICE #1).
        # The gated operating point has its own oracled twin
        # (events_user_kmv_distinct_gated); the auto resolver itself is
        # pinned by tests/test_round12.py.
        S.kmv_sketch(
            ev.where(F.col("event_id") % 3 == k),
            "event_type",
            "user_id",
            keep_ppm=None,
        )
        for k in range(3)
    ]
    sk = S.kmv_merge(*parts)
    return _kmv_stats_with_truth(spark, sf_dir, sk)


@register(
    "events_type_kmv_overlap",
    _kmv_overlap_oracle(),
    doc="Pairwise SET OPERATIONS between per-event-type distinct-user "
    "sets, computed entirely from KMV sketches — the capability HLL's "
    "MAX-registers destroy: theta-sketch intersection "
    "(n_match*2^48 DIV theta_min over shared hashes below the smaller "
    "theta — a complete uniform sample of the intersection), union by "
    "inclusion-exclusion, Jaccard in ppm. Pairs materialize through a "
    "hash EQUI-JOIN on the retained 48-bit hashes (never a key-by-key "
    "nested loop) and the per-key stats broadcast onto the pair "
    "aggregate, so the whole query touches sketch-sized data only. "
    "true_inter carried for the accuracy pin. At 100 TB this is 'how "
    "many users/documents do sources A and B share' answered from "
    "k*8-byte state per source.",
)
def q_events_type_kmv_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from .operators import sketches as S

    ev = load_table(spark, sf_dir, "events")
    # keep_ppm pinned to the oracle's ungated build (r11 ADVICE #1)
    sk = S.kmv_sketch(ev, "event_type", "user_id", keep_ppm=None)
    pairs = S.kmv_pair_overlap(sk).withColumnsRenamed(
        {"key_a": "type_a", "key_b": "type_b"}
    )
    du = ev.select("event_type", "user_id").distinct()
    a = du.select(F.col("event_type").alias("type_a"), "user_id")
    b = du.select(F.col("event_type").alias("type_b"), "user_id")
    tru = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("true_inter"))
    )
    return pairs.join(tru, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        "n_match",
        "theta_min",
        "est_a",
        "est_b",
        "est_inter",
        "est_union",
        "jaccard_ppm",
        "true_inter",
    )


@register(
    "streaming_user_kmv_mv",
    _kmv_distinct_oracle(),
    doc="The same KMV bottom-k sketch maintained as SINK-IS-THE-STATE: "
    "three event batches land as flat (key, h) partials (<= k rows per "
    "key each), a compaction min-k-folds the first two into a "
    "snapshot, the third stays uncompacted, and batch 2 is REPLAYED "
    "after landing (min-k over sets is idempotent — the replay is "
    "exactly harmless by algebra, same guarantee class as the HLL "
    "sink). Estimates and the hs_sum content checksum served from the "
    "folded sink == one-shot build, which is why the oracle is the "
    "same one-pass SQL.",
)
def q_streaming_user_kmv_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from .operators import sketches as S

    ev = load_table(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="kmvsink_")
    try:
        for k in range(2):
            S.write_kmv_partial(
                ev.where(F.col("event_id") % 3 == k),
                path,
                k,
                "event_type",
                "user_id",
            )
        S.compact_kmv(spark, path)
        S.write_kmv_partial(
            ev.where(F.col("event_id") % 3 == 2),
            path,
            2,
            "event_type",
            "user_id",
        )
        S.write_kmv_partial(
            ev.where(F.col("event_id") % 3 == 2),
            path,
            2,
            "event_type",
            "user_id",
        )
        sk = S.read_kmv(spark, path).localCheckpoint(eager=True)
        return _kmv_stats_with_truth(spark, sf_dir, sk)
    finally:
        shutil.rmtree(path, ignore_errors=True)


# ---------------------------------------------------------------------------
# GPT-2 pre-token CLASS census over a synthesized text axis — the
# corpus's 61-word vocabulary contains no contractions, digits, or
# punctuation, so without this entry the GPT-2 pattern's distinguishing
# behavior would be unit-tested but never exercised through the oracle
# gate. Same synthesized-axis precedent as the r7 URL corpus: a
# deterministic doc_id-derived decoration, identical SQL on both sides.
# ---------------------------------------------------------------------------

_DECOR_SPARK_SUFFIX = " I'm sure it's the 42nd try (v"
_DECOR_TAIL = ")  twice-spaced café 中文!"


def _decorated_sql() -> str:
    sfx = _DECOR_SPARK_SUFFIX.replace("'", "''")
    return (
        f"text || '{sfx}' || CAST(doc_id % 97 AS VARCHAR) || '{_DECOR_TAIL}'"
    )


@register(
    "corpus_gpt2_pretoken_class_census",
    f"""
WITH dec AS (SELECT {_decorated_sql()} AS t FROM documents),
pt AS (SELECT unnest(regexp_extract_all(t,
           '{{GPT2_RE}}')) AS p FROM dec),
cls AS (
    SELECT p,
           CASE WHEN p IN ('''s', '''t', '''re', '''ve', '''m', '''ll',
                           '''d') THEN 'contraction'
                WHEN regexp_matches(p, '^ ?\\p{{L}}+$') THEN 'word'
                WHEN regexp_matches(p, '^ ?\\p{{N}}+$') THEN 'number'
                WHEN regexp_matches(p, '^[ \\t\\n\\r\\x0B\\f]+$')
                    THEN 'whitespace'
                ELSE 'punct' END AS cls
    FROM pt
)
SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_pretokens,
       CAST(COUNT(DISTINCT p) AS BIGINT) AS n_distinct
FROM cls GROUP BY cls
""".replace("{GPT2_RE}", bpe.GPT2_PRETOKEN_RE.replace("'", "''")),
    doc="Census of GPT-2 pre-token CLASSES (contraction / word / "
    "number / punct / whitespace) over a synthesized text axis that "
    "actually exercises them — each document gains a deterministic "
    "decoration carrying contractions ('m, 's), a letter-digit "
    "boundary (42nd -> '42' + 'nd'), parenthesized doc_id-derived "
    "digits, a double space, and multibyte words. Pins the faithful "
    "pattern's distinguishing behavior (the plain corpus is "
    "letters-and-single-spaces only, where v1 and GPT-2 agree) "
    "end-to-end through both engines: the same pattern string AND the "
    "same class regexes run on java.util.regex and RE2.",
)
def q_corpus_gpt2_pretoken_class_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    dec = docs.select(
        F.concat(
            F.col("text"),
            F.lit(_DECOR_SPARK_SUFFIX),
            (F.col("doc_id") % 97).cast("string"),
            F.lit(_DECOR_TAIL),
        ).alias("t")
    )
    pt = dec.select(
        F.explode(
            F.regexp_extract_all(
                F.col("t"), F.lit(bpe.GPT2_PRETOKEN_RE), F.lit(0)
            )
        ).alias("p")
    )
    contractions = ["'s", "'t", "'re", "'ve", "'m", "'ll", "'d"]
    cls = (
        F.when(F.col("p").isin(contractions), F.lit("contraction"))
        .when(F.col("p").rlike(r"^ ?\p{L}+$"), F.lit("word"))
        .when(F.col("p").rlike(r"^ ?\p{N}+$"), F.lit("number"))
        .when(F.col("p").rlike("^[ \\t\\n\\r\\x0B\\f]+$"), F.lit("whitespace"))
        .otherwise(F.lit("punct"))
    )
    return (
        pt.select("p", cls.alias("cls"))
        .groupBy("cls")
        .agg(
            F.count("*").alias("n_pretokens"),
            F.countDistinct("p").alias("n_distinct"),
        )
    )


# ---------------------------------------------------------------------------
# Tokenizer DECODE path (operators/bpe.py bbpe_roundtrip) — the half of
# the tokenizer contract the encode-stats entries can't see: encode ∘
# decode == identity, byte for byte, through the hash gate. Runs over
# the DECORATED text axis (contractions, digit runs, double spaces,
# multibyte café/中文) so UTF-8 multi-byte symbols, category-split
# pre-tokens, and merged tokens all roundtrip — the oracle is the
# decorated text itself, so ANY loss anywhere in pretokenize → byte
# symbols → merge folds → unhex-decode → positional reassembly breaks
# the hash.
# ---------------------------------------------------------------------------


@register(
    "corpus_bbpe_roundtrip",
    f"SELECT doc_id, {_decorated_sql()} AS decoded FROM documents",
    doc="BBPE decode: every document encoded with the production merge "
    "table (rank-80 cut, GPT-2 pre-tokenizer) and reconstructed from "
    "its token sequence — decoded must equal the input text exactly. "
    "Pins that the pre-tokenizer PARTITIONS text (total, no byte lost "
    "or doubled), that merge-concatenated hex symbols are the token's "
    "byte sequence (decode = unhex, no tokenizer state at decode time), "
    "and that positional reassembly restores document order. The "
    "oracle is the identity on the decorated text — the strongest "
    "possible roundtrip gate. Scale shape unchanged from encode: merge "
    "folds on the vocab-sized distinct pre-token table; the corpus "
    "pays one posexplode + one join + one groupBy(doc).",
)
def q_corpus_bbpe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    dec = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(_DECOR_SPARK_SUFFIX),
            (F.col("doc_id") % 97).cast("string"),
            F.lit(_DECOR_TAIL),
        ).alias("text"),
    )
    return bpe.bbpe_roundtrip(
        dec,
        bpe.FIXED_BYTE_MERGES_V2,
        pretoken_re=bpe.GPT2_PRETOKEN_RE,
        checkpoint_every=8,
    )


# ---------------------------------------------------------------------------
# Exact-integer EWMA (exponentially-weighted moving average) — the
# classic "needs a recursive fold" time-series operator, made exact,
# engine-portable, and shuffle-linear by truncating alpha=1/2 at 16
# terms: EWMA_t = sum_{i=0..15} x_{t-i}·2^(15-i) / sum 2^(15-i)
# (pandas ewm(adjust=True) over a 16-row window). 2^-16 ~ 1.5e-5 of
# weight is below cent resolution, so the truncation is the honest
# bounded-memory form — and every term is a BIGINT, so numerator,
# denominator, and the milli-quantized ratio are hash-exact on both
# engines (no pow-of-(1-alpha) double drift). Shape: a bounded 16-way
# fan-out from each event to the rows it feeds, one (user, target-row)
# groupBy with map-side combine, one join back — all linear in events,
# no per-row recursion anywhere.
# ---------------------------------------------------------------------------

EWMA_W = 16
EWMA_USER_MOD = 10  # deterministic user subset keeps the gate bounded


def _ewma_oracle() -> str:
    return f"""
WITH base AS (
    SELECT user_id, event_id,
           CAST(ROUND(value * 100) AS BIGINT) AS cents,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events WHERE user_id % {EWMA_USER_MOD} = 0
),
fan AS (
    SELECT b.user_id, b.rn + i.i AS rt,
           b.cents * CAST(pow(2, {EWMA_W - 1} - i.i) AS BIGINT) AS contrib,
           CAST(pow(2, {EWMA_W - 1} - i.i) AS BIGINT) AS w
    FROM base b, (SELECT unnest(range(0, {EWMA_W})) AS i) i
),
agg AS (
    SELECT user_id, rt,
           CAST(SUM(contrib) AS BIGINT) AS ewma_num,
           CAST(SUM(w) AS BIGINT) AS ewma_den
    FROM fan GROUP BY 1, 2
)
SELECT t.user_id, t.event_id, a.ewma_num, a.ewma_den,
       CAST(a.ewma_num * 1000 // a.ewma_den AS BIGINT) AS ewma_milli
FROM base t JOIN agg a ON t.user_id = a.user_id AND t.rn = a.rt
"""


@register(
    "events_user_ewma",
    _ewma_oracle(),
    doc="Per-event EWMA of event value per user (alpha = 1/2, "
    f"adjust-normalized, truncated at {EWMA_W} terms — below cent "
    "resolution): the recursive smoother expressed as a BOUNDED "
    "relational fan-out so it is exact, engine-portable integer "
    "arithmetic end-to-end — each event fans out to the <= 16 rows it "
    "feeds with power-of-two BIGINT weights, partials combine "
    "map-side on (user, target-row), and one join lands the smoothed "
    "value back on the event. No recursion, no pow(1-alpha) doubles, "
    "no unbounded window state: the 100 TB plan is one 16x bounded "
    "fan-out + one keyed exchange + one co-keyed join. Emits exact "
    "numerator/denominator plus the milli-quantized ratio.",
)
def q_events_user_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id") % EWMA_USER_MOD == 0
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.row_number().over(w).alias("rn"),
    )
    fan = (
        base.select(
            "user_id",
            "rn",
            "cents",
            F.explode(F.sequence(F.lit(0), F.lit(EWMA_W - 1))).alias("i"),
        )
        .select(
            "user_id",
            (F.col("rn") + F.col("i")).alias("rt"),
            F.expr(
                f"cents * CAST(pow(2, {EWMA_W - 1} - i) AS BIGINT)"
            ).alias("contrib"),
            F.expr(f"CAST(pow(2, {EWMA_W - 1} - i) AS BIGINT)").alias("w"),
        )
    )
    agg = (
        fan.groupBy("user_id", "rt")
        .agg(
            F.sum("contrib").alias("ewma_num"),
            F.sum("w").alias("ewma_den"),
        )
        .withColumnsRenamed({"user_id": "a_uid", "rt": "a_rt"})
    )
    return (
        base.join(
            agg,
            (base.user_id == agg.a_uid) & (base.rn == agg.a_rt),
        )
        .select(
            "user_id",
            "event_id",
            "ewma_num",
            "ewma_den",
            # FLOOR division, explicitly (r10 ADVICE): Spark's DIV
            # truncates toward zero while the oracle's // floors — they
            # agree only for non-negative numerators. ewma_den (a sum
            # of powers of two) is always > 0, so floor(num·1000/den)
            # = trunc - 1 exactly when the division is inexact and the
            # numerator is negative; this form is sign-safe, the
            # fixture's non-negative values are no longer load-bearing
            # (signed parity pinned in tests/test_round11.py).
            F.expr(
                "ewma_num * 1000 DIV ewma_den"
                " - CASE WHEN (ewma_num * 1000) % ewma_den != 0"
                "        AND ewma_num < 0 THEN 1 ELSE 0 END"
            ).alias("ewma_milli"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom bitmap as sink state (operators/dedup.py write_bloom_partial /
# read_bloom / compact_bloom) — the OR member that completes the
# sketch-sink fold family: CMS/quantile = SUM, HLL = MAX, KMV = MIN-K,
# Bloom = OR. Real-world shape: eval/benchmark suites land
# incrementally; each batch folds its 8-grams into a partial bitmap at
# ingest, and the decontamination gate serves from the folded
# <= m/32-row table without ever rescanning the benchmark corpus.
# ---------------------------------------------------------------------------


def _bloom_gate_oracle() -> str:
    """bloom_contamination_gate's oracle verbatim: one-shot bitmap ==
    sink-folded bitmap is the OR-idempotence equivalence under test.
    Importing queries_round7 here (not relying on loader order) makes
    this module safe to import directly — the import registers the
    gate as a side effect, idempotently."""
    from . import queries_round7  # noqa: F401 — registration side effect
    from .queries import REGISTRY

    return REGISTRY["bloom_contamination_gate"].oracle


@register(
    "streaming_bloom_gate_mv",
    _bloom_gate_oracle(),
    doc="The Bloom decontamination bitmap maintained as "
    "SINK-IS-THE-STATE: the benchmark set lands in three batches as "
    "(w, bits) partial bitmaps, a compaction OR-folds the first two "
    "into a snapshot, the third stays uncompacted AND is REPLAYED "
    "after landing (bit_or is idempotent — the replay is exactly "
    "harmless by algebra, same guarantee class as the HLL/KMV sinks), "
    "and the per-doc contamination audit is served with the folded "
    "bitmap. Sink-served == one-shot build, which is why the oracle "
    "is bloom_contamination_gate's SQL verbatim. Completes the "
    "sketch-sink fold family: SUM (CMS, quantile histogram), MAX "
    "(HLL), MIN-K (KMV), OR (Bloom).",
)
def q_streaming_bloom_gate_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from .catalog import widen_input as _widen
    from .fixtures import documents_with_dups
    from .operators import dedup as _dedup
    from .queries_round7 import BLOOM_M_BITS, BLOOM_N

    corpus = _widen(documents_with_dups(spark, sf_dir))
    train = corpus.where(F.col("doc_id") < 1_000_000)
    bench = corpus.where(F.col("doc_id") >= 1_000_000)
    path = tempfile.mkdtemp(prefix="bloomsink_")
    try:
        for k in range(2):
            _dedup.write_bloom_partial(
                bench.where(F.col("doc_id") % 3 == k),
                path,
                k,
                n=BLOOM_N,
                m_bits=BLOOM_M_BITS,
            )
        _dedup.compact_bloom(spark, path)
        _dedup.write_bloom_partial(
            bench.where(F.col("doc_id") % 3 == 2),
            path,
            2,
            n=BLOOM_N,
            m_bits=BLOOM_M_BITS,
        )
        _dedup.write_bloom_partial(
            bench.where(F.col("doc_id") % 3 == 2),
            path,
            2,
            n=BLOOM_N,
            m_bits=BLOOM_M_BITS,
        )
        bloom = _dedup.read_bloom(spark, path).localCheckpoint(eager=True)
        return _dedup.bloom_contamination(
            train,
            bench,
            n=BLOOM_N,
            m_bits=BLOOM_M_BITS,
            bloom=bloom,
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


# ---------------------------------------------------------------------------
# Bounded-hop BFS (operators/graph.py bounded_bfs) — the k-hop
# neighborhood primitive the graph family lacked: exact triangle/k-core
# /k-truss/PageRank/CC existed, but "what is within 3 hops of this seed
# set" (taint spread, recommendation halo, blast-radius queries) is the
# frontier-expansion op. Bounded hops is the honest 100 TB form: plan
# depth fixed by k, per-level work proportional to the NEW frontier
# (anti-join against visited), never diameter-dependent.
# ---------------------------------------------------------------------------

BFS_SEED_MOD = 500
BFS_HOPS = 3


def _bfs_oracle() -> str:
    return f"""
WITH RECURSIVE pairs AS (
    SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                    GREATEST(a.l_partkey, b.l_partkey) AS v
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
seeds AS (SELECT DISTINCT l_partkey AS node FROM lineitem
          WHERE l_partkey % {BFS_SEED_MOD} = 0),
walk(node, dist) AS (
    SELECT node, 0 FROM seeds
    UNION ALL
    SELECT s.v, w.dist + 1
    FROM walk w JOIN sym s ON w.node = s.u
    WHERE w.dist < {BFS_HOPS}
)
SELECT node AS part_id, CAST(MIN(dist) AS BIGINT) AS dist
FROM walk GROUP BY node
"""


@register(
    "parts_copurchase_bfs_3hop",
    _bfs_oracle(),
    doc=f"Minimum hop distance (<= {BFS_HOPS}) from a deterministic "
    f"seed set (partkey % {BFS_SEED_MOD} = 0) over the co-purchase "
    "graph — frontier BFS with per-level visited anti-joins, so each "
    "level's work is proportional to the NEW frontier and the plan "
    "depth is fixed by the hop bound, not graph diameter. First-seen "
    "level == min distance by level order. The oracle walks the same "
    "graph with a depth-bounded recursive CTE and takes MIN(dist) over "
    "all revisits — two constructions, one answer.",
)
def q_parts_copurchase_bfs_3hop(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from .operators.graph import bounded_bfs
    from .queries_round8 import (
        _copurchase_degree_bound,
        _copurchase_edge_pairs_canonical,
    )

    li = load_table(spark, sf_dir, "lineitem")
    seeds = (
        li.where(F.col("l_partkey") % BFS_SEED_MOD == 0)
        .select(F.col("l_partkey").alias("node"))
        .distinct()
    )
    return bounded_bfs(
        _copurchase_edge_pairs_canonical(spark, sf_dir),
        seeds,
        max_hops=BFS_HOPS,
        max_degree_bound=_copurchase_degree_bound(spark, sf_dir),
    ).select(
        F.col("node").alias("part_id"), F.col("dist").cast("long").alias("dist")
    )


# ---------------------------------------------------------------------------
# Entity resolution end-to-end (blocking -> verified similarity ->
# connected components -> golden record): the MDM pipeline composed
# from the engine's own primitives — PassJoin pigeonhole edit-distance
# pairs (operators/strings.py), min-label components
# (operators/graph.py), and a deterministic survivorship rule.
# ---------------------------------------------------------------------------


def _er_oracle() -> str:
    return """
WITH RECURSIVE names AS (
    SELECT c_custkey AS id, c_name AS name, c_nationkey AS nat
    FROM customer
),
pairs AS (
    SELECT a.id AS id_a, b.id AS id_b
    FROM names a JOIN names b ON a.id < b.id AND a.nat = b.nat
    WHERE levenshtein(a.name, b.name) <= 1
),
und AS (SELECT id_a AS u, id_b AS v FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
walk(node, comp) AS (
    SELECT u, u FROM und
    UNION
    SELECT e.v, w.comp FROM walk w JOIN und e ON w.node = e.u
),
clusters AS (SELECT node, MIN(comp) AS comp FROM walk GROUP BY node),
ent AS (
    SELECT c.c_custkey,
           c.c_name,
           CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS cents,
           COALESCE(cl.comp, c.c_custkey) AS entity_id
    FROM customer c LEFT JOIN clusters cl ON c.c_custkey = cl.node
)
SELECT entity_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       MAX(CASE WHEN c_custkey = entity_id THEN c_name END) AS rep_name,
       CAST(SUM(cents) AS BIGINT) AS sum_acctbal_cents
FROM ent GROUP BY entity_id
"""


@register(
    "customer_entity_resolution",
    _er_oracle(),
    doc="Entity resolution end-to-end: PassJoin pigeonhole-blocked "
    "edit-distance pairs (ed <= 1, never a cross join) -> connected "
    "components (transitive identity: A~B~C is ONE entity even though "
    "A~C was never emitted) -> golden record per entity with a "
    "deterministic survivorship rule (min-custkey member is the "
    "representative; balances sum exactly in cents). A match "
    "additionally requires the SAME nation (the classic second "
    "attribute that stops sequential-serial names chaining the whole "
    "table into one entity — applied as a post-verify filter, so "
    "blocking losslessness is untouched). Singletons are their own "
    "entity via the left join. The oracle recomputes pairs from the "
    "all-pairs levenshtein definition and walks the graph with a "
    "recursive CTE — blocking losslessness, component labels, and "
    "survivorship arithmetic are all inside the hash gate.",
)
def q_customer_entity_resolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from .operators import strings as _strings
    from .operators.graph import connected_components

    c = load_table(spark, sf_dir, "customer")
    names = c.select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    nat = c.select(
        F.col("c_custkey").alias("id"), F.col("c_nationkey").alias("nat")
    )
    pairs = (
        _strings.edit_distance_pairs(
            names, d=1, str_col="name", id_col="id", compute_splits="auto"
        )
        .select("id_a", "id_b")
        .join(nat.withColumnsRenamed({"id": "id_a", "nat": "na"}), "id_a")
        .join(nat.withColumnsRenamed({"id": "id_b", "nat": "nb"}), "id_b")
        .where(F.col("na") == F.col("nb"))
        .select("id_a", "id_b")
    )
    clusters = connected_components(pairs)
    ent = c.join(
        F.broadcast(clusters), c.c_custkey == clusters.node, "left"
    ).select(
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
        F.coalesce("comp", "c_custkey").alias("entity_id"),
    )
    return ent.groupBy("entity_id").agg(
        F.count("*").alias("n_members"),
        F.max(
            F.when(F.col("c_custkey") == F.col("entity_id"), F.col("c_name"))
        ).alias("rep_name"),
        F.sum("cents").alias("sum_acctbal_cents"),
    )


# ---------------------------------------------------------------------------
# Perceptual-hash near-dup pairs — the multimodal × dedup crossover:
# a dHash (difference hash) computed from REAL decoded pixels (payload
# -> stdlib PNG encode with per-doc scanline filter -> stdlib decode ->
# 9x8 nearest-neighbor gray grid -> 56 horizontal-gradient bits), then
# near-dup pairs by LSH banding + Hamming verify — the image analogue
# of SimHash dedup, sharing its band/verify shape. 56 bits (7 of the 8
# comparisons per sampled row) keeps the hash in positive int64 on
# both engines, the same sign-safety trick as the 32-bit Bloom words.
# ---------------------------------------------------------------------------

PHASH_GRID_W, PHASH_GRID_H = 9, 8  # sample grid (9 cols -> 8 diffs/row)
PHASH_BITS_PER_ROW = 7  # keep 7 of 8 diffs: 56 bits < 2^62
PHASH_BANDS, PHASH_BAND_BITS = 4, 14
PHASH_MAX_HAMMING = 3  # < PHASH_BANDS, so banding is pigeonhole-complete
_PHASH_SRC_W, _PHASH_STRIDE = 32, 96


def _phash_oracle() -> str:
    from .fixtures import DOCUMENTS_WITH_DUPS_ORACLE_CTE

    w, hgt, bpr = PHASH_GRID_W, PHASH_GRID_H, PHASH_BITS_PER_ROW
    byte = (
        "CASE WHEN k < n THEN"
        " (strpos('0123456789ABCDEF', substr(hx, CAST(2*k+1 AS INTEGER), 1)) - 1) * 16"
        " + (strpos('0123456789ABCDEF', substr(hx, CAST(2*k+2 AS INTEGER), 1)) - 1)"
        " ELSE 0 END"
    )
    return f"""
WITH {DOCUMENTS_WITH_DUPS_ORACLE_CTE},
p AS (SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM docs_dup WHERE octet_length(encode(text)) > 0),
dims AS (SELECT doc_id, hx, n, CAST(ceil(n / {_PHASH_STRIDE}.0) AS BIGINT)
             AS h FROM p),
cells AS (
    SELECT doc_id, hx, n, h,
           t // {w * 3} AS gy, (t // 3) % {w} AS gx, t % 3 AS c,
           (t // {w * 3}) * h // {hgt} * {_PHASH_STRIDE}
         + ((t // 3) % {w}) * {_PHASH_SRC_W} // {w} * 3
         + t % 3 AS k
    FROM dims, (SELECT unnest(range(0, {hgt * w * 3})) AS t)
),
grays AS (
    SELECT doc_id, gy, gx, CAST(SUM({byte}) AS BIGINT) AS gray
    FROM cells GROUP BY doc_id, gy, gx
),
bits AS (
    SELECT a.doc_id, a.gy * {bpr} + a.gx AS j,
           CASE WHEN a.gray > b.gray THEN 1 ELSE 0 END AS bit
    FROM grays a JOIN grays b
      ON a.doc_id = b.doc_id AND a.gy = b.gy AND b.gx = a.gx + 1
    WHERE a.gx < {bpr}
),
hs AS (
    SELECT doc_id,
           CAST(SUM(bit * (CAST(1 AS BIGINT) << CAST(j AS INTEGER)))
                AS BIGINT) AS dhash
    FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
FROM hs a JOIN hs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= {PHASH_MAX_HAMMING}
"""


@register(
    "multimodal_phash_near_dup_pairs",
    _phash_oracle(),
    doc="Image near-dup pairs by perceptual dHash over REAL decoded "
    "pixels: payloads PNG-encoded (per-doc scanline filter, all five "
    "reconstructions exercised) and decoded by the stdlib codec, gray "
    f"levels sampled on a {PHASH_GRID_W}x{PHASH_GRID_H} "
    "nearest-neighbor grid, horizontal-gradient sign bits packed into "
    f"a {PHASH_GRID_H * PHASH_BITS_PER_ROW}-bit integer hash; pairs "
    f"from {PHASH_BANDS}-band LSH blocking (hamming <= "
    f"{PHASH_MAX_HAMMING} < bands is pigeonhole-COMPLETE — no "
    "candidate can be missed) verified with bit_count(xor). The "
    "oracle recomputes every gray straight from the payload hex dump "
    "and takes the ALL-PAIRS definition, so codec, kernel arithmetic, "
    "bit packing, AND blocking losslessness all sit inside the hash "
    "gate. The image twin of SimHash dedup; planted exact dups land "
    "at distance 0.",
)
def q_multimodal_phash_near_dup_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import pandas as pd
    from pyspark.sql import functions as F

    from .catalog import widen_input
    from .fixtures import documents_with_dups
    from .operators import multimodal
    from .operators.png import png_decode, png_encode

    w, hgt, bpr = PHASH_GRID_W, PHASH_GRID_H, PHASH_BITS_PER_ROW
    stride, src_w = _PHASH_STRIDE, _PHASH_SRC_W
    payloads = widen_input(
        multimodal.with_binary_payload(
            documents_with_dups(spark, sf_dir)
        ).where(F.length("payload") > 0)
    )

    def to_dhash(batches):
        # Per-row Python cost is O(rows) stdlib PNG decode + O(1) numpy
        # per row (r10 verdict ask #4): the grid sample, gray sum, and
        # gradient-bit pack below are fixed-size (hgt x w) vectorized
        # array ops over the decoded scanline buffer — no per-pixel
        # Python loop anywhere (the pattern
        # multimodal_arrow_zero_copy_stats established).
        import numpy as np

        col = (np.arange(w) * src_w // w) * 3  # grid-column byte offsets
        weights = (
            np.int64(1)
            << (np.arange(hgt, dtype=np.int64)[:, None] * bpr
                + np.arange(bpr, dtype=np.int64)[None, :])
        )
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n = len(raw)
                h = -(-n // stride)
                pix = raw + bytes(h * stride - n)
                png = png_encode(src_w, h, pix, 2, int(doc_id) % 5)
                _w2, h2, _c2, data = png_decode(png)
                arr = np.frombuffer(bytes(data), dtype=np.uint8).reshape(
                    h2, stride
                )
                sample = arr[np.arange(hgt) * h2 // hgt]  # (hgt, stride)
                grays = (
                    sample[:, col].astype(np.int64)
                    + sample[:, col + 1]
                    + sample[:, col + 2]
                )  # (hgt, w) gray sums
                bits = grays[:, :bpr] > grays[:, 1 : bpr + 1]
                dh = int((weights * bits).sum())
                rows.append((int(doc_id), dh))
            yield pd.DataFrame(rows, columns=["doc_id", "dhash"])

    hs = payloads.mapInPandas(
        to_dhash, schema="doc_id bigint, dhash bigint"
    ).localCheckpoint(eager=True)
    mask = (1 << PHASH_BAND_BITS) - 1
    bands = hs.select(
        "doc_id",
        "dhash",
        F.explode(F.sequence(F.lit(0), F.lit(PHASH_BANDS - 1))).alias("b"),
    ).select(
        "doc_id",
        "dhash",
        "b",
        F.expr(f"(dhash >> ({PHASH_BAND_BITS} * b)) & {mask}").alias("bv"),
    )
    a = bands.select(
        F.col("doc_id").alias("id_a"), F.col("dhash").alias("ha"), "b", "bv"
    )
    b = bands.select(
        F.col("doc_id").alias("id_b"), F.col("dhash").alias("hb"), "b", "bv"
    )
    cand = (
        a.join(b, ["b", "bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb")
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.expr("ha ^ hb")).cast("long").alias("hamming"),
    ).where(F.col("hamming") <= PHASH_MAX_HAMMING)


# ---------------------------------------------------------------------------
# KEYED quantile sketch — "p99 document length PER LANGUAGE served from
# state": the grouped form of corpus_length_quantiles_sketch. Same
# log-linear grid and integer rank walk, one bounded cell array PER
# KEY; the quantile axis explodes a literal, so the serve side is
# join-free over grid-sized data.
# ---------------------------------------------------------------------------


def _qsketch_keyed_oracle(m: int, q_ppms: list[int]) -> str:
    from .operators.quantiles import MAX_LONG, _hi_sql, _lo_sql, _log2m

    lm = _log2m(m)
    vals = ", ".join(f"({p})" for p in q_ppms)
    g = "GREATEST(val, CAST(1 AS BIGINT))"
    p2 = f"CAST(pow(2, length(bin({g})) - 1) AS BIGINT)"
    lo = _lo_sql("bucket", m).replace(" DIV ", " // ")
    hi = _hi_sql("bucket", m).replace(" DIV ", " // ")
    top = 62 * m + m - 1
    return f"""
WITH v AS (SELECT lang AS key, CAST(n_chars AS BIGINT) AS val
           FROM documents),
b AS (
    SELECT key,
           CASE WHEN val <= 0 THEN CAST(-1 AS BIGINT)
           ELSE CAST(length(bin({g})) - 1 AS BIGINT) * {m}
                + (CASE WHEN length(bin({g})) - 1 >= {lm}
                   THEN ({g} - {p2}) // ({p2} // {m})
                   ELSE ({g} - {p2}) * {m} // {p2} END)
           END AS bucket
    FROM v
),
s AS (SELECT key, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM b GROUP BY key, bucket),
c AS (SELECT key, bucket, cnt,
             SUM(cnt) OVER (PARTITION BY key ORDER BY bucket) AS cum,
             SUM(cnt) OVER (PARTITION BY key) AS n
      FROM s),
qs(q_ppm) AS (VALUES {vals}),
t AS (SELECT k.key, CAST(qs.q_ppm AS BIGINT) AS q_ppm,
             CAST(k.n AS BIGINT) AS n_total,
             (qs.q_ppm * k.n + 999999) // 1000000 AS target_rank
      FROM qs, (SELECT DISTINCT key, n FROM c) k),
p AS (SELECT t.key, t.q_ppm, t.n_total, t.target_rank,
             MIN(c.bucket) AS bucket
      FROM t JOIN c ON c.key = t.key AND c.cum >= t.target_rank
      GROUP BY 1, 2, 3, 4)
SELECT key AS lang, q_ppm, n_total,
       CAST(target_rank AS BIGINT) AS target_rank,
       CAST(bucket AS BIGINT) AS bucket,
       CAST(CASE WHEN bucket < 0 THEN 0 ELSE {lo} END AS BIGINT) AS est_lo,
       CAST(CASE WHEN bucket < 0 THEN 1
            WHEN bucket >= {top} THEN {MAX_LONG}
            ELSE {hi} END AS BIGINT) AS est_hi
FROM p
"""


@register(
    "doc_length_quantiles_by_lang_sketch",
    _qsketch_keyed_oracle(QSK_M, QSK_QPPMS),
    doc="Per-LANGUAGE document-length quantiles (p25/p50/p90/p99) "
    "served from the KEYED mergeable histogram sketch: three disjoint "
    "document batches build (key, bucket, cnt) grids independently, "
    "grids SUM-merge per key (additivity pinned by the global entry's "
    "test), and each language's quantiles come from a rank walk over "
    "its OWN bounded cell array (<= 64*m+1 cells per key; the "
    "quantile axis explodes a literal — the serve side is join-free "
    "over grid-sized data). Build shuffle is O(tasks * keys * grid). "
    "This is the per-tenant/per-domain percentile dashboard shape: "
    "one state table serves every (key, q) pair without rescanning "
    "the corpus.",
)
def q_doc_length_quantiles_by_lang_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from .operators import quantiles as Q

    docs = _docs(spark, sf_dir)
    parts = [
        Q.quantile_sketch_build_keyed(
            docs.where(F.col("doc_id") % 3 == k), "lang", "n_chars", QSK_M
        )
        for k in range(3)
    ]
    merged = Q.quantile_sketch_merge_keyed(*parts)
    return Q.quantile_sketch_query_keyed(merged, QSK_QPPMS, QSK_M).select(
        F.col("key").alias("lang"),
        "q_ppm",
        "n_total",
        "target_rank",
        "bucket",
        "est_lo",
        "est_hi",
    )


# ---------------------------------------------------------------------------
# Bounded Bellman-Ford (operators/graph.py bounded_bellman_ford) — the
# WEIGHTED companion to the BFS entry: cheapest path within a hop
# budget, where a 2-edge detour can beat a direct edge (the case hop
# counting cannot see). Edge weight = 1 + 10000 DIV copurchase_count:
# frequently co-purchased part pairs are cheap to traverse, rare pairs
# expensive — the affinity-distance the recommendation literature uses.
# ---------------------------------------------------------------------------


def _bf_oracle() -> str:
    return f"""
WITH RECURSIVE pairs AS (
    SELECT LEAST(a.l_partkey, b.l_partkey) AS u,
           GREATEST(a.l_partkey, b.l_partkey) AS v,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
),
wedges AS (SELECT u, v, CAST(1 + 10000 // cnt AS BIGINT) AS w FROM pairs),
sym AS (SELECT u, v, w FROM wedges UNION SELECT v, u, w FROM wedges),
seeds AS (SELECT DISTINCT l_partkey AS node FROM lineitem
          WHERE l_partkey % {BFS_SEED_MOD} = 0),
walk(node, cost, d) AS (
    SELECT node, CAST(0 AS BIGINT), 0 FROM seeds
    UNION ALL
    SELECT s.v, w.cost + s.w, w.d + 1
    FROM walk w JOIN sym s ON w.node = s.u
    WHERE w.d < {BFS_HOPS}
)
SELECT node AS part_id, CAST(MIN(cost) AS BIGINT) AS cost
FROM walk GROUP BY node
"""


@register(
    "parts_copurchase_cheapest_3hop",
    _bf_oracle(),
    doc=f"Cheapest affinity path (<= {BFS_HOPS} edges) from the same "
    "seed set as the BFS entry, edge weight 1 + 10000 DIV "
    "copurchase-count: bounded Bellman-Ford — each relaxation round is "
    "one equi-join + one keyed MIN over the best-so-far table, plan "
    "depth fixed by the hop budget. Unlike BFS a settled node can "
    "IMPROVE at a later hop (two popular edges can undercut one rare "
    "direct edge), which is why the whole table relaxes each round "
    "instead of an anti-joined frontier. Integer weights end-to-end; "
    "the oracle enumerates all <= 3-edge paths with a recursive CTE "
    "and MINs the cost — two constructions, one answer. Reaches the "
    "same node set as parts_copurchase_bfs_3hop by construction.",
)
def q_parts_copurchase_cheapest_3hop(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from .operators.graph import bounded_bellman_ford
    from .queries_round8 import _copurchase_edges

    li = load_table(spark, sf_dir, "lineitem")
    seeds = (
        li.where(F.col("l_partkey") % BFS_SEED_MOD == 0)
        .select(F.col("l_partkey").alias("node"))
        .distinct()
    )
    wedges = (
        _copurchase_edges(spark, sf_dir)
        .groupBy("src", "dst")
        .agg(F.count("*").alias("cnt"))
        .select(
            "src",
            "dst",
            (F.lit(1) + F.expr("10000 DIV cnt")).cast("long").alias("w"),
        )
    )
    return bounded_bellman_ford(
        wedges, seeds, max_hops=BFS_HOPS
    ).select(
        F.col("node").alias("part_id"),
        F.col("cost").cast("long").alias("cost"),
    )


# ---------------------------------------------------------------------------
# KMV under a REAL streaming query — the MV entry above lands partials
# with batch writes to prove the fold algebra; this one drives the
# actual writeStream.foreachBatch machinery (availableNow replay,
# checkpointed micro-batches) into the same sink layout, compacts, and
# serves — the full "distinct users per key, maintained by a stream,
# intersectable later" deployment shape.
# ---------------------------------------------------------------------------


@register(
    "streaming_kmv_foreachbatch",
    _kmv_distinct_oracle(),
    doc="KMV bottom-k sketches maintained by a REAL Structured "
    "Streaming query: the events replay runs through writeStream."
    "foreachBatch (availableNow, checkpointed), each micro-batch "
    "reduced to its <= k-rows-per-key partial INSIDE the batch "
    "callback (the corpus-scale work happens at ingest, the sink "
    "stores sketch-sized state), then a compaction min-k-folds the "
    "landed partials and the estimates are served from the folded "
    "sketch. Min-k idempotence is what makes foreachBatch's "
    "at-least-once replay contract EXACT here — a replayed batch "
    "re-lands the same hashes. Oracle is the one-pass KMV SQL: "
    "stream-built == one-shot is the end-to-end guarantee.",
)
def q_streaming_kmv_foreachbatch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from .operators import sketches as S
    from .streaming.windows import replay_events_stream

    path = tempfile.mkdtemp(prefix="kmvfeb_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_kmvfeb_")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        S.write_kmv_partial(
            batch_df, path, batch_id, "event_type", "user_id"
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
        S.compact_kmv(spark, path)
        sk = S.read_kmv(spark, path).localCheckpoint(eager=True)
        return _kmv_stats_with_truth(spark, sf_dir, sk)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(path, ignore_errors=True)


# ---------------------------------------------------------------------------
# The keep_ppm knob as a REGISTERED operating point (the DOULION-p10
# precedent): the gated build drops 4 of 5 hashes BEFORE the distinct
# exchange, and the fixed-threshold estimator scales undersized
# sketches back up by the inverse keep rate. Profiled beside the
# ungated entry so the shuffle cut is a measured fact.
# ---------------------------------------------------------------------------

KMV_GATE_PPM = 200_000  # keep h < 0.2 * 2^48


@register(
    "events_user_kmv_distinct_gated",
    _kmv_distinct_oracle(KMV_GATE_PPM),
    doc="The KMV build under a keep_ppm = 200000 pre-filter gate — the "
    "100 TB operating point registered as its own entry (the "
    "DOULION-p10 precedent): only hashes below 0.2*2^48 reach the "
    "distinct exchange, cutting its volume 5x (profiled beside the "
    "ungated entry in SHUFFLE_PROFILE). The estimator is the "
    "fixed-threshold theta form: >= k survivors -> the usual "
    "(k-1)*2^48 DIV h_(k) (identical to ungated whenever the gate is "
    "lossless, test-pinned); < k survivors -> size*2^48 DIV gate "
    "(scale up by the inverse keep rate — at tiny scales this trades "
    "exactness for the bounded exchange, visible in the carried "
    "true_distinct column). Same hs_sum content checksum through the "
    "gate.",
)
def q_events_user_kmv_distinct_gated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators import sketches as S

    ev = load_table(spark, sf_dir, "events")
    sk = S.kmv_sketch(ev, "event_type", "user_id", keep_ppm=KMV_GATE_PPM)
    return _kmv_stats_with_truth(spark, sf_dir, sk, keep_ppm=KMV_GATE_PPM)


# ---------------------------------------------------------------------------
# Source-overlap matrix from KMV sketches over SHINGLE sets — the
# dataset-overlap question ("how much of source A's content appears in
# source B?") answered from k·8-byte sketches instead of a corpus-scale
# gram self-join: per-source bottom-64 over 8-gram hashes, then the
# same theta-sketch pair operator as the user-set entry. This is the
# canonical Datasketches use case, and the sketch build is the ONLY
# corpus-scale pass.
# ---------------------------------------------------------------------------

SRC_KMV_N = 8  # gram width, matching the contamination gates


def _src_kmv_oracle() -> str:
    from .operators import sketches as S

    k, full, n = S.KMV_K, S.KMV_FULL, SRC_KMV_N
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
r AS (SELECT key, h,
             row_number() OVER (PARTITION BY key ORDER BY h) AS rn
      FROM hh),
bk AS (SELECT key, h, rn FROM r WHERE rn <= {k}),
st AS (SELECT key,
              CAST(COUNT(*) AS BIGINT) AS kmv_size,
              CAST(CASE WHEN COUNT(*) < {k} THEN {full}
                   ELSE MAX(CASE WHEN rn = {k} THEN h END)
                   END AS BIGINT) AS theta
       FROM bk GROUP BY key),
est AS (SELECT key, kmv_size, theta,
               CAST(CASE WHEN kmv_size < {k} THEN kmv_size
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
    "source_shingle_kmv_overlap",
    _src_kmv_oracle(),
    doc=f"Pairwise CONTENT overlap between corpus sources from KMV "
    f"bottom-{64} sketches over {SRC_KMV_N}-gram shingle sets — "
    "'how much of source A appears in source B' (the datacard / "
    "licensing / contamination triage question) answered from "
    "k*8-byte state per source: theta-sketch intersection over shared "
    "hashes below theta_min, union by inclusion-exclusion, Jaccard in "
    "ppm. The sketch build is the only corpus-scale pass (one shingle "
    "explode + one distinct); the pair math touches sketch-sized data "
    "only. Same operator as the user-set entry applied to a different "
    "keyed set — the point of making set-ops a primitive.",
)
def q_source_shingle_kmv_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from .operators import sketches as S
    from .operators.dedup import shingles

    docs = _docs(spark, sf_dir)
    grams = docs.select(
        F.col("source").alias("key"),
        F.explode(shingles("text", SRC_KMV_N)).alias("g"),
    )
    # keep_ppm pinned to the oracle's ungated build (r11 ADVICE #1);
    # the gated operating point is source_shingle_kmv_overlap_gated
    sk = S.kmv_sketch(grams, "key", "g", keep_ppm=None)
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
# Sliding-window distinct users from HLL REGISTER ALGEBRA — the
# composition dividend of mergeable sketches over TIME: per-hour
# register grids are built once (the only corpus-scale pass), and ANY
# window is the MAX-fold of its member hours' grids — distinct-users
# per 3-hour sliding window here, but the same O(hours x m) state
# answers any window width without rescanning events (the classic
# "sliding HyperLogLog" construction).
# ---------------------------------------------------------------------------

HLL_WIN_HOURS = 3


def _hll_sliding_oracle() -> str:
    from .operators import sketches as S

    m, wbits, win = S.HLL_M, S.HLL_W, HLL_WIN_HOURS
    pw = 1 << wbits
    lc = S._hll_lc_table(m)
    lc_list = "[" + ", ".join(str(x) for x in lc) + "]"
    return f"""
WITH e AS (SELECT date_trunc('hour', ts) AS hr,
                  CAST(user_id AS VARCHAR) AS v
           FROM events),
r AS (
    SELECT hr,
           CAST('0x' || substr(md5('hll:r:' || v), 1, 8) AS BIGINT) % {m}
               AS j,
           CAST('0x' || substr(md5('hll:v:' || v), 1, 8) AS BIGINT) % {pw}
               AS w
    FROM e
),
g AS (SELECT hr, j,
             MAX(CASE WHEN w = 0 THEN {wbits + 1}
                 ELSE {wbits + 1} - length(bin(w)) END) AS mx
      FROM r GROUP BY hr, j),
hours AS (SELECT DISTINCT hr FROM e),
fan AS (SELECT g.hr + to_hours(i.i) AS tgt, g.j, g.mx
        FROM g, (SELECT unnest(range(0, {win})) AS i) i),
g2 AS (SELECT f.tgt, f.j, MAX(f.mx) AS mx
       FROM fan f JOIN hours h ON f.tgt = h.hr GROUP BY 1, 2),
k AS (SELECT tgt,
             CAST({m} - COUNT(*) AS BIGINT) AS n_zero_registers,
             CAST(SUM(CAST(pow(2, {wbits} - mx) AS BIGINT))
                  + ({m} - COUNT(*)) * {pw} AS BIGINT) AS s24
      FROM g2 GROUP BY tgt),
est AS (SELECT tgt, n_zero_registers, s24,
               CAST({S.HLL_ALPHA_NUM} AS BIGINT) * {m * m} * {pw}
                   // ({S.HLL_ALPHA_DEN} * s24) AS hll_raw_est
        FROM k),
du AS (SELECT DISTINCT date_trunc('hour', ts) AS hr, user_id FROM events),
tfan AS (SELECT du.hr + to_hours(i.i) AS tgt, du.user_id
         FROM du, (SELECT unnest(range(0, {win})) AS i) i),
tru AS (SELECT f.tgt, CAST(COUNT(DISTINCT f.user_id) AS BIGINT)
                   AS true_distinct
        FROM tfan f JOIN hours h ON f.tgt = h.hr GROUP BY f.tgt)
SELECT est.tgt AS window_end_hour, est.n_zero_registers, est.s24,
       CAST(est.hll_raw_est AS BIGINT) AS hll_raw_est,
       CAST(CASE WHEN est.hll_raw_est <= {int(2.5 * m)}
                  AND est.n_zero_registers > 0
            THEN {lc_list}[est.n_zero_registers]
            ELSE est.hll_raw_est END AS BIGINT) AS est,
       tru.true_distinct
FROM est JOIN tru ON est.tgt = tru.tgt
"""


@register(
    "events_sliding_hll_windows",
    _hll_sliding_oracle(),
    doc=f"Distinct users per {HLL_WIN_HOURS}-hour SLIDING window from "
    "HLL register ALGEBRA: per-hour register grids are built in the "
    "one corpus-scale pass, and each window is the MAX-fold of its "
    "member hours' grids (register union == set union) — the classic "
    "sliding-HyperLogLog construction. O(hours x m) state answers any "
    "window width; events are never rescanned per window. The "
    "window fold is the same bounded fan-out shape as the EWMA entry "
    "(hour grid -> <= 3 target windows, map-side-combinable MAX). "
    "Small windows exercise the linear-counting branch through the "
    "shared precomputed table; true_distinct carried per window for "
    "the accuracy property.",
)
def q_events_sliding_hll_windows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from .operators import sketches as S

    ev = load_table(spark, sf_dir, "events")
    hr = F.date_trunc("hour", F.col("ts")).alias("hr")
    grid = S.hll_registers(
        ev.select(hr, "user_id"), "hr", "user_id"
    ).withColumnsRenamed({"key": "hr"})
    hours = ev.select(hr).distinct()
    off = F.explode(F.sequence(F.lit(0), F.lit(HLL_WIN_HOURS - 1))).alias(
        "i"
    )
    fan = grid.select("hr", "j", "mx", off).select(
        F.expr("hr + make_interval(0, 0, 0, 0, i, 0, 0)").alias("tgt"),
        "j",
        "mx",
    )
    g2 = (
        fan.join(hours.withColumnsRenamed({"hr": "tgt"}), "tgt")
        .groupBy("tgt", "j")
        .agg(F.max("mx").alias("mx"))
        .withColumnsRenamed({"tgt": "key"})
    )
    est = S.hll_estimate(g2)
    du = ev.select(hr, "user_id").distinct()
    tfan = du.select("hr", "user_id", off).select(
        F.expr("hr + make_interval(0, 0, 0, 0, i, 0, 0)").alias("tgt"),
        "user_id",
    )
    tru = (
        tfan.join(hours.withColumnsRenamed({"hr": "tgt"}), "tgt")
        .groupBy("tgt")
        .agg(F.countDistinct("user_id").alias("true_distinct"))
    )
    return est.join(tru, est.key == tru.tgt).select(
        F.col("key").alias("window_end_hour"),
        "n_zero_registers",
        "s24",
        "hll_raw_est",
        "est",
        "true_distinct",
    )


# ---------------------------------------------------------------------------
# CDF query from the quantile sketch — the inverse direction
# (value -> rank) from the SAME state the quantile entries serve
# (rank -> value): per-document percentile brackets against the
# sketched corpus distribution, at scan cost (one bounded cell-array
# broadcast + two folds per row; no sort, no self-join). This is score
# NORMALIZATION — "what percentile is this doc in the reference
# distribution" — the other half of what a percentile service does.
# ---------------------------------------------------------------------------


def _cdf_oracle(m: int) -> str:
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
WITH v AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS val FROM documents),
b AS (SELECT doc_id, val, {bucket} AS bucket FROM v),
s AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM b GROUP BY bucket),
c AS (SELECT bucket, cnt,
             CAST(SUM(cnt) OVER (ORDER BY bucket) - cnt AS BIGINT)
                 AS below,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n
      FROM s)
SELECT b.doc_id, b.val AS n_chars,
       CAST(c.below * 1000000 // c.n AS BIGINT) AS rank_lo_ppm,
       CAST((c.below + c.cnt) * 1000000 // c.n AS BIGINT) AS rank_hi_ppm
FROM b JOIN c ON b.bucket = c.bucket
"""


@register(
    "doc_length_cdf_from_sketch",
    _cdf_oracle(QSK_M),
    doc="Per-document percentile BRACKET of document length against "
    "the sketched corpus distribution — the quantile sketch queried in "
    "the INVERSE direction (value -> rank): rank_lo counts strictly "
    "lower buckets, rank_hi adds the value's own bucket (within-bucket "
    "position is the histogram's honest uncertainty, <= bucket mass "
    "<= ~1/m of the octave). One bounded cell-array broadcast + two "
    "integer folds per row — score normalization at scan cost, no "
    "sort, no self-join, same state table the quantile/rank entries "
    "already serve. Oracle joins each doc's bucket to the grid's "
    "running cumulative.",
)
def q_doc_length_cdf_from_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .operators import quantiles as Q

    docs = _docs(spark, sf_dir)
    sk = Q.quantile_sketch_build(docs, "n_chars", QSK_M)
    return Q.quantile_sketch_cdf(
        sk, docs.select("doc_id", "n_chars"), "n_chars", QSK_M
    ).select("doc_id", "n_chars", "rank_lo_ppm", "rank_hi_ppm")


# ---------------------------------------------------------------------------
# Distribution drift as a KS distance between two SKETCHES — the
# monitoring query ("did this source's length distribution move vs the
# rest of the corpus?") answered from two bounded grids: no rescans,
# no sorts, integer CDFs in ppm, drift evaluated at bucket boundaries
# (a lower bound with <= one-bucket-mass resolution — the histogram's
# honest precision). Complements source_token_drift (exact TV distance
# over the vocabulary) with the bounded-state twin over a NUMERIC
# axis.
# ---------------------------------------------------------------------------


def _ks_oracle(m: int) -> str:
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
WITH v AS (SELECT CAST(n_chars AS BIGINT) AS val,
                  source = (SELECT MIN(source) FROM documents) AS is_a
           FROM documents),
b AS (SELECT {bucket} AS bucket, is_a FROM v),
s AS (SELECT bucket,
             CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT)
                 AS cnt_a,
             CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT)
                 AS cnt_b
      FROM b GROUP BY bucket),
c AS (SELECT bucket,
             SUM(cnt_a) OVER (ORDER BY bucket) AS cum_a,
             SUM(cnt_b) OVER (ORDER BY bucket) AS cum_b,
             SUM(cnt_a) OVER () AS n_a,
             SUM(cnt_b) OVER () AS n_b
      FROM s),
d AS (SELECT bucket, CAST(n_a AS BIGINT) AS n_a,
             CAST(n_b AS BIGINT) AS n_b,
             ABS(cum_a * CAST(1000000 AS BIGINT) // n_a
                 - cum_b * CAST(1000000 AS BIGINT) // n_b) AS diff_ppm
      FROM c)
SELECT n_a, n_b, CAST(diff_ppm AS BIGINT) AS ks_ppm,
       CAST(bucket AS BIGINT) AS at_bucket
FROM d ORDER BY diff_ppm DESC, bucket ASC LIMIT 1
"""


@register(
    "corpus_length_drift_ks_sketch",
    _ks_oracle(QSK_M),
    doc="Kolmogorov-Smirnov drift between the min-named source's "
    "document-length distribution and the rest of the corpus, computed "
    "ENTIRELY from two quantile-sketch grids: full-outer cell join, "
    "integer ppm CDFs, max |CDF_a - CDF_b| at bucket boundaries (a "
    "lower bound on true KS with <= one-bucket-mass resolution — the "
    "histogram's honest precision), deterministic min-bucket "
    "tie-break. This is the drift-alarm shape a 100 TB pipeline runs "
    "hourly: both populations live as bounded mergeable state, the "
    "comparison is grid-sized, and NO data is rescanned. Batch twin "
    "of source_token_drift's exact TV distance, over a numeric axis.",
)
def q_corpus_length_drift_ks_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from .operators import quantiles as Q

    docs = _docs(spark, sf_dir)
    msrc = docs.agg(F.min("source").alias("min_src"))
    flagged = docs.crossJoin(F.broadcast(msrc)).withColumn(
        "is_a", F.col("source") == F.col("min_src")
    )
    sk_a = Q.quantile_sketch_build(
        flagged.where(F.col("is_a")), "n_chars", QSK_M
    )
    sk_b = Q.quantile_sketch_build(
        flagged.where(~F.col("is_a")), "n_chars", QSK_M
    )
    return Q.quantile_sketch_ks(sk_a, sk_b, QSK_M)


# ---------------------------------------------------------------------------
# Day-over-day user retention/churn from KMV set algebra — the product
# metric ("how many of yesterday's users came back, how many are new")
# answered from per-day sketches: retained = theta intersection of
# adjacent days, churned = prev − retained, new = curr − retained. The
# pair arithmetic runs PER ROW over the two <= k-element arrays
# (operators/sketches.py kmv_adjacent_overlap — no explode, no second
# shuffle), so serving any window pairing is sketch-sized work.
# ---------------------------------------------------------------------------


def _kmv_churn_oracle() -> str:
    from .operators import sketches as S

    k, full = S.KMV_K, S.KMV_FULL
    return f"""
WITH e AS (SELECT date_trunc('day', ts) AS d,
                  CAST(user_id AS VARCHAR) AS v
           FROM events),
hh AS (SELECT DISTINCT d,
              CAST('0x' || substr(md5('kmv:' || v), 1, 12) AS BIGINT) AS h
       FROM e),
r AS (SELECT d, h, row_number() OVER (PARTITION BY d ORDER BY h) AS rn
      FROM hh),
bk AS (SELECT d, h, rn FROM r WHERE rn <= {k}),
st AS (SELECT d,
              CAST(COUNT(*) AS BIGINT) AS sz,
              CAST(CASE WHEN COUNT(*) < {k} THEN {full}
                   ELSE MAX(CASE WHEN rn = {k} THEN h END)
                   END AS BIGINT) AS theta,
              CAST(CASE WHEN COUNT(*) < {k} THEN COUNT(*)
                   ELSE {(k - 1) * full}
                        // MAX(CASE WHEN rn = {k} THEN h END)
                   END AS BIGINT) AS est
       FROM bk GROUP BY d),
pair AS (SELECT a.d AS day_prev, b.d AS day_curr,
                a.theta AS ta, b.theta AS tb,
                a.est AS est_prev, b.est AS est_curr
         FROM st a JOIN st b ON b.d = a.d + INTERVAL 1 DAY),
m AS (SELECT p.day_prev, p.day_curr, p.est_prev, p.est_curr,
             LEAST(p.ta, p.tb) AS theta_min,
             CAST(COUNT(CASE WHEN x.h <= LEAST(p.ta, p.tb)
                        THEN 1 END) AS BIGINT) AS n_match
      FROM pair p
      LEFT JOIN (SELECT a.d, a.h FROM bk a JOIN bk b
                   ON a.h = b.h AND b.d = a.d + INTERVAL 1 DAY) x
        ON x.d = p.day_prev
      GROUP BY 1, 2, 3, 4, 5),
f AS (SELECT day_prev, day_curr, est_prev, est_curr,
             CAST(CASE WHEN theta_min >= {full} THEN n_match
                  ELSE n_match * {full} // theta_min
                  END AS BIGINT) AS est_retained
      FROM m),
du AS (SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events),
tru AS (SELECT a.d AS day_prev,
               CAST(COUNT(*) AS BIGINT) AS true_retained
        FROM du a JOIN du b
          ON a.user_id = b.user_id AND b.d = a.d + INTERVAL 1 DAY
        GROUP BY 1)
SELECT CAST(f.day_prev AS TIMESTAMP) AS day_prev,
       CAST(f.day_curr AS TIMESTAMP) AS day_curr,
       f.est_prev, f.est_curr, f.est_retained,
       CAST(GREATEST(f.est_prev - f.est_retained, 0) AS BIGINT)
           AS est_churned,
       CAST(GREATEST(f.est_curr - f.est_retained, 0) AS BIGINT)
           AS est_new,
       COALESCE(t.true_retained, 0) AS true_retained
FROM f LEFT JOIN tru t ON f.day_prev = t.day_prev
"""


@register(
    "events_user_churn_kmv",
    _kmv_churn_oracle(),
    doc="Day-over-day user retention/churn/new-user estimates from KMV "
    "set algebra: one bottom-64 sketch per day (the only corpus-scale "
    "pass), adjacent days paired by timestamp arithmetic, and "
    "retained = theta intersection / churned = prev - retained / new "
    "= curr - retained computed PER ROW over the two bounded arrays — "
    "no explode, no second shuffle; serving any window pairing is "
    "sketch-sized work. Estimates clamp at 0 (estimation error can "
    "push a difference negative); true_retained carried per pair for "
    "the accuracy property. This is the retention dashboard served "
    "from the same per-day sketches the distinct-count entries "
    "maintain — one state table, three product metrics.",
)
def q_events_user_churn_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .operators import sketches as S

    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("d")
    # keep_ppm pinned to the oracle's ungated build (r11 ADVICE #1)
    sk = S.kmv_sketch(
        ev.select(day, "user_id"), "d", "user_id", keep_ppm=None
    ).select(
        F.col("key").alias("d"), "hs", "gate"
    )
    a = sk.select(
        F.col("d").alias("day_prev"),
        F.col("hs").alias("hs_a"),
        F.col("gate").alias("gate_a"),
    )
    b = sk.select(
        F.expr("d - make_interval(0, 0, 0, 1, 0, 0, 0)").alias("day_prev"),
        F.col("d").alias("day_curr"),
        F.col("hs").alias("hs_b"),
        F.col("gate").alias("gate_b"),
    )
    paired = a.join(b, "day_prev")
    est = S.kmv_adjacent_overlap(
        paired, gate_a_col="gate_a", gate_b_col="gate_b"
    ).select(
        "day_prev",
        "day_curr",
        F.col("est_a").alias("est_prev"),
        F.col("est_b").alias("est_curr"),
        F.col("est_inter").alias("est_retained"),
        F.greatest(
            F.col("est_a") - F.col("est_inter"), F.lit(0).cast("long")
        ).alias("est_churned"),
        F.greatest(
            F.col("est_b") - F.col("est_inter"), F.lit(0).cast("long")
        ).alias("est_new"),
    )
    du = ev.select(day, "user_id").distinct()
    ua = du.select(F.col("d").alias("day_prev"), "user_id")
    ub = du.select(
        F.expr("d - make_interval(0, 0, 0, 1, 0, 0, 0)").alias("day_prev"),
        "user_id",
    )
    tru = (
        ua.join(ub, ["day_prev", "user_id"])
        .groupBy("day_prev")
        .agg(F.count("*").alias("true_retained"))
    )
    return est.join(tru, "day_prev", "left").select(
        "day_prev",
        "day_curr",
        "est_prev",
        "est_curr",
        "est_retained",
        "est_churned",
        "est_new",
        F.coalesce("true_retained", F.lit(0)).cast("long").alias(
            "true_retained"
        ),
    )
