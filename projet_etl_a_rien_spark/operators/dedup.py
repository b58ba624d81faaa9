"""Deduplication operators: exact, MinHash+LSH, n-gram Jaccard, SimHash.

The dedup family a training-data pipeline needs, each expressed as a
declarative DataFrame lineage (no Python in the hot path):

- **exact**: md5-fingerprint groupBy — one shuffle on the fingerprint,
  scales to any size.
- **MinHash + LSH banding**: the 100 TB near-dup path. Signatures are
  per-row array math (k independent min-hashes over the shingle set);
  banding turns O(n²) pair comparison into equality joins on
  (band, bucket) — only same-bucket candidates are verified with true
  Jaccard. Hashes are md5 *hex strings* compared lexicographically:
  deterministic, seedable, and identically computable by any engine
  (the DuckDB oracle runs the same construction), unlike engine-private
  xxhash64.
- **n-gram Jaccard (exact, blocked)**: inverted-index self-join within a
  blocking key — the exact baseline LSH approximates; quadratic within a
  block, so blocks must be bounded (here: ``source``).
- **SimHash**: 64-bit bitwise fingerprint via per-token hash sign sums;
  Hamming-adjacent docs are near-dups.

At 100 TB: minhash shuffle volume is (docs × bands) rows of (bucket,
doc_id) — independent of document length; skewed buckets (boilerplate
shingles) are handled because verification re-filters by true Jaccard,
so a hot bucket only costs time, never correctness. AQE skew-join
splitting covers the join itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, tokens


# ---------------------------------------------------------------- exact ----


def exact_dup_clusters(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Fingerprint clusters with >1 member: (fingerprint, n_docs, keeper_id)."""
    return (
        df.groupBy(fingerprint(text_col).alias("fingerprint"))
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keeper_id"))
        .where(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id document per fingerprint (deterministic keeper)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(fingerprint(text_col)).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


# -------------------------------------------------------------- shingles ----


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a space-tokenized text column.

    Guarded for texts shorter than n tokens (→ empty array): Spark's
    ``sequence(0, negative)`` would otherwise count *down*.
    """
    toks = tokens(col)
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _seeded_md5(seed: int):
    # single-arg lambda factory: PySpark lambda binding counts defaulted
    # params, so ``lambda s, j=j:`` would bind the array index to j.
    return lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s))


def minhash_signature(col: Column | str, k: int = 16) -> Column:
    """k-element MinHash signature: per seed j, min over shingles of
    md5('j:' + shingle). Hex-string lexicographic min — engine-portable."""
    sh = col if isinstance(col, Column) else F.col(col)
    return F.array(
        *[F.array_min(F.transform(sh, _seeded_md5(j))) for j in range(k)]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash → LSH banding → candidate join → exact-Jaccard verify.

    Returns (id_a, id_b, jacc) with id_a < id_b and jacc >= threshold.
    rows-per-doc shuffled = ``bands``; candidate pairs are only those
    agreeing on a full band (width k/bands), then verified exactly so the
    result is a *superset-free* filter of true near-dups reachable by the
    banding (standard LSH recall semantics).
    """
    rows = k // bands
    # ``base`` feeds the signature AND both sides of the verify join — three
    # consumers of the tokenize→shingle→distinct lineage. Persist it so the
    # shingle sets are computed once per run, not three times (at 100 TB the
    # recompute would be three full corpus re-tokenizations). The cache is
    # released by Spark's ContextCleaner when the returned plan is GC'd.
    #
    # Round-robin repartition of the RAW docs (before the shingle select!)
    # to the session's parallelism: the source is often a handful of parquet
    # files, and without the spread the shingle + k-md5-per-shingle hot loop
    # runs on however few partitions the scan produced. Measured at sf0.1
    # (local[32]): 11.7 s → 5.8 s. User-specified repartition counts are
    # preserved by AQE.
    par = df.sparkSession.sparkContext.defaultParallelism
    base = (
        df.repartition(par)
        .select(F.col(id_col).alias("id"), shingles(text_col, shingle_n).alias("sh"))
        .where(F.size("sh") > 0)
        .persist()
    )
    sig = base.select("id", minhash_signature(F.col("sh"), k).alias("sig"))

    # Shuffle only (id, band, bucket) — never the shingle arrays. The
    # verify step re-joins the (narrow) candidate pairs back to the
    # shingle sets; at scale this keeps band-join shuffle volume
    # independent of document length.
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws("|", *[F.col("sig")[b * rows + r] for r in range(rows)])
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        cand.join(a, F.col("id_a") == F.col("a.id"))
        .join(b, F.col("id_b") == F.col("b.id"))
        .select(
            "id_a", "id_b", jaccard(F.col("a.sh"), F.col("b.sh")).alias("jacc")
        )
        .where(F.col("jacc") >= threshold)
    )


# ------------------------------------------------------ exact ngram pairs ----


def ngram_jaccard_pairs(
    df: DataFrame,
    block_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram-set Jaccard for all pairs within a blocking key.

    Inverted-index formulation: explode distinct n-gram shingles,
    self-join on (block, shingle) to count intersections, then
    |A∪B| = |A|+|B|-|A∩B|. Quadratic *within a block only* — the block
    bounds the join fan-out, which is what makes the exact variant
    runnable at scale (MinHash LSH covers the unblocked case). Pairs
    sharing no shingle never materialize (their Jaccard is 0).
    """
    # ``toks`` is consumed three times (both join sides + sizes). The raw
    # docs are round-robin repartitioned BEFORE the explode so the shingle
    # hot loop spreads across cores, and the repartition exchange is reused
    # by all three consumers (ReusedExchange) — measured faster at sf0.1
    # than persisting the exploded token table (2.6 s vs 3.6 s vs 4.2 s
    # unrepartitioned), because caching 4M exploded rows costs more than
    # recomputing the post-exchange explode 32-way.
    par = df.sparkSession.sparkContext.defaultParallelism
    toks = df.repartition(par).select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id"),
        F.explode(shingles(text_col, shingle_n)).alias("token"),
    )
    sizes = toks.groupBy("blk", "id").agg(F.count("*").alias("sz"))

    l, r = toks.alias("l"), toks.alias("r")
    inter = (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.token") == F.col("r.token"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .groupBy(
            F.col("l.blk").alias("blk"),
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    i, sa, sb = inter.alias("i"), sizes.alias("sa"), sizes.alias("sb")
    out = (
        i.join(
            sa,
            (F.col("i.blk") == F.col("sa.blk")) & (F.col("i.id_a") == F.col("sa.id")),
        )
        .join(
            sb,
            (F.col("i.blk") == F.col("sb.blk")) & (F.col("i.id_b") == F.col("sb.id")),
        )
        .select(
            "i.id_a",
            "i.id_b",
            (
                F.col("i.n_common")
                / (F.col("sa.sz") + F.col("sb.sz") - F.col("i.n_common"))
            ).alias("jacc"),
        )
        .where(F.col("jacc") >= threshold)
    )
    return out


# ---------------------------------------------------------------- simhash ----


def simhash64(col: Column | str) -> Column:
    """64-bit SimHash over distinct tokens (xxhash64 token hashes).

    For each bit b: sum over tokens of ±1 by bit value; fingerprint bit =
    sign of the sum. Pure column math via higher-order functions; uses
    engine-native xxhash64, so near-dup detection is in-engine only (no
    cross-engine oracle — the driver records a rows-only check).
    """
    toks = F.array_distinct(tokens(col))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_vote(b: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for b in range(64):
        votes = F.aggregate(hashes, F.lit(0), bit_vote(b))
        if b < 63:
            out = out + F.when(votes > 0, F.lit(1 << b).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        else:  # sign bit: long min, added as the negative two's-complement term
            out = out + F.when(votes > 0, F.lit(-(1 << 63)).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
    return out


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    block_col: str | None = "source",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance within a block.

    The scale path replaces blocking with the standard rotate-and-sort
    multi-index; here block-join + bit_count keeps it declarative.
    """
    base = df.select(
        F.col(block_col).alias("blk") if block_col else F.lit(0).alias("blk"),
        F.col(id_col).alias("id"),
        simhash64(text_col).alias("sh"),
    )
    l, r = base.alias("l"), base.alias("r")
    return (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk")) & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
