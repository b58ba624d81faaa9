"""String-similarity joins: edit-distance pairs via PassJoin-style
pigeonhole segment blocking, with a second blocking level that collapses
hot pieces (shared constant prefixes/suffixes).

Reference parity: the reference engine has no string-similarity join;
this is part of the training-data-pipeline surface (entity resolution /
fuzzy record linkage) built Spark-first: candidate generation is an
EQUALITY join on (target-length, segment-index, piece) keys — no
cross join, no UDFs — and the verify is the built-in ``levenshtein``.

Losslessness (the PassJoin lemma, Li et al., ICDE 2011): partition t
into d+1 contiguous segments; any s with ed(s, t) <= d contains at
least one segment verbatim (pigeonhole — d edits cannot touch all d+1
segments), and the untouched segment's position in s is shifted by at
most d (each edit shifts later positions by <= 1). So probing every
substring of s with the segment's length within +-d of its nominal
start loses no true pair; the exact levenshtein verify removes false
candidates.

Hot pieces: ID-like corpora ("Customer#000000042") make one segment a
CONSTANT — its (length, seg, piece) key collects every string and the
one-level join degenerates to the cross product. The fix is recursive
blocking: for a candidate matched on segment ``seg`` at probe position
``sp``, delete the matched characters from both strings; under the
alignment that matches the segment verbatim, all <= d edits lie in the
complements, so ed(complement_s, complement_t) <= d and the SAME lemma
applies one level down, scoped by a hash of the hot-key chain (``grp``).
One level is not enough — after deleting "Customer#…" the digit tails
share the "000000" zero-padding and the next first-segment is constant
again — so the recursion continues until ``max_depth``, each level
halving (at d=1) the strings until only the discriminating characters
remain. Lossless by induction: at every level a true pair's verbatim
segment key is either cold (pair emitted) or hot (both members routed
to the next level with complements still within d). Property-pinned
(including constant-prefix corpora) in tests/test_edit_join.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import resolve_splits


def _seg_bounds(n: Column, i: int, k: int) -> tuple[Column, Column]:
    """(start, length) of 0-based segment ``i`` of a length-``n`` string
    split into ``k`` even segments (first ``n % k`` segments one longer
    — the standard even partition, identical integer math on any
    engine)."""
    base = F.floor(n / F.lit(k)).cast("int")
    rem = (n % k).cast("int")
    start = F.lit(i) * base + F.least(F.lit(i), rem)
    length = base + F.when(F.lit(i) < rem, 1).otherwise(0)
    return start, length


def _index_rows(s: DataFrame, d: int, keep: list[str]) -> DataFrame:
    """One (l, seg, piece, st, ln) row per segment per string of ``s``
    (columns: ``v`` string, ``n`` its length, plus ``keep``).

    Generated as ONE explode over an array of d+1 segment structs — not
    a union of per-segment selects. A union form makes the logical plan
    d+1 leaves here and (d+1)(2d+1)^2 leaves on the probe side; nesting
    level 2 on top of that overflowed Catalyst's constraint propagation
    (UnionBase.validConstraints recursion) at d=2. The explode form is a
    single scan regardless of d."""
    k = d + 1
    structs = []
    for i in range(k):
        st, ln = _seg_bounds(F.col("n"), i, k)
        structs.append(
            F.struct(
                F.col("n").cast("int").alias("l"),
                F.lit(i).alias("seg"),
                st.cast("int").alias("st"),
                ln.cast("int").alias("ln"),
            )
        )
    return s.select(
        *keep, "v", F.explode(F.array(*structs)).alias("e")
    ).select(
        *keep,
        F.col("e.l").alias("l"),
        F.col("e.seg").alias("seg"),
        F.substring(F.col("v"), F.col("e.st") + F.lit(1), F.col("e.ln")).alias(
            "piece"
        ),
        F.col("e.st").alias("st"),
        F.col("e.ln").alias("ln"),
    )


def _probe_rows(s: DataFrame, d: int, keep: list[str]) -> DataFrame:
    """All (l, seg, piece, sp, ln) substring probes of ``s``: every
    target length l within +-d of own length, every segment, every +-d
    start shift — at most (d+1)(2d+1)^2 rows per string, one explode
    (see _index_rows for why not a union). ``array_distinct`` collapses
    (i, dl, delta) combinations that land on the same probe before the
    explode ever widens the data."""
    k = d + 1
    structs = []
    for i in range(k):
        for dl in range(-d, d + 1):
            l = F.col("n") + dl
            st, ln = _seg_bounds(l, i, k)
            for delta in range(-d, d + 1):
                sp = st + delta
                structs.append(
                    F.struct(
                        l.cast("int").alias("l"),
                        F.lit(i).alias("seg"),
                        sp.cast("int").alias("sp"),
                        ln.cast("int").alias("ln"),
                    )
                )
    return (
        s.select(
            *keep,
            "v",
            F.col("n"),
            F.explode(F.array_distinct(F.array(*structs))).alias("e"),
        )
        .where(
            (F.col("e.l") >= 0)
            & (F.col("e.sp") >= 0)
            & (F.col("e.sp") + F.col("e.ln") <= F.col("n"))
        )
        .select(
            *keep,
            F.col("e.l").alias("l"),
            F.col("e.seg").alias("seg"),
            F.substring(F.col("v"), F.col("e.sp") + F.lit(1), F.col("e.ln")).alias(
                "piece"
            ),
            F.col("e.sp").alias("sp"),
            F.col("e.ln").alias("ln"),
        )
    )


def _drop_slice(v: Column, start: Column, length: Column) -> Column:
    """``v`` with characters [start, start+length) removed (0-based)."""
    return F.concat(
        F.substring(v, 1, start.cast("int")),
        F.substring(v, (start + length + 1).cast("int"), F.lit(1 << 24)),
    )


_KEYS = ["grp", "l", "seg", "piece"]


def _cands(
    si: DataFrame,
    sp: DataFrame,
    d: int,
    thr: int,
    depth: int,
    cached: list[DataFrame],
) -> DataFrame:
    """Candidate (id_s, id_t) pairs for one blocking level. ``si`` /
    ``sp`` carry (grp, id_t|id_s, v, n); ``grp`` scopes each bucket to
    the chain of hot keys that routed its members here. Keys whose
    index bucket exceeds ``thr`` recurse (depth permitting) on the
    complement strings with ``grp`` extended by the key's hash — a
    hash collision can only MERGE two buckets (extra candidates for
    the exact verify), never separate a true pair."""
    idx = _index_rows(si, d, ["grp", "id_t", "v"]).persist()
    prb = _probe_rows(sp, d, ["grp", "id_s", "v"]).persist()
    cached += [idx, prb]
    idx_k = idx.select(*_KEYS, "id_t")
    prb_k = prb.select(*_KEYS, "id_s")
    if depth <= 0:
        # terminal level: no hot diversion — pay the residual buckets
        # (complements shrink ~(k-1)/k per level, so what is still hot
        # here is a pile of near-identical short tails = true-match
        # volume, not blocking failure)
        return (
            prb_k.join(idx_k, _KEYS)
            .where(F.col("id_s") != F.col("id_t"))
            .select("id_s", "id_t")
        )

    freq = idx.groupBy(*_KEYS).agg(F.count("*").alias("c"))
    hot = freq.where(F.col("c") > thr).select(*_KEYS)
    # hot keys are by definition few (each holds > thr strings, so there
    # are < |S| * (d+1) / thr of them) — broadcast both splits
    cold_idx = idx_k.join(F.broadcast(hot), _KEYS, "left_anti")
    cold = (
        prb_k.join(cold_idx, _KEYS)
        .where(F.col("id_s") != F.col("id_t"))
        .select("id_s", "id_t")
    )
    # recurse: delete the matched characters from both sides; under the
    # alignment that matches the segment verbatim all <= d edits lie in
    # the complements, so the same lemma applies one level down. A probe
    # string can reach one grp through two different (sp, ln) matches —
    # each occurrence keeps its own complement row (v rides along), so
    # both alignments stay live.
    nxt = F.xxhash64(*_KEYS).alias("grp")
    ih = (
        idx.join(F.broadcast(hot), _KEYS, "left_semi")
        .select(nxt, "id_t", _drop_slice(F.col("v"), F.col("st"), F.col("ln")).alias("v"))
        .withColumn("n", F.length("v"))
    )
    ph = (
        prb.join(F.broadcast(hot), _KEYS, "left_semi")
        .select(nxt, "id_s", _drop_slice(F.col("v"), F.col("sp"), F.col("ln")).alias("v"))
        .withColumn("n", F.length("v"))
    )
    return cold.unionByName(_cands(ih, ph, d, thr, depth - 1, cached))


def _cands_fastss_d1(
    s: DataFrame, cached: list[DataFrame], compute_splits: int | None = None
) -> DataFrame:
    """Candidate pairs for d=1 via the deletion-neighborhood join
    (FastSS, Bocek et al. 2007): emit xxhash64 digests of the string
    itself and of every single-character deletion — n+1 keys per string
    — and self-join on the digest. Complete for d=1: a substitution at
    i makes del(s,i) = del(t,i); an insertion makes the shorter string
    itself a deletion variant of the longer. Far tighter blocking than
    segment pieces: two strings share a variant only if they are within
    edit distance 2 of each other, so candidate volume is bounded by
    the NEAR-MATCH volume — an ID-like corpus never builds a
    corpus-sized bucket. Exchange payload is (id, 8-byte digest); the
    variant strings themselves never leave the map side.

    The digest is INTERNAL blocking state, never oracled (the
    registered entries' oracles are the all-pairs levenshtein
    definition), so r14 swapped md5 (hex-string output, ~40-byte rows
    across the exchange, MessageDigest per variant) for xxhash64 (one
    long, guide §2.3 narrower-types + §4 cheaper per-row work). A hash
    collision can only ADD a candidate pair, and every candidate passes
    the exact levenshtein verify — output identical by construction.
    """
    variants = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.col("n")),
            lambda i: F.xxhash64(
                F.when(i == 0, F.col("v")).otherwise(
                    F.concat(
                        F.substring(F.col("v"), 1, (i - 1).cast("int")),
                        F.substring(F.col("v"), (i + 1).cast("int"), F.lit(1 << 24)),
                    )
                )
            ),
        )
    )
    rows = s.select("id", F.explode(variants).alias("dg"))
    if compute_splits is not None and compute_splits > 1:
        # hash-partition on the join key with an EXPLICIT width: the
        # digest self-join then reuses this partitioning (no further
        # exchange), and AQE's byte-based coalescing — which would lump
        # the compute-heavy join of a small-bytes corpus into one task —
        # leaves user-specified repartitions alone (same trap as
        # similarity.ann_knn_join's compute_splits; see SCALE_NOTES r5)
        rows = rows.repartition(compute_splits, "dg")
    rows = rows.persist()
    cached.append(rows)
    return (
        rows.select(F.col("id").alias("id_s"), "dg")
        .join(rows.select(F.col("id").alias("id_t"), "dg"), "dg")
        .where(F.col("id_s") != F.col("id_t"))
        .select("id_s", "id_t")
    )


def edit_distance_pairs(
    df: DataFrame,
    d: int = 1,
    str_col: str = "name",
    id_col: str = "id",
    hot_threshold: int = 64,
    max_depth: int = 3,
    compute_splits: int | str | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) whose ``str_col`` values are within
    Levenshtein distance ``d`` — EXACTLY the all-pairs join's output,
    via recursive PassJoin segment blocking (see module docstring).

    Plan shape: the index side emits d+1 (l, seg, piece) rows per
    string, the probe side at most (d+1)(2d+1)^2; candidates come from
    ONE equality join on those keys per level. Pieces whose index
    bucket exceeds ``hot_threshold`` recurse on the complement strings
    (matched characters deleted from both sides) up to ``max_depth``
    levels, so an ID-like corpus ("Customer#000000042" — constant
    prefix, then constant zero-padding) is subdivided again and again
    by exactly the characters that can still differ. Candidates travel
    as id pairs through ``distinct``; full strings are re-joined only
    for the final exact ``levenshtein`` verify. At 100 TB every
    exchange is an equality shuffle on short piece keys (complement
    strings ride only the hot slice, which shrinks geometrically);
    whatever is still hot at the terminal depth is near-identical
    short tails — true-match volume, not blocking failure.
    """
    compute_splits = resolve_splits(df, compute_splits)
    s = df.select(
        F.col(id_col).alias("id"),
        F.col(str_col).alias("v"),
        F.length(str_col).alias("n"),
    ).persist()
    cached: list[DataFrame] = [s]
    if d == 1:
        # d=1 fast path: deletion-neighborhood join (see _cands_fastss_d1)
        cand = _cands_fastss_d1(s, cached, compute_splits)
    else:
        cand = _cands(
            s.select(
                F.lit(0).cast("long").alias("grp"), F.col("id").alias("id_t"), "v", "n"
            ),
            s.select(
                F.lit(0).cast("long").alias("grp"), F.col("id").alias("id_s"), "v", "n"
            ),
            d,
            hot_threshold,
            max_depth,
            cached,
        )
    cand = cand.select(
        F.least("id_s", "id_t").alias("id_a"),
        F.greatest("id_s", "id_t").alias("id_b"),
    ).distinct()
    if compute_splits is not None and compute_splits > 1:
        # the exact-levenshtein verify is quadratic per pair but tiny in
        # bytes — spread it the same way (id_a join reuses this layout)
        cand = cand.repartition(compute_splits, "id_a")
    out = (
        cand.join(s.select(F.col("id").alias("id_a"), F.col("v").alias("v_a")), "id_a")
        .join(s.select(F.col("id").alias("id_b"), F.col("v").alias("v_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("v_a", "v_b").cast("long").alias("dist"),
        )
        .where(F.col("dist") <= d)
        .localCheckpoint(eager=True)
    )
    for c in cached:
        c.unpersist()
    return out
