"""String-similarity joins: edit-distance pairs via PassJoin-style
pigeonhole segment blocking.

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
start loses no true pair; the exact levenshtein verify then removes
false candidates. Property-pinned in tests/test_edit_join.py against
the all-pairs join over random edited corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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


def edit_distance_pairs(
    df: DataFrame,
    d: int = 1,
    str_col: str = "name",
    id_col: str = "id",
) -> DataFrame:
    """All pairs (id_a < id_b) whose ``str_col`` values are within
    Levenshtein distance ``d`` — EXACTLY the all-pairs join's output,
    via PassJoin segment blocking (see module docstring).

    Plan shape: the index side emits d+1 (length, seg, piece) rows per
    string; the probe side emits at most (d+1)(2d+1)^2 rows per string
    (every target length within +-d, every segment, every +-d position
    shift). Candidates come from ONE equality join on those keys; the
    verify is one ``levenshtein`` per distinct candidate pair. At 100 TB
    the exchange carries short segment pieces, never the cross product —
    candidate volume is sum over (length, seg, piece) keys of
    index_count * probe_count, i.e. proportional to actual piece
    collisions. Skewed pieces (a common token prefix) inflate only
    their own key's bucket and AQE skew-split applies; the verify stays
    exact so hot keys cost time, never correctness.
    """
    k = d + 1
    s = df.select(
        F.col(id_col).alias("id"),
        F.col(str_col).alias("v"),
        F.length(str_col).alias("n"),
    )
    idx_parts = []
    for i in range(k):
        st, ln = _seg_bounds(F.col("n"), i, k)
        idx_parts.append(
            s.select(
                F.col("id").alias("id_t"),
                F.col("v").alias("v_t"),
                F.col("n").alias("l"),
                F.lit(i).alias("seg"),
                F.substring(F.col("v"), (st + 1).cast("int"), ln.cast("int")).alias(
                    "piece"
                ),
            )
        )
    index = idx_parts[0]
    for p in idx_parts[1:]:
        index = index.unionByName(p)

    probe_parts = []
    for i in range(k):
        for dl in range(-d, d + 1):
            l = F.col("n") + dl  # candidate target length
            st, ln = _seg_bounds(l, i, k)
            for delta in range(-d, d + 1):
                sp = st + delta
                probe_parts.append(
                    s.where((l >= 0) & (sp >= 0) & (sp + ln <= F.col("n")))
                    .select(
                        F.col("id").alias("id_s"),
                        F.col("v").alias("v_s"),
                        l.alias("l"),
                        F.lit(i).alias("seg"),
                        F.substring(
                            F.col("v"), (sp + 1).cast("int"), ln.cast("int")
                        ).alias("piece"),
                    )
                )
    probe = probe_parts[0]
    for p in probe_parts[1:]:
        probe = probe.unionByName(p)

    cand = (
        probe.join(index, ["l", "seg", "piece"])
        .where(F.col("id_s") != F.col("id_t"))
        .select(
            F.least("id_s", "id_t").alias("id_a"),
            F.greatest("id_s", "id_t").alias("id_b"),
            F.when(F.col("id_s") < F.col("id_t"), F.col("v_s"))
            .otherwise(F.col("v_t"))
            .alias("v_a"),
            F.when(F.col("id_s") < F.col("id_t"), F.col("v_t"))
            .otherwise(F.col("v_s"))
            .alias("v_b"),
        )
        .distinct()
    )
    return (
        cand.select(
            "id_a",
            "id_b",
            F.levenshtein("v_a", "v_b").cast("long").alias("dist"),
        )
        .where(F.col("dist") <= d)
    )
