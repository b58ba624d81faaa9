"""Embedding similarity search over ``array<float>`` columns.

Vector math is pure higher-order-function column algebra (zip_with +
aggregate) — JVM-side, codegen'd, no Python in the loop. Doubles
throughout (cast from float32 at the edge) so results are deterministic
and oracle-comparable.

Three tiers, matching how ANN is actually scaled:

1. **brute-force top-k** — exact baseline; one pass, no shuffle beyond
   the final top-k (Spark's TakeOrderedAndProject keeps only k rows per
   partition, so the cost is the scan, not a sort).
2. **partition-pruned (IVF-style) top-k** — search only the query's
   coarse cluster. Here the fixture's ``label`` column plays the
   centroid-assignment role; at scale the assignment comes from k-means
   and the table is partitioned/bucketed by it, so the scan prunes to
   1/n_lists of the data before any distance math.
3. **near-dup pairs** — all pairs above a cosine threshold within a
   blocking key (label): the embedding-space analogue of blocked n-gram
   Jaccard; the unblocked case belongs to LSH (random hyperplanes), same
   join shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential dot product: sum-left-to-right of pairwise products —
    the same accumulation order a scalar SQL loop uses, so cross-engine
    comparable to ~1 ulp per element."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against the row with ``id_col == query_id``.

    The query vector is a 1-row broadcast cross join — no shuffle of the
    big side; the top-k is a TakeOrderedAndProject (k rows per partition
    → k global), not a full sort. Deterministic tie-break on id.
    """
    q = df.where(F.col(id_col) == query_id).select(
        as_double(vec_col).alias("qvec")
    )
    base = df.where(F.col(id_col) != query_id).select(
        F.col(id_col), as_double(vec_col).alias("vec")
    )
    sim = base.crossJoin(F.broadcast(q)).select(
        id_col, F.round(cosine(F.col("vec"), F.col("qvec")), 6).alias("cos_sim")
    )
    return sim.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def cosine_topk_partition_pruned(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: restrict the scan to the query's coarse cluster.

    ``list_col`` is the inverted-list assignment (fixture: ``label``; at
    scale: argmin-centroid from k-means, with the table partitioned by
    it so the restriction is partition pruning, not a filter).
    """
    q = df.where(F.col(id_col) == query_id).select(
        as_double(vec_col).alias("qvec"), F.col(list_col).alias("qlist")
    )
    base = df.where(F.col(id_col) != query_id).select(
        F.col(id_col), F.col(list_col), as_double(vec_col).alias("vec")
    )
    sim = (
        base.join(F.broadcast(q), F.col(list_col) == F.col("qlist"))
        .select(
            id_col,
            F.round(cosine(F.col("vec"), F.col("qvec")), 6).alias("cos_sim"),
        )
    )
    return sim.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> DataFrame:
    """All pairs with cosine >= threshold within a blocking key."""
    base = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id"),
        as_double(vec_col).alias("vec"),
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
            F.round(cosine(F.col("l.vec"), F.col("r.vec")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
