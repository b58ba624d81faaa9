"""Connected components — near-dup cluster formation.

Pair-finding (MinHash LSH, SimHash, embedding LSH) emits EDGES; dedup
needs COMPONENTS: if A~B and B~C, one keeper must survive for {A,B,C}
even though A~C was never emitted. Component id = min reachable doc id,
computed by iterative min-label propagation:

    label⁰(v) = v
    labelⁱ⁺¹(v) = min(labelⁱ(v), min over neighbors u of labelⁱ(u))

Each iteration is one shuffle (edge join + groupBy-min); the driver loop
stops when an iteration changes nothing. Convergence takes O(component
diameter) rounds — near-dup clusters are shallow (dozens of docs linked
through shared shingles), so this runs in a handful of rounds; the
large-diameter general case is what the alternating large-star/small-star
algorithm (Kiveris et al.) optimizes, and this API is the drop-in seam
for it. Per-round ``localCheckpoint(eager=True)`` + a count action is the
iterative-algorithm pattern MLlib itself uses: the checkpoint both caches
the round's labels AND truncates lineage. Plain ``persist`` is not enough
here — ``labels`` feeds two joins per round, so the analyzed plan doubles
every iteration and a deep component (diameter ≳ 10) blows the driver heap
at analysis time long before any executor touches data. The only data
reaching the driver is the changed-label count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min
    node id reachable. Deterministic for any edge order.

    Raises ``RuntimeError`` if labels are still changing when ``max_iter``
    is exhausted (component diameter > max_iter): silently returning
    partially-converged labels would let a dedup caller keep several
    "survivors" from one real cluster. Raise ``max_iter`` or switch to a
    large-star/small-star variant for such graphs.
    """
    und = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionByName(
            edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
        )
        .distinct()
        .persist()
    )
    labels = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint(eager=True)
    )
    changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und.v == labels.node)
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("comp").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))).alias(
                    "comp"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    und.unpersist()
    if changed > 0:
        raise RuntimeError(
            f"connected_components: {changed} labels still changing after "
            f"max_iter={max_iter} rounds (component diameter exceeds the "
            "iteration budget); raise max_iter."
        )
    return labels
