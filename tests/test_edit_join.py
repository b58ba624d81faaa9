"""PassJoin edit-distance join (operators/strings.py): losslessness vs
the all-pairs levenshtein join, property-tested over random corpora with
planted edits (substitutions, insertions, deletions) so the pigeonhole
segment blocking is exercised on every edit type and on length-changing
edits specifically."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from projet_etl_a_rien_spark.operators.strings import edit_distance_pairs


def _brute(rows: list[tuple[int, str]], d: int) -> set[tuple[int, int]]:
    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    return {
        (ia, ib)
        for ia, va in rows
        for ib, vb in rows
        if ia < ib and lev(va, vb) <= d
    }


def _edited_corpus(rng: random.Random, n: int, alpha: str) -> list[tuple[int, str]]:
    """Base strings plus mutated copies: one substitution, one insertion,
    one deletion each — plenty of true pairs at d=1 and d=2."""
    rows = []
    for i in range(n):
        base = "".join(rng.choice(alpha) for _ in range(rng.randint(3, 10)))
        rows.append((4 * i, base))
        p = rng.randrange(len(base))
        rows.append((4 * i + 1, base[:p] + rng.choice(alpha) + base[p + 1 :]))
        rows.append((4 * i + 2, base[:p] + rng.choice(alpha) + base[p:]))
        rows.append((4 * i + 3, base[:p] + base[p + 1 :]))
    return rows


@pytest.mark.parametrize("seed,d", [(1, 1), (2, 1), (3, 2), (4, 2)])
def test_lossless_vs_all_pairs(spark, seed, d):
    rng = random.Random(seed)
    rows = _edited_corpus(rng, 18, "ab")  # tiny alphabet → piece collisions too
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r["id_a"], r["id_b"])
        for r in edit_distance_pairs(df, d=d, str_col="name", id_col="id").collect()
    }
    assert got == _brute(rows, d)


@pytest.mark.parametrize("splits", [2, 7])
def test_compute_splits_identical_pairs(spark, splits):
    """compute_splits only respreads the candidate and verify work — the
    emitted pair set must equal the unsplit run's (which equals brute
    force by the test above)."""
    rng = random.Random(11)
    rows = _edited_corpus(rng, 15, "ab")
    df = spark.createDataFrame(rows, "id long, name string")
    base = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_pairs(df, d=1, str_col="name", id_col="id").collect()
    }
    salted = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_pairs(
            df, d=1, str_col="name", id_col="id", compute_splits=splits
        ).collect()
    }
    assert salted == base


def test_distances_exact_and_oriented(spark):
    rows = [(1, "kitten"), (2, "sitten"), (3, "sittin"), (4, "mittens")]
    out = edit_distance_pairs(
        spark.createDataFrame(rows, "id long, name string"), d=2
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in out}
    assert got == _dict_brute(rows, 2)
    assert {(1, 2): 1, (1, 3): 2, (2, 3): 1}.items() <= got.items()
    assert all(a < b for a, b in got)


def test_edge_shapes(spark):
    # empty strings, strings shorter than d+1 segments, exact duplicates
    rows = [(1, ""), (2, "a"), (3, "a"), (4, "ab"), (5, "xyz")]
    out = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_pairs(
            spark.createDataFrame(rows, "id long, name string"), d=1
        ).collect()
    }
    assert out == _dict_brute(rows, 1)


def _dict_brute(rows, d):
    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    return {
        (ia, ib): lev(va, vb)
        for ia, va in rows
        for ib, vb in rows
        if ia < ib and lev(va, vb) <= d
    }


def test_no_cartesian_in_plan(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "abd")], "id long, name string")
    plan = edit_distance_pairs(df, d=1)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
