"""Round-4 batch 4: concat-and-chunk sequence packing and exact n-gram
contamination — both property-checked against brute-force Python
reimplementations of their specs."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from projet_etl_a_rien_spark.operators.dedup import ngram_contamination
from projet_etl_a_rien_spark.operators.text import pack_training_sequences


def _brute_pack(rows, L, salt="pack:"):
    """rows: (id, text). Literal spec: order by (md5(salt+id), id),
    concat token stream, chunk at L, one span per (doc, bin)."""
    docs = [
        (hashlib.md5(f"{salt}{i}".encode()).hexdigest(), i, len(t.split(" ")))
        for i, t in rows
        if len(t.split(" ")) > 0 and t != ""
    ]
    docs.sort()
    out, off = set(), 0
    for _, i, n in docs:
        for b in range(off // L, (off + n - 1) // L + 1):
            sid = max(0, b * L - off)
            out.add(
                (i, b, sid, max(0, off - b * L), min(n, (b + 1) * L - off) - sid)
            )
        off += n
    return out


def test_pack_sequences_matches_spec(spark):
    rows = [
        (i, " ".join(f"w{i}t{j}" for j in range(3 + (i * 7) % 40)))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id"], r["bin"], r["start_in_doc"], r["start_in_bin"], r["n_tok"])
        for r in pack_training_sequences(df, seq_len=16).collect()
    }
    assert got == _brute_pack(rows, 16)


def test_pack_sequences_conservation(spark):
    # every token placed exactly once; bins dense 0..max and exactly full
    # except possibly the last
    rows = [(i, " ".join("x" * 3 for _ in range(5 + i % 11))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_training_sequences(df, seq_len=32)
    per_doc = {r["id"]: r["tot"] for r in out.groupBy("id").agg(F.sum("n_tok").alias("tot")).collect()}
    assert per_doc == {i: 5 + i % 11 for i in range(40)}
    bins = {r["bin"]: r["tot"] for r in out.groupBy("bin").agg(F.sum("n_tok").alias("tot")).collect()}
    last = max(bins)
    assert set(bins) == set(range(last + 1))
    assert all(bins[b] == 32 for b in range(last))
    assert 0 < bins[last] <= 32


def test_ngram_contamination_exact(spark):
    mk = lambda *ws: " ".join(ws)
    a = mk(*[f"a{i}" for i in range(6)])  # 3 distinct 4-grams
    b = mk(*[f"b{i}" for i in range(6)])
    train = spark.createDataFrame(
        [(1, a), (2, b), (3, mk("z", *[f"a{i}" for i in range(4)]))],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(10, a), (11, a + " extra")], "doc_id long, text string"
    )
    got = {
        r["id"]: (r["n_hit_ngrams"], r["n_bench_docs"])
        for r in ngram_contamination(train, bench, n=4).collect()
    }
    # doc 1 shares all 3 of its 4-grams with both bench docs; doc 3
    # shares exactly one (a0..a3); doc 2 shares none
    assert got == {1: (3, 2), 3: (1, 2)}


def test_token_drift_zero_for_identical_sources(spark):
    # two sources with identical token distributions → TV = 0 for both
    text = "alpha beta gamma delta alpha beta"
    df = spark.createDataFrame(
        [(1, text, "s1"), (2, text, "s2")], "doc_id long, text string, source string"
    )
    from projet_etl_a_rien_spark.operators.text import token_drift_by_source

    out = {r["source"]: r["tv_drift"] for r in token_drift_by_source(df).collect()}
    assert out == {"s1": 0.0, "s2": 0.0}


def test_token_drift_disjoint_sources(spark):
    # disjoint vocabularies → each source's TV vs the mixed corpus is
    # 1 - (its own mass share); with equal halves that's 0.5
    a = " ".join(f"a{i}" for i in range(8))
    b = " ".join(f"b{i}" for i in range(8))
    df = spark.createDataFrame(
        [(1, a, "sa"), (2, b, "sb")], "doc_id long, text string, source string"
    )
    from projet_etl_a_rien_spark.operators.text import token_drift_by_source

    out = {r["source"]: r["tv_drift"] for r in token_drift_by_source(df).collect()}
    assert abs(out["sa"] - 0.5) < 1e-9 and abs(out["sb"] - 0.5) < 1e-9


def test_ivf_incremental_ingest_frozen_centroids(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from projet_etl_a_rien_spark.operators import similarity

    sink = str(tmp_path / "ivf")
    vecs = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(4)]) for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    b1, b2 = df.where(F.col("vec_id") < 20), df.where(F.col("vec_id") >= 20)

    out1 = similarity.ivf_incremental_ingest(b1, sink, k=3, iters=2)
    assert out1.count() == 20
    cents_before = sorted(
        tuple(r.m) for r in spark.read.parquet(f"{sink}/centroids").collect()
    )
    out2 = similarity.ivf_incremental_ingest(b2, sink, k=3, iters=2)
    assert out2.count() == 40
    cents_after = sorted(
        tuple(r.m) for r in spark.read.parquet(f"{sink}/centroids").collect()
    )
    assert cents_before == cents_after  # no refit on ingest
    # batch-2 rows equal a frozen-centroid assignment done directly
    centroids = [
        list(r.m)
        for r in sorted(
            spark.read.parquet(f"{sink}/centroids").collect(),
            key=lambda r: r.cluster,
        )
    ]
    q2 = b2.select(
        F.col("vec_id").alias("id"), similarity.quantize("embedding").alias("q")
    )
    direct = {
        (r["id"], r["cluster"])
        for r in similarity._assign(q2, centroids).collect()
    }
    got2 = {
        (r["vec_id"], r["cluster"])
        for r in out2.where(F.col("vec_id") >= 20).collect()
    }
    assert got2 == direct

    # half-written sink (assignments without centroids) fails loudly
    import shutil

    shutil.rmtree(f"{sink}/centroids")
    with pytest.raises(RuntimeError, match="half-written"):
        similarity.ivf_incremental_ingest(b2, sink, k=3, iters=2)
