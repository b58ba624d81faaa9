"""Unit tests: text analysis, dedup, similarity, multimodal operators."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from projet_etl_a_rien_spark.operators import dedup, multimodal, similarity, text


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


DOCS = [
    (1, "the fast cat sat on the mat", "en", "s1", 27),
    (2, "the fast cat sat on the mat", "en", "s1", 27),  # exact dup of 1
    (3, "the fast cat sat on a mat", "en", "s1", 25),  # near dup
    (4, "completely different words here entirely", "en", "s1", 40),
    (5, "el la de que hola mundo", "es", "s2", 23),
]


def test_token_stats(spark):
    df = _docs(spark, DOCS)
    row = df.select(
        text.token_count("text").alias("n"),
        text.unique_token_count("text").alias("u"),
    ).collect()[0]
    assert row.n == 7 and row.u == 6  # 'the' twice


def test_fingerprint_canonicalization(spark):
    df = spark.createDataFrame(
        [(1, "The  Fast   Cat"), (2, "the fast cat"), (3, " THE FAST CAT  ")],
        "doc_id long, text string",
    )
    fps = df.select(text.fingerprint("text").alias("fp")).collect()
    assert len({r.fp for r in fps}) == 1


def test_lang_id_markers(spark):
    df = _docs(spark, DOCS)
    got = {r.doc_id: r.pred_lang for r in text.lang_id(df).collect()}
    assert got[1] == "en"
    assert got[5] == "es"  # el/la/que outnumber fr's le/la/de... tie rules
    assert got[4] == "und"


def test_exact_dedup(spark):
    df = _docs(spark, DOCS)
    clusters = dedup.exact_dup_clusters(df).collect()
    assert len(clusters) == 1
    assert clusters[0].n_docs == 2 and clusters[0].keeper_id == 1
    keepers = dedup.dedup_exact(df)
    assert keepers.count() == 4
    assert 2 not in {r.doc_id for r in keepers.collect()}


def test_shingles_short_text_guard(spark):
    df = spark.createDataFrame([(1, "one two"), (2, "a b c d")], "id long, text string")
    out = df.select(dedup.shingles("text", 3).alias("sh")).collect()
    assert out[0].sh == []
    assert out[1].sh == ["a b c", "b c d"]


def test_minhash_near_dup_pairs(spark):
    df = _docs(spark, DOCS)
    pairs = dedup.minhash_near_dup_pairs(df, threshold=0.99).collect()
    # exact dup pair (1,2) must be caught: identical shingle sets → identical
    # signatures → same buckets → J=1.0
    assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}
    loose = dedup.minhash_near_dup_pairs(df, threshold=0.3).collect()
    assert {(p.id_a, p.id_b) for p in loose} >= {(1, 2)}


def test_ngram_jaccard_pairs(spark):
    df = _docs(spark, DOCS)
    pairs = {
        (p.id_a, p.id_b): p.jacc
        for p in dedup.ngram_jaccard_pairs(df, threshold=0.1).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0 < pairs[(1, 3)] < 1
    assert (1, 4) not in pairs  # no shared shingles


def test_simhash_identical_and_different(spark):
    df = _docs(spark, DOCS)
    pairs = dedup.simhash_near_dup_pairs(df, max_hamming=0).collect()
    assert {(p.id_a, p.id_b) for p in pairs} >= {(1, 2)}


def _vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),
        (2, [0.0, 1.0, 0.0], 0),
        (3, [1.0, 0.05, 0.0], 1),  # same direction as 0 but other label
        (4, [-1.0, 0.0, 0.0], 0),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_cosine_topk(spark):
    df = _vectors(spark)
    top = similarity.cosine_topk(df, query_id=0, k=2).collect()
    assert [r.vec_id for r in top] == [3, 1]
    assert top[0].cos_sim == pytest.approx(1 / math.sqrt(1 + 0.05**2), abs=1e-6)


def test_cosine_topk_partition_pruned(spark):
    df = _vectors(spark)
    top = similarity.cosine_topk_partition_pruned(df, query_id=0, k=2).collect()
    # label pruning excludes vec 3 despite higher cosine
    assert [r.vec_id for r in top] == [1, 2]


def test_embedding_near_dup_pairs(spark):
    df = _vectors(spark)
    pairs = {
        (p.id_a, p.id_b)
        for p in similarity.embedding_near_dup_pairs(df, threshold=0.95).collect()
    }
    assert pairs == {(0, 1)}  # (0,3) blocked by label; (0,4) anti-parallel


def test_winnow_shared_substring_guarantee(spark):
    # two docs sharing a >= k+w-1 char substring must share a fingerprint;
    # an unrelated doc shares none with either
    rows = [
        (1, "aaaa the quick brown fox jumped over zzzz"),
        (2, "bbbb the quick brown fox jumped over yyyy"),
        (3, "entirely different content with no overlap"),
        (4, "short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {
        r.doc_id: set(r.f)
        for r in text.winnow_fingerprints(df, out_col="f").collect()
    }
    assert fps[1] & fps[2]
    assert not (fps[1] & fps[3])
    assert fps[4] == set()  # shorter than k+w-1 -> empty


def test_salted_join_matches_plain_join(spark):
    from projet_etl_a_rien_spark.operators.joins import salted_join

    left = spark.createDataFrame([(1, "x"), (1, "y"), (2, "z"), (3, "w")], "k long, v string")
    right = spark.createDataFrame([(1, 10), (2, 20)], "rk long, p long")
    got = sorted(
        (r.k, r.v, r.p) for r in salted_join(left, right, "k", "rk", n_salt=4).collect()
    )
    exp = sorted(
        (r.k, r.v, r.p)
        for r in left.join(right, left.k == right.rk).collect()
    )
    assert got == exp


def test_kmeans_assign_separates_directions(spark):
    df = _vectors(spark)
    got = {r.vec_id: r.cluster for r in similarity.kmeans_assign(df, k=2, iters=2).collect()}
    assert set(got) == {0, 1, 2, 3, 4}
    assert all(0 <= c < 2 for c in got.values())
    # colinear vectors land together; the anti-parallel one lands elsewhere
    assert got[0] == got[3]
    assert got[0] != got[4]


def test_multimodal_byte_features(spark):
    df = _docs(spark, DOCS)
    feats = {
        r.doc_id: r
        for r in multimodal.byte_features(multimodal.with_binary_payload(df)).collect()
    }
    assert feats[1].byte_len == 27
    assert feats[1].head_byte == ord("t") and feats[1].tail_byte == ord("t")


def test_decode_stub_gates(spark):
    df = multimodal.with_binary_payload(_docs(spark, DOCS))
    with pytest.raises(NotImplementedError):
        multimodal.decode_payloads(df, "image", "doc_id long, width int")
    multimodal.register_decoder("fake", lambda b: {"width": len(b) % 7, "height": 2})
    out = multimodal.decode_payloads(
        df, "fake", "doc_id bigint, width bigint, height bigint"
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].width == 27 % 7 and rows[1].height == 2


def test_minhash_scales_with_dup_density(spark, sf_dir):
    """Pathological near-dup density (every doc × 10 copies) must not blow
    up the banded construction: candidate volume is rows × bands, and the
    exact-copy pairs all verify at jaccard 1.0. (At sf0.1 the 10× corpus
    with 250k true pairs ran in 1.1× the 1× corpus's wall-clock.)"""
    from pyspark.sql import functions as F

    from projet_etl_a_rien_spark.operators import dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = d.count()
    big = d
    for i in range(1, 10):
        big = big.unionByName(d.withColumn("doc_id", F.col("doc_id") + 1_000_000 * i))
    pairs = dedup.minhash_near_dup_pairs(big)
    # every 10-copy group contributes C(10,2)=45 exact pairs at jacc 1.0
    exact = pairs.where(F.col("jacc") == 1.0).count()
    assert exact >= 45 * d.where(
        F.size(dedup.shingles("text", 3)) > 0
    ).count()
    assert pairs.count() >= exact


def test_connected_components_transitive_chain(spark):
    """A~B~C~D chain + isolated pair: min-label propagation must converge
    to one component per chain regardless of emission order."""
    from projet_etl_a_rien_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(3, 4), (1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    got = {
        (r.node, r.comp) for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}
