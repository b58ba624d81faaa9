"""Round-6 operator tests: inverted index, PMI collocations, DSIR
importance weights, and the BPE merge learner (property-tested against
a pure-Python reference — it is the registry's one oracle-less batch
entry, so this test IS its correctness gate)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from projet_etl_a_rien_spark.catalog import load_table
from projet_etl_a_rien_spark.operators import bpe, retrieval, selection


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------- BPE ----


def _ref_bpe(texts: list[str], num_merges: int, min_pair_count: int = 2):
    """Pure-Python word-level BPE with the exact tie-break contract of
    ``bpe.learn_bpe_merges``: pair count desc, then (left, right) tuple
    order (struct ordering is field-lexicographic)."""
    from collections import Counter

    words = Counter(w for t in texts for w in t.split(" ") if w != "")
    seqs = {w: list(w) + [bpe.END] for w in words}
    merges = []
    for rank in range(1, num_merges + 1):
        counts: Counter = Counter()
        for w, syms in seqs.items():
            c = words[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), n = best
        if n < min_pair_count:
            break
        merges.append((rank, left, right, n))
        for w, syms in seqs.items():
            out, pend = [], None
            for s in syms:
                if pend == left and s == right:
                    out.append(left + right)
                    pend = None
                else:
                    if pend is not None:
                        out.append(pend)
                    pend = s
            if pend is not None:
                out.append(pend)
            seqs[w] = out
    return merges


def test_bpe_matches_reference_on_documents(spark, sf_dir):
    texts = [r.text for r in _docs(spark, sf_dir).select("text").collect()]
    want = _ref_bpe(texts, num_merges=8)
    got = bpe.learn_bpe_merges(_docs(spark, sf_dir), num_merges=8)
    assert got == want


@pytest.mark.parametrize("seed", [1, 7])
def test_bpe_matches_reference_random_corpus(spark, seed):
    """Randomized corpora with repeated/overlapping letters exercise the
    greedy non-overlap fold ('aaa' under (a,a) → ['aa','a'])."""
    import random

    rng = random.Random(seed)
    alpha = "abc"
    texts = [
        " ".join(
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(40)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    want = _ref_bpe(texts, num_merges=12)
    got = bpe.learn_bpe_merges(df, num_merges=12)
    assert got == want


def test_bpe_greedy_fold_overlap_semantics(spark):
    """The F.aggregate rewrite is greedy left-to-right non-overlapping:
    'aaa' + END under merge (a,a) → ['aa', 'a', END]."""
    df = spark.createDataFrame([(1, "aaa")], "doc_id long, text string")
    out = (
        bpe.word_symbol_table(df)
        .select(bpe._apply_merge(F.col("syms"), "a", "a").alias("s"))
        .collect()
    )
    assert out[0]["s"] == ["aa", "a", bpe.END]


# ----------------------------------------------------- inverted index ----


def test_inverted_index_positions_and_idf(spark):
    df = spark.createDataFrame(
        [(1, "x y x"), (2, "y z"), (3, "z z z")],
        "doc_id long, text string",
    )
    rows = {
        (r.token, r.doc_id): r
        for r in retrieval.inverted_index(df).collect()
    }
    assert set(rows) == {("x", 1), ("y", 1), ("y", 2), ("z", 2), ("z", 3)}
    x1 = rows[("x", 1)]
    assert (x1.tf, x1.first_pos, x1.last_pos, x1.df_docs, x1.cf) == (2, 1, 3, 1, 2)
    z3 = rows[("z", 3)]
    assert (z3.tf, z3.first_pos, z3.last_pos, z3.df_docs, z3.cf) == (3, 1, 3, 2, 4)
    # smoothed idf = round-to-nano ln((N+1)/(df+1)), N = 3 docs
    assert z3.idf == pytest.approx(math.log(4 / 3), abs=1e-8)
    assert x1.idf == pytest.approx(math.log(4 / 2), abs=1e-8)
    # postings count equals distinct (token, doc) pairs; cf sums to corpus size
    assert sum(r.tf for r in rows.values()) == 8


# -------------------------------------------------------------- PMI ----


def test_pmi_collocation_ranks_true_pair_first(spark):
    # 'new york' always adjacent; fillers independent → PMI must rank it top
    rows = [(i, "new york " + " ".join(["f%d" % (i % 3)] * 3)) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = retrieval.pmi_collocations(df, min_count=5, top_k=3).collect()
    assert (got[0].t1, got[0].t2) == ("new", "york")
    assert got[0].c_xy == 12
    # hand-check the PMI value: c_xy=12, n_bi=48, c_new=c_york=12, n_uni=60
    want = math.log((12 / 48) / ((12 / 60) * (12 / 60)))
    assert got[0].pmi == pytest.approx(want, abs=1e-8)


def test_pmi_min_count_suppresses_hapax(spark):
    df = spark.createDataFrame(
        [(1, "rare pair"), (2, "a b a b a b a b a b")],
        "doc_id long, text string",
    )
    got = retrieval.pmi_collocations(df, min_count=5, top_k=10).collect()
    assert all((r.t1, r.t2) != ("rare", "pair") for r in got)
    assert any((r.t1, r.t2) == ("a", "b") for r in got)


# ------------------------------------------------------------- DSIR ----


def test_dsir_weights_tilt_toward_target(spark):
    # target docs use a disjoint vocabulary; raw-only docs must score
    # strictly lower than target-like docs
    rows = [(i, "good clean prose tokens here", "tgt") for i in range(10)]
    rows += [(100 + i, "spam junk noise garbage blob", "raw") for i in range(10)]
    rows += [(200, "good clean prose tokens here", "raw")]  # target-LIKE raw doc
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    w = {
        r.doc_id: r.logweight
        for r in selection.dsir_logweights(
            df, F.col("source") == "tgt", n_buckets=64
        ).collect()
    }
    assert len(w) == 21
    # the target-like raw doc scores like the target docs, above every spam doc
    assert w[200] == w[0]
    assert min(w[i] for i in range(10)) > max(w[100 + i] for i in range(10))


def test_dsir_weight_value_matches_hand_formula(spark):
    df = spark.createDataFrame(
        [(1, "a a b", "tgt"), (2, "b b b", "raw")],
        "doc_id long, text string, source string",
    )
    B = 16
    w = {
        r.doc_id: r.logweight
        for r in selection.dsir_logweights(
            df, F.col("source") == "tgt", n_buckets=B
        ).collect()
    }

    def bucket(tok):
        import hashlib

        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % B

    ba, bb = bucket("a"), bucket("b")
    cnt_raw = {ba: 2, bb: 4}
    cnt_tgt = {ba: 2, bb: 1}
    tot_raw, tot_tgt = 6, 3

    def llr(b):
        val = math.log((cnt_tgt.get(b, 0) + 1) / (tot_tgt + B)) - math.log(
            (cnt_raw.get(b, 0) + 1) / (tot_raw + B)
        )
        return round(val * 1e9) / 1e9

    assert w[1] == pytest.approx(2 * llr(ba) + llr(bb), abs=1e-8)
    assert w[2] == pytest.approx(3 * llr(bb), abs=1e-8)


def test_bpe_encode_matches_reference(spark, sf_dir):
    """Encode half: per-doc BPE token counts under the learned merges
    equal a pure-Python rank-ordered greedy application."""
    docs = _docs(spark, sf_dir)
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    merges = bpe.learn_bpe_merges(docs, num_merges=6)

    def encode_len(word: str) -> int:
        syms = list(word) + [bpe.END]
        for _rank, left, right, _n in merges:
            out, pend = [], None
            for s in syms:
                if pend == left and s == right:
                    out.append(left + right)
                    pend = None
                else:
                    if pend is not None:
                        out.append(pend)
                    pend = s
            if pend is not None:
                out.append(pend)
            syms = out
        return len(syms)

    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe.apply_bpe_merges(docs, merges).collect()
    }
    for doc_id, text in texts.items():
        words = [w for w in text.split(" ") if w != ""]
        want = (len(words), sum(encode_len(w) for w in words))
        assert got[doc_id] == want, doc_id


def test_bpe_encode_compression_improves_with_merges(spark, sf_dir):
    """More merges can only shrink (or keep) the encoded length — the
    monotonicity a tokenizer-fit report relies on."""
    docs = _docs(spark, sf_dir)
    merges = bpe.learn_bpe_merges(docs, num_merges=8)
    tot_few = (
        bpe.apply_bpe_merges(docs, merges[:2])
        .agg(F.sum("n_bpe_tokens"))
        .collect()[0][0]
    )
    tot_all = (
        bpe.apply_bpe_merges(docs, merges)
        .agg(F.sum("n_bpe_tokens"))
        .collect()[0][0]
    )
    assert tot_all < tot_few


# ---------------------------------------------------- snapshot diff ----


def test_snapshot_diff_roundtrip_and_minimality(spark, sf_dir):
    """snapshot_diff is the inverse of apply_changes: applying the diff
    to the old snapshot reproduces the new one exactly; and the diff is
    minimal (one row per actually-changed key, nothing for unchanged)."""
    from projet_etl_a_rien_spark.operators.compaction import (
        apply_changes,
        snapshot_diff,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    new = (
        o.where(k % 7 != 0)
        .withColumn(
            "o_totalprice",
            F.when(k % 5 == 0, F.col("o_totalprice") + 1).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionByName(
            o.where(k % 11 == 0).select(
                (k + 10_000_000).alias("o_orderkey"),
                "o_custkey",
                F.lit("N").alias("o_orderstatus"),
                "o_totalprice",
            )
        )
    )
    diff = snapshot_diff(o, new, ["o_orderkey"]).persist()
    # minimality: changed keys only, one row per key
    n_old = o.count()
    n_del = o.where(k % 7 == 0).count()
    n_upd = o.where((k % 5 == 0) & (k % 7 != 0)).count()
    n_ins = o.where(k % 11 == 0).count()
    by_op = {r.op: r.n for r in diff.groupBy("op").agg(F.count("*").alias("n")).collect()}
    assert by_op == {"U": n_upd + n_ins, "D": n_del}
    assert diff.groupBy("o_orderkey").count().where("count > 1").count() == 0
    # roundtrip: old + diff == new
    applied = apply_changes(
        o, diff.withColumn("seq", F.lit(1).cast("long")), ["o_orderkey"], "seq"
    )
    assert applied.exceptAll(new).count() == 0
    assert new.exceptAll(applied).count() == 0
    assert applied.count() == n_old - n_del + n_ins
    diff.unpersist()


def test_snapshot_diff_null_transitions_register(spark):
    """NULL→value, value→NULL and NULL→NULL are compared null-safely:
    the first two are updates, the third is unchanged."""
    from projet_etl_a_rien_spark.operators.compaction import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None)], "k bigint, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], "k bigint, v string"
    )
    got = {(r.k): (r.v, r.op) for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: ("a", "U"), 2: (None, "U")}


# ------------------------------------- incremental postings sink ----


def test_postings_sink_incremental_equals_batch(spark, sf_dir):
    """Postings landed batch-by-batch, compacted, then extended with a
    late partial fold to EXACTLY the one-shot batch index; replaying an
    already-landed batch (idempotent overwrite) and a torn partial
    (no _SUCCESS) change nothing."""
    import os
    import shutil
    import tempfile

    from projet_etl_a_rien_spark.operators.compaction import (
        _snapshot_version,
        compact_postings_sink,
        read_postings_sink,
        write_postings_partial,
    )
    from projet_etl_a_rien_spark.operators.retrieval import (
        inverted_index,
        postings_with_stats,
    )

    docs = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="postsink_")
    try:
        third = [docs.where(F.col("doc_id") % 3 == i) for i in range(3)]
        write_postings_partial(third[0], path, 0)
        write_postings_partial(third[1], path, 1)
        v = compact_postings_sink(spark, path)
        assert v == 1
        # replay of batch 1 (checkpoint recovery): lands below/at the
        # fold watermark -> reader must ignore it
        write_postings_partial(third[1], path, 1)
        # late batch above the watermark
        write_postings_partial(third[2], path, 2)
        # torn partial: directory without _SUCCESS stays invisible
        os.makedirs(f"{path}/parts/batch_id=9", exist_ok=True)
        third[0].limit(3).write.mode("overwrite").parquet(
            f"{path}/parts/batch_id=9/_tmp"
        )
        got = postings_with_stats(read_postings_sink(spark, path))
        want = inverted_index(docs)
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
        # second compaction folds batch 2, vacuums it, result unchanged
        v2 = compact_postings_sink(spark, path)
        assert v2 == 2 and _snapshot_version(spark, path) == 2
        again = postings_with_stats(read_postings_sink(spark, path))
        assert again.exceptAll(want).count() == 0
        assert want.exceptAll(again).count() == 0
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_intradoc_dedup_scope(spark):
    """within_doc=True removes repeats inside one doc but must NOT
    remove a segment that only repeats across documents."""
    from projet_etl_a_rien_spark.operators.text import segment_dedup_rewrite

    seg_a = "a b"          # repeated inside doc 1 and also in doc 2
    df = spark.createDataFrame(
        [(1, f"{seg_a} {seg_a} c d"), (2, f"{seg_a} e f")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_removed)
        for r in segment_dedup_rewrite(
            df, seg_tokens=2, within_doc=True
        ).collect()
    }
    # doc 1: second "a b" removed; doc 2 untouched (cross-doc repeat kept)
    assert got[1] == ("a b c d", 2, 1)
    assert got[2] == ("a b e f", 2, 0)
    # corpus-wide variant removes doc 2's copy too
    got_corpus = {
        r.doc_id: r.clean_text
        for r in segment_dedup_rewrite(df, seg_tokens=2).collect()
    }
    assert got_corpus[2] == "e f"


def test_widen_narrow_input_contract(spark):
    """Narrow inputs widen to core count; already-wide inputs pass
    through UNTOUCHED (same plan object — no shuffle added at
    production width)."""
    from projet_etl_a_rien_spark.operators.text import widen_narrow_input

    cores = spark.sparkContext.defaultParallelism
    narrow = spark.createDataFrame(
        [(i, "t") for i in range(50)], "doc_id long, text string"
    ).coalesce(1)
    widened = widen_narrow_input(narrow, "doc_id")
    assert widened.rdd.getNumPartitions() == cores
    wide = narrow.repartition(cores + 2, "doc_id")
    assert widen_narrow_input(wide, "doc_id") is wide


@pytest.mark.parametrize("seed", [2, 11])
def test_snapshot_diff_random_roundtrip(spark, seed):
    """Property: for random old/new keyed tables (composite key, NULLs
    in values, inserts/deletes/updates/unchanged mixed), the diff is
    minimal and apply_changes(old, diff) == new."""
    import random

    from projet_etl_a_rien_spark.operators.compaction import (
        apply_changes,
        snapshot_diff,
    )

    rng = random.Random(seed)

    def rand_rows(keys):
        return [
            (
                k1,
                k2,
                rng.choice([None, "x", "y", "z"]),
                rng.choice([None, 1, 2]),
            )
            for (k1, k2) in keys
        ]

    all_keys = [(a, b) for a in range(6) for b in ("p", "q", "r")]
    old_keys = rng.sample(all_keys, 12)
    new_keys = rng.sample(all_keys, 12)
    schema = "k1 bigint, k2 string, v1 string, v2 bigint"
    old = spark.createDataFrame(rand_rows(old_keys), schema)
    new = spark.createDataFrame(rand_rows(new_keys), schema)
    diff = snapshot_diff(old, new, ["k1", "k2"]).persist()
    # every diff row is a real change; unchanged rows are absent
    old_d = {(r.k1, r.k2): (r.v1, r.v2) for r in old.collect()}
    new_d = {(r.k1, r.k2): (r.v1, r.v2) for r in new.collect()}
    for r in diff.collect():
        k = (r.k1, r.k2)
        if r.op == "D":
            assert k in old_d and k not in new_d
            assert (r.v1, r.v2) == old_d[k]
        else:
            assert k in new_d and (r.v1, r.v2) == new_d[k]
            assert old_d.get(k) != new_d[k] if k in old_d else True
    expected_changed = (
        {k for k in old_d if k not in new_d}
        | {k for k in new_d if k not in old_d}
        | {k for k in old_d if k in new_d and old_d[k] != new_d[k]}
    )
    assert diff.count() == len(expected_changed)
    # roundtrip
    applied = apply_changes(
        old, diff.withColumn("seq", F.lit(1).cast("long")), ["k1", "k2"], "seq"
    )
    got = {(r.k1, r.k2): (r.v1, r.v2) for r in applied.collect()}
    assert got == new_d
    diff.unpersist()


# ------------------------------------------------------ search side ----


def test_phrase_search_adjacency_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b"),      # two matches of "a b"
            (2, "b a"),            # reversed -> no match
            (3, "a x b"),          # gap -> no match
            (4, "a b"),            # one match
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in __import__(
            "projet_etl_a_rien_spark.operators.retrieval", fromlist=["retrieval"]
        ).phrase_search(df, ["a", "b"]).collect()
    }
    assert got == {1: (2, 1), 4: (1, 1)}
    # trigram phrase: overlapping occurrences each count ("a a a a" has
    # two "a a a" matches at positions 1 and 2)
    tri = spark.createDataFrame([(9, "a a a a")], "doc_id long, text string")
    got3 = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in __import__(
            "projet_etl_a_rien_spark.operators.retrieval", fromlist=["retrieval"]
        ).phrase_search(tri, ["a", "a", "a"]).collect()
    }
    assert got3 == {9: (2, 1)}


def test_conjunctive_bm25_requires_all_terms(spark):
    from projet_etl_a_rien_spark.operators.retrieval import (
        bm25_scores,
        conjunctive_bm25_topk,
    )

    df = spark.createDataFrame(
        [
            (1, "x y z filler filler"),
            (2, "x y filler"),       # missing z
            (3, "x y z x y z"),
        ],
        "doc_id long, text string",
    )
    got = conjunctive_bm25_topk(df, ["x", "y", "z"], k=10).collect()
    assert [r.doc_id for r in got] and {r.doc_id for r in got} == {1, 3}
    # every selected doc matched all three terms; scores agree with the scorer
    any_scores = {
        r.doc_id: r.bm25 for r in bm25_scores(df, ["x", "y", "z"]).collect()
    }
    for r in got:
        assert r.n_terms_matched == 3
        assert r.bm25 == any_scores[r.doc_id]


def test_dsir_budget_selection_is_greedy_prefix(spark, sf_dir):
    """The selected set is exactly the (logweight desc, id) prefix whose
    preceding-token count stays under budget — verified against a
    driver-side sort of the full weight table."""
    from projet_etl_a_rien_spark.operators.selection import (
        dsir_logweights,
        dsir_token_budget_selection,
    )

    docs = _docs(spark, sf_dir)
    pred = F.col("source") == "src0"
    budget = 3_000
    all_w = dsir_logweights(docs, pred, n_buckets=64).collect()
    order = sorted(
        all_w, key=lambda r: (-round(r.logweight * 1e9), r.doc_id)
    )
    want, acc = {}, 0
    for r in order:
        if acc < budget:
            want[r.doc_id] = acc
        acc += r.n_tokens
    got = {
        r.doc_id: r.tokens_before
        for r in dsir_token_budget_selection(
            docs, pred, budget=budget, n_buckets=64
        ).collect()
    }
    assert got == want
    assert 0 < len(got) < len(all_w)


def test_phrase_from_postings_equals_direct_scan(spark, sf_dir):
    """Index-served phrase search (position lists from doc_postings)
    returns exactly the direct corpus scan's matches."""
    from projet_etl_a_rien_spark.operators.retrieval import (
        doc_postings,
        phrase_search,
        phrase_search_postings,
    )

    docs = _docs(spark, sf_dir)
    direct = {
        (r.doc_id, r.n_matches, r.first_pos)
        for r in phrase_search(docs, ["table", "hash"]).collect()
    }
    via_index = {
        (r.doc_id, r.n_matches, r.first_pos)
        for r in phrase_search_postings(
            doc_postings(docs), ["table", "hash"]
        ).collect()
    }
    assert direct == via_index and direct


def test_bm25_from_postings_equals_text_scorer(spark, sf_dir):
    from projet_etl_a_rien_spark.operators.retrieval import (
        bm25_from_postings,
        bm25_scores,
        doc_postings,
    )

    docs = _docs(spark, sf_dir)
    terms = ["vector", "stream", "window"]
    direct = {
        (r.doc_id, r.n_terms_matched, r.bm25)
        for r in bm25_scores(docs, terms).collect()
    }
    via_index = {
        (r.doc_id, r.n_terms_matched, r.bm25)
        for r in bm25_from_postings(doc_postings(docs), terms).collect()
    }
    assert direct == via_index and direct


# --------------------------------------------------------------- DFT ----


def test_dft_spectral_features_match_numpy_reference(spark):
    """The exact-integer DFT equals a numpy recomputation with the SAME
    quantized twiddles; a pure bin-2 sinusoid dominates bin 2."""
    import math
    import struct as _struct

    import numpy as np

    from projet_etl_a_rien_spark.operators.wav import (
        DFT_N,
        _dft_twiddles,
        spectral_features,
    )

    c, s = _dft_twiddles()

    def ref(samples):
        v = np.array(samples, dtype=object)
        p = []
        for k in range(DFT_N // 2 + 1):
            re = sum(int(v[j]) * c[j][k] for j in range(DFT_N))
            im = sum(int(v[j]) * s[j][k] for j in range(DFT_N))
            p.append(re * re + im * im)
        ac = p[1:]
        dom = max(range(len(ac)), key=lambda i: (ac[i], -i)) + 1
        return p[0], dom, max(ac), sum(ac)

    # payloads: a pure bin-2 cosine, a constant (DC only), random ints
    rng = np.random.RandomState(3)
    sins = [round(1000 * math.cos(2 * math.pi * 2 * j / DFT_N)) for j in range(DFT_N)]
    cases = {
        1: sins,
        2: [500] * DFT_N,
        3: [int(x) for x in rng.randint(-32768, 32767, DFT_N)],
    }
    rows = [
        (i, _struct.pack(f"<{DFT_N}h", *v).decode("latin-1"))
        for i, v in cases.items()
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    payloads = df.select(
        "doc_id", F.encode(F.col("text"), "ISO-8859-1").alias("payload")
    )
    got = {
        r.doc_id: (r.dc_power, r.dominant_bin, r.dominant_power, r.total_ac_power)
        for r in spectral_features(payloads).collect()
    }
    for i, v in cases.items():
        assert got[i] == ref(v), i
    # physics: the sinusoid's dominant bin is 2; the constant has ~no AC
    assert got[1][1] == 2
    assert got[2][3] <= got[2][0] // 1000  # AC ≈ 0 next to DC


def test_shard_manifest_detects_single_doc_change(spark, sf_dir):
    """The checksum is layout-independent (repartition → identical
    manifest) and sensitive (one changed doc flips exactly its shard's
    checksum while counts stay equal)."""
    from projet_etl_a_rien_spark.queries import REGISTRY, _load_extensions

    _load_extensions()
    fn = REGISTRY["corpus_shard_manifest"].fn
    base = {r.shard: r for r in fn(spark, sf_dir).collect()}

    import projet_etl_a_rien_spark.queries_round6 as r6
    docs = r6._docs(spark, sf_dir)
    # same data, different physical layout
    relaid = docs.repartition(7, "source")
    orig_docs = r6._docs
    try:
        r6._docs = lambda s, d: relaid
        relaid_m = {r.shard: r for r in fn(spark, sf_dir).collect()}
        assert {(k, v.content_checksum) for k, v in base.items()} == {
            (k, v.content_checksum) for k, v in relaid_m.items()
        }
        # flip one document's text
        tampered = docs.withColumn(
            "text",
            F.when(F.col("doc_id") == 7, F.concat(F.col("text"), F.lit(" x")))
            .otherwise(F.col("text")),
        )
        r6._docs = lambda s, d: tampered
        tm = {r.shard: r for r in fn(spark, sf_dir).collect()}
    finally:
        r6._docs = orig_docs
    diff_shards = [
        k for k in base
        if tm[k].content_checksum != base[k].content_checksum
    ]
    assert len(diff_shards) == 1
    assert tm[diff_shards[0]].n_docs == base[diff_shards[0]].n_docs


def test_image_dct_block_physics(spark):
    """A horizontal-stripe image concentrates AC energy in the vertical
    frequency axis (u > 0, v = 0); a vertical-stripe image in the
    horizontal axis — pins block orientation through encode+decode."""
    from projet_etl_a_rien_spark.operators.png import (
        DCT_N,
        dct2d_block,
        png_decode,
        png_encode,
    )

    def feats(pix_fn):
        stride = DCT_N * 3
        pix = bytes(
            pix_fn(x, y) if c == 0 else 0
            for y in range(DCT_N)
            for x in range(DCT_N)
            for c in range(3)
        )
        png = png_encode(DCT_N, DCT_N, pix, 2, 4)
        _, _, _, dec = png_decode(png)
        block = [
            [dec[y * stride + x * 3] for y in range(DCT_N)]
            for x in range(DCT_N)
        ]
        f = dct2d_block(block)
        ac = [
            (abs(f[u][v]), u, v)
            for u in range(DCT_N)
            for v in range(DCT_N)
            if (u, v) != (0, 0)
        ]
        return min((u, v) for a, u, v in ac if a == max(x[0] for x in ac))

    # NOTE block[x][y]: x is the pixel column, y the row. Horizontal
    # stripes (value depends on row y) → dominant v>0, u=0; vertical
    # stripes (depends on column x) → dominant u>0, v=0.
    assert feats(lambda x, y: 255 * (y % 2)) == (0, 7)
    assert feats(lambda x, y: 255 * (x % 2)) == (7, 0)


def test_stream_jsonl_sink_replay_idempotent(spark, sf_dir):
    """The streaming writer's per-batch manifest makes a replayed batch
    REPLACE its own output: delivering the same micro-batch twice (fresh
    checkpoint, same batch id) leaves exactly one copy visible and
    reclaims the superseded part files."""
    import glob
    import json as _json
    import os
    import shutil
    import tempfile

    from projet_etl_a_rien_spark.sources import pyds_sink

    pyds_sink.register(spark)
    root = tempfile.mkdtemp(prefix="jsonlreplay_")
    path = f"{root}/sink"
    schema = "k bigint, v string"
    src = f"{root}/src"
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    try:
        for attempt in range(2):  # second run = fresh ckpt, same batch 0
            ckpt = f"{root}/ckpt{attempt}"
            q = (
                spark.readStream.schema(schema).parquet(src)
                .writeStream.format("jsonl_manifest")
                .option("path", path)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        got = {
            (r.k, r.v)
            for r in pyds_sink.read_jsonl_sink(spark, path, schema).collect()
        }
        assert got == {(1, "a"), (2, "b"), (3, "c")}
        n_rows = pyds_sink.read_jsonl_sink(spark, path, schema).count()
        assert n_rows == 3, "replayed batch duplicated rows"
        # superseded part files were reclaimed: on-disk parts == listed
        listed = set()
        for m in glob.glob(os.path.join(path, "_MANIFEST-b*.json")):
            with open(m) as f:
                listed |= set(_json.load(f)["files"])
        on_disk = {n for n in os.listdir(path) if n.startswith("part-")}
        assert on_disk == listed
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_postings_sink_time_travel(spark, sf_dir):
    """Index time travel mirrors the MV sink: retained versions are
    reconstructible (the as-of index equals the batch index over that
    prefix of documents), between-retained and below-floor points
    raise."""
    import shutil
    import tempfile

    from projet_etl_a_rien_spark.operators.compaction import (
        compact_postings_sink,
        read_postings_sink,
        write_postings_partial,
    )
    from projet_etl_a_rien_spark.operators.retrieval import (
        inverted_index,
        postings_with_stats,
    )

    docs = _docs(spark, sf_dir)
    thirds = [docs.where(F.col("doc_id") % 3 == i) for i in range(3)]
    path = tempfile.mkdtemp(prefix="postttt_")
    try:
        write_postings_partial(thirds[0], path, 0)
        v0 = compact_postings_sink(spark, path, retain_snapshots=2)
        write_postings_partial(thirds[1], path, v0 + 1)
        write_postings_partial(thirds[2], path, v0 + 2)
        v1 = compact_postings_sink(spark, path, retain_snapshots=2)
        assert (v0, v1) == (0, 2)
        # as-of v0 == the batch index over just the first third
        old = postings_with_stats(read_postings_sink(spark, path, as_of=v0))
        want = inverted_index(thirds[0])
        assert old.exceptAll(want).count() == 0
        assert want.exceptAll(old).count() == 0
        # between retained snapshots (batch 1 folded+vacuumed) raises
        with pytest.raises(ValueError, match="between retained snapshots"):
            read_postings_sink(spark, path, as_of=1)
        # retain=1 compaction drops v0; below the floor raises
        write_postings_partial(thirds[0].limit(5), path, v1 + 1)
        compact_postings_sink(spark, path, retain_snapshots=1)
        with pytest.raises(ValueError, match="retain_snapshots"):
            read_postings_sink(spark, path, as_of=v0)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@pytest.mark.parametrize("seed", [4, 13])
def test_bpe_fold_matches_python_greedy(spark, seed):
    """Property: the F.aggregate greedy merge fold equals the Python
    reference on random symbol arrays / random merge pairs (including
    pathological all-same-symbol runs)."""
    import random

    from projet_etl_a_rien_spark.operators.bpe import _apply_merge

    rng = random.Random(seed)
    syms_rows = []
    for i in range(60):
        n = rng.randint(0, 10)
        syms_rows.append((i, [rng.choice(["a", "b", "ab"]) for _ in range(n)]))
    left, right = rng.choice([("a", "a"), ("a", "b"), ("ab", "a"), ("b", "b")])

    def ref(syms):
        out, pend = [], None
        for s in syms:
            if pend == left and s == right:
                out.append(left + right)
                pend = None
            else:
                if pend is not None:
                    out.append(pend)
                pend = s
        if pend is not None:
            out.append(pend)
        return out

    df = spark.createDataFrame(syms_rows, "i long, syms array<string>")
    got = {
        r.i: r.m
        for r in df.select(
            "i", _apply_merge(F.col("syms"), left, right).alias("m")
        ).collect()
    }
    for i, syms in syms_rows:
        assert got[i] == ref(syms), (i, syms, left, right)


def test_pareto_rank_equals_spec_order(spark, sf_dir):
    """The bucketed global rank reproduces the (cents desc, id) spec
    exactly: decile totals equal a driver-side sorted computation."""
    from projet_etl_a_rien_spark.queries import REGISTRY, _load_extensions

    _load_extensions()
    got = {
        r.decile: (r.n_customers, r.cents, r.cum_cents)
        for r in REGISTRY["customer_revenue_pareto"].fn(spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
        .collect()
    )
    srt = sorted(rows, key=lambda r: (-r.cents, r.o_custkey))
    n = len(srt)
    want: dict = {}
    for rank0, r in enumerate(srt):
        d = rank0 * 10 // n
        c, tot = want.get(d, (0, 0))
        want[d] = (c + 1, tot + r.cents)
    cum = 0
    for d in sorted(want):
        cum += want[d][1]
        assert got[d] == (want[d][0], want[d][1], cum), d
    # Pareto sanity: the top decile out-earns the bottom decile
    assert got[0][1] > got[max(got)][1]


def test_driver_sampling_order_derives_from_artifacts():
    """The rotation ledger reads CORRECTNESS_r*.json directly: after
    the explicit _DRIVER_PRIORITY override block (entries whose
    implementation changed this round and need a fresh driver row
    despite fresh ledger evidence), every name with a green row in any
    round sorts AFTER every name without one, and within the checked
    set older evidence sorts first."""
    from projet_etl_a_rien_spark.queries import (
        _DRIVER_PRIORITY,
        _correctness_evidence,
        _ordered_names,
    )

    ledger = _correctness_evidence()
    assert ledger, "no CORRECTNESS artifacts found in the repo root"
    order = _ordered_names()
    pri = [n for n in _DRIVER_PRIORITY if n in order]
    assert order[: len(pri)] == pri  # override block leads verbatim
    rest = order[len(pri) :]
    ranks = {n: i for i, n in enumerate(rest)}
    never = [n for n in rest if ledger.get(n, 0) == 0]
    checked = [n for n in rest if ledger.get(n, 0) > 0]
    # Full driver coverage (never == []) is the success state; the
    # never-before-checked ordering rule only applies while some
    # query still lacks a driver row.
    assert checked
    if never:
        assert max(ranks[n] for n in never) < min(ranks[n] for n in checked)
    # monotone by freshest-green round within the checked set
    rounds = [ledger[n] for n in rest if n in ledger]
    assert rounds == sorted(rounds)
