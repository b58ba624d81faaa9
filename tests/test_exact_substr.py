"""Exact substring-span dedup (operators/dedup.py:exact_substr_spans /
exact_substr_rewrite): invariants on a hand-built corpus plus a brute-force
cross-check, so the relational gaps-and-islands construction is pinned
against the obvious quadratic definition."""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_etl_a_rien_spark.operators import dedup

K = 4


def _corpus(spark):
    # doc 1 and 2 share an 6-token run in the middle; doc 3 repeats a
    # 4-token window of itself; doc 4 is unrelated; doc 5 is too short.
    rows = [
        (1, "aa bb cc SHARED1 SHARED2 SHARED3 SHARED4 SHARED5 SHARED6 dd ee"),
        (2, "xx yy SHARED1 SHARED2 SHARED3 SHARED4 SHARED5 SHARED6 zz"),
        (3, "rr ss LOOP1 LOOP2 LOOP3 LOOP4 tt uu LOOP1 LOOP2 LOOP3 LOOP4 vv"),
        (4, "one two three four five six seven eight nine"),
        (5, "tiny doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute_spans(rows: list[tuple[int, str]], k: int) -> set[tuple[int, int, int]]:
    """Quadratic reference: duplicated k-windows by literal token-tuple
    equality, then interval merge."""
    toks = {i: t.split(" ") for i, t in rows}
    occ: dict[tuple, int] = {}
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            occ[tuple(ts[p : p + k])] = occ.get(tuple(ts[p : p + k]), 0) + 1
    out = set()
    for i, ts in toks.items():
        dup = [p for p in range(len(ts) - k + 1) if occ[tuple(ts[p : p + k])] > 1]
        spans: list[list[int]] = []
        for p in dup:
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], p + k - 1)
            else:
                spans.append([p, p + k - 1])
        for s, e in spans:
            out.add((i, s, e))
    return out


def test_spans_match_brute_force(spark):
    df = _corpus(spark)
    rows = [(r["doc_id"], r["text"]) for r in df.collect()]
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dedup.exact_substr_spans(df, k=K).collect()
    }
    assert got == _brute_spans(rows, K)
    # the shared 6-token run covers tokens 3..8 of doc 1 and 2..7 of doc 2
    assert (1, 3, 8) in got and (2, 2, 7) in got
    # the self-repeat in doc 3 marks both copies
    assert (3, 2, 5) in got and (3, 8, 11) in got
    # unrelated and too-short docs yield no spans
    assert not any(i in (4, 5) for i, _, _ in got)


def test_rewrite_invariants(spark):
    df = _corpus(spark)
    out = {r["doc_id"]: r for r in dedup.exact_substr_rewrite(df, k=K).collect()}
    orig = {r["doc_id"]: r["text"] for r in df.collect()}
    # every doc comes back, token counts are conserved
    assert set(out) == set(orig)
    for i, r in out.items():
        assert r["n_kept"] + r["n_removed"] == len(orig[i].split(" "))
        kept = r["clean_text"].split(" ") if r["clean_text"] else []
        assert len(kept) == r["n_kept"]
    # docs without duplicated spans pass through verbatim
    assert out[4]["clean_text"] == orig[4] and out[4]["n_removed"] == 0
    assert out[5]["clean_text"] == orig[5]
    # both copies of the shared run are removed (all-copies semantics)
    assert "SHARED3" not in out[1]["clean_text"]
    assert "SHARED3" not in out[2]["clean_text"]
    assert out[1]["clean_text"] == "aa bb cc dd ee"
    assert out[2]["clean_text"] == "xx yy zz"
    assert out[3]["clean_text"] == "rr ss tt uu vv"


def test_spans_disjoint_and_window_covered(spark, sf_dir):
    """On the real fixture corpus: spans are disjoint, non-adjacent,
    >= k tokens, and every planted exact-duplicate doc is fully covered."""
    from projet_etl_a_rien_spark.fixtures import documents_with_dups

    docs = documents_with_dups(spark, sf_dir)
    spans = dedup.exact_substr_spans(docs, k=8).persist()
    per_doc = (
        spans.groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("ss"),
            F.min("span_tokens").alias("min_len"),
        )
        .collect()
    )
    for r in per_doc:
        assert r["min_len"] >= 8
        ordered = sorted((s["span_start"], s["span_end"]) for s in r["ss"])
        for (s1, e1), (s2, _) in zip(ordered, ordered[1:]):
            assert s2 > e1 + 1, f"adjacent/overlapping spans in {r['doc_id']}"
    # a planted duplicate (doc_id + 1_000_000) is an exact copy: its every
    # window is duplicated, so one span covers the entire doc
    planted = (
        spans.join(
            docs.select(
                "doc_id",
                (F.size(F.split("text", " ")) - 1).alias("last_tok"),
            ),
            "doc_id",
        )
        .where(F.col("doc_id") >= 1_000_000)
        .where((F.col("span_start") == 0) & (F.col("span_end") == F.col("last_tok")))
    )
    n_planted = docs.where(F.col("doc_id") >= 1_000_000).count()
    assert planted.count() == n_planted
    spans.unpersist()
