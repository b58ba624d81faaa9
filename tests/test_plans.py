"""Physical-plan audits — the 100 TB design assertions, executable.

The brief's discipline ("after each operator works, explain the plan and
iterate until it's the plan you'd want") pinned as regression tests:
filter/column pushdown reaches the parquet scan, star joins broadcast
their dims and shuffle the fact exactly once, top-k plans use
TakeOrderedAndProject (never a full sort), Python appears ONLY as
Arrow-batched MapInPandas stages, and the as-of join costs one shuffle.
"""

from __future__ import annotations

import pytest

from projet_etl_a_rien_spark.queries import REGISTRY, _load_extensions

_load_extensions()

# Queries whose fn() is eager (runs streaming jobs, driver-side k-means
# iterations, or pipeline writes) — planned-only audits skip them.
EAGER = {name for name in REGISTRY if name.startswith("streaming_")} | {
    "embedding_kmeans_assign",
    "embedding_ann_kmeans_topk",
    "embedding_ann_recall_at_10",
    "embedding_knn_join_top3",
    "embedding_knn_join_multiprobe_top3",
    "minhash_dedup_clusters",  # CC driver loop
    "minhash_dedup_survivors",  # CC driver loop
    "airports_permissive_roundtrip",
    # eager by construction (iterative peel loops / cache-release
    # checkpoints) — their executed plan is a checkpoint scan, so the
    # sweep audits nothing; each has a dedicated plan/property test on
    # its internal (lazy) form instead
    "jaccard_prefix_pairs",  # default materialize=True releases persists
    "minhash_lsh_quality",  # calls jaccard_prefix_pairs for the truth set
    "parts_kcore",  # iterative peeling loop
    "parts_ktruss_affinity",  # iterative peeling loop
    "corpus_curriculum_order",  # source-dim count + checkpoint
    "mv_time_travel_read",  # builds + compacts a sink, returns checkpoint
    "parquet_schema_evolution_read",  # writes two batches, reads merged
    "bpe_learn_merges",  # iterative merge loop; result is a local merge table
    "corpus_bpe_encode_stats",  # fold chain localCheckpoints every 3 merges
    "mv_snapshot_changelog",  # builds + compacts a sink, diffs two reads
}


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_scan_prunes_and_pushes(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q6_forecast_revenue")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # column pruning: only the 4 referenced columns reach the scan
    assert "l_shipdate" in scan and "l_discount" in scan
    assert "l_orderkey" not in scan and "l_returnflag" not in scan
    # predicate pushdown: the shipdate/discount/quantity filters hit the scan
    assert "isnotnull(l_shipdate" in plan and "l_shipdate" in plan.split("DataFilters")[1][:200]


def test_q3_topk_is_take_ordered_with_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q3_top_orders")
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort
    assert "BroadcastHashJoin" in plan  # the selective dim side broadcasts


def test_regional_star_join_single_fact_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "regional_revenue")
    assert plan.count("BroadcastHashJoin") == 4  # all four dims broadcast
    # the only hash exchange is the groupBy agg — the fact shuffles once
    assert plan.count("Exchange hashpartitioning") <= 2


def test_asof_join_costs_one_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_orders_asof")
    assert plan.count("Exchange hashpartitioning") == 1  # union -> one key shuffle
    assert "Window" in plan


def test_range_join_is_hash_not_nested_loop(spark, sf_dir):
    """Bucketized range join must plan as a hash/merge join on the bucket
    id — never the O(n*m) BroadcastNestedLoopJoin a bare interval
    predicate degenerates to."""
    plan = _plan(spark, sf_dir, "events_in_hot_windows")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_no_row_at_a_time_python_anywhere(spark, sf_dir):
    """Python in the hot path only as Arrow-batched stages, never per-row.

    ``doc_chunk_windows_udtf`` is the ONE deliberate exception: it
    exists to pin the Spark 4 UDTF escape hatch and must plan as the
    Arrow-batched table-function node (ArrowEvalPythonUDTF — asserted
    positively in test_round4e), never the row-pickled BatchEvalPython
    forms. Everything else stays zero-Python.
    """
    offenders = []
    for name in sorted(set(REGISTRY) - EAGER - {"doc_chunk_windows_udtf"}):
        plan = _plan(spark, sf_dir, name)
        if "BatchEvalPython" in plan or "ArrowEvalPython" in plan:
            offenders.append(name)
    assert not offenders, f"row-at-a-time Python UDFs in: {offenders}"
    udtf_plan = _plan(spark, sf_dir, "doc_chunk_windows_udtf")
    assert "ArrowEvalPythonUDTF" in udtf_plan
    assert "BatchEvalPython " not in udtf_plan and "BatchEvalPythonUDTF" not in udtf_plan


def test_multimodal_is_arrow_batched(spark, sf_dir):
    plan = _plan(spark, sf_dir, "multimodal_byte_features")
    assert "MapInPandas" in plan


@pytest.mark.parametrize("name", ["doc_quality_score", "doc_lang_id"])
def test_narrow_projections_have_no_exchange(spark, sf_dir, name):
    """Per-row feature queries must be shuffle-free narrow projections."""
    plan = _plan(spark, sf_dir, name)
    assert "Exchange" not in plan


def test_data_quality_report_has_no_forced_broadcast(spark, sf_dir):
    """The FK anti-joins must not pin `customer` (or anything) with a
    broadcast hint: a forced broadcast of a fact-sized table OOMs at 100×.
    AQE may still CHOOSE broadcast when the runtime size fits — the audit
    is on the logical plan (no ResolvedHint), not the physical join."""
    df = REGISTRY["data_quality_report"].fn(spark, sf_dir)
    logical = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in logical
    assert "UnresolvedHint" not in logical


@pytest.mark.parametrize("name", ["tfidf_top_terms", "doc_unigram_logprob"])
def test_vocab_joins_have_no_forced_broadcast(spark, sf_dir, name):
    """The vocabulary-sized table (term df / unigram model) must join
    WITHOUT a broadcast hint — vocabulary grows with the corpus (Heaps'
    law), so pinning it OOMs at web scale; AQE still chooses broadcast
    when the runtime size fits. Exactly one hint may remain: the 1-row
    corpus-total scalar."""
    df = REGISTRY[name].fn(spark, sf_dir)
    logical = df._jdf.queryExecution().analyzed().toString()
    assert logical.count("ResolvedHint") == 1
    assert "UnresolvedHint" not in logical


def test_time_rollup_reuses_finer_grains(spark, sf_dir):
    """Hierarchical rollup must read coarser grains from the cached finer
    aggregate (InMemoryTableScan), not re-scan the fact per grain."""
    plan = _plan(spark, sf_dir, "events_time_rollup")
    assert "InMemoryTableScan" in plan


# 1-row scalar-subquery broadcasts legitimately plan as
# BroadcastNestedLoopJoin (query vector, corpus-size scalar,
# fraction-of-total, above-average threshold) — everything else must not.
SCALAR_BNLJ_OK = {
    "embedding_cosine_topk",
    "tfidf_top_terms",
    "tpch_q11_important_stock",
    "tpch_q22_idle_rich_customers",
    "order_price_sketch_bounds",
    "source_mixing_weights",  # 1-row totals aggregate
    "doc_token_rarity",  # 1-row corpus-total broadcast onto the vocab table
    "events_key_skew_profile",  # 1-row totals broadcast onto the key counts
    "bm25_score_docs",  # 1-row (n_docs, avgdl) stats broadcast
    "doc_unigram_logprob",  # 1-row corpus-total broadcast onto the vocab table
    "lineitem_feature_corr",  # 1-row means broadcast for the centered pass
    "parts_basket_lift",  # 1-row n_orders broadcast onto the pair table
    "source_token_drift",  # 1-row corpus-total (big_g) broadcast onto terms
    "customer_rfm_segments",  # 1-row quartile-thresholds broadcast
    "source_temperature_mix",  # 1-row N then 1-row share-normalizer broadcasts
    "corpus_right_to_erasure",  # 1-row before/purged/after count joins
    "doc_inverted_index",  # 1-row n_docs broadcast onto the vocab stats
    "doc_pmi_collocations",  # 1-row (n_uni, n_bi) totals broadcast
    "dsir_importance_weights",  # 1-row totals broadcast onto the 256-bucket hist
    "docs_conjunctive_bm25_topk",  # bm25's 1-row (n_docs, avgdl) broadcast
    "docs_bm25_hard_negatives",  # same scorer pass, same scalar broadcast
    "dsir_token_budget_selection",  # 1-row totals + 1-row (lo, hi) broadcasts
    "embedding_matryoshka_recall",  # 1-row query-vector broadcast per prefix
    "customer_revenue_pareto",  # 1-row (lo, hi, n) range broadcast
    "events_dow_hour_heatmap",  # 1-row total broadcast onto the 168-cell grid
    "web_domain_stats",  # 1-row total_docs broadcast onto the domain table
    "corpus_epoch_oversample",  # 1-row corpus-total + 1-row normalizer
    "corpus_length_quantiles_sketch",  # 1-row bounded-cell-array broadcast
    "doc_length_cdf_from_sketch",  # same 1-row cell-array broadcast, CDF side
    "corpus_length_drift_ks_sketch",  # 1-row min-source scalar broadcast
    "source_length_drift_ks_by_lang",  # same 1-row min-source broadcast, keyed
}


def test_no_cartesian_or_unexpected_nested_loops(spark, sf_dir):
    """No query may plan a true CartesianProduct, and nested-loop joins
    may appear only where a 1-row scalar broadcast makes them O(n)."""
    offenders = []
    for name in sorted(set(REGISTRY) - EAGER):
        plan = _plan(spark, sf_dir, name)
        if "CartesianProduct" in plan:
            offenders.append((name, "cartesian"))
        if "BroadcastNestedLoopJoin" in plan and name not in SCALAR_BNLJ_OK:
            offenders.append((name, "nested-loop"))
    assert not offenders, offenders


def test_inverted_index_shuffles_on_token_and_doc(spark, sf_dir):
    """The postings aggregation must key its exchange on (token, id) —
    keying on the token alone would send every posting of a stopword to
    one reducer (hub-reducer skew at corpus scale)."""
    plan = _plan(spark, sf_dir, "doc_inverted_index")
    import re

    posting_exchanges = [
        l for l in plan.splitlines()
        if "Exchange hashpartitioning(token#" in l and ", id#" in l
    ]
    assert posting_exchanges, "no (token, id)-keyed exchange in the plan"


def test_events_json_kpi_single_scan_map_side_partial_agg(spark, sf_dir):
    """Plan pin for the r6 watch item: one parquet scan, JSON extraction
    inside the aggregate (no separate projection stage forcing an extra
    exchange), and PARTIAL aggregation strictly below the lowest
    exchange (map-side combine — the shuffle carries per-(type,user)
    partials, never raw events). The two exchanges are the standard
    count-distinct expansion and carry aggregate-sized rows only."""
    plan = _plan(spark, sf_dir, "events_json_kpi")
    assert plan.count("Scan ") == 1, plan
    assert "Join" not in plan
    # tree string lists the final operator first; the deepest segment
    # (after the LAST Exchange) must still contain a HashAggregate above
    # the scan — i.e. partial agg happens before any data moves
    below_last_exchange = plan.rsplit("Exchange", 1)[1]
    assert "HashAggregate" in below_last_exchange, plan
    assert "Scan " in below_last_exchange, plan
