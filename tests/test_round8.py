"""Round-8 tests: token statistics materialized into the compacted
postings snapshot (stats/v=N) and the stored-stats serve path
(read_postings_sink_with_stats) — the r7 verdict's index_read_serve ask.

The contract under test: the stored-stats serve is BIT-IDENTICAL to the
read-time derive (postings_with_stats over the folded postings) in every
sink state — fresh compaction, uncompacted partials above the fold
watermark (additive vocab-sized merge), after right-to-erasure (stats
rebuilt from the rewritten snapshot), across time travel, and in the
crash window between snapshot commit and stats commit (fallback to the
derive, never a torn or stale stats read).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from projet_etl_a_rien_spark.catalog import load_table
from projet_etl_a_rien_spark.operators.compaction import (
    _committed_partitions,
    compact_postings_sink,
    postings_erase_ids,
    read_postings_sink,
    read_postings_sink_with_stats,
    write_postings_partial,
)
from projet_etl_a_rien_spark.operators.retrieval import (
    inverted_index,
    postings_with_stats,
)


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _assert_frames_equal(got, want):
    # dtypes, not full schema: a parquet roundtrip relaxes nullability
    assert got.dtypes == want.dtypes
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_compaction_materializes_token_stats(spark, sf_dir):
    """Compaction writes a committed stats/v=N table whose (df_docs, cf,
    n_docs) equal a from-scratch aggregation of the snapshot, and the
    stored-stats serve equals both the read-time derive and the one-shot
    batch index."""
    docs = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="statsink_")
    try:
        write_postings_partial(docs.where(F.col("doc_id") % 2 == 0), path, 0)
        write_postings_partial(docs.where(F.col("doc_id") % 2 == 1), path, 1)
        v = compact_postings_sink(spark, path)
        assert _committed_partitions(spark, f"{path}/stats", "v=") == [v]
        stored = spark.read.parquet(f"{path}/stats/v={v}")
        n_docs = docs.count()
        assert stored.where(F.col("n_docs") != n_docs).count() == 0
        got = read_postings_sink_with_stats(spark, path)
        _assert_frames_equal(got, inverted_index(docs))
        _assert_frames_equal(
            got, postings_with_stats(read_postings_sink(spark, path))
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_stored_stats_merge_with_uncompacted_partials(spark, sf_dir):
    """A partial landed ABOVE the fold watermark merges additively with
    the stored snapshot stats (df_docs/cf summed per token, n_docs
    summed) — equal to the one-shot batch index over all documents."""
    docs = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="statmerge_")
    try:
        write_postings_partial(docs.where(F.col("doc_id") % 3 == 0), path, 0)
        write_postings_partial(docs.where(F.col("doc_id") % 3 == 1), path, 1)
        v = compact_postings_sink(spark, path)
        write_postings_partial(
            docs.where(F.col("doc_id") % 3 == 2), path, v + 1
        )
        got = read_postings_sink_with_stats(spark, path)
        _assert_frames_equal(got, inverted_index(docs))
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_stored_stats_crash_window_falls_back_to_derive(spark, sf_dir):
    """Crash between snapshot commit and stats commit: a snapshot whose
    stats/v=N is missing or torn (no _SUCCESS) serves through the
    read-time derive — same values, never an error or a stale read."""
    docs = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="statcrash_")
    try:
        write_postings_partial(docs, path, 0)
        v = compact_postings_sink(spark, path)
        want = inverted_index(docs)
        # torn stats: strip the _SUCCESS marker
        os.remove(f"{path}/stats/v={v}/_SUCCESS")
        assert _committed_partitions(spark, f"{path}/stats", "v=") == []
        _assert_frames_equal(read_postings_sink_with_stats(spark, path), want)
        # missing stats dir entirely (pre-stats sink layout)
        shutil.rmtree(f"{path}/stats")
        _assert_frames_equal(read_postings_sink_with_stats(spark, path), want)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_erasure_rebuilds_stored_stats(spark, sf_dir):
    """postings_erase_ids rewrites the snapshot's stats table too: after
    erasure the stored-stats serve equals the one-shot index over the
    SURVIVING documents — no ghost df/cf/n_docs from erased docs."""
    docs = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="staterase_")
    try:
        write_postings_partial(docs.where(F.col("doc_id") % 2 == 0), path, 0)
        v = compact_postings_sink(spark, path)
        write_postings_partial(
            docs.where(F.col("doc_id") % 2 == 1), path, v + 1
        )
        erase = docs.where(F.col("doc_id") % 5 == 0).select(
            F.col("doc_id").alias("id")
        )
        removed = postings_erase_ids(spark, path, erase)
        assert removed > 0
        survivors = docs.where(F.col("doc_id") % 5 != 0)
        got = read_postings_sink_with_stats(spark, path)
        _assert_frames_equal(got, inverted_index(survivors))
        stored = spark.read.parquet(f"{path}/stats/v={v}")
        n_snap = survivors.where(F.col("doc_id") % 2 == 0).count()
        assert stored.where(F.col("n_docs") != n_snap).count() == 0
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_stored_stats_time_travel(spark, sf_dir):
    """as_of reads resolve the stats of THEIR snapshot version: each
    retained version serves its own stored stats, equal to the one-shot
    index over the documents present as of that batch."""
    docs = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="stattt_")
    try:
        write_postings_partial(docs.where(F.col("doc_id") % 2 == 0), path, 0)
        v0 = compact_postings_sink(spark, path, retain_snapshots=2)
        write_postings_partial(
            docs.where(F.col("doc_id") % 2 == 1), path, v0 + 1
        )
        v1 = compact_postings_sink(spark, path, retain_snapshots=2)
        assert sorted(
            _committed_partitions(spark, f"{path}/stats", "v=")
        ) == sorted([v0, v1])
        _assert_frames_equal(
            read_postings_sink_with_stats(spark, path, as_of=v0),
            inverted_index(docs.where(F.col("doc_id") % 2 == 0)),
        )
        _assert_frames_equal(
            read_postings_sink_with_stats(spark, path, as_of=v1),
            inverted_index(docs),
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
