"""Changelog compaction and file compaction — the table-maintenance pair.

``latest_by_key`` is SCD-1 / CDC-upsert semantics as a batch operator:
collapse an append-only changelog to the newest row per key. One shuffle
on the key; the window never sorts globally. At 100 TB this is the
nightly compaction every upsert-ingest table needs (the reference's JDBC
``overwrite`` sink is the degenerate whole-table form of it —
spark_airports_final.py:75-84).

``compact_files`` rewrites a directory to a bounded file count — the
small-files remedy for streaming sinks (a foreachBatch sink lands one
directory per micro-batch; readers want few large row groups instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Newest row per key from an append-only changelog.

    ``order_col`` descending picks the latest; ``tiebreak_cols`` (default:
    the key itself is not enough — pass a unique column like an event id)
    make the choice total when versions share a timestamp, so the result
    is deterministic under any partitioning.
    """
    order = [F.col(order_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def compact_files(
    spark: SparkSession, path: str, out_path: str, target_files: int, fmt: str = "parquet"
) -> None:
    """Rewrite ``path`` into exactly ``target_files`` files at ``out_path``.

    ``coalesce`` (not ``repartition``): narrowing to fewer files must not
    pay a shuffle — each output task just concatenates input splits.
    """
    df = spark.read.format(fmt).load(path)
    df.coalesce(target_files).write.format(fmt).mode("overwrite").save(out_path)


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Lakehouse-style MERGE (CDC apply): fold a changelog of
    upserts/deletes into a base snapshot and return the final state.

    ``changes`` carries the base's columns plus ``op_col`` ('U' upsert /
    'D' delete) and ``seq_col`` (change order, > 0); base rows join the
    merge as version 0 inserts. Latest version per key wins (op as
    deterministic tiebreak within a version); keys whose latest op is
    'D' disappear. This is ``latest_by_key`` (SCD-1 compaction) extended
    with tombstones — the batch form of what Delta/Iceberg MERGE INTO
    executes, as one key-partitioned window: one shuffle, no global
    sort, no driver state, any number of change batches unioned in.
    """
    data_cols = [c for c in base.columns]
    snap = base.select(
        *data_cols,
        F.lit("I").alias(op_col),
        F.lit(0).cast("long").alias(seq_col),
    )
    merged = snap.unionByName(
        changes.select(*data_cols, op_col, F.col(seq_col).cast("long").alias(seq_col))
    )
    latest = latest_by_key(merged, key_cols, seq_col, tiebreak_cols=[op_col])
    return latest.where(F.col(op_col) != "D").drop(op_col, seq_col)


# ---------------------------------------------------------------------------
# Incremental aggregate materialized view (partials + snapshot compaction)
# ---------------------------------------------------------------------------
#
# Sink layout:
#   {path}/parts/batch_id={B}/   per-micro-batch PARTIAL aggregates
#                                (one row per key: n, cents), written with
#                                overwrite so checkpoint-recovery replays
#                                rewrite instead of duplicating
#   {path}/snap/v={V}/           snapshot = fold of every partial with
#                                batch_id <= V
#
# Readers fold (newest snapshot) ∪ (partials with batch_id > V) — the
# version IS the fold watermark, so a crash between snapshot-write and
# partial-cleanup cannot double count: stale partials are excluded by the
# filter, and deleting them is pure space reclamation. This is the
# aggregate analogue of the sink-is-the-state dedup/CDC sinks: the MV is
# maintained with O(keys) work per batch, never a re-scan of raw history,
# and compaction bounds read-side fan-in (fold cost tracks snapshots=1 +
# batches-since-compaction, not stream lifetime).


def write_agg_partial(
    batch_df: DataFrame, path: str, batch_id: int, key_col: str = "event_type"
) -> None:
    """Reduce one micro-batch to per-key exact-cents partials and land
    them idempotently under ``parts/batch_id=N`` (map-side combine to the
    sink: partial aggregation is associative, so the fold of partials
    equals the aggregate of the union)."""
    part = batch_df.groupBy(key_col).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    part.write.mode("overwrite").parquet(f"{path}/parts/batch_id={batch_id}")


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the JVM Hadoop API — works on
    local paths AND object-store/HDFS URIs, unlike ``os``/``shutil``."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _committed_partitions(spark: SparkSession, root: str, prefix: str) -> list[int]:
    """Partition numbers N of ``{root}/{prefix}{N}`` dirs whose job commit
    completed — i.e. the dir contains ``_SUCCESS`` (Spark's
    FileOutputCommitter writes it on job commit; a crash mid-commit leaves
    data files but no marker, and those torn dirs must stay invisible).
    Unparseable names are ignored."""
    jvm = spark._jvm
    fs, rpath = _hadoop_fs(spark, root)
    if not fs.exists(rpath):
        return []
    out = []
    for st in fs.listStatus(rpath):
        name = st.getPath().getName()
        if not st.isDirectory() or not name.startswith(prefix):
            continue
        try:
            n = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if fs.exists(jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")):
            out.append(n)
    return out


def _snapshot_version(spark: SparkSession, path: str) -> int:
    """Newest COMMITTED snapshot version, or -1 when none exists.

    Committed = the version dir carries ``_SUCCESS``. A crash mid
    job-commit of ``snap/v=N`` can leave a partially visible snapshot;
    preferring it would undercount AND wedge compaction (``max_b <= v``
    never re-folds). Ignoring marker-less versions keeps torn snapshots
    invisible, and the next ``compact_agg_sink`` overwrites the torn dir
    (same ``v = max batch_id``) — that overwrite IS the repair path."""
    vs = _committed_partitions(spark, f"{path}/snap", "v=")
    return max(vs) if vs else -1


def read_agg_sink(
    spark: SparkSession,
    path: str,
    key_col: str = "event_type",
    as_of: int | None = None,
) -> DataFrame:
    """Current MV contents: newest snapshot folded with every partial
    NEWER than it. Partials at or below the snapshot version are already
    folded in and are skipped even if their directories still exist
    (crash-safe read — cleanup is optional).

    Returns a LAZY plan pinned to the files listed at planning time:
    execute (or ``localCheckpoint``) it BEFORE the next
    ``compact_agg_sink`` on the same path — compaction vacuums folded
    partials and superseded snapshots, and a still-lazy reader would
    then hit missing files (the watermark filter makes stale STATE
    harmless, it cannot protect against deleted FILES — the standard
    reader-vs-vacuum window every table format has).

    Only COMMITTED directories (``_SUCCESS`` present) are read, on both
    the snapshot and the partial side: a torn partial folded here (and
    then into a snapshot) would undercount permanently, because the
    stream's idempotent-replay rewrite of ``parts/batch_id=N`` lands at
    or below the fold watermark and is never re-read.

    TIME TRAVEL: ``as_of=B`` reconstructs the MV as of batch ``B`` —
    the newest retained snapshot with version <= B folded with committed
    partials in (version, B]. Resolution is bounded by retention:
    ``compact_agg_sink(retain_snapshots=k)`` keeps the k newest
    snapshot versions (folded partials are always vacuumed), so the
    reachable time-travel points are exactly: each retained snapshot
    version, and any batch at or above the NEWEST snapshot (rebuilt
    from still-unfolded partials). Any other ``as_of`` raises rather
    than silently undercounting — including a point BETWEEN two
    retained snapshots (e.g. retained v=5 and v=9, ``as_of=7``): the
    batches in (5, 7] were folded into v=9 and their partial dirs
    vacuumed, so an exact as-of-7 state is no longer reconstructible
    and returning the v=5 state would mislabel it."""
    versions = _committed_partitions(spark, f"{path}/snap", "v=")
    if as_of is None:
        v = max(versions) if versions else -1
    else:
        eligible = [x for x in versions if x <= as_of]
        v = max(eligible) if eligible else -1
        if v < 0 and versions and min(versions) > as_of:
            newest_parts = _committed_partitions(
                spark, f"{path}/parts", "batch_id="
            )
            if not any(b <= as_of for b in newest_parts):
                raise ValueError(
                    f"as_of={as_of} predates the oldest retained snapshot "
                    f"(v={min(versions)}) and no partials survive there; "
                    "raise retain_snapshots at compaction time"
                )
        elif versions and v < as_of < max(versions):
            # Between two retained snapshots: batches in (v, as_of]
            # were folded into the newer snapshot and vacuumed (the
            # fold is all-or-nothing up to its watermark), so exact
            # reconstruction is impossible; a gap in batch ids is
            # indistinguishable from a vacuum, so raise either way.
            nxt = min(x for x in versions if x > as_of)
            raise ValueError(
                f"as_of={as_of} falls between retained snapshots "
                f"v={v} and v={nxt}: batches in ({v}, {as_of}] were "
                "folded into the newer snapshot and vacuumed, so an "
                "exact as-of reconstruction is impossible; reachable "
                "points are the retained snapshot versions and any "
                "batch at or above the newest snapshot — raise "
                "retain_snapshots at compaction time"
            )
    pieces = []
    if v >= 0:
        pieces.append(
            spark.read.option("basePath", f"{path}/snap")
            .parquet(f"{path}/snap/v={v}")
            .select(key_col, "n", "cents")
        )
    newer = sorted(
        b
        for b in _committed_partitions(spark, f"{path}/parts", "batch_id=")
        if b > v and (as_of is None or b <= as_of)
    )
    if newer:
        pieces.append(
            spark.read.option("basePath", f"{path}/parts")
            .parquet(*[f"{path}/parts/batch_id={b}" for b in newer])
            .select(key_col, "n", "cents")
        )
    if not pieces:
        return spark.createDataFrame([], f"{key_col} string, n long, cents long")
    merged = pieces[0]
    for p in pieces[1:]:
        merged = merged.unionByName(p)
    return merged.groupBy(key_col).agg(
        F.sum("n").alias("n"), F.sum("cents").alias("cents")
    )


def compact_agg_sink(
    spark: SparkSession,
    path: str,
    key_col: str = "event_type",
    retain_snapshots: int = 1,
) -> int:
    """Fold everything visible now into snapshot ``v = max folded
    batch_id`` and drop the folded partial directories. The snapshot is
    localCheckpointed before writing (it reads the previous snapshot
    path it may logically overwrite), and the deletes run only after the
    snapshot commit — a crash in between leaves stale partials that
    readers already exclude. Returns the new version (or the current one
    when there is nothing new to fold).

    Single-writer maintenance contract: the vacuum step deletes files,
    so any LAZY DataFrame from an earlier ``read_agg_sink`` must be
    materialized before calling this (see ``read_agg_sink``).

    ``retain_snapshots``: how many newest snapshot versions to KEEP at
    vacuum time (default 1 = current behavior). Each retained version is
    a time-travel point for ``read_agg_sink(as_of=...)`` — the same
    retention/vacuum trade every table format exposes."""
    v = _snapshot_version(spark, path)
    committed = _committed_partitions(spark, f"{path}/parts", "batch_id=")
    max_b = max(committed) if committed else -1
    if max_b <= v:
        return v
    # as_of=max_b bounds the fold to the batches this snapshot is
    # labeled with: a partial landing mid-compaction stays above the
    # new watermark instead of being folded-but-also-still-readable
    # (additive fold => that overlap would double-count) and the
    # vacuum below max_b+1 provably deletes only folded partials
    fold = read_agg_sink(spark, path, key_col, as_of=max_b).localCheckpoint(
        eager=True
    )
    fold.write.mode("overwrite").parquet(f"{path}/snap/v={max_b}")
    # Space reclamation only — readers already filter batch_id <= max_b,
    # and always fold the NEWEST snapshot, so folded partials and
    # superseded snapshot versions are both dead weight (single-writer
    # maintenance contract, like every table-format vacuum). Folded
    # partials are those at OR below the new version; superseded
    # snapshots are those strictly below it (v == max_b is the one just
    # committed).
    _vacuum_partitions(spark, f"{path}/parts", "batch_id=", below=max_b + 1)
    keep = sorted(
        _committed_partitions(spark, f"{path}/snap", "v="), reverse=True
    )[: max(1, retain_snapshots)]
    _vacuum_partitions(spark, f"{path}/snap", "v=", below=min(keep))
    return max_b


def _vacuum_partitions(
    spark: SparkSession, root: str, prefix: str, below: int
) -> None:
    """Delete ``{root}/{prefix}{N}`` directories with N < ``below``
    (best-effort; unparseable names are left alone). Runs through the
    Hadoop FileSystem API so it reclaims space on object-store/HDFS URIs
    too, not just local paths — an ``os``/``shutil`` vacuum is silently a
    no-op there and the sink would grow unbounded at scale."""
    fs, rpath = _hadoop_fs(spark, root)
    if not fs.exists(rpath):
        return
    for st in fs.listStatus(rpath):
        name = st.getPath().getName()
        if not name.startswith(prefix):
            continue
        try:
            n = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if n < below:
            fs.delete(st.getPath(), True)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Diff two versions of a keyed table into a CDC changelog — the
    INVERSE of :func:`apply_changes`: ``apply_changes(old,
    snapshot_diff(old, new, keys) + seq, keys, seq)`` reproduces ``new``
    exactly (property-pinned in tests/test_round6.py).

    Emits one row per changed key with ``op_col``:

    - ``'U'`` — key present in ``new`` with different (or no prior)
      values; carries the NEW values (insert and update collapse to
      upsert, matching ``apply_changes``' op vocabulary);
    - ``'D'`` — key present only in ``old``; value columns are the OLD
      values (diagnostic payload; the apply side only reads the key).

    Unchanged keys emit nothing, so the changelog is minimal — the
    table-format "table diff"/"incremental read" primitive that turns
    two full snapshots into an incremental feed (backfill→stream
    cutover, replication catch-up, audit).

    One full-outer join on the key — a single co-partitioned shuffle,
    no window. Value comparison is null-safe (``eqNullSafe`` per
    column), so NULL→value and value→NULL both register as updates.

    Side presence is tracked with literal flags (``_o``/``_n``
    lit(True) tagged before the join), NOT key-column nullness — the
    join itself is null-safe on the keys, so an all-NULL-key row is a
    legitimate matchable key and must not read as "absent".
    """
    val_cols = [c for c in new.columns if c not in key_cols]
    o = old.withColumn("__snap_o", F.lit(True)).alias("o")
    n = new.withColumn("__snap_n", F.lit(True)).alias("n")
    cond = None
    for k in key_cols:
        c = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = c if cond is None else (cond & c)
    joined = o.join(n, cond, "full_outer")
    new_present = F.col("n.__snap_n").isNotNull()
    old_present = F.col("o.__snap_o").isNotNull()
    same_vals = F.lit(True)
    for c in val_cols:
        same_vals = same_vals & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    return (
        joined.where(~(new_present & old_present & same_vals))
        .select(
            *[
                F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k)
                for k in key_cols
            ],
            *[
                F.when(new_present, F.col(f"n.{c}"))
                .otherwise(F.col(f"o.{c}"))
                .alias(c)
                for c in val_cols
            ],
            F.when(new_present, F.lit("U")).otherwise(F.lit("D")).alias(op_col),
        )
    )


# ---------------------------------------------------------------------------
# Incremental inverted-index sink (postings partials + snapshot compaction)
# ---------------------------------------------------------------------------
#
# Same layout and crash contract as the aggregate-MV sink above
# (parts/batch_id=N partials, snap/v=maxBatch snapshot, _SUCCESS-gated
# reads, version-as-fold-watermark), but the folded payload is POSTING
# ROWS, not per-key sums: documents arrive exactly once, their postings
# are disjoint row sets, so the fold is a plain union — no re-aggregation
# across batches, per-batch work is O(batch postings). Token statistics
# (df, cf, n_docs) are MATERIALIZED vocab-sized at compaction time
# (stats/v=N) because they are additive across disjoint document sets:
# a serve reads stored snapshot stats + stats over only the uncompacted
# partials and merges by summation (read_postings_sink_with_stats) — the
# corpus is never re-aggregated per read. idf alone is derived at read
# time (it mixes n_docs with df, so it is not additive).


def write_postings_partial(
    batch_df: DataFrame, path: str, batch_id: int
) -> None:
    """Land one micro-batch's positional postings idempotently under
    ``parts/batch_id=N`` (checkpoint-recovery replays overwrite the same
    dir instead of duplicating)."""
    from .retrieval import doc_postings

    doc_postings(batch_df).write.mode("overwrite").parquet(
        f"{path}/parts/batch_id={batch_id}"
    )


def read_postings_sink(
    spark: SparkSession, path: str, as_of: int | None = None
) -> DataFrame:
    """Folded postings: newest committed snapshot ∪ committed partials
    NEWER than it (same reader-vs-vacuum and torn-commit rules as
    ``read_agg_sink``). Returns the raw postings table; feed it to
    ``retrieval.postings_with_stats`` for the queryable index.

    TIME TRAVEL: ``as_of=B`` reconstructs the index as of batch ``B``
    under the SAME reachability contract as ``read_agg_sink`` —
    retained snapshot versions plus anything at or above the newest
    snapshot; a point between two retained snapshots, or below the
    retention floor, raises rather than serving a stale index labeled
    as-of-B (an index missing documents silently under-retrieves)."""
    schema = (
        "token string, id bigint, tf bigint, first_pos bigint,"
        " last_pos bigint, positions array<bigint>"
    )
    v, newer = _resolve_postings_fold(spark, path, as_of)
    pieces = []
    if v >= 0:
        pieces.append(
            spark.read.option("basePath", f"{path}/snap")
            .parquet(f"{path}/snap/v={v}")
            .select("token", "id", "tf", "first_pos", "last_pos", "positions")
        )
    if newer:
        pieces.append(
            spark.read.option("basePath", f"{path}/parts")
            .parquet(*[f"{path}/parts/batch_id={b}" for b in newer])
            .select("token", "id", "tf", "first_pos", "last_pos", "positions")
        )
    if not pieces:
        return spark.createDataFrame([], schema)
    merged = pieces[0]
    for p in pieces[1:]:
        merged = merged.unionByName(p)
    return merged


def _resolve_postings_fold(
    spark: SparkSession, path: str, as_of: int | None
) -> tuple[int, list[int]]:
    """Resolve which snapshot version and which newer committed partials
    a sink read folds (shared by ``read_postings_sink`` and the
    stored-stats serve path), enforcing the time-travel reachability
    contract: a point between retained snapshots, or below the
    retention floor, raises rather than silently under-retrieving."""
    versions = _committed_partitions(spark, f"{path}/snap", "v=")
    if as_of is None:
        v = max(versions) if versions else -1
    else:
        eligible = [x for x in versions if x <= as_of]
        v = max(eligible) if eligible else -1
        if v < 0 and versions and min(versions) > as_of:
            parts = _committed_partitions(spark, f"{path}/parts", "batch_id=")
            if not any(b <= as_of for b in parts):
                raise ValueError(
                    f"as_of={as_of} predates the oldest retained snapshot "
                    f"(v={min(versions)}) and no partials survive there; "
                    "raise retain_snapshots at compaction time"
                )
        elif versions and v < as_of < max(versions):
            nxt = min(x for x in versions if x > as_of)
            raise ValueError(
                f"as_of={as_of} falls between retained snapshots v={v} "
                f"and v={nxt}: batches in ({v}, {as_of}] were folded and "
                "vacuumed — raise retain_snapshots at compaction time"
            )
    newer = sorted(
        b
        for b in _committed_partitions(spark, f"{path}/parts", "batch_id=")
        if b > v and (as_of is None or b <= as_of)
    )
    return v, newer


def write_postings_stats(
    spark: SparkSession,
    path: str,
    v: int,
    postings: DataFrame | None = None,
) -> None:
    """Materialize the derived statistics of snapshot ``v``: per-token
    ``(token, df_docs, cf, n_docs)`` under ``stats/v=N`` (vocab-sized)
    and per-document lengths ``(id, dl)`` under ``dlen/v=N``
    (doc-count-sized), so serve paths join stored tables instead of
    re-aggregating the full postings on every read. Both are additive
    across disjoint document batches. Committed AFTER the snapshot
    itself (same _SUCCESS gating); a crash in between leaves a snapshot
    without stats, which every serve path detects and falls back to the
    read-time derive — never a torn or stale stats read. ``postings``
    lets compaction pass its already-checkpointed fold instead of
    re-reading the snapshot parquet it just wrote; it MUST equal the
    committed snapshot's rows."""
    from .retrieval import postings_doc_lengths, postings_token_stats

    if postings is None:
        postings = spark.read.parquet(f"{path}/snap/v={v}").select(
            "token", "id", "tf", "first_pos", "last_pos", "positions"
        )
    postings_token_stats(postings).write.mode("overwrite").parquet(
        f"{path}/stats/v={v}"
    )
    postings_doc_lengths(postings).write.mode("overwrite").parquet(
        f"{path}/dlen/v={v}"
    )


def read_postings_sink_with_stats(
    spark: SparkSession, path: str, as_of: int | None = None
) -> DataFrame:
    """The queryable index served from the sink: folded postings joined
    with per-token statistics (df_docs, cf, smoothed idf) — bit-identical
    to ``retrieval.postings_with_stats(read_postings_sink(...))`` (same
    ``attach_token_stats`` tail), but when the served snapshot carries
    stats MATERIALIZED at compaction time the corpus-scale read-time
    aggregation disappears: stored vocab-sized stats merge with stats
    aggregated over only the partials NEWER than the snapshot (df_docs /
    cf / n_docs are additive across batches because documents arrive
    exactly once and postings of distinct docs are disjoint rows). The
    serve pass is then one linear postings scan + a vocab-sized join —
    O(read postings), not O(full index) per read. Falls back to the full
    read-time derive when no stats are committed for the served version
    (pre-stats sink layout, or a crash between snapshot and stats
    commit)."""
    from .retrieval import (
        attach_token_stats,
        postings_token_stats,
        postings_with_stats,
    )

    v, newer = _resolve_postings_fold(spark, path, as_of)
    if v < 0 or v not in _committed_partitions(spark, f"{path}/stats", "v="):
        return postings_with_stats(read_postings_sink(spark, path, as_of))
    snap = (
        spark.read.option("basePath", f"{path}/snap")
        .parquet(f"{path}/snap/v={v}")
        .select("token", "id", "tf", "first_pos", "last_pos", "positions")
    )
    stored = spark.read.parquet(f"{path}/stats/v={v}")
    if not newer:
        return attach_token_stats(snap, stored)
    parts = (
        spark.read.option("basePath", f"{path}/parts")
        .parquet(*[f"{path}/parts/batch_id={b}" for b in newer])
        .select("token", "id", "tf", "first_pos", "last_pos", "positions")
    )
    # incremental stats over ONLY the uncompacted partials (small), then
    # an additive vocab-sized merge with the stored snapshot stats
    part_stats = postings_token_stats(parts)
    n_total = (
        stored.agg(F.max("n_docs").alias("snap_n"))
        .crossJoin(
            F.broadcast(parts.agg(F.countDistinct("id").alias("part_n")))
        )
        .select(
            (
                F.coalesce(F.col("snap_n"), F.lit(0)) + F.col("part_n")
            ).alias("n_docs")
        )
    )
    merged = (
        stored.select("token", "df_docs", "cf")
        .unionByName(part_stats.select("token", "df_docs", "cf"))
        .groupBy("token")
        .agg(F.sum("df_docs").alias("df_docs"), F.sum("cf").alias("cf"))
        .crossJoin(F.broadcast(n_total))
    )
    return attach_token_stats(snap.unionByName(parts), merged)


def read_sink_doc_lengths(
    spark: SparkSession, path: str, as_of: int | None = None
) -> DataFrame:
    """Per-document lengths ``(id, dl)`` of the folded sink — the
    doc-count-sized table BM25 needs (dl and the avgdl/n_docs corpus
    constants). Served from the ``dlen/v=N`` table materialized at
    compaction plus a partial-only aggregate over batches newer than
    the snapshot (documents arrive whole in one batch, so per-doc
    lengths are plain-union additive — no re-aggregation); falls back
    to aggregating the full folded postings when no dlen is committed
    for the served version."""
    from .retrieval import postings_doc_lengths

    v, newer = _resolve_postings_fold(spark, path, as_of)
    if v < 0 or v not in _committed_partitions(spark, f"{path}/dlen", "v="):
        return postings_doc_lengths(read_postings_sink(spark, path, as_of))
    stored = spark.read.parquet(f"{path}/dlen/v={v}").select("id", "dl")
    if not newer:
        return stored
    parts = (
        spark.read.option("basePath", f"{path}/parts")
        .parquet(*[f"{path}/parts/batch_id={b}" for b in newer])
        .select("id", "tf")
    )
    return stored.unionByName(postings_doc_lengths(parts))


def bm25_from_sink(
    spark: SparkSession,
    path: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    as_of: int | None = None,
) -> DataFrame:
    """Okapi BM25 served from the compacted sink with NO corpus-scale
    pass at query time: tf rows come from a token-PREDICATE-PUSHDOWN
    scan of the postings parquet (only the query terms' row groups are
    read), document lengths and the n_docs/avgdl constants from the
    doc-count-sized ``dlen`` table materialized at compaction
    (:func:`read_sink_doc_lengths`). Query cost is O(postings of the
    query terms) + O(n_docs) instead of ``bm25_from_postings``'s
    O(full index) per read — the difference between an index you can
    serve interactively at 100 TB and one you re-scan per query.
    Bit-identical to ``bm25_from_postings`` over the folded postings
    (same nano-quantized per-term weights; dl sums are exact integer
    sums, so assembly order cannot drift the average)."""
    q = list(query_terms)
    tf = (
        read_postings_sink(spark, path, as_of)
        .where(F.col("token").isin(q))
        .select("id", "token", "tf")
    )
    dl = read_sink_doc_lengths(spark, path, as_of)
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("dfreq"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "token",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("dfreq") + 0.5) / (F.col("dfreq") + 0.5)
        ).alias("idf"),
    )
    per_term = (
        tf.join(F.broadcast(idf), "token")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
        .select(
            "id",
            F.round(
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
                * 1_000_000_000
            )
            .cast("long")
            .alias("w_nano"),
        )
    )
    return per_term.groupBy(F.col("id").alias("doc_id")).agg(
        F.count("*").alias("n_terms_matched"),
        (F.sum("w_nano") / F.lit(1e9)).alias("bm25"),
    )


def postings_erase_ids(spark: SparkSession, path: str, ids) -> int:
    """Right-to-erasure over the postings sink: physically REWRITE every
    retained snapshot version AND every committed partial without the
    erased doc ids, so the live index, future folds, and — critically —
    TIME-TRAVEL reads as of ANY retained batch stop serving them.
    Erasure rewrites history (the GDPR semantics); it does not merely
    mask the head, because ``read_postings_sink(as_of=old)`` reads the
    old snapshot bytes directly. Returns the number of posting rows
    removed.

    Token statistics stored at compaction time (``stats/v=N``) are
    rebuilt SELF-HEALINGLY: for EVERY committed stats version, the
    stats table is unconditionally recomputed from that snapshot's
    post-erase postings and overwritten — even when this run removed
    nothing from the postings. That unconditional rewrite is what makes
    the crash window converge: if a prior run died between its postings
    overwrite and its stats rewrite, the postings no longer change on
    re-run (so a change-gated rewrite would skip forever and
    :func:`read_postings_sink_with_stats` would keep scoring with ghost
    df_docs/cf/n_docs), but the unconditional recompute still replaces
    the stale stats. Read-time-derived stats (the fallback path)
    reflect the erasure with no treatment.

    Idempotence is the crash contract: each partition dir is rewritten
    independently (filter → localCheckpoint → overwrite, the same
    pattern as compaction), so a crash mid-way leaves some dirs erased
    and some not — re-running the same erasure completes it. No reader
    ever sees a torn dir (_SUCCESS-gated, same as compaction).

    Dir rewrites run through a small driver thread pool (guide §2.6 —
    overlap independent jobs so one dir's commit tail backfills with
    the next dir's scan): the dirs are mutually independent by the
    per-dir contract above, each task keeps its own read → filter →
    checkpoint → overwrite (→ stats rebuild) sequence strictly ordered
    within the dir, and a crash still just leaves a subset of dirs
    rewritten — the idempotent re-run story is unchanged. Only the
    wall-clock of the driver-sequential job chain shrinks (measured
    sf0.1: the 4-dir erasure section ~2x).
    """
    from concurrent.futures import ThreadPoolExecutor

    ids_df = (
        ids.select(F.col("id"))
        if isinstance(ids, DataFrame)
        else spark.createDataFrame([(int(i),) for i in ids], "id bigint")
    ).distinct()
    from .retrieval import postings_token_stats

    stat_versions = set(_committed_partitions(spark, f"{path}/stats", "v="))

    def _erase_dir(task) -> int:
        prefix, key, n = task
        sub = f"{prefix}/{key}{n}"
        cur = spark.read.parquet(sub)
        n_before = cur.count()
        kept = cur.join(ids_df, "id", "left_anti").localCheckpoint(
            eager=True
        )
        n_after = kept.count()
        dropped = 0
        if n_after != n_before:
            kept.write.mode("overwrite").parquet(sub)
            dropped = n_before - n_after
        if key == "v=" and n in stat_versions:
            # unconditional, NOT gated on n_after != n_before: a
            # crash between a prior run's postings overwrite and its
            # stats rewrite leaves ghost stats that a change-gated
            # re-run would never repair (the postings no longer
            # change). Recomputing from the post-erase snapshot every
            # run makes the erasure converge under any crash point.
            postings_token_stats(kept).write.mode(
                "overwrite"
            ).parquet(f"{path}/stats/v={n}")
        return dropped

    def _erase_dlen(n) -> int:
        sub = f"{path}/dlen/v={n}"
        cur = spark.read.parquet(sub)
        kept = cur.join(ids_df, "id", "left_anti").localCheckpoint(
            eager=True
        )
        if kept.count() != cur.count():
            kept.write.mode("overwrite").parquet(sub)
        return 0

    tasks = [
        (prefix, key, n)
        for prefix, key in (
            (f"{path}/snap", "v="),
            (f"{path}/parts", "batch_id="),
        )
        for n in _committed_partitions(spark, prefix, key)
    ]
    dlen_versions = _committed_partitions(spark, f"{path}/dlen", "v=")
    removed = 0
    # 3 in flight: enough to fill a dir's commit tail, not enough to
    # fight for executors (guide §2.6's sizing rule)
    with ThreadPoolExecutor(max_workers=3) as pool:
        futs = [pool.submit(_erase_dir, t) for t in tasks]
        # the materialized per-doc length tables carry the erased ids
        # as whole rows — drop them the same idempotent rewrite way
        futs += [pool.submit(_erase_dlen, n) for n in dlen_versions]
        for f in futs:
            removed += f.result()
    return removed


def compact_postings_sink(
    spark: SparkSession, path: str, retain_snapshots: int = 1
) -> int:
    """Fold committed partials into ``snap/v=maxBatch`` (plain union —
    postings are disjoint across batches) and vacuum the folded partial
    dirs; crash-safe in the same order as ``compact_agg_sink`` (snapshot
    commit first, deletes after). ``retain_snapshots`` keeps the k
    newest snapshot versions as ``as_of`` time-travel points (same
    retention/vacuum trade as the aggregate-MV sink). Returns the new
    version."""
    v = _snapshot_version(spark, path)
    committed = _committed_partitions(spark, f"{path}/parts", "batch_id=")
    max_b = max(committed) if committed else -1
    if max_b <= v:
        return v
    # as_of=max_b: same fold-bound rule as compact_agg_sink (postings
    # union across batches is not idempotent — an overlap would
    # duplicate a batch's postings)
    fold = read_postings_sink(spark, path, as_of=max_b).localCheckpoint(
        eager=True
    )
    fold.write.mode("overwrite").parquet(f"{path}/snap/v={max_b}")
    # stats commit AFTER the snapshot (crash in between => serve path
    # falls back to the read-time derive for this version, never torn);
    # derived from the in-memory checkpointed fold, not a parquet
    # re-read of the snapshot just written
    write_postings_stats(spark, path, max_b, postings=fold)
    _vacuum_partitions(spark, f"{path}/parts", "batch_id=", below=max_b + 1)
    keep = sorted(
        _committed_partitions(spark, f"{path}/snap", "v="), reverse=True
    )[: max(1, retain_snapshots)]
    _vacuum_partitions(spark, f"{path}/snap", "v=", below=min(keep))
    _vacuum_partitions(spark, f"{path}/stats", "v=", below=min(keep))
    _vacuum_partitions(spark, f"{path}/dlen", "v=", below=min(keep))
    return max_b
