"""Bucketed co-located join: the write-once-shuffle-never contract.

Proves the 100 TB design claim in sources/bucketed.py executes as
claimed: two tables bucketed by the join key into the same bucket count
join with ZERO Exchange operators in the physical plan (broadcast
disabled so the shuffle would otherwise be forced), and the joined
result matches the plain join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_etl_a_rien_spark.sources.bucketed import read_bucketed, write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(o, "orders_b", str(tmp_path / "orders_b"), 4, ["o_orderkey"],
                   sort_cols=["o_orderkey"])
    write_bucketed(l, "lineitem_b", str(tmp_path / "lineitem_b"), 4, ["l_orderkey"],
                   sort_cols=["l_orderkey"])

    ob, lb = read_bucketed(spark, "orders_b"), read_bucketed(spark, "lineitem_b")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count("*").alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself is exchange-free; the only allowed exchange is
        # the final groupBy on a DIFFERENT key
        assert "SortMergeJoin" in plan
        join_part = plan.split("SortMergeJoin")[1]
        assert "Exchange" not in join_part, plan
        # correctness: equals the plain (unbucketed) join
        expected = {
            tuple(r)
            for r in l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert {tuple(r) for r in joined.collect()} == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucket_pruning_on_point_predicate(spark, sf_dir, tmp_path):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(o, "orders_bp", str(tmp_path / "orders_bp"), 8, ["o_orderkey"])
    try:
        # the planner auto-disables bucketed scans when nothing downstream
        # needs the distribution; force it so a point predicate can prune
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        key = o.select(F.min("o_orderkey")).first()[0]
        df = read_bucketed(spark, "orders_bp").where(F.col("o_orderkey") == key)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # bucket pruning reports selected buckets in the scan node
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        assert df.count() == 1
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        spark.sql("DROP TABLE IF EXISTS orders_bp")


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    """files.write(partition_by=...) + a partition-key predicate must show
    PartitionFilters at the scan — whole directories skipped before any
    I/O, the coarsest and cheapest pruning tier at 100 TB."""
    from projet_etl_a_rien_spark.sources.files import scan, write

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "orders_part")
    write(o, path, partition_by=["o_orderpriority"])

    df = scan(spark, path).where(F.col("o_orderpriority") == "1-URGENT")
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_line = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "PartitionFilters: [" in scan_line
    assert "o_orderpriority" in scan_line.split("PartitionFilters:")[1].split("]")[0]
    assert df.count() == o.where("o_orderpriority = '1-URGENT'").count()


def test_dynamic_partition_overwrite_backfill(spark, sf_dir, tmp_path):
    """Backfill contract: re-writing ONE partition in dynamic
    partitionOverwriteMode must replace only that directory and leave
    every other partition untouched — the idempotent reprocessing
    pattern for partitioned 100 TB tables (static mode would wipe the
    whole table)."""
    from projet_etl_a_rien_spark.sources.files import write

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "orders_dyn")
    write(o, path, partition_by=["o_orderpriority"])
    before = spark.read.parquet(path).count()

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # backfill: re-derive just the URGENT partition (say, a fix-up run)
        urgent = o.where("o_orderpriority = '1-URGENT'")
        urgent.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
        after = spark.read.parquet(path)
        assert after.count() == before  # other partitions survived
        assert (
            after.where("o_orderpriority = '1-URGENT'").count() == urgent.count()
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def test_range_sorted_write_gives_disjoint_files(spark, sf_dir, tmp_path):
    """write_range_sorted: each output file owns a disjoint key range
    (file-level min/max don't overlap), so range predicates prune to
    single files and merge-readers get global order for free."""
    from projet_etl_a_rien_spark.sources.files import write_range_sorted

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "orders_sorted")
    write_range_sorted(o, path, ["o_orderkey"], num_files=4)

    import glob

    ranges = []
    for f in glob.glob(f"{path}/part-*"):
        mm = spark.read.parquet(f).agg(
            F.min("o_orderkey"), F.max("o_orderkey")
        ).first()
        ranges.append((mm[0], mm[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint, ordered key ranges
    assert spark.read.parquet(path).count() == o.count()


def test_streaming_agg_on_rocksdb_state_store(spark, sf_dir):
    """The large-state production path: the same windowed aggregation on
    the RocksDB state store provider must equal the default-provider
    result (state is spilled off-heap/disk instead of JVM maps)."""
    from projet_etl_a_rien_spark.streaming.windows import (
        replay_events_stream,
        run_bounded,
        tumbling_counts,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    try:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        got = run_bounded(
            tumbling_counts(replay_events_stream(spark, sf_dir), "1 hour")
        )
        rows = {tuple(r) for r in got.collect()}
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    # ground truth: batch equivalent
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n = ev.count()
    assert sum(r[2] for r in rows) == n  # every event in exactly one window
    assert len(rows) > 0
