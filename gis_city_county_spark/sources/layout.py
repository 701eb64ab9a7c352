"""Data-layout operators: partitioned and bucketed storage.

At 100 TB the dominant costs are (a) scanning data a query doesn't
need and (b) shuffling for joins/aggregations on the same keys over
and over. Both are layout problems, solved at *write* time:

* ``write_partitioned`` — hive-style directory partitioning on a
  low-cardinality column (date, language, source). Readers with a
  predicate on the partition column never open the other directories
  (partition pruning happens at planning; visible as
  ``PartitionFilters`` in the scan node). ``repartition`` on the
  partition columns first, so each output directory is written by the
  tasks owning its rows — without it every task writes a file into
  every partition dir (the small-files explosion).
* ``write_bucketed`` — hash-bucket (and sort) rows by join/agg key
  into a fixed bucket count, persisted as a table. Two tables
  co-bucketed on the join key join with ZERO exchanges: the bucketing
  satisfies both sides' distribution requirement, so Catalyst plans a
  sort-merge join straight off the scans. Same for ``groupBy`` on the
  bucket key. This is the "pay the shuffle once at ingest, never
  again" pattern.

Both are thin wrappers over the stock DataFrameWriter — the value is
the enforced invariants (repartition-before-partitioned-write, sorted
buckets, deterministic bucket counts) plus the plan-shape tests in
``tests/test_layout.py`` proving pruning/shuffle-elision actually
engages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Write hive-partitioned parquet, one writer set per partition."""
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Scan a hive-partitioned dataset; partition-column predicates
    prune directories at planning time."""
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed+sorted external table (registered in the
    session catalog; data at ``path``). ``num_buckets`` should be
    sized so one bucket of the *final* dataset fits an executor core's
    working memory — it cannot change without a rewrite."""
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table_name)
    )


def co_bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With matching
    bucket counts this plans with no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


# ----------------------------------------------------- z-order clustering


def _quantize_tpl(expr_sql: str, lo: int, hi: int, bits: int, idiv: str) -> str:
    span = hi - lo + 1
    top = (1 << bits) - 1
    return (
        f"greatest(0, least({top},"
        f" (({expr_sql} - {lo}) * {1 << bits}) {idiv} {span}))"
    )


def quantize(expr_sql: str, lo: int, hi: int, bits: int) -> "F.Column":
    """Map an integer SQL expression into ``[0, 2^bits)`` by exact
    integer arithmetic: ``((x - lo) * 2^bits) div (hi - lo + 1)``,
    clamped. All-BIGINT (no doubles), so engines agree bit-for-bit;
    :func:`quantize_sql` is the literal DuckDB twin (``//``)."""
    return F.expr(_quantize_tpl(expr_sql, lo, hi, bits, "div")).cast("long")


def quantize_sql(expr_sql: str, lo: int, hi: int, bits: int) -> str:
    return f"CAST({_quantize_tpl(expr_sql, lo, hi, bits, '//')} AS BIGINT)"


def zorder_key(x: "F.Column", y: "F.Column", bits: int = 8) -> "F.Column":
    """Interleave the low ``bits`` bits of two quantized integer
    columns into a Morton (Z-order) key: bit ``i`` of ``x`` lands at
    position ``2i``, of ``y`` at ``2i+1``. Rows close in the key are
    close in BOTH dimensions, so min/max column stats of files written
    in key ranges form tight boxes — a multi-dimensional data-skipping
    layout that plain sorting (tight in one dimension, useless in the
    rest) cannot give. Pure integer shifts/masks — identical on any
    engine."""
    z: "F.Column" = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def zorder_key_sql(x: str, y: str, bits: int = 8) -> str:
    """DuckDB twin of :func:`zorder_key` (same shifts, same order)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    key: "F.Column",
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Cluster ``df`` into ``n_files`` contiguous Z-key ranges (range
    repartition + in-file sort) and write parquet. Each output file
    then covers one small Z-interval = one small box in the original
    dimensions; a reader with predicates on those dimensions skips
    whole files/row-groups on min/max stats. The write costs one range
    shuffle — the standard pay-once layout investment."""
    (
        df.withColumn("__z", key)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def file_minmax_stats(path: str, cols: list[str]) -> "list[dict]":
    """Per-file min/max of ``cols`` from parquet footers (driver-side
    metadata read — no data scan). The basis for asserting a layout's
    skipping power: a file can be skipped for a box query iff its
    [min,max] box misses the query box."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        lo: dict = {c: None for c in cols}
        hi: dict = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                c = col.path_in_schema
                if c in lo and col.statistics is not None:
                    s = col.statistics
                    lo[c] = s.min if lo[c] is None else min(lo[c], s.min)
                    hi[c] = s.max if hi[c] is None else max(hi[c], s.max)
        out.append({"file": name, "min": lo, "max": hi})
    return out


def compact_files(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_bytes)`` files of roughly the target
    size. The small-files problem is the dominant failure mode of
    continuously-appended lakes (every file costs a task, a footer
    read and a namenode entry; a 100 TB table fed by streaming
    micro-batches degrades to millions of kilobyte files without
    this). One shuffle (round-robin repartition — rebalances skewed
    input files) and one write; run it per partition directory on
    partitioned tables so partition pruning is preserved.

    Returns the output file count. Compaction writes to a NEW
    directory — pair with the blue/green pointer swap
    (:func:`files.publish_snapshot`) so readers flip atomically.
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(src_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_out = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(src_dir).repartition(n_out).write.parquet(dest_dir)
    return n_out


def overwrite_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Selective partition replacement: overwrite ONLY the hive
    partitions present in ``df``, leaving every other partition's data
    untouched — the incremental-refresh write a daily pipeline wants
    (rewrite today's date partition, keep history) without the
    read-modify-write of a full overwrite.

    Uses ``partitionOverwriteMode=dynamic`` scoped to this write (the
    static default would truncate the whole root). Pair with a
    blue/green pointer (``files.publish_snapshot``) when readers need
    atomicity across multiple partitions.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.repartition(*[F.col(c) for c in partition_cols])
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_snapshot(
    spark: SparkSession,
    src: str,
    dest: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: Sequence[str] = (),
) -> int:
    """Small-files compaction: rewrite a parquet dataset into files of
    ~``target_file_bytes`` each, optionally re-sorted for clustering.

    Streaming sinks and incremental batch appends leave thousands of
    KB-scale files per partition; at 100 TB the resulting task-per-file
    scan schedule and footer-read storm dominate query latency long
    before the data does. Compaction is the standard maintenance pass:
    size the output by the dataset's actual on-disk bytes (file-status
    sum — metadata only, no extra data scan), `repartition` to that
    count (or `repartitionByRange` over ``sort_cols`` so the rewrite
    also restores clustering for data-skipping), and rewrite.

    Returns the output file count. Write lands in ``dest`` — pair with
    :func:`gis_city_county_spark.sources.files.publish_snapshot` for
    an atomic pointer swap over the live copy.

    Sizing and the returned count go through the Hadoop FileSystem API
    (recursive), so any scheme Spark can read works — local, HDFS,
    s3a:// — and partitioned (subdirectory) layouts are counted fully;
    an os.walk version silently sized non-local paths as 0."""
    total = _parquet_bytes_and_files(spark, src)[0]
    n_files = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(src)
    if sort_cols:
        out = df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
        out = out.sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dest)
    return _parquet_bytes_and_files(spark, dest)[1]


def _parquet_bytes_and_files(spark: SparkSession, path: str) -> tuple[int, int]:
    """(total bytes, file count) of all ``*.parquet`` under ``path``,
    recursively, via the Hadoop FileSystem API — metadata-only (list
    calls, no data scan) and scheme-agnostic."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    total = n = 0
    while it.hasNext():
        st = it.next()
        if st.getPath().getName().endswith(".parquet"):
            total += st.getLen()
            n += 1
    return total, n


def with_hilbert_key(
    df: DataFrame,
    x_col,
    y_col,
    bits: int = 8,
    out: str = "hkey",
) -> DataFrame:
    """Hilbert-curve layout key for two quantized dimensions — the
    space-filling curve whose buckets are CONTIGUOUS squares (Z-order
    buckets jump at quadrant seams, so range predicates read more
    files; Hilbert is what Delta/Iceberg offer as the premium
    clustering).  Classic xy→d bit walk (Hamilton's algorithm), one
    reflect/rotate step per bit level.

    Each step materializes as a projection (``withColumn``) instead
    of one nested expression — the rotation reuses x and y several
    times per level, and 8 nested levels would exponentially blow the
    expression tree past the 64 KB codegen limit.  All integer ops,
    scan-side, no shuffle.

    Returns ``df`` with ``out`` = the Hilbert index in
    [0, 4**bits) and the intermediates dropped.
    """
    df = df.withColumn("__hx", x_col.cast("long")).withColumn(
        "__hy", y_col.cast("long")
    ).withColumn("__hd", F.lit(0).cast("long"))
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        rx = F.when((F.col("__hx").bitwiseAND(F.lit(s))) > 0, 1).otherwise(0)
        ry = F.when((F.col("__hy").bitwiseAND(F.lit(s))) > 0, 1).otherwise(0)
        df = (
            df.withColumn("__rx", rx.cast("long"))
            .withColumn("__ry", ry.cast("long"))
            .withColumn(
                "__hd",
                F.col("__hd")
                + F.lit(s * s)
                * (F.lit(3) * F.col("__rx")).bitwiseXOR(F.col("__ry")),
            )
            .withColumn(
                "__nx",
                F.when(
                    F.col("__ry") == 0,
                    F.when(
                        F.col("__rx") == 1,
                        F.lit(s - 1) - F.col("__hy"),
                    ).otherwise(F.col("__hy")),
                ).otherwise(F.col("__hx")),
            )
            .withColumn(
                "__ny",
                F.when(
                    F.col("__ry") == 0,
                    F.when(
                        F.col("__rx") == 1,
                        F.lit(s - 1) - F.col("__hx"),
                    ).otherwise(F.col("__hx")),
                ).otherwise(F.col("__hy")),
            )
            .withColumn("__hx", F.col("__nx"))
            .withColumn("__hy", F.col("__ny"))
            .drop("__rx", "__ry", "__nx", "__ny")
        )
    return df.withColumn(out, F.col("__hd")).drop("__hx", "__hy", "__hd")


def hilbert_key_sql(x_expr: str, y_expr: str, bits: int = 8) -> str:
    """DuckDB twin of :func:`with_hilbert_key` as chained CTE steps;
    returns CTE text — embed as ``WITH {this}, ... SELECT hkey FROM
    h{bits}``.  Caller's source relation must be named ``dims`` with
    columns referenced by the two expressions."""
    ctes = [
        f"h0 AS (SELECT *, CAST({x_expr} AS BIGINT) AS hx,"
        f" CAST({y_expr} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd"
        f" FROM dims)"
    ]
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        prev = f"h{i}"
        ctes.append(f"""h{i + 1} AS (
  SELECT * EXCLUDE (hx, hy, hd, rx, ry),
         CASE WHEN ry = 0 THEN
              CASE WHEN rx = 1 THEN {s - 1} - hy ELSE hy END
         ELSE hx END AS hx,
         CASE WHEN ry = 0 THEN
              CASE WHEN rx = 1 THEN {s - 1} - hx ELSE hx END
         ELSE hy END AS hy,
         hd + {s * s} * xor(3 * rx, ry) AS hd
  FROM (SELECT *,
               CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END AS rx,
               CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END AS ry
        FROM {prev})
)""")
    return ",\n".join(ctes) + f",\nhilberted AS (SELECT *, hd AS hkey FROM h{bits})"
