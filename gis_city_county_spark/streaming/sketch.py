"""Streaming count-min sketch: bounded-memory frequency counters
over an unbounded stream.

The batch sketch (``operators.sketch.countmin_cells``) is one
projection + one groupBy count — both streaming-legal — so the
streaming build IS the batch build applied to a ``readStream``
source, aggregated in update/complete mode.  No custom state handler
is needed: Spark's streaming aggregation state is exactly the sketch,
and it is bounded by construction at ``depth × width`` cells no
matter how many distinct keys the stream carries — the property that
makes count-min the right frequency structure for an unbounded
stream (exact per-key counts would grow state with cardinality).

Run-to-completion equivalence with the batch cells is pinned in
``tests/test_streaming.py`` — identical md5-seeded bucket hashing on
both paths, so the counters are bit-equal, not approximately equal.

Serving pattern at scale: the d·w cell relation is tiny (a few MB);
``foreachBatch`` can snapshot it to the store each trigger, and the
batch-side ``countmin_heavy_hitters`` probe (min over d cells per
key) answers point frequency queries against any snapshot.
"""

from __future__ import annotations

from gis_city_county_spark.operators.sketch import countmin_cells


def streaming_countmin_cells(
    spark,
    schema,
    path: str,
    key_col: str,
    width: int = 1 << 12,
    depth: int = 4,
    reader_options: dict | None = None,
):
    """File-source stream → live (d, b, cell) count-min counters.

    Aggregate in ``complete`` (or ``update``) output mode; state is
    ≤ ``depth × width`` rows.  ``reader_options`` reach the file
    source (e.g. ``{"maxFilesPerTrigger": 1}``)."""
    from pyspark.sql import functions as F

    reader = spark.readStream.schema(schema)
    for opt, val in (reader_options or {}).items():
        reader = reader.option(opt, val)
    stream = reader.parquet(path)
    rows = stream.select(F.col(key_col).cast("string").alias("__k"))
    return countmin_cells(rows, "__k", width, depth)


def countmin_delta_batch_folder(
    baseline_path: str,
    state_dir: str,
    report_dir: str,
    key_col: str,
    width: int = 1 << 12,
    depth: int = 4,
    k: int = 20,
):
    """foreachBatch fold for a LIVE heavy-hitter drift report: period A
    is yesterday's static snapshot (``baseline_path``), period B is the
    stream folded so far, and after every arriving batch the published
    report is bit-equal to running the batch ``countmin_delta`` over
    the baseline and every row arrived so far (asserted batch-by-batch
    in ``tests/test_streaming.py``).

    State is two slim parquet relations, both append-only and
    replay-idempotent (the quality-audit pattern: rows are keyed by
    ``batch_id`` and deterministic per batch, so a retry appends
    IDENTICAL rows and reads collapse them through DISTINCT):

    * ``cells`` — this batch's (d, b, cell) count-min partials from
      the shared build path :func:`operators.sketch.countmin_cells`;
      the live sketch is the per-(d, b) SUM (integer addition is
      associative, so folded partials == the one-shot build).
    * ``exact`` — this batch's per-key counts (the exact audit the
      drift report carries alongside the sketch estimates).

    The report itself is published through
    :func:`operators.sketch.countmin_delta_from_summaries` — the SAME
    function the batch operator ends in — into the report's
    ``batch_id`` partition with dynamic partition overwrite (retries
    replace, never duplicate).
    """
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.sketch import (
        countmin_delta_from_summaries,
    )

    cells_dir = f"{state_dir}/cells"
    exact_dir = f"{state_dir}/exact"

    def apply_batch(batch_df, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        sess = batch_df.sparkSession
        rows = batch_df.select(F.col(key_col).cast("string").alias("__k"))

        # 1. Fold this batch's summaries into state (append; replays
        #    append identical rows, reads are DISTINCT).
        countmin_cells(rows, "__k", width, depth).withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        ).write.mode("append").parquet(cells_dir)
        rows.groupBy("__k").agg(
            F.count(F.lit(1)).cast("bigint").alias("__n")
        ).withColumn(
            "batch_id", F.lit(batch_id).cast("bigint")
        ).write.mode("append").parquet(exact_dir)

        # 2. Publish the refreshed drift report from state + baseline.
        sk_b = (
            sess.read.parquet(cells_dir).distinct()
            .groupBy("__d", "__b")
            .agg(F.sum("__cell").cast("bigint").alias("__cell"))
        )
        ex_b = (
            sess.read.parquet(exact_dir).distinct()
            .groupBy("__k")
            .agg(F.sum("__n").cast("bigint").alias("exact_b"))
        )
        base = sess.read.parquet(baseline_path).select(
            F.col(key_col).cast("string").alias("__k")
        )
        sk_a = countmin_cells(base, "__k", width, depth)
        ex_a = base.groupBy("__k").agg(
            F.count(F.lit(1)).cast("bigint").alias("exact_a")
        )
        report = countmin_delta_from_summaries(
            sk_a, ex_a, sk_b, ex_b, key_col, width=width, depth=depth, k=k
        ).withColumn("batch_id", F.lit(batch_id).cast("bigint"))
        report.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(report_dir)

    return apply_batch


def streaming_countmin_delta(
    spark,
    schema,
    incoming_path: str,
    baseline_path: str,
    state_dir: str,
    report_dir: str,
    key_col: str,
    width: int = 1 << 12,
    depth: int = 4,
    k: int = 20,
    max_files_per_trigger: int = 1,
):
    """foreachBatch writer: fold each arriving batch into the live
    period's sketch + exact state and publish the refreshed
    baseline-vs-live drift report into its ``batch_id`` partition of
    ``report_dir``.  Returns a ``DataStreamWriter`` — caller
    ``.start()``s it."""
    apply_batch = countmin_delta_batch_folder(
        baseline_path, state_dir, report_dir, key_col, width, depth, k
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(incoming_path)
    )
    return stream.writeStream.foreachBatch(apply_batch).outputMode("update")


def streaming_hll_registers(
    spark,
    schema,
    path: str,
    key_col: str,
    group_col: str | None = None,
    p: int = 8,
    reader_options: dict | None = None,
):
    """File-source stream → live HyperLogLog register relation
    (same build path as batch ``operators.sketch.hll_registers``, so
    the registers are bit-equal run-to-completion).

    A register MAX is a streaming-legal aggregate; state is bounded
    at (groups × 2**p) rows no matter how many distinct keys the
    stream carries — the distinct-count analogue of the count-min
    bound above.  The estimate roll-up
    (``hll_estimate_from_registers``) runs batch-side on each
    snapshot (``foreachBatch`` at scale)."""
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.sketch import hll_registers

    reader = spark.readStream.schema(schema)
    for opt, val in (reader_options or {}).items():
        reader = reader.option(opt, val)
    stream = reader.parquet(path)
    groups = [group_col] if group_col else []
    rows = stream.select(
        *groups, F.col(key_col).cast("string").alias("__k")
    )
    return hll_registers(rows, groups, "__k", p)
