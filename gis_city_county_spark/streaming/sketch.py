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
