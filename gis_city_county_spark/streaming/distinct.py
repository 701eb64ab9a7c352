"""Streaming twin of the cumulative-distinct curve.

``operators.temporal.cumulative_distinct`` answers "how many entities
have we EVER seen as of each day" via the first-seen rewrite.  The
streaming form maintains the same curve as event batches arrive: the
state is the slim (key, first_day) relation — one row per distinct
key, never the events — folded with the same anti-join append as the
dedup funnel, and the published curve is recomputed from state only
(a per-day aggregate + calendar-bounded running sum, costing nothing
at any corpus size).

Replay-idempotent end to end: the state fold is an anti-join (a
retried batch appends nothing new), and the publish
partition-overwrites by ``batch_id`` (the card/quality pattern —
retries replace, never duplicate).

Caveat worth stating: a key's first_day is the minimum over arrivals
SO FAR — if an out-of-order batch later delivers an EARLIER event for
a known key, the batch operator over all data would assign the
earlier day.  The fold handles this: incoming (key, day) pairs MERGE
with state by min, implemented as "append only rows that beat the
stored day" plus a distinct-on-read min per key, so late data
converges to the batch answer (asserted in the equivalence test with
an out-of-order batch).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import functions as F


def _read_or_empty_like(sess, path: str, like):
    """Read the state dir, or an empty frame with ``like``'s schema
    (never a hardcoded one — the key column's type follows the
    caller's data)."""
    try:
        return sess.read.parquet(path)
    except AnalysisException as exc:
        msg = str(exc)
        if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
            raise
        # fresh-lineage empty frame (like.limit(0) would share lineage
        # with the incoming frame and trip the self-join detector in
        # the beat-the-stored-day comparison)
        return sess.createDataFrame([], like.schema)


def distinct_batch_folder(
    state_dir: str,
    curve_dir: str,
    key_col: str,
    ts_col: str,
):
    """The foreachBatch fold, exposed as a plain callable so the
    retry and out-of-order paths are directly testable."""
    seen_dir = f"{state_dir}/first_seen"

    def apply_batch(batch_df, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        sess = batch_df.sparkSession

        # 1. This batch's (key, min day) pairs.
        inc = (
            batch_df.select(
                F.col(key_col).alias("__k"),
                F.to_date(ts_col).alias("__day"),
            )
            .groupBy("__k")
            .agg(F.min("__day").alias("__day"))
            # A key with only NULL timestamps in this batch has a NULL
            # min — the batch operator drops NULL days (ADVICE r8), so
            # the fold must never let one into state; a later batch
            # with a real timestamp still inserts the key (min over
            # the union skips NULLs, matching the batch answer).
            .filter(F.col("__day").isNotNull())
        )
        # 2. Append only pairs that BEAT the stored first day (new key,
        #    or an out-of-order earlier arrival); reads take min per
        #    key, so a retry's identical append is harmless.  The
        #    empty-state schema derives from the batch itself (a
        #    hardcoded "long" key would ill-type the join for string
        #    keys and blow up under ANSI casts).
        base = _read_or_empty_like(sess, seen_dir, inc)
        better = inc.join(base, "__k", "left").filter(
            base["__day"].isNull() | (inc["__day"] < base["__day"])
        ).select(inc["__k"], inc["__day"])
        better.write.mode("append").parquet(seen_dir)

        # 3. Publish the refreshed curve from state only.
        first = (
            sess.read.parquet(seen_dir)
            .groupBy("__k")
            .agg(F.min("__day").alias("day"))
        )
        daily = first.groupBy("day").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_new")
        )
        from pyspark.sql import Window

        w = Window.orderBy("day").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        curve = daily.select(
            F.col("day").cast("timestamp").alias("day"),
            "n_new",
            F.sum("n_new").over(w).cast("bigint").alias("cum_distinct"),
            F.lit(batch_id).cast("bigint").alias("batch_id"),
        )
        curve.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(curve_dir)

    return apply_batch


def streaming_cumulative_distinct(
    spark,
    schema,
    incoming_path: str,
    state_dir: str,
    curve_dir: str,
    key_col: str,
    ts_col: str,
    max_files_per_trigger: int = 1,
):
    """foreachBatch writer: fold each arriving event batch's first-seen
    pairs into the state and publish the refreshed cumulative-distinct
    curve into its ``batch_id`` partition of ``curve_dir``.  Returns a
    ``DataStreamWriter`` — caller ``.start()``s it."""
    apply_batch = distinct_batch_folder(state_dir, curve_dir, key_col, ts_col)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(incoming_path)
    )
    return stream.writeStream.foreachBatch(apply_batch).outputMode("update")
