"""Scale helpers: partitioning decisions Catalyst cannot make.

Catalyst/AQE rebalance *after* shuffles, but the number of tasks in a
scan stage is fixed by file splits. When a narrow input (one parquet
file, one row group) feeds an explode-style fan-out (k-shingling is a
~100x row multiplier), the entire fan-out runs in as many tasks as
the scan had splits — one straggler task on a 32-slot cluster. The
fix is an explicit round-robin repartition *before* the fan-out,
applied only when the scan yields fewer splits than the cluster has
slots; on a real 100 TB scan the split count already exceeds
parallelism and this is a no-op.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    n_salt: int = 16,
) -> DataFrame:
    """Shuffle join that survives heavy skew in ``left``'s join keys.

    A plain shuffle join sends every row of a hot key to ONE reducer;
    at 100 TB a single key holding 1% of the fact table turns into a
    straggler task processing 1 TB. AQE's skew-join split handles sort
    -merge inputs it can see, but not joins hidden behind windows/aggs
    or non-split-able stages. This helper makes the fix explicit:

    - ``left`` rows get a deterministic salt in ``[0, n_salt)`` hashed
      from the whole row (xxhash64 — no RNG, so plan re-evaluation and
      task retries keep the same salt);
    - ``right`` is replicated ``n_salt``× via an inline explode;
    - the join key becomes (key..., salt), spreading each hot key over
      ``n_salt`` reducers.

    Correct for ``inner`` and ``left`` joins (each left row matches
    exactly the one right replica carrying its salt). ``right`` should
    be the smaller side — its shuffle volume multiplies by
    ``n_salt``."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    lft = left.withColumn("__salt", salt)
    rgt = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = lft.join(rgt, [*keys, "__salt"], how)
    return out.drop("__salt")


def salted_count_distinct(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase COUNT(DISTINCT x) GROUP BY k for skewed ``k``: first
    dedupe on (k, salt-spread x) — the heavy shuffle spreads each hot
    group over ``n_salt`` reducers because x rides in the key — then
    count per group. Returns ``(group_col, n_distinct)``.

    (Plain groupBy+countDistinct makes Catalyst shuffle all rows of a
    group to one reducer for the final exact count; the two-phase form
    shrinks that final shuffle to the already-deduped rows.)"""
    dedup = df.select(group_col, distinct_col).dropDuplicates([group_col, distinct_col])
    return dedup.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_distinct"))


def rebalance_for_fanout(df: DataFrame, multiplier: float = 8.0) -> DataFrame:
    """Repartition ``df`` to cluster parallelism iff its current plan
    produces materially fewer partitions than the cluster has slots.

    ``multiplier`` documents the expected row fan-out of the stage the
    caller is about to run (explode/posexplode); it gates the helper —
    stages that don't multiply rows shouldn't pay a shuffle.
    """
    if multiplier < 2.0:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # inputFiles() is a driver-side metadata lookup (no job, no
    # plan-to-RDD conversion). File count under-estimates split count
    # for large files (maxPartitionBytes splits them further), which
    # only errs toward skipping the shuffle on inputs that are already
    # wide — the safe direction.
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df.repartition(target)
    if n_files and n_files * 2 <= target:
        return df.repartition(target)
    return df


def bloom_prefilter(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_bits: int = 1 << 17,
    n_hashes: int = 3,
) -> DataFrame:
    """Bloom-filter semi-join reduction: filter ``big`` down to rows
    whose ``key`` is *probably* in ``small`` before an exact join —
    the standard trick for cutting a 100 TB fact-table shuffle when
    the dimension side's key set is selective but too large to
    broadcast as a hash set per-row.

    The filter is built once on the driver from ``small``'s distinct
    md5-hashed keys and shipped as a one-row broadcast ``array<long>``
    bitset (16 KB — data, not a plan literal: a giant string constant
    would blow the 64 KB codegen method limit and drop the stage to
    interpreted row-at-a-time eval); membership is
    ``shiftright(element_at(bits, word), bit) & 1`` conjunctions —
    pure Catalyst expressions, JVM-side. False positives only (no
    false negatives): the follow-up exact join keeps results
    identical, just with less shuffle input. Deterministic:
    md5-derived bit positions, no RNG.

    Sizing: default 2¹⁷ bits; with k=3 hashes the false-positive rate
    at |small| = 10⁴ keys is ~0.03%. Scale n_bits with |small|
    (m ≈ 14·n gives ~1% at k=3); the driver-side collect is of
    *hashes*, bounded by |small|'s distinct keys.
    """
    import struct

    hashes = (
        small.select(F.md5(F.col(key).cast("string")).alias("h")).distinct().collect()
    )
    words = [0] * (n_bits // 64)
    for row in hashes:
        h = row.h
        for i in range(n_hashes):
            # 8 hex chars (32 bits) per hash slice, independent slices
            pos = int(h[i * 8 : i * 8 + 8], 16) % n_bits
            words[pos // 64] |= 1 << (pos % 64)
    signed = [struct.unpack("q", struct.pack("Q", w))[0] for w in words]
    bits_df = big.sparkSession.createDataFrame([(signed,)], "__bloom_bits array<bigint>")
    probe = big.crossJoin(F.broadcast(bits_df))
    h = F.md5(F.col(key).cast("string"))
    pred = None
    for i in range(n_hashes):
        pos = F.conv(F.substring(h, i * 8 + 1, 8), 16, 10).cast("long") % n_bits
        probe = probe.withColumn(f"__bp{i}", pos)
        t = (
            F.expr(
                f"shiftright(element_at(__bloom_bits, CAST(__bp{i} div 64 AS INT) + 1),"
                f" CAST(__bp{i} % 64 AS INT)) & 1"
            )
            == 1
        )
        pred = t if pred is None else (pred & t)
    return probe.filter(pred).drop(
        "__bloom_bits", *[f"__bp{i}" for i in range(n_hashes)]
    )
