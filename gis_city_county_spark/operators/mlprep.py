"""ML feature-preparation operators: the hashing trick and one-hot
encoding as pure relational programs.

The hashing trick maps an unbounded token vocabulary into a fixed
``n_buckets``-dimensional sparse vector without any fitted state — no
vocabulary table, no dictionary broadcast, nothing to keep in sync
across training runs. That statelessness is what makes it the 100 TB
default: every executor computes buckets independently from the token
bytes alone.

Hash function: md5 tail (identical on Spark / DuckDB / Python) rather
than murmur3 — Spark's ``hash()`` has no DuckDB twin, and the oracle
contract needs bit-equal bucket ids on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gis_city_county_spark.operators.textstats import tokens, tokens_sql


def _bucket_expr(tok_expr: str, n_buckets: int) -> str:
    """Spark SQL: md5 tail (last 8 hex chars → 32-bit int) mod n."""
    return (
        f"cast(conv(substring(md5({tok_expr}), 25, 8), 16, 10) as bigint)"
        f" % {n_buckets}"
    )


def hash_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 256,
) -> DataFrame:
    """Hashing-trick featurization: tokens → md5 buckets → per-doc
    sparse vector as parallel sorted arrays (indices, counts).

    Relational shape: one explode (bounded by tokens-per-doc), one
    (id, bucket) count aggregate — map-side combinable, so shuffle
    volume is the *distinct* (doc, bucket) pairs, ≤ min(tokens,
    n_buckets) per doc — then one ``collect_list(struct)`` per doc
    re-assembled into sorted arrays. Output rows = input rows; no
    stage depends on vocabulary size.

    Output: ``(id, n_tokens, n_active, indices: array<int>,
    counts: array<bigint>)``."""
    toks = df.select(
        F.col(id_col).alias("__id"), F.explode(tokens(text_col)).alias("tok")
    ).withColumn("bucket", F.expr(_bucket_expr("tok", n_buckets)).cast("int"))
    per_bucket = toks.groupBy("__id", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    pairs = F.sort_array(F.collect_list(F.struct("bucket", "c")))
    return (
        per_bucket.groupBy("__id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_active"),
            pairs.alias("__pairs"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            "n_active",
            F.expr("transform(__pairs, p -> p.bucket)").alias("indices"),
            F.expr("transform(__pairs, p -> p.c)").alias("counts"),
        )
    )


def hash_features_sql(
    table_sql: str, id_col: str, text_col: str, n_buckets: int = 256
) -> str:
    """DuckDB oracle twin of :func:`hash_features`."""
    bucket = (
        f"CAST(('0x' || substr(md5(t.tok), 25, 8))::BIGINT % {n_buckets}"
        " AS INTEGER)"
    )
    return f"""
WITH toks AS (
  SELECT id, {bucket} AS bucket
  FROM (SELECT {id_col} AS id, {tokens_sql(text_col)} AS tl FROM ({table_sql})) s,
       LATERAL UNNEST(s.tl) AS t(tok)
),
per_bucket AS (
  SELECT id, bucket, COUNT(*) AS c FROM toks GROUP BY 1, 2
)
SELECT id AS {id_col},
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_active,
       list(bucket ORDER BY bucket) AS indices,
       list(c ORDER BY bucket) AS counts
FROM per_bucket GROUP BY id
"""


def one_hot(
    df: DataFrame, col: str, categories: list[str], out: str = "onehot"
) -> DataFrame:
    """Fixed-vocabulary one-hot encoding: a dense 0/1 int array in the
    order of ``categories`` (values outside the list encode as all
    zeros — the drop-unknown convention). Pure projection: no shuffle,
    no fitted state, codegen-friendly."""
    vec = F.array(
        *[(F.col(col) == F.lit(c)).cast("int") for c in categories]
    )
    return df.withColumn(out, vec)


def one_hot_sql(col: str, categories: list[str], out: str = "onehot") -> str:
    """DuckDB expression twin of :func:`one_hot` (select-list
    fragment)."""
    items = ", ".join(
        f"CAST({col} = '" + c.replace("'", "''") + "' AS INTEGER)"
        for c in categories
    )
    return f"[{items}] AS {out}"


def quantile_align(
    df,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    reference: str,
):
    """Quantile normalization against a reference cohort: every
    group's values are replaced by the reference group's value at the
    equivalent quantile position — the batch-effect/domain-shift
    aligner (classic quantile normalization, with a designated
    reference instead of the pooled average so everything stays
    discrete-exact).

    Mapping: a row at rank r of n in its group takes the reference
    value at index ``⌊(2r−1)·m/(2n)⌋ + 1`` (midpoint scaling into the
    reference's m sorted values) — all integer arithmetic, attached by
    an equi-join on the index against the broadcast reference ranks.
    Windows partition by group; only the reference cohort (a bounded
    calibration set by construction) is single-partition ranked.

    Output: ``(group, tiebreak, value, aligned)`` row-level."""
    from pyspark.sql import Window

    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("double").alias("__v"),
        F.col(tiebreak_col).alias("__t"),
    )
    wg = Window.partitionBy("__g").orderBy(F.col("__v").asc(), F.col("__t").asc())
    ranked = base.select(
        "__g", "__v", "__t",
        F.row_number().over(wg).alias("__r"),
        F.count(F.lit(1)).over(Window.partitionBy("__g")).alias("__n"),
    )
    ref = (
        base.filter(F.col("__g") == reference)
        .select(
            F.col("__v").alias("__refv"),
            F.row_number()
            .over(Window.orderBy(F.col("__v").asc(), F.col("__t").asc()))
            .alias("__i"),
        )
    )
    m = ref.groupBy().agg(F.count(F.lit(1)).alias("__m"))
    idx = F.expr(
        "CAST((CAST(2 * __r - 1 AS DECIMAL(38,0)) * __m) div (2 * __n) AS BIGINT) + 1"
    )
    return (
        ranked.crossJoin(F.broadcast(m))
        .withColumn("__i", idx)
        .join(F.broadcast(ref), "__i")
        .select(
            F.col("__g").alias(group_col),
            F.col("__t").alias(tiebreak_col),
            F.col("__v").alias(value_col),
            F.col("__refv").alias("aligned"),
        )
    )


def quantile_align_sql(
    table_sql: str,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    reference: str,
) -> str:
    """DuckDB oracle twin of :func:`quantile_align`."""
    return f"""
WITH base AS (
  SELECT {group_col} AS g, CAST({value_col} AS DOUBLE) AS v,
         {tiebreak_col} AS t
  FROM ({table_sql})
),
ranked AS (
  SELECT g, v, t,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY v ASC, t ASC) AS r,
         COUNT(*) OVER (PARTITION BY g) AS n
  FROM base
),
ref AS (
  SELECT v AS refv,
         ROW_NUMBER() OVER (ORDER BY v ASC, t ASC) AS i
  FROM base WHERE g = '{reference}'
),
m AS (SELECT COUNT(*) AS m FROM ref)
SELECT ranked.g AS {group_col}, ranked.t AS {tiebreak_col},
       ranked.v AS {value_col}, ref.refv AS aligned
FROM ranked CROSS JOIN m
JOIN ref ON ref.i = CAST((CAST(2 * ranked.r - 1 AS HUGEINT) * m.m)
                         // (2 * ranked.n) AS BIGINT) + 1
"""


# ------------------------------------------------------ target encoding


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    m: float = 10.0,
) -> DataFrame:
    """m-estimate (smoothed) target encoding: each category's encoded
    value is ``(sum_y + m·prior) / (n + m)`` where ``prior`` is the
    global target mean — the shrinkage that keeps a 3-row category
    from memorizing its targets.  The classic leakage-aware
    categorical feature for tabular models.

    Determinism: ``sum_y`` and the prior's numerator are exact
    DECIMAL(38,10) sums emitted as correctly-rounded doubles, and the
    remaining arithmetic is a fixed-order chain of single IEEE ops —
    bit-identical on any engine and any partitioning.

    Scale: ONE pass over the input — the per-category aggregate keeps
    its decimal sums, and the global prior folds those ≤ |categories|
    decimals again (decimal addition is exact and associative, so the
    two-level sum equals a direct global sum bit-for-bit); the input
    is never re-scanned for the prior.  No windows, no sort.

    Returns (cat_col, n, sum_y, prior, encoded).
    """
    per_cat = df.groupBy(cat_col).agg(
        F.count(target_col).alias("n"),
        F.sum(F.col(target_col).cast("decimal(38,10)")).alias("__sy_dec"),
    )
    prior = per_cat.agg(
        (F.sum("__sy_dec").cast("double") / F.sum("n")).alias("prior")
    )
    enc = (
        (F.col("sum_y") + F.lit(float(m)) * F.col("prior"))
        / (F.col("n").cast("double") + F.lit(float(m)))
    )
    return (
        per_cat.withColumn("sum_y", F.col("__sy_dec").cast("double"))
        .crossJoin(F.broadcast(prior))
        .withColumn("encoded", enc)
        .select(cat_col, "n", "sum_y", "prior", "encoded")
    )


def target_encode_sql(
    table: str, cat_col: str, target_col: str, m: float = 10.0
) -> str:
    from gis_city_county_spark.functions.numeric import dec_sum_sql

    dec = f"CAST(CAST(SUM(CAST(({target_col}) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"
    return f"""
WITH per_cat AS (
  SELECT {cat_col}, COUNT({target_col}) AS n, {dec_sum_sql(target_col, 'sum_y')}
  FROM {table} GROUP BY {cat_col}
),
prior AS (SELECT {dec} / COUNT({target_col}) AS prior FROM {table})
SELECT {cat_col}, n, sum_y, prior,
       (sum_y + {float(m)} * prior) / (CAST(n AS DOUBLE) + {float(m)}) AS encoded
FROM per_cat CROSS JOIN prior
"""


# --------------------------------------------------- curriculum phases


def curriculum_phases(
    df: DataFrame,
    key_col: str,
    difficulty_col: str,
    n_phases: int = 4,
) -> DataFrame:
    """Curriculum-learning phase assignment summarized per phase:
    rows rank by ``(difficulty asc, key asc)`` — a strict total order
    — and phase ``p`` of ``n_phases`` is ``(rank-1)·n_phases div N``,
    so phases are equal-width rank bands (easiest band first), the
    deterministic "train on easy docs first" schedule.

    Scale: the global rank runs through the two-phase range-bucketed
    :func:`operators.scale.ranged_rank` (no single-partition window
    anywhere); N rides along as a 1-row broadcast.

    Returns per phase: (phase, n_rows, min/max difficulty).
    """
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
        ranged_rank,
    )

    # ranked feeds the N census AND the phase rollup — materialize
    # once (guide §3.3; r12-before plan: 10 Exchange / 6 scans)
    ranked = _materialize_for_multipass(
        ranged_rank(
            df.select(F.col(key_col), F.col(difficulty_col)),
            primary=difficulty_col,
            tiebreak=key_col,
            rank_col="__rk",
            descending=False,
        )
    )
    n = ranked.agg(F.count(F.lit(1)).alias("__n"))
    # Integer `div`, never double-divide-then-cast: Spark's double→
    # bigint cast truncates but DuckDB's rounds, so a boundary rank
    # would land in different phases on the two engines.
    return (
        ranked.crossJoin(F.broadcast(n))
        .withColumn(
            "phase",
            F.expr(f"((__rk - 1) * {int(n_phases)}) div __n"),
        )
        .groupBy("phase")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(difficulty_col).alias("min_difficulty"),
            F.max(difficulty_col).alias("max_difficulty"),
        )
    )


def curriculum_phases_sql(
    table: str, key_col: str, difficulty_col: str, n_phases: int = 4
) -> str:
    return f"""
WITH ranked AS (
  SELECT {key_col}, {difficulty_col},
         ROW_NUMBER() OVER (ORDER BY {difficulty_col} ASC NULLS FIRST,
                            {key_col} ASC) AS rk
  FROM {table}
),
n AS (SELECT COUNT(*) AS n FROM ranked)
SELECT CAST((rk - 1) * {n_phases} // n AS BIGINT) AS phase,
       COUNT(*) AS n_rows,
       MIN({difficulty_col}) AS min_difficulty,
       MAX({difficulty_col}) AS max_difficulty
FROM ranked CROSS JOIN n
GROUP BY 1
"""


# --------------------------------------------------- calibration bins


def calibration_bins(
    df: DataFrame,
    pred_milli_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a classifier score: predictions
    arrive as exact MILLI-units (0..999 integers — the engine-portable
    way to carry probabilities), bin ``b = pred_milli·n_bins div
    1000``, and each bin reports its mean prediction vs. observed
    positive rate plus the absolute gap (the per-bin term of expected
    calibration error).

    Everything before the final three divisions is exact integer
    arithmetic; the divisions are single IEEE ops on exact BIGINTs —
    bit-identical on any engine.

    Returns (bin, n, avg_pred, frac_pos, abs_gap).
    """
    binned = df.withColumn(
        "bin",
        F.expr(f"(({pred_milli_col} * {int(n_bins)}) div 1000)"),
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(pred_milli_col).alias("__sp"),
        F.sum(F.col(label_col).cast("bigint")).alias("__pos"),
    )
    avg_pred = F.col("__sp").cast("double") / F.lit(1000.0) / F.col("n").cast("double")
    frac_pos = F.col("__pos").cast("double") / F.col("n").cast("double")
    return (
        agg.withColumn("avg_pred", avg_pred)
        .withColumn("frac_pos", frac_pos)
        .withColumn("abs_gap", F.abs(F.col("avg_pred") - F.col("frac_pos")))
        .select("bin", "n", "avg_pred", "frac_pos", "abs_gap")
    )


def calibration_bins_sql(
    table: str, pred_milli_col: str, label_col: str, n_bins: int = 10
) -> str:
    return f"""
WITH agg AS (
  SELECT CAST(({pred_milli_col} * {n_bins}) // 1000 AS BIGINT) AS bin,
         COUNT(*) AS n,
         CAST(SUM({pred_milli_col}) AS BIGINT) AS sp,
         CAST(SUM(CAST({label_col} AS BIGINT)) AS BIGINT) AS pos
  FROM {table} GROUP BY 1
)
SELECT bin, n,
       CAST(sp AS DOUBLE) / 1000.0 / CAST(n AS DOUBLE) AS avg_pred,
       CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos,
       abs(CAST(sp AS DOUBLE) / 1000.0 / CAST(n AS DOUBLE)
           - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) AS abs_gap
FROM agg
"""


# ------------------------------------------------ stratified k-fold


def kfold_stratified(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    target_col: str,
    n_folds: int = 5,
) -> DataFrame:
    """Deterministic k-fold assignment with a per-(stratum, fold)
    balance report: fold = md5-tail(key) mod k — stable across runs,
    engines, and corpus rebuilds, the same property as the train/val/
    test split — and the report (row count + decimal-exact target
    mean per cell) is how you VERIFY the stratification held: every
    stratum's folds should agree on n within sampling noise and on
    the target mean.

    Scale: a pure projection then one map-side-combinable aggregate;
    no windows, no sort, no driver state.

    Returns (stratum_col, fold, n, mean_target).
    """
    from gis_city_county_spark.functions.numeric import dec_avg
    from gis_city_county_spark.operators.sketch import _h60

    fold = (_h60(F.col(key_col).cast("string")) % n_folds).alias("fold")
    return (
        df.select(F.col(stratum_col), fold, F.col(target_col))
        .groupBy(stratum_col, "fold")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_avg(F.col(target_col), "mean_target"),
        )
    )


def kfold_stratified_sql(
    table: str,
    key_col: str,
    stratum_col: str,
    target_col: str,
    n_folds: int = 5,
) -> str:
    from gis_city_county_spark.functions.numeric import dec_avg_sql
    from gis_city_county_spark.operators.sketch import _h60_sql

    fold = f"{_h60_sql(f'CAST({key_col} AS VARCHAR)')} % {n_folds}"
    return f"""
SELECT {stratum_col}, {fold} AS fold,
       COUNT(*) AS n,
       {dec_avg_sql(target_col, 'mean_target')}
FROM {table}
GROUP BY 1, 2
"""


def winsorize_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
) -> DataFrame:
    """Per-group winsorized summary: rows rank by the RAW value with
    (value, id) total order, the ``lo_pct``/``hi_pct`` cut rows are
    the exact k = ceil(n·pct/100) ranks, and the FLOORED integer
    values clamp to those cuts (floor, not a bare bigint cast — Spark
    truncates but DuckDB rounds half-even, so fractional inputs would
    diverge) — the outlier-robust feature scaling a training pipeline
    applies before normalization, with engine-exact cut points
    instead of interpolated percentiles.

    Scale: every window partitions BY THE GROUP (task work bounded by
    group size, no global sort); the cut values reduce to |groups|
    rows that broadcast back; integer ceil via ``div`` keeps the rank
    arithmetic exact on both engines; the mean is one IEEE division of
    exact BIGINT sums.

    NULL values are dropped up front on BOTH engines (the contract is
    stats over the NON-NULL values): without the filter Spark's
    default ascending sort puts NULLS FIRST while DuckDB's puts them
    LAST, shifting the p5/p95 cut ranks differently per engine — and
    NULL rows would still inflate n while contributing nothing to the
    sum.

    Returns (group, n, lo_cut, hi_cut, win_sum, win_mean).
    """
    from pyspark.sql import Window

    # Rank by the RAW value (both engines order doubles identically)
    # and clamp the FLOORED value: floor matches on every engine,
    # whereas a bare bigint cast truncates in Spark but rounds
    # half-even in DuckDB (5.7 -> 5 vs 6).
    w = Window.partitionBy(group_col).orderBy(
        F.col("__vraw").asc(), F.col("__id").asc()
    )
    ranked = df.filter(F.col(value_col).isNotNull()).select(
        group_col,
        F.col(value_col).alias("__vraw"),
        F.col(id_col).alias("__id"),
    ).withColumn(
        "__v", F.floor("__vraw").cast("bigint")
    ).withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(group_col))
    )
    k_lo = F.expr(f"(__n * {lo_pct} + 99) div 100")
    k_hi = F.expr(f"(__n * {hi_pct} + 99) div 100")
    cuts = (
        ranked.withColumn("__klo", k_lo)
        .withColumn("__khi", k_hi)
        .groupBy(group_col)
        .agg(
            F.min(F.when(F.col("__rn") == F.col("__klo"), F.col("__v"))).alias(
                "lo_cut"
            ),
            F.min(F.when(F.col("__rn") == F.col("__khi"), F.col("__v"))).alias(
                "hi_cut"
            ),
            F.max("__n").alias("n"),
        )
    )
    clamped = ranked.join(F.broadcast(cuts), group_col).select(
        group_col,
        "n",
        "lo_cut",
        "hi_cut",
        F.greatest(F.col("lo_cut"), F.least(F.col("hi_cut"), F.col("__v"))).alias(
            "__w"
        ),
    )
    return (
        clamped.groupBy(group_col, "n", "lo_cut", "hi_cut")
        .agg(F.sum("__w").alias("win_sum"))
        .select(
            group_col,
            F.col("n").cast("bigint").alias("n"),
            "lo_cut",
            "hi_cut",
            F.col("win_sum").cast("bigint").alias("win_sum"),
            (
                F.col("win_sum").cast("double") / F.col("n").cast("double")
            ).alias("win_mean"),
        )
    )


def winsorize_stats_sql(
    table: str,
    group_col: str,
    value_col: str,
    id_col: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
) -> str:
    return f"""
WITH ranked AS (
  -- NULL values dropped (matches the engine): Spark sorts NULLS FIRST
  -- ascending, DuckDB NULLS LAST — unfiltered NULLs would shift the
  -- cut ranks differently per engine.
  SELECT {group_col},
         CAST(FLOOR({value_col}) AS BIGINT) AS v,
         ROW_NUMBER() OVER (PARTITION BY {group_col}
                            ORDER BY {value_col} ASC, {id_col} ASC) AS rn,
         COUNT(*) OVER (PARTITION BY {group_col}) AS n
  FROM {table}
  WHERE {value_col} IS NOT NULL
),
cuts AS (
  SELECT {group_col},
         MIN(CASE WHEN rn = (n * {lo_pct} + 99) // 100 THEN v END) AS lo_cut,
         MIN(CASE WHEN rn = (n * {hi_pct} + 99) // 100 THEN v END) AS hi_cut,
         MAX(n) AS n
  FROM ranked GROUP BY {group_col}
)
SELECT r.{group_col},
       CAST(c.n AS BIGINT) AS n,
       c.lo_cut, c.hi_cut,
       CAST(SUM(GREATEST(c.lo_cut, LEAST(c.hi_cut, r.v))) AS BIGINT) AS win_sum,
       CAST(CAST(SUM(GREATEST(c.lo_cut, LEAST(c.hi_cut, r.v))) AS BIGINT) AS DOUBLE)
         / CAST(c.n AS DOUBLE) AS win_mean
FROM ranked r JOIN cuts c ON r.{group_col} = c.{group_col}
GROUP BY r.{group_col}, c.n, c.lo_cut, c.hi_cut
"""


def brier_decomposition(
    df: DataFrame,
    pred_milli_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Murphy decomposition of the Brier score over reliability bins:
    ``brier = reliability - resolution + uncertainty`` — the one-row
    health report that says whether a classifier's error comes from
    MIScalibration (reliability), from failing to separate classes
    (low resolution), or is irreducible class noise (uncertainty).

    Engine-exact recipe: predictions arrive as exact milli-units, so
    every per-bin numerator ((sp_b - 1000·pos_b), pos_b, n_b) is an
    exact BIGINT; each per-bin term is then a FIXED chain of
    correctly-rounded IEEE ops on those exact operands, and the ≤
    ``n_bins`` per-bin terms fold in canonical sorted order (the
    k-means pattern), so both engines run the identical float
    program.  One corpus aggregate to n_bins rows; nothing else
    touches the data.

    Input contract: ``pred_milli_col`` is a probability in exact
    milli-units, i.e. an integer in **[0, 1000]**.  The bin id is
    clamped to ``[0, n_bins - 1]`` on BOTH engines, so the boundary
    value 1000 (probability exactly 1.0) lands in the top bin instead
    of an 11th out-of-range bin, and out-of-contract negatives cannot
    diverge cross-engine (Spark's ``div`` truncates toward zero while
    DuckDB's ``//`` floors — the clamp collapses both to bin 0).

    Returns one row: (n, pos, base_rate, uncertainty, reliability,
    resolution, brier).
    """
    binned = df.withColumn(
        "__bin",
        F.expr(
            f"least(greatest(({pred_milli_col} * {int(n_bins)}) div 1000,"
            f" 0), {int(n_bins) - 1})"
        ),
    )
    bins = binned.groupBy("__bin").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(pred_milli_col).cast("bigint").alias("__sp"),
        F.sum(F.col(label_col).cast("bigint")).cast("bigint").alias("__pos"),
    )
    # grand totals via an unpartitioned window over the ≤ n_bins bin
    # rows — bounded input, one corpus pass total, and no
    # shared-lineage self-join for Spark's ambiguity detector to trip
    from pyspark.sql import Window

    wall = Window.partitionBy()
    tot_n = F.sum("__n").over(wall).cast("bigint")
    tot_pos = F.sum("__pos").over(wall).cast("bigint")
    terms = bins.select(
        "__bin", "__n", "__sp", "__pos",
        tot_n.alias("__totn"), tot_pos.alias("__totpos"),
    ).select(
        "__totn",
        "__totpos",
        (
            F.col("__sp").cast("double") - F.lit(1000.0) * F.col("__pos").cast("double")
        ).alias("__d"),
        (F.col("__pos").cast("double") / F.col("__n").cast("double")).alias("__ob"),
        (F.col("__totpos").cast("double") / F.col("__totn").cast("double")).alias("__obar"),
        F.col("__n").cast("double").alias("__nd"),
    ).select(
        "__totn",
        "__totpos",
        (F.col("__d") * F.col("__d") / F.lit(1000000.0) / F.col("__nd")).alias(
            "__rel_term"
        ),
        (
            F.col("__nd")
            * ((F.col("__ob") - F.col("__obar")) * (F.col("__ob") - F.col("__obar")))
        ).alias("__res_term"),
    )

    def _fold(col: str):
        return F.aggregate(
            F.array_sort(F.collect_list(F.col(col))), F.lit(0.0),
            lambda a, x: a + x,
        )

    out = terms.groupBy("__totn", "__totpos").agg(
        _fold("__rel_term").alias("__rel_sum"),
        _fold("__res_term").alias("__res_sum"),
    )
    base = F.col("__totpos").cast("double") / F.col("__totn").cast("double")
    unc = base * (
        (F.col("__totn") - F.col("__totpos")).cast("double") / F.col("__totn").cast("double")
    )
    rel = F.col("__rel_sum") / F.col("__totn").cast("double")
    res = F.col("__res_sum") / F.col("__totn").cast("double")
    return out.select(
        F.col("__totn").alias("n"),
        F.col("__totpos").alias("pos"),
        base.alias("base_rate"),
        unc.alias("uncertainty"),
        rel.alias("reliability"),
        res.alias("resolution"),
        (rel - res + unc).alias("brier"),
    )


def brier_decomposition_sql(
    table: str, pred_milli_col: str, label_col: str, n_bins: int = 10
) -> str:
    return f"""
WITH binned AS (
  SELECT LEAST(GREATEST(({pred_milli_col} * {n_bins}) // 1000, 0),
               {int(n_bins) - 1}) AS bin,
         {pred_milli_col} AS pm, CAST({label_col} AS BIGINT) AS lab
  FROM {table}
),
bins AS (
  SELECT bin, COUNT(*) AS n, CAST(SUM(pm) AS BIGINT) AS sp,
         CAST(SUM(lab) AS BIGINT) AS pos
  FROM binned GROUP BY bin
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS totn, CAST(SUM(pos) AS BIGINT) AS totpos
  FROM bins
),
terms AS (
  SELECT totn, totpos,
         (CAST(sp AS DOUBLE) - 1000.0 * CAST(pos AS DOUBLE))
           * (CAST(sp AS DOUBLE) - 1000.0 * CAST(pos AS DOUBLE))
           / 1000000.0 / CAST(n AS DOUBLE) AS rel_term,
         CAST(n AS DOUBLE)
           * ((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
               - CAST(totpos AS DOUBLE) / CAST(totn AS DOUBLE))
              * (CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
                 - CAST(totpos AS DOUBLE) / CAST(totn AS DOUBLE))) AS res_term
  FROM bins CROSS JOIN tot
),
folded AS (
  SELECT totn, totpos,
         list_reduce(list_sort(list(rel_term)), (a, b) -> a + b) AS rel_sum,
         list_reduce(list_sort(list(res_term)), (a, b) -> a + b) AS res_sum
  FROM terms GROUP BY totn, totpos
)
SELECT totn AS n, totpos AS pos,
       CAST(totpos AS DOUBLE) / CAST(totn AS DOUBLE) AS base_rate,
       (CAST(totpos AS DOUBLE) / CAST(totn AS DOUBLE))
         * (CAST(totn - totpos AS DOUBLE) / CAST(totn AS DOUBLE)) AS uncertainty,
       rel_sum / CAST(totn AS DOUBLE) AS reliability,
       res_sum / CAST(totn AS DOUBLE) AS resolution,
       rel_sum / CAST(totn AS DOUBLE) - res_sum / CAST(totn AS DOUBLE)
         + (CAST(totpos AS DOUBLE) / CAST(totn AS DOUBLE))
           * (CAST(totn - totpos AS DOUBLE) / CAST(totn AS DOUBLE)) AS brier
FROM folded
"""


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Exact Average Precision (area under the precision-recall
    curve, step interpolation): AP = mean over positives of
    precision@k at each positive's rank — the ranking-eval companion
    to ``exact_auc`` for imbalanced labels, where ROC-AUC flatters.

    Engine-exact: the global rank and the running positive count both
    run through the two-phase range-bucketed plans (``ranged_rank`` /
    ``ranged_cumsum`` — no single-partition window over the corpus);
    precision@k is integer ppm (``cum_pos·1e6 div k``), summed as
    BIGINTs, and AP is ONE final IEEE division.

    Returns one row: (n, n_pos, sum_prec_ppm, ap_ppm, ap).
    """
    from gis_city_county_spark.operators.scale import ranged_rank_cumsum

    base = df.select(
        F.col(score_col).alias("__score"),
        F.col(label_col).cast("bigint").alias("__lab"),
        F.col(tiebreak_col).alias("__tb"),
    )
    # Rank and running positive count share the (score, tiebreak)
    # order — ONE fused two-phase pass (r12): the former
    # ranged_rank → ranged_cumsum chain paid a second checkpoint,
    # cut-point job, offsets collect, and bucket sort over the frame
    # the first pass had already ordered.
    cum = ranged_rank_cumsum(
        base, "__score", "__tb", "__lab",
        rank_col="__k", cum_col="__cum", descending=True,
    )
    prec = cum.select(
        "__lab",
        F.expr("(__cum * CAST(1000000 AS BIGINT)) div __k").alias("__p_ppm"),
    )
    return prec.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__lab").cast("bigint").alias("n_pos"),
        F.sum(F.when(F.col("__lab") == 1, F.col("__p_ppm"))).cast("bigint")
        .alias("sum_prec_ppm"),
    ).select(
        "n",
        "n_pos",
        "sum_prec_ppm",
        F.expr("sum_prec_ppm div n_pos").alias("ap_ppm"),
        (
            F.col("sum_prec_ppm").cast("double") / F.col("n_pos").cast("double")
        ).alias("ap"),
    )


def average_precision_sql(
    table: str, score_col: str, label_col: str, tiebreak_col: str
) -> str:
    return f"""
WITH scored AS (
  SELECT {score_col} AS s, CAST({label_col} AS BIGINT) AS lab,
         {tiebreak_col} AS tb
  FROM {table}
),
r AS (
  SELECT lab,
         ROW_NUMBER() OVER (ORDER BY s DESC, tb ASC) AS k,
         CAST(SUM(lab) OVER (ORDER BY s DESC, tb ASC
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM scored
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(lab) AS BIGINT) AS n_pos,
         CAST(SUM(CASE WHEN lab = 1
                       THEN (cum * CAST(1000000 AS BIGINT)) // k END)
              AS BIGINT) AS sum_prec_ppm
  FROM r
)
SELECT n, n_pos, sum_prec_ppm,
       CAST(sum_prec_ppm // n_pos AS BIGINT) AS ap_ppm,
       CAST(sum_prec_ppm AS DOUBLE) / CAST(n_pos AS DOUBLE) AS ap
FROM agg
"""


def mean_reciprocal_rank(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Exact Mean Reciprocal Rank: within each query group, rank by
    score (desc, tiebreak asc) and take the reciprocal rank of the
    FIRST relevant item — the standard first-hit retrieval metric,
    chosen over NDCG because the log2 discount is not bit-portable
    while ``1e6 div rank`` is exact integer arithmetic.

    Scale: the rank window partitions BY THE QUERY GROUP (task work
    bounded by group size), the first-positive reduce is one
    map-combinable MIN, and the final roll-up is exact BIGINT sums
    with two single IEEE divisions (MRR over answered queries, and
    over all queries with misses scored 0).

    Returns one row: (n_queries, n_answered, sum_rr_ppm,
    mrr_answered, mrr_all).
    """
    from pyspark.sql import Window

    # NULL query groups are excluded on BOTH engines: Spark's
    # distinct() would keep a NULL row while SQL COUNT(DISTINCT)
    # drops it — filtering up front makes the semantics explicit and
    # engine-identical.
    base = df.filter(F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("__g"),
        F.col(score_col).alias("__s"),
        F.col(label_col).cast("boolean").alias("__lab"),
        F.col(tiebreak_col).alias("__tb"),
    )
    w = Window.partitionBy("__g").orderBy(
        F.col("__s").desc(), F.col("__tb").asc()
    )
    ranked = base.withColumn("__k", F.row_number().over(w))
    first_pos = (
        ranked.filter(F.col("__lab"))
        .groupBy("__g")
        .agg(F.min("__k").alias("__fk"))
        .select(F.expr("CAST(1000000 AS BIGINT) div __fk").alias("__rr_ppm"))
    )
    totals = base.select("__g").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries")
    )
    hits = first_pos.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_answered"),
        F.sum("__rr_ppm").cast("bigint").alias("sum_rr_ppm"),
    )
    return totals.crossJoin(F.broadcast(hits)).select(
        "n_queries",
        "n_answered",
        "sum_rr_ppm",
        (
            F.col("sum_rr_ppm").cast("double") / F.col("n_answered").cast("double")
        ).alias("mrr_answered"),
        (
            F.col("sum_rr_ppm").cast("double") / F.col("n_queries").cast("double")
        ).alias("mrr_all"),
    )


def mean_reciprocal_rank_sql(
    table: str,
    group_col: str,
    score_col: str,
    label_col: str,
    tiebreak_col: str,
) -> str:
    return f"""
WITH ranked AS (
  SELECT {group_col} AS g, CAST({label_col} AS BOOLEAN) AS lab,
         ROW_NUMBER() OVER (PARTITION BY {group_col}
                            ORDER BY {score_col} DESC, {tiebreak_col} ASC) AS k
  FROM {table} WHERE {group_col} IS NOT NULL
),
first_pos AS (
  SELECT CAST(1000000 AS BIGINT) // MIN(k) AS rr_ppm
  FROM ranked WHERE lab GROUP BY g
),
totals AS (
  SELECT CAST(COUNT(DISTINCT {group_col}) AS BIGINT) AS n_queries FROM {table}
),
hits AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_answered,
         CAST(SUM(rr_ppm) AS BIGINT) AS sum_rr_ppm
  FROM first_pos
)
SELECT n_queries, n_answered, sum_rr_ppm,
       CAST(sum_rr_ppm AS DOUBLE) / CAST(n_answered AS DOUBLE) AS mrr_answered,
       CAST(sum_rr_ppm AS DOUBLE) / CAST(n_queries AS DOUBLE) AS mrr_all
FROM totals CROSS JOIN hits
"""


def ndcg_at_k(
    df: DataFrame,
    group_col: str,
    score_col: str,
    rel_col: str,
    id_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact per-query NDCG@k — the graded-relevance ranking metric a
    retrieval/rerank training pipeline reports next to MRR and AP:
    DCG@k over the model ordering divided by the ideal ordering's
    DCG@k.

    Engine-exact without libm: the k log2 discounts are precomputed in
    PYTHON and embedded as identical decimal literals in both plans
    (``repr`` round-trips a double exactly, and both engines parse a
    literal to the nearest double — the same one), each per-rank term
    is one IEEE multiply of an exact integer gain by that literal, and
    the ≤ k terms fold LEFT-TO-RIGHT IN RANK ORDER on both engines
    (Spark ``aggregate(array_sort(collect_list(struct(rank, term))))``
    == DuckDB ``list_reduce(list(term ORDER BY rank))`` — the k-means
    fold pattern with rank as the canonical order).

    Scale: both rankings are windows PARTITIONED BY THE QUERY GROUP
    (task work bounded by group size); no global sort anywhere.
    NULL relevance rows are dropped up front (documented contract —
    the winsorize NULL rule).

    Returns (group, n_items, dcg, idcg, ndcg) with ndcg NULL when the
    group has no positive relevance in its ideal top-k (idcg = 0).
    """
    import math

    from pyspark.sql import Window

    disc = {r: 1.0 / math.log2(r + 1) for r in range(1, k + 1)}
    # VARCHAR→DOUBLE, not a bare decimal literal: both engines parse
    # strings with correctly-rounded strtod, while DuckDB types a bare
    # literal DECIMAL and its DECIMAL→DOUBLE cast is incorrectly
    # rounded (1-ulp divergence seen at sf0.01).
    def _disc_expr(rn: str) -> str:
        return "CASE " + " ".join(
            f"WHEN {rn} = {r} THEN CAST('{disc[r]!r}' AS DOUBLE)"
            for r in range(1, k + 1)
        ) + " END"

    base = df.filter(F.col(rel_col).isNotNull()).select(
        F.col(group_col).alias("__g"),
        F.col(score_col).alias("__s"),
        F.col(rel_col).cast("bigint").alias("__rel"),
        F.col(id_col).alias("__id"),
    )
    # Both rankings partition by the SAME group key, so they share
    # ONE exchange (two in-pass sorts), and the DCG/IDCG/count fold
    # into a single group aggregate — the old shape paid three
    # evaluations of base, two window shuffles and two joins (guide
    # §2.4; r12-before plan of eval_ndcg_at_k: 6 Exchange / 6 scans).
    # collect_list skips the NULLs the `rank ≤ k` guard produces, so
    # the folded arrays are exactly the old filtered top-k terms.
    wm = Window.partitionBy("__g").orderBy(F.desc("__s"), F.asc("__id"))
    wi = Window.partitionBy("__g").orderBy(F.desc("__rel"), F.asc("__id"))
    ranked = (
        base.withColumn("__rm", F.row_number().over(wm))
        .withColumn("__ri", F.row_number().over(wi))
        .withColumn(
            "__tm",
            F.when(
                F.col("__rm") <= k,
                F.col("__rel").cast("double") * F.expr(_disc_expr("__rm")),
            ),
        )
        .withColumn(
            "__ti",
            F.when(
                F.col("__ri") <= k,
                F.col("__rel").cast("double") * F.expr(_disc_expr("__ri")),
            ),
        )
    )

    def _fold(rn: str, term: str):
        return F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col(term).isNotNull(),
                        F.struct(F.col(rn), F.col(term).alias("__term")),
                    )
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x["__term"],
        )

    return (
        ranked.groupBy("__g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            _fold("__rm", "__tm").alias("dcg"),
            _fold("__ri", "__ti").alias("idcg"),
        )
        .select(
            F.col("__g").alias(group_col),
            "n_items",
            "dcg",
            "idcg",
            F.when(F.col("idcg") == 0.0, F.lit(None).cast("double"))
            .otherwise(F.col("dcg") / F.col("idcg"))
            .alias("ndcg"),
        )
    )


def ndcg_at_k_sql(
    source_sql: str,
    group_col: str,
    score_col: str,
    rel_col: str,
    id_col: str,
    k: int = 10,
) -> str:
    import math

    disc = {r: 1.0 / math.log2(r + 1) for r in range(1, k + 1)}
    # CAST('…' AS DOUBLE): see the engine twin — bare decimal literals
    # go through DuckDB's incorrectly-rounded DECIMAL→DOUBLE cast.
    disc_expr = "CASE " + " ".join(
        f"WHEN rn = {r} THEN CAST('{disc[r]!r}' AS DOUBLE)"
        for r in range(1, k + 1)
    ) + " END"
    return f"""
WITH base AS (
  SELECT {group_col} AS g, {score_col} AS s,
         CAST({rel_col} AS BIGINT) AS rel, {id_col} AS id
  FROM ({source_sql}) WHERE {rel_col} IS NOT NULL
),
model AS (
  SELECT g, rel,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY s DESC, id ASC) AS rn
  FROM base
),
ideal AS (
  SELECT g, rel,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY rel DESC, id ASC) AS rn
  FROM base
),
dcg AS (
  SELECT g, list_reduce(list(CAST(rel AS DOUBLE) * ({disc_expr})
                             ORDER BY rn), (a, b) -> a + b) AS dcg
  FROM model WHERE rn <= {k} GROUP BY g
),
idcg AS (
  SELECT g, list_reduce(list(CAST(rel AS DOUBLE) * ({disc_expr})
                             ORDER BY rn), (a, b) -> a + b) AS idcg
  FROM ideal WHERE rn <= {k} GROUP BY g
),
n AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_items FROM base GROUP BY g)
SELECT n.g AS {group_col}, n.n_items, dcg.dcg, idcg.idcg,
       CASE WHEN idcg.idcg = 0.0 THEN CAST(NULL AS DOUBLE)
            ELSE dcg.dcg / idcg.idcg END AS ndcg
FROM n JOIN dcg ON n.g = dcg.g JOIN idcg ON n.g = idcg.g
"""


def cohens_kappa(df: DataFrame, rater_a: str, rater_b: str) -> DataFrame:
    """Cohen's kappa between two categorical labelers — the
    chance-corrected agreement a labeling pipeline reports when two
    annotators (or a model and a heuristic) tag the same rows.

    Engine-exact: with N rows, A agreements, and per-class marginals
    r_k (rater-a count) and c_k (rater-b count),

        kappa = (N·A − Σ r_k·c_k) / (N² − Σ r_k·c_k)

    — every term an exact DECIMAL(38,0) product of BIGINT counts
    (N² at 10¹¹ rows overflows int64; decimal numerators are the
    t-closeness convention), and kappa is ONE IEEE division of the
    two exact numerators, so both engines emit the same double.
    Rows where either label is NULL are dropped (documented
    contract).  Marginal products are an equi-join on the class
    value between two map-combinable aggregates — no window, no
    cross join; classes seen by only one rater contribute 0.

    Returns one row: (n_rows, n_agree, n_classes_a, n_classes_b,
    pe_num, kappa) where pe_num = Σ r_k·c_k and kappa is NULL when
    the denominator is 0 (a single-class degenerate labeling).
    pe_num is DECIMAL(28,0): wide enough for 10¹⁴ labeled rows, and
    narrow enough that the N·A − pe subtraction stays ≤ 38 digits —
    DuckDB silently promotes a 39-digit decimal op to DOUBLE.
    """
    base = df.filter(
        F.col(rater_a).isNotNull() & F.col(rater_b).isNotNull()
    ).select(
        F.col(rater_a).cast("string").alias("__a"),
        F.col(rater_b).cast("string").alias("__b"),
    )
    totals = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("__a") == F.col("__b"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_agree"),
    )
    ra = base.groupBy("__a").agg(F.count(F.lit(1)).cast("bigint").alias("__ra"))
    rb = base.groupBy("__b").agg(F.count(F.lit(1)).cast("bigint").alias("__rb"))
    pe = (
        ra.join(rb, ra["__a"] == rb["__b"], "inner")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("__ra").cast("decimal(18,0)")
                    * F.col("__rb").cast("decimal(18,0)")
                ),
                F.lit(0),
            )
            .cast("decimal(28,0)")
            .alias("pe_num"),
            F.count(F.lit(1)).cast("bigint").alias("__n_shared"),
        )
    )
    na = ra.agg(F.count(F.lit(1)).cast("bigint").alias("n_classes_a"))
    nb = rb.agg(F.count(F.lit(1)).cast("bigint").alias("n_classes_b"))
    out = (
        totals.crossJoin(pe)  # four 1-row aggregates of distinct subtrees
        .crossJoin(na)
        .crossJoin(nb)
    )
    num = (
        "(CAST(n_rows AS DECIMAL(18,0)) * CAST(n_agree AS DECIMAL(18,0))"
        " - pe_num)"
    )
    den = (
        "(CAST(n_rows AS DECIMAL(18,0)) * CAST(n_rows AS DECIMAL(18,0))"
        " - pe_num)"
    )
    return out.select(
        "n_rows",
        "n_agree",
        "n_classes_a",
        "n_classes_b",
        # output as BIGINT: a HUGEINT/decimal result cell lands as
        # float64 in the driver's pandas compare
        F.col("pe_num").cast("bigint").alias("pe_num"),
        F.expr(
            f"CASE WHEN {den} = 0 THEN CAST(NULL AS DOUBLE)"
            f" ELSE CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE) END"
        ).alias("kappa"),
    )


def cohens_kappa_sql(source_sql: str, rater_a: str, rater_b: str) -> str:
    # HUGEINT numerators (int128, exact); the final division routes
    # each side through VARCHAR so the double conversion is strtod's
    # correctly-rounded parse on both engines.
    num = (
        "(CAST(n_rows AS HUGEINT) * CAST(n_agree AS HUGEINT) - pe_num)"
    )
    den = (
        "(CAST(n_rows AS HUGEINT) * CAST(n_rows AS HUGEINT) - pe_num)"
    )
    return f"""
WITH base AS (
  SELECT CAST({rater_a} AS VARCHAR) AS a, CAST({rater_b} AS VARCHAR) AS b
  FROM ({source_sql})
  WHERE {rater_a} IS NOT NULL AND {rater_b} IS NOT NULL
),
totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
  FROM base
),
ra AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS ra FROM base GROUP BY a),
rb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS rb FROM base GROUP BY b),
pe AS (
  SELECT COALESCE(SUM(CAST(ra.ra AS HUGEINT) * CAST(rb.rb AS HUGEINT)),
                  CAST(0 AS HUGEINT)) AS pe_num
  FROM ra JOIN rb ON ra.a = rb.b
),
na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_classes_a FROM ra),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_classes_b FROM rb)
SELECT n_rows, n_agree, n_classes_a, n_classes_b,
       CAST(pe_num AS BIGINT) AS pe_num,
       CASE WHEN {den} = 0 THEN CAST(NULL AS DOUBLE)
            ELSE CAST(CAST({num} AS VARCHAR) AS DOUBLE)
               / CAST(CAST({den} AS VARCHAR) AS DOUBLE) END AS kappa
FROM totals CROSS JOIN pe CROSS JOIN na CROSS JOIN nb
"""


def fleiss_kappa(
    df: DataFrame, item_col: str, rater_col: str, label_col: str
) -> DataFrame:
    """Fleiss' kappa: chance-corrected agreement among r raters per
    item (the multi-annotator generalization of Cohen's kappa) — the
    number a labeling campaign reports when every example gets
    multiple annotations.

    Exact relational form over the long (item, rater, label) table:
    with N items, r ratings per item, per-(item,label) counts n_ij
    and per-label column totals c_j,

        P̄  = (Σ n_ij² − N·r) / (N·r·(r−1))
        Pe  = Σ c_j² / (N·r)²
        κ   = (P̄ − Pe) / (1 − Pe)

    Every numerator is an exact DECIMAL sum of BIGINT squares; the
    final value is a FIXED-ORDER IEEE chain (two divisions into P̄
    and Pe, one subtraction/division for κ — the tfidf/bm25
    bit-portability pattern), with DuckDB's decimal→double casts
    routed through VARCHAR in the twin.  κ is NULL when the rating
    count per item is not constant (Fleiss requires it — the
    ``r_constant`` flag says why), when r < 2, or when Pe = 1 (all
    ratings one label).  NULL labels/raters/items are dropped.

    Returns one row: (n_items, n_ratings, n_raters, n_categories,
    r_constant, kappa).
    """
    base = df.filter(
        F.col(item_col).isNotNull()
        & F.col(rater_col).isNotNull()
        & F.col(label_col).isNotNull()
    ).select(
        F.col(item_col).alias("__i"),
        F.col(label_col).cast("string").alias("__l"),
    )
    nij = base.groupBy("__i", "__l").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    per_item = nij.groupBy("__i").agg(
        F.sum("__n").cast("bigint").alias("__r_i"),
        F.sum(
            F.col("__n").cast("decimal(18,0)") * F.col("__n").cast("decimal(18,0)")
        ).cast("decimal(38,0)").alias("__sq_i"),
    )
    items = per_item.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("__r_i").cast("bigint").alias("n_ratings"),
        F.min("__r_i").cast("bigint").alias("__r_min"),
        F.max("__r_i").cast("bigint").alias("__r_max"),
        F.sum("__sq_i").cast("decimal(38,0)").alias("__A"),
    )
    cols_tot = nij.groupBy("__l").agg(
        F.sum("__n").cast("bigint").alias("__c")
    )
    labels = cols_tot.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_categories"),
        F.sum(
            F.col("__c").cast("decimal(18,0)") * F.col("__c").cast("decimal(18,0)")
        ).cast("decimal(38,0)").alias("__C"),
    )
    out = items.crossJoin(labels)  # two 1-row aggregates
    r = "(n_ratings div n_items)"
    pbar = (
        f"(CAST(__A - CAST(n_items AS DECIMAL(18,0)) * {r} AS DOUBLE)"
        f" / CAST(CAST(n_items AS DECIMAL(18,0)) * {r} * ({r} - 1) AS DOUBLE))"
    )
    pe = (
        "(CAST(__C AS DOUBLE)"
        " / CAST(n_ratings AS DOUBLE) / CAST(n_ratings AS DOUBLE))"
    )
    ok = (
        f"__r_min = __r_max AND {r} >= 2 AND n_items > 0 AND {pe} <> 1.0"
    )
    return out.select(
        "n_items",
        "n_ratings",
        F.expr(
            "CASE WHEN __r_min = __r_max THEN __r_min"
            " ELSE CAST(NULL AS BIGINT) END"
        ).alias("n_raters"),
        "n_categories",
        F.expr("__r_min = __r_max").alias("r_constant"),
        F.expr(
            f"CASE WHEN {ok} THEN ({pbar} - {pe}) / (1.0D - {pe})"
            " ELSE CAST(NULL AS DOUBLE) END"
        ).alias("kappa"),
    )


def fleiss_kappa_sql(
    source_sql: str, item_col: str, rater_col: str, label_col: str
) -> str:
    r = "(n_ratings // n_items)"
    dbl = lambda x: f"CAST(CAST({x} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    pbar = (
        f"({dbl(f'A - CAST(n_items AS DECIMAL(18,0)) * {r}')}"
        f" / {dbl(f'CAST(n_items AS DECIMAL(18,0)) * {r} * ({r} - 1)')})"
    )
    pe = (
        f"({dbl('C')}"
        " / CAST(n_ratings AS DOUBLE) / CAST(n_ratings AS DOUBLE))"
    )
    ok = f"r_min = r_max AND {r} >= 2 AND n_items > 0 AND {pe} <> 1.0"
    return f"""
WITH base AS (
  SELECT {item_col} AS i, CAST({label_col} AS VARCHAR) AS l
  FROM ({source_sql})
  WHERE {item_col} IS NOT NULL AND {rater_col} IS NOT NULL
        AND {label_col} IS NOT NULL
),
nij AS (SELECT i, l, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY i, l),
per_item AS (
  SELECT i, CAST(SUM(n) AS BIGINT) AS r_i,
         CAST(SUM(CAST(n AS DECIMAL(18,0)) * CAST(n AS DECIMAL(18,0)))
              AS DECIMAL(38,0)) AS sq_i
  FROM nij GROUP BY i
),
items AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(r_i) AS BIGINT) AS n_ratings,
         CAST(MIN(r_i) AS BIGINT) AS r_min,
         CAST(MAX(r_i) AS BIGINT) AS r_max,
         CAST(SUM(sq_i) AS DECIMAL(38,0)) AS A
  FROM per_item
),
cols_tot AS (SELECT l, CAST(SUM(n) AS BIGINT) AS c FROM nij GROUP BY l),
labels AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_categories,
         CAST(SUM(CAST(c AS DECIMAL(18,0)) * CAST(c AS DECIMAL(18,0)))
              AS DECIMAL(38,0)) AS C
  FROM cols_tot
)
SELECT n_items, n_ratings,
       CASE WHEN r_min = r_max THEN r_min ELSE CAST(NULL AS BIGINT) END
         AS n_raters,
       n_categories,
       r_min = r_max AS r_constant,
       CASE WHEN {ok} THEN ({pbar} - {pe}) / (1.0 - {pe})
            ELSE CAST(NULL AS DOUBLE) END AS kappa
FROM items CROSS JOIN labels
"""


def matthews_corr(df: DataFrame, label_col: str, pred_col: str) -> DataFrame:
    """Matthews correlation coefficient of a binary classifier — the
    single-number confusion summary that stays honest under class
    imbalance (accuracy and F1 both saturate when one class dominates
    a filtering pipeline's labels).

    Engine-exact: the four confusion cells are BIGINT counts from one
    map-combinable aggregate;

        mcc = (TP·TN − FP·FN) / (√((TP+FP)(TP+FN)) · √((TN+FP)(TN+FN)))

    with every product an exact DECIMAL(18,0)×DECIMAL(18,0) (exact to
    ~1e17 rows; pairing the marginals under two square roots keeps
    each radicand ≤ 1e36, inside exact decimal range, where the naive
    4-way product overflows at 1e10 rows), and the tail a FIXED-ORDER
    IEEE chain — two correctly-rounded sqrt calls, one multiply, one
    division — so both engines emit the identical double.

    Input contract: ``label_col``/``pred_col`` should be BOOLEAN (or
    0/1) columns.  Rows whose values are NULL or do not parse as
    booleans are dropped BEFORE ``n_rows`` is counted (try-cast then
    filter — a post-filter cast would keep unparseable rows in
    ``n_rows`` while losing them from the cells on Spark, and crash
    DuckDB's strict CAST outright; note the engines' string-boolean
    lexicons differ, so string inputs beyond 'true'/'false'/'0'/'1'
    are NOT portable).  mcc is NULL when any marginal is 0 (a
    degenerate single-class column).

    Returns one row: (n_rows, tp, fp, tn, fn, mcc).
    """
    base = df.select(
        F.expr(f"try_cast({label_col} AS BOOLEAN)").alias("__y"),
        F.expr(f"try_cast({pred_col} AS BOOLEAN)").alias("__p"),
    ).filter(F.col("__y").isNotNull() & F.col("__p").isNotNull())

    def _n(cond, name):
        return F.sum(cond.cast("int")).cast("bigint").alias(name)

    cells = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        _n(F.col("__y") & F.col("__p"), "tp"),
        _n(~F.col("__y") & F.col("__p"), "fp"),
        _n(~F.col("__y") & ~F.col("__p"), "tn"),
        _n(F.col("__y") & ~F.col("__p"), "fn"),
    )
    num = (
        "(CAST(tp AS DECIMAL(18,0)) * CAST(tn AS DECIMAL(18,0))"
        " - CAST(fp AS DECIMAL(18,0)) * CAST(fn AS DECIMAL(18,0)))"
    )
    ab = "(CAST(tp + fp AS DECIMAL(18,0)) * CAST(tp + fn AS DECIMAL(18,0)))"
    cd = "(CAST(tn + fp AS DECIMAL(18,0)) * CAST(tn + fn AS DECIMAL(18,0)))"
    degenerate = (
        "tp + fp = 0 OR tp + fn = 0 OR tn + fp = 0 OR tn + fn = 0"
    )
    return cells.select(
        "n_rows",
        "tp",
        "fp",
        "tn",
        "fn",
        F.expr(
            f"CASE WHEN {degenerate} THEN CAST(NULL AS DOUBLE)"
            f" ELSE CAST({num} AS DOUBLE)"
            f" / (sqrt(CAST({ab} AS DOUBLE)) * sqrt(CAST({cd} AS DOUBLE)))"
            " END"
        ).alias("mcc"),
    )


def matthews_corr_sql(source_sql: str, label_col: str, pred_col: str) -> str:
    # decimal → double routed through VARCHAR (strtod's correctly-
    # rounded parse); sqrt is IEEE correctly-rounded on both engines,
    # so the fixed-order tail is bit-portable.
    dbl = lambda x: f"CAST(CAST({x} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    num = (
        "(CAST(tp AS DECIMAL(18,0)) * CAST(tn AS DECIMAL(18,0))"
        " - CAST(fp AS DECIMAL(18,0)) * CAST(fn AS DECIMAL(18,0)))"
    )
    ab = "(CAST(tp + fp AS DECIMAL(18,0)) * CAST(tp + fn AS DECIMAL(18,0)))"
    cd = "(CAST(tn + fp AS DECIMAL(18,0)) * CAST(tn + fn AS DECIMAL(18,0)))"
    degenerate = "tp + fp = 0 OR tp + fn = 0 OR tn + fp = 0 OR tn + fn = 0"
    return f"""
WITH base AS (
  SELECT y, p FROM (
    SELECT TRY_CAST({label_col} AS BOOLEAN) AS y,
           TRY_CAST({pred_col} AS BOOLEAN) AS p
    FROM ({source_sql})
  ) WHERE y IS NOT NULL AND p IS NOT NULL
),
cells AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN y AND p THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN NOT y AND p THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN NOT y AND NOT p THEN 1 ELSE 0 END) AS BIGINT) AS tn,
         CAST(SUM(CASE WHEN y AND NOT p THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM base
)
SELECT n_rows, tp, fp, tn, fn,
       CASE WHEN {degenerate} THEN CAST(NULL AS DOUBLE)
            ELSE {dbl(num)}
               / (sqrt({dbl(ab)}) * sqrt({dbl(cd)})) END AS mcc
FROM cells
"""


def expected_calibration_error(
    df: DataFrame,
    pred_milli_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Expected Calibration Error as ONE exact integer numerator: with
    per-bin prediction sum ``sp_b`` (milli-units) and positive count
    ``pos_b``,

        ECE = Σ_b (n_b/N)·|sp_b/(1000·n_b) − pos_b/n_b|
            = Σ_b |sp_b − 1000·pos_b| / (1000·N)

    — the per-bin weights cancel, so the whole metric is an exact
    BIGINT sum of absolute per-bin deviations divided ONCE (two
    fixed-order IEEE divisions), bit-identical on any engine.  The
    worst bin rides along as an exact integer ppm gap, so the single
    headline number can't hide one badly mis-calibrated decile.

    Same milli-prediction convention as :func:`calibration_bins`
    (probabilities as 0..999 integers — the engine-portable carrier).

    Returns one row: (n_rows, n_bins_used, ece_numerator, ece,
    max_bin_gap_ppm).
    """
    binned = df.withColumn(
        "__bin", F.expr(f"(({pred_milli_col} * {int(n_bins)}) div 1000)")
    )
    per_bin = binned.groupBy("__bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(pred_milli_col).cast("bigint").alias("__sp"),
        F.sum(F.col(label_col).cast("bigint")).cast("bigint").alias("__pos"),
    )
    dev = F.abs(F.col("__sp") - F.lit(1000) * F.col("__pos")).cast("bigint")
    gap_ppm = F.expr(
        "(abs(__sp - 1000 * __pos) * CAST(1000 AS BIGINT)) div __n"
    )
    return (
        per_bin.select("__n", dev.alias("__dev"), gap_ppm.alias("__gap"))
        .agg(
            F.sum("__n").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_bins_used"),
            F.sum("__dev").cast("bigint").alias("ece_numerator"),
            F.max("__gap").cast("bigint").alias("max_bin_gap_ppm"),
        )
        .select(
            "n_rows",
            "n_bins_used",
            "ece_numerator",
            (
                F.col("ece_numerator").cast("double")
                / F.lit(1000.0)
                / F.col("n_rows").cast("double")
            ).alias("ece"),
            "max_bin_gap_ppm",
        )
    )


def expected_calibration_error_sql(
    table: str, pred_milli_col: str, label_col: str, n_bins: int = 10
) -> str:
    return f"""
WITH per_bin AS (
  SELECT CAST(({pred_milli_col} * {n_bins}) // 1000 AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM({pred_milli_col}) AS BIGINT) AS sp,
         CAST(SUM(CAST({label_col} AS BIGINT)) AS BIGINT) AS pos
  FROM {table} GROUP BY 1
)
SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_bins_used,
       CAST(SUM(ABS(sp - 1000 * pos)) AS BIGINT) AS ece_numerator,
       CAST(SUM(ABS(sp - 1000 * pos)) AS DOUBLE) / 1000.0
         / CAST(SUM(n) AS DOUBLE) AS ece,
       CAST(MAX((ABS(sp - 1000 * pos) * CAST(1000 AS BIGINT)) // n)
            AS BIGINT) AS max_bin_gap_ppm
FROM per_bin
"""


def krippendorff_alpha(
    df: DataFrame, item_col: str, rater_col: str, label_col: str
) -> DataFrame:
    """Krippendorff's alpha (nominal): chance-corrected agreement that
    — unlike Fleiss' kappa — tolerates MISSING ratings (items rated by
    different numbers of raters), the normal state of a real labeling
    campaign where annotators overlap only partially.

    Coincidence-matrix rewrite, all exact integers: items with m_u ≥ 2
    ratings are "pairable"; with per-(item, category) counts n_uc,

        T_u            = Σ_c n_uc·(m_u − n_uc)   (disagreeing ordered pairs)
        disagree_nano  = Σ_u (T_u · 1e9) div (m_u − 1)
        n_c            = Σ_{pairable u} n_uc,   n = Σ_c n_c
        De_sum         = Σ_c n_c·(n − n_c)
        alpha          = 1 − (n−1)·disagree_nano / (De_sum · 1e9)

    The ONLY non-integer step in textbook alpha is the per-item
    1/(m_u − 1) weight; it is floored here at NANO precision per item
    (identically on both engines), so the result is deterministic to
    ~1e-9·n_items absolute — the bit-portability contract the ppm
    battery uses, one scale tighter.  The final value is a fixed-order
    IEEE chain of exact BIGINT-to-double casts (each operand < 2^53
    for any n below ~9e15 pairable values).  NULL items/raters/labels
    drop; alpha is NULL when De_sum = 0 (one category, or n < 2).

    Returns one row: (n_items, n_pairable_items, n_values,
    n_categories, disagree_nano, alpha).
    """
    from pyspark.sql import Window

    base = df.filter(
        F.col(item_col).isNotNull()
        & F.col(rater_col).isNotNull()
        & F.col(label_col).isNotNull()
    ).select(
        F.col(item_col).alias("__i"),
        F.col(label_col).cast("string").alias("__l"),
    )
    nuc = base.groupBy("__i", "__l").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    wm = Window.partitionBy("__i")
    per_cell = nuc.select(
        "__i", "__l", "__n", F.sum("__n").over(wm).alias("__m")
    ).filter(F.col("__m") >= 2)
    per_item = per_cell.groupBy("__i").agg(
        F.max("__m").alias("__m"),
        F.sum(F.expr("__n * (__m - __n)")).alias("__t"),
    )
    totals = per_item.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairable_items"),
        F.sum("__m").cast("bigint").alias("n_values"),
        F.sum(
            F.expr("(__t * CAST(1000000000 AS BIGINT)) div (__m - 1)")
        ).cast("bigint").alias("disagree_nano"),
    )
    ncat = per_cell.groupBy("__l").agg(
        F.sum("__n").cast("bigint").alias("__nc")
    )
    de = ncat.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_categories"),
        F.sum("__nc").cast("bigint").alias("__ntot"),
        # n_c·(n − n_c) = n_c·n − n_c²; Σ n_c·n folds to n² afterwards
        F.sum(F.expr("__nc * __nc")).cast("bigint").alias("__sq"),
    ).select(
        "n_categories",
        F.expr("__ntot * __ntot - __sq").cast("bigint").alias("__de_sum"),
    )
    n_items = base.select(F.countDistinct("__i").alias("n_items"))
    return (
        n_items.join(F.broadcast(totals))
        .join(F.broadcast(de))
        .select(
            "n_items",
            "n_pairable_items",
            "n_values",
            "n_categories",
            "disagree_nano",
            F.when(
                F.col("__de_sum") > 0,
                F.lit(1.0)
                - (
                    F.col("disagree_nano").cast("double")
                    / F.col("__de_sum").cast("double")
                )
                * (
                    (F.col("n_values") - F.lit(1)).cast("double")
                    / F.lit(1_000_000_000.0)
                ),
            ).alias("alpha"),
        )
    )


def krippendorff_alpha_sql(
    source_sql: str, item_col: str, rater_col: str, label_col: str
) -> str:
    return f"""
WITH base AS (
  SELECT {item_col} AS i, CAST({label_col} AS VARCHAR) AS l
  FROM ({source_sql})
  WHERE {item_col} IS NOT NULL AND {rater_col} IS NOT NULL
    AND {label_col} IS NOT NULL
),
nuc AS (
  SELECT i, l, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY i, l
),
per_cell AS (
  SELECT i, l, n, SUM(n) OVER (PARTITION BY i) AS m FROM nuc
  QUALIFY m >= 2
),
per_item AS (
  SELECT i, MAX(m) AS m, SUM(n * (m - n)) AS t FROM per_cell GROUP BY i
),
totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairable_items,
         CAST(SUM(m) AS BIGINT) AS n_values,
         CAST(SUM((t * CAST(1000000000 AS BIGINT)) // (m - 1))
              AS BIGINT) AS disagree_nano
  FROM per_item
),
ncat AS (
  SELECT l, CAST(SUM(n) AS BIGINT) AS nc FROM per_cell GROUP BY l
),
de AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_categories,
         CAST(SUM(nc) AS BIGINT) AS ntot,
         CAST(SUM(nc * nc) AS BIGINT) AS sq
  FROM ncat
),
ni AS (SELECT CAST(COUNT(DISTINCT i) AS BIGINT) AS n_items FROM base)
SELECT ni.n_items, t.n_pairable_items, t.n_values, d.n_categories,
       t.disagree_nano,
       CASE WHEN d.ntot * d.ntot - d.sq > 0 THEN
         1.0 - (CAST(t.disagree_nano AS DOUBLE)
                / CAST(d.ntot * d.ntot - d.sq AS DOUBLE))
             * (CAST(t.n_values - 1 AS DOUBLE) / 1000000000.0)
       END AS alpha
FROM ni, totals t, de d
"""


def token_f1(
    df: DataFrame, group_col: str, gold_col: str, pred_col: str
) -> DataFrame:
    """Micro-averaged token-classification P/R/F1 in exact ppm — the
    span-extraction eval (NER, PII tagging, quote attribution) scored
    at the token level, where micro-averaging over the long
    (token, is_gold, is_pred) relation is one conditional aggregate.

    TP/FP/FN count exactly; precision = TP·1e6 div (TP+FP), recall =
    TP·1e6 div (TP+FN), and F1 uses the integer identity
    f1 = 2·TP·1e6 div (2·TP+FP+FN) — no harmonic-mean doubles, no
    division-order ambiguity.  Ratios are NULL when their denominator
    is zero (no predictions / no gold / neither).  NULL flags count
    as false.

    Returns one row per group: (group, n_tokens, tp, fp, fn,
    precision_ppm, recall_ppm, f1_ppm).
    """
    g = F.coalesce(F.col(gold_col).cast("boolean"), F.lit(False))
    p = F.coalesce(F.col(pred_col).cast("boolean"), F.lit(False))
    base = df.select(
        F.col(group_col).alias("__g"),
        g.alias("__gold"),
        p.alias("__pred"),
    )
    agg = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("__gold") & F.col("__pred"), 1).otherwise(0))
        .cast("bigint").alias("tp"),
        F.sum(F.when(~F.col("__gold") & F.col("__pred"), 1).otherwise(0))
        .cast("bigint").alias("fp"),
        F.sum(F.when(F.col("__gold") & ~F.col("__pred"), 1).otherwise(0))
        .cast("bigint").alias("fn"),
    )
    return agg.select(
        F.col("__g").alias(group_col),
        "n_tokens",
        "tp",
        "fp",
        "fn",
        F.expr(
            "CASE WHEN tp + fp > 0 THEN"
            " (tp * CAST(1000000 AS BIGINT)) div (tp + fp) END"
        ).cast("bigint").alias("precision_ppm"),
        F.expr(
            "CASE WHEN tp + fn > 0 THEN"
            " (tp * CAST(1000000 AS BIGINT)) div (tp + fn) END"
        ).cast("bigint").alias("recall_ppm"),
        F.expr(
            "CASE WHEN 2 * tp + fp + fn > 0 THEN"
            " (2 * tp * CAST(1000000 AS BIGINT)) div (2 * tp + fp + fn) END"
        ).cast("bigint").alias("f1_ppm"),
    )


def token_f1_sql(
    source_sql: str, group_col: str, gold_col: str, pred_col: str
) -> str:
    return f"""
WITH base AS (
  SELECT {group_col} AS g,
         COALESCE(CAST({gold_col} AS BOOLEAN), FALSE) AS gold,
         COALESCE(CAST({pred_col} AS BOOLEAN), FALSE) AS pred
  FROM ({source_sql})
),
agg AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN gold AND pred THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN NOT gold AND pred THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN gold AND NOT pred THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM base GROUP BY g
)
SELECT g AS {group_col}, n_tokens, tp, fp, fn,
       CASE WHEN tp + fp > 0 THEN
         CAST((tp * CAST(1000000 AS BIGINT)) // (tp + fp) AS BIGINT)
       END AS precision_ppm,
       CASE WHEN tp + fn > 0 THEN
         CAST((tp * CAST(1000000 AS BIGINT)) // (tp + fn) AS BIGINT)
       END AS recall_ppm,
       CASE WHEN 2 * tp + fp + fn > 0 THEN
         CAST((2 * tp * CAST(1000000 AS BIGINT)) // (2 * tp + fp + fn)
              AS BIGINT)
       END AS f1_ppm
FROM agg
"""


def corr_matrix(
    df: DataFrame, metrics: dict[str, Column], scale: int = 100
) -> DataFrame:
    """Pairwise Pearson correlation matrix over k numeric features in
    ONE scan — the feature-redundancy screen an ML-prep pipeline runs
    before training (drop one of every near-collinear pair).

    ``metrics`` maps output name → a Column whose values become exact
    integers after ×``scale`` (two-decimal money columns with
    scale=100).  All k sums, k squares and k·(k−1)/2 cross-products
    fold in a single map-combinable aggregate (one row of 2k+C(k,2)+1
    exact DECIMAL moments — never k² passes, never a self-join); the
    k·(k−1)/2 output rows unpivot from that single row.  The closing
    r = cov/√(vx·vy) is the one IEEE sqrt+divide from exact integer
    moments (the :func:`profile.correlation` convention).

    Returns (x_name, y_name, n, pearson_r), one row per unordered
    pair, pairs ordered by ``metrics`` insertion order.  Fewer than
    two metrics is a caller error — the DataFrame twin would return
    an empty frame while the SQL twin would be malformed (a WITH
    clause over an empty union), so both raise instead (round-9
    ADVICE).
    """
    if len(metrics) < 2:
        raise ValueError(
            f"corr_matrix needs >= 2 metrics, got {len(metrics)}"
        )
    names = list(metrics)
    # Project to the k metric columns, then spread the 2k+C(k,2)
    # exact-DECIMAL moment products across the cluster's slots: on a
    # single-row-group input the whole partial aggregate otherwise
    # runs in ONE scan task (guide SS2.5).  The projected shuffle rows
    # are a few narrow columns (guide SS2.3); the helper no-ops when
    # the scan already has enough splits — always at production scale.
    from gis_city_county_spark.operators.scale import rebalance_for_fanout

    proj = rebalance_for_fanout(
        df.select(*[c.alias(f"__in_{n}") for n, c in metrics.items()]),
        multiplier=8.0,
    )
    ints = {
        name: F.floor(
            F.col(f"__in_{name}").cast("decimal(38,10)") * scale
        ).cast("decimal(19,0)")
        for name in names
    }
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for name in names:
        aggs.append(F.sum(ints[name]).cast(dec).alias(f"__s_{name}"))
        aggs.append(
            F.sum((ints[name] * ints[name]).cast(dec)).cast(dec)
            .alias(f"__ss_{name}")
        )
    pairs = [
        (names[i], names[j])
        for i in range(len(names)) for j in range(i + 1, len(names))
    ]
    for x, y in pairs:
        aggs.append(
            F.sum((ints[x] * ints[y]).cast(dec)).cast(dec)
            .alias(f"__sp_{x}_{y}")
        )
    m = proj.agg(*aggs)

    def _r(x: str, y: str) -> Column:
        nn = F.col("n").cast(dec)
        num = (nn * F.col(f"__sp_{x}_{y}")
               - F.col(f"__s_{x}") * F.col(f"__s_{y}")).cast("double")
        vx = (nn * F.col(f"__ss_{x}")
              - F.col(f"__s_{x}") * F.col(f"__s_{x}")).cast("double")
        vy = (nn * F.col(f"__ss_{y}")
              - F.col(f"__s_{y}") * F.col(f"__s_{y}")).cast("double")
        return F.when((vx > 0.0) & (vy > 0.0), num / F.sqrt(vx * vy))

    # One generate over the single moments row — a 6-way union would
    # re-plan (and re-merge) the global aggregate once per branch.
    pair_structs = F.array(*[
        F.struct(
            F.lit(x).alias("x_name"),
            F.lit(y).alias("y_name"),
            _r(x, y).alias("pearson_r"),
        )
        for x, y in pairs
    ])
    return m.select(
        F.col("n"), F.explode(pair_structs).alias("__p")
    ).select(
        F.col("__p.x_name").alias("x_name"),
        F.col("__p.y_name").alias("y_name"),
        "n",
        F.col("__p.pearson_r").alias("pearson_r"),
    )


def corr_matrix_sql(
    source_sql: str, metrics: dict[str, str], scale: int = 100
) -> str:
    if len(metrics) < 2:
        raise ValueError(
            f"corr_matrix_sql needs >= 2 metrics, got {len(metrics)}"
        )
    names = list(metrics)
    ints = {
        n: f"CAST(FLOOR(CAST(({e}) AS DECIMAL(38,10)) * {scale})"
           f" AS DECIMAL(19,0))"
        for n, e in metrics.items()
    }
    dec = "DECIMAL(38,0)"
    cols = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for n in names:
        cols.append(f"CAST(SUM({ints[n]}) AS {dec}) AS s_{n}")
        cols.append(f"CAST(SUM(CAST({ints[n]} * {ints[n]} AS {dec}))"
                    f" AS {dec}) AS ss_{n}")
    pairs = [
        (names[i], names[j])
        for i in range(len(names)) for j in range(i + 1, len(names))
    ]
    for x, y in pairs:
        cols.append(f"CAST(SUM(CAST({ints[x]} * {ints[y]} AS {dec}))"
                    f" AS {dec}) AS sp_{x}_{y}")
    selects = []
    for x, y in pairs:
        num = f"CAST(CAST(CAST(n AS {dec}) * sp_{x}_{y} - s_{x} * s_{y} AS VARCHAR) AS DOUBLE)"
        vx = f"CAST(CAST(CAST(n AS {dec}) * ss_{x} - s_{x} * s_{x} AS VARCHAR) AS DOUBLE)"
        vy = f"CAST(CAST(CAST(n AS {dec}) * ss_{y} - s_{y} * s_{y} AS VARCHAR) AS DOUBLE)"
        selects.append(
            f"SELECT '{x}' AS x_name, '{y}' AS y_name, n,\n"
            f"  CASE WHEN {vx} > 0.0 AND {vy} > 0.0\n"
            f"       THEN {num} / SQRT({vx} * {vy}) END AS pearson_r\n"
            f"FROM m"
        )
    return (
        f"WITH m AS (SELECT {', '.join(cols)} FROM ({source_sql}))\n"
        + "\nUNION ALL\n".join(selects)
    )


def loo_target_encode(
    df: DataFrame, key_col: str, cat_col: str, target_col: str
) -> DataFrame:
    """Leave-one-out target encoding — the leakage-honest variant:
    each row's encoded value is the mean target of the OTHER rows in
    its category, ``(sum − y) / (n − 1)``, so a row never sees its own
    label (plain mean encoding leaks the target into the feature and
    inflates offline metrics).  Singleton categories have no "others"
    and encode NULL — the caller decides the fallback (global prior,
    drop, ...), the operator refuses to invent one silently.

    Exactness: targets become exact integer cents (decimal floor),
    the per-category sum is one map-combinable aggregate broadcast
    back onto the rows, and the encode is an exact integral division
    (``div``, truncation toward zero — identical to DuckDB's HUGEINT
    ``//``; for the all-positive money fixtures truncation and floor
    coincide, but negative targets round toward zero on BOTH engines)
    emitted in milli-cents.  No windows, no per-row state; output ∝ input rows.

    Returns (key, cat, n_cat, loo_milli_cents).
    """
    cents = F.floor(
        F.col(target_col).cast("decimal(38,10)") * 100
    ).cast("decimal(19,0)")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(cat_col).alias("cat"),
        cents.alias("__y"),
    )
    per_cat = base.groupBy("cat").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cat"),
        F.sum("__y").cast("decimal(38,0)").alias("__s"),
    )
    return (
        base.join(F.broadcast(per_cat), "cat")
        .select(
            "key",
            "cat",
            "n_cat",
            F.when(
                F.col("n_cat") > 1,
                F.expr(
                    "CAST((CAST(1000 AS DECIMAL(38,0)) * (__s - __y))"
                    " div (n_cat - 1) AS BIGINT)"
                ),
            ).alias("loo_milli_cents"),
        )
    )


def loo_target_encode_sql(
    source_sql: str, key_col: str, cat_col: str, target_col: str
) -> str:
    return f"""
WITH base AS (
  SELECT {key_col} AS key, {cat_col} AS cat,
         CAST(FLOOR(CAST({target_col} AS DECIMAL(38,10)) * 100)
              AS DECIMAL(19,0)) AS y
  FROM ({source_sql})
),
per_cat AS (
  SELECT cat, CAST(COUNT(*) AS BIGINT) AS n_cat,
         CAST(SUM(y) AS DECIMAL(38,0)) AS s
  FROM base GROUP BY cat
)
SELECT b.key, b.cat, p.n_cat,
       -- HUGEINT division: DuckDB's ``//`` on wide DECIMALs detours
       -- through double and loses ulps past 2^53; int128 is exact.
       CASE WHEN p.n_cat > 1
            THEN CAST((CAST(1000 AS HUGEINT) * CAST(p.s - b.y AS HUGEINT))
                      // CAST(p.n_cat - 1 AS HUGEINT) AS BIGINT)
       END AS loo_milli_cents
FROM base b JOIN per_cat p USING (cat)
"""


def spearman_corr(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Spearman rank correlation with textbook average-rank tie
    handling — the monotonic-association check an eval pipeline runs
    when the relationship isn't linear (Pearson) but ordinal.

    Scale-safe ranking: instead of one global window over the rows,
    each variable aggregates to its DISTINCT-VALUE frame (value →
    count), takes a running sum over that bounded frame to get the
    min-rank, and derives the tie-averaged rank DOUBLED to stay
    integral: r2 = 2·min_rank + count − 1.  The window runs over
    distinct values only — constant-bounded for real measures (money
    in cents, counts), never the raw rows.  Rows then re-join their
    r2 by value (broadcastable), and Spearman = Pearson over exact
    integer r2 moments with the one closing IEEE sqrt/divide.

    Returns one row: (n, spearman_r).
    """
    dec = "decimal(38,0)"
    # Pairs with a NULL on either side are out of the statistic on
    # BOTH engines (Spark windows order NULLs first, DuckDB last — a
    # NULL group in the running sum would shift every rank).
    # four consumers (each variable's distinct-value frame + both
    # rank-join legs): materialize the filtered projection once
    # instead of re-scanning the source per reference (guide §3.3)
    obs = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(F.col(x_col).alias("__vx"), F.col(y_col).alias("__vy"))
        .localCheckpoint(eager=False)
    )

    def _r2(col: str, out: str) -> DataFrame:
        from gis_city_county_spark.operators.scale import ranged_cumsum

        per_v = obs.groupBy(F.col(col).alias("__v")).agg(
            F.count(F.lit(1)).cast("bigint").alias("__c")
        )
        # Two-phase bucketed running sum — the distinct-value frame is
        # small for discrete metrics but row-sized for continuous
        # ones, so no single-partition window anywhere.
        cum = ranged_cumsum(
            per_v, "__v", "__v", "__c",
            cum_col="__cum", total_col=None, descending=False,
        )
        return cum.select(
            "__v",
            (
                2 * (F.col("__cum") - F.col("__c") + 1)
                + F.col("__c") - 1
            ).cast("bigint").alias(out),
        )

    # No broadcast hint: the rank frame is |distinct values| rows —
    # tiny for discrete metrics, potentially row-sized for continuous
    # ones, so the join strategy is left to AQE.
    paired = (
        obs
        .join(_r2("__vx", "__r2x").withColumnRenamed("__v", "__vx"), "__vx")
        .join(_r2("__vy", "__r2y").withColumnRenamed("__v", "__vy"), "__vy")
    )
    x = F.col("__r2x").cast("decimal(19,0)")
    y = F.col("__r2y").cast("decimal(19,0)")
    m = paired.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).cast(dec).alias("__sx"),
        F.sum(y).cast(dec).alias("__sy"),
        F.sum((x * y).cast(dec)).cast(dec).alias("__sxy"),
        F.sum((x * x).cast(dec)).cast(dec).alias("__sxx"),
        F.sum((y * y).cast(dec)).cast(dec).alias("__syy"),
    )
    nn = F.col("n").cast(dec)
    num = (nn * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    vx = (nn * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    vy = (nn * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast("double")
    return m.select(
        "n",
        F.when((vx > 0.0) & (vy > 0.0), num / F.sqrt(vx * vy))
        .alias("spearman_r"),
    )


def spearman_corr_sql(source_sql: str, x_col: str, y_col: str) -> str:
    dec = "DECIMAL(38,0)"

    def _r2(col: str) -> str:
        return f"""
  SELECT v, CAST(2 * (SUM(c) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - c + 1) + c - 1 AS BIGINT) AS r2
  FROM (SELECT {col} AS v, CAST(COUNT(*) AS BIGINT) AS c
        FROM obs GROUP BY 1)"""

    num = f"CAST(CAST(CAST(n AS {dec}) * sxy - sx * sy AS VARCHAR) AS DOUBLE)"
    vx = f"CAST(CAST(CAST(n AS {dec}) * sxx - sx * sx AS VARCHAR) AS DOUBLE)"
    vy = f"CAST(CAST(CAST(n AS {dec}) * syy - sy * sy AS VARCHAR) AS DOUBLE)"
    return f"""
WITH obs AS (
  SELECT {x_col}, {y_col} FROM ({source_sql})
  WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
),
rx AS ({_r2(x_col)}),
ry AS ({_r2(y_col)}),
paired AS (
  SELECT CAST(rx.r2 AS DECIMAL(19,0)) AS x, CAST(ry.r2 AS DECIMAL(19,0)) AS y
  FROM obs
  JOIN rx ON obs.{x_col} = rx.v
  JOIN ry ON obs.{y_col} = ry.v
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS {dec}) AS sx, CAST(SUM(y) AS {dec}) AS sy,
         CAST(SUM(CAST(x * y AS {dec})) AS {dec}) AS sxy,
         CAST(SUM(CAST(x * x AS {dec})) AS {dec}) AS sxx,
         CAST(SUM(CAST(y * y AS {dec})) AS {dec}) AS syy
  FROM paired
)
SELECT n,
       CASE WHEN {vx} > 0.0 AND {vy} > 0.0
            THEN {num} / SQRT({vx} * {vy}) END AS spearman_r
FROM m
"""


def _poisson1_cdf_thresholds(max_k: int = 4) -> list[float]:
    """CDF thresholds of Poisson(1) clamped at ``max_k`` — Python-
    computed literals shared verbatim by both engines (the dp_release
    convention: no exp in either plan)."""
    import math

    p = math.exp(-1.0)
    acc, out, fact = 0.0, [], 1.0
    for k in range(max_k):
        if k > 0:
            fact *= k
        acc += p / fact
        out.append(acc)
    return out


def bootstrap_ci(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_replicas: int = 32,
    salt: str = "boot-v1",
) -> DataFrame:
    """Deterministic Poisson-bootstrap confidence interval for the
    mean — THE bootstrap that distributes: instead of resampling n
    rows WITH replacement (which needs global coordination), every
    row independently enters replica b with weight ~ Poisson(1)
    (Chamandy et al. 2012, "Estimating Uncertainty for Massive Data
    Streams").  Here the draw is a hash-seeded inverse-CDF lookup of
    md5(salt|b|key) against Python-literal thresholds, so every rerun
    and every engine draws the SAME replicas.

    Scale shape: the ×``n_replicas`` fan-out happens scan-side on the
    rows (no shuffle amplification — the per-replica weighted sums
    are map-combinable and only ``n_replicas`` rows ever shuffle);
    the CI is an exact order statistic over the ``n_replicas`` replica
    means.  All sums exact DECIMAL; replica means exact integral
    milli-cent divisions.

    Returns one row: (n, point_mean_milli_cents, ci_lo_milli_cents,
    ci_hi_milli_cents, n_replicas) — the CI bounds are the 2nd
    smallest / 2nd largest replica means (the ~5%/95% order stats at
    B=32), bracketing the point estimate's sampling noise.
    """
    from gis_city_county_spark.operators.scale import rebalance_for_fanout
    from gis_city_county_spark.operators.sketch import _h60

    thresholds = _poisson1_cdf_thresholds()
    cents = F.floor(
        F.col(value_col).cast("decimal(38,10)") * 100
    ).cast("decimal(19,0)")
    # Project to the two needed columns FIRST (guide SS2.3), then
    # spread the x n_replicas hash fan-out across the cluster's slots:
    # a single-row-group parquet scan otherwise evaluates all
    # n_replicas md5 draws + decimal partial sums in ONE task (guide
    # SS2.5 input skew; the helper no-ops once the scan already has
    # >= slots/2 splits, i.e. always at production scale).
    base = df.select(F.col(key_col).alias("__k"), cents.alias("__v"))
    base = rebalance_for_fanout(base, multiplier=float(n_replicas))
    rep = base.select(
        "__k", "__v",
        F.explode(F.array(*[F.lit(b) for b in range(n_replicas)]))
        .alias("__b"),
    )
    u = (
        _h60(F.concat(F.lit(salt + "|"), F.col("__b").cast("string"),
                      F.lit("|"), F.col("__k").cast("string")))
        .cast("double") / F.lit(float(1 << 60))
    )
    w = sum(
        (F.when(u >= F.lit(t), 1).otherwise(0) for t in thresholds),
        F.lit(0),
    ).cast("decimal(19,0)")
    per_rep = rep.groupBy("__b").agg(
        F.sum((w * F.col("__v")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").alias("__wv"),
        F.sum(w).cast("decimal(38,0)").alias("__w"),
    ).select(
        # An all-zero-weight replica (possible on tiny inputs: P =
        # e^-n per replica) has no mean — the division must be GUARDED
        # (ANSI-mode Spark throws DIVIDE_BY_ZERO, it doesn't NULL) and
        # the replica dropped BEFORE ranking, or Spark orders its NULL
        # first and DuckDB last and the order statistics pick
        # different rows per engine.
        F.expr(
            "CASE WHEN __w > 0 THEN"
            " CAST((CAST(1000 AS DECIMAL(38,0)) * __wv) div __w AS BIGINT)"
            " END"
        ).alias("__mean")
    ).filter(F.col("__mean").isNotNull())
    # Rank against the SURVIVING replica count, not n_replicas: when
    # zero-weight replicas were dropped, the fixed rank B-1 may not
    # exist and the upper bound silently comes back NULL (round-9
    # ADVICE).  The 2nd-largest survivor is rk = cnt - 1.  Both
    # windows are bounded (<= n_replicas rows) — never a full-data
    # single-partition sort.  Degenerate cnt < 3 still yields NULL
    # bounds, identically on both engines.
    w_ord = Window.orderBy("__mean")
    stats = per_rep.select(
        "__mean",
        F.row_number().over(w_ord).alias("__rk"),
        F.count(F.lit(1)).over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__cnt"),
    ).agg(
        F.max(F.when(F.col("__rk") == 2, F.col("__mean")))
        .alias("ci_lo_milli_cents"),
        F.max(F.when(F.col("__rk") == F.col("__cnt") - 1, F.col("__mean")))
        .alias("ci_hi_milli_cents"),
    )
    point = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(
            "CAST((CAST(1000 AS DECIMAL(38,0)) * CAST(SUM(__v)"
            " AS DECIMAL(38,0))) div COUNT(1) AS BIGINT)"
        ).alias("point_mean_milli_cents"),
    )
    return point.join(F.broadcast(stats)).select(
        "n",
        "point_mean_milli_cents",
        "ci_lo_milli_cents",
        "ci_hi_milli_cents",
        F.lit(n_replicas).cast("bigint").alias("n_replicas"),
    )


def bootstrap_ci_sql(
    source_sql: str,
    key_col: str,
    value_col: str,
    n_replicas: int = 32,
    salt: str = "boot-v1",
) -> str:
    from gis_city_county_spark.operators.sketch import _h60_sql

    thresholds = _poisson1_cdf_thresholds()
    h = _h60_sql(f"'{salt}|' || CAST(b AS VARCHAR) || '|' || CAST(k AS VARCHAR)")
    steps = " + ".join(
        f"(CASE WHEN u >= {t!r} THEN 1 ELSE 0 END)" for t in thresholds
    )
    return f"""
WITH base AS (
  SELECT {key_col} AS k,
         CAST(FLOOR(CAST({value_col} AS DECIMAL(38,10)) * 100)
              AS DECIMAL(19,0)) AS v
  FROM ({source_sql})
),
rep AS (
  SELECT k, v, b, CAST({h} AS DOUBLE) / {float(1 << 60)!r} AS u
  FROM base, (SELECT UNNEST(range({n_replicas})) AS b)
),
per_rep AS (
  SELECT b,
         CASE WHEN SUM(CAST(({steps}) AS DECIMAL(19,0))) > 0 THEN
           CAST((CAST(1000 AS HUGEINT)
                 * CAST(SUM(CAST(({steps}) AS DECIMAL(19,0)) * v) AS HUGEINT))
                // CAST(SUM(CAST(({steps}) AS DECIMAL(19,0))) AS HUGEINT)
                AS BIGINT)
         END AS mean_m
  FROM rep GROUP BY b
),
ranked AS (
  SELECT mean_m, ROW_NUMBER() OVER (ORDER BY mean_m) AS rk,
         COUNT(*) OVER () AS cnt
  FROM per_rep WHERE mean_m IS NOT NULL
),
stats AS (
  SELECT MAX(CASE WHEN rk = 2 THEN mean_m END) AS ci_lo_milli_cents,
         MAX(CASE WHEN rk = cnt - 1 THEN mean_m END)
           AS ci_hi_milli_cents
  FROM ranked
),
point AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST((CAST(1000 AS HUGEINT) * CAST(SUM(v) AS HUGEINT))
              // COUNT(*) AS BIGINT) AS point_mean_milli_cents
  FROM base
)
SELECT p.n, p.point_mean_milli_cents, s.ci_lo_milli_cents,
       s.ci_hi_milli_cents,
       CAST({n_replicas} AS BIGINT) AS n_replicas
FROM point p, stats s
"""


def mcnemar_test(
    df: DataFrame, id_col: str, pred_a_col: str, pred_b_col: str,
    label_col: str,
) -> DataFrame:
    """McNemar's paired-classifier comparison — the eval that answers
    "is model B actually better than model A on the SAME rows" from
    the two discordant cells only: b = A right / B wrong,
    c = A wrong / B right; the test statistic (b−c)²/(b+c) is an
    exact rational of integer counts, emitted in milli units
    (≥ 3841 milli ≈ the χ²₁ 5% line).  Rows where both models agree
    with each other carry no signal and only the discordant counts
    shuffle — one map-combinable aggregate.

    Returns one row: (n_pairs, both_right, both_wrong, a_only_right,
    b_only_right, statistic_milli) — statistic NULL when b + c = 0.
    """
    a_ok = (F.col(pred_a_col) == F.col(label_col)).cast("int")
    b_ok = (F.col(pred_b_col) == F.col(label_col)).cast("int")
    agg = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(a_ok * b_ok).cast("bigint").alias("both_right"),
        F.sum((1 - a_ok) * (1 - b_ok)).cast("bigint").alias("both_wrong"),
        F.sum(a_ok * (1 - b_ok)).cast("bigint").alias("a_only_right"),
        F.sum((1 - a_ok) * b_ok).cast("bigint").alias("b_only_right"),
    )
    d = F.col("a_only_right") - F.col("b_only_right")
    tot = F.col("a_only_right") + F.col("b_only_right")
    return agg.select(
        "n_pairs",
        "both_right",
        "both_wrong",
        "a_only_right",
        "b_only_right",
        F.when(
            tot > 0,
            F.expr(
                "CAST((1000 * (a_only_right - b_only_right)"
                " * (a_only_right - b_only_right))"
                " div (a_only_right + b_only_right) AS BIGINT)"
            ),
        ).alias("statistic_milli"),
    )


def mcnemar_test_sql(
    source_sql: str, id_col: str, pred_a_col: str, pred_b_col: str,
    label_col: str,
) -> str:
    a_ok = f"CAST({pred_a_col} = {label_col} AS INTEGER)"
    b_ok = f"CAST({pred_b_col} = {label_col} AS INTEGER)"
    return f"""
WITH agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM({a_ok} * {b_ok}) AS BIGINT) AS both_right,
         CAST(SUM((1 - {a_ok}) * (1 - {b_ok})) AS BIGINT) AS both_wrong,
         CAST(SUM({a_ok} * (1 - {b_ok})) AS BIGINT) AS a_only_right,
         CAST(SUM((1 - {a_ok}) * {b_ok}) AS BIGINT) AS b_only_right
  FROM ({source_sql})
)
SELECT n_pairs, both_right, both_wrong, a_only_right, b_only_right,
       CASE WHEN a_only_right + b_only_right > 0
            THEN CAST((1000 * (a_only_right - b_only_right)
                       * (a_only_right - b_only_right))
                      // (a_only_right + b_only_right) AS BIGINT)
       END AS statistic_milli
FROM agg
"""


def effect_size(
    df: DataFrame, group_col: str, treat_value, value_col: str
) -> DataFrame:
    """Cohen's d effect size between a treatment group and everyone
    else — the "is this uplift practically meaningful" companion to a
    significance test: d = (mean_t − mean_c) / s_pooled, where
    s_pooled² = ((n_t−1)s_t² + (n_c−1)s_c²)/(n_t+n_c−2).

    All moments are exact integer cents (DECIMAL); the closing
    subtraction, division and sqrt are the fixed-order IEEE chain
    from exact numerators (the profile.correlation convention).

    Returns one row: (n_treat, n_control, mean_treat, mean_control,
    cohens_d) — d NULL when either group has < 2 rows or pooled
    variance is 0.
    """
    dec = "decimal(38,0)"
    cents = F.floor(
        F.col(value_col).cast("decimal(38,10)") * 100
    ).cast("decimal(19,0)")
    t = (F.col(group_col) == F.lit(treat_value)).cast("int")
    m = df.select(t.alias("__t"), cents.alias("__v")).groupBy("__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__v").cast(dec).alias("__s"),
        F.sum((F.col("__v") * F.col("__v")).cast(dec)).cast(dec)
        .alias("__ss"),
    )
    piv = m.groupBy().agg(
        F.max(F.when(F.col("__t") == 1, F.col("__n"))).alias("n_treat"),
        F.max(F.when(F.col("__t") == 0, F.col("__n"))).alias("n_control"),
        F.max(F.when(F.col("__t") == 1, F.col("__s"))).alias("__st"),
        F.max(F.when(F.col("__t") == 0, F.col("__s"))).alias("__sc"),
        F.max(F.when(F.col("__t") == 1, F.col("__ss"))).alias("__sst"),
        F.max(F.when(F.col("__t") == 0, F.col("__ss"))).alias("__ssc"),
    )
    nt = F.col("n_treat").cast(dec)
    nc = F.col("n_control").cast(dec)
    # (n−1)s² = Σv² − (Σv)²/n, kept exact by scaling through n:
    # n·(n−1)·s² = n·Σv² − (Σv)² — fold both groups over the common
    # denominator n_t·n_c before the one double division.
    ssd_t = (nt * F.col("__sst") - F.col("__st") * F.col("__st"))
    ssd_c = (nc * F.col("__ssc") - F.col("__sc") * F.col("__sc"))
    mean_t = F.col("__st").cast("double") / nt.cast("double")
    mean_c = F.col("__sc").cast("double") / nc.cast("double")
    pooled_num = (
        ssd_t.cast("double") / nt.cast("double")
        + ssd_c.cast("double") / nc.cast("double")
    )
    denom = (nt + nc - 2).cast("double")
    s_pooled = F.sqrt(pooled_num / denom)
    d = F.when(
        (F.col("n_treat") >= 2) & (F.col("n_control") >= 2)
        & (pooled_num > 0.0),
        (mean_t - mean_c) / s_pooled,
    )
    return piv.select(
        "n_treat",
        "n_control",
        mean_t.alias("mean_treat_cents"),
        mean_c.alias("mean_control_cents"),
        d.alias("cohens_d"),
    )


def effect_size_sql(
    source_sql: str, group_col: str, treat_value_sql: str, value_col: str
) -> str:
    dec = "DECIMAL(38,0)"
    return f"""
WITH m AS (
  SELECT CAST({group_col} = {treat_value_sql} AS INTEGER) AS t,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS {dec}) AS s,
         CAST(SUM(CAST(v * v AS {dec})) AS {dec}) AS ss
  FROM (
    SELECT {group_col},
           CAST(FLOOR(CAST({value_col} AS DECIMAL(38,10)) * 100)
                AS DECIMAL(19,0)) AS v
    FROM ({source_sql})
  ) GROUP BY 1
),
piv AS (
  SELECT MAX(CASE WHEN t = 1 THEN n END) AS n_treat,
         MAX(CASE WHEN t = 0 THEN n END) AS n_control,
         MAX(CASE WHEN t = 1 THEN s END) AS st,
         MAX(CASE WHEN t = 0 THEN s END) AS sc,
         MAX(CASE WHEN t = 1 THEN ss END) AS sst,
         MAX(CASE WHEN t = 0 THEN ss END) AS ssc
  FROM m
)
SELECT n_treat, n_control,
       CAST(CAST(st AS VARCHAR) AS DOUBLE) / CAST(n_treat AS DOUBLE)
         AS mean_treat_cents,
       CAST(CAST(sc AS VARCHAR) AS DOUBLE) / CAST(n_control AS DOUBLE)
         AS mean_control_cents,
       CASE WHEN n_treat >= 2 AND n_control >= 2
             AND (CAST(CAST(CAST(n_treat AS {dec}) * sst - st * st
                       AS VARCHAR) AS DOUBLE) / CAST(n_treat AS DOUBLE)
                  + CAST(CAST(CAST(n_control AS {dec}) * ssc - sc * sc
                         AS VARCHAR) AS DOUBLE) / CAST(n_control AS DOUBLE))
                 > 0.0
            THEN (CAST(CAST(st AS VARCHAR) AS DOUBLE)
                    / CAST(n_treat AS DOUBLE)
                  - CAST(CAST(sc AS VARCHAR) AS DOUBLE)
                    / CAST(n_control AS DOUBLE))
                 / SQRT((CAST(CAST(CAST(n_treat AS {dec}) * sst - st * st
                              AS VARCHAR) AS DOUBLE)
                           / CAST(n_treat AS DOUBLE)
                         + CAST(CAST(CAST(n_control AS {dec}) * ssc - sc * sc
                                AS VARCHAR) AS DOUBLE)
                           / CAST(n_control AS DOUBLE))
                        / CAST(n_treat + n_control - 2 AS DOUBLE))
       END AS cohens_d
FROM piv
"""


def kendall_tau(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Kendall's tau-b rank correlation with full tie correction —
    the other ordinal-association check (alongside
    :func:`spearman_corr`) an eval pipeline runs on judge scores,
    where tau's pair-concordance reading ("probability a random pair
    agrees in direction") is the quantity reported.

    Computed from the DISTINCT-VALUE contingency, never the O(n²)
    row pairs: cells (x, y, count) self-join on ``x_a < x_b`` so a
    cell pair contributes ``c_a·c_b`` concordant (y rises) or
    discordant (y falls) pairs; tie terms come from the x/y
    marginals.  Work is O(k²) in DISTINCT CELLS — the operator is for
    bucketed/ordinal scores (relevance grades, star ratings,
    quantile-bucketed metrics) where k is constant by construction;
    on continuous data bucket first (the registered query does).

    Cross-engine numerics: pair products go through
    DECIMAL(19)×DECIMAL(18) (exact int128 on both engines — BIGINT ×
    BIGINT would throw on ANSI Spark and DECIMAL(38)×DECIMAL(38)
    silently degrades to DOUBLE on DuckDB); the closing
    ``(C−D)/sqrt((n0−n1)(n0−n2))`` is the one IEEE sqrt+divide.
    Pair counts are reported in BIGINT, so n is bounded by ~4.3e9
    rows per call (n0 = n(n−1)/2 must fit) — at 100 TB the operator
    runs per evaluation slice, not over raw corpora.

    Returns one row: (n, concordant, discordant, ties_x_pairs,
    ties_y_pairs, tau_b) — tau_b NULL when either variable is
    constant.
    """
    dec = "decimal(38,0)"
    obs = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(F.col(x_col).alias("__x"), F.col(y_col).alias("__y"))
    # One materialization, four consumers (pair join, two marginals,
    # total) — without it each aggregate re-scans the raw rows.
    cells = (
        obs.groupBy("__x", "__y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
        .localCheckpoint(eager=False)
    )
    a = cells.select(
        F.col("__x").alias("__xa"), F.col("__y").alias("__ya"),
        F.col("__c").alias("__ca"),
    )
    b = cells.select(
        F.col("__x").alias("__xb"), F.col("__y").alias("__yb"),
        F.col("__c").alias("__cb"),
    )
    pair_n = (
        "CAST(__ca AS DECIMAL(19,0)) * CAST(__cb AS DECIMAL(18,0))"
    )
    cd = (
        a.join(b, F.col("__xa") < F.col("__xb"))
        .agg(
            F.sum(F.expr(
                f"CASE WHEN __yb > __ya THEN {pair_n}"
                f" ELSE CAST(0 AS DECIMAL(38,0)) END"
            )).cast(dec).alias("__conc"),
            F.sum(F.expr(
                f"CASE WHEN __yb < __ya THEN {pair_n}"
                f" ELSE CAST(0 AS DECIMAL(38,0)) END"
            )).cast(dec).alias("__disc"),
        )
        .select(
            F.coalesce("__conc", F.lit(0).cast(dec)).alias("__conc"),
            F.coalesce("__disc", F.lit(0).cast(dec)).alias("__disc"),
        )
    )
    tie_half = (
        "CAST(CAST(__m AS DECIMAL(19,0)) * CAST(__m - 1 AS DECIMAL(18,0))"
        " div 2 AS DECIMAL(38,0))"
    )
    tx = (
        cells.groupBy("__x").agg(F.sum("__c").cast("bigint").alias("__m"))
        .agg(F.sum(F.expr(tie_half)).cast(dec).alias("__n1"))
        .select(F.coalesce("__n1", F.lit(0).cast(dec)).alias("__n1"))
    )
    ty = (
        cells.groupBy("__y").agg(F.sum("__c").cast("bigint").alias("__m"))
        .agg(F.sum(F.expr(tie_half)).cast(dec).alias("__n2"))
        .select(F.coalesce("__n2", F.lit(0).cast(dec)).alias("__n2"))
    )
    tot = cells.agg(F.sum("__c").cast("bigint").alias("__n"))
    n0 = (
        "CAST(CAST(__n AS DECIMAL(19,0)) * CAST(__n - 1 AS DECIMAL(18,0))"
        " div 2 AS DECIMAL(38,0))"
    )
    return (
        cd.crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("__n").cast("bigint").alias("n"),
            F.col("__conc").cast("bigint").alias("concordant"),
            F.col("__disc").cast("bigint").alias("discordant"),
            F.col("__n1").cast("bigint").alias("ties_x_pairs"),
            F.col("__n2").cast("bigint").alias("ties_y_pairs"),
            F.expr(
                f"CASE WHEN {n0} > __n1 AND {n0} > __n2 THEN"
                f" CAST(__conc - __disc AS DOUBLE) /"
                f" sqrt(CAST({n0} - __n1 AS DOUBLE)"
                f"      * CAST({n0} - __n2 AS DOUBLE)) END"
            ).alias("tau_b"),
        )
    )


def kendall_tau_sql(source_sql: str, x_col: str, y_col: str) -> str:
    pair_n = "CAST(a.c AS DECIMAL(19,0)) * CAST(b.c AS DECIMAL(18,0))"
    tie_half = (
        "CAST(CAST(CAST(m AS DECIMAL(19,0)) * CAST(m - 1 AS DECIMAL(18,0))"
        " AS HUGEINT) // 2 AS DECIMAL(38,0))"
    )
    n0 = (
        "CAST(CAST(CAST(n AS DECIMAL(19,0)) * CAST(n - 1 AS DECIMAL(18,0))"
        " AS HUGEINT) // 2 AS DECIMAL(38,0))"
    )
    return f"""
WITH obs AS (
  SELECT {x_col} AS x, {y_col} AS y FROM ({source_sql})
  WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
),
cells AS MATERIALIZED (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM obs GROUP BY x, y
),
cd AS (
  SELECT CAST(COALESCE(SUM(CASE WHEN b.y > a.y THEN {pair_n}
                           ELSE CAST(0 AS DECIMAL(38,0)) END),
                       0) AS DECIMAL(38,0)) AS conc,
         CAST(COALESCE(SUM(CASE WHEN b.y < a.y THEN {pair_n}
                           ELSE CAST(0 AS DECIMAL(38,0)) END),
                       0) AS DECIMAL(38,0)) AS disc
  FROM cells a JOIN cells b ON a.x < b.x
),
tx AS (
  SELECT CAST(COALESCE(SUM({tie_half}), 0) AS DECIMAL(38,0)) AS n1
  FROM (SELECT CAST(SUM(c) AS BIGINT) AS m FROM cells GROUP BY x)
),
ty AS (
  SELECT CAST(COALESCE(SUM({tie_half}), 0) AS DECIMAL(38,0)) AS n2
  FROM (SELECT CAST(SUM(c) AS BIGINT) AS m FROM cells GROUP BY y)
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells)
SELECT CAST(n AS BIGINT) AS n,
       CAST(conc AS BIGINT) AS concordant,
       CAST(disc AS BIGINT) AS discordant,
       CAST(n1 AS BIGINT) AS ties_x_pairs,
       CAST(n2 AS BIGINT) AS ties_y_pairs,
       CASE WHEN {n0} > n1 AND {n0} > n2 THEN
         CAST(conc - disc AS DOUBLE) /
         sqrt(CAST({n0} - n1 AS DOUBLE) * CAST({n0} - n2 AS DOUBLE))
       END AS tau_b
FROM cd CROSS JOIN tx CROSS JOIN ty CROSS JOIN tot
"""


def cramers_v(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cramér's V association between two CATEGORICAL columns — the
    categorical sibling of :func:`corr_matrix`'s Pearson screen (drop
    one of every near-duplicate category pair before target encoding
    leaks the same signal twice).

    χ² runs on the contingency CELLS, never the rows: one
    map-combinable (a, b, count) aggregate, two marginal rollups of
    it, and the per-cell χ² term in EXACT pico units via the identity
    ``φ² = Σ o²/(rowₐ·col_b) − 1`` — each term is one exact integer
    division ``(o²·10¹²) div (rowₐ·col_b)`` (floor, identical on both
    engines; DECIMAL precisions are sized statically so DuckDB never
    silently promotes to DOUBLE — counts are capped at 10⁹ per slice,
    the same per-call bound as :func:`kendall_tau`).  The closing
    ``V = sqrt(φ² / min(r−1, c−1))`` is the one IEEE computation.

    Returns one row: (n, n_cat_a, n_cat_b, phi2_pico, cramers_v) —
    ``cramers_v`` NULL when either variable is constant.  NULL
    categories are excluded on both engines.
    """
    obs = df.filter(
        F.col(a_col).isNotNull() & F.col(b_col).isNotNull()
    ).select(F.col(a_col).alias("__a"), F.col(b_col).alias("__b"))
    # One materialization, four consumers (cell join, two marginals,
    # total).
    cells = (
        obs.groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
        .localCheckpoint(eager=False)
    )
    ra = cells.groupBy("__a").agg(F.sum("__c").cast("bigint").alias("__ra"))
    cb = cells.groupBy("__b").agg(F.sum("__c").cast("bigint").alias("__cb"))
    term = (
        "CAST(CAST(__c AS DECIMAL(10,0)) * CAST(__c AS DECIMAL(9,0))"
        " * CAST(1000000000000 AS DECIMAL(13,0))"
        " div (CAST(__ra AS DECIMAL(10,0)) * CAST(__cb AS DECIMAL(9,0)))"
        " AS BIGINT)"
    )
    s = (
        cells.join(ra, "__a")
        .join(cb, "__b")
        .agg(F.sum(F.expr(term)).cast("bigint").alias("__s"))
    )
    na = ra.agg(F.count(F.lit(1)).cast("bigint").alias("__na"))
    nb = cb.agg(F.count(F.lit(1)).cast("bigint").alias("__nb"))
    tot = cells.agg(F.sum("__c").cast("bigint").alias("__n"))
    return (
        s.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("__n").alias("n"),
            F.col("__na").alias("n_cat_a"),
            F.col("__nb").alias("n_cat_b"),
            F.expr(
                "GREATEST(CAST(0 AS BIGINT),"
                " __s - CAST(1000000000000 AS BIGINT))"
            ).alias("phi2_pico"),
            F.expr(
                "CASE WHEN __na >= 2 AND __nb >= 2 THEN"
                " sqrt(CAST(GREATEST(CAST(0 AS BIGINT),"
                "           __s - CAST(1000000000000 AS BIGINT))"
                "      AS DOUBLE) / 1e12"
                "      / CAST(LEAST(__na - 1, __nb - 1) AS DOUBLE)) END"
            ).alias("cramers_v"),
        )
    )


def cramers_v_sql(source_sql: str, a_col: str, b_col: str) -> str:
    # HUGEINT end to end: DuckDB multiplies narrow DECIMALs in int64
    # (overflow error at corpus counts) and silently promotes
    # wide-DECIMAL products to DOUBLE; int128 is exact for
    # c²·10¹² ≤ 10³⁰.
    term = (
        "CAST(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)"
        " * CAST(1000000000000 AS HUGEINT)"
        " // (CAST(ra AS HUGEINT) * CAST(cb AS HUGEINT)) AS BIGINT)"
    )
    return f"""
WITH obs AS (
  SELECT {a_col} AS a, {b_col} AS b FROM ({source_sql})
  WHERE {a_col} IS NOT NULL AND {b_col} IS NOT NULL
),
cells AS MATERIALIZED (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c FROM obs GROUP BY a, b
),
ra AS (SELECT a, CAST(SUM(c) AS BIGINT) AS ra FROM cells GROUP BY a),
cb AS (SELECT b, CAST(SUM(c) AS BIGINT) AS cb FROM cells GROUP BY b),
s AS (
  SELECT CAST(SUM({term}) AS BIGINT) AS s
  FROM cells JOIN ra USING (a) JOIN cb USING (b)
),
dims AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ra) AS na,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM cb) AS nb,
         (SELECT CAST(SUM(c) AS BIGINT) FROM cells) AS n
)
SELECT n,
       na AS n_cat_a,
       nb AS n_cat_b,
       GREATEST(CAST(0 AS BIGINT), s - CAST(1000000000000 AS BIGINT))
         AS phi2_pico,
       CASE WHEN na >= 2 AND nb >= 2 THEN
         sqrt(CAST(GREATEST(CAST(0 AS BIGINT),
                            s - CAST(1000000000000 AS BIGINT))
              AS DOUBLE) / 1e12
              / CAST(LEAST(na - 1, nb - 1) AS DOUBLE))
       END AS cramers_v
FROM s CROSS JOIN dims
"""


def hashed_features(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int = 1024
) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): map every token to
    one of ``n_buckets`` feature slots via a hash, with a second
    sign hash so colliding terms cancel in expectation instead of
    piling up — the fixed-width, vocabulary-free featurizer a
    large-scale text pipeline uses when a learned vocabulary would
    itself be a 100 TB shuffle.

    Everything is scan-side integer hashing (md5 → bucket, md5 → ±1)
    plus ONE map-combinable (id, bucket) aggregate; no vocabulary
    table, no join, no fit step — the property that makes the
    transform embarrassingly parallel at any scale.

    Returns the sparse feature relation (id, bucket, signed_count,
    n_tokens) — one row per non-empty (document, bucket) slot;
    ``signed_count`` is Σ±1 over token occurrences, ``n_tokens`` the
    unsigned occurrence count.
    """
    from gis_city_county_spark.operators.sketch import _h60

    base = df.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("__t")
    )
    tok = base.select("id", F.explode("__t").alias("__tok"))
    bucket = (_h60(F.concat(F.lit("fh|"), F.col("__tok")))
              % n_buckets).cast("bigint")
    sign = F.when(
        _h60(F.concat(F.lit("fs|"), F.col("__tok"))) % 2 == 0, 1
    ).otherwise(-1)
    return (
        tok.select("id", bucket.alias("bucket"), sign.alias("__sgn"))
        .groupBy("id", "bucket")
        .agg(
            F.sum("__sgn").cast("bigint").alias("signed_count"),
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        )
    )


def hashed_features_sql(
    source_sql: str, id_col: str, text_col: str, n_buckets: int = 1024
) -> str:
    from gis_city_county_spark.operators.sketch import _h60_sql

    bh = _h60_sql("'fh|' || tok")
    sh = _h60_sql("'fs|' || tok")
    bucket = f"{bh} % {n_buckets}"
    sign = f"CASE WHEN {sh} % 2 = 0 THEN 1 ELSE -1 END"
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {tokens_sql(text_col)} AS t FROM ({source_sql})
),
tok AS (
  SELECT id, unnest(t) AS tok FROM base
)
SELECT id, CAST({bucket} AS BIGINT) AS bucket,
       CAST(SUM({sign}) AS BIGINT) AS signed_count,
       CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM tok GROUP BY 1, 2
"""


def feature_hash_collision_audit(
    df: DataFrame, text_col: str, n_buckets: int = 1024
) -> DataFrame:
    """The loud half of :func:`hashed_features`: how crowded did the
    buckets get?  One row per occupancy level — (terms_in_bucket,
    n_buckets, n_occurrences) — including the ``terms_in_bucket = 0``
    row, so the sum of ``n_buckets`` always cross-foots to the
    configured width and a shrinking empty row is the early signal
    that the width no longer fits the vocabulary.

    Work: one distinct over tokens (the vocabulary), one hash per
    term, two bounded aggregates — never touches per-document rows.
    ``n_occurrences`` weights each bucket by total corpus token
    occurrences, separating "two rare terms collided" (harmless) from
    "two head terms collided" (feature corruption).
    """
    from gis_city_county_spark.operators.sketch import _h60

    tok = df.select(F.explode(tokens(text_col)).alias("__tok"))
    per_term = tok.groupBy("__tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("__occ")
    )
    per_bucket = per_term.select(
        (_h60(F.concat(F.lit("fh|"), F.col("__tok"))) % n_buckets)
        .cast("bigint").alias("__b"),
        "__occ",
    ).groupBy("__b").agg(
        F.count(F.lit(1)).cast("bigint").alias("__terms"),
        F.sum("__occ").cast("bigint").alias("__occs"),
    )
    hist = per_bucket.groupBy(
        F.col("__terms").alias("terms_in_bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.sum("__occs").cast("bigint").alias("n_occurrences"),
    )
    empty = per_bucket.agg(
        F.lit(0).cast("bigint").alias("terms_in_bucket"),
        (F.lit(n_buckets) - F.count(F.lit(1))).cast("bigint")
        .alias("n_buckets"),
        F.lit(0).cast("bigint").alias("n_occurrences"),
    )
    return hist.unionByName(empty).orderBy("terms_in_bucket")


def feature_hash_collision_audit_sql(
    source_sql: str, text_col: str, n_buckets: int = 1024
) -> str:
    from gis_city_county_spark.operators.sketch import _h60_sql

    bh = _h60_sql("'fh|' || tok")
    bucket = f"{bh} % {n_buckets}"
    return f"""
WITH tok AS (
  SELECT unnest({tokens_sql(text_col)}) AS tok FROM ({source_sql})
),
per_term AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS occ FROM tok GROUP BY tok
),
per_bucket AS (
  SELECT CAST({bucket} AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS terms,
         CAST(SUM(occ) AS BIGINT) AS occs
  FROM per_term GROUP BY 1
)
SELECT terms AS terms_in_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(occs) AS BIGINT) AS n_occurrences
FROM per_bucket GROUP BY 1
UNION ALL
SELECT CAST(0 AS BIGINT), {n_buckets} - (SELECT COUNT(*) FROM per_bucket),
       CAST(0 AS BIGINT)
ORDER BY terms_in_bucket
"""


def iqr_outlier_audit(df: DataFrame, value_col: str) -> DataFrame:
    """Tukey-fence outlier audit — the robust data-quality screen a
    feature pipeline runs before training (the winsorize/clip
    decision needs the COUNT of what clipping would touch, which the
    quantiles alone don't give): exact lower-convention quartiles in
    integer cents, fences at ``q1 − 1.5·IQR`` / ``q3 + 1.5·IQR``
    held in exact MILLI-cents (so the 1.5 multiplier never touches a
    float), and exact counts outside each fence.

    Scale shape: one map-combinable (value → count) aggregate, the
    two-phase bucketed running sum (:func:`~gis_city_county_spark.
    operators.scale.ranged_cumsum` — never a single-partition
    window), and two 1-row merges.  Quartile convention: the value
    covering rank ``ceil(k·n/4)`` (1-based, lower) — identical on
    both engines by construction.

    Returns one row: (n, q1_cents, q3_cents, iqr_cents, n_low,
    n_high, outlier_ppm).
    """
    from gis_city_county_spark.operators.scale import ranged_cumsum

    cents = F.floor(
        F.col(value_col).cast("decimal(38,10)") * 100
    ).cast("bigint")
    per_v = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(cents.alias("__v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    # r12: total_col=None keeps ranged_cumsum on its plan-side-offsets
    # path (no driver collect); the grand total is just the maximum
    # inclusive cumsum, recovered by one extra 1-row merge over the
    # checkpointed bounded frame.
    cum = ranged_cumsum(
        per_v, "__v", "__v", "__c",
        cum_col="__cum", total_col=None, descending=False,
    ).localCheckpoint(eager=False)
    tot = cum.agg(F.max("__cum").cast("bigint").alias("__tot"))
    stats = cum.crossJoin(F.broadcast(tot)).agg(
        F.max("__tot").cast("bigint").alias("n"),
        F.min(
            F.when(F.col("__cum") >= F.expr("(__tot + 3) div 4"),
                   F.col("__v"))
        ).cast("bigint").alias("q1_cents"),
        F.min(
            F.when(F.col("__cum") >= F.expr("(3 * __tot + 3) div 4"),
                   F.col("__v"))
        ).cast("bigint").alias("q3_cents"),
    )
    return (
        cum.crossJoin(F.broadcast(stats))
        .agg(
            F.max("n").alias("n"),
            F.max("q1_cents").alias("q1_cents"),
            F.max("q3_cents").alias("q3_cents"),
            F.max(F.expr("q3_cents - q1_cents")).cast("bigint")
            .alias("iqr_cents"),
            F.sum(
                F.when(
                    F.expr(
                        "1000 * __v < 1000 * q1_cents"
                        " - 1500 * (q3_cents - q1_cents)"
                    ),
                    F.col("__c"),
                ).otherwise(0)
            ).cast("bigint").alias("n_low"),
            F.sum(
                F.when(
                    F.expr(
                        "1000 * __v > 1000 * q3_cents"
                        " + 1500 * (q3_cents - q1_cents)"
                    ),
                    F.col("__c"),
                ).otherwise(0)
            ).cast("bigint").alias("n_high"),
        )
        .select(
            "n", "q1_cents", "q3_cents", "iqr_cents", "n_low", "n_high",
            F.expr(
                "CAST(((n_low + n_high) * CAST(1000000 AS BIGINT))"
                " div n AS BIGINT)"
            ).alias("outlier_ppm"),
        )
    )


def iqr_outlier_audit_sql(source_sql: str, value_col: str) -> str:
    return f"""
WITH per_v AS (
  SELECT CAST(FLOOR(CAST({value_col} AS DECIMAL(38,10)) * 100) AS BIGINT)
           AS v,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM ({source_sql}) WHERE {value_col} IS NOT NULL GROUP BY 1
),
cum AS MATERIALIZED (
  SELECT v, c,
         SUM(c) OVER (ORDER BY v) AS cum,
         SUM(c) OVER () AS tot
  FROM per_v
),
stats AS (
  SELECT CAST(MAX(tot) AS BIGINT) AS n,
         CAST(MIN(CASE WHEN cum >= (tot + 3) // 4 THEN v END) AS BIGINT)
           AS q1_cents,
         CAST(MIN(CASE WHEN cum >= (3 * tot + 3) // 4 THEN v END)
              AS BIGINT) AS q3_cents
  FROM cum
)
SELECT MAX(n) AS n,
       MAX(q1_cents) AS q1_cents,
       MAX(q3_cents) AS q3_cents,
       CAST(MAX(q3_cents - q1_cents) AS BIGINT) AS iqr_cents,
       CAST(SUM(CASE WHEN 1000 * v < 1000 * q1_cents
                          - 1500 * (q3_cents - q1_cents)
                     THEN c ELSE 0 END) AS BIGINT) AS n_low,
       CAST(SUM(CASE WHEN 1000 * v > 1000 * q3_cents
                          + 1500 * (q3_cents - q1_cents)
                     THEN c ELSE 0 END) AS BIGINT) AS n_high,
       CAST(((SUM(CASE WHEN 1000 * v < 1000 * q1_cents
                            - 1500 * (q3_cents - q1_cents)
                       THEN c ELSE 0 END)
              + SUM(CASE WHEN 1000 * v > 1000 * q3_cents
                              + 1500 * (q3_cents - q1_cents)
                         THEN c ELSE 0 END))
             * CAST(1000000 AS BIGINT)) // MAX(n) AS BIGINT)
         AS outlier_ppm
FROM cum CROSS JOIN stats
"""


def rbo_at_k(
    df: DataFrame,
    id_col: str,
    a_col: str,
    b_col: str,
    k: int = 20,
) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010) between two rankings
    of the same items, truncated at depth ``k`` — the top-weighted
    ranking-agreement metric an eval pipeline uses where Kendall/
    Spearman over-weight the tail (two retrieval runs agreeing on the
    top 5 but shuffling ranks 80-100 should score HIGH).

    Persistence parameter fixed at p = 1/2 so every term is exact
    integer arithmetic: RBO = Σ_{d=1..k} X_d / (d·2^d) with X_d =
    |top-d(A) ∩ top-d(B)| — each term floors once at micro scale,
    identically on both engines; no floats anywhere.  Ties in either
    score break by item id (a total order, or the two engines pick
    different top-k sets).

    Scale shape: two TakeOrdered top-k passes (never a global sort),
    rank windows over the k-row frames, one k-bounded equi-join and a
    ≤ k² explode — everything after the scans is constant-size.

    Returns one row: (k, n_shared_at_k, rbo_micro) — rbo_micro in
    [0, 1e6], 1e6-ish for identical rankings (per-term floors lose at
    most k micro-units).
    """
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(a_col).alias("__a"),
        F.col(b_col).alias("__b"),
    )
    top_a = base.orderBy(F.col("__a").desc(), F.col("__id").asc()).limit(k)
    top_b = base.orderBy(F.col("__b").desc(), F.col("__id").asc()).limit(k)
    wa = Window.orderBy(F.col("__a").desc(), F.col("__id").asc())
    wb = Window.orderBy(F.col("__b").desc(), F.col("__id").asc())
    ra = top_a.select("__id", F.row_number().over(wa).alias("__ra"))
    rb = top_b.select("__id", F.row_number().over(wb).alias("__rb"))
    shared = ra.join(rb, "__id").select(
        F.greatest("__ra", "__rb").alias("__md")
    )
    per_d = (
        shared.select(
            F.explode(F.expr(f"sequence(__md, {k})")).alias("__d")
        )
        .groupBy("__d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__x"))
    )
    # 2^d via an integer shift on BOTH engines: pow()/** return
    # DOUBLE, and DuckDB's ``//`` with a DOUBLE operand rounds
    # instead of flooring (measured: 1e6 // 24.0 = 41667).
    terms = per_d.select(
        F.expr(
            "CAST((__x * CAST(1000000 AS BIGINT))"
            " div (__d * shiftleft(CAST(1 AS BIGINT), CAST(__d AS INT)))"
            " AS BIGINT)"
        ).alias("__t"),
        F.when(F.col("__d") == k, F.col("__x")).alias("__xk"),
    )
    return terms.agg(
        F.lit(k).cast("bigint").alias("k"),
        F.coalesce(F.max("__xk"), F.lit(0)).cast("bigint")
        .alias("n_shared_at_k"),
        F.coalesce(F.sum("__t"), F.lit(0)).cast("bigint")
        .alias("rbo_micro"),
    )


def rbo_at_k_sql(
    source_sql: str, id_col: str, a_col: str, b_col: str, k: int = 20
) -> str:
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {a_col} AS a, {b_col} AS b FROM ({source_sql})
),
ra AS (
  SELECT id, ROW_NUMBER() OVER (ORDER BY a DESC, id ASC) AS r
  FROM base QUALIFY r <= {k}
),
rb AS (
  SELECT id, ROW_NUMBER() OVER (ORDER BY b DESC, id ASC) AS r
  FROM base QUALIFY r <= {k}
),
shared AS (
  SELECT GREATEST(ra.r, rb.r) AS md FROM ra JOIN rb USING (id)
),
per_d AS (
  SELECT d.d, CAST(COUNT(*) AS BIGINT) AS x
  FROM shared, LATERAL UNNEST(generate_series(md, {k})) AS d(d)
  GROUP BY d.d
),
terms AS (
  -- integer shift, not **: power returns DOUBLE and DuckDB's //
  -- with a DOUBLE operand rounds instead of flooring
  SELECT CAST((x * CAST(1000000 AS BIGINT))
              // (d * (CAST(1 AS BIGINT) << d)) AS BIGINT) AS t,
         CASE WHEN d = {k} THEN x END AS xk
  FROM per_d
)
SELECT CAST({k} AS BIGINT) AS k,
       CAST(COALESCE(MAX(xk), 0) AS BIGINT) AS n_shared_at_k,
       CAST(COALESCE(SUM(t), 0) AS BIGINT) AS rbo_micro
FROM terms
"""


def cochrans_q(
    df: DataFrame, item_col: str, rater_col: str, correct_col: str
) -> DataFrame:
    """Cochran's Q — the k-classifier extension of McNemar over the
    long (item, classifier, correct∈{0,1}) relation: do the k models
    differ in accuracy on the SAME items?  ``Q = (k−1)·(k·ΣG² −
    (ΣG)²) / (k·ΣL − ΣL²)`` with ``G_j`` the per-classifier totals
    and ``L_i`` the per-item totals — an exact rational of counts
    whose numerator routes through DECIMAL(38,0)/HUGEINT (ΣG² alone
    overflows int64 near 3·10⁹ correct answers), emitted in milli
    units (χ²_{k−1}; at k = 3, ≥ 5991 milli ≈ the 5% line).

    Scale shape: one map-combinable per-item aggregate (ΣL and ΣL²
    fold from it), one per-classifier aggregate bounded by k rows,
    and 1-row scalar merges — no joins on the raw relation.  A
    ``complete_design`` flag rides along (every item rated by all k
    classifiers); Q is only defined on complete designs.

    Returns one row: (n_items, k_raters, complete_design,
    statistic_milli) — statistic NULL when the denominator is 0
    (all items unanimously right or wrong).
    """
    per_item = (
        df.groupBy(F.col(item_col).alias("__i"))
        .agg(
            F.sum(F.col(correct_col).cast("bigint")).alias("__l"),
            F.count(F.lit(1)).cast("bigint").alias("__k"),
        )
        .localCheckpoint(eager=False)
    )
    item_side = per_item.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("__l").cast("bigint").alias("__sum_l"),
        F.sum(F.expr("__l * __l")).cast("bigint").alias("__sum_l2"),
        F.min("__k").alias("__k_min"),
        F.max("__k").alias("__k_max"),
    )
    rater_side = (
        df.groupBy(F.col(rater_col).alias("__r"))
        .agg(F.sum(F.col(correct_col).cast("bigint")).alias("__g"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_raters"),
            F.sum(F.expr("__g * __g")).cast("bigint").alias("__sum_g2"),
            F.sum("__g").cast("bigint").alias("__sum_g"),
        )
    )
    den = F.expr("k_raters * __sum_l - __sum_l2")
    return item_side.crossJoin(F.broadcast(rater_side)).select(
        "n_items",
        "k_raters",
        (
            (F.col("__k_min") == F.col("k_raters"))
            & (F.col("__k_max") == F.col("k_raters"))
        ).alias("complete_design"),
        # DECIMAL(38,0) numerator: ΣG² alone overflows int64 near
        # 3·10⁹ total correct answers (round-11 advisory; the
        # cohens_kappa count-product convention).  ΣG products use
        # DECIMAL(18) factors; k·ΣG² ≥ (ΣG)² by Cauchy-Schwarz so
        # the numerator is non-negative and `div` == floor on both
        # engines.
        F.when(
            den > 0,
            F.expr(
                "CAST((CAST(1000 AS DECIMAL(4,0)) * (k_raters - 1)"
                " * (k_raters * CAST(__sum_g2 AS DECIMAL(30,0))"
                " - CAST(__sum_g AS DECIMAL(18,0))"
                " * CAST(__sum_g AS DECIMAL(18,0))))"
                " div (k_raters * __sum_l - __sum_l2) AS BIGINT)"
            ),
        ).alias("statistic_milli"),
    )


def cochrans_q_sql(
    source_sql: str, item_col: str, rater_col: str, correct_col: str
) -> str:
    return f"""
WITH per_item AS MATERIALIZED (
  SELECT {item_col} AS i,
         CAST(SUM(CAST({correct_col} AS BIGINT)) AS BIGINT) AS l,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM ({source_sql}) GROUP BY 1
),
item_side AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(l) AS BIGINT) AS sum_l,
         CAST(SUM(l * l) AS BIGINT) AS sum_l2,
         MIN(k) AS k_min, MAX(k) AS k_max
  FROM per_item
),
rater_side AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_raters,
         CAST(SUM(g * g) AS BIGINT) AS sum_g2,
         CAST(SUM(g) AS BIGINT) AS sum_g
  FROM (
    SELECT {rater_col} AS r,
           CAST(SUM(CAST({correct_col} AS BIGINT)) AS BIGINT) AS g
    FROM ({source_sql}) GROUP BY 1
  )
)
SELECT n_items, k_raters,
       k_min = k_raters AND k_max = k_raters AS complete_design,
       CASE WHEN k_raters * sum_l - sum_l2 > 0 THEN
         CAST((CAST(1000 AS HUGEINT) * (k_raters - 1)
               * (k_raters * CAST(sum_g2 AS HUGEINT)
                  - CAST(sum_g AS HUGEINT) * CAST(sum_g AS HUGEINT)))
              // (k_raters * sum_l - sum_l2) AS BIGINT)
       END AS statistic_milli
FROM item_side CROSS JOIN rater_side
"""


def wilcoxon_signed_rank(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Wilcoxon signed-rank test over paired integer scores — the
    rank-based paired comparison that ignores outlier magnitudes
    (the nonparametric sibling of the paired t-test).  Zero
    differences drop (Wilcoxon's original treatment); |d| ranks use
    MIDRANKS for ties, exact in milli units (a tie group covering
    1-based ranks ``s..s+c−1`` has midrank ``500·(2s + c − 1)``
    milli — always an integer).  ``W⁺`` sums the milli midranks of
    positive differences; the identity ``W⁺ + W⁻ = 500·n·(n+1)``
    crossfoots the arithmetic and is emitted as a check column.

    Scale shape: one map-combinable aggregate per DISTINCT |d| cell
    (the contingency-cell discipline — Kendall/Cramér precedent);
    the prefix sum over those cells runs through the two-phase
    ``ranged_cumsum`` (distinct |d| is only bounded when the paired
    scores are coarse — exact cent-valued totals make it ~|rows|,
    where an unpartitioned ORDER BY window is a global
    single-partition sort; round-11 advisory), then one 1-row final
    fold.  Never a rank window over raw rows.

    Returns one row: (n_nonzero, w_plus_milli, w_minus_milli,
    ranks_total_milli).
    """
    d = (F.col(a_col) - F.col(b_col)).cast("bigint")
    cells = (
        df.select(d.alias("__d"))
        .filter(F.col("__d") != 0)
        .groupBy(F.abs(F.col("__d")).alias("__ad"))
        .agg(
            F.sum(F.when(F.col("__d") > 0, 1).otherwise(0))
            .cast("bigint").alias("__npos"),
            F.count(F.lit(1)).cast("bigint").alias("__c"),
        )
    )
    from gis_city_county_spark.operators.scale import ranged_cumsum

    # __ad is the group key, hence distinct — it is its own tiebreak.
    ranked = ranged_cumsum(
        cells, "__ad", "__ad", "__c",
        cum_col="__cum", total_col=None, descending=False,
    ).withColumn(
        # 1-based start rank of this tie group: cum − c + 1; midrank
        # in milli = 500 · (2·start + c − 1) = 500 · (2·cum − c + 1)
        "__mid_milli",
        (F.lit(500).cast("bigint")
         * (2 * F.col("__cum") - F.col("__c") + 1)),
    )
    return ranked.agg(
        F.sum("__c").cast("bigint").alias("n_nonzero"),
        F.sum(F.expr("__npos * __mid_milli")).cast("bigint")
        .alias("w_plus_milli"),
        F.sum(F.expr("(__c - __npos) * __mid_milli")).cast("bigint")
        .alias("w_minus_milli"),
        F.sum(F.expr("__c * __mid_milli")).cast("bigint")
        .alias("ranks_total_milli"),
    )


def wilcoxon_signed_rank_sql(source_sql: str, a_col: str, b_col: str) -> str:
    return f"""
WITH diffs AS (
  SELECT CAST({a_col} AS BIGINT) - CAST({b_col} AS BIGINT) AS d
  FROM ({source_sql})
  WHERE CAST({a_col} AS BIGINT) - CAST({b_col} AS BIGINT) != 0
),
cells AS (
  SELECT ABS(d) AS ad,
         CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS npos,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM diffs GROUP BY 1
),
ranked AS (
  SELECT npos, c,
         500 * (2 * SUM(c) OVER (ORDER BY ad ASC
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - c + 1) AS mid_milli
  FROM cells
)
SELECT CAST(SUM(c) AS BIGINT) AS n_nonzero,
       CAST(SUM(npos * mid_milli) AS BIGINT) AS w_plus_milli,
       CAST(SUM((c - npos) * mid_milli) AS BIGINT) AS w_minus_milli,
       CAST(SUM(c * mid_milli) AS BIGINT) AS ranks_total_milli
FROM ranked
"""


def permutation_test(
    df: DataFrame,
    key_col: str,
    a_col: str,
    b_col: str,
    n_replicas: int = 128,
    salt: str = "perm-v1",
) -> DataFrame:
    """Deterministic paired permutation test — the exact-by-replica
    significance check for "is A better than B on the same items":
    under H₀ each paired difference's sign is arbitrary, so replica
    ``r`` flips each item's sign by the parity of md5(salt|r|key)
    (every engine, every run, the same flips — the bootstrap_ci
    coin discipline) and the p-value is the fraction of replicas
    whose |Σ signed d| reaches the observed |Σ d|, with the
    standard +1 smoothing: ``p_ppm = 10⁶·(hits + 1) div (R + 1)``.

    Scale shape: the ×R fan-out is scan-side on the rows; per-replica
    sums are map-combinable and only R rows shuffle; the observed
    statistic is a 1-row broadcast merge.  All integers exact.

    Returns one row: (n_items, observed_stat, n_replicas,
    n_replicas_ge, p_value_ppm).
    """
    from gis_city_county_spark.operators.sketch import _h60

    d = (F.col(a_col) - F.col(b_col)).cast("bigint")
    base = df.select(
        F.col(key_col).cast("string").alias("__k"), d.alias("__d")
    )
    obs = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("__d").cast("bigint").alias("observed_stat"),
    )
    rep = base.select(
        "__k", "__d",
        F.explode(F.array(*[F.lit(r) for r in range(n_replicas)]))
        .alias("__r"),
    )
    sign = F.when(
        _h60(F.concat(F.lit(salt + "|"), F.col("__r").cast("string"),
                      F.lit("|"), F.col("__k"))) % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1)).cast("bigint")
    stats = (
        rep.groupBy("__r")
        .agg(F.sum(sign * F.col("__d")).cast("bigint").alias("__s"))
    )
    hits = stats.crossJoin(F.broadcast(obs)).agg(
        F.sum(
            F.when(
                F.abs(F.col("__s")) >= F.abs(F.col("observed_stat")), 1
            ).otherwise(0)
        ).cast("bigint").alias("n_replicas_ge")
    )
    return (
        obs.crossJoin(F.broadcast(hits))
        .select(
            "n_items",
            "observed_stat",
            F.lit(n_replicas).cast("bigint").alias("n_replicas"),
            "n_replicas_ge",
            F.expr(
                f"((n_replicas_ge + 1) * CAST(1000000 AS BIGINT))"
                f" div ({n_replicas} + 1)"
            ).cast("bigint").alias("p_value_ppm"),
        )
    )


def permutation_test_sql(
    source_sql: str,
    key_col: str,
    a_col: str,
    b_col: str,
    n_replicas: int = 128,
    salt: str = "perm-v1",
) -> str:
    from gis_city_county_spark.operators.sketch import _h60_sql

    h = _h60_sql(
        f"'{salt}|' || CAST(r AS VARCHAR) || '|' || CAST(k AS VARCHAR)"
    )
    return f"""
WITH base AS MATERIALIZED (
  SELECT CAST({key_col} AS VARCHAR) AS k,
         CAST({a_col} AS BIGINT) - CAST({b_col} AS BIGINT) AS d
  FROM ({source_sql})
),
obs AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(d) AS BIGINT) AS observed_stat
  FROM base
),
rep AS (
  SELECT k, d, r
  FROM base CROSS JOIN (
    SELECT unnest(generate_series(0, {n_replicas - 1})) AS r
  )
),
stats AS (
  SELECT r,
         CAST(SUM(CASE WHEN {h} % 2 = 0 THEN d ELSE -d END) AS BIGINT)
           AS s
  FROM rep GROUP BY r
),
hits AS (
  SELECT CAST(SUM(CASE WHEN ABS(s) >= ABS(observed_stat)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_replicas_ge
  FROM stats CROSS JOIN obs
)
SELECT n_items, observed_stat,
       CAST({n_replicas} AS BIGINT) AS n_replicas,
       n_replicas_ge,
       CAST(((n_replicas_ge + 1) * CAST(1000000 AS BIGINT))
            // ({n_replicas} + 1) AS BIGINT) AS p_value_ppm
FROM obs CROSS JOIN hits
"""


def wilson_ci(
    df: DataFrame, group_col: str, success_col: str, z_milli: int = 1960
) -> DataFrame:
    """Wilson score interval per group — the proportion CI that
    behaves at the extremes (never leaves [0, 1], sane at small n)
    where the naive Wald interval fails; the standard error bar for
    per-slice pass rates and conversion dashboards.

    Cross-engine exactness: the integer side (successes, trials) is
    exact BIGINT; the interval is a FIXED-ORDER IEEE tail — identical
    casts, one sqrt, identical multiply/divide sequence on both
    engines (the MCC/Brier discipline), so the doubles bit-match.
    ``z_milli`` keeps z rational (default 1960 = the 95% two-sided
    score).

    Returns (group, n_trials, n_successes, p_hat_ppm, wilson_lo,
    wilson_hi) ordered by group.
    """
    agg = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trials"),
        F.sum(F.col(success_col).cast("bigint")).cast("bigint")
        .alias("n_successes"),
    )
    z = F.lit(z_milli).cast("double") / F.lit(1000.0)
    n = F.col("n_trials").cast("double")
    p = F.col("n_successes").cast("double") / n
    z2 = z * z
    center = p + z2 / (F.lit(2.0) * n)
    half = z * F.sqrt((p * (F.lit(1.0) - p) + z2 / (F.lit(4.0) * n)) / n)
    denom = F.lit(1.0) + z2 / n
    return agg.select(
        F.col("__g").alias(group_col),
        "n_trials",
        "n_successes",
        F.expr(
            "(n_successes * CAST(1000000 AS BIGINT)) div n_trials"
        ).cast("bigint").alias("p_hat_ppm"),
        ((center - half) / denom).alias("wilson_lo"),
        ((center + half) / denom).alias("wilson_hi"),
    ).orderBy(group_col)


def wilson_ci_sql(
    source_sql: str, group_col: str, success_col: str, z_milli: int = 1960
) -> str:
    z = f"(CAST({z_milli} AS DOUBLE) / 1000.0)"
    n = "CAST(n_trials AS DOUBLE)"
    p = f"(CAST(n_successes AS DOUBLE) / {n})"
    z2 = f"({z} * {z})"
    center = f"({p} + {z2} / (2.0 * {n}))"
    half = (
        f"({z} * SQRT(({p} * (1.0 - {p}) + {z2} / (4.0 * {n})) / {n}))"
    )
    denom = f"(1.0 + {z2} / {n})"
    return f"""
WITH agg AS (
  SELECT {group_col} AS g,
         CAST(COUNT(*) AS BIGINT) AS n_trials,
         CAST(SUM(CAST({success_col} AS BIGINT)) AS BIGINT) AS n_successes
  FROM ({source_sql}) GROUP BY 1
)
SELECT g AS {group_col}, n_trials, n_successes,
       CAST((n_successes * CAST(1000000 AS BIGINT)) // n_trials AS BIGINT)
         AS p_hat_ppm,
       ({center} - {half}) / {denom} AS wilson_lo,
       ({center} + {half}) / {denom} AS wilson_hi
FROM agg
ORDER BY g
"""


def lift_table(
    df: DataFrame,
    key_col: str,
    score_col: str,
    label_col: str,
    n_bands: int = 10,
) -> DataFrame:
    """Decile lift & gains table — the model-eval artifact a ranking
    or propensity model ships with: rows sorted by score descending,
    cut into ``n_bands`` equal bands; each band reports its response
    rate, its share of all positives captured so far (cumulative
    gains), and its lift over the base rate — all in exact ppm.

    Exactness: the rank is the house two-phase ``ranged_rank`` (a
    strict (score, key) total order, no single-partition window over
    raw rows); band assignment is integer arithmetic on the rank;
    every rate is an exact floor division — lift's three-factor
    numerator n_pos·N·10⁶ routes through DECIMAL(38,0)/HUGEINT (it
    overflows int64 around 10⁷ rows; round-11 advisory).  Cumulative
    sums run over the ``n_bands``-row band frame.

    Returns (band, n_rows, n_pos, response_ppm, cum_pos, capture_ppm,
    lift_ppm) ordered by band (1 = highest scores).
    """
    from gis_city_county_spark.operators.scale import ranged_rank

    ranked = ranged_rank(
        df.select(
            F.col(key_col).alias("__k"),
            F.col(score_col).alias("__s"),
            F.col(label_col).cast("bigint").alias("__y"),
        ),
        "__s",
        "__k",
        rank_col="__r",
        descending=True,
    )
    tot = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__y").cast("bigint").alias("__pos"),
    )
    bands = (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            (F.expr(f"((__r - 1) * {n_bands}) div __n") + 1)
            .cast("bigint").alias("band"),
            "__y", "__n", "__pos",
        )
        .groupBy("band", "__n", "__pos")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("__y").cast("bigint").alias("n_pos"),
        )
    )
    w_cum = Window.orderBy(F.col("band").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        bands.withColumn("cum_pos", F.sum("n_pos").over(w_cum).cast("bigint"))
        .select(
            "band",
            "n_rows",
            "n_pos",
            F.expr("(n_pos * CAST(1000000 AS BIGINT)) div n_rows")
            .cast("bigint").alias("response_ppm"),
            "cum_pos",
            F.expr(
                "CASE WHEN __pos > 0 THEN"
                " (cum_pos * CAST(1000000 AS BIGINT)) div __pos"
                " ELSE 0 END"
            ).cast("bigint").alias("capture_ppm"),
            # three-factor DECIMAL product: n_pos·n·10⁶ overflows
            # int64 around 10⁷ input rows (round-11 advisory)
            F.expr(
                "CASE WHEN __pos > 0 THEN"
                " CAST((CAST(n_pos AS DECIMAL(18,0))"
                " * CAST(__n AS DECIMAL(18,0))"
                " * CAST(1000000 AS DECIMAL(7,0)))"
                " div (CAST(n_rows AS DECIMAL(18,0))"
                " * CAST(__pos AS DECIMAL(18,0))) AS BIGINT)"
                " ELSE 0 END"
            ).cast("bigint").alias("lift_ppm"),
        )
        .orderBy("band")
    )


def lift_table_sql(
    source_sql: str,
    key_col: str,
    score_col: str,
    label_col: str,
    n_bands: int = 10,
) -> str:
    return f"""
WITH ranked AS (
  SELECT CAST({label_col} AS BIGINT) AS y,
         ROW_NUMBER() OVER (ORDER BY {score_col} DESC, {key_col} ASC)
           AS r
  FROM ({source_sql})
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
  FROM ranked
),
bands AS (
  SELECT ((r - 1) * {n_bands}) // n + 1 AS band, y, n, pos
  FROM ranked CROSS JOIN tot
),
agg AS (
  SELECT band, n, pos,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(y) AS BIGINT) AS n_pos
  FROM bands GROUP BY 1, 2, 3
)
SELECT CAST(band AS BIGINT) AS band, n_rows, n_pos,
       CAST((n_pos * CAST(1000000 AS BIGINT)) // n_rows AS BIGINT)
         AS response_ppm,
       CAST(SUM(n_pos) OVER (ORDER BY band ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS cum_pos,
       CASE WHEN pos > 0 THEN
         CAST((SUM(n_pos) OVER (ORDER BY band ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)
               * CAST(1000000 AS BIGINT)) // pos AS BIGINT)
       ELSE 0 END AS capture_ppm,
       CASE WHEN pos > 0 THEN
         CAST((CAST(n_pos AS HUGEINT) * CAST(n AS HUGEINT)
               * CAST(1000000 AS HUGEINT))
              // (CAST(n_rows AS HUGEINT) * CAST(pos AS HUGEINT))
              AS BIGINT)
       ELSE 0 END AS lift_ppm
FROM agg
ORDER BY band
"""


def ks_test(
    df: DataFrame, side_col: str, value_col: str
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance — the distribution-drift
    test in its exact-integer form: over the DISTINCT-value cells
    (never the rows), the empirical-CDF gap at value v is
    ``|cum_a·n_b − cum_b·n_a| / (n_a·n_b)`` — an exact rational, so
    the maximizing cell and the ppm distance are engine-exact with no
    doubles at all.  ``side_col`` must be 0/1 (control/treatment,
    yesterday/today, train/serve).  The gap products and the ×10⁶
    ppm numerator route through DECIMAL(38,0) (Spark) / HUGEINT
    (DuckDB) — cum·n alone overflows int64 once each side passes
    ~3·10⁹ rows, and gap·10⁶ at ~3·10⁶ (round-11 advisory; the
    cohens_kappa count-product convention).  Exact up to ~5·10¹⁵
    rows per side (gap·10⁶ ≤ 10³⁸).

    Scale shape: one map-combinable (value, side) count, cumulative
    windows over the bounded distinct-value cells (the
    contingency-cell discipline), one argmax.

    Returns one row: (n_a, n_b, n_cells, d_ppm, at_value) — at_value
    is the smallest value achieving the maximum gap.
    """
    cells = (
        df.groupBy(F.col(value_col).alias("__v"))
        .agg(
            F.sum(
                F.when(F.col(side_col) == 0, 1).otherwise(0)
            ).cast("bigint").alias("__ca"),
            F.sum(
                F.when(F.col(side_col) == 1, 1).otherwise(0)
            ).cast("bigint").alias("__cb"),
        )
    )
    w_cum = Window.orderBy(F.col("__v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    gaps = cells.select(
        "__v",
        F.sum("__ca").over(w_cum).alias("__cuma"),
        F.sum("__cb").over(w_cum).alias("__cumb"),
        F.sum("__ca").over(w_all).alias("__na"),
        F.sum("__cb").over(w_all).alias("__nb"),
        F.count(F.lit(1)).over(w_all).alias("__cells"),
    ).withColumn(
        # DECIMAL(18)×DECIMAL(18) products: cum·n alone overflows
        # int64 near 3e9 rows per side (round-11 advisory).
        "__gap",
        F.abs(
            F.col("__cuma").cast("decimal(18,0)")
            * F.col("__nb").cast("decimal(18,0)")
            - F.col("__cumb").cast("decimal(18,0)")
            * F.col("__na").cast("decimal(18,0)")
        ).cast("decimal(38,0)"),
    )
    w_max = Window.orderBy(F.col("__gap").desc(), F.col("__v").asc())
    return (
        gaps.withColumn("__rk", F.row_number().over(w_max))
        .filter(F.col("__rk") == 1)
        .select(
            F.col("__na").cast("bigint").alias("n_a"),
            F.col("__nb").cast("bigint").alias("n_b"),
            F.col("__cells").cast("bigint").alias("n_cells"),
            # guard on the factors, not their product — na·nb itself
            # is the int64-overflowing term the decimals route around
            F.expr(
                "CASE WHEN __na > 0 AND __nb > 0 THEN"
                " (__gap * CAST(1000000 AS DECIMAL(7,0)))"
                " div (CAST(__na AS DECIMAL(18,0))"
                " * CAST(__nb AS DECIMAL(18,0)))"
                " ELSE 0 END"
            ).cast("bigint").alias("d_ppm"),
            F.col("__v").alias("at_value"),
        )
    )


def ks_test_sql(source_sql: str, side_col: str, value_col: str) -> str:
    return f"""
WITH cells AS (
  SELECT {value_col} AS v,
         CAST(SUM(CASE WHEN {side_col} = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS ca,
         CAST(SUM(CASE WHEN {side_col} = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS cb
  FROM ({source_sql}) GROUP BY 1
),
gaps AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cuma,
         SUM(cb) OVER (ORDER BY v ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cumb,
         SUM(ca) OVER () AS na,
         SUM(cb) OVER () AS nb,
         COUNT(*) OVER () AS cells
  FROM cells
),
scored AS (
  SELECT v, na, nb, cells,
         ABS(CAST(cuma AS HUGEINT) * CAST(nb AS HUGEINT)
             - CAST(cumb AS HUGEINT) * CAST(na AS HUGEINT)) AS gap
  FROM gaps
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CAST(cells AS BIGINT) AS n_cells,
       CASE WHEN na > 0 AND nb > 0 THEN
         CAST((gap * CAST(1000000 AS HUGEINT))
              // (CAST(na AS HUGEINT) * CAST(nb AS HUGEINT)) AS BIGINT)
       ELSE 0 END AS d_ppm,
       v AS at_value
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY gap DESC, v ASC) AS rk
  FROM scored
) WHERE rk = 1
"""


def smd_balance(
    df: DataFrame, treat_col: str, metric_cols: list[str]
) -> DataFrame:
    """Standardized mean difference per covariate — the A/B and
    propensity-matching balance check ("are treatment and control
    comparable BEFORE the effect readout?"): ``SMD = (mean_t −
    mean_c) / sqrt((var_t + var_c) / 2)``; |SMD| > 0.1 is the
    conventional imbalance flag (emitted in exact milli units
    alongside).

    Exactness: per-(metric, arm) moments fold in DECIMAL(38,10)
    (exact sums of milli-quantized values); means/variances and the
    SMD are a FIXED-ORDER IEEE tail identical on both engines.  Scale
    shape: one scan-side melt (k metric structs per row), one
    map-combinable (metric, arm) aggregate, a k-row pivot — never a
    per-metric pass.

    Returns (metric, n_c, n_t, mean_c, mean_t, smd) ordered by
    metric.
    """
    melted = df.select(
        F.col(treat_col).cast("int").alias("__t"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("__m"),
                        F.col(m).cast("double").alias("__x"),
                    )
                    for m in metric_cols
                ]
            )
        ).alias("__mx"),
    ).select("__t", F.col("__mx.__m").alias("__m"), F.col("__mx.__x").alias("__x"))
    # Exact decimal moments: x quantized to milli in BIGINT-safe
    # decimal, folded exactly; the IEEE tail starts at the division.
    milli = F.floor(F.col("__x") * 1000).cast("decimal(28,0)")
    agg = melted.groupBy("__m", "__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(milli).cast("decimal(28,0)").alias("__s"),
        F.sum(milli * milli).cast("decimal(38,0)").alias("__s2"),
    )
    pv = (
        agg.groupBy("__m")
        .agg(
            F.sum(F.when(F.col("__t") == 0, F.col("__n"))).cast("bigint")
            .alias("n_c"),
            F.sum(F.when(F.col("__t") == 1, F.col("__n"))).cast("bigint")
            .alias("n_t"),
            F.sum(F.when(F.col("__t") == 0, F.col("__s")))
            .cast("decimal(28,0)").alias("__sc"),
            F.sum(F.when(F.col("__t") == 1, F.col("__s")))
            .cast("decimal(28,0)").alias("__st"),
            F.sum(F.when(F.col("__t") == 0, F.col("__s2")))
            .cast("decimal(38,0)").alias("__s2c"),
            F.sum(F.when(F.col("__t") == 1, F.col("__s2")))
            .cast("decimal(38,0)").alias("__s2t"),
        )
    )
    # Fixed-order IEEE tail (identical text on both engines): means
    # and population variances in milli units, then the pooled-sd
    # denominator.
    tail = (
        "CAST(__sc AS DOUBLE) / CAST(n_c AS DOUBLE)",
        "CAST(__st AS DOUBLE) / CAST(n_t AS DOUBLE)",
        "CAST(__s2c AS DOUBLE) / CAST(n_c AS DOUBLE)",
        "CAST(__s2t AS DOUBLE) / CAST(n_t AS DOUBLE)",
    )
    mc, mt, qc, qt = tail
    var_c = f"({qc} - {mc} * {mc})"
    var_t = f"({qt} - {mt} * {mt})"
    smd = (
        f"CASE WHEN ({var_c} + {var_t}) > 0.0 THEN"
        f" ({mt} - {mc}) / SQRT(({var_c} + {var_t}) / 2.0)"
        f" ELSE CAST(0.0 AS DOUBLE) END"
    )
    return pv.select(
        F.col("__m").alias("metric"),
        "n_c",
        "n_t",
        (F.expr(mc) / F.lit(1000.0)).alias("mean_c"),
        (F.expr(mt) / F.lit(1000.0)).alias("mean_t"),
        F.expr(smd).alias("smd"),
    ).orderBy("metric")


def smd_balance_sql(
    source_sql: str, treat_col: str, metric_cols: list[str]
) -> str:
    melt = "\n  UNION ALL\n  ".join(
        f"SELECT CAST({treat_col} AS INTEGER) AS t, '{m}' AS m,"
        f" CAST({m} AS DOUBLE) AS x FROM ({source_sql})"
        for m in metric_cols
    )
    mc = "CAST(sc AS DOUBLE) / CAST(n_c AS DOUBLE)"
    mt = "CAST(st AS DOUBLE) / CAST(n_t AS DOUBLE)"
    qc = "CAST(s2c AS DOUBLE) / CAST(n_c AS DOUBLE)"
    qt = "CAST(s2t AS DOUBLE) / CAST(n_t AS DOUBLE)"
    var_c = f"({qc} - {mc} * {mc})"
    var_t = f"({qt} - {mt} * {mt})"
    smd = (
        f"CASE WHEN ({var_c} + {var_t}) > 0.0 THEN"
        f" ({mt} - {mc}) / SQRT(({var_c} + {var_t}) / 2.0)"
        f" ELSE CAST(0.0 AS DOUBLE) END"
    )
    return f"""
WITH melted AS (
  {melt}
),
agg AS (
  SELECT m, t,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(x * 1000) AS HUGEINT)) AS HUGEINT) AS s,
         CAST(SUM(CAST(FLOOR(x * 1000) AS HUGEINT)
                  * CAST(FLOOR(x * 1000) AS HUGEINT)) AS HUGEINT) AS s2
  FROM melted GROUP BY 1, 2
),
pv AS (
  SELECT m,
         CAST(SUM(CASE WHEN t = 0 THEN n END) AS BIGINT) AS n_c,
         CAST(SUM(CASE WHEN t = 1 THEN n END) AS BIGINT) AS n_t,
         SUM(CASE WHEN t = 0 THEN s END) AS sc,
         SUM(CASE WHEN t = 1 THEN s END) AS st,
         SUM(CASE WHEN t = 0 THEN s2 END) AS s2c,
         SUM(CASE WHEN t = 1 THEN s2 END) AS s2t
  FROM agg GROUP BY 1
)
SELECT m AS metric, n_c, n_t,
       {mc} / 1000.0 AS mean_c,
       {mt} / 1000.0 AS mean_t,
       {smd} AS smd
FROM pv
ORDER BY metric
"""


def bradley_terry(
    contests: DataFrame,
    winner_col: str,
    loser_col: str,
    rounds: int = 10,
    scale: int = 1_000_000,
    local_max_cells: int = 65536,
) -> DataFrame:
    """Bradley-Terry preference strengths — the model behind pairwise
    preference data (RLHF comparisons, A/B taste tests, chess-style
    ratings in batch form): item strengths ``p`` with ``P(i beats j)
    = p_i / (p_i + p_j)``, fit by Hunter's MM iteration ``p_i ←
    W_i / Σ_j n_ij / (p_i + p_j)``.

    Exactness: the PageRank discipline — strengths live in integer
    ``scale`` units and every division is an integral floor division
    mirrored on both engines, so per-round sums are order-independent
    (no sorted folds) and the result is engine-exact at any
    parallelism.  Per round the renormalization pins Σp = k·scale.
    ``max_delta`` (last round's largest per-item move, in scale
    units) rides along so callers see convergence instead of trusting
    the round count.

    Scale shape: contests aggregate once to the pairwise cell
    relation (≤ items² rows — items are MODELS/VARIANTS being
    compared, thousands at most, while contests are the big input);
    each round is two broadcast-sized joins + one map-combinable sum
    over the cells.  Requires every item to appear in at least one
    win for a finite strength (the standard BT connectivity caveat —
    zero-win items converge to strength 0 and are reported, not
    dropped).

    Returns (item, strength, n_wins, n_contests) ordered by strength
    desc (tie: item).
    """
    from gis_city_county_spark.operators.scale import (
        checkpoint_eager,
        checkpoint_lazy,
    )

    # NULL winner/loser rows are dropped UP FRONT so the driver-local
    # fast path and the relational loop agree bit-for-bit: the
    # relational path's inner joins on __i silently dropped a null
    # item from the output while the local MM kept it as a strength-0
    # row (r12 advisory).  A null item is not a contestant.
    w = (
        contests.filter(
            F.col(winner_col).isNotNull() & F.col(loser_col).isNotNull()
        )
        .groupBy(
            F.col(winner_col).alias("__i"), F.col(loser_col).alias("__j")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("__w"))
    )
    # Symmetric cells n_ij (both orientations present) + per-item wins.
    cells = (
        w.select("__i", "__j", "__w")
        .unionByName(
            w.select(
                F.col("__j").alias("__i"), F.col("__i").alias("__j"),
                F.lit(0).cast("bigint").alias("__w"),
            )
        )
        .groupBy("__i", "__j")
        .agg(F.sum("__w").cast("bigint").alias("__wij"))
    )
    sym = (
        cells.alias("a")
        .join(
            cells.select(
                F.col("__i").alias("__j2"), F.col("__j").alias("__i2"),
                F.col("__wij").alias("__wji"),
            ),
            (F.col("__i") == F.col("__i2")) & (F.col("__j") == F.col("__j2")),
        )
        .select("__i", "__j", (F.col("__wij") + F.col("__wji")).alias("__n"))
        .transform(checkpoint_lazy)
    )
    wins = (
        cells.groupBy("__i")
        .agg(F.sum("__wij").cast("bigint").alias("__wi"))
        .transform(checkpoint_lazy)
    )
    n_items = wins.count()  # bounded: the item census, not the contests
    # Fast path (r12, guide §1.2/§5): the MM rounds operate on the
    # ≤items² cell relation — microseconds of integer arithmetic that
    # the relational loop was paying ~8 driver-job round trips for.
    # When the MEASURED cell count is metadata-sized (same boundedness
    # class as the `wins.count()` above and the bloom-bits/IVF-probe
    # collects), run the rounds in exact Python ints on the driver —
    # bit-identical to the relational path (all operands non-negative,
    # Python `//` == Spark `div` == DuckDB `//` there) — and return a
    # LocalRelation.  A cell relation too big to collect falls back to
    # the per-round relational loop unchanged.
    sym_eager = sym.transform(checkpoint_eager)
    n_cells = sym_eager.count()
    if n_cells <= local_max_cells:
        return _bradley_terry_local(
            sym_eager, wins, n_items, rounds, scale, contests.sparkSession
        )
    sym = sym_eager
    p = wins.select("__i", F.lit(scale).cast("bigint").alias("__p"),
                    F.lit(0).cast("bigint").alias("__delta"))
    # Every per-round join operand below is items-sized (the item
    # census `n_items`, thousands at most per the operator contract —
    # contests are the big input and they collapsed into `sym` above),
    # so the strengths table is explicitly broadcast: each round
    # becomes two map-side joins over the cell relation instead of
    # four shuffle exchanges (guide SS3.1 — broadcast the side you
    # KNOW is small; the planner only sees size estimates).
    for r in range(rounds):
        terms = (
            sym.join(F.broadcast(p.select(F.col("__i").alias("__ti"),
                                          F.col("__p").alias("__pi"))),
                     F.col("__i") == F.col("__ti"))
            .join(F.broadcast(p.select(F.col("__i").alias("__tj"),
                                       F.col("__p").alias("__pj"))),
                  F.col("__j") == F.col("__tj"))
            .select(
                "__i",
                F.expr(
                    "CASE WHEN __pi + __pj > 0 THEN"
                    " CAST(__n AS DECIMAL(28,0)) * 1000000000"
                    "   div (__pi + __pj)"
                    " ELSE CAST(0 AS BIGINT) END"
                ).alias("__t"),
            )
            .groupBy("__i")
            .agg(F.sum("__t").cast("decimal(38,0)").alias("__d"))
        )
        raw = wins.join(F.broadcast(terms), "__i").select(
            "__i",
            F.expr(
                "CASE WHEN __d > 0 THEN"
                " CAST(CAST(__wi AS DECIMAL(28,0)) * 1000000000"
                f"  * {scale} div __d AS BIGINT)"
                " ELSE CAST(0 AS BIGINT) END"
            ).alias("__praw"),
        )
        tot = raw.agg(F.sum("__praw").cast("decimal(38,0)").alias("__tot"))
        new_p = raw.crossJoin(F.broadcast(tot)).select(
            "__i",
            F.expr(
                "CASE WHEN __tot > 0 THEN"
                f" CAST(CAST(__praw AS DECIMAL(28,0)) * {n_items}"
                f"  * {scale} div __tot AS BIGINT)"
                " ELSE CAST(0 AS BIGINT) END"
            ).alias("__p"),
        )
        p = (
            new_p.join(F.broadcast(p.select(F.col("__i").alias("__oi"),
                                            F.col("__p").alias("__op"))),
                       F.col("__i") == F.col("__oi"))
            .select("__i", "__p",
                    F.abs(F.col("__p") - F.col("__op")).alias("__delta"))
            .transform(checkpoint_lazy)
        )
    max_delta = p.agg(F.max("__delta").cast("bigint").alias("__md"))
    return (
        p.join(F.broadcast(wins), "__i")
        .join(
            F.broadcast(sym.groupBy("__i").agg(
                F.sum("__n").cast("bigint").alias("n_contests")
            )),
            "__i",
        )
        .crossJoin(F.broadcast(max_delta))
        .select(
            F.col("__i").alias("item"),
            F.col("__p").cast("bigint").alias("strength"),
            F.col("__wi").alias("n_wins"),
            "n_contests",
            F.col("__md").alias("max_delta"),
        )
        .orderBy(F.col("strength").desc(), F.col("item").asc())
    )


def _bradley_terry_local(
    sym: DataFrame,
    wins: DataFrame,
    n_items: int,
    rounds: int,
    scale: int,
    spark,
) -> DataFrame:
    """Driver-side MM rounds over the MEASURED-small cell relation —
    the exact integer arithmetic of the relational loop (and of
    ``bradley_terry_sql``'s unrolled CTEs) in Python ints: every
    operand is non-negative, so Python ``//`` == Spark ``div`` ==
    DuckDB HUGEINT ``//`` bit-for-bit, and int sums are
    order-independent.  One bounded collect replaces rounds× driver
    jobs; the caller gates on the cell count."""
    from pyspark.sql.types import LongType, StructField, StructType

    cell_rows = [(r["__i"], r["__j"], r["__n"]) for r in sym.collect()]
    win_rows = {r["__i"]: r["__wi"] for r in wins.collect()}
    p = {i: scale for i in win_rows}
    delta = {i: 0 for i in win_rows}
    for _ in range(rounds):
        d = {i: 0 for i in win_rows}
        for i, j, n in cell_rows:
            s = p[i] + p[j]
            if s > 0:
                d[i] += (n * 1_000_000_000) // s
        praw = {
            i: ((wi * 1_000_000_000 * scale) // d[i] if d[i] > 0 else 0)
            for i, wi in win_rows.items()
        }
        tot = sum(praw.values())
        new_p = {
            i: ((v * n_items * scale) // tot if tot > 0 else 0)
            for i, v in praw.items()
        }
        delta = {i: abs(new_p[i] - p[i]) for i in win_rows}
        p = new_p
    max_delta = max(delta.values()) if delta else None
    n_contests = {i: 0 for i in win_rows}
    for i, _j, n in cell_rows:
        n_contests[i] += n
    item_type = wins.schema["__i"].dataType
    schema = StructType(
        [
            StructField("item", item_type),
            StructField("strength", LongType()),
            StructField("n_wins", LongType()),
            StructField("n_contests", LongType()),
            StructField("max_delta", LongType()),
        ]
    )
    rows = [
        (i, p[i], win_rows[i], n_contests[i], max_delta)
        for i in win_rows
    ]
    return spark.createDataFrame(rows, schema).orderBy(
        F.col("strength").desc(), F.col("item").asc()
    )


def bradley_terry_sql(
    contests_sql: str,
    winner_col: str,
    loser_col: str,
    rounds: int = 10,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin: fixed MM rounds unrolled into chained CTEs (the
    pagerank convention), HUGEINT floor divisions mirroring Spark's
    integral `div`."""
    parts = [
        f"""WITH contests AS ({contests_sql}),
w AS (
  SELECT {winner_col} AS i, {loser_col} AS j,
         CAST(COUNT(*) AS BIGINT) AS wij
  FROM contests GROUP BY 1, 2
),
cells AS (
  SELECT i, j, CAST(SUM(wij) AS BIGINT) AS wij FROM (
    SELECT i, j, wij FROM w
    UNION ALL
    SELECT j AS i, i AS j, 0 AS wij FROM w
  ) GROUP BY 1, 2
),
sym AS MATERIALIZED (
  SELECT a.i, a.j, a.wij + b.wij AS n
  FROM cells a JOIN cells b ON a.i = b.j AND a.j = b.i
),
wins AS MATERIALIZED (SELECT i, CAST(SUM(wij) AS BIGINT) AS wi FROM cells GROUP BY 1),
k AS (SELECT CAST(COUNT(*) AS HUGEINT) AS k FROM wins),
p0 AS MATERIALIZED (SELECT i, CAST({scale} AS HUGEINT) AS p,
              CAST(0 AS HUGEINT) AS delta FROM wins)"""
    ]
    for r in range(rounds):
        parts.append(f"""terms{r} AS MATERIALIZED (
  SELECT s.i,
         SUM(CASE WHEN pi.p + pj.p > 0 THEN
               (CAST(s.n AS HUGEINT) * 1000000000) // (pi.p + pj.p)
             ELSE 0 END) AS d
  FROM sym s JOIN p{r} pi ON s.i = pi.i JOIN p{r} pj ON s.j = pj.i
  GROUP BY s.i
),
raw{r} AS MATERIALIZED (
  SELECT w.i,
         CASE WHEN t.d > 0 THEN
           (CAST(w.wi AS HUGEINT) * 1000000000 * {scale}) // t.d
         ELSE 0 END AS praw
  FROM wins w JOIN terms{r} t ON w.i = t.i
),
tot{r} AS (SELECT CAST(SUM(praw) AS HUGEINT) AS tot FROM raw{r}),
p{r + 1} AS MATERIALIZED (
  SELECT r.i,
         CASE WHEN tot > 0 THEN
           (CAST(r.praw AS HUGEINT) * k * {scale}) // tot
         ELSE 0 END AS p,
         CAST(ABS(CASE WHEN tot > 0 THEN
           (CAST(r.praw AS HUGEINT) * k * {scale}) // tot
         ELSE 0 END - o.p) AS HUGEINT) AS delta
  FROM raw{r} r CROSS JOIN tot{r} CROSS JOIN k
  JOIN p{r} o ON r.i = o.i
)""")
        parts[-1] = parts[-1]
    body = ",\n".join(parts)
    return f"""{body},
md AS (SELECT CAST(MAX(delta) AS BIGINT) AS md FROM p{rounds}),
nc AS (SELECT i, CAST(SUM(n) AS BIGINT) AS n_contests FROM sym GROUP BY 1)
SELECT p.i AS item, CAST(p.p AS BIGINT) AS strength,
       w.wi AS n_wins, nc.n_contests, md.md AS max_delta
FROM p{rounds} p JOIN wins w ON p.i = w.i JOIN nc ON p.i = nc.i
CROSS JOIN md
ORDER BY strength DESC, item ASC
"""


def mann_whitney_u(df: DataFrame, side_col: str, value_col: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) over two INDEPENDENT samples
    — the unpaired sibling of :func:`wilcoxon_signed_rank` and the
    rank-based answer to "did the treatment arm score higher" when
    rows don't pair up.  Cliff's delta ``δ = 2U/(n_a·n_b) − 1`` rides
    along as the ordinal effect size (δ_ppm ≈ ±10⁶ = total
    separation) — the number an eval report should quote INSTEAD of a
    bare p-value when samples are corpus-sized.

    Exact in house style: midranks over the DISTINCT-value cells
    (never the rows), in milli units (a tie group covering 1-based
    ranks ``s..s+c−1`` has integer midrank ``500·(2s + c − 1)``
    milli); the prefix sum over the cells is the two-phase
    ``ranged_cumsum`` (distinct values are only bounded for coarse
    scores — the paired wilcoxon's round-11 lesson); every count
    product routes through DECIMAL(38,0)/HUGEINT (ca·midrank alone
    overflows int64 near 3·10⁹ rows per side); Cliff's delta is a
    sign-split floor division (Spark ``div`` truncates toward zero,
    DuckDB ``//`` floors — they only agree on non-negative operands).
    ``side_col`` must be 0/1.  The identity ``U_a + U_b = n_a·n_b``
    crossfoots the arithmetic (both emitted, milli units).

    Returns one row: (n_a, n_b, n_cells, u_a_milli, u_b_milli,
    cliffs_delta_ppm) — delta NULL when either side is empty.
    """
    from gis_city_county_spark.operators.scale import ranged_cumsum

    cells = (
        df.groupBy(F.col(value_col).alias("__v"))
        .agg(
            F.sum(F.when(F.col(side_col) == 0, 1).otherwise(0))
            .cast("bigint").alias("__ca"),
            F.sum(F.when(F.col(side_col) == 1, 1).otherwise(0))
            .cast("bigint").alias("__cb"),
        )
        .withColumn("__c", F.col("__ca") + F.col("__cb"))
    )
    # __v is the group key, hence distinct — it is its own tiebreak.
    ranked = ranged_cumsum(
        cells, "__v", "__v", "__c",
        cum_col="__cum", total_col=None, descending=False,
    ).withColumn(
        # 1-based start rank of this tie group: cum − c + 1; midrank
        # in milli = 500 · (2·start + c − 1) = 500 · (2·cum − c + 1)
        "__mid_milli",
        (F.lit(500).cast("bigint")
         * (2 * F.col("__cum") - F.col("__c") + 1)),
    )
    tot = ranked.agg(
        F.sum("__ca").cast("bigint").alias("n_a"),
        F.sum("__cb").cast("bigint").alias("n_b"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(
            F.col("__ca").cast("decimal(18,0)")
            * F.col("__mid_milli").cast("decimal(18,0)")
        ).cast("decimal(38,0)").alias("__ra_milli"),
    )
    scored = tot.withColumn(
        "__ua_milli",
        F.expr(
            "__ra_milli - CAST(500 AS DECIMAL(4,0))"
            " * CAST(n_a AS DECIMAL(18,0)) * (n_a + 1)"
        ),
    ).withColumn(
        "__nab_milli",
        F.expr(
            "CAST(1000 AS DECIMAL(4,0))"
            " * CAST(n_a AS DECIMAL(18,0)) * CAST(n_b AS DECIMAL(18,0))"
        ),
    )
    return scored.select(
        "n_a",
        "n_b",
        "n_cells",
        F.expr("CAST(__ua_milli AS BIGINT)").alias("u_a_milli"),
        F.expr("CAST(__nab_milli - __ua_milli AS BIGINT)")
        .alias("u_b_milli"),
        F.expr(
            "CASE WHEN n_a = 0 OR n_b = 0 THEN CAST(NULL AS BIGINT) ELSE"
            " CAST((CASE WHEN 2 * __ua_milli < __nab_milli"
            "       THEN -1 ELSE 1 END)"
            " * ((CAST(1000 AS DECIMAL(4,0))"
            "     * abs(2 * __ua_milli - __nab_milli))"
            "    div (CAST(n_a AS DECIMAL(18,0))"
            "         * CAST(n_b AS DECIMAL(18,0)))) AS BIGINT) END"
        ).alias("cliffs_delta_ppm"),
    )


def mann_whitney_u_sql(source_sql: str, side_col: str, value_col: str) -> str:
    return f"""
WITH cells AS (
  SELECT {value_col} AS v,
         CAST(SUM(CASE WHEN {side_col} = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS ca,
         CAST(SUM(CASE WHEN {side_col} = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS cb
  FROM ({source_sql}) GROUP BY 1
),
ranked AS (
  SELECT ca, cb,
         500 * (2 * SUM(ca + cb) OVER (ORDER BY v ASC
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW)
                - (ca + cb) + 1) AS mid_milli
  FROM cells
),
tot AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
         CAST(SUM(cb) AS BIGINT) AS n_b,
         CAST(COUNT(*) AS BIGINT) AS n_cells,
         CAST(SUM(CAST(ca AS HUGEINT) * CAST(mid_milli AS HUGEINT))
              AS HUGEINT) AS ra_milli
  FROM ranked
),
scored AS (
  SELECT n_a, n_b, n_cells,
         ra_milli - CAST(500 AS HUGEINT) * CAST(n_a AS HUGEINT)
           * (CAST(n_a AS HUGEINT) + 1) AS ua_milli
  FROM tot
)
SELECT n_a, n_b, n_cells,
       CAST(ua_milli AS BIGINT) AS u_a_milli,
       CAST(CAST(1000 AS HUGEINT) * CAST(n_a AS HUGEINT)
            * CAST(n_b AS HUGEINT) - ua_milli AS BIGINT) AS u_b_milli,
       CASE WHEN n_a = 0 OR n_b = 0 THEN CAST(NULL AS BIGINT) ELSE
         CAST((CASE WHEN 2 * ua_milli < CAST(1000 AS HUGEINT)
                 * CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT)
               THEN -1 ELSE 1 END)
              * ((CAST(1000 AS HUGEINT)
                  * ABS(2 * ua_milli - CAST(1000 AS HUGEINT)
                        * CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT)))
                 // (CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT)))
              AS BIGINT) END AS cliffs_delta_ppm
FROM scored
"""


def weighted_kappa(df: DataFrame, rater_a: str, rater_b: str) -> DataFrame:
    """Quadratic-weighted Cohen's kappa over two ORDINAL labelers —
    the agreement statistic for graded judgments (1-5 quality scores,
    rubric points, star ratings) where plain kappa wastes the scale:
    disagreeing by one step should cost less than disagreeing by four,
    so cell (i, j) carries weight ``(i−j)²``.

    The whole statistic is scan-side — no contingency table is ever
    materialized.  The observed disagreement is ``Σ (a−b)²`` over the
    rows, and the chance disagreement FACTORS through the marginal
    moments: ``Σᵢⱼ rᵢ·cⱼ·(i−j)² = (Σa²)·N + N·(Σb²) − 2·(Σa)(Σb)``
    (expand (i−j)² and note Σᵢ rᵢ·iᵏ is just the k-th moment of
    rater a over the rows).  So ONE map-combinable aggregate yields
    both numerators, each an exact DECIMAL(38,0)/HUGEINT product of
    BIGINT sums (N·Σ(a−b)² overflows int64 near 10⁹ rows on a 5-point
    scale — the cohens_kappa convention), and

        κ_w = 1 − N·Σ(a−b)² / (Σa²·N + N·Σb² − 2·Σa·Σb)

    is emitted as an exact sign-split milli floor division — no
    doubles anywhere (DuckDB's DECIMAL→DOUBLE cast rounds
    incorrectly, so exact integer output is the only bit-portable
    form).  Rows where either label is NULL are dropped (documented
    contract, same as cohens_kappa).  Labels must be integer-castable
    ordinals.

    Returns one row: (n_rows, o_num, e_num, kappa_w_milli) — o_num =
    N·Σ(a−b)² and e_num the chance numerator, both cast to BIGINT for
    the result surface (exact below ~3·10⁹ rows · 5-point scales;
    internal arithmetic stays DECIMAL), kappa NULL when e_num = 0 (a
    constant labeling).
    """
    base = df.filter(
        F.col(rater_a).isNotNull() & F.col(rater_b).isNotNull()
    ).select(
        F.col(rater_a).cast("bigint").alias("__a"),
        F.col(rater_b).cast("bigint").alias("__b"),
    )
    mom = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.expr("(__a - __b) * (__a - __b)"))
        .cast("bigint").alias("__d2"),
        F.sum("__a").cast("bigint").alias("__sa"),
        F.sum(F.expr("__a * __a")).cast("bigint").alias("__sa2"),
        F.sum("__b").cast("bigint").alias("__sb"),
        F.sum(F.expr("__b * __b")).cast("bigint").alias("__sb2"),
    )
    o_num = (
        "(CAST(n_rows AS DECIMAL(18,0)) * CAST(__d2 AS DECIMAL(18,0)))"
    )
    e_num = (
        "(CAST(__sa2 AS DECIMAL(18,0)) * CAST(n_rows AS DECIMAL(18,0))"
        " + CAST(n_rows AS DECIMAL(18,0)) * CAST(__sb2 AS DECIMAL(18,0))"
        " - 2 * CAST(__sa AS DECIMAL(18,0)) * CAST(__sb AS DECIMAL(18,0)))"
    )
    return mom.select(
        "n_rows",
        F.expr(f"CAST({o_num} AS BIGINT)").alias("o_num"),
        F.expr(f"CAST({e_num} AS BIGINT)").alias("e_num"),
        F.expr(
            f"CASE WHEN {e_num} = 0 THEN CAST(NULL AS BIGINT) ELSE"
            f" CAST((CASE WHEN {e_num} < {o_num} THEN -1 ELSE 1 END)"
            f" * ((CAST(1000 AS DECIMAL(4,0)) * abs({e_num} - {o_num}))"
            f"    div {e_num}) AS BIGINT) END"
        ).alias("kappa_w_milli"),
    )


def weighted_kappa_sql(source_sql: str, rater_a: str, rater_b: str) -> str:
    o_num = "(CAST(n_rows AS HUGEINT) * CAST(d2 AS HUGEINT))"
    e_num = (
        "(CAST(sa2 AS HUGEINT) * CAST(n_rows AS HUGEINT)"
        " + CAST(n_rows AS HUGEINT) * CAST(sb2 AS HUGEINT)"
        " - 2 * CAST(sa AS HUGEINT) * CAST(sb AS HUGEINT))"
    )
    return f"""
WITH base AS (
  SELECT CAST({rater_a} AS BIGINT) AS a, CAST({rater_b} AS BIGINT) AS b
  FROM ({source_sql})
  WHERE {rater_a} IS NOT NULL AND {rater_b} IS NOT NULL
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM((a - b) * (a - b)) AS BIGINT) AS d2,
         CAST(SUM(a) AS BIGINT) AS sa,
         CAST(SUM(a * a) AS BIGINT) AS sa2,
         CAST(SUM(b) AS BIGINT) AS sb,
         CAST(SUM(b * b) AS BIGINT) AS sb2
  FROM base
)
SELECT n_rows,
       CAST({o_num} AS BIGINT) AS o_num,
       CAST({e_num} AS BIGINT) AS e_num,
       CASE WHEN {e_num} = 0 THEN CAST(NULL AS BIGINT) ELSE
         CAST((CASE WHEN {e_num} < {o_num} THEN -1 ELSE 1 END)
              * ((CAST(1000 AS HUGEINT) * ABS({e_num} - {o_num}))
                 // {e_num}) AS BIGINT) END AS kappa_w_milli
FROM mom
"""


def did_estimate(
    df: DataFrame, arm_col: str, period_col: str, value_col: str
) -> DataFrame:
    """Difference-in-differences — the pre/post × treatment/control
    estimate every launch review wants when randomization wasn't
    clean: ``DID = (T_post − T_pre) − (C_post − C_pre)``, the
    treatment's change net of the ambient drift the control arm
    measured.

    Exact where it can be: the four cell sums and counts are BIGINT
    (pass integer units — cents, counts; the spec feeds cents), and
    the estimate itself is four IEEE divisions and three subtractions
    in one FIXED spelled-out order, so both engines emit the same
    double (the runs-test tail discipline).  ``arm_col`` and
    ``period_col`` must be 0/1.

    Scale shape: ONE map-combinable scan-side aggregate — no joins,
    no windows, nothing driver-side.

    Returns one row: (n_c_pre, n_c_post, n_t_pre, n_t_post,
    sum_c_pre, sum_c_post, sum_t_pre, sum_t_post, did_estimate) —
    the estimate NULL when any cell is empty.
    """
    cell = [
        (a, p, f"{'t' if a else 'c'}_{'post' if p else 'pre'}")
        for a in (0, 1)
        for p in (0, 1)
    ]
    aggs = []
    for a, p, tag in cell:
        cond = (F.col(arm_col) == a) & (F.col(period_col) == p)
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")
            .alias(f"n_{tag}")
        )
        aggs.append(
            F.sum(F.when(cond, F.col(value_col)).otherwise(0))
            .cast("bigint").alias(f"sum_{tag}")
        )
    mom = df.agg(*aggs)
    est = (
        "(CAST(sum_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE)"
        " - CAST(sum_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE))"
        " - (CAST(sum_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE)"
        " - CAST(sum_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE))"
    )
    return mom.select(
        "n_c_pre", "n_c_post", "n_t_pre", "n_t_post",
        "sum_c_pre", "sum_c_post", "sum_t_pre", "sum_t_post",
        F.expr(
            "CASE WHEN n_c_pre > 0 AND n_c_post > 0"
            " AND n_t_pre > 0 AND n_t_post > 0"
            f" THEN {est} ELSE CAST(NULL AS DOUBLE) END"
        ).alias("did_estimate"),
    )


def did_estimate_sql(
    source_sql: str, arm_col: str, period_col: str, value_col: str
) -> str:
    cells = []
    for a in (0, 1):
        for p in (0, 1):
            tag = f"{'t' if a else 'c'}_{'post' if p else 'pre'}"
            cond = f"{arm_col} = {a} AND {period_col} = {p}"
            cells.append(
                f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END)"
                f" AS BIGINT) AS n_{tag}"
            )
            cells.append(
                f"CAST(SUM(CASE WHEN {cond} THEN {value_col}"
                f" ELSE 0 END) AS BIGINT) AS sum_{tag}"
            )
    est = (
        "(CAST(sum_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE)"
        " - CAST(sum_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE))"
        " - (CAST(sum_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE)"
        " - CAST(sum_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE))"
    )
    return f"""
WITH mom AS (
  SELECT {', '.join(cells)}
  FROM ({source_sql})
)
SELECT n_c_pre, n_c_post, n_t_pre, n_t_post,
       sum_c_pre, sum_c_post, sum_t_pre, sum_t_post,
       CASE WHEN n_c_pre > 0 AND n_c_post > 0
              AND n_t_pre > 0 AND n_t_post > 0
            THEN {est} ELSE CAST(NULL AS DOUBLE) END AS did_estimate
FROM mom
"""


def bh_fdr(
    df: DataFrame,
    test_col: str,
    p_ppm_col: str,
    alpha_ppm: int = 50_000,
) -> DataFrame:
    """Benjamini-Hochberg FDR gate over a relation of test p-values
    (in exact ppm) — the multiple-testing control an eval pipeline
    needs the moment it ships hundreds of per-segment metrics: reject
    the ``k*`` smallest p-values where ``k*`` is the largest rank
    with ``p_(k) ≤ α·k/m``, guaranteeing an expected false-discovery
    rate ≤ α under independence.

    Exact end to end: the step-up comparison is the cross-multiplied
    integer inequality ``p_ppm·m ≤ α_ppm·k`` (DECIMAL products — at
    10⁹ tests p·m alone overflows int64), the rank is the two-phase
    ``ranged_rank`` over (p_ppm, test id) — a strict total order, no
    single-partition window — and both the test census ``m`` and
    ``k*`` ride 1-row broadcast scalar merges (never a global
    ``count() over ()`` window, which would single-partition the
    whole relation).

    Scale shape: ranged_rank's bounded three-pass plan + two
    broadcast 1-row scalar joins.

    Returns (test_id, p_ppm, p_rank, passes_line, is_rejected)
    ordered by p_rank: ``passes_line`` marks ranks satisfying the
    step-up inequality, ``is_rejected`` the actual BH decision
    (everything at or below the LARGEST passing rank — rejected rows
    need not individually pass the line).
    """
    from gis_city_county_spark.operators.scale import ranged_rank

    base = df.select(
        F.col(test_col).alias("test_id"),
        F.col(p_ppm_col).cast("bigint").alias("p_ppm"),
    )
    ranked = ranged_rank(
        base, "p_ppm", "test_id", rank_col="p_rank", descending=False
    ).localCheckpoint(eager=False)
    m = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("__m")
    )
    flagged = ranked.crossJoin(F.broadcast(m)).withColumn(
        "passes_line",
        F.expr(
            "CAST(p_ppm AS DECIMAL(18,0)) * CAST(__m AS DECIMAL(18,0))"
            f" <= CAST({alpha_ppm} AS DECIMAL(18,0))"
            " * CAST(p_rank AS DECIMAL(18,0))"
        ),
    )
    kstar = flagged.agg(
        F.coalesce(
            F.max(F.when(F.col("passes_line"), F.col("p_rank"))),
            F.lit(0),
        ).cast("bigint").alias("__kstar")
    )
    return (
        flagged.crossJoin(F.broadcast(kstar))  # 1-row threshold merge
        .select(
            "test_id",
            "p_ppm",
            F.col("p_rank").cast("bigint").alias("p_rank"),
            "passes_line",
            (F.col("p_rank") <= F.col("__kstar")).alias("is_rejected"),
        )
        .orderBy("p_rank")
    )


def bh_fdr_sql(
    source_sql: str,
    test_col: str,
    p_ppm_col: str,
    alpha_ppm: int = 50_000,
) -> str:
    return f"""
WITH base AS (
  SELECT {test_col} AS test_id, CAST({p_ppm_col} AS BIGINT) AS p_ppm
  FROM ({source_sql})
),
ranked AS (
  SELECT test_id, p_ppm,
         CAST(ROW_NUMBER() OVER (ORDER BY p_ppm ASC, test_id ASC)
              AS BIGINT) AS p_rank,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM base
),
flagged AS (
  SELECT test_id, p_ppm, p_rank,
         CAST(p_ppm AS HUGEINT) * CAST(m AS HUGEINT)
           <= CAST({alpha_ppm} AS HUGEINT) * CAST(p_rank AS HUGEINT)
           AS passes_line
  FROM ranked
),
kstar AS (
  SELECT COALESCE(MAX(CASE WHEN passes_line THEN p_rank END),
                  CAST(0 AS BIGINT)) AS k
  FROM flagged
)
SELECT test_id, p_ppm, p_rank, passes_line,
       p_rank <= k AS is_rejected
FROM flagged CROSS JOIN kstar
ORDER BY p_rank
"""


def mantel_haenszel_or(
    df: DataFrame, stratum_col: str, treat_col: str, outcome_col: str
) -> DataFrame:
    """Mantel-Haenszel pooled odds ratio over stratified 2×2 tables —
    the confounder-adjusted effect readout (Cochran-Mantel-Haenszel):
    ``OR_MH = Σᵢ(aᵢdᵢ/nᵢ) / Σᵢ(bᵢcᵢ/nᵢ)`` with a=treated success,
    b=treated failure, c=control success, d=control failure per
    stratum — each stratum contributes in proportion to its
    information, unlike a naive pooled table (Simpson's paradox).

    Exactness: the statistic is DEFINED on milli-scaled per-stratum
    floor divisions — ``Σ (aᵢ·dᵢ·1000) div nᵢ`` — so both engines
    compute identical integers end to end (all terms non-negative, so
    Spark ``div`` and DuckDB ``//`` agree); the count products route
    through DECIMAL(18)×DECIMAL(18) / HUGEINT (aᵢdᵢ·1000 overflows
    int64 near 3e9-row strata, the cohens_kappa convention) and the
    pooled ratio is ONE closing IEEE divide, NULL when the
    denominator is zero.  ``treat_col`` / ``outcome_col`` must be
    0/1.

    Scale shape: one (stratum) aggregate then a 1-row fold — shuffle
    ∝ strata, never a raw-relation join.

    Returns one row: (n_strata, n_rows, num_milli, den_milli, or_mh).
    """
    t, o = F.col(treat_col), F.col(outcome_col)
    cells = df.groupBy(F.col(stratum_col).alias("__s")).agg(
        F.sum(F.when((t == 1) & (o == 1), 1).otherwise(0))
        .cast("bigint").alias("__a"),
        F.sum(F.when((t == 1) & (o == 0), 1).otherwise(0))
        .cast("bigint").alias("__b"),
        F.sum(F.when((t == 0) & (o == 1), 1).otherwise(0))
        .cast("bigint").alias("__c"),
        F.sum(F.when((t == 0) & (o == 0), 1).otherwise(0))
        .cast("bigint").alias("__d"),
    )
    terms = cells.select(
        (F.col("__a") + F.col("__b") + F.col("__c") + F.col("__d"))
        .alias("__n"),
        F.expr(
            "(CAST(__a AS DECIMAL(18,0)) * CAST(__d * 1000 AS"
            " DECIMAL(18,0))) div CAST((__a + __b + __c + __d)"
            " AS DECIMAL(18,0))"
        ).cast("decimal(38,0)").alias("__num"),
        F.expr(
            "(CAST(__b AS DECIMAL(18,0)) * CAST(__c * 1000 AS"
            " DECIMAL(18,0))) div CAST((__a + __b + __c + __d)"
            " AS DECIMAL(18,0))"
        ).cast("decimal(38,0)").alias("__den"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("__n").cast("bigint").alias("n_rows"),
        F.sum("__num").cast("bigint").alias("num_milli"),
        F.sum("__den").cast("bigint").alias("den_milli"),
    ).select(
        "n_strata",
        "n_rows",
        "num_milli",
        "den_milli",
        F.expr(
            "CASE WHEN den_milli > 0 THEN CAST(num_milli AS DOUBLE)"
            " / CAST(den_milli AS DOUBLE)"
            " ELSE CAST(NULL AS DOUBLE) END"
        ).alias("or_mh"),
    )


def mantel_haenszel_or_sql(
    source_sql: str, stratum_col: str, treat_col: str, outcome_col: str
) -> str:
    return f"""
WITH cells AS (
  SELECT {stratum_col} AS s,
         CAST(SUM(CASE WHEN {treat_col} = 1 AND {outcome_col} = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN {treat_col} = 1 AND {outcome_col} = 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS b,
         CAST(SUM(CASE WHEN {treat_col} = 0 AND {outcome_col} = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN {treat_col} = 0 AND {outcome_col} = 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM ({source_sql}) GROUP BY 1
),
terms AS (
  SELECT a + b + c + d AS n,
         (CAST(a AS HUGEINT) * CAST(d * 1000 AS HUGEINT))
           // CAST(a + b + c + d AS HUGEINT) AS num,
         (CAST(b AS HUGEINT) * CAST(c * 1000 AS HUGEINT))
           // CAST(a + b + c + d AS HUGEINT) AS den
  FROM cells
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
         CAST(SUM(n) AS BIGINT) AS n_rows,
         CAST(SUM(num) AS BIGINT) AS num_milli,
         CAST(SUM(den) AS BIGINT) AS den_milli
  FROM terms
)
SELECT n_strata, n_rows, num_milli, den_milli,
       CASE WHEN den_milli > 0 THEN CAST(num_milli AS DOUBLE)
            / CAST(den_milli AS DOUBLE)
            ELSE CAST(NULL AS DOUBLE) END AS or_mh
FROM mom
"""


def cuped_lift(
    df: DataFrame, treat_col: str, y_col: str, x_col: str
) -> DataFrame:
    """CUPED variance-reduced treatment lift — the experiment readout
    that nets out pre-experiment covariate noise: with ``θ =
    cov(X,Y)/var(X)`` fitted pooled, the adjusted outcome is ``Y −
    θ·(X − X̄)`` and the reported lift is the adjusted-mean gap,
    identical in expectation to the raw lift but with variance shrunk
    by the squared X–Y correlation (Deng et al., WSDM'13 — public
    method).

    Exactness: all five moment sums (ΣY, ΣX per arm; ΣXY, ΣX² pooled)
    fold exactly — pass integer units (cents, counts); the per-row
    products route through DECIMAL(18)×DECIMAL(18) / HUGEINT (x·y
    overflows int64 at cent scales) — and θ's numerator
    ``n·ΣXY − ΣX·ΣY`` / denominator ``n·ΣX² − ΣX·ΣX`` are exact
    DECIMAL(38,0)/HUGEINT integers (documented bound: |n·ΣXY| <
    10³⁸, comfortably true for cent-valued columns below ~10¹⁵
    rows).  The tail — θ, the two means, both lifts — is a
    FIXED-ORDER IEEE expression identical on both engines; θ is 0
    when var(X) is 0 (lift degrades to the raw gap), the lifts NULL
    when either arm is empty.

    Scale shape: ONE map-combinable scan-side aggregate — no joins,
    no windows, nothing driver-side.

    Returns one row: (n_c, n_t, theta, mean_y_c, mean_y_t, raw_lift,
    cuped_lift).
    """
    t = F.col(treat_col)
    y18 = F.col(y_col).cast("decimal(18,0)")
    x18 = F.col(x_col).cast("decimal(18,0)")
    mom = df.agg(
        F.sum(F.when(t == 0, 1).otherwise(0)).cast("bigint").alias("n_c"),
        F.sum(F.when(t == 1, 1).otherwise(0)).cast("bigint").alias("n_t"),
        F.sum(F.when(t == 0, F.col(y_col)).otherwise(0))
        .cast("decimal(38,0)").alias("__syc"),
        F.sum(F.when(t == 1, F.col(y_col)).otherwise(0))
        .cast("decimal(38,0)").alias("__syt"),
        F.sum(F.when(t == 0, F.col(x_col)).otherwise(0))
        .cast("decimal(38,0)").alias("__sxc"),
        F.sum(F.when(t == 1, F.col(x_col)).otherwise(0))
        .cast("decimal(38,0)").alias("__sxt"),
        F.sum(x18 * y18).cast("decimal(38,0)").alias("__sxy"),
        F.sum(x18 * x18).cast("decimal(38,0)").alias("__sxx"),
    )
    n = "CAST(n_c + n_t AS DECIMAL(38,0))"
    cov_num = f"({n} * __sxy - (__sxc + __sxt) * (__syc + __syt))"
    var_num = f"({n} * __sxx - (__sxc + __sxt) * (__sxc + __sxt))"
    theta = (
        f"CASE WHEN {var_num} > 0 THEN CAST({cov_num} AS DOUBLE)"
        f" / CAST({var_num} AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"
    )
    myc = "CAST(__syc AS DOUBLE) / CAST(n_c AS DOUBLE)"
    myt = "CAST(__syt AS DOUBLE) / CAST(n_t AS DOUBLE)"
    mxc = "CAST(__sxc AS DOUBLE) / CAST(n_c AS DOUBLE)"
    mxt = "CAST(__sxt AS DOUBLE) / CAST(n_t AS DOUBLE)"
    guard = "n_c > 0 AND n_t > 0"
    raw = f"({myt} - {myc})"
    adj = f"({raw} - theta * ({mxt} - {mxc}))"
    return mom.withColumn("theta", F.expr(theta)).select(
        "n_c",
        "n_t",
        "theta",
        F.expr(
            f"CASE WHEN n_c > 0 THEN {myc}"
            " ELSE CAST(NULL AS DOUBLE) END"
        ).alias("mean_y_c"),
        F.expr(
            f"CASE WHEN n_t > 0 THEN {myt}"
            " ELSE CAST(NULL AS DOUBLE) END"
        ).alias("mean_y_t"),
        F.expr(
            f"CASE WHEN {guard} THEN {raw}"
            " ELSE CAST(NULL AS DOUBLE) END"
        ).alias("raw_lift"),
        F.expr(
            f"CASE WHEN {guard} THEN {adj}"
            " ELSE CAST(NULL AS DOUBLE) END"
        ).alias("cuped_lift"),
    )


def cuped_lift_sql(
    source_sql: str, treat_col: str, y_col: str, x_col: str
) -> str:
    n = "CAST(n_c + n_t AS HUGEINT)"
    cov_num = f"({n} * sxy - (sxc + sxt) * (syc + syt))"
    var_num = f"({n} * sxx - (sxc + sxt) * (sxc + sxt))"
    theta = (
        f"CASE WHEN {var_num} > 0 THEN CAST({cov_num} AS DOUBLE)"
        f" / CAST({var_num} AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"
    )
    myc = "CAST(syc AS DOUBLE) / CAST(n_c AS DOUBLE)"
    myt = "CAST(syt AS DOUBLE) / CAST(n_t AS DOUBLE)"
    mxc = "CAST(sxc AS DOUBLE) / CAST(n_c AS DOUBLE)"
    mxt = "CAST(sxt AS DOUBLE) / CAST(n_t AS DOUBLE)"
    guard = "n_c > 0 AND n_t > 0"
    raw = f"({myt} - {myc})"
    adj = f"({raw} - theta * ({mxt} - {mxc}))"
    return f"""
WITH mom AS (
  SELECT CAST(SUM(CASE WHEN {treat_col} = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_c,
         CAST(SUM(CASE WHEN {treat_col} = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_t,
         CAST(SUM(CASE WHEN {treat_col} = 0 THEN {y_col} ELSE 0 END)
              AS HUGEINT) AS syc,
         CAST(SUM(CASE WHEN {treat_col} = 1 THEN {y_col} ELSE 0 END)
              AS HUGEINT) AS syt,
         CAST(SUM(CASE WHEN {treat_col} = 0 THEN {x_col} ELSE 0 END)
              AS HUGEINT) AS sxc,
         CAST(SUM(CASE WHEN {treat_col} = 1 THEN {x_col} ELSE 0 END)
              AS HUGEINT) AS sxt,
         CAST(SUM(CAST({x_col} AS HUGEINT) * CAST({y_col} AS HUGEINT))
              AS HUGEINT) AS sxy,
         CAST(SUM(CAST({x_col} AS HUGEINT) * CAST({x_col} AS HUGEINT))
              AS HUGEINT) AS sxx
  FROM ({source_sql})
),
th AS (
  SELECT *, {theta} AS theta FROM mom
)
SELECT n_c, n_t, theta,
       CASE WHEN n_c > 0 THEN {myc} ELSE CAST(NULL AS DOUBLE) END
         AS mean_y_c,
       CASE WHEN n_t > 0 THEN {myt} ELSE CAST(NULL AS DOUBLE) END
         AS mean_y_t,
       CASE WHEN {guard} THEN {raw} ELSE CAST(NULL AS DOUBLE) END
         AS raw_lift,
       CASE WHEN {guard} THEN {adj} ELSE CAST(NULL AS DOUBLE) END
         AS cuped_lift
FROM th
"""


def icc_design_effect(
    df: DataFrame, cluster_col: str, value_col: str
) -> DataFrame:
    """Intra-cluster correlation (one-way ANOVA, unbalanced) and the
    Kish design effect — the clustered-randomization sanity check: an
    experiment randomized by cluster (user, session, geo) has its
    effective sample size shrunk by ``deff = 1 + (m̄−1)·ICC``, and
    ignoring it is the classic false-positive factory.

    ICC here is ANOVA-estimated: ``(MSB − MSW) / (MSB + (n₀−1)·MSW)``
    with the unbalanced-design cluster size
    ``n₀ = (N − Σn_g²/N)/(G−1)``.

    Exactness AND scale: the statistic is DEFINED on milli-quantized
    cluster means ``b_g = sign·(|S_g|·1000 div n_g)`` (sign-split so
    Spark ``div`` and DuckDB ``//`` agree on negative sums) — small
    integers bounded by 1000·max|y|, NOT sums of squares — so
    ``SSB = Σ n_g·(b_g − b̄)²`` and the total
    ``SST = 10⁶·ΣY² − 2000·b̄·ΣY + N·b̄²`` stay exact in
    DECIMAL(38,0)/HUGEINT at any corpus size (documented bounds:
    per-cluster |ΣY|·1000 < 9·10¹⁸ for the BIGINT milli-mean, and
    10⁶·ΣY² < 10³⁸ overall); ``SSW = SST − SSB``.  The tail — MSB,
    MSW, n₀, ICC, deff — is a FIXED-ORDER IEEE expression identical
    on both engines; ICC/deff are NULL when G ≤ 1, N = G, or the ICC
    denominator is 0 (constant data).  Units are all in milli² — the
    IEEE tail divides them out, and ICC is unit-free.

    Scale shape: one (cluster) aggregate, a 1-row global fold, and
    the canonical 1-row broadcast scalar merge of b̄ back onto the
    ≤G-row cluster relation (localCheckpoint'd to break the
    shared-lineage self-join) — shuffle ∝ clusters, never a
    raw-relation join.

    Returns one row: (n_clusters, n_rows, ssb_microsq, ssw_microsq,
    icc, deff).
    """
    y18 = F.col(value_col).cast("decimal(18,0)")
    cl = (
        df.groupBy(F.col(cluster_col).alias("__g"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__ng"),
            F.sum(F.col(value_col)).cast("decimal(19,0)").alias("__sg"),
            F.sum(y18 * y18).cast("decimal(38,0)").alias("__qg"),
        )
        .withColumn(
            # sign-split milli mean: trunc-toward-zero on both engines
            "__bg",
            F.expr(
                "CASE WHEN __sg < 0 THEN"
                " -CAST((CAST(-__sg AS DECIMAL(19,0))"
                "   * CAST(1000 AS DECIMAL(4,0)))"
                "  div CAST(__ng AS DECIMAL(19,0)) AS BIGINT)"
                " ELSE CAST((CAST(__sg AS DECIMAL(19,0))"
                "   * CAST(1000 AS DECIMAL(4,0)))"
                "  div CAST(__ng AS DECIMAL(19,0)) AS BIGINT) END"
            ),
        )
        .localCheckpoint(eager=False)
    )
    tot = cl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("__ng").cast("bigint").alias("n_rows"),
        F.sum("__sg").cast("decimal(38,0)").alias("__s"),
        F.sum("__qg").cast("decimal(38,0)").alias("__q"),
        F.sum(
            F.expr(
                "CAST(__ng AS DECIMAL(19,0))"
                " * CAST(__ng AS DECIMAL(19,0))"
            )
        ).cast("decimal(38,0)").alias("__ng2"),
    ).withColumn(
        "__bbar",
        F.expr(
            "CASE WHEN __s < 0 THEN"
            " -CAST((-__s * CAST(1000 AS DECIMAL(4,0)))"
            "  div CAST(n_rows AS DECIMAL(19,0)) AS BIGINT)"
            " ELSE CAST((__s * CAST(1000 AS DECIMAL(4,0)))"
            "  div CAST(n_rows AS DECIMAL(19,0)) AS BIGINT) END"
        ),
    )
    ssb = (
        cl.crossJoin(F.broadcast(tot.select("__bbar")))
        .agg(
            F.sum(
                F.expr(
                    "CAST(__ng AS DECIMAL(19,0))"
                    " * (CAST(__bg - __bbar AS DECIMAL(19,0))"
                    "    * CAST(__bg - __bbar AS DECIMAL(19,0)))"
                )
            ).cast("decimal(38,0)").alias("ssb_microsq")
        )
    )
    mom = tot.crossJoin(F.broadcast(ssb)).select(
        "n_clusters",
        "n_rows",
        "ssb_microsq",
        F.expr(
            "CAST(__q * CAST(1000000 AS DECIMAL(7,0))"
            " - CAST(2000 AS DECIMAL(4,0)) * CAST(__bbar AS"
            " DECIMAL(19,0)) * __s"
            " + CAST(n_rows AS DECIMAL(19,0))"
            "   * (CAST(__bbar AS DECIMAL(19,0))"
            "      * CAST(__bbar AS DECIMAL(19,0)))"
            " - ssb_microsq AS DECIMAL(38,0))"
        ).alias("ssw_microsq"),
        "__ng2",
    )
    msb = (
        "CAST(ssb_microsq AS DOUBLE)"
        " / (1000000.0 * CAST(n_clusters - 1 AS DOUBLE))"
    )
    msw = (
        "CAST(ssw_microsq AS DOUBLE)"
        " / (1000000.0 * CAST(n_rows - n_clusters AS DOUBLE))"
    )
    n0 = (
        "(CAST(n_rows AS DOUBLE)"
        " - CAST(__ng2 AS DOUBLE) / CAST(n_rows AS DOUBLE))"
        " / CAST(n_clusters - 1 AS DOUBLE)"
    )
    icc = (
        f"CASE WHEN n_clusters > 1 AND n_rows > n_clusters"
        f" AND ({msb} + ({n0} - 1.0) * {msw}) > 0.0"
        f" THEN ({msb} - {msw}) / ({msb} + ({n0} - 1.0) * {msw})"
        f" ELSE CAST(NULL AS DOUBLE) END"
    )
    return mom.withColumn("icc", F.expr(icc)).select(
        "n_clusters",
        "n_rows",
        # digit strings: DECIMAL(38,0)/HUGEINT exceed int64, and the
        # two engines' pandas conversions disagree on the numeric
        # normal form (Decimal vs float64) — VARCHAR is exact on both
        F.col("ssb_microsq").cast("decimal(38,0)").cast("string")
        .alias("ssb_microsq"),
        F.col("ssw_microsq").cast("decimal(38,0)").cast("string")
        .alias("ssw_microsq"),
        "icc",
        F.expr(
            "CASE WHEN icc IS NOT NULL THEN"
            " 1.0 + (CAST(n_rows AS DOUBLE)"
            " / CAST(n_clusters AS DOUBLE) - 1.0) * icc"
            " ELSE CAST(NULL AS DOUBLE) END"
        ).alias("deff"),
    )


def icc_design_effect_sql(
    source_sql: str, cluster_col: str, value_col: str
) -> str:
    msb = (
        "CAST(ssb_microsq AS DOUBLE)"
        " / (1000000.0 * CAST(n_clusters - 1 AS DOUBLE))"
    )
    msw = (
        "CAST(ssw_microsq AS DOUBLE)"
        " / (1000000.0 * CAST(n_rows - n_clusters AS DOUBLE))"
    )
    n0 = (
        "(CAST(n_rows AS DOUBLE)"
        " - CAST(ng2 AS DOUBLE) / CAST(n_rows AS DOUBLE))"
        " / CAST(n_clusters - 1 AS DOUBLE)"
    )
    icc = (
        f"CASE WHEN n_clusters > 1 AND n_rows > n_clusters"
        f" AND ({msb} + ({n0} - 1.0) * {msw}) > 0.0"
        f" THEN ({msb} - {msw}) / ({msb} + ({n0} - 1.0) * {msw})"
        f" ELSE CAST(NULL AS DOUBLE) END"
    )
    return f"""
WITH cl AS (
  SELECT {cluster_col} AS g,
         CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM({value_col}) AS HUGEINT) AS sg,
         CAST(SUM(CAST({value_col} AS HUGEINT)
                  * CAST({value_col} AS HUGEINT)) AS HUGEINT) AS qg
  FROM ({source_sql}) GROUP BY 1
),
clb AS (
  SELECT *,
         CASE WHEN sg < 0
              THEN -CAST(((-sg) * 1000) // CAST(ng AS HUGEINT)
                         AS BIGINT)
              ELSE CAST((sg * 1000) // CAST(ng AS HUGEINT) AS BIGINT)
         END AS bg
  FROM cl
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
         CAST(SUM(ng) AS BIGINT) AS n_rows,
         CAST(SUM(sg) AS HUGEINT) AS s,
         CAST(SUM(qg) AS HUGEINT) AS q,
         CAST(SUM(CAST(ng AS HUGEINT) * CAST(ng AS HUGEINT))
              AS HUGEINT) AS ng2
  FROM clb
),
totb AS (
  SELECT *,
         CASE WHEN s < 0
              THEN -CAST(((-s) * 1000) // CAST(n_rows AS HUGEINT)
                         AS BIGINT)
              ELSE CAST((s * 1000) // CAST(n_rows AS HUGEINT)
                        AS BIGINT)
         END AS bbar
  FROM tot
),
ssb AS (
  SELECT CAST(SUM(CAST(ng AS HUGEINT)
                  * (CAST(bg - bbar AS HUGEINT)
                     * CAST(bg - bbar AS HUGEINT))) AS HUGEINT)
           AS ssb_microsq
  FROM clb CROSS JOIN totb
),
mom AS (
  SELECT n_clusters, n_rows, ssb_microsq,
         q * 1000000 - 2000 * CAST(bbar AS HUGEINT) * s
           + CAST(n_rows AS HUGEINT)
             * (CAST(bbar AS HUGEINT) * CAST(bbar AS HUGEINT))
           - ssb_microsq AS ssw_microsq,
         ng2
  FROM totb CROSS JOIN ssb
),
wi AS (
  SELECT *, {icc} AS icc FROM mom
)
SELECT n_clusters, n_rows,
       CAST(ssb_microsq AS VARCHAR) AS ssb_microsq,
       CAST(ssw_microsq AS VARCHAR) AS ssw_microsq,
       icc,
       CASE WHEN icc IS NOT NULL THEN
            1.0 + (CAST(n_rows AS DOUBLE)
            / CAST(n_clusters AS DOUBLE) - 1.0) * icc
            ELSE CAST(NULL AS DOUBLE) END AS deff
FROM wi
"""


def conformal_coverage(
    df: DataFrame,
    split_col: str,
    score_col: str,
    id_col: str,
    alpha_ppm: int = 100_000,
) -> DataFrame:
    """Split-conformal prediction audit — calibrate the quantile
    threshold on the calibration split and measure empirical coverage
    on the test split: ``q̂`` is the ``k``-th smallest calibration
    nonconformity score with ``k = ⌈(n_c+1)(1−α)⌉`` (the
    finite-sample-valid split-conformal rank, Vovk/Papadopoulos —
    public method), and coverage is the exact fraction of test scores
    ``≤ q̂``.  Marginal coverage ≥ 1−α is the guarantee being
    audited; a test reading far off it means the splits aren't
    exchangeable (drift, leakage, or a broken scorer).

    Exactness: ``k`` is the exact integer ceiling
    ``((n_c+1)·(10⁶−α_ppm) + 10⁶−1) div 10⁶`` through
    DECIMAL/HUGEINT (the count product overflows int64 near 9·10¹²
    calibration rows); the rank is the two-phase ``ranged_rank`` over
    (score, id) — a strict total order, no single-partition sort;
    coverage is an exact ppm floor division.  When ``k > n_c``
    (calibration too small for the requested α) q̂ is NULL and the
    audit reports covered = n_test (the conformal convention: the
    prediction set is everything).

    Scale shape: ranged_rank's bounded three-pass plan over the
    calibration split + two 1-row broadcast scalar merges (the n_c
    census and the q̂ threshold onto the test aggregate).

    Returns one row: (n_calib, n_test, k_rank, qhat, n_covered,
    coverage_ppm).
    """
    from gis_city_county_spark.operators.scale import ranged_rank

    base = df.select(
        F.col(split_col).cast("int").alias("__split"),
        F.col(score_col).cast("bigint").alias("__score"),
        F.col(id_col).alias("__id"),
    ).localCheckpoint(eager=False)
    calib = base.filter(F.col("__split") == 0).select("__score", "__id")
    ranked = ranged_rank(
        calib, "__score", "__id", rank_col="__rk", descending=False
    )
    kk = calib.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_calib")
    ).select(
        "n_calib",
        F.expr(
            "CAST((CAST(n_calib + 1 AS DECIMAL(18,0))"
            f" * CAST({1_000_000 - alpha_ppm} AS DECIMAL(7,0))"
            " + CAST(999999 AS DECIMAL(6,0)))"
            " div CAST(1000000 AS DECIMAL(7,0)) AS BIGINT)"
        ).alias("k_rank"),
    )
    qhat = (
        ranked.join(F.broadcast(kk), F.col("__rk") == F.col("k_rank"))
        .select(F.col("__score").alias("qhat"))
    )
    test = base.filter(F.col("__split") == 1)
    cov = (
        test.crossJoin(F.broadcast(kk))  # 1-row k/n_c scalar
        .join(F.broadcast(qhat), F.lit(True), "left")  # 1-row or empty
        .agg(
            F.max("n_calib").alias("n_calib"),
            F.max("k_rank").alias("k_rank"),
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.max("qhat").alias("qhat"),
            F.sum(
                F.when(
                    F.col("qhat").isNull()
                    | (F.col("__score") <= F.col("qhat")),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("n_covered"),
        )
    )
    return cov.select(
        "n_calib",
        "n_test",
        "k_rank",
        "qhat",
        "n_covered",
        F.expr(
            "CASE WHEN n_test > 0 THEN"
            " (n_covered * CAST(1000000 AS BIGINT)) div n_test"
            " ELSE CAST(NULL AS BIGINT) END"
        ).alias("coverage_ppm"),
    )


def conformal_coverage_sql(
    source_sql: str,
    split_col: str,
    score_col: str,
    id_col: str,
    alpha_ppm: int = 100_000,
) -> str:
    return f"""
WITH base AS (
  SELECT CAST({split_col} AS INTEGER) AS split,
         CAST({score_col} AS BIGINT) AS score,
         {id_col} AS id
  FROM ({source_sql})
),
ranked AS (
  SELECT score,
         CAST(ROW_NUMBER() OVER (ORDER BY score ASC, id ASC)
              AS BIGINT) AS rk
  FROM base WHERE split = 0
),
kk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_calib,
         CAST((CAST(COUNT(*) + 1 AS HUGEINT)
               * {1_000_000 - alpha_ppm} + 999999)
              // 1000000 AS BIGINT) AS k_rank
  FROM base WHERE split = 0
),
qhat AS (
  SELECT score AS qhat FROM ranked, kk WHERE rk = k_rank
),
cov AS (
  SELECT MAX(kk.n_calib) AS n_calib,
         MAX(kk.k_rank) AS k_rank,
         CAST(COUNT(*) AS BIGINT) AS n_test,
         MAX(qhat.qhat) AS qhat,
         CAST(SUM(CASE WHEN qhat.qhat IS NULL OR score <= qhat.qhat
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
  FROM (SELECT score FROM base WHERE split = 1) t
  CROSS JOIN kk
  LEFT JOIN qhat ON TRUE
)
SELECT n_calib, n_test, k_rank, qhat, n_covered,
       CASE WHEN n_test > 0 THEN
            (n_covered * CAST(1000000 AS BIGINT)) // n_test
            ELSE CAST(NULL AS BIGINT) END AS coverage_ppm
FROM cov
"""


def quantile_treatment_effect(
    df: DataFrame,
    treat_col: str,
    value_col: str,
    id_col: str,
    q_ppm: tuple[int, ...] = (250_000, 500_000, 750_000),
) -> DataFrame:
    """Quantile treatment effects — the experiment readout beyond the
    mean: per-arm lower (type-1) quantiles at the requested levels
    and their differences.  A lift concentrated in the upper
    quantiles with a flat median is a different product story than a
    uniform shift, and the mean alone cannot tell them apart.

    Exactness: each arm's ``q``-quantile is the value at rank
    ``k = ⌈q·n⌉`` under the strict (value, id) total order — ``k`` is
    the exact integer ceiling ``(q_ppm·n + 10⁶−1) div 10⁶`` through
    DECIMAL/HUGEINT — so both engines select the SAME row; the QTE
    column is an exact BIGINT difference, no IEEE anywhere.

    Scale shape (r12): the rank-``k`` VALUE does not depend on the
    tiebreak — it is the smallest ``v`` whose cumulative count reaches
    ``k`` — so instead of fully ranking each arm's rows (two
    three-pass ``ranged_rank`` plans over the row relation), aggregate
    once to the DISTINCT-VALUE histogram with per-arm counts, run ONE
    two-phase bucketed cumsum over that bounded frame, and select each
    level's value with a ≤2·|q|-row broadcast interval join
    (``cum − n < k ≤ cum`` — unique by monotonicity).  Per-bucket
    offsets/totals are the usual driver-bounded collect (≤ n_ranges
    rows).  Empty arms yield NULL quantiles/QTE at every level rather
    than dropping rows.

    Returns |q| rows: (q_ppm, n_c, n_t, v_c, v_t, qte) ordered by
    q_ppm.
    """
    from gis_city_county_spark.operators.scale import _range_buckets

    spark = df.sparkSession
    grouped = (
        df.select(
            F.col(treat_col).cast("int").alias("__t"),
            F.col(value_col).cast("bigint").alias("__v"),
        )
        .groupBy("__v")
        .agg(
            F.sum(F.when(F.col("__t") == 0, 1).otherwise(0))
            .cast("bigint").alias("__n0"),
            F.sum(F.when(F.col("__t") == 1, 1).otherwise(0))
            .cast("bigint").alias("__n1"),
        )
        .localCheckpoint(eager=False)
    )
    n_ranges = int(spark.conf.get("spark.sql.shuffle.partitions"))
    b = _range_buckets(grouped, "__v", n_ranges, descending=False)
    w = (
        Window.partitionBy("__bkt")
        .orderBy(F.col("__v").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = b.withColumn("__c0", F.sum("__n0").over(w)).withColumn(
        "__c1", F.sum("__n1").over(w)
    )
    rows = sorted(
        (r["__bkt"], r["s0"], r["s1"])
        for r in b.groupBy("__bkt")
        .agg(F.sum("__n0").alias("s0"), F.sum("__n1").alias("s1"))
        .collect()
    )
    off, n_c, n_t = {}, 0, 0
    for bkt, s0, s1 in rows:
        off[bkt] = (n_c, n_t)
        n_c += int(s0 or 0)
        n_t += int(s1 or 0)
    off_df = spark.createDataFrame(
        [(int(k), v0, v1) for k, (v0, v1) in off.items()] or [(0, 0, 0)],
        "__bkt int, __o0 bigint, __o1 bigint",
    )
    cum = local.join(F.broadcast(off_df), "__bkt").select(
        "__v",
        "__n0",
        "__n1",
        (F.col("__c0") + F.col("__o0")).alias("__cum0"),
        (F.col("__c1") + F.col("__o1")).alias("__cum1"),
    )
    # exact integer ceil(q·n/1e6) in unbounded Python int — the same
    # driver-bounded arithmetic class as the bucket offsets above
    ks_rows = []
    for q in q_ppm:
        ks_rows.append((int(q), 0, (int(q) * n_c + 999_999) // 1_000_000))
        ks_rows.append((int(q), 1, (int(q) * n_t + 999_999) // 1_000_000))
    ks = spark.createDataFrame(ks_rows, "q_ppm bigint, __arm int, __k bigint")
    sel = (
        cum.join(
            F.broadcast(ks),
            (
                (F.col("__arm") == 0)
                & (F.col("__k") > F.col("__cum0") - F.col("__n0"))
                & (F.col("__k") <= F.col("__cum0"))
            )
            | (
                (F.col("__arm") == 1)
                & (F.col("__k") > F.col("__cum1") - F.col("__n1"))
                & (F.col("__k") <= F.col("__cum1"))
            ),
        )
        .groupBy("q_ppm")
        .agg(
            F.max(F.when(F.col("__arm") == 0, F.col("__v"))).alias("v_c"),
            F.max(F.when(F.col("__arm") == 1, F.col("__v"))).alias("v_t"),
        )
    )
    qs = spark.createDataFrame([(int(q),) for q in q_ppm], "q_ppm bigint")
    return (
        qs.join(F.broadcast(sel), "q_ppm", "left")
        .select(
            "q_ppm",
            F.lit(n_c).cast("bigint").alias("n_c"),
            F.lit(n_t).cast("bigint").alias("n_t"),
            "v_c",
            "v_t",
            (F.col("v_t") - F.col("v_c")).cast("bigint").alias("qte"),
        )
        .orderBy("q_ppm")
    )


def quantile_treatment_effect_sql(
    source_sql: str,
    treat_col: str,
    value_col: str,
    id_col: str,
    q_ppm: tuple[int, ...] = (250_000, 500_000, 750_000),
) -> str:
    qvals = ", ".join(f"({int(q)})" for q in q_ppm)
    return f"""
WITH base AS (
  SELECT CAST({treat_col} AS INTEGER) AS t,
         CAST({value_col} AS BIGINT) AS v,
         {id_col} AS id
  FROM ({source_sql})
),
qs(q_ppm) AS (VALUES {qvals}),
ranked AS (
  SELECT t, v,
         CAST(ROW_NUMBER() OVER (PARTITION BY t ORDER BY v ASC, id ASC)
              AS BIGINT) AS rk
  FROM base
),
ns AS (
  SELECT CAST(SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         CAST(SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t
  FROM base
),
ks AS (
  SELECT CAST(q_ppm AS BIGINT) AS q_ppm, n_c, n_t,
         CAST((CAST(q_ppm AS HUGEINT) * CAST(n_c AS HUGEINT) + 999999)
              // 1000000 AS BIGINT) AS k_c,
         CAST((CAST(q_ppm AS HUGEINT) * CAST(n_t AS HUGEINT) + 999999)
              // 1000000 AS BIGINT) AS k_t
  FROM qs CROSS JOIN ns
)
SELECT ks.q_ppm, ks.n_c, ks.n_t,
       rc.v AS v_c, rt.v AS v_t,
       CAST(rt.v - rc.v AS BIGINT) AS qte
FROM ks
LEFT JOIN ranked rc ON rc.t = 0 AND rc.rk = ks.k_c
LEFT JOIN ranked rt ON rt.t = 1 AND rt.rk = ks.k_t
ORDER BY ks.q_ppm
"""
