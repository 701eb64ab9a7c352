"""Table profiling: the pre-ingest data census.

One wide aggregation computes every column's stats in a single pass
(count, nulls, distincts, string-ordered extremes), then an inline
``stack`` unpivots to long format — no per-column scans, no shuffle
beyond the global aggregate's partial-merge. At 100 TB this is one
scan of the table; the distinct counts are the only memory-heavy
part (exact here for oracle-ability; swap ``countDistinct`` for
``approx_count_distinct`` when cardinalities are huge).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Long-format profile: one row per column with
    ``(column, n_rows, n_nulls, n_distinct, min_value, max_value)``.
    Extremes are compared on the string form so heterogeneous column
    types share one schema (and one engine-independent ordering)."""
    cols = list(cols) if cols is not None else df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(s).alias(f"__min_{c}"),
            F.max(s).alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def profile_sql(table: str, cols: Sequence[str]) -> str:
    """DuckDB oracle twin of :func:`profile` (same long format)."""
    parts = [
        f"""
SELECT '{c}' AS column,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       MIN(CAST({c} AS VARCHAR)) AS min_value,
       MAX(CAST({c} AS VARCHAR)) AS max_value
FROM {table}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


def histogram(
    df: DataFrame, value_col: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """Fixed-range equi-width histogram: ``(bin, lo_edge, hi_edge,
    n)``. Out-of-range values clamp into the edge bins (so every row
    is counted; a separate range scan isn't needed first). One
    map-side-combinable aggregation on a projected bin id — the
    single-pass profiling shape that works at any scale.

    Bin edges are ``lo + bin·(hi-lo)/nbins`` computed in double,
    identically on any engine; the bin id is ``floor((x-lo)/w)``
    clamped to ``[0, nbins)``.
    """
    w = (hi - lo) / nbins
    bin_ = F.least(
        F.lit(nbins - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(w)).cast("int"),
        ),
    ).cast("long")
    return (
        df.select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin").cast("double") * F.lit(w)).alias("lo_edge"),
            (F.lit(lo) + (F.col("bin") + 1).cast("double") * F.lit(w)).alias("hi_edge"),
            "n",
        )
        .orderBy("bin")
    )


def histogram_sql(
    table_sql: str, value_col: str, lo: float, hi: float, nbins: int
) -> str:
    w = (hi - lo) / nbins
    bin_ = (
        f"CAST(least({nbins - 1}, greatest(0, "
        f"CAST(floor((CAST({value_col} AS DOUBLE) - {lo!r}) / {w!r}) AS INTEGER)"
        f")) AS BIGINT)"
    )
    return f"""
SELECT bin,
       {lo!r} + CAST(bin AS DOUBLE) * {w!r} AS lo_edge,
       {lo!r} + CAST(bin + 1 AS DOUBLE) * {w!r} AS hi_edge,
       COUNT(*) AS n
FROM (SELECT {bin_} AS bin FROM ({table_sql}))
GROUP BY bin ORDER BY bin
"""


def skew_report(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """Join-key skew diagnosis: the k heaviest keys with their share of
    the table in parts-per-million — run this before shuffling 100 TB
    on a key to decide whether a join needs salting / AQE skew
    handling.

    Shape: one count aggregation keyed on ``key_col`` (map-side
    combinable), then a global top-k. Spark executes the
    ``orderBy().limit(k)`` as TakeOrderedAndProject — per-partition
    heaps merged on the driver, never a full sort — so the cost is the
    one aggregation shuffle regardless of key cardinality. The total
    row count rides along via a single-row broadcast cross join.

    Output: ``(rank, key, cnt, n_rows, n_keys, share_ppm)`` with
    ``share_ppm = cnt·10⁶ ÷ n_rows`` in exact integer arithmetic and a
    deterministic (cnt desc, key asc) order.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("n_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("key").asc()).limit(top_k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    return (
        top.crossJoin(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            F.col("key").cast("string").alias("key"),
            "cnt",
            "n_rows",
            "n_keys",
            # `div` = exact integral division (twin of HUGEINT `//`);
            # decimal `/` would round at scale 6 before truncation.
            F.expr("(CAST(cnt AS DECIMAL(38,0)) * 1000000) div n_rows")
            .cast("long")
            .alias("share_ppm"),
        )
    )


def skew_report_sql(table_sql: str, key_col: str, top_k: int = 10) -> str:
    """DuckDB oracle twin of :func:`skew_report`."""
    return f"""
WITH counts AS (
  SELECT {key_col} AS key, COUNT(*) AS cnt
  FROM ({table_sql}) GROUP BY 1
),
totals AS (SELECT SUM(cnt) AS n_rows, COUNT(*) AS n_keys FROM counts),
top AS (
  SELECT key, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, key ASC) AS rank
  FROM counts ORDER BY cnt DESC, key ASC LIMIT {top_k}
)
SELECT CAST(rank AS INTEGER) AS rank, CAST(key AS VARCHAR) AS key, cnt,
       CAST(n_rows AS BIGINT) AS n_rows, CAST(n_keys AS BIGINT) AS n_keys,
       CAST(CAST(cnt AS HUGEINT) * 1000000 // n_rows AS BIGINT) AS share_ppm
FROM top CROSS JOIN totals
"""


def zscore(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Per-group z-score normalization from exact moments.

    Mean and E[x²] come from DECIMAL(38,10) sums (order-independent ⇒
    engine-exact); variance is the population ``E[x²] − mean²`` and
    degenerate groups (zero variance) emit z = 0. Two passes by
    necessity: a |groups|-row moment aggregate (broadcast) and a
    scan-side projection — the feature-normalization shape that holds
    at any scale.
    """
    x = F.col(value_col).cast("double")
    stats = df.groupBy(group_col).agg(
        (F.sum(x.cast("decimal(38,10)")).cast("double") / F.count(x)).alias("__mean"),
        (F.sum((x * x).cast("decimal(38,10)")).cast("double") / F.count(x)).alias(
            "__e2"
        ),
    )
    var = F.col("__e2") - F.col("__mean") * F.col("__mean")
    z = F.when(var > 0, (x - F.col("__mean")) / F.sqrt(var)).otherwise(F.lit(0.0))
    return (
        df.join(F.broadcast(stats), group_col)
        .withColumn(out_col, z)
        .drop("__mean", "__e2")
    )


def zscore_sql(
    source_sql: str, group_col: str, value_col: str, cols: str, out_col: str = "zscore"
) -> str:
    x = f"CAST({value_col} AS DOUBLE)"
    dsum = "CAST(CAST(SUM(CAST(({e}) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"
    mean = dsum.format(e=x) + f" / COUNT({value_col})"
    e2 = dsum.format(e=f"{x} * {x}") + f" / COUNT({value_col})"
    return f"""
WITH src AS ({source_sql}),
stats AS (
  SELECT {group_col}, {mean} AS __mean, {e2} AS __e2
  FROM src GROUP BY {group_col}
)
SELECT {cols},
       CASE WHEN __e2 - __mean * __mean > 0
            THEN ({x} - __mean) / sqrt(__e2 - __mean * __mean)
            ELSE 0.0 END AS {out_col}
FROM src JOIN stats USING ({group_col})
"""


def ols_slope(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group simple linear regression (y = a + b·x) over INTEGER
    features, from exact integer moments: slope b =
    (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), intercept a = (Σy − b·Σx)/n.

    The moments are sums of integer products carried in DECIMAL(38,0)
    (Spark) / HUGEINT (the DuckDB twin) — exact and order-independent
    up to 38 digits, and map-side-combinable (one shuffle keyed on the
    group) — so the fit is bit-deterministic at any parallelism; the
    closing divisions are single IEEE ops identical on any engine.
    The trend-per-segment shape ("does quality drift with length per
    language?") without any ML-library dependency.

    Returns (group, n, slope, intercept); groups with zero x-variance
    get NULL slope/intercept.
    """
    dec = "decimal(38,0)"
    xd = F.col(x_col).cast("decimal(19,0)")
    yd = F.col(y_col).cast("decimal(19,0)")
    m = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast(dec).alias("__sx"),
        F.sum(yd).cast(dec).alias("__sy"),
        F.sum((xd * yd).cast(dec)).cast(dec).alias("__sxy"),
        F.sum((xd * xd).cast(dec)).cast(dec).alias("__sxx"),
    )
    nn = F.col("n").cast(dec)
    num = (nn * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    den = (nn * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    slope = F.when(den != 0.0, num / den)
    intercept = F.when(
        den != 0.0,
        (F.col("__sy").cast("double") - (num / den) * F.col("__sx").cast("double"))
        / F.col("n").cast("double"),
    )
    return m.select(
        group_col,
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


def ols_slope_sql(source_sql: str, group_col: str, x_col: str, y_col: str) -> str:
    """DuckDB twin of :func:`ols_slope`: HUGEINT (int128) moments are
    exact like Spark's DECIMAL(38,0); the double casts route through
    VARCHAR for correctly-rounded parses (see ``functions.numeric``)."""
    xd = f"CAST({x_col} AS HUGEINT)"
    yd = f"CAST({y_col} AS HUGEINT)"

    def d(expr: str) -> str:
        return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"

    return f"""
WITH m AS (
  SELECT {group_col}, COUNT(*) AS n,
         SUM({xd}) AS sx, SUM({yd}) AS sy,
         SUM({xd} * {yd}) AS sxy, SUM({xd} * {xd}) AS sxx
  FROM ({source_sql}) GROUP BY {group_col}
),
c AS (
  SELECT {group_col}, n,
         {d("CAST(n AS HUGEINT) * sxy - sx * sy")} AS num,
         {d("CAST(n AS HUGEINT) * sxx - sx * sx")} AS den,
         {d("sy")} AS syd, {d("sx")} AS sxd
  FROM m
)
SELECT {group_col}, n,
       CASE WHEN den <> 0.0 THEN num / den END AS slope,
       CASE WHEN den <> 0.0
            THEN (syd - (num / den) * sxd) / CAST(n AS DOUBLE) END AS intercept
FROM c
"""


def correlation(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Pearson correlation over INTEGER features from the
    same exact integer moments as :func:`ols_slope`:
    r = (nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²) · (nΣy² − (Σy)²)).
    Moments are exact and order-independent; the closing sqrt/divide
    are single IEEE ops — bit-deterministic, unlike the built-in
    ``corr`` whose float accumulation is partition-order-dependent.
    Groups with zero variance on either side get NULL."""
    dec = "decimal(38,0)"
    xd = F.col(x_col).cast("decimal(19,0)")
    yd = F.col(y_col).cast("decimal(19,0)")
    m = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast(dec).alias("__sx"),
        F.sum(yd).cast(dec).alias("__sy"),
        F.sum((xd * yd).cast(dec)).cast(dec).alias("__sxy"),
        F.sum((xd * xd).cast(dec)).cast(dec).alias("__sxx"),
        F.sum((yd * yd).cast(dec)).cast(dec).alias("__syy"),
    )
    nn = F.col("n").cast(dec)
    num = (nn * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    vx = (nn * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    vy = (nn * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast("double")
    r = F.when((vx > 0.0) & (vy > 0.0), num / F.sqrt(vx * vy))
    return m.select(group_col, "n", r.alias("pearson_r"))


def correlation_sql(source_sql: str, group_col: str, x_col: str, y_col: str) -> str:
    """DuckDB twin of :func:`correlation` (HUGEINT moments, VARCHAR-
    routed double casts — see :func:`ols_slope_sql`)."""
    xd = f"CAST({x_col} AS HUGEINT)"
    yd = f"CAST({y_col} AS HUGEINT)"

    def d(expr: str) -> str:
        return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"

    return f"""
WITH m AS (
  SELECT {group_col}, COUNT(*) AS n,
         SUM({xd}) AS sx, SUM({yd}) AS sy,
         SUM({xd} * {yd}) AS sxy,
         SUM({xd} * {xd}) AS sxx, SUM({yd} * {yd}) AS syy
  FROM ({source_sql}) GROUP BY {group_col}
),
c AS (
  SELECT {group_col}, n,
         {d("CAST(n AS HUGEINT) * sxy - sx * sy")} AS num,
         {d("CAST(n AS HUGEINT) * sxx - sx * sx")} AS vx,
         {d("CAST(n AS HUGEINT) * syy - sy * sy")} AS vy
  FROM m
)
SELECT {group_col}, n,
       CASE WHEN vx > 0.0 AND vy > 0.0 THEN num / sqrt(vx * vy) END AS pearson_r
FROM c
"""


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: Sequence[tuple[str, int]] = (("p25", 25), ("p50", 50), ("p75", 75), ("p90", 90)),
) -> DataFrame:
    """Exact per-group discrete quantiles: for each group, the value at
    sorted index ``⌊(n−1)·p/100⌋`` for every requested percentile —
    actual input values (type-preserving, no interpolation), so the
    result is bit-deterministic and engine-exact, unlike
    ``percentile``/``approx_percentile`` twins whose interpolation and
    sketches differ across engines.

    One shuffle: a (group, value) sort-window ranks rows, a count
    window sizes each group, then a conditional max per percentile
    collapses to one row per group. Exact quantiles are holistic (no
    partial aggregation), so the per-group sort is the honest cost —
    at 100 TB prefer this per *bounded* groups (the calibration-report
    shape) and approx_percentile for corpus-wide monitoring.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    ranked = df.select(
        F.col(group_col),
        F.col(value_col).cast("double").alias("__v"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy(group_col)).alias("__n"),
    )
    aggs = [F.max("__n").alias("n")]
    for name, p in probs:
        idx = F.floor((F.col("__n") - 1) * p / 100) + 1
        aggs.append(F.max(F.when(F.col("__rn") == idx, F.col("__v"))).alias(name))
    return ranked.groupBy(group_col).agg(*aggs).orderBy(group_col)


def group_quantiles_sql(
    table_sql: str,
    group_col: str,
    value_col: str,
    probs: Sequence[tuple[str, int]] = (("p25", 25), ("p50", 50), ("p75", 75), ("p90", 90)),
) -> str:
    """DuckDB oracle twin of :func:`group_quantiles`."""
    picks = ",\n       ".join(
        f"MAX(CASE WHEN rn = (n - 1) * {p} // 100 + 1 THEN v END) AS {name}"
        for name, p in probs
    )
    return f"""
WITH ranked AS (
  SELECT {group_col} AS grp, CAST({value_col} AS DOUBLE) AS v,
         ROW_NUMBER() OVER (PARTITION BY {group_col}
                            ORDER BY CAST({value_col} AS DOUBLE) ASC) AS rn,
         COUNT(*) OVER (PARTITION BY {group_col}) AS n
  FROM ({table_sql})
)
SELECT grp AS {group_col}, CAST(MAX(n) AS BIGINT) AS n,
       {picks}
FROM ranked GROUP BY grp ORDER BY grp
"""


def gini_impurity(
    df: DataFrame, group_cols: Sequence[str], class_col: str
) -> DataFrame:
    """Per-group Gini impurity of a categorical column — the
    class-mix diagnostic (0 = one class, →1 = uniform across many).
    ``1 − Σc²/n²`` is rational in the exact integer counts, so the
    double result is one identical IEEE division/subtraction on any
    engine — deterministic without any decimal plumbing.

    Two chained hash aggregates (per-class counts, then per-group
    moments); both map-side combinable, output bounded by group
    cardinality."""
    counts = df.groupBy(*group_cols, class_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    moments = counts.groupBy(*group_cols).agg(
        F.sum("__c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.col("__c") * F.col("__c")).alias("sum_sq"),
    )
    return moments.withColumn(
        "gini",
        F.lit(1.0)
        - F.col("sum_sq").cast("double")
        / (F.col("n_rows") * F.col("n_rows")).cast("double"),
    )


def gini_impurity_sql(
    source_sql: str, group_cols: Sequence[str], class_col: str
) -> str:
    keys = ", ".join(group_cols)
    return f"""
WITH counts AS (
  SELECT {keys}, {class_col}, COUNT(*) AS c
  FROM ({source_sql}) GROUP BY {keys}, {class_col}
),
moments AS (
  SELECT {keys}, SUM(c) AS n_rows, COUNT(*) AS n_classes,
         SUM(c * c) AS sum_sq
  FROM counts GROUP BY {keys}
)
SELECT {keys}, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_classes AS BIGINT) AS n_classes,
       CAST(sum_sq AS BIGINT) AS sum_sq,
       1.0 - CAST(sum_sq AS DOUBLE) / CAST(n_rows * n_rows AS DOUBLE) AS gini
FROM moments
"""


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier report via Median Absolute Deviation —
    the z-score's resistant twin (one wild value shifts a mean/stddev
    gate; the median/MAD gate doesn't move). Per group: lower median m,
    MAD = lower median of |v − m|, and the count of rows with
    |v − m| > k·MAD.

    Exactness: both medians are discrete (actual values at sorted
    index ⌊(n−1)/2⌋ — no interpolation), deviations are single IEEE
    subtractions, so every engine agrees bitwise. Cost shape: two
    (group)-partitioned sort windows + joins back on the group key —
    holistic like all exact quantiles; run per bounded group, or swap
    approx_percentile in for corpus-wide monitoring (same plan shape).

    Output: ``(group, n, med, mad, n_outliers)``."""
    from pyspark.sql import Window

    def lower_median(frame: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy("__g").orderBy(F.col(col).asc())
        ranked = frame.select(
            "__g",
            F.col(col),
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(Window.partitionBy("__g")).alias("__n"),
        )
        idx = F.floor((F.col("__n") - 1) / 2) + 1
        return ranked.groupBy("__g").agg(
            F.max("__n").alias("__n_rows"),
            F.max(F.when(F.col("__rn") == idx, F.col(col))).alias(out),
        )

    base = df.select(
        F.col(group_col).alias("__g"), F.col(value_col).cast("double").alias("__v")
    )
    med = lower_median(base, "__v", "med").select("__g", "__n_rows", "med")
    # dev stays un-materialized: its replay is one scan + a broadcast
    # join against the tiny per-group median table, and both
    # consumers' copies run in parallel inside one action (r12: a
    # lazy checkpoint here measured 1.6× slower)
    dev = base.join(med, "__g").withColumn(
        "__d", F.abs(F.col("__v") - F.col("med"))
    )
    mad = lower_median(dev.select("__g", "__d"), "__d", "mad").select("__g", "mad")
    out = (
        dev.join(mad, "__g")
        .groupBy("__g")
        .agg(
            F.max("__n_rows").alias("n"),
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.sum(
                (F.col("__d") > F.lit(k) * F.col("mad")).cast("long")
            ).alias("n_outliers"),
        )
    )
    return out.select(F.col("__g").alias(group_col), "n", "med", "mad", "n_outliers")


def mad_outliers_sql(
    table_sql: str, group_col: str, value_col: str, k: float = 3.0
) -> str:
    """DuckDB oracle twin of :func:`mad_outliers`."""
    return f"""
WITH base AS (
  SELECT {group_col} AS g, CAST({value_col} AS DOUBLE) AS v FROM ({table_sql})
),
med AS (
  SELECT g, MAX(n) AS n_rows, MAX(CASE WHEN rn = (n - 1) // 2 + 1 THEN v END) AS med
  FROM (
    SELECT g, v,
           ROW_NUMBER() OVER (PARTITION BY g ORDER BY v ASC) AS rn,
           COUNT(*) OVER (PARTITION BY g) AS n
    FROM base) t
  GROUP BY g
),
dev AS (
  SELECT base.g, abs(base.v - med.med) AS d, med.n_rows, med.med
  FROM base JOIN med USING (g)
),
mad AS (
  SELECT g, MAX(CASE WHEN rn = (n - 1) // 2 + 1 THEN d END) AS mad
  FROM (
    SELECT g, d,
           ROW_NUMBER() OVER (PARTITION BY g ORDER BY d ASC) AS rn,
           COUNT(*) OVER (PARTITION BY g) AS n
    FROM dev) t
  GROUP BY g
)
SELECT dev.g AS {group_col}, CAST(MAX(dev.n_rows) AS BIGINT) AS n,
       MAX(dev.med) AS med, MAX(mad.mad) AS mad,
       CAST(SUM(CASE WHEN dev.d > {k} * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev JOIN mad USING (g)
GROUP BY dev.g
"""


def exact_auc(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact ROC-AUC per group via the Mann-Whitney U statistic with
    midranks for ties — the eval-pipeline metric computed as a
    relational program, engine-exact (every intermediate is an
    integer; AUC is one final division).

    With ties: AUC = (S₂ − P(P+1)) / (2·P·N) where S₂ is twice the
    positive midrank sum — per distinct score v with c rows (p
    positive) and C rows below it, midrank·2 = 2C + c + 1, so
    S₂ = Σ p·(2C + c + 1). One aggregate per (group, score), one
    cumulative window per group (partitioned — nothing global), one
    final fold. NULL AUC when a group lacks both classes.

    Output: ``(group, n_pos, n_neg, auc)``."""
    from pyspark.sql import Window

    per_score = (
        df.select(
            F.col(group_col).alias("__g"),
            F.col(score_col).cast("double").alias("__s"),
            F.col(label_col).cast("long").alias("__y"),
        )
        .groupBy("__g", "__s")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("__y").alias("p"))
    )
    w = Window.partitionBy("__g").orderBy("__s")
    # NB: not named "C" — Spark's default case-insensitive resolution
    # would collide it with the per-score count column "c".
    cum = per_score.withColumn(
        "__below",
        F.coalesce(
            F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    agg = cum.groupBy("__g").agg(
        F.sum("p").alias("n_pos"),
        (F.sum("c") - F.sum("p")).alias("n_neg"),
        F.sum(
            F.col("p") * (2 * F.col("__below") + F.col("c") + 1)
        ).alias("s2"),
    )
    auc = (
        (F.col("s2") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("double")
        / (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
    )
    return agg.select(
        F.col("__g").alias(group_col),
        "n_pos",
        "n_neg",
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0), auc).alias("auc"),
    )


def exact_auc_sql(
    table_sql: str, group_col: str, score_col: str, label_col: str
) -> str:
    """DuckDB oracle twin of :func:`exact_auc`."""
    return f"""
WITH per_score AS (
  SELECT {group_col} AS g, CAST({score_col} AS DOUBLE) AS s,
         COUNT(*) AS c, SUM(CAST({label_col} AS BIGINT)) AS p
  FROM ({table_sql}) GROUP BY 1, 2
),
cum AS (
  SELECT g, c, p,
         COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below_c
  FROM per_score
),
agg AS (
  SELECT g, CAST(SUM(p) AS BIGINT) AS n_pos,
         CAST(SUM(c) - SUM(p) AS BIGINT) AS n_neg,
         SUM(p * (2 * below_c + c + 1)) AS s2
  FROM cum GROUP BY g
)
SELECT g AS {group_col}, n_pos, n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
                 / CAST(2 * n_pos * n_neg AS DOUBLE)
       END AS auc
FROM agg
"""


def confusion_sweep(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
    thresholds: Sequence[float],
) -> DataFrame:
    """Threshold-sweep confusion matrices per group: one row per
    (group, threshold) with TP/FP/FN/TN and exact rational
    precision/recall — the operating-point picker run after
    :func:`exact_auc`. ONE pass, one aggregate: every threshold is a
    conditional count inside the same groupBy (no per-threshold scans
    or joins), then a bounded explode to rows. All-integer until the
    two final divisions."""
    aggs = []
    for i, t in enumerate(thresholds):
        pred = F.col("__s") >= F.lit(float(t))
        aggs += [
            F.sum((pred & F.col("__y")).cast("long")).alias(f"tp{i}"),
            F.sum((pred & ~F.col("__y")).cast("long")).alias(f"fp{i}"),
            F.sum(((~pred) & F.col("__y")).cast("long")).alias(f"fn{i}"),
            F.sum(((~pred) & ~F.col("__y")).cast("long")).alias(f"tn{i}"),
        ]
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(score_col).cast("double").alias("__s"),
        F.col(label_col).cast("boolean").alias("__y"),
    )
    wide = base.groupBy("__g").agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(float(t)).alias("threshold"),
                F.col(f"tp{i}").alias("tp"),
                F.col(f"fp{i}").alias("fp"),
                F.col(f"fn{i}").alias("fn"),
                F.col(f"tn{i}").alias("tn"),
            )
            for i, t in enumerate(thresholds)
        ]
    )
    out = wide.select(F.col("__g").alias(group_col), F.explode(rows).alias("r"))
    return out.select(
        group_col,
        "r.threshold",
        "r.tp",
        "r.fp",
        "r.fn",
        "r.tn",
        F.when(
            F.col("r.tp") + F.col("r.fp") > 0,
            F.col("r.tp").cast("double")
            / (F.col("r.tp") + F.col("r.fp")).cast("double"),
        ).alias("precision"),
        F.when(
            F.col("r.tp") + F.col("r.fn") > 0,
            F.col("r.tp").cast("double")
            / (F.col("r.tp") + F.col("r.fn")).cast("double"),
        ).alias("recall"),
    )


def confusion_sweep_sql(
    table_sql: str,
    group_col: str,
    score_col: str,
    label_col: str,
    thresholds: Sequence[float],
) -> str:
    """DuckDB oracle twin of :func:`confusion_sweep`."""
    blocks = []
    for t in thresholds:
        t = float(t)
        blocks.append(
            f"""SELECT g AS {group_col}, CAST({t!r} AS DOUBLE) AS threshold,
       CAST(SUM(CASE WHEN s >= {t!r} AND y THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(SUM(CASE WHEN s >= {t!r} AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(SUM(CASE WHEN s < {t!r} AND y THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       CAST(SUM(CASE WHEN s < {t!r} AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS tn
FROM base GROUP BY g"""
        )
    union = "\nUNION ALL\n".join(blocks)
    return f"""
WITH base AS (
  SELECT {group_col} AS g, CAST({score_col} AS DOUBLE) AS s,
         CAST({label_col} AS BOOLEAN) AS y
  FROM ({table_sql})
),
sweep AS (
{union}
)
SELECT {group_col}, threshold, tp, fp, fn, tn,
       CASE WHEN tp + fp > 0
            THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
       CASE WHEN tp + fn > 0
            THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall
FROM sweep
"""


def trimmed_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    trim_pct: int = 10,
) -> DataFrame:
    """Per-group trimmed mean: drop the lowest and highest
    ``trim_pct`` percent of rows (k = ⌊n·pct/100⌋ each side, row set
    made deterministic under value ties by the tiebreak column), then
    decimal-exact mean of the keepers — the robust location estimate
    between mean and median. One sort window per group + one
    aggregate; holistic like every exact order statistic.

    Output: ``(group, n, n_kept, trimmed_mean)``."""
    from pyspark.sql import Window

    from gis_city_county_spark.functions.numeric import dec_avg

    w = Window.partitionBy("__g").orderBy(
        F.col("__v").asc(), F.col("__t").asc()
    )
    ranked = df.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("double").alias("__v"),
        F.col(tiebreak_col).alias("__t"),
    ).select(
        "__g",
        "__v",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy("__g")).alias("__n"),
    )
    k = F.expr(f"(CAST(__n AS DECIMAL(38,0)) * {trim_pct}) div 100").cast("long")
    kept = ranked.filter((F.col("__rn") > k) & (F.col("__rn") <= F.col("__n") - k))
    return (
        kept.groupBy("__g")
        .agg(
            F.max("__n").alias("n"),
            F.count(F.lit(1)).alias("n_kept"),
            dec_avg(F.col("__v"), "trimmed_mean"),
        )
        .withColumnRenamed("__g", group_col)
    )


def trimmed_mean_sql(
    table_sql: str,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    trim_pct: int = 10,
) -> str:
    """DuckDB oracle twin of :func:`trimmed_mean`."""
    from gis_city_county_spark.functions.numeric import dec_avg_sql

    return f"""
WITH ranked AS (
  SELECT {group_col} AS g, CAST({value_col} AS DOUBLE) AS v,
         ROW_NUMBER() OVER (PARTITION BY {group_col}
           ORDER BY CAST({value_col} AS DOUBLE) ASC, {tiebreak_col} ASC) AS rn,
         COUNT(*) OVER (PARTITION BY {group_col}) AS n
  FROM ({table_sql})
),
kept AS (
  SELECT g, v, n FROM ranked
  WHERE rn > (CAST(n AS HUGEINT) * {trim_pct}) // 100
    AND rn <= n - (CAST(n AS HUGEINT) * {trim_pct}) // 100
)
SELECT g AS {group_col}, CAST(MAX(n) AS BIGINT) AS n,
       COUNT(*) AS n_kept,
       {dec_avg_sql("v", "trimmed_mean")}
FROM kept GROUP BY g
"""


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-group weighted lower median: the first value (in (value,
    tiebreak) order) whose running weight reaches half the group's
    total — the cost-weighted center ('the price at which half the
    QUANTITY trades', not half the rows). Weights go through exact
    integer/decimal cumulative sums, the crossing test is
    ``2·cum ≥ total`` in integers — no floating point anywhere.

    One sort window per group + one pick; holistic like every exact
    order statistic."""
    from pyspark.sql import Window

    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("double").alias("__v"),
        F.col(weight_col).cast("decimal(28,10)").alias("__w"),
        F.col(tiebreak_col).alias("__t"),
    )
    w = Window.partitionBy("__g").orderBy(F.col("__v").asc(), F.col("__t").asc())
    cum = base.select(
        "__g",
        "__v",
        F.sum("__w").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("__cum"),
        F.sum("__w").over(Window.partitionBy("__g")).alias("__tot"),
        F.row_number().over(w).alias("__rn"),
    )
    crossed = cum.filter(2 * F.col("__cum") >= F.col("__tot"))
    pick = Window.partitionBy("__g").orderBy(F.asc("__rn"))
    return (
        crossed.withColumn("__p", F.row_number().over(pick))
        .filter(F.col("__p") == 1)
        .select(
            F.col("__g").alias(group_col),
            F.col("__tot").cast("double").alias("total_weight"),
            F.col("__v").alias("weighted_median"),
        )
    )


def weighted_median_sql(
    table_sql: str,
    group_col: str,
    value_col: str,
    weight_col: str,
    tiebreak_col: str,
) -> str:
    """DuckDB oracle twin of :func:`weighted_median`."""
    return f"""
WITH base AS (
  SELECT {group_col} AS g, CAST({value_col} AS DOUBLE) AS v,
         CAST({weight_col} AS DECIMAL(28,10)) AS w, {tiebreak_col} AS t
  FROM ({table_sql})
),
cum AS (
  SELECT g, v,
         SUM(w) OVER (PARTITION BY g ORDER BY v, t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(w) OVER (PARTITION BY g) AS tot,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, t) AS rn
  FROM base
)
SELECT g AS {group_col},
       CAST(CAST(MAX(tot) AS VARCHAR) AS DOUBLE) AS total_weight,
       MAX(CASE WHEN pick = 1 THEN v END) AS weighted_median
FROM (
  SELECT g, v, tot,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY rn) AS pick
  FROM cum WHERE 2 * cw >= tot
) t
GROUP BY g
"""


def simpson_diversity(df: DataFrame, cat_col: str) -> DataFrame:
    """Simpson diversity of a categorical mixture — the
    source/language-balance number a corpus build tracks release to
    release (collapsing diversity flags a crawler stuck on one
    domain; NULL categories are dropped, the countDistinct
    convention).

    With N rows and per-category counts n_i, the probability two
    draws WITHOUT replacement share a category is
    Σ n_i(n_i−1) / (N(N−1)); diversity is its complement, and the
    effective category count is N² / Σ n_i² (inverse-Simpson).  All
    three are reported in exact integer milli/ppm form: numerators
    are DECIMAL products of BIGINT counts (n_i² overflows int64 past
    ~3·10⁹ rows in one category), the final ratios are integral
    ``div`` — no doubles anywhere, so both engines match bit-for-bit.

    Relational shape: one map-combinable (category → count)
    aggregate, one bounded rollup over the category counts — shuffle
    is the distinct-category count, never the corpus.

    Returns one row: (n_rows, n_categories, concentration_ppm,
    diversity_ppm, effective_categories_milli); the ppm pair is NULL
    when N < 2 (no pair to draw).
    """
    per_cat = (
        df.filter(F.col(cat_col).isNotNull())
        .groupBy(F.col(cat_col).alias("__c"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    )
    agg = per_cat.agg(
        F.coalesce(F.sum("__n"), F.lit(0)).cast("decimal(18,0)").alias("__N"),
        F.count(F.lit(1)).cast("bigint").alias("n_categories"),
        F.coalesce(
            F.sum(
                F.col("__n").cast("decimal(18,0)")
                * (F.col("__n") - 1).cast("decimal(18,0)")
            ),
            F.lit(0),
        ).cast("decimal(37,0)").alias("__pairs_same"),
        F.coalesce(
            F.sum(
                F.col("__n").cast("decimal(18,0)")
                * F.col("__n").cast("decimal(18,0)")
            ),
            F.lit(0),
        ).cast("decimal(37,0)").alias("__sq"),
    )
    return agg.select(
        F.col("__N").cast("bigint").alias("n_rows"),
        "n_categories",
        F.expr(
            "CASE WHEN __N < 2 THEN CAST(NULL AS BIGINT) ELSE"
            " CAST((__pairs_same * 1000000) div (__N * (__N - 1)) AS BIGINT)"
            " END"
        ).alias("concentration_ppm"),
        F.expr(
            "CASE WHEN __N < 2 THEN CAST(NULL AS BIGINT) ELSE"
            " 1000000 - CAST((__pairs_same * 1000000)"
            " div (__N * (__N - 1)) AS BIGINT) END"
        ).alias("diversity_ppm"),
        F.expr(
            "CASE WHEN __N = 0 THEN CAST(NULL AS BIGINT) ELSE"
            " CAST(((__N * __N) * 1000) div __sq AS BIGINT) END"
        ).alias("effective_categories_milli"),
    )


def simpson_diversity_sql(source_sql: str, cat_col: str) -> str:
    return f"""
WITH per_cat AS (
  SELECT {cat_col} AS c, CAST(COUNT(*) AS BIGINT) AS n
  FROM ({source_sql}) WHERE {cat_col} IS NOT NULL GROUP BY {cat_col}
),
agg AS (
  -- HUGEINT (int128) keeps every product/sum exact; a DECIMAL
  -- formulation would silently promote the *1000000 step to DOUBLE
  -- (result precision > 38).
  SELECT CAST(COALESCE(SUM(n), 0) AS HUGEINT) AS N,
         CAST(COUNT(*) AS BIGINT) AS n_categories,
         COALESCE(SUM(CAST(n AS HUGEINT) * CAST(n - 1 AS HUGEINT)),
                  CAST(0 AS HUGEINT)) AS pairs_same,
         COALESCE(SUM(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)),
                  CAST(0 AS HUGEINT)) AS sq
  FROM per_cat
)
SELECT CAST(N AS BIGINT) AS n_rows, n_categories,
       CASE WHEN N < 2 THEN CAST(NULL AS BIGINT)
            ELSE CAST((pairs_same * 1000000) // (N * (N - 1)) AS BIGINT)
            END AS concentration_ppm,
       CASE WHEN N < 2 THEN CAST(NULL AS BIGINT)
            ELSE 1000000 - CAST((pairs_same * 1000000) // (N * (N - 1))
                                AS BIGINT) END AS diversity_ppm,
       CASE WHEN N = 0 THEN CAST(NULL AS BIGINT)
            ELSE CAST(((N * N) * 1000) // sq AS BIGINT)
            END AS effective_categories_milli
FROM agg
"""


def join_fanout_histogram(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_fk: str,
) -> DataFrame:
    """Join fan-out profile: for a 1:N parent↔child join, how many
    parents have exactly N children — the skew diagnosis read BEFORE
    choosing a join strategy (a long tail of hot parents means salting
    or skew-join hints; a flat histogram means the plain hash join is
    fine).  Parents with zero children appear at fanout 0 (the rows an
    inner join would silently drop).

    One map-combinable count per child key, one left join from the
    parent keys (broadcast-eligible when the parent dimension is
    small), one count per fanout value — output rows bounded by the
    number of DISTINCT fan-out values, not the data.  Exact integers.

    Children whose FK matches NO parent (dangling or NULL keys — the
    mirror-image data-quality signal) land in one extra row with
    ``fanout`` NULL and ``n_parents`` 0, always present, so
    ``SUM(n_children)`` cross-foots exactly with the child row count.

    Returns (fanout, n_parents, n_children) ordered small→large by
    the caller if needed.
    """
    counts = child.groupBy(F.col(child_fk).alias("__k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    pkeys = parent.select(F.col(parent_key).alias("__k"))
    per_parent = pkeys.join(counts, "__k", "left").select(
        F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("__n")
    )
    hist = (
        per_parent.groupBy(F.col("__n").alias("fanout"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parents"))
        .select(
            F.col("fanout").cast("bigint").alias("fanout"),
            "n_parents",
            (F.col("fanout") * F.col("n_parents"))
            .cast("bigint")
            .alias("n_children"),
        )
    )
    orphans = counts.join(pkeys, "__k", "left_anti").agg(
        F.lit(None).cast("bigint").alias("fanout"),
        F.lit(0).cast("bigint").alias("n_parents"),
        F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias("n_children"),
    )
    return hist.unionByName(orphans)


def join_fanout_histogram_sql(
    parent_sql: str, child_sql: str, parent_key: str, child_fk: str
) -> str:
    return f"""
WITH counts AS (
  SELECT {child_fk} AS k, CAST(COUNT(*) AS BIGINT) AS n
  FROM ({child_sql}) GROUP BY {child_fk}
),
pkeys AS (SELECT {parent_key} AS k FROM ({parent_sql})),
per_parent AS (
  SELECT COALESCE(counts.n, 0) AS n
  FROM pkeys p LEFT JOIN counts ON counts.k = p.k
)
SELECT CAST(n AS BIGINT) AS fanout, CAST(COUNT(*) AS BIGINT) AS n_parents,
       CAST(n * COUNT(*) AS BIGINT) AS n_children
FROM per_parent GROUP BY n
UNION ALL
SELECT CAST(NULL AS BIGINT) AS fanout, CAST(0 AS BIGINT) AS n_parents,
       CAST(COALESCE(SUM(c.n), 0) AS BIGINT) AS n_children
FROM counts c LEFT JOIN pkeys p ON p.k = c.k
WHERE p.k IS NULL
"""


def concentration_profile(
    df: DataFrame, key_col: str, n_bands: int = 10
) -> DataFrame:
    """Lorenz-curve concentration of activity over keys — "do 1% of
    the users generate 90% of the events?", the skew diagnostic that
    decides whether a pipeline needs salting, quota sampling, or
    per-user caps before the heavy keys melt a shuffle.

    Keys rank by (event count asc, key asc) through the two-phase
    bucketed :func:`operators.scale.ranged_rank` (no single-partition
    window at any key count), land in ``n_bands`` equal-population
    rank bands, and each band reports its exact event share in ppm
    plus the running (Lorenz) share.  The Gini coefficient rides
    along from the same exact moments via the rank-weighted identity
    G = (2·Σ rank·c − (n+1)·S) / (n·S), floored to ppm — all integer
    arithmetic on DECIMAL(38,0), one closing integral division.

    Returns ``n_bands`` rows: (band, n_keys, n_events, share_ppm,
    cum_share_ppm, gini_ppm) — gini_ppm constant across rows (the
    cross-footing audit: band shares must sum to ~1e6).
    """
    from gis_city_county_spark.operators.scale import ranged_rank

    counts = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("__k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    # ranked feeds the moment aggregate AND the band rollup — without
    # the materialization the count+rank lineage replays per
    # reference (guide §3.3; r12-before plan: 20 Exchange)
    ranked = _materialize_for_multipass(
        ranged_rank(counts, "__c", "__k", rank_col="__i",
                    descending=False)
    )
    dec = "decimal(38,0)"
    moments = ranked.agg(
        F.count(F.lit(1)).cast(dec).alias("__n"),
        F.sum(F.col("__c").cast("decimal(19,0)")).cast(dec).alias("__s"),
        F.sum(
            (F.col("__i").cast("decimal(19,0)")
             * F.col("__c").cast("decimal(19,0)")).cast(dec)
        ).cast(dec).alias("__ic"),
    )
    bands = (
        ranked.join(F.broadcast(moments))
        .withColumn(
            "band",
            F.expr(
                f"CAST(({n_bands} * (__i - 1)) div __n AS BIGINT)"
            ),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("__c").cast("bigint").alias("n_events"),
        )
    )
    w = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        bands.join(F.broadcast(moments))
        .select(
            "band",
            "n_keys",
            "n_events",
            F.expr(
                "CAST((CAST(n_events AS DECIMAL(38,0)) * 1000000)"
                " div __s AS BIGINT)"
            ).alias("share_ppm"),
            F.sum("n_events").over(w).alias("__cum"),
            F.col("__s"),
            F.expr(
                "CAST(((2 * __ic - (__n + 1) * __s) * 1000000)"
                " div (__n * __s) AS BIGINT)"
            ).alias("gini_ppm"),
        )
        .select(
            "band",
            "n_keys",
            "n_events",
            "share_ppm",
            F.expr(
                "CAST((CAST(__cum AS DECIMAL(38,0)) * 1000000)"
                " div __s AS BIGINT)"
            ).alias("cum_share_ppm"),
            "gini_ppm",
        )
    )


def concentration_profile_sql(
    source_sql: str, key_col: str, n_bands: int = 10
) -> str:
    return f"""
WITH counts AS (
  SELECT {key_col} AS k, CAST(COUNT(*) AS BIGINT) AS c
  FROM ({source_sql}) WHERE {key_col} IS NOT NULL GROUP BY 1
),
ranked AS (
  SELECT k, c, ROW_NUMBER() OVER (ORDER BY c ASC, k ASC) AS i
  FROM counts
),
m AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(c) AS HUGEINT) AS s,
         CAST(SUM(CAST(i AS HUGEINT) * CAST(c AS HUGEINT)) AS HUGEINT)
           AS ic
  FROM ranked
),
bands AS (
  SELECT CAST(({n_bands} * (CAST(i AS HUGEINT) - 1)) // n AS BIGINT)
           AS band,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(c) AS BIGINT) AS n_events
  FROM ranked, m GROUP BY 1
)
SELECT band, n_keys, n_events,
       CAST((CAST(n_events AS HUGEINT) * 1000000) // m.s AS BIGINT)
         AS share_ppm,
       CAST((CAST(SUM(n_events) OVER (ORDER BY band
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS HUGEINT) * 1000000) // m.s AS BIGINT) AS cum_share_ppm,
       CAST(((2 * m.ic - (m.n + 1) * m.s) * 1000000) // (m.n * m.s)
            AS BIGINT) AS gini_ppm
FROM bands, m
"""
