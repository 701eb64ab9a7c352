"""Temporal join operators: as-of join and bucketed range join.

The reference has no temporal joins (SURVEY.md §2.5 — equi-joins
only); these are greenfield scale operators for event/feature
pipelines (e.g. point-in-time-correct feature lookup for training
data). Both avoid the naive per-key cross product:

* ``asof_join`` — merged-stream window scan: union both inputs tagged
  by side, one shuffle on the join key, then a running ``last()`` over
  (ts, side, tiebreak). Cost is O(n log n) per key partition and the
  shuffle moves each row exactly once — no time-range explosion, no
  per-left-row probe. This is the plan a 100 TB point-in-time join
  wants: a single sort-based window, AQE-splittable on skewed keys.
* ``range_join`` — equi-join on (key, time bucket) with bucket width =
  the window span, left rows exploded to the ≤2 covering buckets, then
  an exact range refine. The shuffle co-locates only temporal
  neighbors, so a hot key never degenerates into a full per-key cross
  product; Catalyst sees a plain equi-join (hash, AQE-skew-splittable)
  rather than a broadcast-nested-loop theta join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# --------------------------------------------------------------- as-of

def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_tiebreak: str,
    suffix: str = "_r",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join: for every left row, attach the
    right row with the greatest ``right_ts <= left_ts`` (ties on the
    timestamp broken by the greatest ``right_tiebreak``), left-outer
    semantics (unmatched left rows keep NULL right columns).

    The matched columns are carried through the window as ONE struct,
    so all attached fields always come from the same right row even
    when some payload fields are NULL.

    ``tolerance_seconds`` (optional) voids matches older than the
    given lag, mirroring pandas ``merge_asof(tolerance=...)``.
    """
    rpay = F.struct(*[F.col(c) for c in right_cols + [right_ts]])
    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tb"),
        F.lit(None).cast(
            right.select(rpay.alias("x")).schema["x"].dataType
        ).alias("__rpay"),
    )
    rhs = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns
          if c not in on],
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_tiebreak).cast("long").alias("__tb"),
        rpay.alias("__rpay"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = lhs.unionByName(rhs).withColumn(
        "__match", F.last("__rpay", ignorenulls=True).over(w)
    )
    out = matched.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        lag = F.col("__ts").cast("double") - F.col(f"__match.{right_ts}").cast("double")
        out = out.withColumn(
            "__match", F.when(lag <= F.lit(tolerance_seconds), F.col("__match"))
        )
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols + [right_ts]],
    )


def asof_join_sql(
    left_sql: str,
    right_sql: str,
    on: list[str],
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    right_tiebreak: str,
    suffix: str = "_r",
) -> str:
    """DuckDB twin via the same merged-stream window scan (native ASOF
    JOIN breaks timestamp ties arbitrarily; this formulation pins the
    tiebreak so both engines pick the same row)."""
    keys = ", ".join(on)
    lsel = ", ".join(c for c in left_cols if c not in on)
    r_null = ", ".join(
        f"NULL AS {c}" for c in left_cols if c not in on
    )
    pay = right_cols + [right_ts]
    l_null_pay = ", ".join(f"NULL AS __p_{c}" for c in pay)
    r_pay = ", ".join(f"{c} AS __p_{c}" for c in pay)
    lasts = ",\n       ".join(
        f"last_value(__p_{c} IGNORE NULLS) OVER w AS {c}{suffix}" for c in pay
    )
    outcols = ", ".join(left_cols + [f"{c}{suffix}" for c in pay])
    return f"""
WITH l AS ({left_sql}), r AS ({right_sql}),
merged AS (
  SELECT {keys}, {lsel}, {left_ts} AS __ts, 1 AS side, 0 AS tb, {l_null_pay} FROM l
  UNION ALL BY NAME
  SELECT {keys}, {r_null}, {right_ts} AS __ts, 0 AS side, {right_tiebreak} AS tb,
         {r_pay} FROM r
),
scanned AS (
  SELECT *,
       {lasts}
  FROM merged
  WINDOW w AS (PARTITION BY {keys} ORDER BY __ts, side, tb
               ROWS UNBOUNDED PRECEDING)
)
SELECT {outcols}
FROM scanned WHERE side = 1
"""


# --------------------------------------------------------------- range

def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    suffix: str = "_r",
) -> DataFrame:
    """Interval join: all (left, right) pairs sharing ``on`` with
    ``left_ts + lower <= right_ts <= left_ts + upper``.

    Bucket width = window span (integer microseconds, exact): each
    right row lands in one bucket, each left row probes the ≤2 buckets
    covering its window, and the exact predicate refines after the
    equi-join. Right columns come back suffixed.
    """
    span_us = int(round((upper_seconds - lower_seconds) * 1_000_000))
    if span_us <= 0:
        raise ValueError("upper_seconds must exceed lower_seconds")
    lo_us = int(round(lower_seconds * 1_000_000))
    up_us = int(round(upper_seconds * 1_000_000))

    lus = F.unix_micros(F.col(left_ts))
    rus = F.unix_micros(F.col(right_ts))
    lhs = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor((lus + lo_us) / span_us), F.floor((lus + up_us) / span_us)
            )
        ),
    )
    rhs = right.select(
        *[F.col(c).alias(f"{c}{suffix}" if c not in on else c) for c in right.columns],
    ).withColumn("__bucket", F.floor(F.unix_micros(F.col(f"{right_ts}{suffix}")) / span_us))

    rts = F.unix_micros(F.col(f"{right_ts}{suffix}"))
    lts = F.unix_micros(F.col(left_ts))
    return (
        lhs.join(rhs, on + ["__bucket"])
        .filter((rts >= lts + lo_us) & (rts <= lts + up_us))
        .drop("__bucket")
    )


def range_join_sql(
    left_sql: str,
    right_sql: str,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    left_cols: list[str],
    right_cols: list[str],
    suffix: str = "_r",
) -> str:
    keys = " AND ".join(f"r.{k} = l.{k}" for k in on)
    lsel = ", ".join(f"l.{c}" for c in left_cols)
    rsel = ", ".join(
        f"r.{c} AS {c}{suffix}" for c in right_cols if c not in on
    )
    lo_us = int(round(lower_seconds * 1_000_000))
    up_us = int(round(upper_seconds * 1_000_000))
    return f"""
WITH l AS ({left_sql}), r AS ({right_sql})
SELECT {lsel}, {rsel}
FROM l JOIN r ON {keys}
 AND epoch_us(r.{right_ts}) >= epoch_us(l.{left_ts}) + {lo_us}
 AND epoch_us(r.{right_ts}) <= epoch_us(l.{left_ts}) + {up_us}
"""


# ------------------------------------------------------------ funnel


def funnel_stages(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
) -> DataFrame:
    """Ordered-funnel analysis: for each user, the timestamp of the
    first occurrence of stage i that happens strictly *after* their
    first completed stage i-1 (the classic signup → click → purchase
    progression; re-orderings don't count).

    One row per user: (user, stage_reached, t_stage1..t_stageN).

    Plan shape: every stage is a conditional ``MIN() OVER (PARTITION
    BY user)`` window referencing the previous stage's column — N
    chained projections over a single hash exchange on the user key
    (no joins, no N scans of the event log), then one distinct to
    collapse to per-user rows.
    """
    w = Window.partitionBy(user_col)
    out = events
    for i, s in enumerate(stages):
        cond = F.col(type_col) == s
        if i > 0:
            cond = cond & (F.col(ts_col) > F.col(f"t_stage{i}"))
        out = out.withColumn(
            f"t_stage{i + 1}",
            F.min(F.when(cond, F.col(ts_col))).over(w),
        )
    reached = F.lit(0)
    for i in range(len(stages)):
        reached = F.when(F.col(f"t_stage{i + 1}").isNotNull(), i + 1).otherwise(
            reached
        )
    # Evaluate deepest-first: stage N implies all earlier stages.
    cols = [f"t_stage{i + 1}" for i in range(len(stages))]
    return (
        out.select(user_col, *cols)
        .distinct()
        .withColumn("stage_reached", reached.cast("int"))
    )


def funnel_stages_sql(
    source_sql: str,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
) -> str:
    layers = [f"s0 AS ({source_sql})"]
    for i, s in enumerate(stages):
        cond = f"{type_col} = '{s}'"
        if i > 0:
            cond += f" AND {ts_col} > t_stage{i}"
        layers.append(
            f"s{i + 1} AS (SELECT *, MIN(CASE WHEN {cond} THEN {ts_col} END)"
            f" OVER (PARTITION BY {user_col}) AS t_stage{i + 1} FROM s{i})"
        )
    reached = "0"
    for i in range(len(stages)):
        reached = (
            f"CASE WHEN t_stage{i + 1} IS NOT NULL THEN {i + 1} ELSE {reached} END"
        )
    cols = ", ".join(f"t_stage{i + 1}" for i in range(len(stages)))
    return (
        "WITH " + ",\n".join(layers) + f"""
SELECT {user_col}, {cols}, CAST({reached} AS INTEGER) AS stage_reached
FROM (SELECT DISTINCT {user_col}, {cols} FROM s{len(stages)})
"""
    )


# ------------------------------------------------- rolling features


def rolling_features(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    window_seconds: int = 600,
) -> DataFrame:
    """Per-event trailing-window features: count and (decimal-exact)
    sum of ``value_col`` over the last ``window_seconds`` for the same
    user, plus the gap to the previous event — the standard
    point-in-time feature-engineering shape.

    Both windows share one hash exchange on the user key: the trailing
    frame is a RANGE window over the microsecond timestamp (frame
    membership is by *value*, so timestamp ties land in each other's
    frames identically on any engine), the gap uses a ROWS ordering
    with the event id as tiebreak. Sums accumulate in DECIMAL(38,10),
    so the doubles are order-independent and engine-exact.
    """
    micros = F.unix_micros(F.col(ts_col))
    w_range = (
        Window.partitionBy(user_col)
        .orderBy(micros)
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    w_row = Window.partitionBy(user_col).orderBy(micros, F.col(id_col))
    return events.select(
        F.col(id_col),
        F.col(user_col),
        F.col(ts_col),
        F.count(F.lit(1)).over(w_range).alias("n_trailing"),
        F.sum(F.col(value_col).cast("decimal(38,10)"))
        .over(w_range)
        .cast("double")
        .alias("sum_trailing"),
        (micros - F.lag(micros).over(w_row)).alias("gap_us"),
    )


def rolling_features_sql(
    source_sql: str,
    user_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    window_seconds: int = 600,
) -> str:
    span = window_seconds * 1_000_000
    return f"""
WITH src AS ({source_sql}),
base AS (SELECT *, epoch_us({ts_col}) AS __us FROM src)
SELECT {id_col}, {user_col}, {ts_col},
       COUNT(*) OVER wr AS n_trailing,
       CAST(CAST(SUM(CAST({value_col} AS DECIMAL(38,10))) OVER wr AS VARCHAR)
            AS DOUBLE) AS sum_trailing,
       __us - LAG(__us) OVER (PARTITION BY {user_col} ORDER BY __us, {id_col})
         AS gap_us
FROM base
WINDOW wr AS (PARTITION BY {user_col} ORDER BY __us
              RANGE BETWEEN {span} PRECEDING AND CURRENT ROW)
"""


# -------------------------------------------------- resample + ffill


def resample_ffill(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    step_seconds: int,
) -> DataFrame:
    """Resample an irregular event stream onto a regular per-key time
    grid with forward fill — the gap-free series a feature store or
    plotting layer wants.

    Grid cells run from each key's first to last event (inclusive) at
    ``step_seconds``; a cell's observation is the *last* event inside
    it (total order: ts, id), and empty cells carry the previous
    cell's value forward (leading cells before any observation stay
    NULL — nothing to fill from).

    Plan: per-key min/max (one agg) → grid explode (scan-side
    ``sequence``) → left join against the per-cell last-event
    aggregate (both sides hash on the key+cell) → one ordered window
    for the fill. No per-event cross products; grid size is bounded by
    span/step, independent of event density.
    """
    us = F.unix_micros(F.col(ts_col))
    step_us = step_seconds * 1_000_000
    cell = F.expr(f"unix_micros({ts_col}) div {step_us}").alias("cell")
    # Last observation per (key, cell): row_number desc over (ts, id).
    w_last = Window.partitionBy(key_col, "cell").orderBy(
        F.desc(ts_col), F.desc(id_col)
    )
    obs = (
        events.select(F.col(key_col), cell, F.col(ts_col), F.col(id_col),
                      F.col(value_col))
        .withColumn("__rn", F.row_number().over(w_last))
        .filter(F.col("__rn") == 1)
        .select(key_col, "cell", F.col(value_col).alias("__obs"))
    )
    spans = events.groupBy(key_col).agg(
        F.min(us).alias("__lo"), F.max(us).alias("__hi")
    )
    grid = spans.select(
        key_col,
        F.explode(
            F.sequence(
                F.expr(f"__lo div {step_us}"), F.expr(f"__hi div {step_us}")
            )
        ).alias("cell"),
    )
    w_fill = (
        Window.partitionBy(key_col)
        .orderBy("cell")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, [key_col, "cell"], "left")
        .select(
            key_col,
            F.timestamp_micros(F.col("cell") * step_us).alias("cell_start"),
            F.last("__obs", ignorenulls=True).over(w_fill).alias("value_ffill"),
            F.col("__obs").isNotNull().alias("observed"),
        )
    )


def resample_ffill_sql(
    source_sql: str,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    step_seconds: int,
) -> str:
    step_us = step_seconds * 1_000_000
    return f"""
WITH src AS ({source_sql}),
cells AS (
  SELECT *, epoch_us({ts_col}) // {step_us} AS cell FROM src
),
obs AS (
  SELECT {key_col}, cell, {value_col} AS __obs FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY {key_col}, cell
                ORDER BY {ts_col} DESC, {id_col} DESC) AS __rn
    FROM cells
  ) WHERE __rn = 1
),
spans AS (
  SELECT {key_col},
         MIN(epoch_us({ts_col})) // {step_us} AS lo,
         MAX(epoch_us({ts_col})) // {step_us} AS hi
  FROM src GROUP BY {key_col}
),
grid AS (
  SELECT {key_col}, g.cell
  FROM spans, LATERAL UNNEST(generate_series(lo, hi)) AS g(cell)
)
SELECT g.{key_col},
       make_timestamp(g.cell * {step_us}) AS cell_start,
       LAST_VALUE(o.__obs IGNORE NULLS) OVER (
         PARTITION BY g.{key_col} ORDER BY g.cell
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
       o.__obs IS NOT NULL AS observed
FROM grid g LEFT JOIN obs o ON g.{key_col} = o.{key_col} AND g.cell = o.cell
"""


# ------------------------------------------- time-weighted average


def time_weighted_avg(
    df: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """Duration-weighted mean of a piecewise-constant signal: each
    observation holds its value until the key's next event, and is
    weighted by that holding time (the last event of a key carries no
    weight — its duration is unknown).

    The standard sensor/metrics rollup that a plain AVG gets wrong
    whenever sampling is irregular. One shuffle: a (key, ts) window
    computes ``lead`` durations in exact integer microseconds
    (``unix_micros``), then a keyed aggregation folds the product
    ``DECIMAL(18,6) value × DECIMAL(18,0) duration`` — exact decimal
    multiply (37,6), order-independent sum, no double rounding until
    the single closing IEEE divide. Contract: values are quantized to
    micro-units (≤6 decimal places), which also guarantees the
    double→decimal conversion is exact on every engine.

    Output: ``(key, n_events, total_us, twa)``; keys with a single
    event emit NULL twa.
    """
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key_col).orderBy(us.asc(), F.col(value_col).asc())
    dur = (F.lead(us).over(w) - us).alias("__dur_us")
    spans = df.select(F.col(key_col), F.col(value_col).cast("double").alias("__v"), dur)
    held = spans.filter(F.col("__dur_us").isNotNull())
    prod = F.col("__v").cast("decimal(18,6)") * F.col("__dur_us").cast("decimal(19,0)")
    agg = held.groupBy(key_col).agg(
        F.sum(prod).cast("double").alias("__ws"),
        F.sum(F.col("__dur_us")).alias("total_us"),
    )
    n = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_events"))
    return (
        n.join(agg, key_col, "left")
        .select(
            key_col,
            "n_events",
            F.coalesce(F.col("total_us"), F.lit(0)).alias("total_us"),
            F.when(F.col("total_us") > 0, F.col("__ws") / F.col("total_us").cast("double")).alias("twa"),
        )
    )


def time_weighted_avg_sql(
    table_sql: str, key_col: str, ts_col: str, value_col: str
) -> str:
    """DuckDB oracle twin of :func:`time_weighted_avg`."""
    return f"""
WITH spans AS (
  SELECT {key_col} AS key,
         CAST({value_col} AS DOUBLE) AS v,
         LEAD(epoch_us({ts_col})) OVER (
           PARTITION BY {key_col}
           ORDER BY epoch_us({ts_col}) ASC, CAST({value_col} AS DOUBLE) ASC)
           - epoch_us({ts_col}) AS dur_us
  FROM ({table_sql})
),
agg AS (
  SELECT key,
         -- DECIMAL(19,0) forces int128 storage so the product can't
         -- overflow DuckDB's int64 multiply path
         CAST(CAST(SUM(CAST(v AS DECIMAL(18,6)) * CAST(dur_us AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS ws,
         SUM(dur_us) AS total_us
  FROM spans WHERE dur_us IS NOT NULL GROUP BY key
),
n AS (SELECT {key_col} AS key, COUNT(*) AS n_events FROM ({table_sql}) GROUP BY 1)
SELECT n.key AS {key_col}, n.n_events,
       CAST(COALESCE(agg.total_us, 0) AS BIGINT) AS total_us,
       CASE WHEN agg.total_us > 0 THEN agg.ws / CAST(agg.total_us AS DOUBLE) END AS twa
FROM n LEFT JOIN agg ON n.key = agg.key
"""


# ------------------------------------------------- drift excursion


def drift_excursion(
    df: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """CUSUM-style drift detection: per key, the maximum upward
    excursion of the cumulative deviation-from-mean of the value
    series — large when the series has a sustained above-mean run (a
    level shift / regime change), near zero for white noise.

    Exactness trick: deviations from the mean are kept *scaled by n*
    (``dev_i = n·xᵢ − Σx``, exact DECIMAL — no division), so the
    running sums and the final max are exact integer-grade decimal
    arithmetic; the one closing division by n happens in double, once.
    Shapes: a per-key moment aggregate broadcast back, then ONE
    ordered-window pass computing running sum and running min
    together, then a keyed max — two shuffles total at any scale.
    Contract: values quantized to ≤6 decimals (micro-units).

    Output: ``(key, n, max_excursion)`` where max_excursion =
    max over prefixes of (cum − min_prefix_cum) / n, in value units.
    """
    x = F.col(value_col).cast("decimal(18,6)")
    stats = df.groupBy(key_col).agg(
        F.sum(x).alias("__sx"), F.count(F.lit(1)).alias("__n")
    )
    us = F.unix_micros(F.col(ts_col))
    src = df.join(F.broadcast(stats), key_col).select(
        F.col(key_col),
        us.alias("__us"),
        (
            F.col(value_col).cast("decimal(18,6)") * F.col("__n").cast("decimal(19,0)")
            - F.col("__sx").cast("decimal(38,6)")
        ).alias("__dev"),
        F.col("__n"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("__us").asc(), F.col("__dev").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = src.withColumn("__cum", F.sum("__dev").over(w))
    exc = F.col("__cum") - F.min("__cum").over(w)
    return (
        cums.select(key_col, F.col("__n").alias("n"), exc.alias("__exc"))
        .groupBy(key_col, "n")
        .agg(F.max("__exc").alias("__maxexc"))
        .select(
            key_col,
            "n",
            (
                F.col("__maxexc").cast("double") / F.col("n").cast("double")
            ).alias("max_excursion"),
        )
    )


def drift_excursion_sql(
    table_sql: str, key_col: str, ts_col: str, value_col: str
) -> str:
    """DuckDB oracle twin of :func:`drift_excursion` (same scaled-
    deviation window pass; DECIMAL(19,0) forces int128 multiply)."""
    return f"""
WITH stats AS (
  SELECT {key_col} AS key, SUM(CAST({value_col} AS DECIMAL(18,6))) AS sx,
         COUNT(*) AS n
  FROM ({table_sql}) GROUP BY 1
),
src AS (
  SELECT t.{key_col} AS key, epoch_us(t.{ts_col}) AS us,
         CAST(t.{value_col} AS DECIMAL(18,6)) * CAST(s.n AS DECIMAL(19,0))
           - CAST(s.sx AS DECIMAL(38,6)) AS dev,
         s.n
  FROM ({table_sql}) t JOIN stats s ON t.{key_col} = s.key
),
cums AS (
  SELECT key, n, us, dev,
         SUM(dev) OVER (PARTITION BY key ORDER BY us ASC, dev ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM src
),
runs AS (
  SELECT key, n,
         cum - MIN(cum) OVER (PARTITION BY key ORDER BY us ASC, dev ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS exc
  FROM cums
)
SELECT key AS {key_col}, CAST(n AS BIGINT) AS n,
       CAST(CAST(MAX(exc) AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
         AS max_excursion
FROM runs GROUP BY key, n
"""


# ------------------------------------------------ sweep-line concurrency


def peak_concurrency(
    df: DataFrame,
    ts_col: str,
    duration_seconds: int,
    day_us: int = 86_400_000_000,
) -> DataFrame:
    """Peak concurrent intervals per day by relational sweep-line:
    each row opens a half-open interval ``[ts, ts + duration)``; the
    answer is the daily maximum of the running (+1 open / −1 close)
    sum — the capacity-planning curve ("how many sessions were live at
    the worst moment of each day").

    Scale shape: intervals are split at midnight (a bounded explode —
    an interval covers ≤ ⌈duration/day⌉+1 days), so the sweep's window
    partitions by day instead of one global ordering — every stage is
    keyed, nothing is single-partition. Close events sort before open
    events at the same instant (half-open semantics), and ties beyond
    that are interchangeable (+1/−1 multiset), so the peak is exact
    and engine-deterministic — all integer arithmetic.

    Output: ``(day, n_intervals, peak)`` — intervals *active* in the
    day (``n_intervals``) and the day's max concurrency.
    """
    dur_us = duration_seconds * 1_000_000
    s = F.unix_micros(F.col(ts_col))
    iv = df.select(s.alias("__s"), (s + dur_us).alias("__e"))
    clipped = (
        iv.select(
            "__s",
            "__e",
            F.explode(
                F.sequence(
                    F.floor(F.col("__s") / day_us),
                    F.floor((F.col("__e") - 1) / day_us),
                )
            ).alias("__day"),
        )
        .select(
            "__day",
            F.greatest(F.col("__s"), F.col("__day") * day_us).alias("__cs"),
            F.least(F.col("__e"), (F.col("__day") + 1) * day_us).alias("__ce"),
        )
    )
    opens = clipped.select("__day", F.col("__cs").alias("t"), F.lit(1).alias("delta"))
    closes = clipped.select("__day", F.col("__ce").alias("t"), F.lit(-1).alias("delta"))
    points = opens.unionByName(closes)
    w = (
        Window.partitionBy("__day")
        .orderBy(F.col("t").asc(), F.col("delta").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = points.withColumn("__run", F.sum("delta").over(w))
    return (
        running.groupBy("__day")
        .agg(
            (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
            F.max("__run").alias("peak"),
        )
        .select(
            F.timestamp_micros(F.col("__day") * day_us).alias("day"),
            "n_intervals",
            "peak",
        )
        .orderBy("day")
    )


def peak_concurrency_sql(
    table_sql: str, ts_col: str, duration_seconds: int
) -> str:
    """DuckDB oracle twin of :func:`peak_concurrency`."""
    day_us = 86_400_000_000
    dur_us = duration_seconds * 1_000_000
    return f"""
WITH iv AS (
  SELECT epoch_us({ts_col}) AS s, epoch_us({ts_col}) + {dur_us} AS e
  FROM ({table_sql})
),
clipped AS (
  SELECT d.day,
         greatest(iv.s, d.day * {day_us}) AS cs,
         least(iv.e, (d.day + 1) * {day_us}) AS ce
  FROM iv, LATERAL (
    SELECT UNNEST(generate_series(iv.s // {day_us}, (iv.e - 1) // {day_us}))
      AS day) d
),
points AS (
  SELECT day, cs AS t, 1 AS delta FROM clipped
  UNION ALL
  SELECT day, ce AS t, -1 AS delta FROM clipped
),
runs AS (
  SELECT day,
         SUM(delta) OVER (PARTITION BY day ORDER BY t ASC, delta ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run
  FROM points
)
SELECT make_timestamp(day * {day_us}) AS day,
       CAST(COUNT(*) // 2 AS BIGINT) AS n_intervals,
       CAST(MAX(run) AS BIGINT) AS peak
FROM runs GROUP BY day ORDER BY day
"""


def interval_union(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    duration_seconds: int,
) -> DataFrame:
    """Coalesce overlapping/adjacent intervals per key into maximal
    covered spans (gaps-and-islands over *intervals*, the coverage
    twin of point-based ``sessionize``): each row opens ``[ts, ts +
    duration)``; output is one row per merged island with its span
    and member count.

    Relational form: order each key's intervals by start, take the
    running max of *prior* ends (ROWS … 1 PRECEDING window) — a new
    island starts exactly where the start exceeds that max — then a
    running sum of the island flags numbers the islands and one
    aggregate per (key, island) finishes. Two windows + one agg, all
    partitioned by key: nothing global, integer-exact, and ties on
    (start, end) are island-invariant so any tie order gives the
    same result.

    Output: ``(key, island, island_start_us, island_end_us,
    n_intervals, covered_us)``."""
    dur_us = duration_seconds * 1_000_000
    s = F.unix_micros(F.col(ts_col))
    iv = df.select(
        F.col(key_col).alias("key"), s.alias("__s"), (s + dur_us).alias("__e")
    )
    w = Window.partitionBy("key").orderBy("__s", "__e")
    prev_max = F.max("__e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "__new",
        F.when(prev_max.isNull() | (F.col("__s") > prev_max), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("key", "island")
        .agg(
            F.min("__s").alias("island_start_us"),
            F.max("__e").alias("island_end_us"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .withColumn(
            "covered_us", F.col("island_end_us") - F.col("island_start_us")
        )
    )


def interval_union_sql(
    table_sql: str, key_col: str, ts_col: str, duration_seconds: int
) -> str:
    """DuckDB oracle twin of :func:`interval_union`."""
    dur_us = duration_seconds * 1_000_000
    return f"""
WITH iv AS (
  SELECT {key_col} AS key, epoch_us({ts_col}) AS s,
         epoch_us({ts_col}) + {dur_us} AS e
  FROM ({table_sql})
),
flagged AS (
  SELECT key, s, e,
         CASE WHEN MAX(e) OVER (PARTITION BY key ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR s > MAX(e) OVER (PARTITION BY key ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT key, s, e,
         SUM(new_island) OVER (PARTITION BY key ORDER BY s, e
           ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
)
SELECT key, CAST(island AS BIGINT) AS island,
       MIN(s) AS island_start_us, MAX(e) AS island_end_us,
       COUNT(*) AS n_intervals,
       MAX(e) - MIN(s) AS covered_us
FROM islands GROUP BY 1, 2
"""


def sequence_pattern_count(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    class_col: str,
    classes: dict[str, str],
    pattern: str,
) -> DataFrame:
    """MATCH_RECOGNIZE-style row-pattern matching, relationally: per
    key, events collapse (in event-time order) to a one-char-per-event
    symbol string, and the pattern is a regex counted leftmost-greedy
    non-overlapping — the complex-event-processing shape ("how many
    signup→browse*→purchase journeys did each user complete").

    One aggregation per key (``collect_list(struct)`` + in-memory
    ``array_sort`` — per-key data, never a global sort) and one regex
    projection. Per-key sequences must fit an executor's row limits —
    the same constraint MATCH_RECOGNIZE partitions carry. Symbols
    outside ``classes`` map to ``.`` wildcard-breaking ``x``.

    Output: ``(key, n_events, symbols, n_matches)``."""
    sym = None
    for val, ch in classes.items():
        case = F.when(F.col(class_col) == val, F.lit(ch))
        sym = case if sym is None else sym.when(F.col(class_col) == val, F.lit(ch))
    sym = sym.otherwise(F.lit("x"))
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col), F.col(tiebreak_col), sym.alias("ch")))
    )
    seq = F.concat_ws("", F.transform(pairs, lambda p: p["ch"]))
    return (
        df.groupBy(F.col(key_col).alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            seq.alias("symbols"),
        )
        .withColumn(
            "n_matches",
            F.size(F.regexp_extract_all("symbols", F.lit(pattern), F.lit(0))).cast("long"),
        )
    )


def sequence_pattern_count_sql(
    table_sql: str,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    class_col: str,
    classes: dict[str, str],
    pattern: str,
) -> str:
    """DuckDB oracle twin of :func:`sequence_pattern_count`."""
    branches = " ".join(
        f"WHEN {class_col} = '{v}' THEN '{c}'" for v, c in classes.items()
    )
    return f"""
SELECT {key_col} AS key,
       COUNT(*) AS n_events,
       string_agg(CASE {branches} ELSE 'x' END, ''
                  ORDER BY {ts_col}, {tiebreak_col}) AS symbols,
       CAST(len(regexp_extract_all(
           string_agg(CASE {branches} ELSE 'x' END, ''
                      ORDER BY {ts_col}, {tiebreak_col}),
           '{pattern}')) AS BIGINT) AS n_matches
FROM ({table_sql}) GROUP BY {key_col}
"""


def bounded_funnel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    class_col: str,
    stages: list[str],
    hop_seconds: int,
) -> DataFrame:
    """Conversion-window funnel: stage N+1 must occur AFTER the row's
    stage-N event and within ``hop_seconds`` of it — the
    product-analytics funnel where late conversions don't count
    (``funnel_stages`` is its unbounded cousin). Each hop attaches the
    FIRST qualifying next-stage event (min (ts, id) struct — exact and
    tie-stable).

    Plan shape per hop: equi-join on the key with the time bound as a
    join condition, then a min-struct aggregate per current-stage
    event. Per-key data only — at 100 TB the same join runs bucketed
    by (key, time-bucket) exactly like ``range_join``; nothing is
    global.

    Output: ``(key, n_stage0, n_reached_1, ..., n_reached_k)`` — how
    many stage-0 events converted through each subsequent hop within
    every per-hop window."""
    us = F.unix_micros(F.col(ts_col))
    bound = hop_seconds * 1_000_000
    ev = df.select(
        F.col(key_col).alias("key"),
        us.alias("us"),
        F.col(id_col).alias("id"),
        F.col(class_col).alias("cls"),
    )
    cur = ev.filter(F.col("cls") == stages[0]).select(
        "key", F.col("us").alias("us0"), F.col("id").alias("id0")
    )
    out_aggs = [
        F.count(F.lit(1)).alias("n_stage0"),
    ]
    frames = [cur]
    for i, stage in enumerate(stages[1:], start=1):
        nxt = ev.filter(F.col("cls") == stage).select(
            F.col("key").alias("__k"),
            F.col("us").alias("__nus"),
            F.col("id").alias("__nid"),
        )
        prev_us = f"us{i - 1}"
        joined = frames[-1].join(
            nxt,
            (F.col("key") == F.col("__k"))
            & (F.col("__nus") > F.col(prev_us))
            & (F.col("__nus") <= F.col(prev_us) + bound),
        )
        first = (
            joined.groupBy("key", *[f"us{j}" for j in range(i)],
                           *[f"id{j}" for j in range(i)])
            .agg(F.min(F.struct(F.col("__nus"), F.col("__nid"))).alias("__f"))
            .select(
                "key",
                *[f"us{j}" for j in range(i)],
                *[f"id{j}" for j in range(i)],
                F.col("__f.__nus").alias(f"us{i}"),
                F.col("__f.__nid").alias(f"id{i}"),
            )
        )
        frames.append(first)
    base = frames[0].groupBy("key").agg(F.count(F.lit(1)).alias("n_stage0"))
    out = base
    for i in range(1, len(stages)):
        reached = frames[i].groupBy("key").agg(
            F.count(F.lit(1)).alias(f"n_reached_{i}")
        )
        out = out.join(reached, "key", "left").fillna(0, [f"n_reached_{i}"])
    return out.withColumnRenamed("key", key_col)


def bounded_funnel_sql(
    table_sql: str,
    key_col: str,
    ts_col: str,
    id_col: str,
    class_col: str,
    stages: list[str],
    hop_seconds: int,
) -> str:
    """DuckDB oracle twin of :func:`bounded_funnel`."""
    bound = hop_seconds * 1_000_000
    ctes = [
        f"""ev AS (
  SELECT {key_col} AS key, epoch_us({ts_col}) AS us, {id_col} AS id,
         {class_col} AS cls
  FROM ({table_sql})
)""",
        f"s0 AS (SELECT key, us AS us0, id AS id0 FROM ev WHERE cls = '{stages[0]}')",
    ]
    for i, stage in enumerate(stages[1:], start=1):
        prev_cols = ", ".join(
            [f"us{j}" for j in range(i)] + [f"id{j}" for j in range(i)]
        )
        # partition by EVERY prior stage column: two distinct stage-0
        # events may share the same first next-stage event and must
        # each keep their own funnel row
        part = ", ".join(
            ["p.key"]
            + [f"p.us{j}" for j in range(i)]
            + [f"p.id{j}" for j in range(i)]
        )
        ctes.append(
            f"""s{i} AS (
  SELECT key, {prev_cols}, us{i}, id{i} FROM (
    SELECT p.key, {', '.join(f'p.us{j}' for j in range(i))},
           {', '.join(f'p.id{j}' for j in range(i))},
           n.us AS us{i}, n.id AS id{i},
           ROW_NUMBER() OVER (PARTITION BY {part}
                              ORDER BY n.us, n.id) AS rn
    FROM s{i - 1} p JOIN ev n
      ON n.key = p.key AND n.cls = '{stage}'
     AND n.us > p.us{i - 1} AND n.us <= p.us{i - 1} + {bound}) t
  WHERE rn = 1
)"""
        )
    reach_joins = "\n".join(
        f"LEFT JOIN (SELECT key, COUNT(*) AS n_reached_{i} FROM s{i} GROUP BY key)"
        f" r{i} USING (key)"
        for i in range(1, len(stages))
    )
    reach_cols = ", ".join(
        f"CAST(COALESCE(n_reached_{i}, 0) AS BIGINT) AS n_reached_{i}"
        for i in range(1, len(stages))
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT key AS {key_col}, n_stage0, {reach_cols}
FROM (SELECT key, COUNT(*) AS n_stage0 FROM s0 GROUP BY key) b
{reach_joins}
"""
    )


def clamped_running_balance(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    delta_col,
) -> DataFrame:
    """Running balance clamped at zero — inventory/credit semantics
    (``b_t = max(0, b_{t−1} + Δ_t)``), which LOOKS like it needs
    sequential state but reduces to two windows via the identity
    ``b_t = prefix_t − min(0, min_{j≤t} prefix_j)``: the clamp only
    ever "absorbs" the deepest deficit seen so far. Both engines
    evaluate the cumulative sums over the identical total order
    (ts, tiebreak), so even double arithmetic is engine-exact
    (sequential left-to-right adds, same operands).

    Output: per row ``(key, tiebreak, delta, balance)``.

    NB: windowed SUM over doubles is NOT engine-exact (DuckDB's
    segment-tree frames associate differently than Spark's running
    accumulator), so the prefix runs in DECIMAL(38,10) — exact and
    associative — and only the final balance drops to double."""
    w = Window.partitionBy("__k").orderBy("__ts", "__t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    base = df.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.col(tiebreak_col).alias("__t"),
        delta_col.cast("double").alias("__d"),
    )
    prefix = F.sum(F.col("__d").cast("decimal(38,10)")).over(w)
    ranked = base.withColumn("__p", prefix).withColumn(
        "__runmin", F.min("__p").over(w)
    )
    # Two DuckDB-compat constraints mirrored here: operands narrowed
    # to DECIMAL(28,10) (a (38,10)−(38,10) difference overflows 38
    # digits and silently promotes to DOUBLE), and the min(0, x) spelled
    # as CASE (DuckDB's least() returns DOUBLE for decimal inputs).
    neg_part = F.when(F.col("__runmin") < 0, F.col("__runmin")).otherwise(
        F.lit(0)
    ).cast("decimal(28,10)")
    return ranked.select(
        F.col("__k").alias(key_col),
        F.col("__t").alias(tiebreak_col),
        F.col("__d").alias("delta"),
        (F.col("__p").cast("decimal(28,10)") - neg_part)
        .cast("double")
        .alias("balance"),
    )


def clamped_running_balance_sql(
    table_sql: str,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    delta_expr: str,
) -> str:
    """DuckDB oracle twin of :func:`clamped_running_balance`."""
    return f"""
WITH base AS (
  SELECT {key_col} AS k, {ts_col} AS ts, {tiebreak_col} AS t,
         CAST({delta_expr} AS DOUBLE) AS d
  FROM ({table_sql})
),
pre AS (
  SELECT k, ts, t, d,
         SUM(CAST(d AS DECIMAL(38,10))) OVER (PARTITION BY k ORDER BY ts, t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM base
),
runm AS (
  SELECT k, t, d, p,
         MIN(p) OVER (PARTITION BY k ORDER BY ts, t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmin
  FROM pre
)
SELECT k AS {key_col}, t AS {tiebreak_col}, d AS delta,
       CAST(CAST(CAST(p AS DECIMAL(28,10))
                 - CAST(CASE WHEN runmin < 0 THEN runmin ELSE 0 END
                        AS DECIMAL(28,10)) AS VARCHAR)
            AS DOUBLE) AS balance
FROM runm
"""


def km_survival(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    class_col: str,
    terminal_class: str,
    cohort_col,
) -> DataFrame:
    """Kaplan-Meier final survival probability per cohort — survival
    analysis as a relational program: each key's duration runs from
    its first to its last event; the last event being
    ``terminal_class`` marks the event observed, anything else is
    right-censored. S = ∏(1 − dᵢ/nᵢ) over event times, with the
    product evaluated as a canonical (sorted) fold so both engines
    multiply the identical IEEE sequence — the multiplicative sibling
    of the sorted-sum convention.

    Shape: one per-key reduce, one (cohort, duration) aggregate, one
    cumulative window for the at-risk counts, one fold per cohort —
    everything partitioned by cohort.

    Output: ``(cohort, n_keys, n_observed, final_survival)``."""
    us = F.unix_micros(F.col(ts_col))
    per_key = (
        df.select(
            F.col(key_col).alias("__k"),
            cohort_col.alias("cohort"),
            us.alias("__us"),
            F.col(class_col).alias("__cls"),
        )
        .groupBy("__k", "cohort")
        .agg(
            # Exact integer division (`div`): double-divide-then-cast
            # truncates while DuckDB's BIGINT cast rounds-to-nearest, so
            # per-key durations with >=0.5s fractional residue would
            # differ between engines (same hazard as q_interarrival).
            F.expr("(max(__us) - min(__us)) div 1000000").alias("dur"),
            F.max(F.struct(F.col("__us"), F.col("__cls")))["__cls"].alias("__last"),
        )
        .withColumn("obs", (F.col("__last") == terminal_class).cast("long"))
    )
    cnt = per_key.groupBy("cohort", "dur").agg(
        F.count(F.lit(1)).alias("n_all"), F.sum("obs").alias("n_obs")
    )
    w = Window.partitionBy("cohort").orderBy("dur")
    risk = cnt.withColumn(
        "__before",
        F.coalesce(
            F.sum("n_all").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).withColumn(
        "__n_total", F.sum("n_all").over(Window.partitionBy("cohort"))
    )
    at_risk = F.col("__n_total") - F.col("__before")
    factored = risk.withColumn(
        "factor",
        F.when(
            F.col("n_obs") > 0,
            (at_risk - F.col("n_obs")).cast("double") / at_risk.cast("double"),
        ),
    )
    folded = factored.groupBy("cohort").agg(
        F.max("__n_total").alias("n_keys"),
        F.sum("n_obs").alias("n_observed"),
        F.aggregate(
            F.concat(
                F.array_sort(
                    F.filter(F.collect_list("factor"), lambda x: x.isNotNull())
                ),
                F.array(F.lit(1.0)),
            ),
            F.lit(1.0),
            lambda a, x: a * x,
        ).alias("final_survival"),
    )
    return folded


def km_survival_sql(
    table_sql: str,
    key_col: str,
    ts_col: str,
    class_col: str,
    terminal_class: str,
    cohort_expr: str,
) -> str:
    """DuckDB oracle twin of :func:`km_survival`."""
    return f"""
WITH base AS (
  SELECT {key_col} AS k, {cohort_expr} AS cohort, epoch_us({ts_col}) AS us,
         {class_col} AS cls
  FROM ({table_sql})
),
per_key AS (
  SELECT k, cohort,
         (MAX(us) - MIN(us)) // 1000000 AS dur,
         CASE WHEN MAX(struct_pack(us := us, cls := cls)).cls = '{terminal_class}'
              THEN 1 ELSE 0 END AS obs
  FROM base GROUP BY k, cohort
),
cnt AS (
  SELECT cohort, dur, COUNT(*) AS n_all, SUM(obs) AS n_obs
  FROM per_key GROUP BY cohort, dur
),
risk AS (
  SELECT cohort, dur, n_all, n_obs,
         COALESCE(SUM(n_all) OVER (PARTITION BY cohort ORDER BY dur
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before_n,
         SUM(n_all) OVER (PARTITION BY cohort) AS n_total
  FROM cnt
),
factored AS (
  SELECT cohort, n_total, n_obs,
         CASE WHEN n_obs > 0
              THEN CAST(n_total - before_n - n_obs AS DOUBLE)
                   / CAST(n_total - before_n AS DOUBLE) END AS factor
  FROM risk
)
SELECT cohort, CAST(MAX(n_total) AS BIGINT) AS n_keys,
       CAST(SUM(n_obs) AS BIGINT) AS n_observed,
       list_reduce(
         list_append(list_sort(list(factor) FILTER (WHERE factor IS NOT NULL)), 1.0),
         (a, b) -> a * b) AS final_survival
FROM factored GROUP BY cohort
"""


def cumulative_distinct(df: DataFrame, key_col: str, ts_col: str) -> DataFrame:
    """Daily new-entity counts and the running cumulative-distinct
    curve — "how many users have we EVER seen as of each day", the
    growth number an exact windowed COUNT(DISTINCT) cannot express
    without quadratic state.

    Relational rewrite: cumulative distinct as-of day d = number of
    keys whose FIRST appearance is ≤ d, so one min-aggregate per key
    (map-combinable, shuffle ∝ distinct keys) collapses the problem
    to a per-day new-key count, and the curve is a running sum over
    the per-DAY relation — bounded by the calendar, not the data, so
    the unpartitioned window is a constant-size merge at any corpus
    size.  Exact integers everywhere.

    Returns (day, n_new, cum_distinct) — one row per day that
    introduced at least one new key.
    """
    first = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.min(F.to_date(ts_col)).alias("day")
    )
    # A key whose events ALL have NULL timestamps yields a NULL day —
    # and Spark's window ORDER BY puts NULLs FIRST while DuckDB's puts
    # them LAST, so the running sum would diverge on every row.  Drop
    # NULL days on BOTH engines (ADVICE r8); keys with at least one
    # non-null ts keep their min non-null day (both MINs skip NULLs).
    daily = first.filter(F.col("day").isNotNull()).groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        # TIMESTAMP, not DATE: Spark DATE lands as python date objects
        # while DuckDB DATE lands as datetime64 — the driver's hash
        # compare sees different normal forms (standing convention)
        F.col("day").cast("timestamp").alias("day"),
        "n_new",
        F.sum("n_new").over(w).cast("bigint").alias("cum_distinct"),
    )


def cumulative_distinct_sql(source_sql: str, key_col: str, ts_col: str) -> str:
    return f"""
WITH first_seen AS (
  SELECT {key_col} AS k, MIN(CAST({ts_col} AS DATE)) AS day
  FROM ({source_sql}) GROUP BY {key_col}
),
daily AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new FROM first_seen
  WHERE day IS NOT NULL GROUP BY day
)
SELECT CAST(day AS TIMESTAMP) AS day, n_new,
       CAST(SUM(n_new) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_distinct
FROM daily
"""


def decayed_engagement(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    horizon: str,
    half_life_days: int = 7,
    max_buckets: int = 8,
) -> DataFrame:
    """Recency-decayed engagement score with EXACT integer arithmetic:
    each event's value counts at weight 2^-(age div half_life) — one
    halving per elapsed half-life bucket — so recent activity
    dominates without any transcendental function entering the plan
    (libm exp/ln are not bit-portable across engines; dyadic weights
    are exact in any arithmetic).

    Values are floored to milli-units (floor on BOTH engines — a raw
    cast truncates on Spark but rounds on DuckDB), each term is the
    exact BIGINT ``value_milli << (max_buckets - bucket)``, and the
    aggregate is one map-combinable DECIMAL sum per group.  The
    reported ``decayed_milli`` is the floor-normalized score
    (scaled sum div 2^max_buckets); ages beyond ``max_buckets``
    half-lives fold into the final bucket (weight ~0 either way), and
    events AFTER the horizon (clock skew, late files) clamp to age 0
    = weight 1 — never a weight above 1.  NULL values are dropped.

    Returns (group, n_events, decayed_milli_scaled, decayed_milli).
    """
    # clamp the age at BOTH ends: an event after the horizon (clock
    # skew, late file) would otherwise get a weight ABOVE 1 that
    # doubles per half-life into the future — and far enough out the
    # engines diverge (Spark shiftleft wraps the shift mod 64 while
    # DuckDB raises Out of Range). Future events count at weight 1.
    shift = (
        F.lit(max_buckets)
        - F.least(
            F.greatest(
                F.expr(
                    f"datediff(CAST('{horizon}' AS DATE),"
                    f" CAST({ts_col} AS DATE)) div {half_life_days}"
                ),
                F.lit(0),
            ),
            F.lit(max_buckets),
        )
    ).cast("int")
    term = F.expr(
        "shiftleft(CAST(floor(__v * 1000) AS BIGINT), __shift)"
    )
    base = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(group_col).alias("__g"),
            F.col(value_col).cast("double").alias("__v"),
            shift.alias("__shift"),
        )
        .withColumn("__term", term)
    )
    return (
        base.groupBy("__g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("__term").cast("decimal(28,0)"))
            .cast("decimal(38,0)")
            .alias("__scaled"),
        )
        .select(
            F.col("__g").alias(group_col),
            "n_events",
            F.col("__scaled").cast("bigint").alias("decayed_milli_scaled"),
            # integer div AFTER the BIGINT cast: DuckDB's // on a
            # DECIMAL operand is true division (-5.0 // 2 = -2.5),
            # only BIGINT // BIGINT matches Spark's div exactly
            F.expr(
                f"CAST(__scaled AS BIGINT) div {1 << max_buckets}"
            ).cast("bigint").alias("decayed_milli"),
        )
    )


def decayed_engagement_sql(
    source_sql: str,
    group_col: str,
    ts_col: str,
    value_col: str,
    horizon: str,
    half_life_days: int = 7,
    max_buckets: int = 8,
) -> str:
    bucket = (
        f"LEAST(GREATEST(date_diff('day', CAST({ts_col} AS DATE),"
        f" CAST('{horizon}' AS DATE)), 0) // {half_life_days},"
        f" {max_buckets})"
    )
    return f"""
WITH base AS (
  SELECT {group_col} AS g,
         CAST(FLOOR(CAST({value_col} AS DOUBLE) * 1000) AS BIGINT)
           << ({max_buckets} - {bucket}) AS term
  FROM ({source_sql})
  WHERE {value_col} IS NOT NULL
),
agg AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(term AS DECIMAL(28,0))) AS DECIMAL(38,0)) AS scaled
  FROM base GROUP BY g
)
SELECT g AS {group_col}, n_events,
       CAST(scaled AS BIGINT) AS decayed_milli_scaled,
       CAST(CAST(scaled AS BIGINT) // {1 << max_buckets} AS BIGINT)
         AS decayed_milli
FROM agg
"""


def position_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    key_cols: list[str],
    conv_id: str,
    conv_ts: str,
    touch_ts: str,
    channel_col: str,
    touch_tiebreak: str,
    lookback_seconds: float = 86400.0,
) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution with EXACT
    integer credit: each conversion distributes 1000 milli-credits
    over its touch path inside the lookback window — 400 to the first
    touch, 400 to the last, 200 split across the middles (single
    touch: 1000; two touches: 500/500).  Integer splits floor-divide;
    the remainder of the middle pool goes to the LAST touch, so every
    conversion's credits sum to exactly 1000 — the invariant the
    last-touch report can't offer multi-touch buyers.

    Conversions with no touch in the window credit 1000 to channel
    'none', keeping the report conversion-complete.

    Plan: one equi-join on the entity key with the time-window filter
    riding it (a hash join, never a product join), per-conversion
    rank/count windows (partitioned by the conversion id — bounded by
    the path length), one aggregate per channel.

    Returns (channel, n_touches, credit_milli).
    """
    conv = conversions.select(
        *[F.col(c) for c in key_cols],
        F.col(conv_id).alias("__cid"),
        F.col(conv_ts).alias("__cts"),
    )
    t = touches.select(
        *[F.col(c) for c in key_cols],
        F.col(touch_ts).alias("__tts"),
        F.col(channel_col).alias("__ch"),
        F.col(touch_tiebreak).alias("__tb"),
    )
    # Exact integer microseconds for the lookback boundary — the twin
    # compares epoch_us, and a double epoch-seconds comparison can flip
    # inclusion by one ulp for sub-second timestamps landing exactly on
    # the boundary (ADVICE r8).
    lookback_us = int(lookback_seconds * 1_000_000)
    joined = conv.join(t, key_cols).filter(
        (F.col("__tts") <= F.col("__cts"))
        & (
            F.unix_micros(F.col("__tts"))
            >= F.unix_micros(F.col("__cts")) - F.lit(lookback_us)
        )
    )
    w = Window.partitionBy("__cid").orderBy(
        F.col("__tts").asc(), F.col("__tb").asc()
    )
    wc = Window.partitionBy("__cid")
    ranked = joined.select(
        "__cid",
        "__ch",
        F.row_number().over(w).alias("__pos"),
        F.count(F.lit(1)).over(wc).alias("__n"),
    )
    credit = F.expr(
        """
        CASE WHEN __n = 1 THEN 1000
             WHEN __n = 2 THEN 500
             WHEN __pos = 1 THEN 400
             WHEN __pos = __n THEN 400 + 200 % (__n - 2)
             ELSE 200 div (__n - 2) END
        """
    ).cast("bigint")
    attributed = ranked.select("__cid", "__ch", credit.alias("__credit"))
    none_rows = (
        conv.join(
            attributed.select("__cid").distinct(), "__cid", "left_anti"
        )
        .select(
            F.lit("none").alias("__ch"),
            F.lit(1000).cast("bigint").alias("__credit"),
        )
    )
    return (
        attributed.select("__ch", "__credit")
        .unionByName(none_rows)
        .groupBy(F.col("__ch").alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum("__credit").cast("bigint").alias("credit_milli"),
        )
    )


def position_attribution_sql(
    conversions_sql: str,
    touches_sql: str,
    key_cols: list[str],
    conv_id: str,
    conv_ts: str,
    touch_ts: str,
    channel_col: str,
    touch_tiebreak: str,
    lookback_seconds: float = 86400.0,
) -> str:
    keys = ", ".join(key_cols)
    on = " AND ".join(f"t.{c} = c.{c}" for c in key_cols)
    us = int(lookback_seconds * 1_000_000)
    return f"""
WITH c AS (
  SELECT {keys}, {conv_id} AS cid, make_timestamp(epoch_us({conv_ts})) AS cts
  FROM ({conversions_sql})
),
t AS (
  SELECT {keys}, make_timestamp(epoch_us({touch_ts})) AS tts,
         {channel_col} AS ch, {touch_tiebreak} AS tb
  FROM ({touches_sql})
),
joined AS (
  SELECT c.cid, t.ch,
         ROW_NUMBER() OVER (PARTITION BY c.cid
                            ORDER BY t.tts ASC, t.tb ASC) AS pos,
         COUNT(*) OVER (PARTITION BY c.cid) AS n
  FROM c JOIN t ON {on}
   AND t.tts <= c.cts AND epoch_us(t.tts) >= epoch_us(c.cts) - {us}
),
credited AS (
  SELECT cid, ch,
         CAST(CASE WHEN n = 1 THEN 1000
                   WHEN n = 2 THEN 500
                   WHEN pos = 1 THEN 400
                   WHEN pos = n THEN 400 + 200 % (n - 2)
                   ELSE 200 // (n - 2) END AS BIGINT) AS credit
  FROM joined
),
none_rows AS (
  SELECT 'none' AS ch, CAST(1000 AS BIGINT) AS credit
  FROM c LEFT JOIN (SELECT DISTINCT cid FROM credited) a ON a.cid = c.cid
  WHERE a.cid IS NULL
),
unioned AS (
  SELECT ch, credit FROM credited UNION ALL SELECT ch, credit FROM none_rows
)
SELECT ch AS channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(credit) AS BIGINT) AS credit_milli
FROM unioned GROUP BY ch
"""


def rfm_scores(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    n_tiles: int = 5,
) -> DataFrame:
    """RFM segmentation — per-entity Recency / Frequency / Monetary
    quintile scores, the classic activity-vs-value grid a retention
    pipeline cuts its audiences by.

    Per user: recency_days = days from the user's last event DATE to
    the corpus's last event date (the deterministic "as of the data"
    anchor — wall-clock would make the result time-dependent),
    frequency = event count, monetary_milli = the DECIMAL(38,10) value
    sum floored to exact milli units (NULL values contribute nothing;
    an all-NULL user scores 0).  Each dimension then takes an exact
    rank-based tile: tile = 1 + (n_tiles·(rank−1)) div n_users over
    the strict total order (metric, user id) — ranks come from
    ``operators.scale.ranged_rank``, the two-phase bucketed global
    row_number, so NO single-partition window exists at any user
    count.  rfm_code = 100·r + 10·f + m.

    Ties break by user id identically on both engines, so tiles are
    bit-stable.  Events with NULL user or NULL timestamp are dropped
    (the cumulative-distinct NULL rule).

    Returns (user_id, recency_days, frequency, monetary_milli, r_tile,
    f_tile, m_tile, rfm_code) — one row per user.
    """
    from gis_city_county_spark.operators.scale import ranged_rank

    base = df.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("__u"),
        F.to_date(ts_col).alias("__d"),
        F.col(value_col).cast("decimal(38,10)").alias("__v"),
    )
    per_user = base.groupBy("__u").agg(
        F.max("__d").alias("__last"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.floor(
            F.coalesce(F.sum("__v"), F.lit(0).cast("decimal(38,10)"))
            .cast("decimal(28,10)") * 1000
        ).cast("bigint").alias("monetary_milli"),
    )
    return rfm_from_per_user(per_user, n_tiles)


def rfm_from_per_user(per_user: DataFrame, n_tiles: int = 5) -> DataFrame:
    """The RFM tile tail from an already-aggregated per-user frame
    ``(__u, __last, frequency, monetary_milli)`` — shared verbatim by
    :func:`rfm_scores` and the streaming twin
    (``streaming/rfm.py``), so the live scores are bit-equal to the
    batch scores by construction."""
    from gis_city_county_spark.operators.scale import ranged_rank

    anchor = per_user.agg(
        F.max("__last").alias("__anchor"),
        F.count(F.lit(1)).cast("bigint").alias("__n_users"),
    )
    # r12: materialize the per-user frame ONCE and run the three tile
    # ranks as independent NARROW passes joined back on user, instead
    # of chaining them — the chained form re-checkpointed and re-sorted
    # an ever-wider frame per tile (each tile's cut-point job replayed
    # the previous tiles' window+join lineage; 21 driver jobs at
    # sf0.1), and each pass carried every column through its window.
    scored = (
        per_user.join(F.broadcast(anchor))
        .select(
            "__u",
            F.datediff("__anchor", "__last").cast("bigint")
            .alias("recency_days"),
            "frequency",
            "monetary_milli",
            "__n_users",
        )
        .localCheckpoint(eager=False)
    )

    def _tile(metric: str, out: str, asc: bool) -> DataFrame:
        ranked = ranged_rank(
            scored.select("__u", metric, "__n_users"),
            metric,
            "__u",
            rank_col="__rk",
            descending=not asc,
        )
        return ranked.select(
            "__u",
            (
                F.lit(1)
                + F.expr(f"({n_tiles} * (__rk - 1)) div __n_users")
            ).cast("bigint").alias(out),
        )

    out = (
        scored
        .join(_tile("recency_days", "r_tile", asc=True), "__u")
        .join(_tile("frequency", "f_tile", asc=False), "__u")
        .join(_tile("monetary_milli", "m_tile", asc=False), "__u")
    )
    return out.select(
        F.col("__u").alias("user_id"),
        "recency_days",
        "frequency",
        "monetary_milli",
        "r_tile",
        "f_tile",
        "m_tile",
        (F.col("r_tile") * 100 + F.col("f_tile") * 10 + F.col("m_tile"))
        .cast("bigint").alias("rfm_code"),
    )


def rfm_scores_sql(
    source_sql: str,
    user_col: str,
    ts_col: str,
    value_col: str,
    n_tiles: int = 5,
) -> str:
    return f"""
WITH base AS (
  SELECT {user_col} AS u, CAST({ts_col} AS DATE) AS d,
         CAST({value_col} AS DECIMAL(38,10)) AS v
  FROM ({source_sql})
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
),
per_user AS (
  SELECT u, MAX(d) AS last_d,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(FLOOR(CAST(COALESCE(SUM(v), 0) AS DECIMAL(28,10)) * 1000)
              AS BIGINT) AS monetary_milli
  FROM base GROUP BY u
),
anchor AS (
  SELECT MAX(last_d) AS anchor_d, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM per_user
),
scored AS (
  SELECT u, CAST(datediff('day', last_d, anchor_d) AS BIGINT)
            AS recency_days,
         frequency, monetary_milli, n_users
  FROM per_user, anchor
),
tiled AS (
  SELECT u, recency_days, frequency, monetary_milli,
         1 + ({n_tiles} * (ROW_NUMBER() OVER (ORDER BY recency_days ASC, u ASC) - 1))
             // n_users AS r_tile,
         1 + ({n_tiles} * (ROW_NUMBER() OVER (ORDER BY frequency DESC, u ASC) - 1))
             // n_users AS f_tile,
         1 + ({n_tiles} * (ROW_NUMBER() OVER (ORDER BY monetary_milli DESC, u ASC) - 1))
             // n_users AS m_tile
  FROM scored
)
SELECT u AS user_id, recency_days, frequency, monetary_milli,
       CAST(r_tile AS BIGINT) AS r_tile,
       CAST(f_tile AS BIGINT) AS f_tile,
       CAST(m_tile AS BIGINT) AS m_tile,
       CAST(r_tile * 100 + f_tile * 10 + m_tile AS BIGINT) AS rfm_code
FROM tiled
"""


def seasonal_baseline(
    df: DataFrame, ts_col: str, top_k: int = 20
) -> DataFrame:
    """Day-of-week × hour seasonal baseline with top anomaly cells —
    the "is this Tuesday 3pm normal for a Tuesday 3pm" monitor.
    Event counts land on the FULL calendar×24 grid (min event date to
    max event date, absent hours count 0 — skipping empty cells would
    bias every baseline upward), each (dow, hour) slot's baseline is
    the exact lower median of its cells' counts, and the report is
    the ``top_k`` cells by absolute deviation from baseline.

    Exact integers end to end: counts are BIGINT, the lower median is
    the ceil(m/2)-th order statistic picked by row_number over the
    strict total order (count, day), deviations are integer
    subtraction.  NULL timestamps are dropped (the r8 NULL-day rule).

    Scale: one map-combinable (day, hour) count; the grid is
    calendar-bounded (days×24 rows at ANY event volume), so the
    median window and the final TakeOrdered run on a constant-size
    relation.  Returns (day, hour, dow, n_events, baseline,
    deviation) — ``top_k`` rows, ties broken by (day, hour).
    """
    ev = df.filter(F.col(ts_col).isNotNull())
    counts = ev.groupBy(
        F.to_date(ts_col).alias("__day"),
        F.hour(ts_col).cast("int").alias("hour"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    return seasonal_from_counts(counts, top_k)


def seasonal_from_counts(counts: DataFrame, top_k: int = 20) -> DataFrame:
    """The baseline/anomaly tail from an already-aggregated
    ``(__day DATE, hour INT, n_events BIGINT)`` relation — shared
    verbatim by :func:`seasonal_baseline` and the streaming twin
    (``streaming/seasonal.py``), so the live report is bit-equal to
    the batch report by construction.  The calendar span derives from
    the counts (every event lands in a cell, so min/max day match the
    raw-event span)."""
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    # counts feeds the span probe AND the grid attach; cells feeds
    # the median window AND the deviation join — materialize each
    # once (guide §3.3; r12-before plan of events_seasonal_baseline:
    # 8 Exchange / 8 parquet scans)
    counts = _materialize_for_multipass(counts)
    span = counts.agg(
        F.min("__day").alias("__lo"),
        F.max("__day").alias("__hi"),
    )
    grid = (
        span.select(
            F.explode(F.sequence("__lo", "__hi")).alias("__day")
        )
        .select(
            "__day",
            F.explode(F.sequence(F.lit(0), F.lit(23))).alias("__h"),
        )
        .select("__day", F.col("__h").cast("int").alias("hour"))
    )
    cells = _materialize_for_multipass(
        grid.join(counts, ["__day", "hour"], "left")
        .select(
            "__day",
            "hour",
            F.coalesce(F.col("n_events"), F.lit(0).cast("bigint"))
            .alias("n_events"),
            F.weekday(F.col("__day")).cast("int").alias("dow"),
        )
    )
    w = Window.partitionBy("dow", "hour").orderBy(
        F.col("n_events").asc(), F.col("__day").asc()
    )
    wc = Window.partitionBy("dow", "hour")
    med = (
        cells.select(
            "dow", "hour", "n_events",
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(wc).alias("__m"),
        )
        .filter(F.col("__rn") == F.expr("(__m + 1) div 2"))
        .select("dow", "hour", F.col("n_events").alias("baseline"))
    )
    return (
        cells.join(med, ["dow", "hour"])
        .select(
            F.col("__day").cast("timestamp").alias("day"),
            "hour",
            "dow",
            "n_events",
            "baseline",
            (F.col("n_events") - F.col("baseline")).cast("bigint")
            .alias("deviation"),
        )
        .orderBy(
            F.abs(F.col("deviation")).desc(),
            F.col("day").asc(),
            F.col("hour").asc(),
        )
        .limit(top_k)
    )


def seasonal_baseline_sql(source_sql: str, ts_col: str, top_k: int = 20) -> str:
    return f"""
WITH ev AS (
  SELECT {ts_col} AS ts FROM ({source_sql}) WHERE {ts_col} IS NOT NULL
),
counts AS (
  SELECT CAST(ts AS DATE) AS day, CAST(hour(ts) AS INTEGER) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM ev GROUP BY 1, 2
),
span AS (SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
         FROM ev),
grid AS (
  SELECT CAST(d AS DATE) AS day, CAST(h AS INTEGER) AS hour
  FROM span,
       UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS t(d),
       UNNEST(range(24)) AS u(h)
),
cells AS (
  SELECT g.day, g.hour,
         COALESCE(c.n_events, 0) AS n_events,
         CAST(isodow(g.day) - 1 AS INTEGER) AS dow
  FROM grid g LEFT JOIN counts c ON g.day = c.day AND g.hour = c.hour
),
med AS (
  SELECT dow, hour, n_events AS baseline
  FROM (
    SELECT dow, hour, n_events,
           ROW_NUMBER() OVER (PARTITION BY dow, hour
                              ORDER BY n_events ASC, day ASC) AS rn,
           COUNT(*) OVER (PARTITION BY dow, hour) AS m
    FROM cells
  )
  WHERE rn = (m + 1) // 2
)
SELECT CAST(c.day AS TIMESTAMP) AS day, c.hour AS hour, c.dow AS dow,
       c.n_events, m.baseline,
       CAST(c.n_events - m.baseline AS BIGINT) AS deviation
FROM cells c JOIN med m ON c.dow = m.dow AND c.hour = m.hour
ORDER BY ABS(c.n_events - m.baseline) DESC, day ASC, c.hour ASC
LIMIT {top_k}
"""


def stickiness_report(
    df: DataFrame, user_col: str, ts_col: str, window_days: int = 28
) -> DataFrame:
    """DAU over trailing-``window_days`` actives per report day, exact
    ppm — the engagement ratio a growth dashboard tracks.  Both sides
    come from the SAME distinct (user, day) relation; the MAU side is
    a bounded ×``window_days`` explode (the rolling-actives pattern),
    never a range self-join.  Report days past the data horizon have
    no DAU row and are not report days (inner join).

    Returns (report_day, dau, mau{window_days}, stickiness_ppm)."""
    days = df.select(
        F.col(user_col).alias("__u"),
        F.date_trunc("day", F.col(ts_col)).alias("__day"),
    ).distinct()
    return stickiness_from_days(days, window_days)


def stickiness_from_days(days: DataFrame, window_days: int = 28) -> DataFrame:
    """The tail of :func:`stickiness_report` from an already-distinct
    ``(__u, __day)`` relation — shared verbatim by the streaming twin
    (``streaming/stickiness.py``), whose folded state IS that
    relation, so the live report can't drift from the batch
    operator."""
    dau = days.groupBy(F.col("__day").alias("report_day")).agg(
        F.countDistinct("__u").alias("dau")
    )
    spread = days.select(
        "__u", "__day",
        F.explode(F.sequence(F.lit(0), F.lit(window_days - 1)))
        .alias("__off"),
    ).select(
        "__u",
        F.timestamp_add("DAY", F.col("__off"), F.col("__day"))
        .alias("report_day"),
    )
    mau = spread.groupBy("report_day").agg(
        F.countDistinct("__u").alias(f"mau{window_days}")
    )
    return dau.join(mau, "report_day").select(
        "report_day",
        F.col("dau").cast("bigint").alias("dau"),
        F.col(f"mau{window_days}").cast("bigint").alias(f"mau{window_days}"),
        F.expr(f"CAST((1000000 * dau) div mau{window_days} AS BIGINT)")
        .alias("stickiness_ppm"),
    )


def conversion_latency(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    from_event: str,
    to_event: str,
) -> DataFrame:
    """Per-user conversion latency: the first ``to_event`` at or after
    the user's first ``from_event``, in exact integer seconds, with
    the converting user's cohort month — a ``to_event`` BEFORE the
    first ``from_event`` never counts, and non-converting users are
    absent.  Feed the result to ``profile.group_quantiles`` for the
    cohort latency distribution.

    Returns (cohort_month, latency_sec)."""
    s = (
        df.filter(F.col(type_col) == from_event)
        .groupBy(F.col(user_col).alias("__u"))
        .agg(F.min(ts_col).alias("__sts"))
    )
    p = (
        df.filter(F.col(type_col) == to_event)
        .select(F.col(user_col).alias("__u"), F.col(ts_col).alias("__pts"))
        .join(s, "__u")
        .filter(F.col("__pts") >= F.col("__sts"))
        .groupBy("__u")
        .agg(F.min("__pts").alias("__pts"), F.min("__sts").alias("__sts"))
    )
    return p.select(
        F.date_trunc("month", F.col("__sts")).alias("cohort_month"),
        F.expr(
            "CAST((unix_micros(__pts) - unix_micros(__sts))"
            " div 1000000 AS BIGINT)"
        ).alias("latency_sec"),
    )


def hazard_table(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    churn_gap_days: int = 7,
) -> DataFrame:
    """Discrete-time churn hazard table — the life-table form of
    retention analysis (the survival curve's exact-integer sibling:
    Kaplan-Meier multiplies per-day survival factors, which no engine
    reproduces bit-for-bit, so this operator publishes the per-day
    HAZARD components and leaves the product to the consumer).

    Per user: lifetime ``t = datediff(last event day, first event
    day)``.  A user whose last event is within ``churn_gap_days`` of
    the observation horizon (the corpus-wide max day) is CENSORED at
    ``t`` — still alive as far as the data can tell; everyone else
    churned at ``t``.  ``hazard_ppm(t) = 10⁶ · churned(t) div
    at_risk(t)`` with ``at_risk(t) = Σ_{s≥t} ended(s)`` — users
    still under observation at day ``t``.

    Scale shape: ONE map-combinable per-user min/max, a broadcast
    1-row horizon, a per-day aggregate bounded by the CALENDAR, and
    the at-risk suffix sum over those bounded per-day rows (never the
    users).  All integers exact.

    Returns (day_index, n_at_risk, n_churned, n_censored,
    hazard_ppm) ordered by day_index.
    """
    per_user = (
        df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(F.col(user_col).alias("__u"))
        .agg(
            F.min(F.to_date(ts_col)).alias("__first"),
            F.max(F.to_date(ts_col)).alias("__last"),
        )
    )
    return hazard_from_user_spans(per_user, churn_gap_days)


def hazard_from_user_spans(
    per_user: DataFrame, churn_gap_days: int = 7
) -> DataFrame:
    """The tail of :func:`hazard_table` from an already-aggregated
    ``(__u, __first DATE, __last DATE)`` relation — shared verbatim
    by the streaming twin (``streaming/hazard.py``), whose folded
    min/max state IS that relation, so the live life table can't
    drift from the batch operator."""
    per_user = per_user.localCheckpoint(eager=False)
    horizon = per_user.agg(F.max("__last").alias("__hz"))
    pu = per_user.crossJoin(F.broadcast(horizon)).select(
        F.datediff("__last", "__first").cast("bigint").alias("__t"),
        (F.datediff("__hz", "__last") < churn_gap_days).alias("__cens"),
    )
    per_t = pu.groupBy(F.col("__t").alias("day_index")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__ended"),
        F.sum(F.when(~F.col("__cens"), 1).otherwise(0)).cast("bigint")
        .alias("n_churned"),
        F.sum(F.when(F.col("__cens"), 1).otherwise(0)).cast("bigint")
        .alias("n_censored"),
    )
    # Suffix sum over the per-DAY rows — input bounded by the
    # calendar span, not the user count.
    w = (
        Window.orderBy(F.col("day_index").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_t.withColumn(
            "n_at_risk", F.sum("__ended").over(w).cast("bigint")
        )
        .select(
            "day_index",
            "n_at_risk",
            "n_churned",
            "n_censored",
            F.expr(
                "CAST((n_churned * CAST(1000000 AS BIGINT))"
                " div n_at_risk AS BIGINT)"
            ).alias("hazard_ppm"),
        )
        .orderBy("day_index")
    )


def hazard_table_sql(
    source_sql: str,
    user_col: str,
    ts_col: str,
    churn_gap_days: int = 7,
) -> str:
    return f"""
WITH per_user AS MATERIALIZED (
  SELECT {user_col} AS u,
         MIN(CAST({ts_col} AS DATE)) AS f,
         MAX(CAST({ts_col} AS DATE)) AS l
  FROM ({source_sql})
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
  GROUP BY 1
),
hz AS (SELECT MAX(l) AS hz FROM per_user),
pu AS (
  SELECT CAST(date_diff('day', f, l) AS BIGINT) AS t,
         date_diff('day', l, hz) < {churn_gap_days} AS cens
  FROM per_user CROSS JOIN hz
),
per_t AS (
  SELECT t AS day_index,
         CAST(COUNT(*) AS BIGINT) AS ended,
         CAST(SUM(CASE WHEN NOT cens THEN 1 ELSE 0 END) AS BIGINT)
           AS n_churned,
         CAST(SUM(CASE WHEN cens THEN 1 ELSE 0 END) AS BIGINT)
           AS n_censored
  FROM pu GROUP BY 1
)
SELECT day_index,
       CAST(SUM(ended) OVER (ORDER BY day_index DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS n_at_risk,
       n_churned,
       n_censored,
       CAST((n_churned * CAST(1000000 AS BIGINT))
            // (SUM(ended) OVER (ORDER BY day_index DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)) AS BIGINT) AS hazard_ppm
FROM per_t
ORDER BY day_index
"""


def km_curve(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    churn_gap_days: int = 7,
) -> DataFrame:
    """Kaplan-Meier survival curve over the discrete-time life table —
    the retention curve itself: ``S(t) = ∏_{s≤t} (1 − d_s / n_s)``
    with ``d_s`` churned and ``n_s`` at risk on day ``s``.

    :func:`hazard_table` historically left the product to the
    consumer ("no engine reproduces it bit-for-bit") — the
    canonical-order-fold house pattern (``kmeans_refine``) retires
    that caveat for the CALENDAR-bounded day frame: each factor is
    one IEEE division (correctly rounded, engine-identical), the
    prefix product folds the factors in ascending day order on both
    engines (Spark ``aggregate`` over an ordered-window
    ``collect_list``, DuckDB ``list_reduce`` over a windowed
    ``list``), and a fixed-order chain of IEEE multiplies is
    bit-portable.  The per-day factor list is bounded by the calendar
    span, never the users.

    Returns the hazard table plus (km_survival DOUBLE,
    survival_ppm BIGINT) ordered by day_index.
    """
    per_user = (
        df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(F.col(user_col).alias("__u"))
        .agg(
            F.min(F.to_date(ts_col)).alias("__first"),
            F.max(F.to_date(ts_col)).alias("__last"),
        )
    )
    return km_from_user_spans(per_user, churn_gap_days)


def km_from_user_spans(
    per_user: DataFrame, churn_gap_days: int = 7
) -> DataFrame:
    """The tail of :func:`km_curve` from an already-aggregated
    ``(__u, __first DATE, __last DATE)`` relation — shared verbatim
    by the streaming twin (``streaming/km.py``), whose folded min/max
    span state IS that relation (the hazard-twin state), so the live
    survival curve can't drift from the batch operator.  The plan is
    IDENTICAL to the pre-refactor ``km_curve`` (same hazard tail,
    same canonical-order product)."""
    haz = hazard_from_user_spans(per_user, churn_gap_days)
    w = (
        Window.orderBy(F.col("day_index").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    factor = (
        (F.col("n_at_risk") - F.col("n_churned")).cast("double")
        / F.col("n_at_risk").cast("double")
    )
    return (
        haz.withColumn("__f", factor)
        .withColumn("__fs", F.collect_list("__f").over(w))
        .withColumn(
            "km_survival",
            F.expr("aggregate(__fs, CAST(1.0 AS DOUBLE),"
                   " (acc, x) -> acc * x)"),
        )
        .select(
            "day_index",
            "n_at_risk",
            "n_churned",
            "n_censored",
            "km_survival",
            F.floor(F.col("km_survival") * F.lit(1000000.0))
            .cast("bigint").alias("survival_ppm"),
        )
        .orderBy("day_index")
    )


def km_curve_sql(
    source_sql: str,
    user_col: str,
    ts_col: str,
    churn_gap_days: int = 7,
) -> str:
    haz = hazard_table_sql(source_sql, user_col, ts_col, churn_gap_days)
    return f"""
WITH haz AS MATERIALIZED ({haz}),
fs AS (
  SELECT day_index, n_at_risk, n_churned, n_censored,
         list(CAST(n_at_risk - n_churned AS DOUBLE)
              / CAST(n_at_risk AS DOUBLE))
           OVER (ORDER BY day_index ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS factors
  FROM haz
)
SELECT day_index, n_at_risk, n_churned, n_censored,
       list_reduce(factors, (acc, x) -> acc * x) AS km_survival,
       CAST(FLOOR(list_reduce(factors, (acc, x) -> acc * x) * 1000000.0)
            AS BIGINT) AS survival_ppm
FROM fs
ORDER BY day_index
"""


def cusum_changepoint(df: DataFrame, ts_col: str) -> DataFrame:
    """CUSUM level-shift detection over the zero-filled daily volume —
    the classic changepoint screen (Page, 1954) in its exact-integer
    form: with ``D`` calendar days and total volume ``T``, the scaled
    cumulative deviation at day ``i`` is ``cusum_i = D·prefix_i −
    i·T`` (the running sum of ``n_j·D − T`` — per-day deviation from
    the mean, multiplied through by ``D`` so everything stays
    BIGINT).  The most likely single changepoint is the day of
    maximum |cusum| (tie: earliest day); its magnitude normalizes to
    ppm of the total deviation scale ``D·T``.

    Scale shape: one map-combinable per-day count, the zero-filled
    grid, and prefix sums / argmax windows over the CALENDAR-bounded
    day rows — never the events.  All integers exact.

    Returns (day, n_events, cusum_scaled, is_changepoint,
    cusum_abs_ppm) ordered by day.
    """
    counts = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(ts_col).alias("__day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    )
    return cusum_from_day_counts(counts)


def cusum_from_day_counts(counts: DataFrame) -> DataFrame:
    """Shared tail of :func:`cusum_changepoint`: the zero-filled
    calendar grid, scaled cumulative deviations and the argmax flag
    from a SPARSE (__day DATE, __n BIGINT) day-count relation — also
    the publish step of the streaming twin (``streaming.cusum``),
    whose state folds per-batch count partials into exactly this
    relation."""
    span = counts.agg(
        F.min("__day").alias("__lo"), F.max("__day").alias("__hi")
    )
    grid = span.select(F.explode(F.sequence("__lo", "__hi")).alias("__day"))
    days = grid.join(counts, "__day", "left").select(
        "__day",
        F.coalesce("__n", F.lit(0).cast("bigint")).alias("n_events"),
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_pre = Window.orderBy(F.col("__day").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        days.withColumn("__d_total", F.count(F.lit(1)).over(w_all))
        .withColumn("__t_total", F.sum("n_events").over(w_all))
        .withColumn("__i", F.row_number().over(Window.orderBy("__day")))
        .withColumn(
            "cusum_scaled",
            (F.col("__d_total") * F.sum("n_events").over(w_pre)
             - F.col("__i") * F.col("__t_total")).cast("bigint"),
        )
    )
    w_mag = Window.orderBy(
        F.abs(F.col("cusum_scaled")).desc(), F.col("__day").asc()
    )
    return (
        cum.withColumn("__mag_rk", F.row_number().over(w_mag))
        .select(
            F.col("__day").cast("timestamp").alias("day"),
            "n_events",
            "cusum_scaled",
            (F.col("__mag_rk") == 1).alias("is_changepoint"),
            F.expr(
                "CASE WHEN __d_total * __t_total > 0 THEN"
                " (abs(cusum_scaled) * CAST(1000000 AS BIGINT))"
                " div (__d_total * __t_total) ELSE 0 END"
            ).cast("bigint").alias("cusum_abs_ppm"),
        )
        .orderBy("day")
    )


def cusum_changepoint_sql(source_sql: str, ts_col: str) -> str:
    return f"""
WITH counts AS (
  SELECT CAST({ts_col} AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
  FROM ({source_sql}) WHERE {ts_col} IS NOT NULL GROUP BY 1
),
span AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM counts),
grid AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM span
),
days AS MATERIALIZED (
  SELECT g.d, COALESCE(c.n, 0) AS n_events
  FROM grid g LEFT JOIN counts c ON g.d = c.d
),
cum AS (
  SELECT d, n_events,
         COUNT(*) OVER () AS d_total,
         SUM(n_events) OVER () AS t_total,
         ROW_NUMBER() OVER (ORDER BY d) AS i,
         SUM(n_events) OVER (ORDER BY d ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS prefix
  FROM days
),
scored AS (
  SELECT d, n_events,
         CAST(d_total * prefix - i * t_total AS BIGINT) AS cusum_scaled,
         d_total, t_total
  FROM cum
)
SELECT CAST(d AS TIMESTAMP) AS day,
       n_events,
       cusum_scaled,
       ROW_NUMBER() OVER (ORDER BY ABS(cusum_scaled) DESC, d ASC) = 1
         AS is_changepoint,
       CASE WHEN d_total * t_total > 0 THEN
         CAST((ABS(cusum_scaled) * CAST(1000000 AS BIGINT))
              // (d_total * t_total) AS BIGINT)
       ELSE 0 END AS cusum_abs_ppm
FROM scored
ORDER BY day
"""


def daily_mad_anomalies(
    df: DataFrame, ts_col: str, k_milli: int = 3500
) -> DataFrame:
    """Robust daily-volume anomaly flags via median absolute
    deviation — the outlier detector a pipeline-health dashboard
    wants where mean/stddev would be dragged by the very outliers
    being hunted (a single ingestion-spike day inflates σ and hides
    itself; the median and MAD ignore it).

    All statistics use the exact LOWER-median convention over the
    ZERO-FILLED calendar (a day with no events is a 0-count day, not
    a missing row — exactly the anomaly worth flagging), so both
    engines agree bit-for-bit; the flag threshold compares exact
    integers, ``1000·|n − med| > k_milli·MAD`` (default k = 3.5, the
    textbook cut), with the MAD = 0 degenerate falling back to "any
    deviation at all".

    Scale shape: one map-combinable per-day count; every window runs
    over the CALENDAR-bounded day rows, never the events.

    Returns (day, n_events, median_n, abs_deviation, mad,
    is_anomaly) — one row per calendar day, ordered by day.
    """
    counts = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(ts_col).alias("__day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    )
    return mad_from_day_counts(counts, k_milli)


def mad_from_day_counts(counts: DataFrame, k_milli: int = 3500) -> DataFrame:
    """Shared tail of :func:`daily_mad_anomalies`: the zero-filled
    calendar grid, lower-median, MAD and flags from a SPARSE
    (__day DATE, __n BIGINT) day-count relation — also the publish
    step of the streaming twin (``streaming.mad``), whose state folds
    per-batch count partials into exactly this relation.  Every
    window runs over the calendar-bounded day rows, never the
    events."""
    span = counts.agg(
        F.min("__day").alias("__lo"), F.max("__day").alias("__hi")
    )
    grid = span.select(F.explode(F.sequence("__lo", "__hi")).alias("__day"))
    days = (
        grid.join(counts, "__day", "left")
        .select(
            "__day",
            F.coalesce("__n", F.lit(0).cast("bigint")).alias("n_events"),
        )
        .localCheckpoint(eager=False)
    )
    w_ord = Window.orderBy(F.col("n_events").asc(), F.col("__day").asc())
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    med = (
        days.select(
            "n_events",
            F.row_number().over(w_ord).alias("__rn"),
            F.count(F.lit(1)).over(w_all).alias("__m"),
        )
        .filter(F.col("__rn") == F.expr("(__m + 1) div 2"))
        .select(F.col("n_events").alias("__med"))
    )
    devs = days.crossJoin(F.broadcast(med)).select(
        "__day",
        "n_events",
        F.col("__med"),
        F.abs(F.col("n_events") - F.col("__med")).cast("bigint")
        .alias("abs_deviation"),
    ).localCheckpoint(eager=False)
    w_dev = Window.orderBy(
        F.col("abs_deviation").asc(), F.col("__day").asc()
    )
    mad = (
        devs.select(
            "abs_deviation",
            F.row_number().over(w_dev).alias("__rn"),
            F.count(F.lit(1)).over(w_all).alias("__m"),
        )
        .filter(F.col("__rn") == F.expr("(__m + 1) div 2"))
        .select(F.col("abs_deviation").alias("__mad"))
    )
    return (
        devs.crossJoin(F.broadcast(mad))
        .select(
            F.col("__day").cast("timestamp").alias("day"),
            "n_events",
            F.col("__med").alias("median_n"),
            "abs_deviation",
            F.col("__mad").alias("mad"),
            F.expr(
                f"CASE WHEN __mad > 0 THEN"
                f" 1000 * abs_deviation > {k_milli} * __mad"
                f" ELSE abs_deviation > 0 END"
            ).alias("is_anomaly"),
        )
        .orderBy("day")
    )


def daily_mad_anomalies_sql(
    source_sql: str, ts_col: str, k_milli: int = 3500
) -> str:
    return f"""
WITH counts AS (
  SELECT CAST({ts_col} AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
  FROM ({source_sql}) WHERE {ts_col} IS NOT NULL GROUP BY 1
),
span AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM counts),
grid AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM span
),
days AS MATERIALIZED (
  SELECT g.d, COALESCE(c.n, 0) AS n_events
  FROM grid g LEFT JOIN counts c ON g.d = c.d
),
med AS (
  SELECT n_events AS med FROM (
    SELECT n_events,
           ROW_NUMBER() OVER (ORDER BY n_events ASC, d ASC) AS rn,
           COUNT(*) OVER () AS m
    FROM days
  ) WHERE rn = (m + 1) // 2
),
devs AS MATERIALIZED (
  SELECT d, n_events, med,
         CAST(ABS(n_events - med) AS BIGINT) AS abs_deviation
  FROM days CROSS JOIN med
),
mad AS (
  SELECT abs_deviation AS mad FROM (
    SELECT abs_deviation,
           ROW_NUMBER() OVER (ORDER BY abs_deviation ASC, d ASC) AS rn,
           COUNT(*) OVER () AS m
    FROM devs
  ) WHERE rn = (m + 1) // 2
)
SELECT CAST(d AS TIMESTAMP) AS day,
       n_events,
       med AS median_n,
       abs_deviation,
       mad,
       CASE WHEN mad > 0 THEN 1000 * abs_deviation > {k_milli} * mad
            ELSE abs_deviation > 0 END AS is_anomaly
FROM devs CROSS JOIN mad
ORDER BY day
"""


def growth_accounting(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Weekly growth accounting (the new / retained / resurrected /
    churned decomposition every growth team reports): a user active
    in week ``w`` is NEW (never active before), RETAINED (active in
    ``w − 1`` week) or RESURRECTED (active before, but not in ``w −
    1``); a user active in ``w`` and not in ``w + 1`` CHURNS in ``w +
    1``.  The identity ``active(w) = active(w−1) + new(w) +
    resurrected(w) − churned(w)`` holds exactly (pinned by test) —
    the property that makes the report self-auditing.

    Churn needs one week of hindsight, so churned counts stop at the
    horizon (the corpus-wide max week): the last active week never
    shows its own churn-out, exactly like the live dashboard.

    Scale shape: one distinct over (user, week), one USER-partitioned
    lag/lead window (each partition a user's own weeks), a 1-row
    broadcast horizon, and per-week count aggregates.  All exact
    integers; weeks stay TIMESTAMP.

    Returns (week, n_active, n_new, n_retained, n_resurrected,
    n_churned) ordered by week.
    """
    weeks = (
        df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("__u"),
            F.date_trunc("week", F.col(ts_col)).alias("__w"),
        )
        .distinct()
    )
    return growth_from_user_weeks(weeks)


def growth_from_user_weeks(weeks: DataFrame) -> DataFrame:
    """The tail of :func:`growth_accounting` from an already-distinct
    ``(__u, __w)`` relation — shared verbatim by the streaming twin
    (``streaming/growth.py``), whose folded state IS that relation,
    so the live report can't drift from the batch operator."""
    weeks = weeks.localCheckpoint(eager=False)
    horizon = weeks.agg(F.max("__w").alias("__hz"))
    wspec = Window.partitionBy("__u").orderBy("__w")
    seq = weeks.select(
        "__u",
        "__w",
        F.lag("__w").over(wspec).alias("__prev"),
        F.lead("__w").over(wspec).alias("__next"),
    )
    active = seq.groupBy(F.col("__w").alias("week")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active"),
        F.sum(F.when(F.col("__prev").isNull(), 1).otherwise(0))
        .cast("bigint").alias("n_new"),
        F.sum(
            F.when(
                F.col("__prev") == F.expr("timestampadd(WEEK, -1, __w)"), 1
            ).otherwise(0)
        ).cast("bigint").alias("n_retained"),
        F.sum(
            F.when(
                F.col("__prev").isNotNull()
                & (F.col("__prev") < F.expr("timestampadd(WEEK, -1, __w)")),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_resurrected"),
    )
    churn = (
        seq.crossJoin(F.broadcast(horizon))
        .filter(
            (
                F.col("__next").isNull()
                | (F.col("__next") > F.expr("timestampadd(WEEK, 1, __w)"))
            )
            & (F.expr("timestampadd(WEEK, 1, __w)") <= F.col("__hz"))
        )
        .groupBy(F.expr("timestampadd(WEEK, 1, __w)").alias("week"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_churned"))
    )
    return (
        active.join(churn, "week", "left")
        .select(
            "week",
            "n_active",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("n_churned", F.lit(0).cast("bigint"))
            .alias("n_churned"),
        )
        .orderBy("week")
    )


def growth_accounting_sql(source_sql: str, user_col: str, ts_col: str) -> str:
    return f"""
WITH weeks AS MATERIALIZED (
  -- CAST back to TIMESTAMP: DuckDB's date_trunc('week', TIMESTAMP)
  -- returns DATE while Spark's stays TIMESTAMP, and the hash compare
  -- sees different normal forms (the calendar-bucket gotcha).
  SELECT DISTINCT {user_col} AS u,
         CAST(date_trunc('week', {ts_col}) AS TIMESTAMP) AS w
  FROM ({source_sql})
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
),
hz AS (SELECT MAX(w) AS hz FROM weeks),
seq AS (
  SELECT u, w,
         LAG(w) OVER (PARTITION BY u ORDER BY w) AS prev,
         LEAD(w) OVER (PARTITION BY u ORDER BY w) AS next
  FROM weeks
),
active AS (
  SELECT w AS week,
         CAST(COUNT(*) AS BIGINT) AS n_active,
         CAST(SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
         CAST(SUM(CASE WHEN prev = w - INTERVAL 7 DAY THEN 1 ELSE 0 END)
              AS BIGINT) AS n_retained,
         CAST(SUM(CASE WHEN prev IS NOT NULL
                        AND prev < w - INTERVAL 7 DAY THEN 1 ELSE 0 END)
              AS BIGINT) AS n_resurrected
  FROM seq GROUP BY w
),
churn AS (
  SELECT w + INTERVAL 7 DAY AS week,
         CAST(COUNT(*) AS BIGINT) AS n_churned
  FROM seq CROSS JOIN hz
  WHERE (next IS NULL OR next > w + INTERVAL 7 DAY)
    AND w + INTERVAL 7 DAY <= hz
  GROUP BY 1
)
SELECT a.week, a.n_active, a.n_new, a.n_retained, a.n_resurrected,
       COALESCE(c.n_churned, 0) AS n_churned
FROM active a LEFT JOIN churn c ON a.week = c.week
ORDER BY a.week
"""


def trend_test(df: DataFrame, ts_col: str) -> DataFrame:
    """Mann-Kendall trend test + Sen's slope over the zero-filled
    daily volume — the nonparametric "is this metric actually
    drifting" screen (monotone-trend power without assuming
    linearity or normality): ``S = Σ_{i<j} sign(n_j − n_i)`` over all
    day pairs, the tie-corrected variance ``18·Var = n(n−1)(2n+5) −
    Σ_t t(t−1)(2t+5)``, the continuity-corrected z (one fixed-order
    IEEE sqrt/divide tail), and Sen's slope as the exact lower-median
    of per-pair integer milli-slopes (sign split from an
    absolute-value floor division so Spark ``div`` and DuckDB ``//``
    agree on negatives).

    Scale shape: every holistic step runs on the CALENDAR-bounded
    day frame — the pair join is days², data-independent and bounded
    by the observation span (≈ 4.5M pairs for 3k days / a decade of
    daily data), never the events; the tie correction folds over the
    DISTINCT-count cells.

    Returns one row: (n_days, s_statistic, var18, z_score,
    sen_slope_milli).
    """
    counts = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(ts_col).alias("__day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    )
    span = counts.agg(
        F.min("__day").alias("__lo"), F.max("__day").alias("__hi")
    )
    grid = span.select(F.explode(F.sequence("__lo", "__hi")).alias("__day"))
    days = (
        grid.join(counts, "__day", "left")
        .select(
            F.coalesce("__n", F.lit(0).cast("bigint")).alias("n_events"),
            F.row_number().over(Window.orderBy("__day")).alias("__i"),
        )
        .localCheckpoint(eager=False)
    )
    a = days.select(F.col("n_events").alias("__na"), F.col("__i").alias("__ia"))
    b = days.select(F.col("n_events").alias("__nb"), F.col("__i").alias("__ib"))
    pairs = a.join(b, F.col("__ib") > F.col("__ia")).select(
        (F.col("__nb") - F.col("__na")).alias("__dn"),
        (F.col("__ib") - F.col("__ia")).alias("__di"),
    ).localCheckpoint(eager=False)
    s_side = pairs.agg(
        F.sum(F.signum("__dn").cast("bigint")).cast("bigint").alias("s_statistic"),
        F.count(F.lit(1)).cast("bigint").alias("__n_pairs"),
    )
    # Tie correction over the distinct-count cells (bounded by the
    # distinct daily volumes, never the days).
    tie_side = (
        days.groupBy("n_events")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__t"))
        .agg(
            F.count(F.lit(1)).alias("__n_cells"),
            F.sum("__t").cast("bigint").alias("n_days"),
            F.sum(F.expr("__t * (__t - 1) * (2 * __t + 5)"))
            .cast("bigint").alias("__tie_corr"),
        )
    )
    slope_milli = (
        F.when(F.col("__dn") < 0, F.lit(-1)).otherwise(F.lit(1)).cast("bigint")
        * F.expr("(1000 * abs(__dn)) div __di")
    )
    ranked = pairs.select(slope_milli.alias("__sl")).select(
        "__sl",
        F.row_number().over(
            Window.orderBy(F.col("__sl").asc())
        ).alias("__rn"),
        F.count(F.lit(1)).over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__m"),
    )
    sen = ranked.filter(
        F.col("__rn") == F.expr("(__m + 1) div 2")
    ).select(F.col("__sl").alias("sen_slope_milli"))
    var18 = F.expr(
        "n_days * (n_days - 1) * (2 * n_days + 5) - __tie_corr"
    ).cast("bigint")
    z = F.expr(
        "CASE WHEN s_statistic > 0 THEN"
        " (CAST(s_statistic AS DOUBLE) - 1.0) / SQRT(CAST(var18 AS DOUBLE) / 18.0)"
        " WHEN s_statistic < 0 THEN"
        " (CAST(s_statistic AS DOUBLE) + 1.0) / SQRT(CAST(var18 AS DOUBLE) / 18.0)"
        " ELSE CAST(0.0 AS DOUBLE) END"
    )
    return (
        s_side.crossJoin(F.broadcast(tie_side))
        .crossJoin(F.broadcast(sen))
        .withColumn("var18", var18)
        .select(
            "n_days",
            "s_statistic",
            "var18",
            F.when(F.col("var18") > 0, z).otherwise(F.lit(0.0))
            .alias("z_score"),
            "sen_slope_milli",
        )
    )


def trend_test_sql(source_sql: str, ts_col: str) -> str:
    return f"""
WITH counts AS (
  SELECT CAST({ts_col} AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
  FROM ({source_sql}) WHERE {ts_col} IS NOT NULL GROUP BY 1
),
span AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM counts),
grid AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM span
),
days AS MATERIALIZED (
  SELECT COALESCE(c.n, 0) AS n_events,
         ROW_NUMBER() OVER (ORDER BY g.d) AS i
  FROM grid g LEFT JOIN counts c ON g.d = c.d
),
pairs AS MATERIALIZED (
  SELECT b.n_events - a.n_events AS dn, b.i - a.i AS di
  FROM days a JOIN days b ON b.i > a.i
),
s_side AS (
  SELECT CAST(SUM(SIGN(dn)) AS BIGINT) AS s_statistic FROM pairs
),
tie_side AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n_days,
         CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_corr
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM days GROUP BY n_events)
),
slopes AS (
  SELECT (CASE WHEN dn < 0 THEN -1 ELSE 1 END)
         * ((1000 * ABS(dn)) // di) AS sl
  FROM pairs
),
sen AS (
  SELECT sl AS sen_slope_milli FROM (
    SELECT sl, ROW_NUMBER() OVER (ORDER BY sl ASC) AS rn,
           COUNT(*) OVER () AS m
    FROM slopes
  ) WHERE rn = (m + 1) // 2
)
SELECT n_days, s_statistic,
       CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_corr AS BIGINT)
         AS var18,
       CASE WHEN n_days * (n_days - 1) * (2 * n_days + 5) - tie_corr > 0
            THEN CASE WHEN s_statistic > 0 THEN
                   (CAST(s_statistic AS DOUBLE) - 1.0)
                   / SQRT(CAST(n_days * (n_days - 1) * (2 * n_days + 5)
                               - tie_corr AS DOUBLE) / 18.0)
                 WHEN s_statistic < 0 THEN
                   (CAST(s_statistic AS DOUBLE) + 1.0)
                   / SQRT(CAST(n_days * (n_days - 1) * (2 * n_days + 5)
                               - tie_corr AS DOUBLE) / 18.0)
                 ELSE CAST(0.0 AS DOUBLE) END
            ELSE CAST(0.0 AS DOUBLE) END AS z_score,
       sen_slope_milli
FROM s_side CROSS JOIN tie_side CROSS JOIN sen
"""


def seasonal_naive_backtest(
    df: DataFrame, ts_col: str, period_days: int = 7
) -> DataFrame:
    """Seasonal-naive forecast backtest over daily volume — the
    baseline every forecasting pipeline must beat, and the
    data-health number that says whether volume is even predictable:
    forecast(d) = actual(d − period), scored on every day that has a
    forecast.  Errors are exact integers: WAPE in ppm
    (Σ|err| / Σactual — the scale-free accuracy number that works
    through zero-volume days where MAPE blows up) and MAE in milli
    units.

    Scale shape: one map-combinable per-day count, the zero-filled
    grid, one lag window over the CALENDAR-bounded day rows, a 1-row
    fold.

    Returns one row: (n_days_scored, total_actual, total_abs_err,
    wape_ppm, mae_milli).
    """
    counts = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(ts_col).alias("__day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    )
    span = counts.agg(
        F.min("__day").alias("__lo"), F.max("__day").alias("__hi")
    )
    grid = span.select(F.explode(F.sequence("__lo", "__hi")).alias("__day"))
    days = grid.join(counts, "__day", "left").select(
        "__day",
        F.coalesce("__n", F.lit(0).cast("bigint")).alias("n_events"),
    )
    w = Window.orderBy(F.col("__day").asc())
    scored = days.select(
        "n_events",
        F.lag("n_events", period_days).over(w).alias("__f"),
    ).filter(F.col("__f").isNotNull())
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days_scored"),
        F.sum("n_events").cast("bigint").alias("total_actual"),
        F.sum(F.abs(F.col("n_events") - F.col("__f"))).cast("bigint")
        .alias("total_abs_err"),
    ).select(
        "n_days_scored",
        "total_actual",
        "total_abs_err",
        F.expr(
            "CASE WHEN total_actual > 0 THEN"
            " (total_abs_err * CAST(1000000 AS BIGINT)) div total_actual"
            " ELSE 0 END"
        ).cast("bigint").alias("wape_ppm"),
        F.expr(
            "CASE WHEN n_days_scored > 0 THEN"
            " (total_abs_err * CAST(1000 AS BIGINT)) div n_days_scored"
            " ELSE 0 END"
        ).cast("bigint").alias("mae_milli"),
    )


def seasonal_naive_backtest_sql(
    source_sql: str, ts_col: str, period_days: int = 7
) -> str:
    return f"""
WITH counts AS (
  SELECT CAST({ts_col} AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
  FROM ({source_sql}) WHERE {ts_col} IS NOT NULL GROUP BY 1
),
span AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM counts),
grid AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM span
),
days AS (
  SELECT g.d, COALESCE(c.n, 0) AS n_events
  FROM grid g LEFT JOIN counts c ON g.d = c.d
),
scored AS (
  SELECT n_events, f FROM (
    SELECT n_events,
           LAG(n_events, {period_days}) OVER (ORDER BY d ASC) AS f
    FROM days
  ) WHERE f IS NOT NULL
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days_scored,
         CAST(SUM(n_events) AS BIGINT) AS total_actual,
         CAST(SUM(ABS(n_events - f)) AS BIGINT) AS total_abs_err
  FROM scored
)
SELECT n_days_scored, total_actual, total_abs_err,
       CASE WHEN total_actual > 0 THEN
         CAST((total_abs_err * CAST(1000000 AS BIGINT)) // total_actual
              AS BIGINT)
       ELSE 0 END AS wape_ppm,
       CASE WHEN n_days_scored > 0 THEN
         CAST((total_abs_err * CAST(1000 AS BIGINT)) // n_days_scored
              AS BIGINT)
       ELSE 0 END AS mae_milli
FROM agg
"""


def pettitt_changepoint(df: DataFrame, ts_col: str) -> DataFrame:
    """Pettitt changepoint test over the zero-filled daily volume —
    the RANK-based single-changepoint screen (Pettitt, 1979) that
    complements :func:`cusum_changepoint`'s mean-shift statistic:
    where CUSUM is dragged by heavy-tailed days, Pettitt only sees
    sign relations, so an ingestion spike can't fake (or mask) a
    level shift.  ``U_t = Σ_{i≤t} Σ_{j>t} sign(x_i − x_j)``; the most
    likely changepoint is the day of maximum |U_t| over t < D (tie:
    earliest day; U_D ≡ 0 by antisymmetry and is excluded).

    Exact-integer and NEVER quadratic in days: instead of the D²
    pair relation (the trend_test shape), the recurrence ``U_t =
    U_{t−1} + V_t`` with ``V_t = Σ_j sign(x_t − x_j) = (#days below
    x_t) − (#days above x_t)`` reads each day's V from one cumulative
    count over the DISTINCT-value cells — a broadcast-joinable
    relation bounded by the distinct daily volumes.  |U| ≤ D²/4, so
    BIGINT holds exactly for any calendar (a century is 3.3·10⁸;
    ×10⁶ for the ppm column still fits).

    Scale shape: one map-combinable per-day count; the value cells,
    their cumulative counts, and the day-order prefix/argmax windows
    are all CALENDAR-bounded — never the events.

    Returns (day, n_events, u_stat, is_changepoint, u_abs_ppm)
    ordered by day, with u_abs_ppm = 4·10⁶·|U_t|/D² (the statistic's
    attainable-maximum normalization).
    """
    counts = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(ts_col).alias("__day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    )
    span = counts.agg(
        F.min("__day").alias("__lo"), F.max("__day").alias("__hi")
    )
    grid = span.select(F.explode(F.sequence("__lo", "__hi")).alias("__day"))
    days = (
        grid.join(counts, "__day", "left")
        .select(
            "__day",
            F.coalesce("__n", F.lit(0).cast("bigint")).alias("n_events"),
        )
        .localCheckpoint(eager=False)
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_vcum = Window.orderBy(F.col("__v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cells = (
        days.groupBy(F.col("n_events").alias("__v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__cnt"))
        .select(
            "__v", "__cnt",
            F.sum("__cnt").over(w_vcum).cast("bigint").alias("__cum"),
            # total days, folded over the CELLS (summing over the
            # joined per-day relation would double-count)
            F.sum("__cnt").over(w_all).cast("bigint").alias("__dtot"),
        )
    )
    w_day = Window.orderBy(F.col("__day").asc())
    w_pre = w_day.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored = (
        days.join(
            F.broadcast(cells), days["n_events"] == cells["__v"], "inner"
        )
        .select(
            "__day",
            "n_events",
            # V_t = (#days strictly below x_t) − (#days strictly above)
            (
                (F.col("__cum") - F.col("__cnt"))
                - (F.col("__dtot") - F.col("__cum"))
            ).cast("bigint").alias("__v_t"),
        )
    )
    u = scored.select(
        "__day",
        "n_events",
        F.sum("__v_t").over(w_pre).cast("bigint").alias("u_stat"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("__d"),
        F.row_number().over(w_day).alias("__i"),
    )
    w_mag = Window.orderBy(
        F.when(F.col("__i") < F.col("__d"), F.abs(F.col("u_stat")))
        .otherwise(F.lit(-1)).desc(),
        F.col("__day").asc(),
    )
    return (
        u.withColumn("__mag_rk", F.row_number().over(w_mag))
        .select(
            F.col("__day").cast("timestamp").alias("day"),
            "n_events",
            "u_stat",
            ((F.col("__mag_rk") == 1) & (F.col("__i") < F.col("__d")))
            .alias("is_changepoint"),
            F.expr(
                "CASE WHEN __d > 1 THEN"
                " (abs(u_stat) * CAST(4000000 AS BIGINT)) div (__d * __d)"
                " ELSE 0 END"
            ).cast("bigint").alias("u_abs_ppm"),
        )
        .orderBy("day")
    )


def pettitt_changepoint_sql(source_sql: str, ts_col: str) -> str:
    return f"""
WITH counts AS (
  SELECT CAST({ts_col} AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
  FROM ({source_sql}) WHERE {ts_col} IS NOT NULL GROUP BY 1
),
span AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM counts),
grid AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM span
),
days AS MATERIALIZED (
  SELECT g.d, COALESCE(c.n, 0) AS n_events
  FROM grid g LEFT JOIN counts c ON g.d = c.d
),
cells AS (
  SELECT v, cnt,
         SUM(cnt) OVER (ORDER BY v ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum,
         SUM(cnt) OVER () AS dtot
  FROM (
    SELECT n_events AS v, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM days GROUP BY 1
  )
),
scored AS (
  SELECT days.d, days.n_events,
         CAST((cum - cnt) - (dtot - cum) AS BIGINT) AS v_t
  FROM days JOIN cells ON days.n_events = cells.v
),
u AS (
  SELECT d, n_events,
         CAST(SUM(v_t) OVER (ORDER BY d ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS u_stat,
         CAST(COUNT(*) OVER () AS BIGINT) AS dd,
         ROW_NUMBER() OVER (ORDER BY d) AS i
  FROM scored
)
SELECT CAST(d AS TIMESTAMP) AS day,
       n_events,
       u_stat,
       (ROW_NUMBER() OVER (ORDER BY CASE WHEN i < dd THEN ABS(u_stat)
                                         ELSE -1 END DESC, d ASC) = 1)
         AND i < dd AS is_changepoint,
       CASE WHEN dd > 1 THEN
         CAST((ABS(u_stat) * CAST(4000000 AS BIGINT)) // (dd * dd)
              AS BIGINT)
       ELSE 0 END AS u_abs_ppm
FROM u
ORDER BY day
"""


def runs_test(df: DataFrame, ts_col: str) -> DataFrame:
    """Wald–Wolfowitz runs test over the zero-filled daily volume —
    the randomness screen a monitoring pipeline runs BEFORE trusting
    any i.i.d.-flavored alert threshold: too few runs of
    above/below-median days means the series is sticky
    (autocorrelated, regime-y), too many means it oscillates; either
    way, daily readings are not independent draws.

    House-exact: the reference level is the exact LOWER-median of the
    day values (the MAD convention); days equal to the median drop
    (Wald–Wolfowitz's original treatment); runs are counted with one
    lag over the CALENDAR-bounded day order.  With ``a`` days above,
    ``b`` below, and ``R`` runs, the z-score uses the exact-integer
    identity ``z = ((R−1)(a+b) − 2ab) · sqrt((a+b−1) /
    (2ab·(2ab−a−b)))`` — every factor a DECIMAL/HUGEINT product of
    counts (2ab·(2ab−a−b) overflows int64 past ~10⁵ days), and the
    closing tail is one IEEE divide + sqrt + multiply in fixed order,
    so both engines emit the same double.  z is NULL when a·b = 0 or
    the variance factor is 0 (a+b ≤ 2·... degenerate two-day
    series).

    Returns one row: (n_days, median_n, n_above, n_below, n_runs,
    z_num, z_score).
    """
    counts = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(F.to_date(ts_col).alias("__day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    )
    span = counts.agg(
        F.min("__day").alias("__lo"), F.max("__day").alias("__hi")
    )
    grid = span.select(F.explode(F.sequence("__lo", "__hi")).alias("__day"))
    days = (
        grid.join(counts, "__day", "left")
        .select(
            "__day",
            F.coalesce("__n", F.lit(0).cast("bigint")).alias("n_events"),
        )
        .localCheckpoint(eager=False)
    )
    w_ord = Window.orderBy(F.col("n_events").asc(), F.col("__day").asc())
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    med = (
        days.select(
            "n_events",
            F.row_number().over(w_ord).alias("__rn"),
            F.count(F.lit(1)).over(w_all).alias("__m"),
        )
        .filter(F.col("__rn") == F.expr("(__m + 1) div 2"))
        .select(F.col("n_events").alias("__med"))
    )
    signs = (
        days.crossJoin(F.broadcast(med))
        .filter(F.col("n_events") != F.col("__med"))
        .select(
            "__day",
            "__med",
            F.when(F.col("n_events") > F.col("__med"), F.lit(1))
            .otherwise(F.lit(-1)).alias("__s"),
        )
    )
    w_day = Window.orderBy(F.col("__day").asc())
    runs = signs.select(
        "__med",
        "__s",
        F.when(
            F.lag("__s").over(w_day).isNull()
            | (F.lag("__s").over(w_day) != F.col("__s")),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("__new_run"),
    )
    agg = runs.agg(
        F.max("__med").cast("bigint").alias("median_n"),
        F.sum(F.when(F.col("__s") > 0, 1).otherwise(0))
        .cast("bigint").alias("n_above"),
        F.sum(F.when(F.col("__s") < 0, 1).otherwise(0))
        .cast("bigint").alias("n_below"),
        F.sum("__new_run").cast("bigint").alias("n_runs"),
    )
    total = days.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    z_num = (
        "(CAST(n_runs - 1 AS DECIMAL(18,0)) * (n_above + n_below)"
        " - 2 * CAST(n_above AS DECIMAL(18,0))"
        " * CAST(n_below AS DECIMAL(18,0)))"
    )
    var_fac = (
        "(2 * CAST(n_above AS DECIMAL(18,0))"
        " * CAST(n_below AS DECIMAL(18,0))"
        " * (2 * CAST(n_above AS DECIMAL(18,0))"
        "    * CAST(n_below AS DECIMAL(18,0))"
        "    - n_above - n_below))"
    )
    return (
        total.crossJoin(F.broadcast(agg))  # two 1-row scalar merges
        .select(
            "n_days",
            "median_n",
            "n_above",
            "n_below",
            "n_runs",
            F.expr(f"CAST({z_num} AS BIGINT)").alias("z_num"),
            F.expr(
                f"CASE WHEN n_above = 0 OR n_below = 0"
                f" OR {var_fac} <= 0 THEN CAST(NULL AS DOUBLE) ELSE"
                f" CAST({z_num} AS DOUBLE)"
                f" * sqrt(CAST(n_above + n_below - 1 AS DOUBLE)"
                f"        / CAST({var_fac} AS DOUBLE)) END"
            ).alias("z_score"),
        )
    )


def runs_test_sql(source_sql: str, ts_col: str) -> str:
    z_num = (
        "(CAST(n_runs - 1 AS HUGEINT) * (n_above + n_below)"
        " - 2 * CAST(n_above AS HUGEINT) * CAST(n_below AS HUGEINT))"
    )
    var_fac = (
        "(2 * CAST(n_above AS HUGEINT) * CAST(n_below AS HUGEINT)"
        " * (2 * CAST(n_above AS HUGEINT) * CAST(n_below AS HUGEINT)"
        "    - n_above - n_below))"
    )
    return f"""
WITH counts AS (
  SELECT CAST({ts_col} AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
  FROM ({source_sql}) WHERE {ts_col} IS NOT NULL GROUP BY 1
),
span AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM counts),
grid AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM span
),
days AS MATERIALIZED (
  SELECT g.d, COALESCE(c.n, 0) AS n_events
  FROM grid g LEFT JOIN counts c ON g.d = c.d
),
med AS (
  SELECT n_events AS med FROM (
    SELECT n_events,
           ROW_NUMBER() OVER (ORDER BY n_events ASC, d ASC) AS rn,
           COUNT(*) OVER () AS m
    FROM days
  ) WHERE rn = (m + 1) // 2
),
signs AS (
  SELECT d, med,
         CASE WHEN n_events > med THEN 1 ELSE -1 END AS s
  FROM days CROSS JOIN med
  WHERE n_events != med
),
runs AS (
  SELECT med, s,
         CASE WHEN LAG(s) OVER (ORDER BY d ASC) IS NULL
                OR LAG(s) OVER (ORDER BY d ASC) != s
              THEN 1 ELSE 0 END AS new_run
  FROM signs
),
agg AS (
  SELECT CAST(MAX(med) AS BIGINT) AS median_n,
         CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_above,
         CAST(SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_below,
         CAST(SUM(new_run) AS BIGINT) AS n_runs
  FROM runs
),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM days)
SELECT n_days, median_n, n_above, n_below, n_runs,
       CAST({z_num} AS BIGINT) AS z_num,
       CASE WHEN n_above = 0 OR n_below = 0 OR {var_fac} <= 0
            THEN CAST(NULL AS DOUBLE) ELSE
         CAST({z_num} AS DOUBLE)
         * sqrt(CAST(n_above + n_below - 1 AS DOUBLE)
                / CAST({var_fac} AS DOUBLE)) END AS z_score
FROM total CROSS JOIN agg
"""
