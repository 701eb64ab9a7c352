"""Deterministic sketches and samples.

Spark ships HLL (``approx_count_distinct``) and quantile sketches, but
their results are implementation-defined — useless for cross-engine
verification and for reproducible pipeline runs. These operators are
the deterministic equivalents a training-data pipeline wants: the same
input always produces the same sample / estimate, on any engine, at
any parallelism, under any partitioning.

* ``kmv_distinct`` — K-Minimum-Values distinct-count estimator
  (Bar-Yossef et al. 2002): hash every value with md5, keep the k
  smallest distinct hashes per group; if fewer than k exist the count
  is exact, else estimate (k-1) / fraction(h_k). Per-group state is
  bounded at k hashes regardless of cardinality.
* ``hash_sample`` — deterministic Bernoulli sample: keep rows whose
  md5(key) falls below ``fraction`` of the hash space. Unlike
  ``df.sample()`` (seeded per-partition RNG — resampling under
  repartition), membership depends only on the key, so the sample is
  stable across runs, engines, and layout changes, and consistent
  across tables sharing the key (sample orders ⇒ their lineitems by
  the same predicate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 60-bit prefix of the md5 as a non-negative long; identical in DuckDB
# via CAST('0x' || substr(md5(x), 1, 15) AS BIGINT).
_SPACE = float(1 << 60)


def _h60(col: Column) -> Column:
    return _hex60(F.md5(col))


def _h60_sql(expr: str) -> str:
    return _hex60_sql(f"md5({expr})")


def _hex60(hexcol: Column) -> Column:
    """First 60 bits of an md5 hex string as a non-negative long."""
    return F.conv(F.substring(hexcol, 1, 15), 16, 10).cast("long")


def _hex60_sql(hex_expr: str) -> str:
    return f"CAST('0x' || substr({hex_expr}, 1, 15) AS BIGINT)"


def kmv_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct estimate: (group..., n_kept, kth_hash,
    distinct_est). Plan: distinct (group, hash) → per-group rank by
    hash → keep k smallest → one-row-per-group aggregate. Both
    shuffles key on the group; the rank window reuses the distinct's
    hash partitioning (Catalyst elides the second exchange)."""
    hashes = df.select(
        *[F.col(c) for c in group_cols],
        # Hash the canonical string form so Spark and any oracle agree
        # bit-for-bit (integers render identically; pass strings for
        # float-valued columns).
        F.md5(F.col(value_col).cast("string")).alias("__h"),
    ).dropDuplicates(group_cols + ["__h"])
    w = Window.partitionBy(*group_cols).orderBy("__h")
    kept = hashes.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    frac = _hex60(F.col("kth_hash")).cast("double") / F.lit(_SPACE)
    return (
        kept.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("__h").alias("kth_hash"))
        .withColumn(
            "distinct_est",
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
                F.lit(float(k - 1)) / frac
            ),
        )
    )


def kmv_distinct_sql(
    table_sql: str, group_cols: list[str], value_col: str, k: int = 64
) -> str:
    keys = ", ".join(group_cols)
    return f"""
WITH hashes AS (
  SELECT DISTINCT {keys}, md5(CAST({value_col} AS VARCHAR)) AS h FROM ({table_sql})
),
ranked AS (
  SELECT {keys}, h,
         ROW_NUMBER() OVER (PARTITION BY {keys} ORDER BY h) AS rn
  FROM hashes
),
kept AS (SELECT * FROM ranked WHERE rn <= {k})
SELECT {keys}, COUNT(*) AS n_kept, MAX(h) AS kth_hash,
       CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
            ELSE {float(k - 1)} / (CAST({_hex60_sql("MAX(h)")} AS DOUBLE) / {_SPACE})
       END AS distinct_est
FROM kept GROUP BY {keys}
"""


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic Bernoulli sample of ~``fraction`` keyed on
    ``key_col``. A filter — pushes down to the scan like any other
    predicate; no shuffle, no RNG state."""
    cut = int(fraction * _SPACE)
    return df.filter(_h60(F.col(key_col).cast("string")) < cut)


def hash_sample_predicate_sql(key_expr: str, fraction: float) -> str:
    cut = int(fraction * _SPACE)
    return f"{_h60_sql(f'CAST({key_expr} AS VARCHAR)')} < {cut}"


def quota_sample(
    df: DataFrame, group_cols: list[str], id_col: str, n_per_group: int
) -> DataFrame:
    """Deterministic per-group quota sample: rank rows inside each
    group by md5(id) (a uniform, engine-independent order) and keep
    the first ``n_per_group`` — the training-mix pattern "at most N
    documents per language/source".

    One shuffle on the group key. For pathologically hot groups,
    pre-filter with :func:`hash_sample` at ~2·n/|group| before the
    exact rank so the window never sorts the full group; the final
    result is identical because both stages use the same hash order.
    """
    order = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*group_cols).orderBy(order, F.col(id_col))
    return df.withColumn("sample_rank", F.row_number().over(w)).filter(
        F.col("sample_rank") <= n_per_group
    )


def quota_sample_sql(
    table_sql: str, group_cols: list[str], id_col: str, n_per_group: int
) -> str:
    keys = ", ".join(group_cols)
    return f"""
SELECT * FROM (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY {keys}
           ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}) AS sample_rank
  FROM ({table_sql})
) WHERE sample_rank <= {n_per_group}
"""


def weighted_hash_sample(
    df: DataFrame, key_col: str, weight: Column
) -> DataFrame:
    """Deterministic weighted Bernoulli sample: keep a row iff its
    hash point ``md5(key)/2^60 ∈ [0,1)`` falls below its (clamped to
    [0,1]) ``weight`` — Poisson-style importance sampling with zero
    RNG state. Like :func:`hash_sample`, membership depends only on
    the key and weight, so the sample is stable across runs, engines,
    partitionings, and incremental rebuilds; unlike it, inclusion
    probability varies per row (e.g. upweight long documents).
    A pure filter: pushes to the scan, no shuffle."""
    u = _h60(F.col(key_col).cast("string")).cast("double") / F.lit(_SPACE)
    w = F.least(F.lit(1.0), F.greatest(F.lit(0.0), weight))
    return df.filter(u < w)


def weighted_hash_sample_predicate_sql(key_expr: str, weight_expr: str) -> str:
    u = f"CAST({_h60_sql(f'CAST({key_expr} AS VARCHAR)')} AS DOUBLE) / {_SPACE}"
    return f"{u} < least(1.0, greatest(0.0, {weight_expr}))"


def kmv_setops(
    df_a: DataFrame, df_b: DataFrame, value_col: str, k: int = 256
) -> DataFrame:
    """Theta/KMV sketch set operations: estimate |A ∪ B|, the Jaccard
    overlap, and |A ∩ B| of two value sets from one k-hash union
    sketch — how "compare two corpora's vocabularies / two days' user
    sets" runs when the sets are billions and an exact distinct-join
    is off the table. Each side is reduced to its distinct md5 hashes
    (bounded per-side state), the union sketch keeps the k smallest,
    and the intersection estimate is the textbook
    ``ρ·|A∪B|`` with ρ = fraction of union-sketch hashes present in
    both sides (Beyer et al., SIGMOD 2007).

    Determinism: md5 hashing, integer ranks, and a fixed expression
    tree for the closing double arithmetic — identical estimates on
    any engine at any parallelism (unlike HLL sketches whose merge is
    implementation-defined).

    Output (one row): ``(n_kept, n_both, union_est, jaccard_est,
    intersect_est)``; estimates are exact when the union has < k
    distinct values.
    """
    ha = df_a.select(F.md5(F.col(value_col).cast("string")).alias("__h")).distinct()
    hb = df_b.select(F.md5(F.col(value_col).cast("string")).alias("__h")).distinct()
    merged = (
        ha.withColumn("__in_a", F.lit(1))
        .join(hb.withColumn("__in_b", F.lit(1)), "__h", "full")
        .select(
            "__h",
            F.coalesce(F.col("__in_a"), F.lit(0)).alias("__in_a"),
            F.coalesce(F.col("__in_b"), F.lit(0)).alias("__in_b"),
        )
    )
    # k smallest hashes via TakeOrderedAndProject (per-partition heaps)
    # — never a global sort; hashes are distinct so the order is total.
    kept = merged.orderBy(F.col("__h").asc()).limit(k)
    agg = kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum((F.col("__in_a") * F.col("__in_b"))).alias("n_both"),
        F.max("__h").alias("__kth"),
    )
    frac = _hex60(F.col("__kth")).cast("double") / F.lit(_SPACE)
    union_est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.lit(float(k - 1)) / frac)
    return agg.select(
        "n_kept",
        "n_both",
        union_est.alias("union_est"),
        (F.col("n_both").cast("double") / F.col("n_kept").cast("double")).alias(
            "jaccard_est"
        ),
        (
            (F.col("n_both").cast("double") / F.col("n_kept").cast("double"))
            * union_est
        ).alias("intersect_est"),
    )


def kmv_setops_sql(a_sql: str, b_sql: str, value_col: str, k: int = 256) -> str:
    """DuckDB oracle twin of :func:`kmv_setops`."""
    kth_frac = f"CAST({_hex60_sql('kth')} AS DOUBLE) / {_SPACE!r}"
    return f"""
WITH ha AS (SELECT DISTINCT md5(CAST({value_col} AS VARCHAR)) AS h FROM ({a_sql})),
hb AS (SELECT DISTINCT md5(CAST({value_col} AS VARCHAR)) AS h FROM ({b_sql})),
merged AS (
  SELECT COALESCE(ha.h, hb.h) AS h,
         CASE WHEN ha.h IS NULL THEN 0 ELSE 1 END AS in_a,
         CASE WHEN hb.h IS NULL THEN 0 ELSE 1 END AS in_b
  FROM ha FULL JOIN hb ON ha.h = hb.h
),
kept AS (
  SELECT * FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM merged)
  WHERE rn <= {k}
),
agg AS (
  SELECT COUNT(*) AS n_kept, SUM(in_a * in_b) AS n_both, MAX(h) AS kth
  FROM kept
)
SELECT CAST(n_kept AS BIGINT) AS n_kept, CAST(n_both AS BIGINT) AS n_both,
       CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
            ELSE {float(k - 1)!r} / ({kth_frac}) END AS union_est,
       CAST(n_both AS DOUBLE) / CAST(n_kept AS DOUBLE) AS jaccard_est,
       (CAST(n_both AS DOUBLE) / CAST(n_kept AS DOUBLE)) *
       (CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
             ELSE {float(k - 1)!r} / ({kth_frac}) END) AS intersect_est
FROM agg
"""


def bitmap_distinct(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    word_bits: int = 63,
) -> DataFrame:
    """EXACT distinct-count via bitmap aggregation — the bitmap-index
    technique warehouses use when ``COUNT(DISTINCT)`` must scale: ids
    bucket into fixed words (``word = id div 63``, ``bit = id mod
    63``), a ``bit_or`` merges each (group, word) into one 64-bit
    lattice value, and the distinct count is the sum of popcounts.

    Why it scales where a shuffle-distinct doesn't: ``bit_or`` is a
    tiny, fully map-side-combinable aggregate — shuffle volume is one
    long per *occupied word* (≤ distinct/63 rows) instead of one row
    per distinct id, and re-aggregation (rollups, incremental refresh)
    can merge saved bitmaps without re-touching the fact table. 63-bit
    words keep the set-bit shift below the sign bit (portable across
    engines that refuse signed-overflow shifts).

    Output: ``(*group_cols, n_distinct)`` — exact, verified against
    ``countDistinct`` in the suite query."""
    word = F.floor(F.col(id_col) / word_bits).alias("__word")
    # F.shiftleft only takes a literal shift; the per-row shift needs
    # the SQL form.
    mask = F.expr(
        f"shiftleft(cast(1 as bigint), cast(pmod({id_col}, {word_bits}) as int))"
    )
    words = df.groupBy(*group_cols, word).agg(F.bit_or(mask).alias("__bm"))
    return words.groupBy(*group_cols).agg(
        F.sum(F.bit_count("__bm")).alias("n_distinct")
    )


def bitmap_distinct_sql(
    source_sql: str, group_cols: list[str], id_col: str, word_bits: int = 63
) -> str:
    keys = ", ".join(group_cols)
    return f"""
WITH words AS (
  SELECT {keys}, CAST(FLOOR({id_col} / {word_bits}) AS BIGINT) AS word,
         bit_or(1::BIGINT << CAST({id_col} % {word_bits} AS INTEGER)) AS bm
  FROM ({source_sql}) GROUP BY {keys}, word
)
SELECT {keys}, CAST(SUM(bit_count(bm)) AS BIGINT) AS n_distinct
FROM words GROUP BY {keys}
"""


# ------------------------------------------------------ count-min sketch

def countmin_cells(
    rows: DataFrame, key_col: str, width: int, depth: int
) -> DataFrame:
    """The (d, b) → cell-count relation of a count-min sketch: each
    key hashes into ``depth`` buckets (md5 seeded per sketch row) and
    the counts aggregate map-side — ≤ d·w cells regardless of key
    cardinality.  Pure projections + one groupBy count, so the SAME
    code path builds the sketch from a batch DataFrame or a streaming
    one (``streaming.sketch.streaming_countmin_cells``) — the batch/
    stream counters are identical by construction."""
    hashed = rows.select(
        F.posexplode(
            F.array(
                *[
                    (_h60(F.concat(F.lit(f"{d}|"), F.col(key_col))) % width)
                    for d in range(depth)
                ]
            )
        ).alias("__d", "__b"),
    )
    return hashed.groupBy("__d", "__b").agg(F.count(F.lit(1)).alias("__cell"))


def countmin_heavy_hitters(
    df: DataFrame,
    key_col: str,
    width: int = 1 << 12,
    depth: int = 4,
    k: int = 20,
) -> DataFrame:
    """Count-min sketch frequency estimation, evaluated against exact
    counts for the top-k heavy hitters — the bounded-memory frequency
    structure a 100 TB stream/batch pipeline keeps per node when exact
    per-key counts don't fit.

    Build: each row hashes into ``depth`` buckets (md5 seeded per
    row-of-sketch); the sketch is a (d, w)-keyed count relation built
    in ONE map-side-combinable aggregate over an explode-by-depth —
    d·w cells max, independent of key cardinality. Estimate for a key
    = min over its d buckets (over-count only, never under).

    Output per top-k exact key: ``(key, exact_cnt, est_cnt,
    overcount)`` — overcount = est − exact ≥ 0 by construction, and
    the whole computation is md5-deterministic, so the DuckDB twin
    matches bit-for-bit."""
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    key = F.col(key_col).cast("string")
    rows = df.select(key.alias("__k"))
    # ONE pass over the raw stream: the exact per-key counts are
    # needed anyway, and every sketch cell equals the sum of its
    # keys' counts — so build the cells FROM the aggregate (counts as
    # weights) instead of re-running the caller's (often
    # tokenize+explode) lineage per consumer (guide §2.3 "aggregate
    # before you shuffle" + §3.3; the r12-before plan evaluated the
    # token stream twice).  Cell values are identical by
    # construction; the streaming path still uses
    # :func:`countmin_cells` over raw rows — same cells either way.
    exact = _materialize_for_multipass(
        rows.groupBy("__k").agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    sketch = (
        exact.select(
            "exact_cnt",
            F.posexplode(
                F.array(
                    *[
                        (_h60(F.concat(F.lit(f"{d}|"), F.col("__k"))) % width)
                        for d in range(depth)
                    ]
                )
            ).alias("__d", "__b"),
        )
        .groupBy("__d", "__b")
        .agg(F.sum("exact_cnt").alias("__cell"))
    )
    topk = exact.orderBy(F.desc("exact_cnt"), F.asc("__k")).limit(k)
    probes = topk.select(
        "__k",
        "exact_cnt",
        F.posexplode(
            F.array(
                *[
                    (_h60(F.concat(F.lit(f"{d}|"), F.col("__k"))) % width)
                    for d in range(depth)
                ]
            )
        ).alias("__d", "__b"),
    )
    est = (
        probes.join(F.broadcast(sketch), ["__d", "__b"])
        .groupBy("__k", "exact_cnt")
        .agg(F.min("__cell").alias("est_cnt"))
    )
    return est.select(
        F.col("__k").alias(key_col),
        "exact_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("exact_cnt")).alias("overcount"),
    )


def countmin_delta(
    df_a: DataFrame,
    df_b: DataFrame,
    key_col: str,
    width: int = 1 << 12,
    depth: int = 4,
    k: int = 20,
) -> DataFrame:
    """Heavy-hitter DRIFT between two periods, answered from two
    count-min sketches — the bounded-memory "what changed since
    yesterday" a 100 TB feed monitor keeps: each period's raw data
    collapses to its own d·w cell table (same seeds, so cells are
    directly comparable), and the per-key change estimate reads ONLY
    the two sketches, never re-scanning either period.

    Estimate per key and period = min over its ``depth`` cells (a
    missing cell is an empty bucket = 0); the drift estimate is
    ``est_b − est_a``, which can over- OR under-state the true change
    (each side over-counts independently) — so the exact per-period
    counts ride along as the audit, for the top-``k`` keys by
    absolute exact change (ties broken by key).  md5-deterministic
    end to end; the DuckDB twin matches bit-for-bit.

    Returns (key, exact_a, exact_b, exact_delta, est_a, est_b,
    est_delta).
    """
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    def _cells_from_exact(ex: DataFrame, cnt_col: str) -> DataFrame:
        # cells from the exact aggregate (counts as weights) — ONE
        # pass per period over the raw rows instead of two (guide
        # §2.3/§3.3, same rewrite as countmin_heavy_hitters); cell
        # values identical by construction.
        return (
            ex.select(
                cnt_col,
                F.posexplode(
                    F.array(
                        *[
                            (_h60(F.concat(F.lit(f"{d}|"), F.col("__k")))
                             % width)
                            for d in range(depth)
                        ]
                    )
                ).alias("__d", "__b"),
            )
            .groupBy("__d", "__b")
            .agg(F.sum(cnt_col).alias("__cell"))
        )

    rows_a = df_a.select(F.col(key_col).cast("string").alias("__k"))
    rows_b = df_b.select(F.col(key_col).cast("string").alias("__k"))
    ex_a = _materialize_for_multipass(
        rows_a.groupBy("__k").agg(
            F.count(F.lit(1)).cast("bigint").alias("exact_a")
        )
    )
    ex_b = _materialize_for_multipass(
        rows_b.groupBy("__k").agg(
            F.count(F.lit(1)).cast("bigint").alias("exact_b")
        )
    )
    sk_a = _cells_from_exact(ex_a, "exact_a")
    sk_b = _cells_from_exact(ex_b, "exact_b")
    return countmin_delta_from_summaries(
        sk_a, ex_a, sk_b, ex_b, key_col, width=width, depth=depth, k=k
    )


def countmin_delta_from_summaries(
    sk_a: DataFrame,
    ex_a: DataFrame,
    sk_b: DataFrame,
    ex_b: DataFrame,
    key_col: str,
    width: int = 1 << 12,
    depth: int = 4,
    k: int = 20,
) -> DataFrame:
    """The drift report of :func:`countmin_delta`, computed from the
    four period summaries directly: ``sk_*`` are (d, b, __cell)
    same-seed sketch cell relations (:func:`countmin_cells` shape) and
    ``ex_*`` are (__k, exact_a/exact_b) exact per-key counts.  The
    batch operator builds these from raw frames; the streaming twin
    (``streaming.sketch.countmin_delta_batch_folder``) folds the live
    period's summaries incrementally and publishes through this SAME
    function, so the streamed report is bit-equal to the batch answer
    run-to-completion by construction."""
    exact = (
        ex_a.join(ex_b, "__k", "full_outer")
        .select(
            "__k",
            F.coalesce("exact_a", F.lit(0)).cast("bigint").alias("exact_a"),
            F.coalesce("exact_b", F.lit(0)).cast("bigint").alias("exact_b"),
        )
        .withColumn("exact_delta", F.col("exact_b") - F.col("exact_a"))
    )
    # TakeOrderedAndProject (no single-partition exchange): input is
    # one row per distinct key, the exact audit's natural bound.
    topk = exact.orderBy(
        F.abs(F.col("exact_delta")).desc(), F.asc("__k")
    ).limit(k)

    probes = topk.select(
        "__k",
        "exact_a",
        "exact_b",
        "exact_delta",
        F.posexplode(
            F.array(
                *[
                    (_h60(F.concat(F.lit(f"{d}|"), F.col("__k"))) % width)
                    for d in range(depth)
                ]
            )
        ).alias("__d", "__b"),
    )

    def _est(sketch, name):
        return (
            probes.join(F.broadcast(sketch), ["__d", "__b"], "left")
            .groupBy("__k")
            .agg(
                F.min(F.coalesce(F.col("__cell"), F.lit(0)))
                .cast("bigint")
                .alias(name)
            )
        )

    return (
        topk.join(_est(sk_a, "est_a"), "__k")
        .join(_est(sk_b, "est_b"), "__k")
        .select(
            F.col("__k").alias(key_col),
            "exact_a",
            "exact_b",
            "exact_delta",
            "est_a",
            "est_b",
            (F.col("est_b") - F.col("est_a")).alias("est_delta"),
        )
    )


def countmin_delta_sql(
    source_a: str,
    source_b: str,
    key_expr: str,
    key_name: str,
    width: int = 1 << 12,
    depth: int = 4,
    k: int = 20,
) -> str:
    """DuckDB oracle twin of :func:`countmin_delta`."""

    def bucket_rows(src: str) -> str:
        return "\n  UNION ALL\n  ".join(
            f"SELECT k, {d} AS d,"
            f" {_h60_sql(repr(f'{d}|') + ' || k')} % {width} AS b"
            f" FROM {src}"
            for d in range(depth)
        )

    return f"""
WITH ka AS (SELECT CAST({key_expr} AS VARCHAR) AS k FROM ({source_a})),
kb AS (SELECT CAST({key_expr} AS VARCHAR) AS k FROM ({source_b})),
sa AS (
  SELECT d, b, COUNT(*) AS cell FROM ({bucket_rows('ka')}) GROUP BY d, b
),
sb AS (
  SELECT d, b, COUNT(*) AS cell FROM ({bucket_rows('kb')}) GROUP BY d, b
),
ea AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS exact_a FROM ka GROUP BY k),
eb AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS exact_b FROM kb GROUP BY k),
exact AS (
  SELECT COALESCE(ea.k, eb.k) AS k,
         COALESCE(exact_a, 0) AS exact_a,
         COALESCE(exact_b, 0) AS exact_b,
         COALESCE(exact_b, 0) - COALESCE(exact_a, 0) AS exact_delta
  FROM ea FULL JOIN eb ON ea.k = eb.k
),
topk AS (
  SELECT * FROM exact ORDER BY ABS(exact_delta) DESC, k ASC LIMIT {k}
),
probes AS (
  {bucket_rows('(SELECT k FROM topk)')}
),
esta AS (
  SELECT p.k, CAST(MIN(COALESCE(s.cell, 0)) AS BIGINT) AS est_a
  FROM probes p LEFT JOIN sa s ON p.d = s.d AND p.b = s.b
  GROUP BY p.k
),
estb AS (
  SELECT p.k, CAST(MIN(COALESCE(s.cell, 0)) AS BIGINT) AS est_b
  FROM probes p LEFT JOIN sb s ON p.d = s.d AND p.b = s.b
  GROUP BY p.k
)
SELECT t.k AS {key_name},
       t.exact_a, t.exact_b, CAST(t.exact_delta AS BIGINT) AS exact_delta,
       esta.est_a, estb.est_b,
       CAST(estb.est_b - esta.est_a AS BIGINT) AS est_delta
FROM topk t JOIN esta ON t.k = esta.k JOIN estb ON t.k = estb.k
"""


def countmin_heavy_hitters_sql(
    source_sql: str,
    key_expr: str,
    key_name: str,
    width: int = 1 << 12,
    depth: int = 4,
    k: int = 20,
) -> str:
    """DuckDB oracle twin of :func:`countmin_heavy_hitters`."""
    bucket_rows = "\n  UNION ALL\n  ".join(
        f"SELECT k, {d} AS d, {_h60_sql(repr(f'{d}|') + ' || k')} % {width} AS b"
        " FROM keys"
        for d in range(depth)
    )
    return f"""
WITH keys AS (SELECT CAST({key_expr} AS VARCHAR) AS k FROM ({source_sql})),
hashed AS (
  {bucket_rows}
),
sketch AS (
  SELECT d, b, COUNT(*) AS cell FROM hashed GROUP BY d, b
),
exact AS (SELECT k, COUNT(*) AS exact_cnt FROM keys GROUP BY k),
topk AS (
  SELECT k, exact_cnt FROM exact
  ORDER BY exact_cnt DESC, k ASC LIMIT {k}
),
probes AS (
  {bucket_rows.replace("FROM keys", "FROM (SELECT DISTINCT k FROM topk)")}
),
est AS (
  SELECT p.k, MIN(s.cell) AS est_cnt
  FROM probes p JOIN sketch s ON p.d = s.d AND p.b = s.b
  GROUP BY p.k
)
SELECT t.k AS {key_name},
       CAST(t.exact_cnt AS BIGINT) AS exact_cnt,
       CAST(e.est_cnt AS BIGINT) AS est_cnt,
       CAST(e.est_cnt - t.exact_cnt AS BIGINT) AS overcount
FROM topk t JOIN est e ON t.k = e.k
"""


# --------------------------------------------------------- HyperLogLog


def _hll_alpha(m: int) -> float:
    # Flajolet et al. 2007 bias constant; evaluated HERE so both
    # engines receive the identical double literal.
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 8
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate with DETERMINISTIC
    hashes — unlike Spark's ``approx_count_distinct`` the result is
    reproducible across engines, runs, and partitionings, so it can be
    oracle-verified and diffed between pipeline runs.

    Register build: 60-bit md5 prefix → register index = low ``p``
    bits, rho = leading-zero rank of the remaining ``60-p`` bits
    (computed as ``(60-p) - length(bin(w)) + 1`` — no logarithms);
    per-register max is one map-side-combinable aggregate, so state is
    ≤ m = 2**p registers per group regardless of cardinality — the
    100 TB distinct-count structure (p=14 gives ~0.8% error; the
    default p=8 keeps the register relation inspectable).

    The harmonic-mean denominator is EXACT: each register contributes
    ``2**(K - M_j)`` (K = 60-p+1) as a BIGINT, absent registers
    contribute ``2**K``, so ``register_sum`` is an integer both
    engines agree on bit-for-bit and the raw estimate
    ``alpha·m²·2**K / register_sum`` is a single IEEE division of
    exact operands.  No small-range correction (it needs ln, which
    libm does not make portable) — ``n_zero_registers`` is emitted so
    callers can see when the raw estimate is biased (many zeros =
    small range = use the exact count instead).

    Returns (group..., register_sum, n_zero_registers, hll_raw_est).
    """
    regs = hll_registers(df, group_cols, value_col, p)
    return hll_estimate_from_registers(regs, group_cols, p)


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 8
) -> DataFrame:
    """The (group..., __reg, __m) register relation of
    :func:`hll_distinct` — one projection + one map-combinable MAX
    aggregate, both streaming-legal, so the SAME code path builds the
    registers from a batch DataFrame or a ``readStream`` one
    (``streaming.sketch.streaming_hll_registers``); state is ≤
    2**p rows per group on an unbounded stream."""
    m = 1 << p
    kbits = 60 - p + 1
    h = _h60(F.col(value_col).cast("string"))
    # m is a power of two: register/rest split via exact bit ops (a
    # double division of a 60-bit value would lose bits past 2^53)
    w = F.shiftright(h, p)  # upper 60-p bits
    rho = F.when(
        w > 0, F.lit(60 - p) - F.length(F.bin(w)) + F.lit(1)
    ).otherwise(F.lit(kbits))
    return (
        df.select(
            *group_cols,
            h.bitwiseAND(F.lit(m - 1)).alias("__reg"),
            rho.alias("__rho"),
        )
        .groupBy(*group_cols, "__reg")
        .agg(F.max("__rho").alias("__m"))
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str], p: int = 8
) -> DataFrame:
    """Roll a register relation (from :func:`hll_registers` — batch,
    or a snapshot of the streaming state) into the per-group estimate
    row.  Separated from the build so the streaming form can aggregate
    registers continuously and apply this tiny roll-up per snapshot
    (``foreachBatch``)."""
    m = 1 << p
    kbits = 60 - p + 1
    alpha = _hll_alpha(m)
    # shiftleft(1, K - M) is exact for M in [1, K]
    return (
        regs.groupBy(*group_cols)
        .agg(
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {kbits} - __m)"))
            .alias("__present_sum"),
            F.count(F.lit(1)).alias("__n_present"),
        )
        .select(
            *group_cols,
            (
                F.col("__present_sum")
                + (F.lit(m) - F.col("__n_present"))
                * F.lit(1 << kbits).cast("long")
            ).alias("register_sum"),
            (F.lit(m) - F.col("__n_present")).cast("bigint").alias(
                "n_zero_registers"
            ),
            (
                F.lit(float(alpha * m * m * (1 << kbits)))
                / F.col("register_sum").cast("double")
            ).alias("hll_raw_est"),
        )
    )


def hll_distinct_sql(
    source_sql: str, group_cols: list[str], value_col: str, p: int = 8
) -> str:
    m = 1 << p
    kbits = 60 - p + 1
    alpha = _hll_alpha(m)
    g = ", ".join(group_cols)
    h = _h60_sql(f"CAST({value_col} AS VARCHAR)")
    num = repr(float(alpha * m * m * (1 << kbits)))
    return f"""
WITH hashed AS (
  SELECT {g}, ({h}) & {m - 1} AS reg,
         CASE WHEN ({h}) >> {p} > 0
              THEN {60 - p} - length(bin(({h}) >> {p})) + 1
              ELSE {kbits} END AS rho
  FROM ({source_sql})
),
regs AS (
  SELECT {g}, reg, MAX(rho) AS mr FROM hashed GROUP BY {g}, reg
)
SELECT {g},
       CAST(SUM(CAST(1 AS BIGINT) << ({kbits} - mr))
            + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << {kbits}) AS BIGINT)
         AS register_sum,
       CAST({m} - COUNT(*) AS BIGINT) AS n_zero_registers,
       {num} / CAST(CAST(SUM(CAST(1 AS BIGINT) << ({kbits} - mr))
            + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << {kbits}) AS BIGINT)
            AS DOUBLE) AS hll_raw_est
FROM regs GROUP BY {g}
"""


def hll_merge_rollup(
    df: DataFrame,
    group_cols: list[str],
    sub_col,
    value_col: str,
    p: int = 8,
) -> DataFrame:
    """The re-aggregatable rollup that makes sketches the 100 TB
    distinct-count answer: build HLL registers per (group, sub-unit)
    — e.g. per (event_type, day) — then MERGE the sub-unit sketches
    into the per-group total with a register-wise MAX, never
    re-touching the raw data.  This is the property a daily-build
    pipeline relies on (yesterday's registers are a few KB; the
    period rollup is a KB-scale aggregate, not a re-scan), and the
    merge is EXACT: max-of-max per register is bit-identical to
    building the registers over the whole period directly.

    ``sub_col`` may be a Column expression (e.g.
    ``F.to_date("ts")``).  Alongside the merged estimate the exact
    per-group distinct count rides in a second aggregate of the same
    scan, so the output is self-auditing (compare ``hll_raw_est``
    to ``exact_distinct``).

    Returns (group..., n_subunits, register_sum, n_zero_registers,
    hll_raw_est, exact_distinct).
    """
    sub = sub_col if not isinstance(sub_col, str) else F.col(sub_col)
    base = df.select(
        *group_cols, sub.alias("__sub"), F.col(value_col).alias("__v")
    )
    daily = hll_registers(base, [*group_cols, "__sub"], "__v", p)
    merged_regs = daily.groupBy(*group_cols, "__reg").agg(
        F.max("__m").alias("__m")
    )
    est = hll_estimate_from_registers(merged_regs, group_cols, p)
    audit = base.groupBy(*group_cols).agg(
        F.countDistinct("__sub").cast("bigint").alias("n_subunits"),
        F.countDistinct("__v").cast("bigint").alias("exact_distinct"),
    )
    return audit.join(est, group_cols).select(
        *group_cols,
        "n_subunits",
        "register_sum",
        "n_zero_registers",
        "hll_raw_est",
        "exact_distinct",
    )


def hll_merge_rollup_sql(
    source_sql: str,
    group_cols: list[str],
    sub_expr: str,
    value_col: str,
    p: int = 8,
) -> str:
    m = 1 << p
    kbits = 60 - p + 1
    alpha = _hll_alpha(m)
    g = ", ".join(group_cols)
    h = _h60_sql(f"CAST({value_col} AS VARCHAR)")
    num = repr(float(alpha * m * m * (1 << kbits)))
    return f"""
WITH base AS (
  SELECT {g}, {sub_expr} AS sub, {value_col} AS v FROM ({source_sql})
),
hashed AS (
  SELECT {g}, sub, ({_h60_sql('CAST(v AS VARCHAR)')}) & {m - 1} AS reg,
         CASE WHEN ({_h60_sql('CAST(v AS VARCHAR)')}) >> {p} > 0
              THEN {60 - p} - length(bin(({_h60_sql('CAST(v AS VARCHAR)')}) >> {p})) + 1
              ELSE {kbits} END AS rho
  FROM base
),
daily AS (
  SELECT {g}, sub, reg, MAX(rho) AS mr FROM hashed GROUP BY {g}, sub, reg
),
merged AS (
  SELECT {g}, reg, MAX(mr) AS mr FROM daily GROUP BY {g}, reg
),
est AS (
  SELECT {g},
         CAST(SUM(CAST(1 AS BIGINT) << ({kbits} - mr))
              + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << {kbits}) AS BIGINT)
           AS register_sum,
         CAST({m} - COUNT(*) AS BIGINT) AS n_zero_registers,
         {num} / CAST(CAST(SUM(CAST(1 AS BIGINT) << ({kbits} - mr))
              + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << {kbits}) AS BIGINT)
              AS DOUBLE) AS hll_raw_est
  FROM merged GROUP BY {g}
),
audit AS (
  SELECT {g}, CAST(COUNT(DISTINCT sub) AS BIGINT) AS n_subunits,
         CAST(COUNT(DISTINCT v) AS BIGINT) AS exact_distinct
  FROM base GROUP BY {g}
)
SELECT audit.{g.replace(', ', ', audit.')}, audit.n_subunits,
       est.register_sum, est.n_zero_registers, est.hll_raw_est,
       audit.exact_distinct
FROM audit JOIN est USING ({g})
"""


def hll_intersection(
    df_a: DataFrame, df_b: DataFrame, value_col: str, p: int = 8
) -> DataFrame:
    """Sketch-only set-overlap estimate between two key populations —
    "how many users does feed B share with feed A" answered from two
    KB-scale register tables, never a join of the raw keys: the union
    sketch is the register-wise MAX (exact merge), and the
    intersection estimate is inclusion–exclusion
    ``est_a + est_b − est_union`` (two IEEE adds on three
    deterministic estimates — fixed order, bit-portable).

    Inclusion–exclusion on sketches can go NEGATIVE for tiny overlaps
    (each estimate carries its own error) — the estimate is reported
    raw, signed, so the consumer sees the uncertainty instead of a
    silently clamped zero.  The exact distinct counts and the exact
    intersection ride along as the audit (one distinct-value
    aggregate, the same self-audit convention as
    :func:`hll_merge_rollup`).

    Returns one row: (exact_a, exact_b, exact_intersection, est_a,
    est_b, est_union, est_intersection).
    """
    base = (
        df_a.select(F.lit("a").alias("__side"),
                    F.col(value_col).cast("string").alias("__v"))
        .unionByName(
            df_b.select(F.lit("b").alias("__side"),
                        F.col(value_col).cast("string").alias("__v"))
        )
    )
    regs = hll_registers(base, ["__side"], "__v", p)
    union_regs = regs.groupBy("__reg").agg(F.max("__m").alias("__m")).select(
        F.lit("u").alias("__side"), "__reg", "__m"
    )
    est = hll_estimate_from_registers(
        regs.unionByName(union_regs), ["__side"], p
    )
    est_row = est.groupBy().agg(
        F.max(F.when(F.col("__side") == "a", F.col("hll_raw_est")))
        .alias("est_a"),
        F.max(F.when(F.col("__side") == "b", F.col("hll_raw_est")))
        .alias("est_b"),
        F.max(F.when(F.col("__side") == "u", F.col("hll_raw_est")))
        .alias("est_union"),
    )
    dv = base.distinct()
    audit = dv.groupBy("__v").agg(
        F.count(F.lit(1)).alias("__n_sides")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n_any"),
        F.sum(F.when(F.col("__n_sides") == 2, 1).otherwise(0))
        .cast("bigint").alias("exact_intersection"),
    )
    sides = dv.groupBy().agg(
        F.sum(F.when(F.col("__side") == "a", 1).otherwise(0))
        .cast("bigint").alias("exact_a"),
        F.sum(F.when(F.col("__side") == "b", 1).otherwise(0))
        .cast("bigint").alias("exact_b"),
    )
    return (
        sides.join(F.broadcast(audit))
        .join(F.broadcast(est_row))
        .select(
            "exact_a",
            "exact_b",
            "exact_intersection",
            "est_a",
            "est_b",
            "est_union",
            (F.col("est_a") + F.col("est_b") - F.col("est_union"))
            .alias("est_intersection"),
        )
    )


def hll_intersection_sql(
    source_a: str, source_b: str, value_col: str, p: int = 8
) -> str:
    m = 1 << p
    kbits = 60 - p + 1
    alpha = _hll_alpha(m)
    h = _h60_sql("v")
    return f"""
WITH base AS (
  SELECT 'a' AS side, CAST({value_col} AS VARCHAR) AS v FROM ({source_a})
  UNION ALL
  SELECT 'b' AS side, CAST({value_col} AS VARCHAR) AS v FROM ({source_b})
),
hashed AS (
  SELECT side, {h} & {m - 1} AS reg,
         CASE WHEN ({h} >> {p}) > 0
              THEN {60 - p} - length(bin({h} >> {p})) + 1
              ELSE {kbits} END AS rho
  FROM base
),
regs AS (
  SELECT side, reg, MAX(rho) AS mx FROM hashed GROUP BY side, reg
),
allregs AS (
  SELECT side, reg, mx FROM regs
  UNION ALL
  SELECT 'u' AS side, reg, MAX(mx) AS mx FROM regs GROUP BY reg
),
est AS (
  SELECT side,
         SUM(CAST(1 AS BIGINT) << ({kbits} - mx))
           + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << {kbits})
           AS register_sum
  FROM allregs GROUP BY side
),
est_row AS (
  SELECT
    MAX(CASE WHEN side = 'a' THEN {alpha * m * m * (1 << kbits)}
         / CAST(register_sum AS DOUBLE) END) AS est_a,
    MAX(CASE WHEN side = 'b' THEN {alpha * m * m * (1 << kbits)}
         / CAST(register_sum AS DOUBLE) END) AS est_b,
    MAX(CASE WHEN side = 'u' THEN {alpha * m * m * (1 << kbits)}
         / CAST(register_sum AS DOUBLE) END) AS est_union
  FROM est
),
dv AS (SELECT DISTINCT side, v FROM base),
audit AS (
  SELECT CAST(SUM(CASE WHEN n_sides = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS exact_intersection
  FROM (SELECT v, COUNT(*) AS n_sides FROM dv GROUP BY v)
),
sides AS (
  SELECT CAST(SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT)
           AS exact_a,
         CAST(SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT)
           AS exact_b
  FROM dv
)
SELECT s.exact_a, s.exact_b, a.exact_intersection,
       e.est_a, e.est_b, e.est_union,
       e.est_a + e.est_b - e.est_union AS est_intersection
FROM sides s, audit a, est_row e
"""


def ams_f2(df: DataFrame, value_col: str, n_seeds: int = 32) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon–Matias–Szegedy 1996):
    estimate F2 = Σ count(v)² — the self-join size, the number a
    planner needs to predict how a key distribution blows up an
    equi-join — from ``n_seeds`` counters instead of a per-key
    frequency table.

    Per seed s, every value gets a deterministic ±1 sign from the
    shared md5 hash of ``s|value``; the seed's counter is
    X_s = Σ_v sign(s,v)·count(v) and E[X_s²] = F2.  The estimate is
    the floor-mean of X_s² over the seeds (the classic construction
    medians over means of seed groups; one mean keeps the plan a
    single aggregate and the test asserts the guaranteed unbiasedness
    property on the exact audit instead).

    Scale shape: the per-value counts are one map-combinable
    aggregate; the seed fan-out multiplies the DISTINCT-value frame
    (never the raw rows) by ``n_seeds``; per-seed folding is again
    map-combinable.  State ∝ n_seeds counters — this is the operator
    you run when the per-key table itself is too big to keep.

    All moments are exact integers (DECIMAL(38,0)); the exact F2 rides
    along as the audit.  Returns one row:
    (n_keys, f2_exact, f2_estimate, err_ppm).
    """
    counts = df.groupBy(
        F.col(value_col).cast("string").alias("__v")
    ).agg(F.count(F.lit(1)).cast("decimal(19,0)").alias("__c"))
    seeded = counts.select(
        "__v", "__c",
        F.explode(F.array(*[F.lit(i) for i in range(n_seeds)])).alias("__s"),
    )
    sign = (
        F.lit(1) - (_h60(F.concat(F.col("__s").cast("string"),
                                  F.lit("|"), F.col("__v"))) % 2) * 2
    ).cast("decimal(19,0)")
    per_seed = seeded.groupBy("__s").agg(
        F.sum((sign * F.col("__c")).cast("decimal(19,0)"))
        .cast("decimal(19,0)").alias("__x")
    )
    est = per_seed.agg(
        F.floor(
            F.sum((F.col("__x") * F.col("__x")).cast("decimal(38,0)"))
            / F.lit(n_seeds)
        ).cast("double").alias("f2_estimate")
    )
    exact = counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum((F.col("__c") * F.col("__c")).cast("decimal(38,0)"))
        .cast("double").alias("f2_exact"),
    )
    return exact.join(F.broadcast(est)).select(
        "n_keys",
        "f2_exact",
        "f2_estimate",
        F.floor(
            (F.col("f2_estimate") - F.col("f2_exact"))
            / F.col("f2_exact") * F.lit(1000000.0)
        ).cast("bigint").alias("err_ppm"),
    )


def ams_f2_sql(source_sql: str, value_col: str, n_seeds: int = 32) -> str:
    sign_h = _h60_sql("CAST(s AS VARCHAR) || '|' || v")
    return f"""
WITH counts AS (
  SELECT CAST({value_col} AS VARCHAR) AS v,
         CAST(COUNT(*) AS DECIMAL(19,0)) AS c
  FROM ({source_sql}) GROUP BY 1
),
seeded AS (
  SELECT v, c, s
  FROM counts, (SELECT UNNEST(range({n_seeds})) AS s)
),
per_seed AS (
  SELECT s,
         CAST(SUM(CAST((1 - ({sign_h} % 2) * 2) AS DECIMAL(19,0)) * c)
              AS DECIMAL(19,0)) AS x
  FROM seeded GROUP BY s
),
est AS (
  -- HUGEINT integral division: DuckDB DECIMAL / INT detours through
  -- DOUBLE and loses ulps past 2^53; int128 floor-div (positive
  -- operands) matches Spark's exact decimal floor(sum/n) bit-for-bit.
  SELECT CAST(CAST(CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS HUGEINT)
              // {n_seeds} AS VARCHAR) AS DOUBLE) AS f2_estimate
  FROM per_seed
),
exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(CAST(SUM(CAST(c * c AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)
           AS f2_exact
  FROM counts
)
SELECT e.n_keys, e.f2_exact, s.f2_estimate,
       CAST(FLOOR((s.f2_estimate - e.f2_exact) / e.f2_exact * 1000000.0)
            AS BIGINT) AS err_ppm
FROM exact e, est s
"""


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: tuple[int, ...] = (250, 500, 750, 900, 990),
    n_bins: int = 1024,
) -> DataFrame:
    """Bounded-memory quantile estimates from a fixed-width histogram
    — the mergeable alternative to a full sort when "p90 of this
    100 TB money column" only needs bin-width resolution.  Spark's own
    ``approxQuantile`` (Greenwald–Khanna) is order-dependent and
    engine-specific; a histogram is deterministic, mergeable
    (bin-wise addition), and its error bound is explicit: the true
    quantile lies INSIDE the reported bin, so the answer is the
    bracketing interval, not a point pretending to be exact.

    Two passes, both map-combinable: (1) exact integer min/max of the
    cent-scaled values (one row, broadcast back), (2) counts per
    ``(value−lo) div width`` bin (≤ ``n_bins`` rows).  The cumulative
    walk and quantile lookups run on the bin relation only.  For each
    requested permille q: the first bin whose running count reaches
    ceil(q·N/1000), reported as [bin_lo_cents, bin_hi_cents) with the
    running count as the audit.  NULLs are out of the population.

    Returns (q_permille, n, bin_lo_cents, bin_hi_cents, cum_count).
    """
    cents = F.floor(
        F.col(value_col).cast("decimal(38,10)") * 100
    ).cast("bigint")
    vals = df.filter(F.col(value_col).isNotNull()).select(
        cents.alias("__v")
    )
    span = vals.agg(
        F.min("__v").alias("__lo"),
        F.max("__v").alias("__hi"),
        F.count(F.lit(1)).cast("bigint").alias("__n"),
    )
    width = F.expr(
        f"greatest(CAST(1 AS BIGINT), (__hi - __lo + {n_bins}) div {n_bins})"
    )
    # (lo, hi, n) ride the ≤n_bins bin rows from here on — re-joining
    # the 1-row span at each stage would re-merge its aggregate once
    # per consumer (the corr_matrix union lesson).
    binned = (
        vals.join(F.broadcast(span))
        .select(F.expr(
            f"(__v - __lo) div (greatest(CAST(1 AS BIGINT),"
            f" (__hi - __lo + {n_bins}) div {n_bins}))"
        ).alias("__b"), "__lo", "__hi", "__n")
        .groupBy("__b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__c"),
            F.max("__lo").alias("__lo"),
            F.max("__hi").alias("__hi"),
            F.max("__n").alias("__n"),
        )
    )
    w = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = binned.select(
        "__b", "__lo", "__hi", "__n",
        F.sum("__c").over(w).alias("__cum"),
    )
    q_arr = F.array(*[F.lit(int(q)) for q in quantiles])
    hits = (
        cum.select(
            "__b", "__cum", "__lo", "__hi", "__n",
            F.explode(q_arr).alias("q_permille"),
        )
        .filter(
            F.col("__cum")
            >= F.expr("CAST((q_permille * __n + 999) div 1000 AS BIGINT)")
        )
        .groupBy("q_permille")
        .agg(
            F.min("__b").alias("__qb"),
            F.min_by("__cum", "__b").alias("__qcum"),
            F.max("__n").alias("n"),
            F.max("__lo").alias("__lo"),
            F.max("__hi").alias("__hi"),
        )
    )
    return hits.select(
        F.col("q_permille").cast("bigint").alias("q_permille"),
        "n",
        (F.col("__lo") + F.col("__qb") * width).cast("bigint")
        .alias("bin_lo_cents"),
        (F.col("__lo") + (F.col("__qb") + 1) * width).cast("bigint")
        .alias("bin_hi_cents"),
        F.col("__qcum").cast("bigint").alias("cum_count"),
    )


def histogram_quantiles_sql(
    source_sql: str,
    value_col: str,
    quantiles: tuple[int, ...] = (250, 500, 750, 900, 990),
    n_bins: int = 1024,
) -> str:
    qvals = ", ".join(str(int(q)) for q in quantiles)
    return f"""
WITH vals AS (
  SELECT CAST(FLOOR(CAST({value_col} AS DECIMAL(38,10)) * 100) AS BIGINT)
           AS v
  FROM ({source_sql}) WHERE {value_col} IS NOT NULL
),
span AS (
  SELECT MIN(v) AS lo, MAX(v) AS hi, CAST(COUNT(*) AS BIGINT) AS n
  FROM vals
),
binned AS (
  SELECT (v - lo) // GREATEST(CAST(1 AS BIGINT),
           (hi - lo + {n_bins}) // {n_bins}) AS b,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM vals, span GROUP BY 1
),
cum AS (
  SELECT b, SUM(c) OVER (ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM binned
),
q AS (SELECT UNNEST([{qvals}]) AS q_permille),
hits AS (
  SELECT q.q_permille, MIN(cum.b) AS qb, MIN_BY(cum.cum, cum.b) AS qcum
  FROM q, span, cum
  WHERE cum.cum >= (q.q_permille * span.n + 999) // 1000
  GROUP BY q.q_permille
)
SELECT CAST(h.q_permille AS BIGINT) AS q_permille,
       s.n,
       CAST(s.lo + h.qb * GREATEST(CAST(1 AS BIGINT),
            (s.hi - s.lo + {n_bins}) // {n_bins}) AS BIGINT)
         AS bin_lo_cents,
       CAST(s.lo + (h.qb + 1) * GREATEST(CAST(1 AS BIGINT),
            (s.hi - s.lo + {n_bins}) // {n_bins}) AS BIGINT)
         AS bin_hi_cents,
       CAST(h.qcum AS BIGINT) AS cum_count
FROM hits h CROSS JOIN span s
"""
