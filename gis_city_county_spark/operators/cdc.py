"""Change-data-capture / mutation operators.

The reference mutates tables in place: ``UpdateCursor`` writes
geometries back by OID (reference ``coastline.py:108-117``), and
``fix_individual`` is literally ``UPDATE t SET f=v WHERE ...``
(reference ``bunny.py:508-531``). Spark DataFrames are immutable, so
"update by row identity" becomes a **merge**: join the change set
against the base on the key and emit a new table. The planned
``quality_check.py`` (reference ``quality_check.py:1-6``) sketches the
other half: diff the new release against the previous one and block
publishing on a large change — :func:`snapshot_diff` is that diff as a
first-class relational operator.

Operators:

* ``merge_upsert`` — apply a change set (upserts + deletes keyed by
  row identity) to a base table: the MERGE INTO shape.
* ``scd2_history`` — collapse an event log into type-2 validity
  intervals (valid_from / valid_to / is_current) per key, keeping only
  rows where the tracked attributes actually changed.
* ``snapshot_diff`` — full-outer key diff of two table versions with
  per-row status (added / removed / changed / unchanged).

Scale notes (100 TB):

* ``merge_upsert`` is one anti-join + one union. Change sets are
  normally tiny next to the base, so AQE picks a broadcast anti-join
  and the base is never shuffled; with a co-bucketed base + change
  layout (``sources.layout``) even a same-size merge is shuffle-free.
* ``scd2_history`` shuffles once on the key; both window passes and
  the change filter reuse that partitioning (Catalyst elides the
  second exchange).
* ``snapshot_diff`` is a single full-outer shuffle join on the key —
  the unavoidable cost of comparing two snapshots — and the
  usual summary (counts per status) map-side-combines to nothing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ------------------------------------------------------------------ merge


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a change set to ``base``: rows whose key appears in
    ``changes`` are replaced (or dropped when ``op_col ==
    delete_op``); unmatched change rows are inserts.

    ``changes`` must have the base schema plus ``op_col`` and one row
    per key. Plan: base ANTI JOIN change-keys (survivors, broadcast
    when the change set is small) UNION ALL non-delete changes.
    """
    keys = list(key_cols)
    survivors = base.join(changes.select(*keys), keys, "left_anti")
    applied = changes.filter(F.col(op_col) != delete_op).drop(op_col)
    return survivors.unionByName(applied)


def merge_upsert_sql(
    base_sql: str,
    changes_sql: str,
    key_cols: Sequence[str],
    cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> str:
    on = " AND ".join(f"b.{k} = c.{k}" for k in key_cols)
    collist = ", ".join(cols)
    return f"""
WITH base AS ({base_sql}), changes AS ({changes_sql})
SELECT {collist} FROM base b
WHERE NOT EXISTS (SELECT 1 FROM changes c WHERE {on})
UNION ALL
SELECT {collist} FROM changes WHERE {op_col} <> '{delete_op}'
"""


# ------------------------------------------------------------------ SCD2


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak: str,
) -> DataFrame:
    """Type-2 history from an observation log: one row per attribute
    *change*, with ``valid_from`` / ``valid_to`` / ``is_current``.

    Consecutive observations with identical ``attr_cols`` collapse
    into one interval. ``tiebreak`` must make ``(key, ts, tiebreak)``
    a total order so both engines pick the same representative on
    timestamp ties.
    """
    keys = [F.col(k) for k in key_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(tiebreak))
    state = F.struct(*[F.col(a) for a in attr_cols])
    changed = df.withColumn("__prev", F.lag(state).over(w)).filter(
        F.col("__prev").isNull() | ~state.eqNullSafe(F.col("__prev"))
    )
    w2 = Window.partitionBy(*keys).orderBy(F.col(ts_col), F.col(tiebreak))
    return (
        changed.withColumn("valid_to", F.lead(F.col(ts_col)).over(w2))
        .select(
            *key_cols,
            *attr_cols,
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def scd2_history_sql(
    source_sql: str,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak: str,
) -> str:
    keys = ", ".join(key_cols)
    attrs = ", ".join(attr_cols)
    attr_row = "(" + ", ".join(attr_cols) + ")"
    prev_row = "(" + ", ".join(f"__prev_{a}" for a in attr_cols) + ")"
    lags = ", ".join(
        f"LAG({a}) OVER (PARTITION BY {keys} ORDER BY {ts_col}, {tiebreak})"
        f" AS __prev_{a}"
        for a in attr_cols
    )
    return f"""
WITH src AS ({source_sql}),
obs AS (
  SELECT *, {lags} FROM src
),
chg AS (
  SELECT * FROM obs
  WHERE {prev_row} IS DISTINCT FROM {attr_row}
)
SELECT {keys}, {attrs}, {ts_col} AS valid_from,
       LEAD({ts_col}) OVER (PARTITION BY {keys} ORDER BY {ts_col}, {tiebreak})
         AS valid_to,
       LEAD({ts_col}) OVER (PARTITION BY {keys} ORDER BY {ts_col}, {tiebreak})
         IS NULL AS is_current
FROM chg
"""


# ------------------------------------------------------------------ diff


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Per-key status of ``new`` vs ``old``: added / removed / changed
    / unchanged. The release-diff half of the reference's planned
    ``quality_check`` gate (``operators.gates.diff_gate_df`` consumes
    the summary)."""
    keys = list(key_cols)
    o = old.select(*keys, F.struct(*[F.col(c) for c in compare_cols]).alias("__o"))
    n = new.select(*keys, F.struct(*[F.col(c) for c in compare_cols]).alias("__n"))
    j = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("__o").isNull(), "added")
        .when(F.col("__n").isNull(), "removed")
        .when(F.col("__o").eqNullSafe(F.col("__n")), "unchanged")
        .otherwise("changed")
    )
    return j.select(*keys, status.alias("status"))


def snapshot_diff_sql(
    old_sql: str,
    new_sql: str,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> str:
    on = " AND ".join(f"o.{k} = n.{k}" for k in key_cols)
    keysel = ", ".join(f"COALESCE(o.{k}, n.{k}) AS {k}" for k in key_cols)
    okey = key_cols[0]
    same = " AND ".join(
        f"o.{c} IS NOT DISTINCT FROM n.{c}" for c in compare_cols
    )
    return f"""
WITH o AS ({old_sql}), n AS ({new_sql})
SELECT {keysel},
       CASE WHEN o.{okey} IS NULL THEN 'added'
            WHEN n.{okey} IS NULL THEN 'removed'
            WHEN {same} THEN 'unchanged'
            ELSE 'changed' END AS status
FROM o FULL OUTER JOIN n ON {on}
"""


# ------------------------------------------------- incremental aggregates


def incremental_agg_refresh(
    prev_agg: DataFrame,
    delta: DataFrame,
    key_cols: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Incremental (materialized-view) refresh of a keyed rollup:
    merge a delta batch's partial aggregates into the previous
    aggregate snapshot — never rescanning the base facts. This is how
    a 100 TB rollup stays fresh: each refresh costs one aggregate of
    the (small) delta plus an outer merge on the (group-sized) state,
    instead of a full recompute.

    ``prev_agg`` must carry ``key_cols``, ``count_col`` and one column
    per ``sum_cols`` entry holding DECIMAL(38,10) partial sums (as
    produced by :func:`agg_snapshot`); counts and decimal sums are the
    self-mergeable aggregates (exact, associative), which is exactly
    why the engine's numeric convention routes through decimal —
    min/max are merge-only-growable and avg derives as sum/count.
    Retractions arrive as negative counts/sums in the delta; groups
    whose merged count reaches 0 drop out.
    """
    keys = list(key_cols)
    merged = prev_agg.join(delta, keys, "full_outer")
    out_cols: list = [F.col(k) for k in keys]
    cnt = (
        F.coalesce(prev_agg[count_col], F.lit(0).cast("long"))
        + F.coalesce(delta[count_col], F.lit(0).cast("long"))
    ).alias(count_col)
    out_cols.append(cnt)
    for c in sum_cols:
        zero = F.lit(0).cast("decimal(38,10)")
        out_cols.append(
            (F.coalesce(prev_agg[c], zero) + F.coalesce(delta[c], zero))
            .cast("decimal(38,10)")
            .alias(c)
        )
    return merged.select(*out_cols).filter(F.col(count_col) > 0)


def agg_snapshot(
    df: DataFrame,
    key_cols: Sequence[str],
    sum_exprs: dict[str, "F.Column | str"],
    count_col: str = "n_rows",
) -> DataFrame:
    """Self-mergeable aggregate state for :func:`incremental_agg_refresh`:
    per-group row count + DECIMAL(38,10) sums (exact, associative —
    merging partials equals aggregating the union, in any order)."""
    aggs = [F.count(F.lit(1)).alias(count_col)]
    for name, expr in sum_exprs.items():
        col = F.col(expr) if isinstance(expr, str) else expr
        aggs.append(F.sum(col.cast("decimal(38,10)")).cast("decimal(38,10)").alias(name))
    return df.groupBy(*key_cols).agg(*aggs)


def incremental_join_view(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str],
) -> DataFrame:
    """Incremental maintenance of the join view A ⋈ B under
    insert-only deltas: the delta of the view is
    ``ΔA ⋈ (B ∪ ΔB)  ∪  A_old ⋈ ΔB`` — every term touches at least
    one delta, so refreshing the materialized join costs
    O(|ΔA|·matches + |ΔB|·matches), never a re-join of the full
    bases. This is the standard delta rule for inner joins (the
    join-view analogue of ``incremental_rollup``'s re-mergeable
    aggregate state).

    Returns old_view ∪ Δview. Correctness contract (what the oracle
    checks): equals ``(A_old ∪ ΔA) ⋈ (B_old ∪ ΔB)`` exactly — the
    delta decomposition is disjoint because each pair (a, b) joins in
    exactly one term (a old/new × b old/new)."""
    b_new = b_old.unionByName(b_delta)
    old_view = a_old.join(b_old, on)
    delta_view = a_delta.join(b_new, on).unionByName(a_old.join(b_delta, on))
    return old_view.unionByName(delta_view)


def feed_audit(
    base: DataFrame, changes: DataFrame, keys: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Change-feed integrity audit — the gate a CDC apply runs BEFORE
    merging: per op kind, how many change rows violate the base's
    referential state.  An update or delete for a key the base never
    had is "orphaned" (an out-of-order or lost-insert symptom); an
    insert for a key already present is "conflicting" (a replay or
    producer bug) — both merge "successfully" and corrupt state
    silently if nobody counts them.

    One left join of the slim change keys against the base keys
    (broadcastable when the feed is small, AQE decides), one
    map-combinable rollup.  Returns one row per op kind present:
    (op, n_changes, n_violations) — violations are orphaned U/D rows
    and conflicting I rows.
    """
    key_cols = list(keys)
    b = base.select(*key_cols).distinct().withColumn(
        "__in_base", F.lit(1)
    )
    joined = (
        changes.select(*key_cols, F.col(op_col).alias("op"))
        .join(b, key_cols, "left")
    )
    exists = F.col("__in_base").isNotNull()
    violation = F.when(
        F.col("op").isin("U", "D"), (~exists).cast("int")
    ).when(F.col("op") == "I", exists.cast("int")).otherwise(F.lit(0))
    return (
        joined.groupBy("op")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_changes"),
            F.sum(violation).cast("bigint").alias("n_violations"),
        )
    )


def feed_audit_sql(
    base_sql: str, changes_sql: str, keys: Sequence[str],
    op_col: str = "op",
) -> str:
    key_cols = list(keys)
    on = " AND ".join(f"c.{k} = b.{k}" for k in key_cols)
    klist = ", ".join(key_cols)
    return f"""
WITH b AS (SELECT DISTINCT {klist}, 1 AS in_base FROM ({base_sql})),
j AS (
  SELECT c.{op_col} AS op, b.in_base
  FROM ({changes_sql}) c LEFT JOIN b ON {on}
)
SELECT op, CAST(COUNT(*) AS BIGINT) AS n_changes,
       CAST(SUM(CASE
         WHEN op IN ('U', 'D') THEN CASE WHEN in_base IS NULL THEN 1 ELSE 0 END
         WHEN op = 'I' THEN CASE WHEN in_base IS NOT NULL THEN 1 ELSE 0 END
         ELSE 0 END) AS BIGINT) AS n_violations
FROM j GROUP BY op
"""
