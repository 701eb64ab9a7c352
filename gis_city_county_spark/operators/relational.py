"""Relational operator wrappers with reference-faithful semantics.

These are thin, declarative compositions of DataFrame ops — Catalyst
still sees plain filters/joins/projections, so pushdown, pruning and
join-strategy selection all apply. The wrappers exist where the
reference's semantics differ from Spark defaults (first-match joins,
union with missing columns, dict-driven value fixes).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def join_field(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str | None = None,
    fields: Sequence[str],
    order_by: Sequence[str | Column] | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """ArcGIS ``JoinField`` — left-attach columns, **first match wins**.

    Reference J1 (``bunny.py:272-280, 326-334, 436-461``):
    ``arcpy.management.JoinField`` appends ``fields`` from ``right`` by
    equi-key, keeping only the *first* matching right row when the key
    is duplicated (GNIS has multi-county rows with repeated
    ``feature_id``), and NULL-filling unmatched left rows.

    ``order_by`` makes "first" deterministic (ArcGIS uses physical row
    order, which is not reproducible; callers pass an explicit order).
    Without ``order_by`` we fall back to ``dropDuplicates`` — correct
    cardinality, arbitrary pick, cheaper (no sort).

    Scale: the right side is deduped *before* the join, so the shuffle
    moves one row per key; with ``broadcast=True`` (the reference's
    right sides are ≤ ~2k rows — ``index_join_fields="NEW_INDEXES"``
    is its analog of building the hash side) there is no shuffle at
    all. For large right sides set ``broadcast=False`` and Catalyst
    picks sort-merge/shuffled-hash with AQE skew handling.
    """
    right_on = right_on or left_on
    if order_by:
        # Order columns ride along for the rank, then drop out of the
        # attach set if the caller didn't ask for them.
        order_names = [o for o in order_by if isinstance(o, str)]
        extra = [o for o in order_names if o not in fields]
        proj = right.select(
            F.col(right_on).alias("__jf_key"), *[F.col(f) for f in [*fields, *extra]]
        )
        w = Window.partitionBy("__jf_key").orderBy(
            *[F.col(o) if isinstance(o, str) else o for o in order_by]
        )
        dedup = (
            proj.withColumn("__jf_rn", F.row_number().over(w))
            .filter(F.col("__jf_rn") == 1)
            .drop("__jf_rn", *extra)
        )
    else:
        proj = right.select(F.col(right_on).alias("__jf_key"), *[F.col(f) for f in fields])
        dedup = proj.dropDuplicates(["__jf_key"])
    if broadcast:
        dedup = F.broadcast(dedup)
    joined = left.join(dedup, left[left_on] == dedup["__jf_key"], "left")
    return joined.drop("__jf_key")


def value_map(
    df: DataFrame,
    column: str,
    mapping: Mapping[str, str],
    output: str | None = None,
) -> DataFrame:
    """Dictionary-based value replacement (reference F3,
    ``bunny.py:83-101`` GNIS_ADJUSTMENTS / ``retrieve.py:122-127``
    CENSUS_ADJUSTMENTS): ``v -> dict.get(v, v)``.

    Small maps become a ``when`` chain (constant-folded, codegen'd —
    no join, no shuffle). A large mapping table should instead be
    broadcast-joined: ``join_field`` + ``coalesce`` gives the same
    semantics; that variant is ``value_map_join``.
    """
    c = F.col(column)
    expr: Column | None = None
    for k, v in mapping.items():
        cond = c == F.lit(k)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    result = c if expr is None else expr.otherwise(c)
    return df.withColumn(output or column, result)


def value_map_join(
    df: DataFrame,
    column: str,
    mapping_df: DataFrame,
    key_col: str = "key",
    value_col: str = "value",
    output: str | None = None,
) -> DataFrame:
    """Join-based variant of :func:`value_map` for large mappings:
    broadcast left join + ``coalesce(new, old)``."""
    m = F.broadcast(
        mapping_df.select(
            F.col(key_col).alias("__vm_key"), F.col(value_col).alias("__vm_val")
        ).dropDuplicates(["__vm_key"])
    )
    joined = df.join(m, df[column] == m["__vm_key"], "left")
    return (
        joined.withColumn(output or column, F.coalesce(F.col("__vm_val"), F.col(column)))
        .drop("__vm_key", "__vm_val")
    )


def merge_by_name(*dfs: DataFrame) -> DataFrame:
    """ArcGIS ``Merge`` — UNION ALL by column name, NULL-filling
    missing columns (reference U1, ``bunny.py:469-473``: cities +
    counties with divergent schemas)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def rename_fields(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """Reference P7 (``bunny.py:236-248``): the add+copy+delete rename
    loop collapses to a zero-cost projection rename."""
    return df.withColumnsRenamed(dict(mapping))


def bulk_rename(df: DataFrame, old: str = " ", new: str = "_") -> DataFrame:
    """Reference P8 (``retrieve.py:109``): header normalization."""
    return df.toDF(*[c.replace(old, new) for c in df.columns])


def fix_individual(
    df: DataFrame,
    fixes: Sequence[tuple[str, str, str, str]],
) -> DataFrame:
    """Config-driven point fixes (reference F8, ``bunny.py:508-531``;
    rules ``config.py:91-99``): each rule is
    ``(field, value, check_field, check_value)`` meaning
    ``UPDATE SET field = value WHERE check_field = check_value``."""
    for field, value, check_field, check_value in fixes:
        df = df.withColumn(
            field,
            F.when(F.col(check_field) == F.lit(check_value), F.lit(value)).otherwise(
                F.col(field)
            ),
        )
    return df


def blocklist_filter(
    df: DataFrame, col: str, blocklist: DataFrame, block_col: str | None = None
) -> DataFrame:
    """Drop rows whose ``col`` appears in a blocklist table — the
    domain/source-exclusion step of a crawl-cleaning pipeline,
    expressed as a broadcast LEFT ANTI join (blocklists are small next
    to the corpus, so the scan is never shuffled; Catalyst folds the
    anti join into a map-side hash lookup)."""
    bc = block_col or col
    right = blocklist.select(F.col(bc).alias(col)).dropDuplicates([col])
    return df.join(F.broadcast(right), col, "left_anti")
