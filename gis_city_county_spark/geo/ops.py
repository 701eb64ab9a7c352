"""Spark geometry operators over WKB columns (SURVEY.md §2.7-2.8).

Column convention: a geometry column holds little-endian WKB
MultiPolygon bytes (``geo.kernel`` codecs); CRS is an operator
parameter, as in the reference (area computed in an explicitly passed
equal-area CRS — ``bunny.py:500-506``). All per-geometry compute runs
in Arrow-batched pandas UDFs (vectorized transfer, no per-row
pickling); joins/groupBys stay relational so Catalyst plans them.

Scale design:
- Dissolve (A1) = ``groupBy(keys).applyInPandas(union_all)`` — one
  shuffle on the dissolve keys, geometry union is per-group local.
- Spatial joins (J2 erase / J3 overlay / sliver pairing) prefilter
  with a **bbox grid-cell bucket join**: geometries explode to the
  grid cells their bbox covers, equi-join on cell id, dedupe pairs,
  then the exact predicate runs only on bucket-mates — the standard
  distributed spatial-join shape (same as Sedona's partitioned join),
  expressed in plain DataFrame ops so it scales horizontally.
- The exact predicates/boolean ops come from ``geo.kernel``'s
  general planar-overlay clipper (arbitrary polygons; bit-exact on
  integer rectilinear inputs — see kernel docstring).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from gis_city_county_spark.geo import kernel as K

SQMI_PER_M2 = 1.0 / 2_589_988.110336  # international square mile

# ------------------------------------------------------------------ scalar UDFs


@pandas_udf(T.BinaryType())
def _geojson_to_wkb(s: pd.Series) -> pd.Series:
    import json

    return s.map(lambda g: K.to_wkb(K.from_geojson(json.loads(g))) if g else None)


def geojson_to_wkb(col: Column | str) -> Column:
    """Convert the S1 snapshot reader's geometry_json to WKB."""
    return _geojson_to_wkb(F.col(col) if isinstance(col, str) else col)


@pandas_udf(T.BinaryType())
def _make_valid(s: pd.Series) -> pd.Series:
    return s.map(lambda b: K.to_wkb(K.make_valid(K.from_wkb(b))) if b else None)


def st_make_valid(col: Column | str) -> Column:
    """G1 RepairGeometry (reference ``bunny.py:221-226``)."""
    return _make_valid(F.col(col) if isinstance(col, str) else col)


def st_transform(col: Column | str, src: str, dst: str) -> Column:
    """G2 Project (reference ``bunny.py:475-498``)."""

    @pandas_udf(T.BinaryType())
    def _tr(s: pd.Series) -> pd.Series:
        return s.map(lambda b: K.to_wkb(K.transform(K.from_wkb(b), src, dst)) if b else None)

    return _tr(F.col(col) if isinstance(col, str) else col)


def st_area(col: Column | str, src_crs: str | None = None, area_crs: str | None = None) -> Column:
    """Planar area; with CRSes given, area is computed after
    reprojection (G3 CalculateGeometryAttributes in an explicit CRS,
    reference ``bunny.py:500-506``)."""

    @pandas_udf(T.DoubleType())
    def _area(s: pd.Series) -> pd.Series:
        def one(b):
            if not b:
                return 0.0
            g = K.from_wkb(b)
            if src_crs and area_crs and src_crs != area_crs:
                g = K.transform(g, src_crs, area_crs)
            return K.area(g)

        return s.map(one)

    return _area(F.col(col) if isinstance(col, str) else col)


@pandas_udf(T.IntegerType())
def _num_parts(s: pd.Series) -> pd.Series:
    return s.map(lambda b: K.num_parts(K.from_wkb(b)) if b else 0)


def st_num_parts(col: Column | str) -> Column:
    """G4 ``partCount`` (reference ``coastline.py:121-127``)."""
    return _num_parts(F.col(col) if isinstance(col, str) else col)


@pandas_udf(T.ArrayType(T.BinaryType()))
def _parts(s: pd.Series) -> pd.Series:
    return s.map(
        lambda b: [K.to_wkb([p]) for p in K.from_wkb(b)] if b else []
    )


def st_dump(df: DataFrame, geom: str = "geometry", part_col: str = "part_geom") -> DataFrame:
    """G4 part extraction: one row per polygon part with ``part_idx``
    (reference ``geom.getPart(i)`` loops)."""
    return df.withColumn("__parts", _parts(F.col(geom))).select(
        "*", F.posexplode("__parts").alias("part_idx", part_col)
    ).drop("__parts")


@pandas_udf(T.BooleanType())
def _touches(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            bool(x) and bool(y) and K.touches(K.from_wkb(x), K.from_wkb(y))
            for x, y in zip(a, b)
        ]
    )


@pandas_udf(T.BooleanType())
def _intersects(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            bool(x) and bool(y) and K.intersects(K.from_wkb(x), K.from_wkb(y))
            for x, y in zip(a, b)
        ]
    )


# NOTE: every branch of these UDFs must tolerate NULL inputs — Spark
# evaluates pandas UDFs on the whole batch even inside when()/otherwise()
# branches, so "guarded" call sites still feed NULL rows through.

@pandas_udf(T.BinaryType())
def _intersection(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            K.to_wkb(K.intersection(K.from_wkb(x), K.from_wkb(y)))
            if x is not None and y is not None else None
            for x, y in zip(a, b)
        ],
        dtype="object",
    )


@pandas_udf(T.BinaryType())
def _difference(a: pd.Series, b: pd.Series) -> pd.Series:
    def one(x, y):
        if x is None:
            return None
        if y is None:
            return x  # difference with nothing removes nothing
        return K.to_wkb(K.difference(K.from_wkb(x), K.from_wkb(y)))

    return pd.Series([one(x, y) for x, y in zip(a, b)], dtype="object")


@pandas_udf(T.BinaryType())
def _union2(a: pd.Series, b: pd.Series) -> pd.Series:
    def one(x, y):
        if not x:
            return y
        if not y:
            return x
        return K.to_wkb(K.union(K.from_wkb(x), K.from_wkb(y)))

    return pd.Series([one(x, y) for x, y in zip(a, b)])


st_touches = _touches
st_intersects = _intersects
st_intersection = _intersection
st_difference = _difference
st_union = _union2


# ------------------------------------------------------------------ bbox join

def with_bbox(df: DataFrame, geom: str = "geometry") -> DataFrame:
    @pandas_udf(
        T.StructType(
            [
                T.StructField("xmin", T.DoubleType()),
                T.StructField("ymin", T.DoubleType()),
                T.StructField("xmax", T.DoubleType()),
                T.StructField("ymax", T.DoubleType()),
            ]
        )
    )
    def _bbox(s: pd.Series) -> pd.DataFrame:
        rows = []
        for b in s:
            if b:
                rows.append(K.bbox(K.from_wkb(b)))
            else:
                rows.append((0.0, 0.0, 0.0, 0.0))
        return pd.DataFrame(rows, columns=["xmin", "ymin", "xmax", "ymax"])

    return df.withColumn("__bbox", _bbox(F.col(geom)))


def bbox_cells(df: DataFrame, cell: float, geom: str = "geometry") -> DataFrame:
    """Explode each geometry to the grid cells its bbox covers —
    the bucketing stage of the distributed spatial join. ``cell``
    should be ~the median feature extent: too small explodes rows,
    too big degrades to few buckets."""
    b = with_bbox(df, geom)
    cells = F.expr(
        f"""flatten(transform(
              sequence(cast(floor(__bbox.xmin / {cell}) as int),
                       cast(floor(__bbox.xmax / {cell}) as int)),
              ix -> transform(
                sequence(cast(floor(__bbox.ymin / {cell}) as int),
                         cast(floor(__bbox.ymax / {cell}) as int)),
                iy -> struct(ix, iy))))"""
    )
    return b.withColumn("__cell", F.explode(cells)).drop("__bbox")


def spatial_candidate_pairs(
    a: DataFrame,
    b: DataFrame,
    cell: float,
    a_id: str,
    b_id: str,
    geom: str = "geometry",
) -> DataFrame:
    """Bucket-join candidate pairs (a_id, b_id, geometries), deduped.
    Exact predicates are applied downstream by the caller."""
    ac = bbox_cells(a.select(F.col(a_id), F.col(geom).alias("__ag")), cell, "__ag")
    bc = bbox_cells(b.select(F.col(b_id), F.col(geom).alias("__bg")), cell, "__bg")
    return (
        ac.join(bc, ac["__cell"] == bc["__cell"])
        .dropDuplicates([a_id, b_id])
        .select(a_id, b_id, "__ag", "__bg")
    )


# ------------------------------------------------------------------ dissolve

#: Auto-salt slice size: groups above this feature count trigger the
#: hierarchical two-stage union.  The reference's own cities dissolve
#: (~500 features per CDTFA key, bunny.py:264-270) is exactly the
#: skewed shape this catches.
_AUTO_SALT_SLICE = 256


def _auto_n_salt(max_group_n: int | None) -> int | None:
    """Salt count so hot groups union in ~``_AUTO_SALT_SLICE``-feature
    slices; None (single-stage) when no group is hot.  Capped at 64 —
    past that the second-stage merge of partials dominates."""
    if not max_group_n or max_group_n <= _AUTO_SALT_SLICE:
        return None
    return min(64, -(-max_group_n // _AUTO_SALT_SLICE))


def _max_group_count(df: DataFrame, keys: Sequence[str]) -> int | None:
    """Largest per-key feature count — one map-side-combinable
    pre-count job whose shuffle carries a single row per group, then a
    scalar max.  This is the 'cheap pre-count' skew probe: its cost is
    group-cardinality, not data volume."""
    row = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.max("__n").alias("__m"))
        .first()
    )
    return row["__m"] if row else None


def dissolve(
    df: DataFrame,
    keys: Sequence[str],
    geom: str = "geometry",
    carry: Sequence[str] = (),
    n_salt: int | None = None,
) -> DataFrame:
    """A1 Dissolve (reference ``bunny.py:264-270, 312-324``): merge all
    features sharing ``keys`` into one multipart feature via n-ary
    geometric union. ``carry`` columns take the group's first value in
    key order (ArcGIS FIRST statistic). One shuffle on the keys.

    ``n_salt``: hierarchical skew-safe mode — every row gets a
    deterministic content salt (xxhash64 of the geometry bytes, stable
    under plan re-evaluation), a first stage unions each
    ``(keys, salt)`` slice in parallel, and a second stage merges the
    ≤ ``n_salt`` partial unions per key.  A hot key holding millions
    of features then costs ``n_salt`` bounded tasks plus one tiny
    merge instead of funneling everything through one
    ``applyInPandas`` task.  Geometric union is associative and
    commutative, so the result equals the single-stage dissolve
    (property-tested in test_geo_ops).

    ``n_salt=None`` (the default, r4) AUTO-DETECTS: a cheap pre-count
    (one row per group shuffled, map-side combined) finds the largest
    group; groups beyond ``_AUTO_SALT_SLICE`` features switch the plan
    to the hierarchical mode sized so each first-stage slice unions
    ~``_AUTO_SALT_SLICE`` geometries.  Pass ``n_salt=1`` to force the
    single-stage plan, or an explicit count to skip the probe.
    Expensive input lineage is checkpoint-truncated first so the probe
    job and the union job don't recompute it."""
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    if n_salt is None:
        df = _materialize_for_multipass(df)
        n_salt = _auto_n_salt(_max_group_count(df, keys))
    if n_salt is not None and n_salt <= 1:
        n_salt = None
    out_fields = [df.schema[k] for k in keys]
    out_fields += [df.schema[c] for c in carry]
    out_fields.append(T.StructField(geom, T.BinaryType()))
    out_schema = T.StructType(out_fields)
    key_list = list(keys)
    carry_list = list(carry)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        geoms = [K.from_wkb(b) for b in pdf[geom] if b]
        merged = K.to_wkb(K.union_all(geoms))
        row = {k: [pdf[k].iloc[0]] for k in key_list}
        for c in carry_list:
            row[c] = [pdf[c].iloc[0]]
        row[geom] = [merged]
        return pd.DataFrame(row)

    if not n_salt:
        return df.groupBy(*key_list).applyInPandas(merge, out_schema)

    partial_schema = T.StructType(
        [*out_fields[:-1], T.StructField("__salt", T.LongType()),
         T.StructField(geom, T.BinaryType())]
    )

    def merge_partial(pdf: pd.DataFrame) -> pd.DataFrame:
        geoms = [K.from_wkb(b) for b in pdf[geom] if b]
        merged = K.to_wkb(K.union_all(geoms))
        row = {k: [pdf[k].iloc[0]] for k in key_list}
        for c in carry_list:
            row[c] = [pdf[c].iloc[0]]
        row["__salt"] = [pdf["__salt"].iloc[0]]
        row[geom] = [merged]
        return pd.DataFrame(row)

    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(geom)), F.lit(n_salt))
    )
    partial = salted.groupBy(*key_list, "__salt").applyInPandas(
        merge_partial, partial_schema
    )
    return partial.groupBy(*key_list).applyInPandas(merge, out_schema)


# ---------------------------------------------------- grouped union

def _grouped_union(
    pairs: DataFrame,
    key_field: T.StructField,
    wkb_col: str,
    out_name: str,
    n_salt: int | None = None,
) -> DataFrame:
    """Union all ``wkb_col`` geometries per key into one geometry —
    the shared aggregation under erase / union-overlay coverage and
    (structurally) dissolve. ``n_salt`` enables the same hierarchical
    skew-safe two-stage union as :func:`dissolve`: a county matched by
    millions of coastal polygons otherwise funnels them all through
    one ``applyInPandas`` task.

    ``n_salt=None`` auto-detects skew like :func:`dissolve`; since
    ``pairs`` is normally a candidate join, auto mode checkpoint-
    truncates it first so the probe and the union reuse one
    materialization.  ``n_salt=1`` forces single-stage."""
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    key = key_field.name
    if n_salt is None:
        pairs = _materialize_for_multipass(pairs)
        n_salt = _auto_n_salt(_max_group_count(pairs, [key]))
    if n_salt is not None and n_salt <= 1:
        n_salt = None
    schema = T.StructType([key_field, T.StructField(out_name, T.BinaryType())])

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        geoms = [K.from_wkb(b) for b in pdf[wkb_col] if b]
        return pd.DataFrame(
            {key: [pdf[key].iloc[0]], out_name: [K.to_wkb(K.union_all(geoms))]}
        )

    if not n_salt:
        return pairs.groupBy(key).applyInPandas(merge, schema)

    mid_schema = T.StructType(
        [key_field, T.StructField("__salt", T.LongType()),
         T.StructField(wkb_col, T.BinaryType())]
    )

    def merge_partial(pdf: pd.DataFrame) -> pd.DataFrame:
        geoms = [K.from_wkb(b) for b in pdf[wkb_col] if b]
        return pd.DataFrame(
            {
                key: [pdf[key].iloc[0]],
                "__salt": [pdf["__salt"].iloc[0]],
                wkb_col: [K.to_wkb(K.union_all(geoms))],
            }
        )

    salted = pairs.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(wkb_col)), F.lit(n_salt))
    )
    partial = salted.groupBy(key, "__salt").applyInPandas(
        merge_partial, mid_schema
    )
    return partial.groupBy(key).applyInPandas(merge, schema)


# ------------------------------------------------------------------ erase

def erase(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    cell: float,
    geom: str = "geometry",
    n_salt: int | None = None,
) -> DataFrame:
    """J3 Erase (reference ``bunny.py:393-396``): subtract the union of
    all intersecting ``right`` coverage from each ``left`` feature
    (counties minus cities → unincorporated).

    Relational form: bucket-join candidates → exact intersects filter
    → per-left union of matching right geometries (``n_salt`` opts
    into the hierarchical skew-safe union, see :func:`_grouped_union`)
    → one difference per left row; unmatched left rows pass through
    whole. Empty results (fully covered) are dropped, matching ArcGIS.

    ``left_id`` MUST be deterministic under plan re-evaluation (a real
    key or a content hash — NOT monotonically_increasing_id): the plan
    references ``left`` twice and re-evaluated ids would not line up."""
    cand = spatial_candidate_pairs(
        left.select(left_id, geom),
        right.select(F.monotonically_increasing_id().alias("__rid"), geom),
        cell, left_id, "__rid", geom,
    ).filter(_intersects(F.col("__ag"), F.col("__bg")))

    covers = _grouped_union(
        cand, left.schema[left_id], "__bg", "__cover", n_salt
    )
    joined = left.join(covers, left_id, "left")
    erased = joined.withColumn(
        geom,
        F.when(F.col("__cover").isNull(), F.col(geom)).otherwise(
            _difference(F.col(geom), F.col("__cover"))
        ),
    ).drop("__cover")
    return erased.filter(st_area(geom) > 0)


# ------------------------------------------------------------------ overlay

def union_overlay(
    a: DataFrame,
    b: DataFrame,
    a_id: str,
    b_id: str,
    cell: float,
    geom: str = "geometry",
    n_salt: int | None = None,
) -> DataFrame:
    """J2 Union overlay (reference ``coastline.py:49-52``): output =
    all pairwise intersections + each input's remainder after
    subtracting the other layer, attributes NULL-filled where absent,
    with ``FID_*`` provenance columns (ArcGIS semantics; attribute
    columns should be pre-renamed to avoid collisions).

    Composition: bucket-join → exact intersection pieces; remainders
    via per-feature difference against the union of its bucket-mates;
    three-way unionByName. ``a_id``/``b_id`` must be deterministic
    under re-evaluation (see :func:`erase`)."""
    a_attrs = [c for c in a.columns if c != geom]
    b_attrs = [c for c in b.columns if c != geom]

    cand = spatial_candidate_pairs(a, b, cell, a_id, b_id, geom)
    inter = (
        cand.withColumn("__ig", _intersection(F.col("__ag"), F.col("__bg")))
        .filter(st_area("__ig") > 0)
    )
    pieces = (
        inter.select(a_id, b_id, F.col("__ig").alias(geom))
        .join(a.select(*a_attrs), a_id)
        .join(b.select(*b_attrs), b_id)
        .select(
            *a_attrs, *[c for c in b_attrs if c != b_id], b_id, geom,
            F.col(a_id).alias("FID_a"), F.col(b_id).alias("FID_b"),
        )
    )

    def remainder(side: DataFrame, side_id: str, own: str, other: str) -> DataFrame:
        hits = inter.select(side_id, F.col(other).alias("__og"))
        covers = _grouped_union(
            hits, side.schema[side_id], "__og", "__cover", n_salt
        )
        rem = side.join(covers, side_id, "left").withColumn(
            geom,
            F.when(F.col("__cover").isNull(), F.col(geom)).otherwise(
                _difference(F.col(geom), F.col("__cover"))
            ),
        ).drop("__cover")
        return rem.filter(st_area(geom) > 0)

    a_rem = remainder(a, a_id, "__ag", "__bg").withColumn("FID_a", F.col(a_id)).withColumn(
        "FID_b", F.lit(None).cast(b.schema[b_id].dataType)
    )
    b_rem = remainder(b, b_id, "__bg", "__ag").withColumn("FID_b", F.col(b_id)).withColumn(
        "FID_a", F.lit(None).cast(a.schema[a_id].dataType)
    )
    return pieces.unionByName(a_rem, allowMissingColumns=True).unionByName(
        b_rem, allowMissingColumns=True
    )


# ------------------------------------------------------------------ sliver fix

def fix_slivers(
    df: DataFrame,
    group_col: str,
    row_id: str,
    threshold_m2: float,
    keep_list: Sequence[bytes] = (),
    area_src_crs: str | None = None,
    geom: str = "geometry",
) -> DataFrame:
    """§2.8 sliver fix, relational rewrite of the reference's cursor
    algorithm (``coastline.py:68-149``): within each ``group_col``
    group, every polygon part smaller than ``threshold_m2`` (measured
    in EPSG:3857 when ``area_src_crs`` is given — reference
    ``config.py:59-60``) that is not protected by the keep-list and
    touches a large part of a *different* feature moves to that
    feature. Each sliver moves to the single largest touching big part
    (deterministic; the reference's pairwise two-direction pass is
    cursor-order-dependent — this order-independent form is validated
    against its outcome on the SF triple fixture).

    Plan shape: part explode → size split → within-group pairing
    (groups are places: tiny) → exact touches filter → winner pick via
    window → two shuffles to reassemble features. ``row_id`` must be
    deterministic under re-evaluation (see :func:`erase`).
    """
    parts = st_dump(df.select(group_col, row_id, geom), geom, "part_geom").select(
        group_col,
        row_id,
        "part_idx",
        "part_geom",
        st_area("part_geom", area_src_crs, "EPSG:3857" if area_src_crs else None).alias(
            "part_area"
        ),
    )
    # The plan references parts three times (small side, big side,
    # kept-parts anti-join); persisting avoids re-running the dump +
    # area UDFs per reference. Size = one row per polygon part.
    parts = parts.persist()
    small = parts.filter(F.col("part_area") < threshold_m2)
    big = parts.filter(F.col("part_area") >= threshold_m2).select(
        F.col(group_col).alias("__g2"),
        F.col(row_id).alias("dst_row"),
        F.col("part_geom").alias("big_geom"),
        F.col("part_area").alias("big_area"),
    )

    if keep_list:
        keep_wkb = K.to_wkb(K.union_all([K.from_wkb(k) for k in keep_list]))
        protected = _intersects(F.col("part_geom"), F.lit(keep_wkb))
        small = small.filter(~protected)

    paired = (
        small.join(big, (F.col(group_col) == F.col("__g2")) & (F.col(row_id) != F.col("dst_row")))
        .filter(_touches(F.col("part_geom"), F.col("big_geom")))
    )
    w = Window.partitionBy(row_id, "part_idx").orderBy(F.desc("big_area"), F.asc("dst_row"))
    moves = (
        paired.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            F.col(row_id).alias("src_row"),
            F.col("part_idx").alias("src_part"),
            "dst_row",
            F.col("part_geom").alias("moved_geom"),
        )
    )

    outgoing = moves.select(
        F.col("src_row").alias(row_id), F.col("src_part").alias("part_idx")
    )
    kept = parts.join(outgoing, [row_id, "part_idx"], "left_anti").select(
        row_id, F.col("part_geom").alias("__pg")
    )
    incoming = moves.select(F.col("dst_row").alias(row_id), F.col("moved_geom").alias("__pg"))
    all_parts = kept.unionByName(incoming)

    geom_schema = T.StructType([df.schema[row_id], T.StructField(geom, T.BinaryType())])

    def reunite(pdf: pd.DataFrame) -> pd.DataFrame:
        geoms = [K.from_wkb(b) for b in pdf["__pg"] if b]
        return pd.DataFrame(
            {row_id: [pdf[row_id].iloc[0]], geom: [K.to_wkb(K.union_all(geoms))]}
        )

    rebuilt = all_parts.groupBy(row_id).applyInPandas(reunite, geom_schema)
    return df.drop(geom).join(rebuilt, row_id, "left").withColumn(
        geom, F.coalesce(F.col(geom), F.lit(K.to_wkb([])))
    )
