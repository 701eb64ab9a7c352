"""Geometry operator queries (reference parity A1/J2/J3/G1-G10/§2.8).

The driver's testdata has no geometry tables, so each query builds its
deterministic micro-polygon fixture inline (FIXTURES.md §4/§5 shapes)
and reduces the geometric result to numeric summaries. The DuckDB
oracle is then a literal VALUES table of the hand-computed golden
values — stronger than the rows-only check: the value hash must match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gis_city_county_spark.geo import kernel as K
from gis_city_county_spark.geo.ops import (
    dissolve,
    erase,
    fix_slivers,
    st_area,
    st_num_parts,
    union_overlay,
)
from gis_city_county_spark.suite import QuerySpec


def _rect(x0, y0, x1, y1) -> bytes:
    return K.to_wkb(
        [([(float(x0), float(y0)), (float(x1), float(y0)),
           (float(x1), float(y1)), (float(x0), float(y1))], [])]
    )


_SCHEMA = T.StructType(
    [
        T.StructField("OBJECTID", T.LongType()),
        T.StructField("COUNTY", T.StringType()),
        T.StructField("CITY", T.StringType()),
        T.StructField("COPRI", T.StringType()),
        T.StructField("geometry", T.BinaryType()),
    ]
)


def _boundaries(spark: SparkSession) -> DataFrame:
    """FIXTURES.md §4-shaped CDTFA micro-fixture: annexation slivers
    per city (dissolve is non-trivial), island parts, two counties."""
    rows = [
        (1, "Alameda", "Alameda", "01001", _rect(0, 0, 4, 4)),
        (2, "Alameda", "Alameda", "01001", _rect(4, 0, 6, 4)),
        (3, "Alameda", "Alameda", "01001", _rect(10, 0, 12, 2)),
        (4, "Alameda", "Unincorporated", "01000", _rect(0, 0, 20, 10)),
        (5, "Butte", "Gridley", "02001", _rect(30, 0, 32, 2)),
        (6, "Butte", "Unincorporated", "02000", _rect(30, 0, 40, 10)),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def q_geo_dissolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    cities = _boundaries(spark).filter(F.col("CITY") != "Unincorporated")
    d = dissolve(cities, ["CITY", "COPRI"], carry=["COUNTY"])
    return d.select(
        "CITY", "COPRI", "COUNTY",
        st_area("geometry").alias("area_m2"),
        st_num_parts("geometry").alias("n_parts"),
    )


_DISSOLVE_ORACLE = """
SELECT * FROM (VALUES
  ('Alameda', '01001', 'Alameda', 28.0, 2),
  ('Gridley', '02001', 'Butte', 4.0, 1)
) AS t(CITY, COPRI, COUNTY, area_m2, n_parts)
"""


def q_geo_erase(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _boundaries(spark)
    counties = b.filter(F.col("CITY") == "Unincorporated")
    cities = b.filter(F.col("CITY") != "Unincorporated")
    out = erase(counties, cities, "OBJECTID", cell=8.0)
    return out.select(
        "OBJECTID", "COUNTY",
        st_area("geometry").alias("area_m2"),
    )


_ERASE_ORACLE = """
SELECT * FROM (VALUES
  (CAST(4 AS BIGINT), 'Alameda', 172.0),
  (CAST(6 AS BIGINT), 'Butte', 96.0)
) AS t(OBJECTID, COUNTY, area_m2)
"""


def q_geo_sliver_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SF triple case (reference ``coastline.py:91-102``) plus a
    keep-list-protected sliver."""
    land = _rect(0, 0, 100, 100)
    bay_sliver = [([(0.0, 100.0), (10.0, 100.0), (10.0, 102.0), (0.0, 102.0)], [])]
    protected = [([(150.0, 100.0), (152.0, 100.0), (152.0, 102.0), (150.0, 102.0)], [])]
    bay = K.to_wkb(K.from_wkb(_rect(100, 0, 200, 100)) + bay_sliver + protected)
    rows = [
        (1, "San Francisco", land),
        (2, "San Francisco", bay),
        (3, "San Francisco", _rect(0, -200, 200, 0)),
    ]
    df = spark.createDataFrame(rows, ["rid", "GNIS_PLACE_NAME", "geometry"])
    out = fix_slivers(
        df, "GNIS_PLACE_NAME", "rid", threshold_m2=1000.0,
        keep_list=[K.to_wkb(protected)],
    )
    return out.select("rid", st_area("geometry").alias("area_m2"))


_SLIVER_ORACLE = """
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), 10020.0),
  (CAST(2 AS BIGINT), 10004.0),
  (CAST(3 AS BIGINT), 40000.0)
) AS t(rid, area_m2)
"""


def q_geo_union_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 Union overlay (reference ``coastline.py:49-52``): coastal
    jurisdiction x ocean polygon -> intersection piece + both
    remainders with FID provenance."""
    juris = spark.createDataFrame(
        [(1, "Pacifica", _rect(0, 0, 10, 10))], ["jid", "NAME", "geometry"]
    )
    ocean = spark.createDataFrame(
        [(101, "ocean", _rect(8, 0, 20, 10))], ["oid", "OFFSHORE", "geometry"]
    )
    out = union_overlay(juris, ocean, "jid", "oid", cell=16.0)
    return out.select(
        F.coalesce(F.col("NAME"), F.lit("")).alias("NAME"),
        F.coalesce(F.col("OFFSHORE"), F.lit("")).alias("OFFSHORE"),
        F.col("FID_a").cast("long").alias("FID_a"),
        F.col("FID_b").cast("long").alias("FID_b"),
        st_area("geometry").alias("area_m2"),
    )


_OVERLAY_ORACLE = """
SELECT * FROM (VALUES
  ('Pacifica', 'ocean', CAST(1 AS BIGINT), CAST(101 AS BIGINT), 20.0),
  ('Pacifica', '', CAST(1 AS BIGINT), CAST(NULL AS BIGINT), 80.0),
  ('', 'ocean', CAST(NULL AS BIGINT), CAST(101 AS BIGINT), 100.0)
) AS t(NAME, OFFSHORE, FID_a, FID_b, area_m2)
"""


def q_geo_area_crs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2/G3: area of a lon/lat square computed in EPSG:3310 and
    converted to mi² (reference ``bunny.py:500-506``). The oracle value
    is the kernel's own deterministic double (embedded at import)."""
    d = 0.1
    sq = K.to_wkb([([(-121.0, 37.0), (-121.0 + d, 37.0),
                     (-121.0 + d, 37.0 + d), (-121.0, 37.0 + d)], [])])
    df = spark.createDataFrame([(1, sq)], ["id", "geometry"])
    m2 = st_area("geometry", "EPSG:4326", "EPSG:3310")
    return df.select(
        "id",
        m2.alias("area_m2"),
        (m2 / F.lit(2_589_988.110336)).alias("area_sqmi"),
    )


def _expected_area() -> tuple[float, float]:
    d = 0.1
    sq = [([(-121.0, 37.0), (-121.0 + d, 37.0),
            (-121.0 + d, 37.0 + d), (-121.0, 37.0 + d)], [])]
    m2 = K.area(K.transform(sq, "EPSG:4326", "EPSG:3310"))
    return m2, m2 / 2_589_988.110336


_M2, _SQMI = _expected_area()
# doubles go through VARCHAR: DuckDB types bare decimal literals as
# DECIMAL and its DECIMAL->DOUBLE conversion is not correctly rounded
# (same quirk functions.numeric.dec_sum_sql works around).
_AREA_ORACLE = f"""
SELECT * FROM (VALUES
  (1, CAST('{_M2!r}' AS DOUBLE), CAST('{_SQMI!r}' AS DOUBLE))
) AS t(id, area_m2, area_sqmi)
"""


def q_geo_rotated_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-rectilinear goldens for the general clipping kernel: the
    same A1/J2/J3/§2.8 operators exercised by the axis-parallel
    fixtures, on 45°-rotated polygons with hand-computed areas.

    - dissolve: two unit diamonds sharing a full diagonal edge
      ((2,0),(4,2),(2,4),(0,2)) + ((4,2),(6,4),(4,6),(2,4)) → one part,
      area 8 + 8 = 16.
    - erase (J3): right triangle (0,0),(10,0),(0,10) (area 50) minus a
      strictly-interior diamond (3,1),(5,3),(3,5),(1,3) (area 8) →
      one part with a hole, area 42.
    - union overlay (J2): diamond (2,0),(4,2),(2,4),(0,2) (area 8) ×
      square [2,4]×[0,2] (area 4); intersection is the triangle
      (2,0),(4,2),(2,2) = 2, remainders 6 and 2.
    - sliver fix (§2.8): land = rotated square (0,100),(100,0),
      (200,100),(100,200) (area 20000); bay = big triangle
      (200,100),(300,0),(300,200) (area 10000) + a 400 m² sliver
      triangle glued to the seaward side of land's x+y=300 edge
      ((160,140),(140,160),(170,170)) → sliver moves to land:
      20400 / 10000.

    All vertices are integers and every crossing lies on a vertex or
    an axis-parallel/45° lattice point, so the areas are exact doubles
    and the oracle is a literal VALUES table."""

    def mp(*pts):
        return K.to_wkb([([tuple(map(float, p)) for p in pts], [])])

    d1 = mp((2, 0), (4, 2), (2, 4), (0, 2))
    d2 = mp((4, 2), (6, 4), (4, 6), (2, 4))
    dis = dissolve(
        spark.createDataFrame(
            [("d", d1), ("d", d2)], ["k", "geometry"]
        ),
        ["k"],
    ).select(
        F.concat(F.lit("dissolve_"), F.col("k")).alias("case_name"),
        st_area("geometry").alias("area"),
        st_num_parts("geometry").alias("n_parts"),
    )

    tri = mp((0, 0), (10, 0), (0, 10))
    inner = mp((3, 1), (5, 3), (3, 5), (1, 3))
    er = erase(
        spark.createDataFrame([(1, tri)], ["eid", "geometry"]),
        spark.createDataFrame([(2, inner)], ["eid", "geometry"]),
        "eid",
        cell=16.0,
    ).select(
        F.lit("erase_tri").alias("case_name"),
        st_area("geometry").alias("area"),
        st_num_parts("geometry").alias("n_parts"),
    )

    juris = spark.createDataFrame([(1, d1)], ["jid", "geometry"])
    ocean = spark.createDataFrame(
        [(101, mp((2, 0), (4, 0), (4, 2), (2, 2)))], ["oid", "geometry"]
    )
    ov = union_overlay(juris, ocean, "jid", "oid", cell=16.0).select(
        F.concat(
            F.lit("overlay_"),
            F.when(F.col("FID_a").isNotNull() & F.col("FID_b").isNotNull(), "both")
            .when(F.col("FID_a").isNotNull(), "a_only")
            .otherwise("b_only"),
        ).alias("case_name"),
        st_area("geometry").alias("area"),
        st_num_parts("geometry").alias("n_parts"),
    )

    land = mp((0, 100), (100, 0), (200, 100), (100, 200))
    bay_big = [([(200.0, 100.0), (300.0, 0.0), (300.0, 200.0)], [])]
    sliver = [([(160.0, 140.0), (140.0, 160.0), (170.0, 170.0)], [])]
    bay = K.to_wkb(K.make_valid(bay_big + sliver))
    sl = fix_slivers(
        spark.createDataFrame(
            [(1, "SF", land), (2, "SF", bay)], ["rid", "GNIS_PLACE_NAME", "geometry"]
        ),
        "GNIS_PLACE_NAME",
        "rid",
        threshold_m2=1000.0,
    ).select(
        F.concat(F.lit("sliver_"), F.col("rid")).alias("case_name"),
        st_area("geometry").alias("area"),
        st_num_parts("geometry").alias("n_parts"),
    )

    return dis.unionByName(er).unionByName(ov).unionByName(sl)


_ROTATED_ORACLE = """
SELECT * FROM (VALUES
  ('dissolve_d', 16.0, 1),
  ('erase_tri', 42.0, 1),
  ('overlay_both', 2.0, 1),
  ('overlay_a_only', 6.0, 1),
  ('overlay_b_only', 2.0, 1),
  ('sliver_1', 20400.0, 1),
  ('sliver_2', 10000.0, 1)
) AS t(case_name, area, n_parts)
"""


def q_knn_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-BIG spatial kNN join — the variant broadcast can't save:
    customer points find their 3 nearest order points within radius 2
    (cell size = radius, 3×3 neighbor-cell equi-join → exact distance
    refine → per-probe top-k window). No broadcast, no theta join:
    the only shuffle keys are grid cells, so the plan survives both
    sides growing 1000× (skew bounded by cell density; shrink the
    cell to split hot areas)."""
    from gis_city_county_spark.sources.tables import load_table

    r = 2.0
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = cust.select(
        F.col("c_custkey").alias("aid"),
        ((F.col("c_custkey") % 1000).cast("double") / 10.0).alias("ax"),
        (((F.col("c_custkey") * 7) % 1000).cast("double") / 10.0).alias("ay"),
    )
    b = orders.select(
        F.col("o_orderkey").alias("bid"),
        ((F.col("o_orderkey") % 1000).cast("double") / 10.0).alias("bx"),
        (((F.col("o_orderkey") * 13) % 1000).cast("double") / 10.0).alias("by"),
    ).withColumns(
        {
            "cx": F.floor(F.col("bx") / r).cast("long"),
            "cy": F.floor(F.col("by") / r).cast("long"),
        }
    )
    probes = a.select(
        "aid", "ax", "ay",
        F.explode(
            F.expr(f"sequence(CAST(floor(ax/{r}) AS BIGINT) - 1, CAST(floor(ax/{r}) AS BIGINT) + 1)")
        ).alias("cx"),
    ).select(
        "*",
        F.explode(
            F.expr(f"sequence(CAST(floor(ay/{r}) AS BIGINT) - 1, CAST(floor(ay/{r}) AS BIGINT) + 1)")
        ).alias("cy"),
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    w = Window.partitionBy("aid").orderBy(F.asc("dist2"), F.asc("bid"))
    return (
        probes.join(b, ["cx", "cy"])
        .withColumn("dist2", d2)
        .filter(F.col("dist2") <= F.lit(r * r))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("aid", "rank", "bid", "dist2")
    )


_KNN_JOIN_ORACLE = """
WITH a AS (
  SELECT c_custkey AS aid,
         CAST(c_custkey % 1000 AS DOUBLE) / 10.0 AS ax,
         CAST((c_custkey * 7) % 1000 AS DOUBLE) / 10.0 AS ay
  FROM customer
),
b AS (
  SELECT o_orderkey AS bid,
         CAST(o_orderkey % 1000 AS DOUBLE) / 10.0 AS bx,
         CAST((o_orderkey * 13) % 1000 AS DOUBLE) / 10.0 AS by,
         CAST(FLOOR((CAST(o_orderkey % 1000 AS DOUBLE) / 10.0) / 2.0) AS BIGINT) AS cx,
         CAST(FLOOR((CAST((o_orderkey * 13) % 1000 AS DOUBLE) / 10.0) / 2.0) AS BIGINT) AS cy
  FROM orders
),
probes AS (
  SELECT aid, ax, ay,
         CAST(FLOOR(ax / 2.0) AS BIGINT) + dx.d AS cx,
         CAST(FLOOR(ay / 2.0) AS BIGINT) + dy.d AS cy
  FROM a,
       LATERAL UNNEST([-1, 0, 1]) AS dx(d),
       LATERAL UNNEST([-1, 0, 1]) AS dy(d)
),
cand AS (
  SELECT p.aid, b.bid,
         (p.ax - b.bx) * (p.ax - b.bx) + (p.ay - b.by) * (p.ay - b.by) AS dist2
  FROM probes p JOIN b USING (cx, cy)
)
SELECT aid, CAST(rank AS INTEGER) AS rank, bid, dist2
FROM (
  SELECT aid, bid, dist2,
         ROW_NUMBER() OVER (PARTITION BY aid ORDER BY dist2 ASC, bid ASC) AS rank
  FROM cand WHERE dist2 <= 4.0
) t
WHERE rank <= 3
"""


def q_cell_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon rasterization to a density surface: per 10×10 grid
    cell, how many of the deterministic rectangles touch it and how
    much area they cover in it (rectilinear clip — exact: every
    coordinate is an integer-valued double, so products and sums are
    exact in IEEE regardless of order). The heatmap/zonal-statistics
    shape: explode each polygon to its covering cells, clip, aggregate
    by cell — no join against a point set at all."""
    rects = spark.range(40).select(
        F.col("id").alias("rect_id"),
        ((F.col("id") * 37) % 90).cast("double").alias("x0"),
        ((F.col("id") * 53) % 90).cast("double").alias("y0"),
        (3 + F.col("id") % 7).cast("double").alias("w"),
        (3 + F.col("id") % 5).cast("double").alias("h"),
    )
    cells = rects.select(
        "*",
        F.explode(
            F.expr("sequence(CAST(floor(x0/10) AS BIGINT), CAST(floor((x0+w)/10) AS BIGINT))")
        ).alias("cx"),
    ).select(
        "*",
        F.explode(
            F.expr("sequence(CAST(floor(y0/10) AS BIGINT), CAST(floor((y0+h)/10) AS BIGINT))")
        ).alias("cy"),
    )
    ow = F.least(F.col("x0") + F.col("w"), (F.col("cx") + 1) * 10.0) - F.greatest(
        F.col("x0"), F.col("cx") * 10.0
    )
    oh = F.least(F.col("y0") + F.col("h"), (F.col("cy") + 1) * 10.0) - F.greatest(
        F.col("y0"), F.col("cy") * 10.0
    )
    return (
        cells.withColumn("ov", ow * oh)
        .filter(F.col("ov") > 0)
        .groupBy("cx", "cy")
        .agg(
            F.count(F.lit(1)).alias("n_rects"),
            F.sum("ov").alias("covered_area"),
        )
    )


_CELL_COVERAGE_ORACLE = """
WITH rects AS (
  SELECT id AS rect_id,
         CAST((id * 37) % 90 AS DOUBLE) AS x0,
         CAST((id * 53) % 90 AS DOUBLE) AS y0,
         CAST(3 + id % 7 AS DOUBLE) AS w,
         CAST(3 + id % 5 AS DOUBLE) AS h
  FROM range(40) t(id)
),
cells AS (
  SELECT r.*, gx.cx, gy.cy
  FROM rects r,
       LATERAL UNNEST(generate_series(CAST(FLOOR(x0/10) AS BIGINT),
                                      CAST(FLOOR((x0+w)/10) AS BIGINT))) AS gx(cx),
       LATERAL UNNEST(generate_series(CAST(FLOOR(y0/10) AS BIGINT),
                                      CAST(FLOOR((y0+h)/10) AS BIGINT))) AS gy(cy)
),
clipped AS (
  SELECT cx, cy,
         (least(x0 + w, (cx + 1) * 10.0) - greatest(x0, cx * 10.0))
         * (least(y0 + h, (cy + 1) * 10.0) - greatest(y0, cy * 10.0)) AS ov
  FROM cells
)
SELECT cx, cy, COUNT(*) AS n_rects,
       CAST(SUM(ov) AS DOUBLE) AS covered_area
FROM clipped WHERE ov > 0
GROUP BY cx, cy
"""


def q_grid_refine_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spatial-join SCALE path, benchable: synthetic points derived
    from lineitem keys against 40 deterministic rectangles, joined in
    the standard two stages — (1) coarse 10×10 grid-cell equi-join
    (each rectangle explodes to its ≤4 covering cells, each point to
    exactly one cell: a plain hash join, never a theta join), then
    (2) exact half-open containment refine as JVM comparisons.
    Per-rectangle point count + revenue. This is exactly the plan
    shape ``geo.ops`` uses for overlays (bbox grid then exact kernel),
    here with a DuckDB oracle since rectilinear containment needs no
    geometry kernel — so the strategy itself is hash-verified at
    warehouse scale, not just on golden fixtures."""
    from gis_city_county_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        ((F.col("l_orderkey") % 10000).cast("double") / 100.0).alias("px"),
        ((F.col("l_partkey") % 10000).cast("double") / 100.0).alias("py"),
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("rev"),
    ).withColumns(
        {
            "cx": F.floor(F.col("px") / 10).cast("long"),
            "cy": F.floor(F.col("py") / 10).cast("long"),
        }
    )
    rects = spark.range(40).select(
        F.col("id").alias("rect_id"),
        ((F.col("id") * 37) % 90).cast("double").alias("x0"),
        ((F.col("id") * 53) % 90).cast("double").alias("y0"),
        (3 + F.col("id") % 7).cast("double").alias("w"),
        (3 + F.col("id") % 5).cast("double").alias("h"),
    )
    cells = rects.select(
        "rect_id", "x0", "y0", "w", "h",
        F.explode(
            F.expr("sequence(CAST(floor(x0/10) AS BIGINT), CAST(floor((x0+w)/10) AS BIGINT))")
        ).alias("cx"),
    ).select(
        "*",
        F.explode(
            F.expr("sequence(CAST(floor(y0/10) AS BIGINT), CAST(floor((y0+h)/10) AS BIGINT))")
        ).alias("cy"),
    )
    joined = pts.join(F.broadcast(cells), ["cx", "cy"]).filter(
        (F.col("px") >= F.col("x0"))
        & (F.col("px") < F.col("x0") + F.col("w"))
        & (F.col("py") >= F.col("y0"))
        & (F.col("py") < F.col("y0") + F.col("h"))
    )
    from gis_city_county_spark.functions.numeric import dec_sum

    # No orderBy: the driver's compare is order-insensitive and a
    # global sort would add a range Exchange for nothing.
    return joined.groupBy("rect_id").agg(
        F.count(F.lit(1)).alias("n_points"), dec_sum("rev", "revenue")
    )


def _grid_refine_oracle() -> str:
    from gis_city_county_spark.functions.numeric import dec_sum_sql

    return f"""
WITH pts AS (
  SELECT CAST(l_orderkey % 10000 AS DOUBLE) / 100.0 AS px,
         CAST(l_partkey % 10000 AS DOUBLE) / 100.0 AS py,
         l_extendedprice * (1.0 - l_discount) AS rev
  FROM lineitem
),
rects AS (
  SELECT id AS rect_id,
         CAST((id * 37) % 90 AS DOUBLE) AS x0,
         CAST((id * 53) % 90 AS DOUBLE) AS y0,
         CAST(3 + id % 7 AS DOUBLE) AS w,
         CAST(3 + id % 5 AS DOUBLE) AS h
  FROM (SELECT unnest(generate_series(0, 39)) AS id)
)
SELECT rect_id, COUNT(*) AS n_points, {dec_sum_sql('rev', 'revenue')}
FROM pts JOIN rects
  ON px >= x0 AND px < x0 + w AND py >= y0 AND py < y0 + h
GROUP BY rect_id ORDER BY rect_id
"""


_N_SITES = 40


def q_knn_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-site assignment (k=1 KNN join / Voronoi aggregation),
    benchable at warehouse volume: every synthetic point (integer
    coordinates from lineitem keys) is assigned to the nearest of 40
    broadcast sites, then per-site count and exact mean squared
    distance. The argmin is ONE integer: ``code = d²·64 + site_id``
    (d² exact integer, site_id < 64), so ``MIN(code)`` is a plain
    map-side-combinable aggregate — no window over the ×40 fanout, no
    struct-min portability questions — and ties break toward the
    lowest site id on any engine. The same broadcast-fanout/argmin
    shape is IVF's coarse assignment (similarity.ivf_assign) applied
    to 2-D space."""
    from gis_city_county_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_orderkey") % 10000).alias("xi"),
        (F.col("l_partkey") % 10000).alias("yi"),
    )
    sites = spark.range(_N_SITES).select(
        F.col("id").alias("site_id"),
        ((F.col("id") * 2477) % 10000).alias("sx"),
        ((F.col("id") * 3615) % 10000).alias("sy"),
    )
    code = (
        ((F.col("xi") - F.col("sx")) * (F.col("xi") - F.col("sx"))
         + (F.col("yi") - F.col("sy")) * (F.col("yi") - F.col("sy"))) * 64
        + F.col("site_id")
    )
    best = (
        pts.join(F.broadcast(sites))
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.min(code).alias("best"))
    )
    return (
        best.select(
            (F.col("best") % 64).alias("site_id"),
            F.expr("best div 64").alias("d2"),
        )
        .groupBy("site_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.expr("CAST(sum(d2) AS DECIMAL(38,0)) div count(1)")
            .cast("long")
            .alias("mean_d2"),
        )
        .orderBy("site_id")
    )


_KNN_ORACLE = f"""
WITH pts AS (
  SELECT l_orderkey, l_linenumber,
         l_orderkey % 10000 AS xi, l_partkey % 10000 AS yi
  FROM lineitem
),
sites AS (
  SELECT s AS site_id, (s * 2477) % 10000 AS sx, (s * 3615) % 10000 AS sy
  FROM (SELECT UNNEST(generate_series(0, {_N_SITES - 1})) AS s)
),
best AS (
  SELECT l_orderkey, l_linenumber,
         MIN(((xi - sx) * (xi - sx) + (yi - sy) * (yi - sy)) * 64 + site_id)
           AS best
  FROM pts CROSS JOIN sites
  GROUP BY 1, 2
)
SELECT CAST(best % 64 AS BIGINT) AS site_id,
       COUNT(*) AS n_points,
       CAST(CAST(SUM(best // 64) AS HUGEINT) // COUNT(*) AS BIGINT) AS mean_d2
FROM best GROUP BY 1 ORDER BY 1
"""


SPECS = [
    QuerySpec("geo_grid_refine_density", q_grid_refine_density, _grid_refine_oracle()),
    QuerySpec("geo_knn_join_grid", q_knn_join_grid, _KNN_JOIN_ORACLE),
    QuerySpec("geo_cell_coverage", q_cell_coverage, _CELL_COVERAGE_ORACLE, bench=False),
    QuerySpec("geo_knn_assign", q_knn_assign, _KNN_ORACLE),
    QuerySpec("geo_a1_dissolve", q_geo_dissolve, _DISSOLVE_ORACLE, bench=False),
    QuerySpec("geo_j3_erase", q_geo_erase, _ERASE_ORACLE, bench=False),
    QuerySpec("geo_sliver_fix", q_geo_sliver_fix, _SLIVER_ORACLE, bench=False),
    QuerySpec("geo_j2_union_overlay", q_geo_union_overlay, _OVERLAY_ORACLE, bench=False),
    QuerySpec("geo_g3_area_crs", q_geo_area_crs, _AREA_ORACLE, bench=False),
    QuerySpec("geo_rotated_ops", q_geo_rotated_ops, _ROTATED_ORACLE, bench=False),
]
