"""Geometry operators on Spark: golden micro-polygon fixtures shaped
after the reference pipeline (dissolve → join → erase → overlay →
sliver fix; reference flow ``bunny.py:534-562``/``coastline.py``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gis_city_county_spark.geo import kernel as K
from gis_city_county_spark.geo.ops import (
    dissolve,
    erase,
    fix_slivers,
    geojson_to_wkb,
    st_area,
    st_dump,
    st_make_valid,
    st_num_parts,
    st_touches,
    st_transform,
    union_overlay,
)


def rect_wkb(x0, y0, x1, y1):
    return K.to_wkb([([(float(x0), float(y0)), (float(x1), float(y0)),
                       (float(x1), float(y1)), (float(x0), float(y1))], [])])


SCHEMA = T.StructType(
    [
        T.StructField("OBJECTID", T.LongType()),
        T.StructField("COUNTY", T.StringType()),
        T.StructField("CITY", T.StringType()),
        T.StructField("COPRI", T.StringType()),
        T.StructField("geometry", T.BinaryType()),
    ]
)


@pytest.fixture(scope="module")
def boundaries(spark):
    """Two counties; Alameda city in two disconnected annexation
    pieces + one adjacent piece (dissolve merges 3 rows -> 1 feature,
    2 parts); the rest unincorporated."""
    rows = [
        (1, "Alameda", "Alameda", "01001", rect_wkb(0, 0, 4, 4)),
        (2, "Alameda", "Alameda", "01001", rect_wkb(4, 0, 6, 4)),   # adjacent -> merges
        (3, "Alameda", "Alameda", "01001", rect_wkb(10, 0, 12, 2)),  # island part
        (4, "Alameda", "Unincorporated", "01000", rect_wkb(0, 0, 20, 10)),
        (5, "Butte", "Gridley", "02001", rect_wkb(30, 0, 32, 2)),
        (6, "Butte", "Unincorporated", "02000", rect_wkb(30, 0, 40, 10)),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_dissolve_merges_parts(spark, boundaries):
    cities = boundaries.filter(F.col("CITY") != "Unincorporated")
    d = dissolve(cities, ["CITY", "COPRI"], carry=["COUNTY"])
    got = {r["CITY"]: r for r in d.collect()}
    assert set(got) == {"Alameda", "Gridley"}
    alameda = K.from_wkb(got["Alameda"]["geometry"])
    assert K.num_parts(alameda) == 2          # adjacent pieces merged, island separate
    assert K.area(alameda) == 24.0 + 4.0
    assert got["Alameda"]["COUNTY"] == "Alameda"


def test_erase_unincorporated(spark, boundaries):
    counties = boundaries.filter(F.col("CITY") == "Unincorporated")
    cities = boundaries.filter(F.col("CITY") != "Unincorporated")
    out = erase(counties, cities, "OBJECTID", cell=8.0)
    got = {r["OBJECTID"]: r for r in out.collect()}
    # Alameda county 200 - city 28 = 172; Butte 100 - 4 = 96
    assert st_area
    assert K.area(K.from_wkb(got[4]["geometry"])) == 200.0 - 28.0
    assert K.area(K.from_wkb(got[6]["geometry"])) == 100.0 - 4.0


def test_erase_drops_fully_covered(spark):
    rows = [(1, rect_wkb(0, 0, 2, 2))]
    left = spark.createDataFrame(rows, ["id", "geometry"])
    right = spark.createDataFrame([(9, rect_wkb(-1, -1, 3, 3))], ["id", "geometry"])
    assert erase(left, right, "id", cell=4.0).count() == 0


def test_union_overlay_pieces_and_remainders(spark):
    juris = spark.createDataFrame(
        [(1, "Pacifica", rect_wkb(0, 0, 10, 10))], ["jid", "NAME", "geometry"]
    )
    ocean = spark.createDataFrame(
        [(101, "ocean", rect_wkb(8, 0, 20, 10))], ["oid", "OFFSHORE", "geometry"]
    )
    out = union_overlay(juris, ocean, "jid", "oid", cell=16.0)
    rows = out.collect()
    by_kind = {}
    for r in rows:
        kind = ("a" if r["FID_a"] is not None else "") + ("b" if r["FID_b"] is not None else "")
        by_kind.setdefault(kind, []).append(r)
    # intersection piece: 2x10; land remainder: 8x10; ocean remainder: 10x10
    assert len(by_kind["ab"]) == 1
    assert K.area(K.from_wkb(by_kind["ab"][0]["geometry"])) == 20.0
    assert by_kind["ab"][0]["NAME"] == "Pacifica" and by_kind["ab"][0]["OFFSHORE"] == "ocean"
    assert len(by_kind["a"]) == 1
    assert K.area(K.from_wkb(by_kind["a"][0]["geometry"])) == 80.0
    assert by_kind["a"][0]["OFFSHORE"] is None
    assert len(by_kind["b"]) == 1
    assert K.area(K.from_wkb(by_kind["b"][0]["geometry"])) == 100.0


def test_fix_slivers_sf_triple(spark):
    """The San Francisco case (reference ``coastline.py:91-102``): one
    place split into land / bay / ocean features; a sub-threshold
    sliver part of the bay feature touches the big land part and must
    move to land; protected (keep-list) slivers stay."""
    land = rect_wkb(0, 0, 100, 100)                   # area 10000, big
    bay_big = rect_wkb(100, 0, 200, 100)              # big bay part
    bay_sliver = [([(0.0, 100.0), (10.0, 100.0), (10.0, 102.0), (0.0, 102.0)], [])]
    ocean_big = rect_wkb(0, -200, 200, 0)
    protected_sliver = [([(150.0, 100.0), (152.0, 100.0), (152.0, 102.0), (150.0, 102.0)], [])]
    bay = K.to_wkb(K.from_wkb(bay_big) + bay_sliver + protected_sliver)
    rows = [
        (1, "San Francisco", land),
        (2, "San Francisco", bay),
        (3, "San Francisco", ocean_big),
    ]
    df = spark.createDataFrame(rows, ["rid", "GNIS_PLACE_NAME", "geometry"])
    keep = [K.to_wkb(protected_sliver)]
    out = fix_slivers(
        df, "GNIS_PLACE_NAME", "rid", threshold_m2=1000.0, keep_list=keep
    )
    got = {r["rid"]: K.from_wkb(r["geometry"]) for r in out.collect()}
    # sliver (20 m2) moved from bay to land; protected sliver stayed
    assert K.area(got[1]) == 10000.0 + 20.0
    assert K.area(got[2]) == 10000.0 + 4.0
    assert K.area(got[3]) == 40000.0


def test_fix_slivers_no_eligible_pairs(spark):
    """Places with one polygon are untouched (reference skips <2)."""
    rows = [(1, "Lone", rect_wkb(0, 0, 5, 5))]
    df = spark.createDataFrame(rows, ["rid", "place", "geometry"])
    out = fix_slivers(df, "place", "rid", threshold_m2=1.0)
    assert K.area(K.from_wkb(out.collect()[0]["geometry"])) == 25.0


def test_scalar_ops_roundtrip(spark):
    df = spark.createDataFrame([(1, rect_wkb(0, 0, 3, 3))], ["id", "geometry"])
    row = (
        df.withColumn("geometry", st_make_valid("geometry"))
        .withColumn("a", st_area("geometry"))
        .withColumn("np", st_num_parts("geometry"))
        .collect()[0]
    )
    assert row["a"] == 9.0 and row["np"] == 1

    dumped = st_dump(df)
    assert dumped.count() == 1
    assert dumped.collect()[0]["part_idx"] == 0


def test_transform_and_area_sqmi(spark):
    """G3: area computed in an explicit equal-area CRS from lon/lat
    geometry (reference bunny.py:500-506)."""
    d = 0.1
    sq = K.to_wkb([([(-121.0, 37.0), (-121.0 + d, 37.0),
                     (-121.0 + d, 37.0 + d), (-121.0, 37.0 + d)], [])])
    df = spark.createDataFrame([(1, sq)], ["id", "geometry"])
    row = (
        df.withColumn("m2", st_area("geometry", "EPSG:4326", "EPSG:3310"))
        .withColumn("proj", st_transform("geometry", "EPSG:4326", "EPSG:3310"))
        .collect()[0]
    )
    # ~0.1 deg x 0.1 deg at 37N is ~ 11.1km x 8.9km ~ 98.7e6 m2
    assert 9.0e7 < row["m2"] < 1.1e8
    assert K.area(K.from_wkb(row["proj"])) == pytest.approx(row["m2"])


def test_touches_predicate_on_spark(spark):
    df = spark.createDataFrame(
        [(rect_wkb(0, 0, 2, 2), rect_wkb(2, 0, 4, 2), True),
         (rect_wkb(0, 0, 2, 2), rect_wkb(1, 1, 3, 3), False)],
        ["g1", "g2", "want"],
    )
    rows = df.withColumn("got", st_touches("g1", "g2")).collect()
    for r in rows:
        assert r["got"] == r["want"]


def test_geojson_to_wkb(spark):
    import json

    gj = json.dumps({"type": "Polygon",
                     "coordinates": [[[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]]})
    df = spark.createDataFrame([(1, gj)], ["id", "geometry_json"])
    row = df.withColumn("geometry", geojson_to_wkb("geometry_json")).collect()[0]
    assert K.area(K.from_wkb(row["geometry"])) == 4.0


def test_dissolve_salted_equals_unsalted(spark):
    """Hierarchical (skew-safe) dissolve must agree with the single-
    stage dissolve: geometric union is associative/commutative, so
    partial-union-per-salt then merge is the same set of points."""
    rows = [
        # hot key: 12 touching unit squares in a strip + 1 detached
        *[(i, "HOT", rect_wkb(i, 0, i + 1, 1)) for i in range(12)],
        (100, "HOT", rect_wkb(50, 50, 51, 51)),
        # small key: two disjoint squares
        (200, "COLD", rect_wkb(0, 10, 1, 11)),
        (201, "COLD", rect_wkb(5, 10, 6, 11)),
    ]
    schema = T.StructType([
        T.StructField("OBJECTID", T.LongType()),
        T.StructField("KEY", T.StringType()),
        T.StructField("geometry", T.BinaryType()),
    ])
    df = spark.createDataFrame(rows, schema)
    plain = {r["KEY"]: K.from_wkb(r["geometry"])
             for r in dissolve(df, ["KEY"]).collect()}
    salted = {r["KEY"]: K.from_wkb(r["geometry"])
              for r in dissolve(df, ["KEY"], n_salt=4).collect()}
    assert set(plain) == set(salted) == {"HOT", "COLD"}
    for key in plain:
        a, b = plain[key], salted[key]
        assert K.area(a) == pytest.approx(K.area(b))
        # semantic equality: symmetric difference is empty
        assert K.area(K.difference(a, b)) == pytest.approx(0.0, abs=1e-9)
        assert K.area(K.difference(b, a)) == pytest.approx(0.0, abs=1e-9)
    # the HOT strip fuses into one 12x1 part plus the detached square
    assert K.area(salted["HOT"]) == pytest.approx(13.0)


def test_bowtie_feature_flows_through_repair_dissolve_erase(spark):
    """G1 integration: a source feature arriving with a self-crossing
    (bowtie) ring — the exact malformation arcpy RepairGeometry exists
    for (reference bunny.py:221-226) — must flow through the Spark
    pipeline's repair → dissolve → erase chain with correct areas
    instead of undefined clipper behavior."""
    bowtie = K.to_wkb(
        [([(0.0, 0.0), (20.0, 20.0), (20.0, 0.0), (0.0, 20.0)], [])]
    )
    county = rect_wkb(-10, -10, 30, 30)
    cities = spark.createDataFrame(
        [(1, "Alameda", "Bowtie City", "001", bowtie)], SCHEMA
    ).withColumn("geometry", st_make_valid(F.col("geometry")))
    counties = spark.createDataFrame(
        [(2, "Alameda", None, "001", county)], SCHEMA
    )
    # repaired bowtie = two triangular lobes, total area 200
    repaired = K.from_wkb(cities.collect()[0]["geometry"])
    assert len(repaired) == 2
    assert K.area(repaired) == pytest.approx(200.0)
    d = dissolve(cities, ["CITY"], carry=["COUNTY"])
    merged = K.from_wkb(d.collect()[0]["geometry"])
    assert K.area(merged) == pytest.approx(200.0)
    # unincorporated = county minus the repaired city lobes
    un = erase(counties, d.select("CITY", "geometry"), "OBJECTID", cell=40.0)
    un_geom = K.from_wkb(un.collect()[0]["geometry"])
    assert K.area(un_geom) == pytest.approx(40.0 * 40.0 - 200.0)


def test_erase_and_overlay_salted_equal_unsalted(spark):
    """The shared grouped-union under erase/union-overlay must give
    identical results in hierarchical (n_salt) mode."""
    counties = spark.createDataFrame(
        [(1, "A", None, "001", rect_wkb(0, 0, 40, 40))], SCHEMA
    )
    cities = spark.createDataFrame(
        [(10 + i, "A", f"c{i}", "001", rect_wkb(i * 3, 0, i * 3 + 2, 2))
         for i in range(10)],
        SCHEMA,
    )
    plain = erase(counties, cities, "OBJECTID", cell=20.0).collect()
    salted = erase(counties, cities, "OBJECTID", cell=20.0, n_salt=4).collect()
    assert len(plain) == len(salted) == 1
    g0, g1 = K.from_wkb(plain[0]["geometry"]), K.from_wkb(salted[0]["geometry"])
    assert K.area(g0) == pytest.approx(K.area(g1))
    assert K.area(K.difference(g0, g1)) == pytest.approx(0.0, abs=1e-9)

    ov_plain = union_overlay(
        counties.selectExpr("OBJECTID AS aid", "geometry"),
        cities.selectExpr("OBJECTID AS bid", "geometry"),
        "aid", "bid", cell=20.0,
    )
    ov_salted = union_overlay(
        counties.selectExpr("OBJECTID AS aid", "geometry"),
        cities.selectExpr("OBJECTID AS bid", "geometry"),
        "aid", "bid", cell=20.0, n_salt=4,
    )
    def canon(df):
        rows = [
            (r["FID_a"], r["FID_b"], round(K.area(K.from_wkb(r["geometry"])), 9))
            for r in df.collect()
        ]
        return sorted(rows, key=lambda t: tuple((x is None, x) for x in t))

    assert canon(ov_plain) == canon(ov_salted)


def test_dissolve_auto_salts_hot_groups(spark):
    """n_salt=None (the default) must switch to the hierarchical
    two-stage union on its own when a group exceeds _AUTO_SALT_SLICE
    features — the reference's cities dissolve shape (hundreds of rows
    per key) — and stay single-stage on small groups (VERDICT r3
    item 3: skew safety should not require the caller to know about
    skew)."""
    from gis_city_county_spark.geo.ops import _AUTO_SALT_SLICE, _auto_n_salt

    assert _auto_n_salt(None) is None
    assert _auto_n_salt(_AUTO_SALT_SLICE) is None
    assert _auto_n_salt(_AUTO_SALT_SLICE + 1) == 2
    assert _auto_n_salt(10 ** 9) == 64  # capped

    schema = T.StructType([
        T.StructField("OBJECTID", T.LongType()),
        T.StructField("KEY", T.StringType()),
        T.StructField("geometry", T.BinaryType()),
    ])
    n_hot = _AUTO_SALT_SLICE + 44
    rows = [(i, "HOT", rect_wkb(i, 0, i + 1, 1)) for i in range(n_hot)]
    rows += [(10_000, "COLD", rect_wkb(0, 10, 1, 11))]
    df = spark.createDataFrame(rows, schema)

    auto = dissolve(df, ["KEY"])
    # two applyInPandas stages = hierarchical plan chosen by the probe
    assert auto._jdf.queryExecution().analyzed().toString().count(
        "FlatMapGroupsInPandas"
    ) == 2
    forced_single = dissolve(df, ["KEY"], n_salt=1)
    assert forced_single._jdf.queryExecution().analyzed().toString().count(
        "FlatMapGroupsInPandas"
    ) == 1
    got = {r["KEY"]: K.area(K.from_wkb(r["geometry"])) for r in auto.collect()}
    want = {r["KEY"]: K.area(K.from_wkb(r["geometry"]))
            for r in forced_single.collect()}
    assert got.keys() == want.keys() == {"HOT", "COLD"}
    for k in got:
        assert got[k] == pytest.approx(want[k])

    # small input: the probe must keep the cheap single-stage plan
    small = dissolve(df.filter(F.col("KEY") == "COLD"), ["KEY"])
    assert small._jdf.queryExecution().analyzed().toString().count(
        "FlatMapGroupsInPandas"
    ) == 1
