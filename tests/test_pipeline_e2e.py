"""End-to-end boundary pipeline (reference E1 flow) on FIXTURES.md-
shaped micro-fixtures: GNIS dup keys + adjustments, census gates +
GEOID padding, dissolve, first-match joins, coastal cut with sliver
repair, erase, merge, finalize."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gis_city_county_spark.geo import kernel as K
from gis_city_county_spark.operators.gates import GateError
from gis_city_county_spark.pipeline.boundaries import (
    flow,
    process_census,
    process_gnis,
)


def rect(x0, y0, x1, y1) -> bytes:
    return K.to_wkb([([(float(x0), float(y0)), (float(x1), float(y0)),
                       (float(x1), float(y1)), (float(x0), float(y1))], [])])


GNIS_SCHEMA = "feature_id long, feature_name string, feature_class string, census_class_code string, state_name string"
CENSUS_SCHEMA = (
    "Summary_Level string, State_FIPS_Code string, County_FIPS_Code string, "
    "Place_FIPS_Code string, Area_Name string"
)


@pytest.fixture(scope="module")
def sources(spark):
    gnis = spark.createDataFrame(
        [
            (100, "City of Alameda", "Civil", "C1", "California"),
            (101, "Alameda County", "Civil", "H1", "California"),
            # duplicate join key (multi-county feature): first-match must pick GNIS_ID 102
            (102, "City of San Francisco", "Civil", "C1", "California"),
            (103, "City of San Francisco", "Civil", "C1", "California"),
            (104, "San Francisco County", "Civil", "H1", "California"),
            (105, "City of El Paso de Robles", "Civil", "C1", "California"),
            (900, "Colorado River Indian Reservation", "Civil", "D2", "California"),
            (901, "City of Reno", "Civil", "C1", "Nevada"),
            (902, "Census Tract 1", "Census", "H1", "California"),
        ],
        GNIS_SCHEMA,
    )
    census = spark.createDataFrame(
        [
            ("040", "06", "000", "00000", "California"),       # statewide row -> dropped
            ("050", "06", "001", "00000", "Alameda County"),
            ("162", "06", "001", "00562", "Alameda city"),
            ("050", "06", "075", "00000", "San Francisco County"),
            ("162", "06", "075", "67000", "San Francisco city"),
            ("162", "06", None, None, "Mystery place"),        # missing codes (<= tolerance)
            ("050", "04", "013", "00000", "Maricopa County"),  # non-CA -> dropped
        ],
        CENSUS_SCHEMA,
    )
    dla = spark.createDataFrame(
        [
            ("Alameda", "ALA", "ALAM"),
            ("Alameda County", "ALA", " "),
            ("San Francisco", "SFO", "SNFR"),
            ("San Francisco County", "SFO", " "),
        ],
        "CENSUS_PLACE_NAME string, CNTY_ABBR string, PLACE_ABBR string",
    )
    boundaries = spark.createDataFrame(
        [
            # City of Alameda: two annexation pieces that merge on dissolve
            (1, "Alameda", "Alameda", "01001", rect(-122.30, 37.70, -122.20, 37.80)),
            (2, "Alameda", "Alameda", "01001", rect(-122.20, 37.70, -122.10, 37.80)),
            # Unincorporated remainder covering the county extent
            (3, "Alameda", "Unincorporated", "01000", rect(-122.40, 37.60, -121.90, 37.90)),
            # San Francisco: coincident city/county, pre-fix COPRI
            (4, "San Francisco", "San Francisco", "38999", rect(-122.50, 37.70, -122.40, 37.80)),
        ],
        T.StructType(
            [
                T.StructField("OBJECTID", T.LongType()),
                T.StructField("COUNTY", T.StringType()),
                T.StructField("CITY", T.StringType()),
                T.StructField("COPRI", T.StringType()),
                T.StructField("geometry", T.BinaryType()),
            ]
        ),
    )
    # ocean strip overlapping SF's west edge by 0.0005 deg lon x 0.01 deg
    # lat: the overlap piece is ~78k m2 in EPSG:3857 — under the 100k
    # sliver threshold, so it must return to the city feature.
    coastline = spark.createDataFrame(
        [
            ("ocean", rect(-122.52, 37.70, -122.4995, 37.71)),
            ("", rect(-121.00, 36.00, -120.90, 36.10)),  # land row: filtered out
        ],
        T.StructType(
            [
                T.StructField("OFFSHORE", T.StringType()),
                T.StructField("geometry", T.BinaryType()),
            ]
        ),
    )
    return gnis, census, dla, boundaries, coastline


def test_process_gnis_filters_and_adjusts(spark, sources):
    gnis, *_ = sources
    out = process_gnis(gnis).collect()
    names = {r["GNIS_JOIN_NAME"] for r in out}
    assert "Paso Robles" in names            # adjustment applied
    assert "Alameda" in names and "San Francisco" in names
    assert not any(r["GNIS_JOIN_NAME"] == "Reno" for r in out)      # non-CA dropped
    # LEGAL_PLACE_NAME is the FULL feature name (reference copies it
    # verbatim); the JOIN name strips C1 prefixes and keeps H1 full
    by_id = {r["GNIS_ID"]: r for r in out}
    assert by_id[100]["LEGAL_PLACE_NAME"] == "City of Alameda"
    assert by_id[100]["GNIS_JOIN_NAME"] == "Alameda"
    assert by_id[101]["LEGAL_PLACE_NAME"] == "Alameda County"
    assert by_id[101]["GNIS_JOIN_NAME"] == "Alameda County"


def test_process_census_gate_and_geoid(spark, sources):
    _, census, *_ = sources
    out = {r["CENSUS_PLACE_NAME"]: r for r in process_census(census).collect()}
    assert "California" not in out
    assert out["Alameda County"]["GEOID"] == "06001"     # leading zero preserved
    assert out["Alameda"]["GEOID"] == "0600562"
    assert out["San Francisco"]["CENSUS_PLACE_TYPE"] == "City"


def test_process_census_gate_rejects_excess_missing(spark, sources):
    _, census, *_ = sources
    with pytest.raises(GateError):
        process_census(census, max_missing=0)


def test_flow_end_to_end(spark, sources):
    gnis, census, dla, boundaries, coastline = sources
    out = flow(gnis, census, dla, boundaries, coastline, cell=0.5).cache()
    rows = out.collect()

    cities = {r["CDTFA_CITY"]: r for r in rows if r["CDTFA_CITY"] not in (None, "Unincorporated")}
    counties = {r["CDTFA_COUNTY"]: r for r in rows if r["CDTFA_CITY"] is None}
    uninc = [r for r in rows if r["CDTFA_CITY"] == "Unincorporated"]

    # -------- membership: 2 cities, 2 counties, 1 unincorporated
    assert set(cities) == {"Alameda", "San Francisco"}
    assert set(counties) == {"Alameda", "San Francisco"}
    assert len(uninc) == 1 and uninc[0]["CDTFA_COUNTY"] == "Alameda"

    # -------- attribute attach (first-match + adjustments)
    al = cities["Alameda"]
    assert al["GEOID"] == "0600562"
    assert al["LEGAL_PLACE_NAME"] == "City of Alameda"
    assert al["CDT_NAME_SHORT"] == "Alameda"     # F7 strip_extra
    assert al["PLACE_ABBR"] == "ALAM" and al["CNTY_ABBR"] == "ALA"
    sf = cities["San Francisco"]
    assert sf["GNIS_ID"] == 102                  # duplicate key -> lowest id wins
    assert counties["Alameda"]["GEOID"] == "06001"
    assert counties["Alameda"]["LEGAL_PLACE_NAME"] == "Alameda County"
    assert counties["Alameda"]["CDT_NAME_SHORT"] == "Alameda"
    # reference bunny.py:391 drops the city abbreviation from counties
    assert counties["Alameda"]["PLACE_ABBR"] is None

    # -------- SF point fixes (F8): the reference's CDTFA_ADJUST keys
    # on CENSUS_PLACE_NAME == "San Francisco County", i.e. the COUNTY
    # row (SF County is GNIS class H6, so its legal name/COPRI can only
    # arrive by rule — SF has no unincorporated rows to dissolve a
    # COPRI from). The CITY row is untouched.
    assert sf["CDTFA_COPRI"] == "38999"
    assert sf["LEGAL_PLACE_NAME"] == "City of San Francisco"
    assert sf["CDT_NAME_SHORT"] == "San Francisco"
    sfc = counties["San Francisco"]
    assert sfc["CDTFA_COPRI"] == "38000"
    assert sfc["LEGAL_PLACE_NAME"] == "San Francisco County"
    assert sfc["CDT_NAME_SHORT"] == "San Francisco"

    # -------- coastal cut: sliver returned to the city, so SF keeps
    # its full 0.1 x 0.1 deg footprint (~37.8 mi^2 at this latitude)
    assert sf["AREA_SQMI"] == pytest.approx(37.8, rel=0.03)

    # -------- erase: unincorporated = county minus cities (degree-space
    # areas: county 0.5x0.3 minus two city rects 0.2x0.1 = 0.13 deg^2)
    assert uninc[0]["AREA_SQMI"] > 0
    al_county_sqmi = counties["Alameda"]["AREA_SQMI"]
    assert uninc[0]["AREA_SQMI"] < al_county_sqmi
    # SF is fully incorporated -> no SF unincorporated row
    assert all(r["CDTFA_COUNTY"] != "San Francisco" for r in uninc)

    # -------- finalize: GlobalIDs unique, geometry reprojected (meters)
    gids = [r["GlobalID"] for r in rows]
    assert len(set(gids)) == len(gids)
    # Placeholder fields from the reference (primary_domain.py:15,
    # census_population.py:15): present, typed, all-NULL.
    assert dict(out.dtypes)["PRIMARY_DOMAIN"] == "string"
    assert dict(out.dtypes)["CENSUS_POPULATION"] == "bigint"
    assert all(r["PRIMARY_DOMAIN"] is None for r in rows)
    assert all(r["CENSUS_POPULATION"] is None for r in rows)
    g = K.from_wkb(cities["Alameda"]["geometry"])
    xs = [abs(x) for ring, _ in g for x, y in ring]
    assert max(xs) > 1000.0                      # EPSG:3310 meters, not degrees
    out.unpersist()


def test_flow_records_report(spark, sources):
    from gis_city_county_spark.operators.gates import RunReport

    gnis, census, dla, boundaries, coastline = sources
    rpt = RunReport()
    out = flow(gnis, census, dla, boundaries, coastline, cell=0.5, report=rpt)
    assert out.count() > 0
    assert rpt.ok
    assert [g for g, _, _ in rpt.entries] == ["final_layer_min_rows"]
    rpt.raise_if_failed()  # no-op when all gates passed
