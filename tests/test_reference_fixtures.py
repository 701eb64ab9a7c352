"""Fidelity check: the engine's attribute pipeline run on the
REFERENCE'S OWN input fixtures (read-only from /root/reference —
skipped when the tree is absent, so the repo stays standalone).

This is the strongest parity signal short of live sources: the same
GNIS pipe-delimited export, Census all-geocodes workbook, and DLA
abbreviation tables the reference processes, pushed through our S3/S4
readers and the E2 attribute branch, must reproduce the reference's
documented row counts (482 cities / 52 incorporated-county rows per
``docs/planning/BoundaryUpdates.py:36,54``; 58 counties total) and its
name-fix semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

REF = "/root/reference/tests/data/inputs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixture tree not available"
)


@pytest.fixture(scope="module")
def gnis_out(spark):
    from gis_city_county_spark.pipeline.boundaries import process_gnis
    from gis_city_county_spark.sources.files import read_delimited

    raw = read_delimited(spark, f"{REF}/FederalCodes_CA.txt", sep="|")
    return process_gnis(raw).cache()


@pytest.fixture(scope="module")
def census_out(spark):
    from gis_city_county_spark.pipeline.boundaries import process_census
    from gis_city_county_spark.sources.files import read_xlsx

    raw = read_xlsx(spark, f"{REF}/all-geocodes-v2022.xlsx")
    # reference retrieve.py:109 — spaces → underscores (P8)
    raw = raw.toDF(*[c.replace(" ", "_") for c in raw.columns])
    return process_census(raw).cache()


def test_gnis_reference_fixture(gnis_out):
    rows = gnis_out.collect()
    # 57 counties (H1 — San Francisco County is class H6 and excluded
    # by the reference's own H1/C1 filter; SF is patched downstream by
    # fix_individual) + 482 incorporated places (C1) = 539
    assert len(rows) == 539
    by_class = {r["census_class_code"] for r in rows}
    assert by_class == {"H1", "C1"}
    assert sum(1 for r in rows if r["census_class_code"] == "H1") == 57
    assert not any(
        r["LEGAL_PLACE_NAME"] == "San Francisco County" for r in rows
    )
    # LEGAL names are the full feature names; C1 JOIN names drop the
    # leading "City of"/"Town of" (split_name)
    sf = [r for r in rows if r["LEGAL_PLACE_NAME"] == "City of San Francisco"]
    assert sf and sf[0]["census_class_code"] == "C1"
    assert sf[0]["GNIS_JOIN_NAME"] == "San Francisco"
    # H1 join names keep the full "<name> County" form
    eld = [r for r in rows if r["LEGAL_PLACE_NAME"] == "El Dorado County"]
    assert eld and eld[0]["GNIS_JOIN_NAME"] == "El Dorado County"
    # the GNIS adjustment dictionary applied (F3)
    paso = [r for r in rows if r["LEGAL_PLACE_NAME"] == "City of El Paso de Robles"]
    assert paso and paso[0]["GNIS_JOIN_NAME"] == "Paso Robles"
    assert not any(r["GNIS_JOIN_NAME"] == "El Paso de Robles" for r in rows)
    # the "California City" -> "California" collision fix applied
    calcity = [
        r for r in rows if r["LEGAL_PLACE_NAME"] == "City of California City"
    ]
    assert calcity and calcity[0]["GNIS_JOIN_NAME"] == "California"
    # ids all parsed to longs
    assert all(isinstance(r["GNIS_ID"], int) for r in rows)


def test_census_reference_fixture(census_out):
    rows = census_out.collect()
    # 58 counties + 482 places (the reference's documented counts)
    assert len(rows) == 540
    counties = [r for r in rows if r["CENSUS_PLACE_TYPE"] == "County"]
    assert len(counties) == 58
    # zero-padded GEOID concat (F6): county = 2+3, place = 2+5 digits
    assert all(len(r["GEOID"]) == 5 for r in counties)
    places = [r for r in rows if r["CENSUS_PLACE_TYPE"] != "County"]
    assert len(places) == 482
    assert all(len(r["GEOID"]) == 7 for r in places)
    got = {r["CENSUS_PLACE_NAME"]: r["GEOID"] for r in rows}
    assert got["Alameda County"] == "06001"
    assert got["Alameda"] == "0600562"
    assert got["San Francisco"].startswith("06")
    # CENSUS_ADJUSTMENTS on the raw Area_Name: the workbook's
    # "California City city" / parenthesized names normalize to the
    # CDTFA-joinable forms
    assert "California" in got and "California City" not in got
    assert "Paso Robles" in got and "Ventura" in got
    assert not any("(" in k for k in got)


def test_run_joins_on_reference_fixtures(spark, gnis_out, census_out):
    """J1 first-match attaches against the real attribute tables: a
    two-row synthetic boundary layer picks up Census GEOID/type, GNIS
    legal name/id, and DLA abbreviations."""
    from gis_city_county_spark.pipeline.boundaries import run_joins
    from gis_city_county_spark.sources.files import read_xlsx

    def dla_table(path):
        d = read_xlsx(spark, path)
        return d.select(
            F.col("PLACE_NAME").alias("CENSUS_PLACE_NAME"),
            "CNTY_ABBR",
            "PLACE_ABBR",
        )

    dla = dla_table(f"{REF}/DLA_CityNames.xlsx").unionByName(
        dla_table(f"{REF}/DLA_CountyNames.xlsx")
    )

    cities = spark.createDataFrame(
        [("Alameda", "Alameda", "01001")],
        "CDTFA_CITY string, CDTFA_COUNTY string, CDTFA_COPRI string",
    )
    joined = run_joins(
        cities,
        census_out,
        gnis_out,
        dla,
        census_name=F.col("CDTFA_CITY"),
        gnis_name=F.col("CDTFA_CITY"),
    ).collect()
    assert len(joined) == 1
    r = joined[0]
    assert r["GEOID"] == "0600562"
    assert r["CENSUS_PLACE_TYPE"] == "City"
    assert r["LEGAL_PLACE_NAME"] == "City of Alameda"
    assert r["PLACE_ABBR"] == "ALA"
    assert r["CNTY_ABBR"] == "ALA"

    counties = spark.createDataFrame(
        [("Unincorporated", "Alameda", "01000")],
        "CDTFA_CITY string, CDTFA_COUNTY string, CDTFA_COPRI string",
    )
    jc = run_joins(
        counties,
        census_out,
        gnis_out,
        dla,
        census_name=F.concat(F.col("CDTFA_COUNTY"), F.lit(" County")),
        gnis_name=F.concat(F.col("CDTFA_COUNTY"), F.lit(" County")),
    ).collect()[0]
    assert jc["GEOID"] == "06001"
    assert jc["CENSUS_PLACE_TYPE"] == "County"
    assert jc["LEGAL_PLACE_NAME"] == "Alameda County"
    assert jc["CNTY_ABBR"] == "ALA"


def test_fuzzy_lookup_resolves_names_crosswalk(spark):
    """The reference curates Names_Crosswalk.xlsx by hand — exact
    (canonical, variant) name pairs. Our fuzzy_lookup must resolve
    each variant form back to its canonical BOE name from the full
    canonical list, i.e. the operator subsumes the hand-maintained
    crosswalk (parenthesized alias forms like 'San Buenaventura
    (Ventura)' contain the canonical name verbatim and are matched by
    containment instead of edit distance)."""
    from gis_city_county_spark.operators.search import fuzzy_lookup
    from gis_city_county_spark.sources.files import _xlsx_rows

    rows = _xlsx_rows(f"{REF}/Names_Crosswalk.xlsx")
    header, pairs = rows[0], rows[1:]
    assert header == ["BOE_Names", "Other_Version"]
    canon = sorted({c for c, _v in pairs})
    # case-normalize both sides, the standard fuzzy-matching prep
    # ('San Buenaventura' vs 'Ventura' differs by a case bit that
    # would otherwise tie-lose to an unrelated name)
    corpus = spark.createDataFrame(
        [(i, c.lower()) for i, c in enumerate(canon)], "place_id long, name string"
    )
    plain = [(i, v.lower()) for i, (c, v) in enumerate(pairs) if "(" not in v]
    # probes share the corpus column names (fuzzy_lookup contract)
    probes = spark.createDataFrame(plain, "place_id long, name string")
    got = {
        r["probe_id"]: r["cand_name"]
        for r in fuzzy_lookup(corpus, probes, "place_id", "name", k=1).collect()
    }
    expected = {i: c.lower() for i, (c, v) in enumerate(pairs) if "(" not in v}
    misses = {
        pid: (got.get(pid), want)
        for pid, want in expected.items()
        if got.get(pid) != want
    }
    assert not misses, misses
