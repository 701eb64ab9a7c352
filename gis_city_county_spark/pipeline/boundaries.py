"""The reference's full pipeline (E1, ``bunny.py:534-562`` flow())
re-expressed as composable DataFrame transformations.

Every step is ``DataFrame -> DataFrame`` built from the engine's
operators, so the three reference entry points collapse to one code
path: E1 = :func:`flow`, E2 = :func:`process_gnis` alone, E3 =
:func:`coastal_cut` alone (SURVEY.md §3). Sources are injected as
DataFrames (production reads feature-service snapshots via
``sources.files``); nothing here materializes except the QA gates.

Geometry convention: WKB in EPSG:4326 through the pipeline; area in
EPSG:3310 mi² (reference ``config.py:48-51``); sliver threshold
measured in EPSG:3857 (reference ``config.py:59-60``); final output
reprojected to EPSG:3310 (reference ``bunny.py:475-498``).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gis_city_county_spark.functions.text import (
    drop_first_words,
    drop_last_word,
    last_word_title,
    nullif_empty,
    strip_tokens,
    zero_pad_concat,
)
from gis_city_county_spark.geo.ops import (
    dissolve,
    erase,
    fix_slivers,
    st_area,
    st_make_valid,
    st_transform,
    union_overlay,
)
from gis_city_county_spark.operators.gates import expect_max_missing, expect_min_count
from gis_city_county_spark.operators.relational import (
    fix_individual,
    join_field,
    rename_fields,
    value_map,
)

SQMI_PER_M2 = 1.0 / 2_589_988.110336

# Reference GNIS_ADJUSTMENTS (config.py:115-123), verbatim — applied
# to GNIS_JOIN_NAME after derivation.
GNIS_ADJUSTMENTS = {
    "El Paso de Robles": "Paso Robles",
    "San Buenaventura": "Ventura",
    "Saint Helena": "St. Helena",
    "California City": "California",
}
# Reference config.py:140-148, verbatim: applied to the raw Area_Name
# BEFORE type/name derivation (retrieve.py:122-127). Includes the
# mojibake repair some Census workbook vintages need.
CENSUS_ADJUSTMENTS = {
    "La Ca±ada Flintridge city": "La Cañada Flintridge city",
    "El Paso de Robles (Paso Robles) city": "Paso Robles city",
    "San Buenaventura (Ventura) city": "Ventura city",
    "California City city": "California city",
}
CDTFA_FIELD_MAP = {"COPRI": "CDTFA_COPRI", "COUNTY": "CDTFA_COUNTY", "CITY": "CDTFA_CITY"}
# Reference CDTFA_ADJUST (config.py:91-99), verbatim: San Francisco
# County is GNIS class H6 (excluded by the H1/C1 filter), so its COPRI
# and legal name are patched in by rule, keyed on the census join name.
# Rules run per-layer right after the joins (bunny.py:462-464) —
# BEFORE the coastal cut, whose sliver grouping uses the legal name.
SF_FIXES = [
    ("CDTFA_COPRI", "38000", "CENSUS_PLACE_NAME", "San Francisco County"),
    ("LEGAL_PLACE_NAME", "San Francisco County", "CENSUS_PLACE_NAME", "San Francisco County"),
]


# ------------------------------------------------------------------ GNIS

def process_gnis(gnis: DataFrame) -> DataFrame:
    """Reference ``process_gnis`` (``bunny.py:26-104``), semantics
    reproduced exactly:

    - filter to CA civil H1/C1 places (``bunny.py:38``; note San
      Francisco County is class H6 and therefore absent — the
      reference patches SF downstream via ``fix_individual``);
    - ``LEGAL_PLACE_NAME`` = the FULL ``feature_name``
      (``bunny.py:63-67`` copies it verbatim — "City of Alameda",
      "Alameda County");
    - ``GNIS_JOIN_NAME`` = ``split_name`` (``bunny.py:45-61``): C1
      drops the first two words ("City of X" → "X"), H1 keeps the
      full name ("Alameda County") — so bare city keys can never
      collide with county rows;
    - adjustment dictionary applied to the join name (F3)."""
    filtered = gnis.filter(
        (F.col("state_name") == "California")
        & (F.col("feature_class") == "Civil")
        & F.col("census_class_code").isin("H1", "C1")
    )
    named = filtered.withColumn(
        "LEGAL_PLACE_NAME", F.col("feature_name")
    ).withColumn("GNIS_ID", F.col("feature_id").cast("long"))
    adjusted = value_map(
        named.withColumn(
            "GNIS_JOIN_NAME",
            F.when(
                F.col("census_class_code") == "C1",
                drop_first_words("feature_name", 2),
            ).otherwise(F.col("feature_name")),
        ),
        "GNIS_JOIN_NAME",
        GNIS_ADJUSTMENTS,
    )
    return adjusted.select(
        "GNIS_JOIN_NAME", "LEGAL_PLACE_NAME", "GNIS_ID", "census_class_code"
    )


# ------------------------------------------------------------------ Census

def process_census(census: DataFrame, max_missing: int = 5) -> DataFrame:
    """Reference ``retrieve.py:89-135`` + ``process_census``
    (``bunny.py:106-159``): CA rows only, missing-geocode gate, drop
    the statewide row, derive type/name/GEOID with zero-padded FIPS."""
    ca = census.filter(F.col("State_FIPS_Code") == "06")
    # the reference's has_data check spans all FOUR code columns
    # (retrieve.py:112) — tolerate their absence in narrower fixtures
    code_cols = [
        c
        for c in (
            "County_FIPS_Code",
            "County_Subdivision_FIPS_Code",
            "Place_FIPS_Code",
            "Consolidated_City_FIPS_Code",
        )
        if c in ca.columns
    ]
    gated = expect_max_missing(
        ca, code_cols, max_missing, name="census geocodes"
    )
    rows = gated.filter(F.col("Area_Name") != "California")
    # adjustments hit the raw Area_Name BEFORE derivation (reference
    # retrieve.py:122-127) — e.g. "California City city" normalizes to
    # "California city" so the derived place name matches CDTFA's.
    rows = value_map(rows, "Area_Name", CENSUS_ADJUSTMENTS)
    typed = rows.withColumn("CENSUS_PLACE_TYPE", last_word_title("Area_Name"))
    named = typed.withColumn(
        "CENSUS_PLACE_NAME",
        F.when(F.col("CENSUS_PLACE_TYPE") == "County", F.col("Area_Name")).otherwise(
            drop_last_word("Area_Name")
        ),
    )
    geoid = named.withColumn(
        "GEOID",
        F.when(
            F.col("CENSUS_PLACE_TYPE") == "County",
            zero_pad_concat([("State_FIPS_Code", 2), ("County_FIPS_Code", 3)]),
        )
        .when(
            F.col("CENSUS_PLACE_TYPE").isin("City", "Town"),
            zero_pad_concat([("State_FIPS_Code", 2), ("Place_FIPS_Code", 5)]),
        )
        .otherwise(F.lit(None).cast("string")),
    )
    return geoid.select("CENSUS_PLACE_NAME", "CENSUS_PLACE_TYPE", "GEOID")


# ------------------------------------------------------------------ boundaries

def process_boundaries(
    boundaries: DataFrame, min_rows: int = 4
) -> tuple[DataFrame, DataFrame]:
    """Reference ``bunny.py:221-348``: repair geometry, count-gate,
    rename to CDTFA_*, split and dissolve the cities and counties
    branches, attach county name / COPRI back via first-match joins."""
    repaired = boundaries.withColumn("geometry", st_make_valid("geometry"))
    gated = expect_min_count(repaired, min_rows, name="CDTFA boundaries")
    renamed = rename_fields(gated, CDTFA_FIELD_MAP)

    cities_src = renamed.filter(F.col("CDTFA_CITY") != "Unincorporated")
    cities = dissolve(cities_src, ["CDTFA_CITY", "CDTFA_COPRI"])
    cities = join_field(
        cities,
        cities_src,
        left_on="CDTFA_CITY",
        fields=["CDTFA_COUNTY"],
        order_by=["CDTFA_COUNTY"],
    )

    counties = dissolve(renamed, ["CDTFA_COUNTY"])
    unincorporated_copri = renamed.filter(F.col("CDTFA_CITY") == "Unincorporated")
    counties = join_field(
        counties,
        unincorporated_copri,
        left_on="CDTFA_COUNTY",
        fields=["CDTFA_COPRI"],
        order_by=["CDTFA_COPRI"],
    )
    return cities, counties


def run_joins(
    layer: DataFrame,
    census: DataFrame,
    gnis: DataFrame,
    dla: DataFrame,
    census_name,
    gnis_name,
) -> DataFrame:
    """Reference ``bunny.py:436-461``: three first-match attribute
    attaches (Census GEOID/type, GNIS legal name/id, DLA abbrs).
    ``census_name``/``gnis_name`` are Column expressions deriving each
    join key: cities join by the bare city name on both (matching the
    census city rows and the C1 stripped GNIS join names); counties
    join both by the full "<name> County" form (matching the census
    county rows and the H1 full GNIS join names)."""
    out = layer.withColumn("CENSUS_PLACE_NAME", census_name)
    out = join_field(
        out,
        census,
        left_on="CENSUS_PLACE_NAME",
        fields=["CENSUS_PLACE_TYPE", "GEOID"],
        order_by=["GEOID"],
    )
    out = out.withColumn("GNIS_JOIN_NAME", gnis_name)
    out = join_field(
        out,
        gnis,
        left_on="GNIS_JOIN_NAME",
        fields=["LEGAL_PLACE_NAME", "GNIS_ID"],
        order_by=["GNIS_ID"],
    )
    out = join_field(
        out,
        dla,
        left_on="CENSUS_PLACE_NAME",
        fields=["PLACE_ABBR", "CNTY_ABBR"],
        order_by=["PLACE_ABBR"],
    )
    return out


# ------------------------------------------------------------------ coastline

def coastal_cut(
    jurisdictions: DataFrame,
    coastline: DataFrame,
    sliver_threshold_m2: float = 100_000.0,
    keep_list: Sequence[bytes] = (),
    cell: float = 1.0,
    id_col: str = "jid",
) -> DataFrame:
    """Reference ``coastline.py:12-66`` + sliver fix (§2.8): overlay
    the jurisdiction layer with ocean/bay polygons, normalize the
    ``OFFSHORE`` flag (``'' -> NULL``), repair slivers, and drop the
    pure-offshore remainder."""
    coast = coastline.filter(F.col("OFFSHORE").isin("ocean", "bay"))
    # ids must be DETERMINISTIC: the overlay/sliver plans reference
    # their inputs several times, and monotonically_increasing_id()
    # re-evaluates per subplan with no stability guarantee — joins on
    # such ids silently match nothing. Hash row content instead.
    coast = coast.withColumn("cid", F.xxhash64("OFFSHORE", "geometry"))
    overlaid = union_overlay(jurisdictions, coast, id_col, "cid", cell=cell)
    overlaid = overlaid.withColumn("OFFSHORE", nullif_empty("OFFSHORE"))
    overlaid = overlaid.withColumn("row_id", F.xxhash64("FID_a", "FID_b"))
    fixed = fix_slivers(
        overlaid,
        "GNIS_PLACE_NAME",
        "row_id",
        threshold_m2=sliver_threshold_m2,
        keep_list=keep_list,
        area_src_crs="EPSG:4326",
    )
    # the offshore remainder has no jurisdiction attributes
    return fixed.filter(F.col("FID_a").isNotNull()).filter(st_area("geometry") > 0)


# ------------------------------------------------------------------ derive

def derive_unincorporated(
    counties: DataFrame, cities: DataFrame, cell: float = 1.0
) -> DataFrame:
    """Reference ``bunny.py:393-403``: Erase cities from counties; the
    remainder is the unincorporated area, CITY constant-filled."""
    c = counties.withColumn("__eid", F.xxhash64("CDTFA_COUNTY"))
    erased = erase(c, cities, "__eid", cell=cell).drop("__eid")
    return erased.withColumn("CDTFA_CITY", F.lit("Unincorporated"))


def finalize(
    merged: DataFrame,
    fixes: Sequence[tuple[str, str, str, str]] = (),
) -> DataFrame:
    """Reference ``bunny.py:400-424, 469-531``: point fixes, area in
    EPSG:3310 mi², GlobalIDs, reprojection to EPSG:3310. Also adds the
    reference's two placeholder fields (run right after the point fixes,
    as at ``bunny.py:466-467``): ``PRIMARY_DOMAIN`` (text, 255 — length
    limits have no Spark equivalent; ``primary_domain.py:15``) and
    ``CENSUS_POPULATION`` (long; ``census_population.py:15``), both NULL
    until their retrieval steps exist upstream."""
    out = fix_individual(merged, fixes) if fixes else merged
    # F7 CDT_NAME_SHORT (reference add_cdt_name_field, bunny.py:405-420)
    # runs AFTER the point fixes, so SF's short name derives from its
    # fixed legal name — reproducing the reference's chained-replace
    # output exactly (including its " County"-strip quirk).
    if "LEGAL_PLACE_NAME" in out.columns:
        out = out.withColumn(
            "CDT_NAME_SHORT",
            strip_tokens(
                "LEGAL_PLACE_NAME", ["City of ", "Town of ", " County"]
            ),
        )
    out = out.withColumn(
        "PRIMARY_DOMAIN", F.lit(None).cast("string")
    ).withColumn("CENSUS_POPULATION", F.lit(None).cast("long"))
    out = out.withColumn(
        "AREA_SQMI",
        st_area("geometry", "EPSG:4326", "EPSG:3310") * F.lit(SQMI_PER_M2),
    )
    out = out.withColumn("GlobalID", F.expr("uuid()"))
    return out.withColumn("geometry", st_transform("geometry", "EPSG:4326", "EPSG:3310"))


def flow(
    gnis: DataFrame,
    census: DataFrame,
    dla: DataFrame,
    boundaries: DataFrame,
    coastline: DataFrame | None = None,
    min_boundary_rows: int = 4,
    sliver_threshold_m2: float = 100_000.0,
    keep_list: Sequence[bytes] = (),
    cell: float = 1.0,
    report: "object | None" = None,
) -> DataFrame:
    """E1 end-to-end (reference ``bunny.py:534-562``): process sources,
    split/dissolve/join boundaries, optional coastal cut, erase
    unincorporated, merge, finalize. Returns the merged cities +
    counties + unincorporated layer in EPSG:3310.

    Pass a :class:`operators.gates.RunReport` as ``report`` to have the
    final layer's row-count gate recorded there (the reference's
    end-of-run alert buffer) instead of raising mid-flow."""
    from gis_city_county_spark.operators.relational import merge_by_name

    g = process_gnis(gnis)
    c = process_census(census)
    cities, counties = process_boundaries(boundaries, min_rows=min_boundary_rows)

    cities = run_joins(
        cities, c, g, dla,
        census_name=F.col("CDTFA_CITY"),
        gnis_name=F.col("CDTFA_CITY"),
    )
    counties = run_joins(
        counties, c, g, dla,
        census_name=F.concat(F.col("CDTFA_COUNTY"), F.lit(" County")),
        # H1 join names keep the full "<name> County" form (reference
        # split_name) — join counties by the same form. (The reference
        # keys this join on its bare place_name, which can only hit C1
        # city rows; we keep the SURVEY-documented sane-join reading,
        # consistent with the census key above.)
        gnis_name=F.concat(F.col("CDTFA_COUNTY"), F.lit(" County")),
    )

    # Point fixes run per-layer right after the joins (reference
    # bunny.py:462-464) so the patched SF legal name participates in
    # the coastal cut's sliver grouping below.
    cities = fix_individual(cities, SF_FIXES)
    counties = fix_individual(counties, SF_FIXES)

    # Reference bunny.py:391: counties drop the city-abbreviation
    # column before the merge (it only means something for cities).
    counties = counties.drop("PLACE_ABBR")

    if coastline is not None:
        # Reference add_fields_and_reproject_both: the coastal cut runs
        # on BOTH layers (cities and counties, each with its exclusion
        # list — both ("ocean","bay") in config.py:56-57).
        def cut(layer: DataFrame, name_col: str, *key_cols: str) -> DataFrame:
            # jid must be unique per FEATURE, not per name: cities
            # dissolve on (CITY, COPRI), so a city spanning counties
            # yields several rows per name — hash the full dissolve key
            # or the overlay would conflate their geometry.
            layer = layer.withColumn(
                "jid", F.xxhash64(*key_cols)
            ).withColumn(
                "GNIS_PLACE_NAME", F.coalesce("LEGAL_PLACE_NAME", name_col)
            )
            return coastal_cut(
                layer, coastline, sliver_threshold_m2, keep_list,
                cell=cell, id_col="jid",
            ).drop(
                "jid", "row_id", "FID_a", "FID_b", "cid", "OFFSHORE",
                "GNIS_PLACE_NAME",
            )

        cities = cut(cities, "CDTFA_CITY", "CDTFA_CITY", "CDTFA_COPRI")
        counties = cut(counties, "CDTFA_COUNTY", "CDTFA_COUNTY")

    unincorporated = derive_unincorporated(counties, cities, cell=cell)
    merged = merge_by_name(cities, counties, unincorporated)
    # fixes already applied per-layer above (reference order); finalize
    # handles name_short / placeholders / area / GUIDs / reprojection.
    out = finalize(merged)
    if report is not None:
        report.check(
            "final_layer_min_rows", expect_min_count, out, min_boundary_rows, "final"
        )
    return out
