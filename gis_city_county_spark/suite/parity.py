"""Reference-parity queries: every SURVEY.md §2 operator exercised on
the synthetic warehouse, each with a DuckDB oracle.

The reference operates on GIS attribute tables; here each operator is
run with identical semantics on the TPC-H-ish tables (geometry-valued
variants live in the geo layer). Names map to §2 inventory IDs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gis_city_county_spark.functions.numeric import dec_sum, dec_sum_sql
from gis_city_county_spark.functions.text import (
    drop_first_words,
    drop_last_word,
    last_word_title,
    nullif_empty,
    strip_tokens,
    zero_pad_concat,
)
from gis_city_county_spark.operators.gates import count_gate_df, missing_gate_df
from gis_city_county_spark.operators.relational import (
    fix_individual,
    join_field,
    merge_by_name,
    value_map,
)
from gis_city_county_spark.sources.tables import load_table
from gis_city_county_spark.suite import QuerySpec


# ---------------------------------------------------------------- P1/P2
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 TableSelect (reference ``bunny.py:38``): compound AND/OR/IN
    predicate — the whole clause pushes down to the parquet scan."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderstatus") == "O")
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & (F.col("o_totalprice") > 1000.0)
    ).select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")


_FILTER_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
FROM orders
WHERE o_orderstatus = 'O'
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_totalprice > 1000.0
"""


# ---------------------------------------------------------------- F1–F7
def q_scalar_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CalculateField scalar surface (F1/F4/F5/F6/F7) as native
    Column expressions — zero Python UDFs, all whole-stage codegen."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        drop_first_words("p_name", 1).alias("name_tail"),
        drop_last_word("p_name").alias("name_head"),
        last_word_title("p_type").alias("type_title"),
        zero_pad_concat([("p_size", 2), ("p_partkey", 5)]).alias("geoid"),
        strip_tokens("p_brand", ["Brand#"]).alias("brand_num"),
    )


_SCALAR_ORACLE = """
SELECT p_partkey,
       regexp_replace(p_name, '^[^ ]+ ', '') AS name_tail,
       regexp_replace(p_name, ' [^ ]+$', '') AS name_head,
       upper(substr(list_extract(string_split(p_type, ' '), -1), 1, 1))
         || lower(substr(list_extract(string_split(p_type, ' '), -1), 2)) AS type_title,
       lpad(CAST(p_size AS VARCHAR), 2, '0')
         || lpad(CAST(p_partkey AS VARCHAR), 5, '0') AS geoid,
       replace(p_brand, 'Brand#', '') AS brand_num
FROM part
"""


# ---------------------------------------------------------------- F3
_REGION_MAP = {"ASIA": "Asia-Pacific", "EUROPE": "Europe & EMEA"}


def q_value_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 dictionary replacement (GNIS_ADJUSTMENTS analog) + J1
    broadcast attach of the mapped dimension onto nation."""
    region = value_map(load_table(spark, sf_dir, "region"), "r_name", _REGION_MAP)
    nation = load_table(spark, sf_dir, "nation")
    return join_field(
        nation, region, left_on="n_regionkey", right_on="r_regionkey", fields=["r_name"]
    ).select("n_nationkey", "n_name", F.col("r_name").alias("region_name"))


_VALUE_MAP_ORACLE = """
SELECT n_nationkey, n_name,
       CASE r_name WHEN 'ASIA' THEN 'Asia-Pacific'
                   WHEN 'EUROPE' THEN 'Europe & EMEA'
                   ELSE r_name END AS region_name
FROM nation LEFT JOIN region ON n_regionkey = r_regionkey
"""


# ---------------------------------------------------------------- J1
def q_join_field_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 first-match JoinField: attach the *first* lineitem (by line
    number) to each order. The right side has ~4 rows per key — the
    pre-join dedup reproduces ArcGIS's keep-first semantics and is
    what makes the join shuffle one row per key at scale."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    out = join_field(
        orders,
        li,
        left_on="o_orderkey",
        right_on="l_orderkey",
        fields=["l_partkey", "l_quantity"],
        order_by=["l_linenumber", "l_partkey", "l_suppkey"],
        broadcast=False,
    )
    return out.select("o_orderkey", "o_totalprice", "l_partkey", "l_quantity")


_JOIN_FIELD_ORACLE = """
SELECT o_orderkey, o_totalprice, l_partkey, l_quantity
FROM orders LEFT JOIN (
  SELECT l_orderkey, l_partkey, l_quantity,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
  FROM lineitem
) li ON o_orderkey = l_orderkey AND rn = 1
"""


# ---------------------------------------------------------------- U1
def q_merge_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 Merge: UNION ALL by name with NULL-filled missing columns
    (suppliers have no market segment — like counties lacking
    ``CDT_CITY_ABBR`` at ``bunny.py:391``)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("member_key"),
        F.col("c_name").alias("member_name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("customer").alias("side"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("member_key"),
        F.col("s_name").alias("member_name"),
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_nationkey").alias("nationkey"),
        F.lit("supplier").alias("side"),
    )
    return merge_by_name(cust, supp)


_MERGE_ORACLE = """
SELECT c_custkey AS member_key, c_name AS member_name, c_acctbal AS acctbal,
       c_nationkey AS nationkey, c_mktsegment AS segment, 'customer' AS side
FROM customer
UNION ALL
SELECT s_suppkey, s_name, s_acctbal, s_nationkey, NULL, 'supplier'
FROM supplier
"""


# ---------------------------------------------------------------- A1+J1
def q_dissolve_attach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 Dissolve + J1 join-back (the cities branch shape,
    ``bunny.py:264-280``): aggregate members by nation key, then
    attach the nation/region names from the pre-aggregation dimension.
    On attribute data the geometric union becomes count/sum — the
    grouping/shuffle structure is identical."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    dissolved = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_members"),
        dec_sum("c_acctbal", "total_acctbal"),
    )
    return join_field(
        dissolved, nation, left_on="c_nationkey", right_on="n_nationkey", fields=["n_name"]
    ).select("c_nationkey", "n_name", "n_members", "total_acctbal")


_DISSOLVE_ORACLE = f"""
SELECT c_nationkey, n_name, COUNT(*) AS n_members,
       {dec_sum_sql('c_acctbal', 'total_acctbal')}
FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
GROUP BY c_nationkey, n_name
"""


# ---------------------------------------------------------------- F8
_FIXES = [
    ("n_name", "NATION_7_RENAMED", "n_nationkey", "7"),
    ("n_name", "NATION_3_RENAMED", "n_nationkey", "3"),
]


def q_fix_individual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 conditional point-fix (``bunny.py:508-531``, the San
    Francisco COPRI rule): config-driven UPDATE-where-equals."""
    nation = load_table(spark, sf_dir, "nation")
    fixed = fix_individual(
        nation.withColumn("n_nationkey_str", F.col("n_nationkey").cast("string")),
        [(f, v, "n_nationkey_str", cv) for f, v, _, cv in _FIXES],
    )
    return fixed.select("n_nationkey", "n_name")


_FIX_ORACLE = """
SELECT n_nationkey,
       CASE CAST(n_nationkey AS VARCHAR)
            WHEN '7' THEN 'NATION_7_RENAMED'
            WHEN '3' THEN 'NATION_3_RENAMED'
            ELSE n_name END AS n_name
FROM nation
"""


# ---------------------------------------------------------------- F10/P2
def q_nullif_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 ``'' → NULL`` normalization plus the ``''`` vs NULL
    distinction the reference's filters depend on (``coastline.py:63-66``).
    Empty strings are synthesized from one source value, normalized,
    and the query proves NULL/''/value are kept distinct."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.withColumn(
        "offshore",
        F.when(F.col("source") == "src0", F.lit("")).otherwise(F.col("source")),
    )
    normalized = staged.withColumn("offshore_norm", nullif_empty("offshore"))
    return normalized.groupBy("lang").agg(
        F.sum(F.when(F.col("offshore") == "", 1).otherwise(0)).cast("long").alias("n_empty"),
        F.sum(F.when(F.col("offshore_norm").isNull(), 1).otherwise(0)).cast("long").alias("n_null_after"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_NULLIF_ORACLE = """
SELECT lang,
       CAST(SUM(CASE WHEN offshore = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
       CAST(SUM(CASE WHEN nullif(offshore, '') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_after,
       COUNT(*) AS n_rows
FROM (
  SELECT lang, CASE WHEN source = 'src0' THEN '' ELSE source END AS offshore
  FROM documents
) t
GROUP BY lang
"""


# ---------------------------------------------------------------- A2/A3
def q_count_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 row-count gate (``bunny.py:228-229``, threshold 500) in its
    declarative single-row form."""
    return count_gate_df(load_table(spark, sf_dir, "customer"), 100)


_COUNT_GATE_ORACLE = """
SELECT COUNT(*) AS n_rows, CAST(100 AS BIGINT) AS min_rows,
       COUNT(*) >= 100 AS passed
FROM customer
"""


def q_missing_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 missing-tolerance gate (``retrieve.py:112-116``): values
    below 10 are nulled (simulating absent geocodes), then the ≤-N
    missing check runs."""
    events = load_table(spark, sf_dir, "events")
    staged = events.withColumn(
        "value", F.when(F.col("value") < 10.0, F.lit(None)).otherwise(F.col("value"))
    )
    return missing_gate_df(staged, ["value"], 100)


_MISSING_GATE_ORACLE = """
SELECT CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
       CAST(100 AS BIGINT) AS max_missing,
       SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) <= 100 AS passed
FROM (SELECT CASE WHEN value < 10.0 THEN NULL ELSE value END AS v FROM events) t
"""


# ---------------------------------------------------------------- flagship
_SEGMENT_MAP = {"BUILDING": "Construction", "MACHINERY": "Industrial"}


def q_flagship_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's attribute pipeline end-to-end (§7 phase 1):
    filter (P1) → derive key (F7) → value-map (F3) → merge (U1) →
    join_field ×2 (J1, broadcast) → dissolve-style rollup (A1).

    Shuffle budget: exactly one (the final groupBy) — both dimension
    attaches broadcast, filters/scalars fuse into the scan."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(
            F.col("c_custkey").alias("member_key"),
            strip_tokens("c_name", ["Customer#"]).cast("long").alias("member_num"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("segment"),
            F.lit("customer").alias("side"),
        )
    )
    cust = value_map(cust, "segment", _SEGMENT_MAP)
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("member_key"),
        strip_tokens("s_name", ["Supplier#"]).cast("long").alias("member_num"),
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_nationkey").alias("nationkey"),
        F.lit("supplier").alias("side"),
    )
    members = merge_by_name(cust, supp)
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    members = join_field(
        members, nation, left_on="nationkey", right_on="n_nationkey", fields=["n_name", "n_regionkey"]
    )
    members = join_field(
        members, region, left_on="n_regionkey", right_on="r_regionkey", fields=["r_name"]
    )
    return (
        members.groupBy("r_name", "n_name", "side")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            dec_sum("acctbal", "total_acctbal"),
            F.max("member_num").alias("max_member_num"),
        )
        .orderBy("r_name", "n_name", "side")
    )


_FLAGSHIP_ORACLE = f"""
WITH members AS (
  SELECT c_custkey AS member_key,
         CAST(replace(c_name, 'Customer#', '') AS BIGINT) AS member_num,
         c_acctbal AS acctbal, c_nationkey AS nationkey,
         CASE c_mktsegment WHEN 'BUILDING' THEN 'Construction'
                           WHEN 'MACHINERY' THEN 'Industrial'
                           ELSE c_mktsegment END AS segment,
         'customer' AS side
  FROM customer
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  UNION ALL
  SELECT s_suppkey, CAST(replace(s_name, 'Supplier#', '') AS BIGINT),
         s_acctbal, s_nationkey, NULL, 'supplier'
  FROM supplier
)
SELECT r_name, n_name, side, COUNT(*) AS n_members,
       {dec_sum_sql('acctbal', 'total_acctbal')},
       MAX(member_num) AS max_member_num
FROM members
LEFT JOIN nation ON nationkey = n_nationkey
LEFT JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name, side
ORDER BY r_name, n_name, side
"""


SPECS = [
    QuerySpec("ref_p1_filter_compound", q_filter_compound, _FILTER_ORACLE),
    QuerySpec("ref_f_scalar_surface", q_scalar_surface, _SCALAR_ORACLE),
    QuerySpec("ref_f3_value_map", q_value_map, _VALUE_MAP_ORACLE),
    QuerySpec("ref_j1_join_field_first_match", q_join_field_first_match, _JOIN_FIELD_ORACLE),
    QuerySpec("ref_u1_merge_by_name", q_merge_by_name, _MERGE_ORACLE),
    QuerySpec("ref_a1_dissolve_attach", q_dissolve_attach, _DISSOLVE_ORACLE),
    QuerySpec("ref_f8_fix_individual", q_fix_individual, _FIX_ORACLE),
    QuerySpec("ref_f10_nullif_empty", q_nullif_empty, _NULLIF_ORACLE),
    QuerySpec("ref_a2_count_gate", q_count_gate, _COUNT_GATE_ORACLE),
    QuerySpec("ref_a3_missing_gate", q_missing_gate, _MISSING_GATE_ORACLE),
    QuerySpec("ref_pipeline_flagship", q_flagship_pipeline, _FLAGSHIP_ORACLE),
]
