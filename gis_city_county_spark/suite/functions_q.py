"""Scalar-function batteries: the date/time and string surfaces.

The reference's scalar layer is string slicing + padding (SURVEY.md
§2.3); a Spark replacement exposes the full built-in function surface.
These two queries pin the cross-engine behavior of the most-used
scalar families against DuckDB — every expression is JVM-side
(whole-stage codegen), and only functions with identical semantics in
both engines are used (e.g. no initcap/translate — DuckDB lacks or
diverges on them; covered instead by the parity suite's F-functions
where the engine defines the semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gis_city_county_spark.sources.tables import load_table
from gis_city_county_spark.suite import QuerySpec


def q_date_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery over order dates: extraction
    (year/month/quarter/day), truncation, month arithmetic, day
    diffs, epoch seconds, and formatting — aggregated per (year,
    month) so the output is bounded and every value is an exact
    min/max over exact per-row derivations."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    derived = orders.select(
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.quarter(d).alias("q"),
        F.dayofmonth(d).alias("dom"),
        F.date_trunc("month", d).alias("month_start"),
        F.add_months(d, 3).cast("timestamp").alias("plus3m"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias("days_since"),
        F.unix_seconds(d.cast("timestamp")).alias("epoch_s"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )
    return derived.groupBy("y", "m").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("q").alias("q"),
        F.max("dom").alias("max_dom"),
        F.min("month_start").alias("month_start"),
        F.min("plus3m").alias("min_plus3m"),
        F.min("days_since").alias("min_days_since"),
        F.max("epoch_s").alias("max_epoch_s"),
        F.min("ym").alias("ym"),
    )


_DATE_ORACLE = """
WITH derived AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
         CAST(month(o_orderdate) AS INTEGER) AS m,
         CAST(quarter(o_orderdate) AS INTEGER) AS q,
         CAST(day(o_orderdate) AS INTEGER) AS dom,
         date_trunc('month', o_orderdate) AS month_start,
         CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3m,
         date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
         CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
         strftime(o_orderdate, '%Y-%m') AS ym
  FROM orders
)
SELECT y, m, COUNT(*) AS n_orders, MIN(q) AS q, MAX(dom) AS max_dom,
       MIN(month_start) AS month_start, MIN(plus3m) AS min_plus3m,
       MIN(days_since) AS min_days_since, MAX(epoch_s) AS max_epoch_s,
       MIN(ym) AS ym
FROM derived GROUP BY y, m
"""


def q_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery over customer rows: case mapping,
    slicing, padding, search, split/size, reverse, concat_ws, replace
    and levenshtein — aggregated per market segment over exact string
    min/max."""
    cust = load_table(spark, sf_dir, "customer")
    name = F.col("c_name")
    derived = cust.select(
        "c_mktsegment",
        F.upper(name).alias("up"),
        F.lower(name).alias("lo"),
        F.substring(name, 1, 8).alias("pre8"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("key12"),
        F.instr(name, "1").cast("long").alias("pos1"),
        F.size(F.split(name, "#")).cast("long").alias("n_parts"),
        F.reverse(name).alias("rev"),
        F.concat_ws("-", F.col("c_mktsegment"), name).alias("seg_name"),
        F.regexp_replace(name, "Customer", "C").alias("shortname"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING")).cast("long").alias("lev"),
        F.length(name).cast("long").alias("len"),
    )
    return derived.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("up").alias("min_up"),
        F.max("lo").alias("max_lo"),
        F.max("pre8").alias("max_pre8"),
        F.max("key12").alias("max_key12"),
        F.max("pos1").alias("max_pos1"),
        F.max("n_parts").alias("max_parts"),
        F.max("rev").alias("max_rev"),
        F.min("seg_name").alias("min_seg_name"),
        F.max("shortname").alias("max_short"),
        F.min("lev").alias("lev"),
        F.max("len").alias("max_len"),
    )


_STRING_ORACLE = """
WITH derived AS (
  SELECT c_mktsegment,
         upper(c_name) AS up,
         lower(c_name) AS lo,
         substring(c_name, 1, 8) AS pre8,
         lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS key12,
         CAST(strpos(c_name, '1') AS BIGINT) AS pos1,
         CAST(len(string_split(c_name, '#')) AS BIGINT) AS n_parts,
         reverse(c_name) AS rev,
         concat_ws('-', c_mktsegment, c_name) AS seg_name,
         regexp_replace(c_name, 'Customer', 'C', 'g') AS shortname,
         CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS lev,
         CAST(length(c_name) AS BIGINT) AS len
  FROM customer
)
SELECT c_mktsegment, COUNT(*) AS n,
       MIN(up) AS min_up, MAX(lo) AS max_lo, MAX(pre8) AS max_pre8,
       MAX(key12) AS max_key12, MAX(pos1) AS max_pos1,
       MAX(n_parts) AS max_parts, MAX(rev) AS max_rev,
       MIN(seg_name) AS min_seg_name, MAX(shortname) AS max_short,
       MIN(lev) AS lev, MAX(len) AS max_len
FROM derived GROUP BY c_mktsegment
"""


SPECS = [
    QuerySpec("func_date_battery", q_date_battery, _DATE_ORACLE),
    QuerySpec("func_string_battery", q_string_battery, _STRING_ORACLE),
]


def q_null_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics battery: null-safe equality (<=>), NULLIF/
    COALESCE/NVL2 routing, null-skipping vs null-counting aggregates,
    and conditional aggregates (count_if, bool_and/bool_or) — pinned
    over a column with injected NULLs (every 7th customer's balance).
    The three-valued-logic corners that silently corrupt pipelines
    when engines disagree."""
    cust = load_table(spark, sf_dir, "customer")
    src = cust.select(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 7 != 0, F.col("c_acctbal")).alias("bal"),
        (F.col("c_custkey") % 3 == 0).alias("flag"),
    )
    return (
        src.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("bal").alias("n_nonnull"),
            F.sum(F.col("bal").isNull().cast("long")).alias("n_null"),
            F.count_if(F.col("bal").isNull() & F.col("flag")).alias("n_null_flagged"),
            F.sum(
                (F.col("bal").eqNullSafe(F.lit(None).cast("double"))).cast("long")
            ).alias("n_nullsafe_eq_null"),
            F.min(F.coalesce("bal", F.lit(0.0))).alias("min_coalesced"),
            F.bool_and("flag").alias("all_flagged"),
            F.bool_or(F.col("bal").isNull()).alias("any_null"),
            F.sum(F.nullif(F.col("bal"), F.lit(0.0)).isNull().cast("long")).alias(
                "n_zero_or_null"
            ),
        )
        .orderBy("c_mktsegment")
    )


_NULL_ORACLE = """
WITH src AS (
  SELECT c_mktsegment,
         CASE WHEN c_custkey % 7 <> 0 THEN c_acctbal END AS bal,
         c_custkey % 3 = 0 AS flag
  FROM customer
)
SELECT c_mktsegment,
       COUNT(*) AS n_rows,
       COUNT(bal) AS n_nonnull,
       CAST(SUM(CASE WHEN bal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(COUNT(*) FILTER (WHERE bal IS NULL AND flag) AS BIGINT) AS n_null_flagged,
       CAST(SUM(CASE WHEN bal IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nullsafe_eq_null,
       MIN(COALESCE(bal, 0.0)) AS min_coalesced,
       BOOL_AND(flag) AS all_flagged,
       BOOL_OR(bal IS NULL) AS any_null,
       CAST(SUM(CASE WHEN NULLIF(bal, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero_or_null
FROM src GROUP BY 1 ORDER BY 1
"""


def q_bitwise_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise surface: scalar shifts/AND/OR/XOR plus the bit_and /
    bit_or / bit_xor aggregates, over order keys per priority — the
    flag-packing arithmetic a feature store leans on."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    src = orders.select(
        "o_orderpriority",
        (k % 256).alias("b"),
        F.expr("shiftleft(o_orderkey % 16, 2)").alias("shifted"),
    )
    return (
        src.groupBy("o_orderpriority")
        .agg(
            F.bit_and("b").alias("band"),
            F.bit_or("b").alias("bor"),
            F.bit_xor("b").alias("bxor"),
            F.sum(F.expr("b & 15")).alias("sum_low_nibble"),
            F.sum(F.expr("b | 16")).alias("sum_or16"),
            F.sum(F.expr("b ^ 255")).alias("sum_flipped"),
            F.sum("shifted").alias("sum_shifted"),
            F.sum(F.expr("shiftright(b, 3)")).alias("sum_shr3"),
        )
        .orderBy("o_orderpriority")
    )


_BITWISE_ORACLE = """
WITH src AS (
  SELECT o_orderpriority, o_orderkey % 256 AS b,
         (o_orderkey % 16) << 2 AS shifted
  FROM orders
)
SELECT o_orderpriority,
       CAST(BIT_AND(b) AS BIGINT) AS band,
       CAST(BIT_OR(b) AS BIGINT) AS bor,
       CAST(BIT_XOR(b) AS BIGINT) AS bxor,
       CAST(SUM(b & 15) AS BIGINT) AS sum_low_nibble,
       CAST(SUM(b | 16) AS BIGINT) AS sum_or16,
       CAST(SUM(xor(b, 255)) AS BIGINT) AS sum_flipped,
       CAST(SUM(shifted) AS BIGINT) AS sum_shifted,
       CAST(SUM(b >> 3) AS BIGINT) AS sum_shr3
FROM src GROUP BY 1 ORDER BY 1
"""


SPECS += [
    QuerySpec("func_null_battery", q_null_battery, _NULL_ORACLE),
    QuerySpec("func_bitwise_battery", q_bitwise_battery, _BITWISE_ORACLE),
]


def q_try_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe ingestion surface: try_cast on malformed numerics/
    dates, try_divide by zero, try_to_number — NULL instead of a
    failed job, the contract dirty-ingest pipelines rely on. Probe
    strings are derived from real columns so malformed and valid
    cases both occur."""
    docs = load_table(spark, sf_dir, "documents")
    # probe = sometimes-numeric string: doc ids ending in 3 get a 'x'
    staged = docs.select(
        "lang",
        "n_chars",
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 3,
            F.concat(F.col("doc_id").cast("string"), F.lit("x")),
        )
        .otherwise(F.col("doc_id").cast("string"))
        .alias("probe"),
        F.concat(
            F.lit("2024-"),
            F.lpad((F.col("doc_id") % 15).cast("string"), 2, "0"),
            F.lit("-01"),
        ).alias("date_probe"),
    )
    src = staged.select(
        "lang",
        F.expr("try_cast(probe AS BIGINT)").alias("as_long"),
        F.try_divide(F.col("n_chars").cast("double"), F.col("doc_id") % 5).alias(
            "div5"
        ),
        F.expr("try_cast(date_probe AS DATE)").alias("maybe_date"),
    )
    return (
        src.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("as_long").alias("n_parsed"),
            F.sum(F.col("as_long").isNull().cast("long")).alias("n_failed"),
            F.count("div5").alias("n_div_ok"),
            F.sum(F.col("div5").isNull().cast("long")).alias("n_div_by_zero"),
            F.count("maybe_date").alias("n_valid_dates"),
        )
        .orderBy("lang")
    )


_TRY_ORACLE = """
WITH src AS (
  SELECT lang,
         TRY_CAST(CASE WHEN doc_id % 10 = 3
                       THEN CAST(doc_id AS VARCHAR) || 'x'
                       ELSE CAST(doc_id AS VARCHAR) END AS BIGINT) AS as_long,
         CASE WHEN doc_id % 5 = 0 THEN NULL
              ELSE CAST(n_chars AS DOUBLE) / (doc_id % 5) END AS div5,
         TRY_CAST('2024-' || lpad(CAST(doc_id % 15 AS VARCHAR), 2, '0') || '-01'
                  AS DATE) AS maybe_date
  FROM documents
)
SELECT lang, COUNT(*) AS n,
       COUNT(as_long) AS n_parsed,
       CAST(SUM(CASE WHEN as_long IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
       COUNT(div5) AS n_div_ok,
       CAST(SUM(CASE WHEN div5 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_div_by_zero,
       COUNT(maybe_date) AS n_valid_dates
FROM src GROUP BY 1 ORDER BY 1
"""


def q_map_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType machinery witness: per customer segment build a
    priority→count map (map_from_arrays over sorted keys — never
    collect_list order), filter entries below 100 with map_filter,
    double the surviving counts with transform_values, then explode
    back to rows. The oracle states the equivalent relational
    semantics; the map build/filter/transform/explode round-trip is
    what's being pinned on the Spark side."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    per = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    packed = per.groupBy("c_mktsegment").agg(
        F.map_from_arrays(
            F.sort_array(F.collect_list(F.struct("o_orderpriority", "cnt"))).getField(
                "o_orderpriority"
            ),
            F.sort_array(F.collect_list(F.struct("o_orderpriority", "cnt"))).getField(
                "cnt"
            ),
        ).alias("m")
    )
    transformed = packed.select(
        "c_mktsegment",
        F.map_filter("m", lambda k, v: v >= 100).alias("m"),
    ).select(
        "c_mktsegment",
        F.transform_values("m", lambda k, v: v * 2).alias("m"),
    )
    return (
        transformed.select("c_mktsegment", F.explode("m").alias("priority", "doubled"))
        .orderBy("c_mktsegment", "priority")
    )


_MAP_ORACLE = """
SELECT c_mktsegment, o_orderpriority AS priority,
       CAST(COUNT(*) * 2 AS BIGINT) AS doubled
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2 HAVING COUNT(*) >= 100
ORDER BY 1, 2
"""


SPECS += [
    QuerySpec("func_try_battery", q_try_battery, _TRY_ORACLE),
    QuerySpec("func_map_roundtrip", q_map_roundtrip, _MAP_ORACLE),
]
