"""PII-redaction query (operators.privacy).

The synthetic documents contain no digits, so the query first injects
deterministic PII (keyed on doc_id mod 7) — an email, a phone, an
account number, or nothing — identically on the Spark and oracle
sides, then redacts. This exercises every pattern and the pass-order
contract while staying byte-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gis_city_county_spark.operators.privacy import (
    k_anonymity,
    k_anonymity_sql,
    l_diversity,
    l_diversity_sql,
    redact_pii,
    redact_pii_sql,
)
from gis_city_county_spark.sources.tables import load_table
from gis_city_county_spark.suite import QuerySpec


def _inject(doc_id, text):
    m = doc_id % 7
    return (
        F.when(
            m == 0,
            F.concat(
                text,
                F.lit(" contact user"),
                doc_id.cast("string"),
                F.lit("@example.com today"),
            ),
        )
        .when(m == 1, F.concat(text, F.lit(" call 555-867-5309 now")))
        .when(
            m == 2,
            F.concat(text, F.lit(" account 9"), (doc_id + 1000000).cast("string")),
        )
        .otherwise(text)
    )


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _inject(F.col("doc_id"), F.col("text")).alias("text")
    )
    return redact_pii(docs, "doc_id", "text")


_INJECTED_SQL = """
SELECT doc_id,
       CASE doc_id % 7
         WHEN 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@example.com today'
         WHEN 1 THEN text || ' call 555-867-5309 now'
         WHEN 2 THEN text || ' account 9' || CAST(doc_id + 1000000 AS VARCHAR)
         ELSE text
       END AS text
FROM documents
"""

_PII_ORACLE = redact_pii_sql(_INJECTED_SQL, "doc_id", "text")


_BLOCKED = ["src3", "src7", "src11"]


def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-exclusion: drop documents from blocklisted sources via a
    broadcast anti-join, count survivors per (lang, source)."""
    from gis_city_county_spark.operators.relational import blocklist_filter

    docs = load_table(spark, sf_dir, "documents")
    # Build the tiny blocklist JVM-side (literal array → explode): a
    # spark.createDataFrame here would route through the Python-RDD
    # path and pay a Python worker spin-up just to ship 3 strings.
    blocked = spark.range(1).select(
        F.explode(F.array(*[F.lit(s) for s in _BLOCKED])).alias("source")
    )
    kept = blocklist_filter(docs, "source", blocked)
    return (
        kept.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "source")
    )


_BLOCK_ORACLE = f"""
SELECT lang, source, COUNT(*) AS n_docs
FROM documents
WHERE source NOT IN ({", ".join(repr(s) for s in _BLOCKED)})
GROUP BY lang, source ORDER BY lang, source
"""


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymity audit of customers under the quasi-identifier
    (nation, market segment, $1000 balance band): group sizes plus a
    violates-k flag for combinations shared by fewer than 5 rows —
    the pre-release re-identification scan."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long").alias("bal_band"),
    )
    return k_anonymity(cust, ["c_nationkey", "c_mktsegment", "bal_band"], k=5)


_KANON_ORACLE = k_anonymity_sql(
    "SELECT c_nationkey, c_mktsegment, "
    "CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band FROM customer",
    ["c_nationkey", "c_mktsegment", "bal_band"],
    k=5,
)


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-diversity audit of customers: under the (nation, market
    segment) quasi-identifier, how many distinct $1000 balance bands
    (the sensitive attribute) each group carries — groups with < 3
    distinct values leak the attribute even when k-anonymous."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long").alias("bal_band"),
    )
    return l_diversity(cust, ["c_nationkey", "c_mktsegment"], "bal_band", l=3)


_LDIV_ORACLE = l_diversity_sql(
    "SELECT c_nationkey, c_mktsegment, "
    "CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band FROM customer",
    ["c_nationkey", "c_mktsegment"],
    "bal_band",
    l=3,
)


def q_suppressed_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymized release: customers whose (nation, segment, band)
    cell holds < 5 rows get the band suppressed to NULL, then the
    released counts per cell — every non-NULL cell in the output is
    k-anonymous by construction (the audit's apply step)."""
    from gis_city_county_spark.operators.privacy import suppress_small_cells

    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long").alias("bal_band"),
    )
    released = suppress_small_cells(
        cust, ["c_nationkey", "c_mktsegment"], "bal_band", k=5
    )
    return released.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


def _suppress_oracle() -> str:
    from gis_city_county_spark.operators.privacy import suppress_small_cells_sql

    inner = suppress_small_cells_sql(
        "SELECT c_nationkey, c_mktsegment, "
        "CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band FROM customer",
        ["c_nationkey", "c_mktsegment"],
        "bal_band",
        k=5,
    )
    return f"""
SELECT c_nationkey, c_mktsegment, bal_band, COUNT(*) AS n_rows
FROM ({inner}) GROUP BY 1, 2, 3
"""


_SUPPRESS_ORACLE = _suppress_oracle()


def q_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-DP randomized response on the order-is-finished bit per
    priority class, with the debiased estimate and its calibration
    error (md5 coins — deterministic, engine-portable)."""
    from gis_city_county_spark.operators.privacy import randomized_response

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("o_orderstatus") == "F").alias("is_final"),
    )
    return randomized_response(
        orders, "o_orderkey", "o_orderpriority", "is_final", flip_den=4
    )


def _rr_oracle() -> str:
    from gis_city_county_spark.operators.privacy import randomized_response_sql

    return randomized_response_sql(
        "(SELECT o_orderkey, o_orderpriority,"
        " o_orderstatus = 'F' AS is_final FROM orders)",
        "o_orderkey",
        "o_orderpriority",
        "is_final",
        flip_den=4,
    )


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-closeness audit of customers: per market segment, the ordered
    EMD between the group's balance-band distribution and the
    population's, in exact integer ppm."""
    from gis_city_county_spark.operators.privacy import t_closeness

    cust = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long").alias("bal_band"),
    )
    return t_closeness(cust, ["c_mktsegment"], "bal_band", t_ppm_max=20_000)


def _tclose_oracle() -> str:
    from gis_city_county_spark.operators.privacy import t_closeness_sql

    return t_closeness_sql(
        "SELECT c_mktsegment,"
        " CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band"
        " FROM customer",
        ["c_mktsegment"], "bal_band", t_ppm_max=20_000,
    )


_LADDER_LEVELS = [
    ["c_mktsegment", "c_nationkey", "bal_band"],
    ["c_mktsegment", "c_nationkey"],
    ["c_mktsegment"],
]


def q_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal-generalization audit of customers: for each finest
    (segment, nation, balance-band) cohort, which rung of the
    drop-a-column ladder first reaches k=10 anonymity — the release
    planner's per-cohort remediation level, one map-combinable
    group-size aggregate per rung."""
    from gis_city_county_spark.operators.privacy import generalization_ladder

    cust = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long").alias("bal_band"),
    )
    return generalization_ladder(cust, _LADDER_LEVELS, k=10)


def _ladder_oracle() -> str:
    from gis_city_county_spark.operators.privacy import generalization_ladder_sql

    src = (
        "SELECT c_mktsegment, c_nationkey,"
        " CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band"
        " FROM customer"
    )
    return generalization_ladder_sql(src, _LADDER_LEVELS, k=10)


def q_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible noisy per-segment customer counts (truncated
    discrete-Laplace mechanism, hash-seeded inverse-CDF draw) — the
    protected histogram a dataset card publishes; exact counts ride
    as the test audit."""
    from gis_city_county_spark.operators.privacy import dp_release

    cust = load_table(spark, sf_dir, "customer")
    return dp_release(cust, "c_mktsegment", epsilon=0.5, bound=16)


def _dp_release_oracle() -> str:
    from gis_city_county_spark.operators.privacy import dp_release_sql

    return dp_release_sql(
        "SELECT * FROM customer", "c_mktsegment", epsilon=0.5, bound=16
    )


def q_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed pseudonymization of event user ids (16-hex md5 tokens)
    with the truncation-collision audit riding per token."""
    from gis_city_county_spark.operators.privacy import pseudonymize

    ev = load_table(spark, sf_dir, "events")
    return pseudonymize(ev, "user_id")


def _pseudonymize_oracle() -> str:
    from gis_city_county_spark.operators.privacy import pseudonymize_sql

    return pseudonymize_sql("SELECT * FROM events", "user_id")


def q_apportioned_release(spark, sf_dir):
    """Largest-remainder apportionment of the order-priority
    distribution to exactly 1000 released units (see
    operators.privacy.apportioned_release) — the fixed-total
    disclosure format; released counts always sum to the budget."""
    from gis_city_county_spark.operators.privacy import apportioned_release

    o = load_table(spark, sf_dir, "orders")
    return apportioned_release(o, "o_orderpriority", total_budget=1000)


def _apportion_oracle() -> str:
    from gis_city_county_spark.operators.privacy import (
        apportioned_release_sql,
    )

    return apportioned_release_sql(
        "SELECT * FROM orders", "o_orderpriority", total_budget=1000
    )



SPECS = [
    QuerySpec("privacy_pseudonymize", q_pseudonymize,
              _pseudonymize_oracle()),
    QuerySpec("privacy_dp_release", q_dp_release, _dp_release_oracle()),
    QuerySpec("privacy_apportioned_release", q_apportioned_release,
              _apportion_oracle()),
    QuerySpec("privacy_t_closeness", q_t_closeness, _tclose_oracle()),
    QuerySpec("privacy_generalization_ladder", q_generalization_ladder,
              _ladder_oracle()),
    QuerySpec("privacy_randomized_response", q_randomized_response, _rr_oracle()),
    QuerySpec("text_redact_pii", q_redact_pii, _PII_ORACLE),
    QuerySpec("pipeline_blocklist_filter", q_blocklist_filter, _BLOCK_ORACLE),
    QuerySpec("privacy_k_anonymity", q_k_anonymity, _KANON_ORACLE),
    QuerySpec("privacy_l_diversity", q_l_diversity, _LDIV_ORACLE),
    QuerySpec("privacy_suppressed_release", q_suppressed_release, _SUPPRESS_ORACLE),
]
