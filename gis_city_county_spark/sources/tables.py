"""Parquet table catalog for the synthetic test warehouse.

The reference materializes every named intermediate into a file
geodatabase workspace (reference ``config.py:157-180``); our engine's
equivalent of "a named table" is a parquet directory + lazy DataFrame.
Columnar parquet scans give predicate pushdown and column pruning for
free — the 100 TB path is the same code with a bigger ``sf_dir``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one table. Filters/projections applied by callers
    reach the parquet reader via Catalyst pushdown."""
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize the events table's ``ts`` column to session-TZ
    TIMESTAMP regardless of how the generator wrote it. Known layouts:

    - TIMESTAMP(NANOS): a parquet type Spark rejects — read the raw
      int64 nanos (``nanosAsLong``) and floor to microseconds; the
      DuckDB oracle mirrors this with ``make_timestamp(epoch_us(ts))``.
    - timestamp[us] without UTC adjustment: Spark reads TIMESTAMP_NTZ;
      cast to TIMESTAMP (session TZ pinned to UTC, so values are
      preserved and the DuckDB naive-timestamp oracle still matches).

    Conversion is a projection — no materialization; pushdown on the
    other columns is unaffected."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(table_path(sf_dir, "events"))
    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return raw


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = CORE_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = CORE_TABLES) -> None:
    """Expose the catalog as temp views so operators can be written in
    SQL where that is clearer (same Catalyst plan either way)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
