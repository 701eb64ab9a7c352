"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a suite query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names and values
(order-insensitive: columns sorted by name, rows sorted by all
columns). Floats are compared exactly — the engine's decimal-sum
convention makes Spark and DuckDB produce bit-identical doubles, and
this harness is where that guarantee is enforced before the driver
ever sees a query.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

TABLES = (
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


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, pd.Timestamp):
        ts = v.tz_convert("UTC").tz_localize(None) if v.tzinfo else v
        return ts.isoformat()
    if hasattr(v, "tolist"):  # numpy scalars / arrays
        v = v.tolist()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]

    def key(row: tuple):
        return tuple((v is None, str(type(v)), str(v)) for v in row)

    return sorted(rows, key=key)


@dataclass
class OracleResult:
    ok: bool
    detail: str = ""


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> OracleResult:
    actual = spark_df.toPandas()
    expected = con.sql(sql).df()
    if sorted(actual.columns) != sorted(expected.columns):
        return OracleResult(
            False, f"columns differ: spark={sorted(actual.columns)} duckdb={sorted(expected.columns)}"
        )
    if len(actual) != len(expected):
        return OracleResult(False, f"row count differs: spark={len(actual)} duckdb={len(expected)}")
    a_rows, e_rows = _normalize(actual), _normalize(expected)
    cols = sorted(actual.columns)
    for i, (a, e) in enumerate(zip(a_rows, e_rows)):
        if a != e:
            diffs = [
                f"{c}: spark={av!r} duckdb={ev!r}"
                for c, av, ev in zip(cols, a, e)
                if av != ev
            ]
            return OracleResult(False, f"row {i} differs: " + "; ".join(diffs[:5]))
    return OracleResult(True)
