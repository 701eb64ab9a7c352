"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a suite query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names and values
(order-insensitive: columns sorted by name, rows sorted by all
columns).

The comparison is deliberately AT LEAST as strict as the external
driver's (r2 VERDICT item 4 — the laxer round-2 mirror let four
driver-red rows pass 365 local tests):

* **Type-sensitive cells**: the driver hashes pandas values without
  numeric coercion, so DuckDB ``SUM(int)`` → HUGEINT → float64 ``5.0``
  mismatches Spark BIGINT ``5`` even though ``5 == 5.0``.  Cells here
  compare as ``(type, value)`` pairs.
* **No array/map/struct cells**: the driver canonicalizer runs pandas
  ``sort_values`` over every column and crashes on list cells
  (``sim_kmeans_refine`` r2 ERR).  Any list-like cell fails the
  comparison outright.

Floats are compared exactly — the engine's decimal-sum / canonical-
order-fold conventions make Spark and DuckDB produce bit-identical
doubles, and this harness is where that guarantee is enforced before
the driver ever sees a query.
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


class _ArrayCell(Exception):
    """A list/map/struct landed in an oracle-checked output column."""


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, pd.Timestamp):
        ts = v.tz_convert("UTC").tz_localize(None) if v.tzinfo else v
        return ("Timestamp", ts.isoformat())
    if hasattr(v, "tolist"):  # numpy scalars / arrays
        v = v.tolist()
        if isinstance(v, float) and math.isnan(v):
            return None
    if isinstance(v, (list, tuple, dict, set)):
        raise _ArrayCell(
            f"array/map/struct cell {v!r} — the driver's pandas sort_values "
            "canonicalizer crashes on these; emit an exploded shape instead"
        )
    # bool is an int subclass; type name keeps bool/int/float/str/bytes
    # /Decimal/date all distinct, mirroring the driver's type-sensitive
    # value hash (int 5 != float 5.0).
    return (type(v).__name__, v)


def _normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]

    def key(row: tuple):
        return tuple((v is None, str(v)) for v in row)

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
    try:
        a_rows, e_rows = _normalize(actual), _normalize(expected)
    except _ArrayCell as exc:
        return OracleResult(False, str(exc))
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
