"""Deterministic numeric aggregation helpers.

Floating-point SUM/AVG are order-dependent under parallel execution;
two runs (or two engines) can differ in the last ulps. For
oracle-comparable results the engine sums through ``DECIMAL(38,10)``
(exact, associative — order-independent) and casts back to double at
the end. Overhead is one cast per value, all JVM-side, and the
aggregation stays a map-side-combinable partial agg, so this is safe
at 100 TB (decimal sum is what TPC-H implementations do anyway).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(38,10)"


def dec_sum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM: sum in DECIMAL(38,10), emit double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double")
    return out.alias(alias) if alias else out


def dec_avg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG: exact decimal sum → double, then one
    double division by the count (identical in any engine)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dec_sum_sql(expr: str, alias: str) -> str:
    """DuckDB oracle twin of :func:`dec_sum`.

    DuckDB's direct ``CAST(DECIMAL AS DOUBLE)`` divides the int128 by
    a power of ten in floating point and can be 1 ulp off the
    correctly-rounded value (Spark's BigDecimal.doubleValue is
    correctly rounded). Routing through VARCHAR forces a
    correctly-rounded string→double parse, making the two engines
    bit-identical."""
    return f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS {alias}"


def dec_avg_sql(expr: str, alias: str) -> str:
    """DuckDB oracle twin of :func:`dec_avg` (see rounding note in
    :func:`dec_sum_sql`)."""
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
