"""The correctness/benchmark query suite.

Each :class:`QuerySpec` pairs a Spark query (``fn(spark, sf_dir) ->
DataFrame``) with its DuckDB oracle SQL twin (``oracle``). The driver
runs both at sf0.01 and hash-compares row counts, schemas and values —
column names are aliased identically on both sides, numeric aggregates
go through the decimal-sum convention (``functions.numeric``) so the
doubles match bit-for-bit, and every query ends with a deterministic
total order being unnecessary (the driver sorts) but deterministic
*values* being mandatory.

Queries that are genuinely not SQL-expressible set ``oracle=None`` and
get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    # False for constant-size golden-fixture checks (e.g. geometry
    # micro-polygons): they verify correctness but don't scale with
    # sf_dir, so timing them would only measure plan latency.
    bench: bool = True


# The driver window rotates each round; the round→window map (and the
# per-round re-proof sets) live in ``suite/windows.py`` — edit THAT
# file to rotate.  ``tests/test_contract_shapes.py`` derives its
# assertions from the same map.
from gis_city_county_spark.suite.windows import (  # noqa: F401  (re-exports)
    CURRENT_ROUND,
    CURRENT_WINDOW,
    DRIVER_WINDOW,
    REPROOFS,
    WINDOWS,
)



def all_specs() -> list[QuerySpec]:
    """Assemble the full suite (import here to avoid import cycles).

    The current round's driver window (:data:`CURRENT_WINDOW`) registers
    first, in its pinned order; every other spec follows in canonical
    module order.
    """
    from gis_city_county_spark.suite import (
        cdc_q,
        corpus_q,
        dedup_q,
        events_q,
        functions_q,
        geo_q,
        graph_q,
        layout_q,
        multimodal_q,
        packing_q,
        parity,
        privacy_q,
        similarity_q,
        sketch_q,
        temporal_q,
        text_q,
        tpch,
        tpch_ext,
    )

    specs: list[QuerySpec] = []
    for mod in (
        parity, geo_q, dedup_q, similarity_q, text_q, multimodal_q,
        corpus_q, sketch_q, privacy_q, graph_q, cdc_q, events_q,
        temporal_q, packing_q, layout_q, functions_q, tpch, tpch_ext,
    ):
        specs.extend(mod.SPECS)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names"

    by_name = {s.name: s for s in specs}
    missing = [n for n in CURRENT_WINDOW if n not in by_name]
    assert not missing, f"window names not registered: {missing}"
    window = [by_name[n] for n in CURRENT_WINDOW]
    rest = [s for s in specs if s.name not in set(CURRENT_WINDOW)]
    return window + rest
