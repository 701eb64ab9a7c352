"""Declarative QA gates — the reference's real correctness mechanism.

The reference guards its pipeline with runtime data-quality assertions
(SURVEY.md §2.4 A2/A3): a minimum-row-count check before heavy work
(``bunny.py:228-229``, threshold ``config.py:75``), a missing-value
tolerance on source files (``retrieve.py:112-116``), and a planned
previous-vs-current diff gate (``quality_check.py:1-6``).

Gates come in two forms:

- **action gates** (``expect_*``) — run ``count()`` and raise
  :class:`GateError`; these are deliberate barriers, like the
  reference's.
- **declarative gates** (``*_df``) — single-row DataFrames carrying the
  measured value + pass flag, so the check itself is oracle-testable
  and can be persisted as a QA artifact.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class GateError(ValueError):
    """A data-quality gate failed; the pipeline must not proceed."""


def expect_min_count(df: DataFrame, min_rows: int, name: str = "input") -> DataFrame:
    """Reference A2 (``bunny.py:228-229``): raise if fewer than
    ``min_rows`` rows — wrong-layer / truncated-source detection."""
    n = df.count()
    if n < min_rows:
        raise GateError(f"{name}: {n} rows < required {min_rows}")
    return df


def _all_empty(df: DataFrame, cols: Sequence[str]):
    """Predicate: every listed column is NULL (or, for strings, '') —
    the shared definition of "missing" for both A3 gate forms. Raises
    loudly on an empty column list rather than silently passing."""
    if not cols:
        raise ValueError(
            "missing-gate needs at least one column to check (none of the "
            "expected columns are present in the input)"
        )
    dtypes = dict(df.dtypes)
    all_empty = None
    for c in cols:
        e = F.col(c).isNull()
        if dtypes.get(c) == "string":
            e = e | (F.col(c) == "")
        all_empty = e if all_empty is None else (all_empty & e)
    return all_empty


def expect_max_missing(
    df: DataFrame, cols: Sequence[str], max_missing: int, name: str = "input"
) -> DataFrame:
    """Reference A3 (``retrieve.py:112-116``): reject the source if
    more than ``max_missing`` rows have all of ``cols`` empty. "Empty"
    mirrors the reference's pandas ``.any(axis=1)`` truthiness: NULL
    always counts as missing, and for string columns ``''`` does too
    (empty string is falsy)."""
    missing = df.filter(_all_empty(df, cols)).count()
    if missing > max_missing:
        raise GateError(f"{name}: {missing} rows missing all of {cols} > {max_missing}")
    return df


def count_gate_df(df: DataFrame, min_rows: int) -> DataFrame:
    """Declarative form of A2: one row ``(n_rows, min_rows, passed)``."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.lit(min_rows).cast("long").alias("min_rows"),
        (F.count(F.lit(1)) >= min_rows).alias("passed"),
    )


def missing_gate_df(df: DataFrame, cols: Sequence[str], max_missing: int) -> DataFrame:
    """Declarative form of A3: one row with the missing count + flag.
    Same "empty" definition as :func:`expect_max_missing` (NULL, or
    ``''`` for string columns), so the two gate forms always agree."""
    miss = F.sum(
        F.when(_all_empty(df, cols), 1).otherwise(0)
    ).cast("long")
    return df.agg(
        miss.alias("n_missing"),
        F.lit(max_missing).cast("long").alias("max_missing"),
        (miss <= max_missing).alias("passed"),
    )


def diff_gate_df(
    current: DataFrame,
    previous: DataFrame,
    key_cols: Sequence[str],
    max_change_fraction: float,
) -> DataFrame:
    """The reference's planned publish gate (``quality_check.py:1-6``):
    block if the symmetric difference between releases exceeds a
    fraction of the previous release.

    Computed with two anti-joins (no full shuffle of payload columns —
    only ``key_cols`` move). Returns one row
    ``(n_added, n_removed, n_previous, change_fraction, passed)``.
    """
    cur_keys = current.select(*key_cols)
    prev_keys = previous.select(*key_cols)
    added = cur_keys.join(prev_keys, list(key_cols), "left_anti").count()
    removed = prev_keys.join(cur_keys, list(key_cols), "left_anti").count()
    n_prev = prev_keys.count()
    frac = (added + removed) / max(n_prev, 1)
    spark = current.sparkSession
    return spark.createDataFrame(
        [(added, removed, n_prev, float(frac), frac <= max_change_fraction)],
        "n_added long, n_removed long, n_previous long, change_fraction double, passed boolean",
    )


class RunReport:
    """The reference's alert buffer (``logging_and_alerts.py:13-67``:
    log to file + accumulate an in-memory buffer for the
    end-of-run email / GitHub-issue), re-expressed as a structured
    run report: gates record their outcome here, the pipeline
    publishes the report next to the data (auditable QA artifact),
    and ``raise_if_failed`` is the end-of-run alert barrier.

    Driver-side state only (a handful of rows per run) — never touches
    executors."""

    def __init__(self) -> None:
        self.entries: list[tuple[str, bool, str]] = []

    def record(self, gate: str, ok: bool, detail: str = "") -> None:
        self.entries.append((gate, bool(ok), detail))

    def check(self, gate: str, fn, *args, **kwargs):
        """Run an action gate, recording pass/fail instead of letting
        :class:`GateError` escape immediately (failures raise together
        at ``raise_if_failed`` — the reference reports ALL problems in
        one alert, not just the first)."""
        try:
            out = fn(*args, **kwargs)
        except GateError as e:
            self.record(gate, False, str(e))
            return None
        self.record(gate, True)
        return out

    @property
    def ok(self) -> bool:
        return all(ok for _, ok, _ in self.entries)

    def df(self, spark) -> DataFrame:
        return spark.createDataFrame(
            self.entries, "gate string, ok boolean, detail string"
        )

    def raise_if_failed(self) -> None:
        failed = [(g, d) for g, ok, d in self.entries if not ok]
        if failed:
            msg = "; ".join(f"{g}: {d}" for g, d in failed)
            raise GateError(f"{len(failed)} gate(s) failed: {msg}")


def observed_write(
    df: DataFrame,
    path: str,
    min_rows: int = 1,
    max_null_frac: dict[str, float] | None = None,
) -> dict:
    """Single-pass gated sink: QA metrics ride along the write action
    via ``df.observe`` instead of a separate ``count()``/scan — at
    100 TB the naive gate-then-write reads the source (and recomputes
    the whole plan) twice; this reads it once.

    Writes parquet to ``path`` (a staging location in the blue/green
    flow — ``publish_snapshot`` promotes only after the gate passes),
    then raises :class:`GateError` if the observed row count is below
    ``min_rows`` or any column's null fraction exceeds its bound.
    Returns the observed metrics dict either way the gate allows."""
    from pyspark.sql import Observation

    metrics = [F.count(F.lit(1)).alias("n_rows")]
    bounds = max_null_frac or {}
    for c in bounds:
        metrics.append(
            F.avg(F.col(c).isNull().cast("double")).alias(f"null_frac_{c}")
        )
    obs = Observation("write_gate")
    df.observe(obs, *metrics).write.mode("overwrite").parquet(path)
    got = obs.get
    if got["n_rows"] < min_rows:
        raise GateError(
            f"observed_write: {got['n_rows']} rows < required {min_rows}"
        )
    for c, bound in bounds.items():
        frac = got[f"null_frac_{c}"] or 0.0
        if frac > bound:
            raise GateError(
                f"observed_write: null fraction of {c} = {frac:.4f} > {bound}"
            )
    return got


def expect_schema(df: DataFrame, ddl: str, ignore_nullability: bool = True) -> DataFrame:
    """Schema-contract gate: assert the DataFrame matches a DDL string
    ("name type, ..."), raising :class:`GateError` with the exact
    field-level diff (missing / unexpected / type-mismatched) —
    the data-contract check a pipeline runs before publishing to
    consumers who bind to the schema. Plan-only: touches no data."""
    from pyspark.sql.types import _parse_datatype_string

    expected = _parse_datatype_string(ddl)
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in expected.fields}
    problems = []
    for name, t in want.items():
        if name not in got:
            problems.append(f"missing column {name} {t}")
        elif got[name] != t:
            problems.append(f"{name}: expected {t}, got {got[name]}")
    for name in got:
        if name not in want:
            problems.append(f"unexpected column {name} {got[name]}")
    if not ignore_nullability:
        nullable = {f.name: f.nullable for f in df.schema.fields}
        for f in expected.fields:
            if f.name in nullable and nullable[f.name] and not f.nullable:
                problems.append(f"{f.name}: expected non-nullable")
    if problems:
        raise GateError("schema contract violated: " + "; ".join(problems))
    return df
