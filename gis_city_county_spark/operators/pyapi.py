"""Python-API operator surfaces: grouped ``applyInPandas`` and UDTF.

The engine's design rule is JVM expressions for everything expressible
(see README "Scale design"); these operators exist for the residue
that genuinely needs imperative Python — and they pin the Arrow
plumbing (schemas, grouping, batch shapes) with oracle-checked
queries so the escape hatches are as trusted as the native path.
The reference's own escape hatch was CalculateField code blocks
(`src/bunnyhop/bunny.py:79-86`); this is the Spark-shaped equivalent.

Determinism: both operators below use only integer/string operations
on already-exact inputs, so their results are bit-identical to their
SQL twins.
"""

from __future__ import annotations

import re

# Module-level so pandas-UDF type hints (stringized by the __future__
# annotations import) resolve through this module's globals.
import pandas as pd
from collections.abc import Iterator  # noqa: F401  (pandas-UDF hints)

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def user_span_features(df: DataFrame, user_col: str, ts_col: str, value_col: str) -> DataFrame:
    """Per-user lifetime features via grouped ``applyInPandas``: event
    count, first/last event micros, the maximum inter-event gap (µs)
    and the index of the event starting that gap — the "one state
    machine per key over the full ordered history" shape that window
    functions express awkwardly and Python expresses directly.

    One shuffle on the user key; each group arrives as a single Arrow
    batch, sorted in Python (Spark does not guarantee intra-group
    order) — so per-group memory is the bound, exactly like any
    session-state operator. All arithmetic is integer microseconds.
    """
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("first_us", T.LongType()),
            T.StructField("last_us", T.LongType()),
            T.StructField("max_gap_us", T.LongType()),
            T.StructField("gap_start_idx", T.LongType()),
        ]
    )

    def features(pdf):
        import numpy as np
        import pandas as pd

        us = np.sort(pdf["__us"].to_numpy())
        n = len(us)
        if n > 1:
            gaps = np.diff(us)
            # argmax returns the FIRST index of the maximum — the
            # earliest max gap, matching the SQL twin's MIN(idx).
            gap_idx = int(np.argmax(gaps))
            max_gap = int(gaps[gap_idx])
        else:
            max_gap, gap_idx = 0, 0
        return pd.DataFrame(
            {
                "user_id": [int(pdf[user_col].iloc[0])],
                "n_events": [n],
                "first_us": [int(us[0])],
                "last_us": [int(us[-1])],
                "max_gap_us": [max_gap],
                "gap_start_idx": [gap_idx],
            }
        )

    src = df.select(
        F.col(user_col), F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us")
    )
    return src.groupBy(user_col).applyInPandas(features, out_schema)


def user_span_features_sql(events_sql: str) -> str:
    """DuckDB twin of :func:`user_span_features` (ties in the gap max
    resolve to the earliest gap start on both sides: Python keeps the
    first strict improvement; SQL picks min index among maxima)."""
    return f"""
WITH ev AS ({events_sql}),
ordered AS (
  SELECT user_id, epoch_us(ts) AS us,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) - 1 AS idx
  FROM ev
),
gaps AS (
  SELECT user_id, idx - 1 AS gap_start_idx,
         us - LAG(us) OVER (PARTITION BY user_id ORDER BY idx) AS gap
  FROM ordered
),
agg AS (
  SELECT user_id, COUNT(*) AS n_events, MIN(us) AS first_us, MAX(us) AS last_us
  FROM ordered GROUP BY user_id
),
best AS (
  SELECT user_id,
         COALESCE(MAX(gap), 0) AS max_gap_us
  FROM gaps GROUP BY user_id
),
best_idx AS (
  SELECT g.user_id, MIN(g.gap_start_idx) AS gap_start_idx
  FROM gaps g JOIN best b ON b.user_id = g.user_id AND g.gap = b.max_gap_us
  GROUP BY g.user_id
)
SELECT a.user_id, a.n_events, a.first_us, a.last_us,
       b.max_gap_us,
       COALESCE(bi.gap_start_idx, 0) AS gap_start_idx
FROM agg a
JOIN best b USING (user_id)
LEFT JOIN best_idx bi USING (user_id)
"""


_WS = re.compile(r"\s+")


def chunk_udtf_class(chunk: int, stride: int):
    """Build the UDTF class for Python-side document chunking — the
    table-function form of :func:`corpus.chunk_documents` (same
    window/stride contract, same output schema), used to pin the UDTF
    surface against both the native operator and the DuckDB oracle.
    """

    class ChunkDocs:
        def eval(self, doc_id: int, text: str):  # noqa: D401
            t = (text or "").strip().lower()
            toks = _WS.split(t) if t else []
            if not toks:
                return
            n = len(toks)
            last_k = (n - chunk + stride - 1) // stride if n > chunk else 0
            for k in range(last_k + 1):
                piece = toks[k * stride : k * stride + chunk]
                yield doc_id, k, " ".join(piece), len(piece)

    return ChunkDocs


def chunk_documents_udtf(
    df: DataFrame, id_col: str, text_col: str, chunk: int = 64, stride: int = 48
) -> DataFrame:
    """Run the chunking UDTF laterally against ``df`` (one output row
    per window). Python UDTFs are the slow path — row-at-a-time — so
    this exists as the API-surface twin; the production operator is
    the array-expression :func:`corpus.chunk_documents`."""
    from pyspark.sql.functions import udtf

    cls = chunk_udtf_class(chunk, stride)
    chunker = udtf(
        cls,
        returnType=(
            f"{id_col} bigint, chunk_id bigint, chunk_text string, "
            "n_chunk_tokens bigint"
        ),
    )
    spark = df.sparkSession
    name = f"__chunk_udtf_{chunk}_{stride}"
    spark.udtf.register(name, chunker)
    df.select(F.col(id_col).alias("__cid"), F.col(text_col).alias("__ctext")) \
        .createOrReplaceTempView(name + "_src")
    return spark.sql(
        f"SELECT c.* FROM {name}_src, LATERAL {name}(__cid, __ctext) AS c"
    )


def group_median(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group lower median via a GROUPED_AGG pandas UDF — the
    Arrow-batched aggregate-function surface (the third Python escape
    hatch next to applyInPandas and UDTF).

    "Lower median" = the element at sorted index ⌊(n−1)/2⌋: an actual
    input value, no averaging — so the result is bit-deterministic and
    oracle-able (the SQL twin picks the same row with ROW_NUMBER).
    One shuffle on the group key; each group's values stream into one
    Arrow buffer, so per-group memory is the bound — same contract as
    any holistic aggregate (exact medians don't partial-aggregate).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def lower_median(v: pd.Series) -> float:
        import numpy as np

        a = np.sort(v.to_numpy())
        return float(a[(len(a) - 1) // 2])

    # Spark forbids mixing built-in aggregates with GROUPED_AGG pandas
    # UDFs in one agg(); the row count comes from a second (cheap,
    # map-side-combinable) aggregation joined back on the group key.
    med = df.groupBy(group_col).agg(
        lower_median(F.col(value_col).cast("double")).alias("median_lo")
    )
    n = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    return n.join(med, group_col).select(group_col, "n", "median_lo").orderBy(group_col)


def group_median_sql(table_sql: str, group_col: str, value_col: str) -> str:
    """DuckDB oracle twin of :func:`group_median`."""
    return f"""
WITH ranked AS (
  SELECT {group_col} AS grp, CAST({value_col} AS DOUBLE) AS v,
         ROW_NUMBER() OVER (PARTITION BY {group_col}
                            ORDER BY CAST({value_col} AS DOUBLE)) AS rn,
         COUNT(*) OVER (PARTITION BY {group_col}) AS n
  FROM ({table_sql})
)
SELECT grp AS {group_col}, CAST(n AS BIGINT) AS n, v AS median_lo
FROM ranked WHERE rn = (n - 1) // 2 + 1
ORDER BY {group_col}
"""


def arrow_byte_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-row UTF-8 byte/char accounting via ``mapInArrow`` — the
    zero-copy batch surface (no pandas conversion at all): each Arrow
    record batch is transformed with vectorized ``pyarrow.compute``
    kernels. The storage-cost estimator for a text corpus (bytes ≠
    chars once CJK enters), and the plumbing witness for custom
    Arrow-native operators (tokenizers, codecs) at 100 TB — narrow,
    scan-side, no shuffle.
    """
    import pyarrow as pa

    src = df.select(F.col(id_col), F.col(text_col))

    def stats(batches):
        import pyarrow.compute as pc

        for batch in batches:
            ids = batch.column(0)
            txt = batch.column(1)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pc.binary_length(txt),
                    pc.utf8_length(txt),
                ],
                names=[id_col, "n_bytes", "n_codepoints"],
            )

    return src.mapInArrow(stats, f"{id_col} long, n_bytes int, n_codepoints int")


def arrow_byte_stats_sql(table_sql: str, id_col: str, text_col: str) -> str:
    """DuckDB oracle twin of :func:`arrow_byte_stats` (octet_length on
    the UTF-8 encoding vs character length)."""
    return f"""
SELECT {id_col}, CAST(octet_length(encode({text_col})) AS INTEGER) AS n_bytes,
       CAST(length({text_col}) AS INTEGER) AS n_codepoints
FROM ({table_sql})
"""


def arrow_group_stats(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group stats via grouped ``applyInArrow`` — the fourth
    Python escape hatch (whole group as Arrow record batches, no
    pandas materialization), completing the witness set next to
    applyInPandas / GROUPED_AGG / mapInArrow. Outputs are
    order-independent kernels only (count, min, max, integer
    floor-sum), so the result is engine-exact even though Arrow sums
    each group in arrival order. Group-sized memory: each group must
    fit one executor — same contract as any grouped-map API."""
    import pyarrow as pa

    def stats(tbl: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        g = tbl.column(group_col)
        v = tbl.column(value_col)
        return pa.Table.from_arrays(
            [
                pa.array([g[0].as_py()]),
                pa.array([tbl.num_rows], type=pa.int64()),
                pa.array([pc.min(v).as_py()], type=pa.float64()),
                pa.array([pc.max(v).as_py()], type=pa.float64()),
                pa.array(
                    [pc.sum(pc.floor(v).cast(pa.int64())).as_py()],
                    type=pa.int64(),
                ),
            ],
            names=[group_col, "n", "min_value", "max_value", "sum_floor"],
        )

    return df.select(group_col, value_col).groupBy(group_col).applyInArrow(
        stats, f"{group_col} string, n long, min_value double, max_value double, sum_floor long"
    )


def arrow_group_stats_sql(table_sql: str, group_col: str, value_col: str) -> str:
    """DuckDB oracle twin of :func:`arrow_group_stats`."""
    return f"""
SELECT {group_col}, COUNT(*) AS n,
       CAST(MIN({value_col}) AS DOUBLE) AS min_value,
       CAST(MAX({value_col}) AS DOUBLE) AS max_value,
       CAST(SUM(CAST(FLOOR({value_col}) AS BIGINT)) AS BIGINT) AS sum_floor
FROM ({table_sql}) GROUP BY {group_col}
"""


def scalar_iter_text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """SCALAR_ITER pandas-UDF witness: per-row text features through
    the iterator-batched scalar surface — the variant that amortizes
    one-time setup (model load, tokenizer init) across every Arrow
    batch of a partition instead of paying it per batch. The stand-in
    'model' here is a closure-initialized vowel table; outputs are
    exact integers."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def vowel_count(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        vowels = set("aeiou")  # "expensive setup", once per partition
        for s in batches:
            yield s.map(lambda t: sum(1 for ch in t if ch in vowels))

    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        vowel_count(F.col(text_col)).alias("n_vowels"),
    )


def scalar_iter_text_stats_sql(table_sql: str, id_col: str, text_col: str) -> str:
    """DuckDB oracle twin of :func:`scalar_iter_text_stats`."""
    return f"""
SELECT {id_col},
       CAST(length({text_col}) AS BIGINT) AS n_chars,
       CAST(length({text_col})
            - length(regexp_replace({text_col}, '[aeiou]', '', 'g')) AS BIGINT)
         AS n_vowels
FROM ({table_sql})
"""
