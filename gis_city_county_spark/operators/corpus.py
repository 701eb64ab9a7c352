"""Corpus-shaping operators for training-data pipelines.

Greenfield relative to the reference (SURVEY.md §7 phase 7, BASELINE
north star): the sharding/cleaning steps a 100 TB pretraining corpus
goes through between raw documents and training shards —

* **chunking**: split each document into fixed-token windows with
  overlap (context-window packing upstream of tokenization);
* **decontamination**: flag training documents sharing k-gram shingles
  with a held-out evaluation set;
* **deterministic splits**: hash-keyed train/val/test assignment that
  is stable across runs, engines, and cluster sizes;
* **repetition stats**: within-document token repetition ratios, the
  standard boilerplate/low-diversity signal.

Everything is JVM-side Column expressions (array transforms over the
token array, explode, broadcast joins) — zero Python UDFs, so the hot
path stays inside whole-stage codegen. Each operator has an exact
DuckDB SQL twin for the oracle gate.

Scale notes (100 TB):
* chunking and repetition stats are scan-side (narrow) until their
  single aggregation; no join, no second pass over the corpus.
* decontamination broadcasts the *held-out* shingle set (benchmarks
  are small by construction) so the training side is a map-side hash
  join; only the hit rows reach the per-document aggregation.
* split assignment is a pure projection — a filter on it pushes down
  to the parquet scan like any other predicate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gis_city_county_spark.operators.scale import rebalance_for_fanout
from gis_city_county_spark.operators.sketch import _h60, _h60_sql
from gis_city_county_spark.operators.textstats import tokens, tokens_sql

# ------------------------------------------------------------------ chunking


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping fixed-size token windows per document.

    Window ``i`` covers tokens ``[i*stride, i*stride + chunk)``; the
    last window may be short. Documents with zero tokens produce no
    chunks. Output: (id, chunk_id, chunk_text, n_chunk_tokens).

    The token array, window count, and slices are all array
    expressions evaluated during the scan; ``explode`` fans out to one
    row per window with no shuffle.
    """
    assert 0 < stride <= chunk
    with_toks = rebalance_for_fanout(df, multiplier=16.0).select(
        F.col(id_col).alias("__id"), tokens(text_col).alias("__toks")
    ).filter(F.size("__toks") > 0)
    last_k = F.expr(
        f"CASE WHEN size(__toks) > {chunk} "
        f"THEN (size(__toks) - {chunk} + {stride} - 1) div {stride} "
        f"ELSE 0 END"
    ).cast("long")
    exploded = with_toks.select(
        "__id",
        "__toks",
        F.explode(F.sequence(F.lit(0).cast("long"), last_k)).alias("chunk_id"),
    )
    piece = F.expr(f"slice(__toks, int(chunk_id * {stride}) + 1, {chunk})")
    return exploded.select(
        F.col("__id").alias(id_col),
        "chunk_id",
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
    )


def chunk_documents_sql(
    table: str, id_col: str, text_col: str, chunk: int = 64, stride: int = 48
) -> str:
    return f"""
WITH toks AS (
  SELECT {id_col}, {tokens_sql(text_col)} AS t FROM {table}
),
nonempty AS (SELECT * FROM toks WHERE len(t) > 0),
fanned AS (
  SELECT {id_col}, t, g.k AS chunk_id
  FROM nonempty,
       LATERAL UNNEST(generate_series(
         0,
         CASE WHEN len(t) > {chunk}
              THEN (len(t) - {chunk} + {stride} - 1) // {stride}
              ELSE 0 END)) AS g(k)
)
SELECT {id_col}, chunk_id,
       array_to_string(
         list_slice(t, chunk_id * {stride} + 1,
                    least(chunk_id * {stride} + {chunk}, len(t))), ' ')
         AS chunk_text,
       least(chunk_id * {stride} + {chunk}, len(t)) - chunk_id * {stride}
         AS n_chunk_tokens
FROM fanned
"""


# ------------------------------------------------------- repetition stats


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Within-document repetition: token count, distinct-token count,
    distinct ratio, and the frequency share of the most common token.

    One explode + one two-level aggregation keyed on the document id;
    the map-side partial agg collapses each document's tokens before
    the shuffle, so shuffle volume is O(distinct tokens), not O(tokens).
    """
    exploded = rebalance_for_fanout(df, multiplier=16.0).select(
        F.col(id_col).alias("__id"), F.explode(tokens(text_col)).alias("tok")
    )
    per_tok = exploded.groupBy("__id", "tok").agg(F.count(F.lit(1)).alias("c"))
    agg = per_tok.groupBy("__id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("max_token_freq"),
    )
    return agg.select(
        F.col("__id").alias(id_col),
        "n_tokens",
        "n_distinct",
        "max_token_freq",
        (F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double")
         ).alias("distinct_ratio"),
        (F.col("max_token_freq").cast("double") / F.col("n_tokens").cast("double")
         ).alias("top_token_ratio"),
    )


def repetition_stats_sql(table: str, id_col: str, text_col: str) -> str:
    return f"""
WITH tok AS (
  SELECT {id_col}, unnest({tokens_sql(text_col)}) AS tok FROM {table}
),
per_tok AS (
  SELECT {id_col}, tok, COUNT(*) AS c FROM tok GROUP BY {id_col}, tok
),
agg AS (
  SELECT {id_col},
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         COUNT(*) AS n_distinct,
         MAX(c) AS max_token_freq
  FROM per_tok GROUP BY {id_col}
)
SELECT {id_col}, n_tokens, n_distinct, max_token_freq,
       CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS distinct_ratio,
       CAST(max_token_freq AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_token_ratio
FROM agg
"""


# ------------------------------------------------------ deterministic split


def split_assign(df: DataFrame, key_col: str) -> DataFrame:
    """Append a deterministic ``split`` column (80/10/10
    train/val/test) keyed on the md5 of ``key_col``.

    Stable across runs, partitionings, and engines — the property that
    matters when the corpus is rebuilt incrementally: a document's
    split never changes, so no eval example ever leaks into training
    on a later rebuild. A pure projection; filters on ``split``
    push down to the scan.
    """
    bucket = _h60(F.col(key_col).cast("string")) % 10
    return df.withColumn(
        "split",
        F.when(bucket == 0, "test").when(bucket == 1, "val").otherwise("train"),
    )


def split_case_sql(key_expr: str) -> str:
    b = f"{_h60_sql(f'CAST({key_expr} AS VARCHAR)')} % 10"
    return (
        f"CASE WHEN {b} = 0 THEN 'test' "
        f"WHEN {b} = 1 THEN 'val' ELSE 'train' END"
    )


# ------------------------------------------------------ shard assignment


def shard_assign(
    df: DataFrame, key_col: str, n_shards: int = 16
) -> DataFrame:
    """Deterministic training-shard assignment + within-shard order.

    ``shard`` = md5-hash bucket of the key (uniform, layout-stable);
    ``pos`` = rank of the key's hash within its shard. Together they
    define a reproducible global example order (shard-major) that is
    independent of partitioning and cluster size — the property a
    resumable data loader needs. Hash-ordering within the shard is
    also an effective within-shard *shuffle*: adjacent source
    documents land far apart.

    Plan: pure projection for ``shard``; one shuffle keyed on
    ``shard`` for the rank window. Shards are hash-uniform so the
    window partitions are balanced by construction — no global sort,
    no single-partition bottleneck.
    """
    h = _h60(F.col(key_col).cast("string"))
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("__h", key_col)
    return (
        df.withColumn("__h", h)
        .withColumn("shard", (F.col("__h") % n_shards).cast("long"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("__h")
    )


def shard_assign_sql(source_sql: str, key_col: str, n_shards: int = 16) -> str:
    h = _h60_sql(f"CAST({key_col} AS VARCHAR)")
    return f"""
WITH src AS ({source_sql}),
hashed AS (SELECT *, {h} AS __h, {h} % {n_shards} AS shard FROM src)
SELECT * EXCLUDE (__h),
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY __h, {key_col})
            AS BIGINT) AS pos
FROM hashed
"""


# --------------------------------------------------- corpus n-gram top-k


def ngram_topk(
    df: DataFrame,
    group_col: str,
    text_col: str,
    n: int = 2,
    k: int = 10,
) -> DataFrame:
    """Top-k most frequent token n-grams per group (every occurrence
    counts, unlike the decontamination shingles which are per-document
    sets). Ties break lexicographically so the result is total-ordered.

    Plan: scan-side n-gram explode → two-level count (map-side partial
    agg collapses repeats before the shuffle) → per-group rank window.
    The rank window reuses the count shuffle's hash partitioning on
    the group key, so the whole query is one wide exchange.
    """
    from pyspark.sql import Window

    grams = F.expr(
        f"CASE WHEN size(__t) >= {n} THEN "
        f"transform(sequence(1, size(__t) - {n - 1}),"
        f" i -> concat_ws(' ', slice(__t, i, {n}))) "
        f"ELSE array() END"
    )
    counts = (
        rebalance_for_fanout(df, multiplier=16.0)
        .select(F.col(group_col), tokens(text_col).alias("__t"))
        .select(group_col, F.explode(grams).alias("ngram"))
        .groupBy(group_col, "ngram")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("freq"), F.asc("ngram"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ngram_topk_sql(
    source_sql: str, group_col: str, text_col: str, n: int = 2, k: int = 10
) -> str:
    parts = " || ' ' || ".join(f"list_extract(t, i + {j})" for j in range(n))
    return f"""
WITH src AS ({source_sql}),
toks AS (SELECT {group_col}, {tokens_sql(text_col)} AS t FROM src),
grams AS (
  SELECT {group_col}, {parts} AS ngram
  FROM toks, LATERAL UNNEST(generate_series(1, len(t) - {n - 1})) AS g(i)
  WHERE len(t) >= {n}
),
counts AS (
  SELECT {group_col}, ngram, COUNT(*) AS freq FROM grams GROUP BY 1, 2
)
SELECT * FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY {group_col}
              ORDER BY freq DESC, ngram ASC) AS BIGINT) AS rank
  FROM counts
) WHERE rank <= {k}
"""


# --------------------------------------------------------- decontamination


def _shingle_array_expr(toks: str, k: int):
    return F.expr(
        f"CASE WHEN size({toks}) >= {k} THEN "
        f"array_distinct(transform(sequence(1, size({toks}) - {k - 1}),"
        f" i -> concat_ws(' ', slice({toks}, i, {k})))) "
        f"ELSE array() END"
    )


def contamination(
    train: DataFrame,
    heldout: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
) -> DataFrame:
    """Flag training documents sharing any k-token shingle with a
    held-out set. Output per training document (with ≥1 shingle):
    (id, n_shingles, n_hits, contamination_ratio).

    Plan shape: the held-out shingle set is distinct-ed and
    **broadcast** (eval benchmarks are tiny next to the corpus), so
    the training side is a single pass: scan → shingle explode →
    broadcast *left* join carrying a hit marker → one per-document
    aggregation counting rows and markers together. The corpus is
    read once, the shingle arrays are built once, and the only
    shuffle is the per-document count (map-side combined).
    """
    heldout_sh = (
        heldout.select(tokens(text_col).alias("__t"))
        .select(F.explode(_shingle_array_expr("__t", k)).alias("shingle"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    exploded = (
        rebalance_for_fanout(train, multiplier=16.0)
        .select(F.col(id_col).alias("__id"), tokens(text_col).alias("__t"))
        .select("__id", F.explode(_shingle_array_expr("__t", k)).alias("shingle"))
    )
    return (
        exploded.join(F.broadcast(heldout_sh), "shingle", "left")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__hit").alias("n_hits"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_shingles",
            "n_hits",
            (
                F.col("n_hits").cast("double")
                / F.col("n_shingles").cast("double")
            ).alias("contamination_ratio"),
        )
    )


def contamination_sql(
    train_table: str,
    heldout_table: str,
    id_col: str,
    text_col: str,
    k: int = 5,
) -> str:
    parts = " || ' ' || ".join(f"list_extract(t, i + {j})" for j in range(k))
    return f"""
WITH ho_toks AS (
  SELECT {tokens_sql(text_col)} AS t FROM {heldout_table}
),
ho_sh AS (
  SELECT DISTINCT {parts} AS shingle
  FROM ho_toks, LATERAL UNNEST(generate_series(1, len(t) - {k - 1})) AS g(i)
  WHERE len(t) >= {k}
),
tr_toks AS (
  SELECT {id_col} AS __id, {tokens_sql(text_col)} AS t FROM {train_table}
),
tr_sh AS (
  SELECT DISTINCT __id, {parts} AS shingle
  FROM tr_toks, LATERAL UNNEST(generate_series(1, len(t) - {k - 1})) AS g(i)
  WHERE len(t) >= {k}
),
base AS (
  SELECT __id, COUNT(*) AS n_shingles FROM tr_sh GROUP BY __id
),
hits AS (
  SELECT __id, COUNT(*) AS n_hits
  FROM tr_sh JOIN ho_sh USING (shingle) GROUP BY __id
)
SELECT b.__id AS {id_col}, b.n_shingles,
       COALESCE(h.n_hits, 0) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / CAST(b.n_shingles AS DOUBLE)
         AS contamination_ratio
FROM base b LEFT JOIN hits h ON b.__id = h.__id
"""


# ----------------------------------------------- quantile band filter


def quantile_band_filter(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> DataFrame:
    """Keep rows whose ``value_col`` lies inside the per-group exact
    quantile band ``[lo_q, hi_q]`` — the outlier trim a corpus runs on
    document lengths / quality scores per language.

    Two passes by necessity (the bounds are data-dependent): one
    per-group exact-percentile aggregate (|groups| rows — broadcast),
    then a scan-side filter against the broadcast bounds. Exact
    ``percentile`` on integral values is engine-identical
    (see ``olap_percentiles``); the approximate 100 TB path swaps in
    ``approx_percentile`` without changing the shape.
    """
    v = F.col(value_col).cast("double")
    bounds = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, {lo_q})").alias("__lo"),
        F.expr(f"percentile({value_col}, {hi_q})").alias("__hi"),
    )
    return (
        df.join(F.broadcast(bounds), group_col)
        .filter((v >= F.col("__lo")) & (v <= F.col("__hi")))
        .drop("__lo", "__hi")
    )


def quantile_band_filter_sql(
    source_sql: str,
    group_col: str,
    value_col: str,
    cols: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> str:
    return f"""
WITH src AS ({source_sql}),
bounds AS (
  SELECT {group_col},
         quantile_cont({value_col}, {lo_q}) AS __lo,
         quantile_cont({value_col}, {hi_q}) AS __hi
  FROM src GROUP BY {group_col}
)
SELECT {cols} FROM src JOIN bounds USING ({group_col})
WHERE CAST({value_col} AS DOUBLE) >= __lo
  AND CAST({value_col} AS DOUBLE) <= __hi
"""


def mixture_resample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    shares: dict[str, float],
    budget_frac: float = 0.5,
) -> DataFrame:
    """Resample a corpus toward a target mixture: given per-group
    target shares (e.g. language proportions for a training mix) and a
    token budget (``budget_frac`` of the current total), derive each
    group's deterministic sampling rate and keep rows by the weighted
    key-hash filter — the "rebalance the data mix" stage of a
    training-data pipeline.

    rate(g) = min(1, share(g) · budget / tokens(g)) — groups above
    their target are downsampled proportionally, groups at/below keep
    everything (no upsampling; duplication is a separate op).

    Scale shape: one aggregate over the corpus for the per-group token
    totals (map-side combinable; output is |groups| rows), a broadcast
    join of those rates back onto the stream, then a pure filter —
    membership depends only on (id, rate), so the sample is stable
    across runs, engines and partitionings, and the whole pass adds no
    shuffle of the corpus itself.

    Returns the kept rows with ``rate`` attached.
    """
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.sketch import weighted_hash_sample

    stats = df.groupBy(group_col).agg(F.sum(weight_col).alias("__toks"))
    total = stats.agg(F.sum("__toks").alias("__total"))
    share_lits = F.array(
        *[
            F.struct(F.lit(g).alias(group_col), F.lit(s).alias("__share"))
            for g, s in sorted(shares.items())
        ]
    )
    share_df = df.sparkSession.range(1).select(F.explode(share_lits).alias("s")).select("s.*")
    rate = F.least(
        F.lit(1.0),
        (
            F.col("__share")
            * (F.lit(budget_frac) * F.col("__total").cast("double"))
        )
        / F.col("__toks").cast("double"),
    )
    rates = (
        stats.join(F.broadcast(share_df), group_col)
        .crossJoin(F.broadcast(total))
        .select(group_col, rate.alias("rate"))
    )
    joined = df.join(F.broadcast(rates), group_col)
    return weighted_hash_sample(joined, id_col, F.col("rate"))


def mixture_resample_sql(
    table: str,
    group_col: str,
    id_col: str,
    weight_col: str,
    shares: dict[str, float],
    budget_frac: float = 0.5,
) -> str:
    """DuckDB twin of :func:`mixture_resample` (kept rows + rate)."""
    from gis_city_county_spark.operators.sketch import (
        weighted_hash_sample_predicate_sql,
    )

    values = ", ".join(f"('{g}', {s!r})" for g, s in sorted(shares.items()))
    pred = weighted_hash_sample_predicate_sql(f"d.{id_col}", "r.rate")
    return f"""
WITH stats AS (
  SELECT {group_col}, SUM({weight_col}) AS __toks FROM {table} GROUP BY {group_col}
),
tot AS (SELECT SUM(__toks) AS __total FROM stats),
shares({group_col}, __share) AS (VALUES {values}),
rates AS (
  SELECT s.{group_col},
         LEAST(1.0, (sh.__share * ({budget_frac!r} * CAST(t.__total AS DOUBLE)))
                    / CAST(s.__toks AS DOUBLE)) AS rate
  FROM stats s JOIN shares sh USING ({group_col}) CROSS JOIN tot t
)
SELECT d.*, r.rate
FROM {table} d JOIN rates r USING ({group_col})
WHERE {pred}
"""


def mixture_duplicate(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    shares: dict[str, float],
    budget_frac: float = 2.0,
) -> DataFrame:
    """The upsampling half of data-mix rebalancing (complement of
    :func:`mixture_resample`): given target shares and a token budget
    above the current total, emit each row ``floor(rate)`` times plus
    one more with probability ``frac(rate)`` — deterministic
    stochastic rounding via the key-hash point, so expected group
    tokens hit the target exactly and the output is stable across
    engines and partitionings.

    Scale shape: the duplication is a scan-side ``explode(sequence)``
    — no shuffle, fan-out proportional to the rate — and each copy
    carries ``copy_idx`` so downstream shuffles/packing can spread
    duplicates (a training pipeline interleaves them into different
    shards rather than adjacent rows).
    """
    from pyspark.sql import functions as F

    from gis_city_county_spark.operators.sketch import _SPACE, _h60

    stats = df.groupBy(group_col).agg(F.sum(weight_col).alias("__toks"))
    total = stats.agg(F.sum("__toks").alias("__total"))
    share_lits = F.array(
        *[
            F.struct(F.lit(g).alias(group_col), F.lit(s).alias("__share"))
            for g, s in sorted(shares.items())
        ]
    )
    share_df = df.sparkSession.range(1).select(F.explode(share_lits).alias("s")).select("s.*")
    rate = (
        F.col("__share") * (F.lit(budget_frac) * F.col("__total").cast("double"))
    ) / F.col("__toks").cast("double")
    rates = (
        stats.join(F.broadcast(share_df), group_col)
        .crossJoin(F.broadcast(total))
        .select(group_col, rate.alias("rate"))
    )
    joined = df.join(F.broadcast(rates), group_col)
    u = _h60(F.col(id_col).cast("string")).cast("double") / F.lit(float(_SPACE))
    n_copies = (
        F.floor(F.col("rate")).cast("long")
        + F.when(u < F.col("rate") - F.floor(F.col("rate")), F.lit(1)).otherwise(F.lit(0))
    )
    # sequence(1, 0) in Spark is the DESCENDING [1, 0], not empty —
    # rows rounding to zero copies must be dropped explicitly.
    copies = F.when(
        F.col("__n_copies") >= 1, F.expr("sequence(1, __n_copies)")
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        joined.withColumn("__n_copies", n_copies)
        .select("*", F.explode(copies).alias("copy_idx"))
        .drop("__n_copies")
    )


def mixture_duplicate_sql(
    table: str,
    group_col: str,
    id_col: str,
    weight_col: str,
    shares: dict[str, float],
    budget_frac: float = 2.0,
) -> str:
    """DuckDB twin of :func:`mixture_duplicate`."""
    from gis_city_county_spark.operators.sketch import _SPACE, _h60_sql

    values = ", ".join(f"('{g}', {s!r})" for g, s in sorted(shares.items()))
    u = f"CAST({_h60_sql(f'CAST(d.{id_col} AS VARCHAR)')} AS DOUBLE) / {float(_SPACE)!r}"
    n_copies = (
        f"CAST(FLOOR(r.rate) AS BIGINT) + "
        f"(CASE WHEN {u} < r.rate - FLOOR(r.rate) THEN 1 ELSE 0 END)"
    )
    return f"""
WITH stats AS (
  SELECT {group_col}, SUM({weight_col}) AS __toks FROM {table} GROUP BY {group_col}
),
tot AS (SELECT SUM(__toks) AS __total FROM stats),
shares({group_col}, __share) AS (VALUES {values}),
rates AS (
  SELECT s.{group_col},
         (sh.__share * ({budget_frac!r} * CAST(t.__total AS DOUBLE)))
         / CAST(s.__toks AS DOUBLE) AS rate
  FROM stats s JOIN shares sh USING ({group_col}) CROSS JOIN tot t
),
expanded AS (
  SELECT d.*, r.rate, {n_copies} AS __n_copies
  FROM {table} d JOIN rates r USING ({group_col})
)
SELECT * EXCLUDE (__n_copies), CAST(g.i AS BIGINT) AS copy_idx
FROM expanded, LATERAL UNNEST(generate_series(1, __n_copies)) AS g(i)
WHERE __n_copies >= 1
"""


# ------------------------------------------------------ PMI co-occurrence


def pmi_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_k: int = 200,
    top_k: int = 25,
) -> DataFrame:
    """Token co-occurrence with PMI-style scoring: which vocabulary
    terms appear in the same documents far more often than their
    independent document frequencies predict (collocations, templated
    boilerplate, topic anchors).

    Scale shape: the corpus collapses once into a thin
    ``(doc_id, token)`` relation restricted to the ``vocab_k`` highest
    document-frequency tokens (a broadcast filter), so the per-document
    pair fan-out is bounded by vocab size — never O(doc_len²) — and
    the pair join shuffles only ids+tokens keyed on ``doc_id``. The
    score is exact integer arithmetic end-to-end:
    ``pmi_ppm = ⌊n_pair · n_docs · 10⁶ / (df_a · df_b)⌋`` (> 10⁶ ⇒
    positive association), so ranking is bit-deterministic across
    engines. Top-k executes as TakeOrderedAndProject.
    """
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    # vocab feeds the membership filter and both df attachments —
    # materialize the tiny limit-k relation once; tok itself stays
    # UN-materialized (r12: checkpointing the full token stream
    # measured 1.6× slower than letting the two consumers re-run the
    # scan-side tokenize in parallel within one action; the row-local
    # pairing below already cut tok's evaluations from 3 to 2)
    tok = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.array_distinct(tokens(text_col))).alias("token"),
    )
    totals = df.agg(F.count(F.lit(1)).alias("n_docs"))
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    vocab = _materialize_for_multipass(
        dfreq.orderBy(F.col("df").desc(), F.col("token").asc()).limit(vocab_k)
    )
    tokv = tok.join(F.broadcast(vocab.select("token")), "token")
    # per-document pair fan-out is ROW-LOCAL (tokens are distinct per
    # doc and vocab-bounded): collect each doc's sorted surviving
    # tokens and explode the C(m,2) ordered pairs from one evaluation
    # instead of self-joining two copies of the vocab-filtered stream
    # (guide §2.4 — the ascending sort yields token_a < token_b); the
    # constant-per-token df values attach afterwards from the
    # broadcast vocab, off the pair aggregate's key.
    grouped = tokv.groupBy("__doc").agg(
        F.array_sort(F.collect_list("token")).alias("__ts")
    )
    pairs = (
        grouped.select(
            F.explode(
                F.expr(
                    "flatten(transform(__ts, (x, i) ->"
                    " transform(slice(__ts, i + 2, size(__ts)),"
                    " y -> struct(x AS token_a, y AS token_b))))"
                )
            ).alias("__p")
        )
        .select("__p.token_a", "__p.token_b")
        .groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .join(
            F.broadcast(
                vocab.select(
                    F.col("token").alias("token_a"), F.col("df").alias("df_a")
                )
            ),
            "token_a",
        )
        .join(
            F.broadcast(
                vocab.select(
                    F.col("token").alias("token_b"), F.col("df").alias("df_b")
                )
            ),
            "token_b",
        )
    )
    # `div` = exact integral division on decimals (matches HUGEINT `//`
    # in the twin); a decimal `/` would round at scale 6 first and can
    # disagree with floor division in the last integer.
    score = F.expr(
        "(CAST(n_pair AS DECIMAL(38,0)) * CAST(n_docs AS DECIMAL(38,0)) * 1000000)"
        " div (CAST(df_a AS DECIMAL(38,0)) * CAST(df_b AS DECIMAL(38,0)))"
    ).cast("long")
    return (
        pairs.crossJoin(F.broadcast(totals))
        .select(
            "token_a",
            "token_b",
            "n_pair",
            "df_a",
            "df_b",
            "n_docs",
            score.alias("pmi_ppm"),
        )
        .orderBy(F.col("pmi_ppm").desc(), "token_a", "token_b")
        .limit(top_k)
    )


def pmi_pairs_sql(
    table_sql: str,
    id_col: str,
    text_col: str,
    vocab_k: int = 200,
    top_k: int = 25,
) -> str:
    """DuckDB oracle twin of :func:`pmi_pairs` (HUGEINT integer score)."""
    return f"""
WITH tok AS (
  SELECT {id_col} AS doc, t.token
  FROM ({table_sql}),
       LATERAL UNNEST(list_distinct({tokens_sql(text_col)})) AS t(token)
),
totals AS (SELECT COUNT(*) AS n_docs FROM ({table_sql})),
dfreq AS (SELECT token, COUNT(*) AS df FROM tok GROUP BY token),
vocab AS (SELECT token, df FROM dfreq ORDER BY df DESC, token ASC LIMIT {vocab_k}),
tokv AS (SELECT tok.doc, tok.token, vocab.df FROM tok JOIN vocab USING (token)),
pairs AS (
  SELECT a.token AS token_a, b.token AS token_b, a.df AS df_a, b.df AS df_b,
         COUNT(*) AS n_pair
  FROM tokv a JOIN tokv b ON a.doc = b.doc AND a.token < b.token
  GROUP BY 1, 2, 3, 4
)
SELECT token_a, token_b, n_pair, df_a, df_b, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(CAST(n_pair AS HUGEINT) * n_docs * 1000000
            // (CAST(df_a AS HUGEINT) * df_b) AS BIGINT) AS pmi_ppm
FROM pairs CROSS JOIN totals
ORDER BY pmi_ppm DESC, token_a, token_b LIMIT {top_k}
"""


# ------------------------------------------------ pair-merge induction


def pair_merge_rounds(
    df: DataFrame,
    id_col: str,
    text_col: str,
    rounds: int = 3,
    joiner: str = "_",
) -> DataFrame:
    """BPE-style merge-rule induction over the corpus: ``rounds``
    iterations of (count adjacent token pairs corpus-wide → take the
    most frequent pair → merge its non-overlapping occurrences greedily
    left-to-right), returning the learned merge table
    ``(round, w1, w2, pair_count)`` — the heart of tokenizer training,
    run as a relational program.

    The greedy left-to-right replacement is made order-parallel with a
    run decomposition: within each maximal run of consecutive matching
    positions, exactly the odd-offset positions merge (a run longer
    than 1 only occurs when w1 = w2, e.g. "the the the") — so the
    sequential scan becomes two windows (run grouping via
    pos − row_number, then run-relative rank parity). All state stays
    in a ``(doc, pos, token)`` relation: each round is a lead-window
    pair count (one shuffle on doc), a corpus top-1
    (TakeOrderedAndProject), and a rebuild projection; the relation is
    localCheckpoint'ed per round to truncate lineage. Counts and
    tiebreaks ((count desc, w1, w2)) are exact integers —
    bit-deterministic on any engine; the DuckDB twin unrolls the same
    rounds as CTEs.
    """
    seq = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(text_col)).alias("pos", "token"),
    ).localCheckpoint()
    merges = []
    for r in range(1, rounds + 1):
        w = Window.partitionBy("doc").orderBy("pos")
        # the lead-windowed relation feeds BOTH the pair count (via the
        # broadcast top-1 job) and the rebuild's main pass — truncate
        # it once per round instead of re-running the shuffle+sort
        # twice (guide §3.3)
        paired = seq.withColumn("nxt", F.lead("token").over(w)).localCheckpoint(
            eager=False
        )
        cnt = (
            paired.filter(F.col("nxt").isNotNull())
            .groupBy(F.col("token").alias("w1"), F.col("nxt").alias("w2"))
            .agg(F.count(F.lit(1)).alias("pair_count"))
        )
        win = cnt.orderBy(
            F.col("pair_count").desc(), F.col("w1").asc(), F.col("w2").asc()
        ).limit(1)
        marked = paired.crossJoin(F.broadcast(win)).withColumn(
            "m",
            F.coalesce(
                (F.col("token") == F.col("w1")) & (F.col("nxt") == F.col("w2")),
                F.lit(False),
            ),
        )
        # Run decomposition WITHOUT the two (doc, pos) self-joins the
        # r11 version paid (guide §2.4 — each was a full shuffle+sort
        # of the token relation per round): the running match count
        # ranks each matching position among matches, pos − that rank
        # is constant exactly on maximal runs of consecutive matches
        # (strictly increasing across runs — a gap advances pos
        # without advancing the count), and every window below
        # partitions by doc (or doc+grp, satisfied by the same hash
        # clustering), so the whole rebuild is one exchange + sorts.
        staged = (
            marked.withColumn(
                "__rnm",
                F.sum(F.when(F.col("m"), 1).otherwise(0)).over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
            .withColumn(
                "__grp", F.when(F.col("m"), F.col("pos") - F.col("__rnm"))
            )
            .withColumn(
                "__rk",
                F.row_number().over(
                    Window.partitionBy("doc", "__grp").orderBy("pos")
                ),
            )
            .withColumn(
                "__mg", F.col("m") & (F.col("__rk") % 2 == 1)
            )
        )
        rebuilt = (
            staged.withColumn(
                # position consumed by the merge at pos−1 (positions
                # are dense within a doc, so lag IS pos−1)
                "__pm", F.coalesce(F.lag("__mg").over(w), F.lit(False))
            )
            .filter(~F.col("__pm"))
            .select(
                "doc",
                "pos",
                F.when(
                    F.col("__mg"),
                    F.concat_ws(joiner, F.col("token"), F.col("nxt")),
                )
                .otherwise(F.col("token"))
                .alias("token"),
            )
        )
        seq = rebuilt.select(
            "doc",
            (
                F.row_number().over(Window.partitionBy("doc").orderBy("pos")) - 1
            ).alias("pos"),
            "token",
        ).localCheckpoint()
        merges.append(win.withColumn("round", F.lit(r)))
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.select("round", "w1", "w2", "pair_count").orderBy("round")


def pair_merge_rounds_sql(
    table_sql: str,
    id_col: str,
    text_col: str,
    rounds: int = 3,
    joiner: str = "_",
) -> str:
    """DuckDB oracle twin of :func:`pair_merge_rounds` (rounds
    unrolled as CTE chains; same run-parity greedy semantics)."""
    ctes = [
        f"""seq0 AS (
  SELECT {id_col} AS doc, g.i - 1 AS pos, t[g.i] AS token
  FROM (SELECT {id_col}, {tokens_sql(text_col)} AS t FROM ({table_sql})) s,
       LATERAL UNNEST(generate_series(1, len(t))) AS g(i)
)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""paired{r} AS (
  SELECT doc, pos, token,
         LEAD(token) OVER (PARTITION BY doc ORDER BY pos) AS nxt
  FROM seq{p}
),
win{r} AS (
  SELECT token AS w1, nxt AS w2, COUNT(*) AS pair_count
  FROM paired{r} WHERE nxt IS NOT NULL
  GROUP BY 1, 2 ORDER BY pair_count DESC, w1 ASC, w2 ASC LIMIT 1
),
marked{r} AS (
  SELECT p.doc, p.pos, p.token, p.nxt,
         (p.token = w.w1 AND p.nxt = w.w2) AS m
  FROM paired{r} p CROSS JOIN win{r} w
),
runs{r} AS (
  SELECT doc, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc ORDER BY pos) AS grp
  FROM marked{r} WHERE m
),
sel{r} AS (
  SELECT doc, pos AS mpos FROM (
    SELECT doc, pos,
           ROW_NUMBER() OVER (PARTITION BY doc, grp ORDER BY pos) AS rk
    FROM runs{r}
  ) WHERE rk % 2 = 1
),
seq{r} AS (
  SELECT doc,
         ROW_NUMBER() OVER (PARTITION BY doc ORDER BY pos) - 1 AS pos,
         token
  FROM (
    SELECT m.doc, m.pos,
           CASE WHEN s.mpos IS NOT NULL
                THEN m.token || '{joiner}' || m.nxt
                ELSE m.token END AS token
    FROM marked{r} m
    LEFT JOIN sel{r} s ON s.doc = m.doc AND s.mpos = m.pos
    WHERE NOT EXISTS (
      SELECT 1 FROM sel{r} s2 WHERE s2.doc = m.doc AND s2.mpos = m.pos - 1
    )
  )
)"""
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, w1, w2, CAST(pair_count AS BIGINT) AS pair_count FROM win{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM ({unions}) ORDER BY round"


def apply_merges(
    df: DataFrame,
    id_col: str,
    text_col: str,
    rules: Sequence[tuple[str, str]],
    joiner: str = "_",
) -> DataFrame:
    """BPE-style merge *application* (the encode step that pairs with
    :func:`pair_merge_rounds`' induction): apply a fixed, ordered list
    of merge rules to every document — one leftmost-greedy pass per
    rule, in priority order, matching the induction's per-round
    semantics exactly.

    A leftmost-greedy adjacent-pair merge IS a left fold: walk the
    tokens once, and when the accumulator's last element is ``w1`` and
    the next token is ``w2``, replace the last element with the merged
    token (a just-merged token never re-merges with the same rule —
    the fold's accumulator tail is the merged form, which no longer
    equals ``w1`` unless the rule is self-chaining, exactly the greedy
    run-parity rule). So encoding compiles to ONE narrow projection of
    chained higher-order ``aggregate`` calls: zero shuffles, zero
    joins, fully parallel per document — this is the 100 TB encode
    path (the induction's window/join chain is only needed when the
    rules are *unknown*). The oracle runs the induction-style
    positional rewrite with the rules as literals; the two agree
    because run-parity selection and the fold both realize
    leftmost-greedy.

    Output: ``(id, n_tokens, text_encoded)``."""
    def fold_rule(w1: str, w2: str):
        merged = f"{w1}{joiner}{w2}"

        def step(acc, x):
            return F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(w1))
                & (x == F.lit(w2)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1),
                    F.array(F.lit(merged)),
                ),
            ).otherwise(F.concat(acc, F.array(x)))

        return step

    col = tokens(text_col)
    for w1, w2 in rules:
        col = F.aggregate(col, F.array().cast("array<string>"), fold_rule(w1, w2))
    return df.select(
        F.col(id_col),
        F.size(col).alias("n_tokens"),
        F.array_join(col, " ").alias("text_encoded"),
    )


def apply_merges_sql(
    table_sql: str,
    id_col: str,
    text_col: str,
    rules: Sequence[tuple[str, str]],
    joiner: str = "_",
) -> str:
    """DuckDB oracle twin of :func:`apply_merges`: the rules applied
    as literal per-round positional rewrites (lead-window mark →
    run-parity select → rebuild), i.e. the induction machinery with
    the top-1 search replaced by the given rule."""

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    ctes = [
        f"""seq0 AS (
  SELECT {id_col} AS doc, g.i - 1 AS pos, t[g.i] AS token
  FROM (SELECT {id_col}, {tokens_sql(text_col)} AS t FROM ({table_sql})) s,
       LATERAL UNNEST(generate_series(1, len(t))) AS g(i)
)"""
    ]
    for r, (w1, w2) in enumerate(rules, start=1):
        p = r - 1
        ctes.append(
            f"""marked{r} AS (
  SELECT doc, pos, token,
         LEAD(token) OVER (PARTITION BY doc ORDER BY pos) AS nxt,
         (token = {q(w1)}
          AND LEAD(token) OVER (PARTITION BY doc ORDER BY pos) = {q(w2)}) AS m
  FROM seq{p}
),
runs{r} AS (
  SELECT doc, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc ORDER BY pos) AS grp
  FROM marked{r} WHERE m
),
sel{r} AS (
  SELECT doc, pos AS mpos FROM (
    SELECT doc, pos,
           ROW_NUMBER() OVER (PARTITION BY doc, grp ORDER BY pos) AS rk
    FROM runs{r}
  ) WHERE rk % 2 = 1
),
seq{r} AS (
  SELECT doc,
         ROW_NUMBER() OVER (PARTITION BY doc ORDER BY pos) - 1 AS pos,
         token
  FROM (
    SELECT m.doc, m.pos,
           CASE WHEN s.mpos IS NOT NULL
                THEN m.token || '{joiner}' || m.nxt
                ELSE m.token END AS token
    FROM marked{r} m
    LEFT JOIN sel{r} s ON s.doc = m.doc AND s.mpos = m.pos
    WHERE NOT EXISTS (
      SELECT 1 FROM sel{r} s2 WHERE s2.doc = m.doc AND s2.mpos = m.pos - 1
    )
  )
)"""
        )
    last = len(rules)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT doc AS {id_col},
       CAST(COUNT(*) AS INTEGER) AS n_tokens,
       string_agg(token, ' ' ORDER BY pos) AS text_encoded
FROM seq{last} GROUP BY doc"""
    )


def dsir_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred,
    n_buckets: int = 256,
) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023:
    hashed-n-gram importance resampling): score every document by how
    target-like its token distribution is, using hashed unigram
    buckets — the modern way to up-select domain-relevant data from a
    web-scale corpus before training.

    Per bucket b: importance ratio
    ``r(b) = ((tc_b+1)·(S+n)) / ((sc_b+1)·(T+n))`` (add-one smoothed
    target vs source frequencies — integer products, one IEEE
    division, engine-exact). A document's weight is the decimal-exact
    MEAN of its tokens' bucket ratios — the deterministic arithmetic
    variant of DSIR's sum-of-log-ratios (logs aren't bit-portable
    across engines; the ranking is what matters and both orderings
    agree for near-uniform docs).

    Scale shape: bucket tables are ``n_buckets`` rows (broadcast);
    the only big relations are the token explode and one per-doc
    aggregate — no shuffle keyed on anything wider than the doc id.

    Output: ``(id, n_tokens, weight)``."""
    # r12: the tokenize+explode+md5 relation feeds the bucket census
    # AND the final per-doc join — materialize it once; the 256-row
    # bucket table likewise feeds the totals and the ratio projection
    # (guide §3.3 — three corpus passes become one).
    toks = rebalance_for_fanout(df, multiplier=64.0).select(
        F.col(id_col).alias("__id"),
        target_pred.alias("__is_target"),
        F.explode(tokens(text_col)).alias("tok"),
    ).withColumn(
        "bucket",
        F.expr(
            f"cast(conv(substring(md5(tok), 25, 8), 16, 10) as bigint) % {n_buckets}"
        ),
    ).localCheckpoint(eager=False)
    per_bucket = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("sc"),
        F.sum(F.col("__is_target").cast("long")).alias("tc"),
    ).localCheckpoint(eager=False)
    totals = per_bucket.groupBy().agg(
        F.sum("sc").alias("S"), F.sum("tc").alias("T")
    )
    ratios = per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            ((F.col("tc") + 1) * (F.col("S") + n_buckets)).cast("double")
            / ((F.col("sc") + 1) * (F.col("T") + n_buckets)).cast("double")
        ).alias("r"),
    )
    from gis_city_county_spark.functions.numeric import dec_avg

    return (
        toks.join(F.broadcast(ratios), "bucket")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            dec_avg(F.col("r"), "weight"),
        )
        .withColumnRenamed("__id", id_col)
    )


def dsir_weights_sql(
    table_sql: str,
    id_col: str,
    text_col: str,
    target_pred_sql: str,
    n_buckets: int = 256,
) -> str:
    """DuckDB oracle twin of :func:`dsir_weights`."""
    from gis_city_county_spark.functions.numeric import dec_avg_sql

    return f"""
WITH toks AS (
  SELECT id, is_target,
         ('0x' || substr(md5(t.tok), 25, 8))::BIGINT % {n_buckets} AS bucket
  FROM (SELECT {id_col} AS id, ({target_pred_sql}) AS is_target,
               {tokens_sql(text_col)} AS tl FROM ({table_sql})) s,
       LATERAL UNNEST(s.tl) AS t(tok)
),
per_bucket AS (
  SELECT bucket, COUNT(*) AS sc,
         SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS tc
  FROM toks GROUP BY bucket
),
totals AS (SELECT SUM(sc) AS S, SUM(tc) AS T FROM per_bucket),
ratios AS (
  SELECT bucket,
         CAST((tc + 1) * (S + {n_buckets}) AS DOUBLE)
         / CAST((sc + 1) * (T + {n_buckets}) AS DOUBLE) AS r
  FROM per_bucket CROSS JOIN totals
)
SELECT id AS {id_col}, COUNT(*) AS n_tokens,
       {dec_avg_sql("r", "weight")}
FROM toks JOIN ratios USING (bucket)
GROUP BY id
"""


def span_corruption(
    df: DataFrame,
    id_col: str,
    text_col: str,
    mask_rate_denom: int = 5,
) -> DataFrame:
    """T5-style denoising-objective preparation: deterministically
    mask ~1/``mask_rate_denom`` of each document's tokens and emit the
    (inputs, targets) pair — inputs with each masked token replaced by
    a numbered sentinel, targets as the sentinel-prefixed masked
    tokens. The pretraining-data transform that turns a cleaned corpus
    into seq2seq examples.

    Mask selection is hash-keyed (md5 of doc id × position), so it is
    reproducible across runs/engines/partitionings — the property that
    keeps a resumed or re-sharded preprocessing job from changing the
    training examples. Sentinel numbering is the rank of the masked
    position within the document (a windowless per-doc cumulative via
    array operations — everything stays in one projection per doc).

    Output: ``(id, n_tokens, n_masked, inputs, targets)``."""
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(tokens(text_col)).alias("pos", "tok"),
    )
    masked = toks.withColumn(
        "__m",
        F.expr(
            f"cast(conv(substring(md5(concat(cast(__id as string), ':', "
            f"cast(pos as string))), 25, 8), 16, 10) as bigint) % {mask_rate_denom} = 0"
        ),
    )
    w = Window.partitionBy("__id").orderBy("pos")
    numbered = masked.withColumn(
        "__sid",
        F.sum(F.col("__m").cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    sid_s = F.col("__sid").cast("string")
    numbered = numbered.withColumn(
        "piece_in",
        F.when(
            F.col("__m"), F.concat(F.lit("<extra_id_"), sid_s, F.lit(">"))
        ).otherwise(F.col("tok")),
    ).withColumn(
        "piece_tgt",
        F.when(
            F.col("__m"),
            F.concat(F.lit("<extra_id_"), sid_s, F.lit("> "), F.col("tok")),
        ),
    )
    return (
        numbered.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("__m").cast("long")).alias("n_masked"),
            F.concat_ws(
                " ",
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, piece_in))),"
                    " p -> p.piece_in)"
                ),
            ).alias("inputs"),
            F.concat_ws(
                " ",
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, piece_tgt))),"
                    " p -> p.piece_tgt)"
                ),
            ).alias("targets"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            "n_masked",
            "inputs",
            "targets",
        )
    )


def span_corruption_sql(
    table_sql: str, id_col: str, text_col: str, mask_rate_denom: int = 5
) -> str:
    """DuckDB oracle twin of :func:`span_corruption`."""
    return f"""
WITH toks AS (
  SELECT id, g.i - 1 AS pos, tl[g.i] AS tok
  FROM (SELECT {id_col} AS id, {tokens_sql(text_col)} AS tl FROM ({table_sql})) s,
       LATERAL UNNEST(generate_series(1, len(tl))) AS g(i)
),
masked AS (
  SELECT id, pos, tok,
         ('0x' || substr(md5(CAST(id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)),
                         25, 8))::BIGINT % {mask_rate_denom} = 0 AS m
  FROM toks
),
numbered AS (
  SELECT id, pos, tok, m,
         SUM(CASE WHEN m THEN 1 ELSE 0 END) OVER (PARTITION BY id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM masked
)
SELECT id AS {id_col},
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
       string_agg(CASE WHEN m THEN '<extra_id_' || CAST(sid AS VARCHAR) || '>'
                       ELSE tok END, ' ' ORDER BY pos) AS inputs,
       COALESCE(string_agg(
           CASE WHEN m THEN '<extra_id_' || CAST(sid AS VARCHAR) || '> ' || tok END,
           ' ' ORDER BY pos), '') AS targets
FROM numbered GROUP BY id
"""


# ------------------------------------------------- n-gram precision eval

def ngram_precision_eval(
    df: DataFrame,
    id_col: str,
    cand_col: str,
    ref_col: str,
    max_n: int = 4,
) -> DataFrame:
    """BLEU-style modified n-gram precision per (candidate, reference)
    pair — the eval-harness metric a training-data pipeline runs to
    measure overlap between generated/derived text and its source (and
    the exact machinery eval-set decontamination audits reuse).

    For each n ≤ ``max_n``: clipped matches = Σ over candidate n-grams
    of min(count_cand, count_ref); total = candidate n-gram count.
    All-integer counts (engine-exact); the precision ships as
    ``precision_ppm = clipped·10⁶ div total`` per the integral-score
    convention. Long output, one row per (id, n):
    ``(id, n, cand_len, ref_len, clipped, total, precision_ppm)``.

    Plan shape (r12): ONE combined (n, gram) fan-out per side for all
    n ≤ ``max_n`` — the old per-n loop ran two explode→count
    aggregates, a join and a reduce FOUR times each, re-tokenizing the
    corpus eight times; folding n into the shuffle key gives the same
    rows from two aggregates, one (id, n, gram) equi-join and one
    reduce.  Shuffle keys stay (id, n, gram), so the fanout collapses
    before any wide exchange and the plan survives corpus-scale
    inputs."""
    base = df.select(
        F.col(id_col),
        tokens(cand_col).alias("__ct"),
        tokens(ref_col).alias("__rt"),
    )

    def all_grams(col: str, outer: bool) -> Column:
        # one struct (n, gram) per n-gram per n; a candidate side too
        # short for some n still emits ONE null-gram struct for that n
        # (the explode_outer row the per-n loop produced), so every
        # (id, n) keeps its zero-count output row.
        empty = (
            f"array(named_struct('n', n, 'gram', CAST(NULL AS STRING)))"
            if outer
            else "array()"
        )
        return F.expr(
            f"flatten(transform(sequence(1, {max_n}), n -> "
            f"CASE WHEN size({col}) >= n THEN "
            f"transform(sequence(1, size({col}) - n + 1),"
            f" i -> named_struct('n', n, 'gram',"
            f" concat_ws(' ', slice({col}, i, n)))) "
            f"ELSE {empty} END))"
        )

    c = (
        base.select(
            id_col,
            F.size("__ct").alias("cand_len"),
            F.size("__rt").alias("ref_len"),
            F.explode(all_grams("__ct", outer=True)).alias("__g"),
        )
        .select(
            id_col, "cand_len", "ref_len",
            F.col("__g.n").alias("n"), F.col("__g.gram").alias("gram"),
        )
        .groupBy(id_col, "cand_len", "ref_len", "n", "gram")
        .agg(F.count(F.when(F.col("gram").isNotNull(), 1)).alias("__c"))
    )
    r = (
        base.select(
            id_col, F.explode(all_grams("__rt", outer=False)).alias("__g")
        )
        .select(
            id_col,
            F.col("__g.n").alias("n"), F.col("__g.gram").alias("gram"),
        )
        .groupBy(id_col, "n", "gram")
        .agg(F.count(F.lit(1)).alias("__r"))
    )
    agg = (
        c.join(r, [id_col, "n", "gram"], "left")
        .groupBy(id_col, "cand_len", "ref_len", "n")
        .agg(
            F.sum(
                F.when(
                    F.col("gram").isNotNull(),
                    F.least(F.col("__c"), F.coalesce(F.col("__r"), F.lit(0))),
                ).otherwise(0)
            ).alias("clipped"),
            F.sum(
                F.when(F.col("gram").isNotNull(), F.col("__c")).otherwise(0)
            ).alias("total"),
        )
    )
    return agg.select(
        F.col(id_col),
        F.col("n").cast("int").alias("n"),
        F.col("cand_len").cast("long").alias("cand_len"),
        F.col("ref_len").cast("long").alias("ref_len"),
        F.col("clipped").cast("long").alias("clipped"),
        F.col("total").cast("long").alias("total"),
        F.when(
            F.col("total") > 0,
            F.expr("clipped * 1000000 div total"),
        ).alias("precision_ppm"),
    )


def ngram_precision_eval_sql(
    source_sql: str,
    id_col: str,
    cand_expr: str,
    ref_expr: str,
    max_n: int = 4,
) -> str:
    """DuckDB oracle twin of :func:`ngram_precision_eval`."""
    parts = []
    for n in range(1, max_n + 1):
        gram = " || ' ' || ".join(f"tl[i + {j}]" for j in range(n))
        parts.append(f"""
SELECT id AS {id_col}, {n} AS n, cand_len, ref_len,
       CAST(COALESCE(SUM(LEAST(c, r)), 0) AS BIGINT) AS clipped,
       CAST(COALESCE(SUM(c), 0) AS BIGINT) AS total,
       CASE WHEN COALESCE(SUM(c), 0) > 0
            THEN CAST(COALESCE(SUM(LEAST(c, r)), 0) AS BIGINT) * 1000000
                 // CAST(SUM(c) AS BIGINT) END AS precision_ppm
FROM (
  SELECT b.id, b.cand_len, b.ref_len, cg.gram, cg.c,
         COALESCE(rg.r, 0) AS r
  FROM base{n} b
  LEFT JOIN (
    SELECT id, {gram.replace('tl[', 'ctl[')} AS gram, COUNT(*) AS c
    FROM (SELECT id, ctl FROM toks) t,
         LATERAL UNNEST(generate_series(1, len(ctl) - {n - 1})) g(i)
    GROUP BY 1, 2
  ) cg ON b.id = cg.id
  LEFT JOIN (
    SELECT id, {gram.replace('tl[', 'rtl[')} AS gram, COUNT(*) AS r
    FROM (SELECT id, rtl FROM toks) t,
         LATERAL UNNEST(generate_series(1, len(rtl) - {n - 1})) g(i)
    GROUP BY 1, 2
  ) rg ON cg.id = rg.id AND cg.gram = rg.gram
) j
GROUP BY 1, 2, 3, 4""")
        parts[-1] = parts[-1].replace(f"base{n}", "base")
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH src AS (SELECT {id_col} AS id, {cand_expr} AS cand, {ref_expr} AS ref
             FROM ({source_sql})),
toks AS (
  SELECT id, {tokens_sql('cand')} AS ctl, {tokens_sql('ref')} AS rtl FROM src
),
base AS (
  SELECT id, len(ctl) AS cand_len, len(rtl) AS ref_len FROM toks
)
{union}
"""


# ------------------------------------------------------ vocab coverage


def vocab_coverage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    ppm: int = 1000,
) -> DataFrame:
    """Tokenizer-vocabulary coverage per ``group_col``: the vocabulary
    is every token whose corpus occurrence share is at least
    ``ppm``/1e6 (the integer test ``cnt * 1_000_000 >= ppm * total``
    — exact, scale-invariant, no global sort and no magic absolute
    count), and each group reports how much of its token mass that
    vocabulary covers plus how many of its documents are fully
    in-vocabulary.  This is the "will a fixed tokenizer OOV-blow-up
    on this feed" check run before committing a vocab.

    Scale: the corpus is tokenized ONCE into a per-(doc, token)
    occurrence aggregate (map-side combinable explode→count) that is
    materialized and feeds every later pass — the global token counts,
    the vocabulary filter, and the membership join all read it, so no
    subtree re-runs the corpus-wide tokenize.  The vocabulary is by
    construction ≤ 1e6/``ppm`` entries so the membership join
    broadcasts, and it joins the DEDUPED doc-token pairs rather than
    raw occurrences.  Ratios are single IEEE divisions of exact
    BIGINTs — bit-identical on any engine.
    """
    doc_tok = (
        rebalance_for_fanout(df, multiplier=16.0)
        .select(
            F.col(id_col).alias("__id"),
            F.col(group_col).alias("__grp"),
            F.explode(tokens(text_col)).alias("tok"),
        )
        .groupBy("__grp", "__id", "tok")
        .agg(F.count(F.lit(1)).alias("__c"))
        # one materialization shields every downstream pass (counts,
        # vocab, membership join) from re-running the tokenize; its
        # size is distinct doc-token pairs, far below raw occurrences.
        .localCheckpoint(eager=False)
    )
    counts = doc_tok.groupBy("tok").agg(F.sum("__c").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("__total"))
    vocab = (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(1_000_000) >= F.lit(ppm) * F.col("__total"))
        .select("tok")
    )
    flagged = doc_tok.join(
        F.broadcast(vocab.withColumn("__inv", F.lit(1))), "tok", "left"
    )
    per_doc = flagged.groupBy("__grp", "__id").agg(
        F.sum("__c").alias("n_occ"),
        F.sum(
            (F.col("__c") * F.coalesce(F.col("__inv"), F.lit(0))).cast("bigint")
        ).alias("n_cov"),
    )
    return (
        per_doc.groupBy("__grp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_occ").alias("total_occ"),
            F.sum("n_cov").alias("covered_occ"),
            F.sum((F.col("n_cov") == F.col("n_occ")).cast("bigint")).alias(
                "n_docs_fully_covered"
            ),
        )
        .withColumn(
            "coverage",
            F.col("covered_occ").cast("double") / F.col("total_occ").cast("double"),
        )
        .withColumnRenamed("__grp", group_col)
    )


def vocab_coverage_sql(
    table: str, id_col: str, text_col: str, group_col: str, ppm: int = 1000
) -> str:
    return f"""
WITH toks AS (
  SELECT {id_col} AS id, {group_col} AS grp, t.tok
  FROM (SELECT {id_col}, {group_col}, {tokens_sql(text_col)} AS tl FROM {table}) s,
       LATERAL UNNEST(s.tl) AS t(tok)
),
counts AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM counts),
vocab AS (
  SELECT tok FROM counts CROSS JOIN total
  WHERE cnt * 1000000 >= {ppm} * total
),
per_doc AS (
  SELECT t.grp, t.id,
         COUNT(*) AS n_occ,
         CAST(SUM(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cov
  FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
  GROUP BY t.grp, t.id
)
SELECT grp AS {group_col},
       COUNT(*) AS n_docs,
       CAST(SUM(n_occ) AS BIGINT) AS total_occ,
       CAST(SUM(n_cov) AS BIGINT) AS covered_occ,
       CAST(SUM(CASE WHEN n_cov = n_occ THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_fully_covered,
       CAST(CAST(SUM(n_cov) AS BIGINT) AS DOUBLE)
         / CAST(CAST(SUM(n_occ) AS BIGINT) AS DOUBLE) AS coverage
FROM per_doc
GROUP BY grp
"""


# ------------------------------------------------- temperature mixture


def temperature_mixture(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    alpha: float = 0.5,
    budget: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled mixture weights (the multilingual-corpus
    rebalancing rule from mT5/XLM-R): a group with raw share ``p_g``
    samples with probability ∝ ``p_g**alpha`` — ``alpha < 1`` flattens
    the mix so head languages stop drowning the tail.

    Engine-exact without libm pow: ``alpha`` must be a dyadic rational
    in {0.25, 0.5, 0.75}, implemented as compositions of ``sqrt`` and
    one multiply — every step is a correctly-rounded IEEE op on
    identical operands, so any engine reproduces it bit-for-bit.  The
    normalizer folds the (≤ |groups|) raw weights in canonical sorted
    order, the same pattern as the k-means mean.

    Scale: one map-combinable aggregate to |groups| rows, one 1-row
    broadcast total, a |groups|-row sorted fold — the corpus itself is
    never reshuffled.

    Returns (group, weight_total, p_raw, w_alpha, w_norm,
    expected_budget) — ``expected_budget`` = ``w_norm * budget``
    documents/tokens to draw from the group.

    Degenerate input: if the corpus-wide ``weight_total`` sum is 0
    (all weights floor to zero) the mixture is undefined and every
    derived column comes back NULL — identically on both engines
    (Spark and DuckDB both NULL a zero-divisor division, and the
    NULL ``w_alpha`` propagates through the normalizer fold).
    """
    powers = {0.5: "s1", 0.25: "s2", 0.75: "s1 * s2"}
    if alpha not in powers:
        raise ValueError(
            f"alpha must be one of {sorted(powers)} (dyadic rationals "
            f"compute via sqrt chains, bit-portable); got {alpha}"
        )
    # floor, not a bare bigint cast: Spark's cast truncates but
    # DuckDB's rounds half-even, so fractional weights would diverge
    stats = df.groupBy(group_col).agg(
        F.sum(F.floor(F.col(weight_col)).cast("bigint")).alias("weight_total")
    )
    total = stats.agg(F.sum("weight_total").alias("__total"))
    scored = (
        stats.crossJoin(F.broadcast(total))
        .withColumn(
            "p_raw", F.col("weight_total").cast("double") / F.col("__total").cast("double")
        )
        .withColumn("s1", F.sqrt("p_raw"))
        .withColumn("s2", F.sqrt("s1"))
        .withColumn("w_alpha", F.expr(powers[alpha]))
    )
    z = scored.agg(
        F.aggregate(
            F.array_sort(F.collect_list("w_alpha")), F.lit(0.0), lambda a, x: a + x
        ).alias("__z")
    )
    return (
        scored.crossJoin(F.broadcast(z))
        .withColumn("w_norm", F.col("w_alpha") / F.col("__z"))
        .select(
            group_col,
            "weight_total",
            "p_raw",
            "w_alpha",
            "w_norm",
            (F.col("w_norm") * F.lit(float(budget))).alias("expected_budget"),
        )
    )


def temperature_mixture_sql(
    table: str,
    group_col: str,
    weight_col: str,
    alpha: float = 0.5,
    budget: int = 1_000_000,
) -> str:
    powers = {0.5: "s1", 0.25: "s2", 0.75: "s1 * s2"}
    return f"""
WITH stats AS (
  SELECT {group_col},
         CAST(SUM(CAST(FLOOR({weight_col}) AS BIGINT)) AS BIGINT) AS weight_total
  FROM {table} GROUP BY {group_col}
),
tot AS (SELECT CAST(SUM(weight_total) AS BIGINT) AS total FROM stats),
scored AS (
  SELECT {group_col}, weight_total,
         CAST(weight_total AS DOUBLE) / CAST(total AS DOUBLE) AS p_raw,
         sqrt(CAST(weight_total AS DOUBLE) / CAST(total AS DOUBLE)) AS s1,
         sqrt(sqrt(CAST(weight_total AS DOUBLE) / CAST(total AS DOUBLE))) AS s2
  FROM stats CROSS JOIN tot
),
z AS (
  SELECT list_reduce(list_sort(list({powers[alpha]})), (a, b) -> a + b) AS z
  FROM scored
)
SELECT {group_col}, weight_total, p_raw, {powers[alpha]} AS w_alpha,
       ({powers[alpha]}) / z AS w_norm,
       (({powers[alpha]}) / z) * {float(budget)!r} AS expected_budget
FROM scored CROSS JOIN z
"""


# ------------------------------------------------- bigram LM scoring


def bigram_lm_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Per-document corpus-LM fluency score — the perplexity-filter
    stage of a data pipeline (KenLM-style) made engine-exact: each
    bigram scores Laplace-smoothed ``P(w2|w1)`` in integer ppm,
    ``((c(w1,w2) + 1) · 1e6) div (c(w1,·) + V)``, and a document
    reports the exact ppm sum and its mean (ONE IEEE division).  No
    logarithms anywhere, so any engine reproduces it bit-for-bit;
    ranking by mean-ppm is order-equivalent to ranking by the
    geometric-mean-free additive score.

    Scale: bigram/prefix counts are map-combinable aggregates; the
    score join shuffles doc-bigram instances against the count tables
    (both keyed on the bigram / prefix).  At 100 TB you'd freeze the
    LM: write the count tables once, prune to the top-K bigrams, and
    broadcast — the scoring join's shape is unchanged, which is why
    the operator takes the corpus itself as its own LM here.

    Returns (id, n_bigrams, sum_ppm, mean_ppm) for docs with ≥ 1
    bigram.
    """
    base = rebalance_for_fanout(df, multiplier=16.0).select(
        F.col(id_col).alias("__id"), tokens(text_col).alias("__toks")
    )
    bg = base.filter(F.size("__toks") >= 2).select(
        "__id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(__toks) - 1),"
                " i -> struct(element_at(__toks, i) AS w1,"
                " concat_ws(' ', element_at(__toks, i),"
                " element_at(__toks, i + 1)) AS bg))"
            )
        ).alias("__p"),
    ).select(
        "__id", F.col("__p.w1").alias("__w1"), F.col("__p.bg").alias("__bg")
    ).localCheckpoint(eager=False)
    # ^ four consumers (c2, c1, vocab, the scoring join) would each
    # re-run the tokenize+explode subtree without the materialization
    c2 = bg.groupBy("__bg").agg(F.count(F.lit(1)).alias("__c2"))
    c1 = bg.groupBy("__w1").agg(F.count(F.lit(1)).alias("__c1"))
    vocab_n = bg.select(F.col("__w1").alias("__w")).distinct().agg(
        F.count(F.lit(1)).alias("__v")
    )
    scored = (
        bg.join(c2, "__bg")
        .join(c1, "__w1")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "__id",
            F.expr(
                "((__c2 + 1) * CAST(1000000 AS BIGINT)) div (__c1 + __v)"
            ).alias("__ppm"),
        )
    )
    return (
        scored.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__ppm").cast("bigint").alias("sum_ppm"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_bigrams",
            "sum_ppm",
            (
                F.col("sum_ppm").cast("double") / F.col("n_bigrams").cast("double")
            ).alias("mean_ppm"),
        )
    )


def bigram_lm_score_sql(table: str, id_col: str, text_col: str) -> str:
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {tokens_sql(text_col)} AS t FROM {table}
),
bg AS (
  SELECT id,
         list_extract(t, i) AS w1,
         list_extract(t, i) || ' ' || list_extract(t, i + 1) AS b
  FROM base, LATERAL UNNEST(generate_series(1, len(t) - 1)) AS g(i)
  WHERE len(t) >= 2
),
c2 AS (SELECT b, COUNT(*) AS c2 FROM bg GROUP BY b),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
v AS (SELECT COUNT(DISTINCT w1) AS v FROM bg),
scored AS (
  SELECT bg.id,
         ((c2.c2 + 1) * CAST(1000000 AS BIGINT)) // (c1.c1 + v.v) AS ppm
  FROM bg JOIN c2 ON bg.b = c2.b JOIN c1 ON bg.w1 = c1.w1 CROSS JOIN v
)
SELECT id AS {id_col},
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(ppm) AS BIGINT) AS sum_ppm,
       CAST(SUM(ppm) AS BIGINT)::DOUBLE / CAST(COUNT(*) AS BIGINT)::DOUBLE
         AS mean_ppm
FROM scored GROUP BY id
"""


# -------------------------------------------- repeated chunks (inter-doc)


def repeated_chunk_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 8,
    stride: int = 4,
) -> DataFrame:
    """Inter-document repeated-chunk audit — the corpus-wide
    "memorized boilerplate" detector (Lee et al., *Deduplicating
    Training Data Makes Language Models Better*: repeated ≥ k-token
    spans are the memorization vector): every document reports how
    much of it is built from chunks that also occur in OTHER
    documents.

    Chunks are ``chunk_tokens``-token windows at ``stride`` spacing
    (stride < k overlaps windows so a repeat crossing a boundary is
    still caught; stride=1 is exact substring coverage at k× the
    fanout — the knob is documented, not hidden).  A chunk is
    "repeated" when it appears in ≥ 2 DISTINCT documents.  All counts
    exact integers; the coverage ratio is integer ppm.

    Scale: the chunk explode fans out ~n_tokens/stride rows per doc;
    the cross-doc count is one map-combinable distinct aggregate keyed
    on the chunk hash (uniform md5 — never skewed); the doc join keys
    on the same hash.  No pairwise stage anywhere — cost is linear in
    corpus tokens, unlike suffix-array substring dedup.

    Returns (id, n_chunks, n_repeated, repeated_ppm) for docs with ≥ 1
    chunk.
    """
    base = rebalance_for_fanout(df, multiplier=16.0).select(
        F.col(id_col).alias("__id"), tokens(text_col).alias("__toks")
    )
    chunks = base.filter(F.size("__toks") >= chunk_tokens).select(
        "__id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(__toks) - {chunk_tokens - 1},"
                f" {stride}), i -> md5(concat_ws(' ',"
                f" slice(__toks, i, {chunk_tokens}))))"
            )
        ).alias("__ch"),
    ).localCheckpoint(eager=False)
    # ^ both the cross-doc count and the flag join read the chunk
    # explode; materialize it once
    cross = chunks.groupBy("__ch").agg(
        F.countDistinct("__id").alias("__ndocs")
    )
    flagged = chunks.join(cross, "__ch").select(
        "__id", (F.col("__ndocs") >= 2).cast("bigint").alias("__rep")
    )
    return (
        flagged.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("__rep").cast("bigint").alias("n_repeated"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_chunks",
            "n_repeated",
            F.expr(
                "(n_repeated * CAST(1000000 AS BIGINT)) div n_chunks"
            ).alias("repeated_ppm"),
        )
    )


def repeated_chunk_report_sql(
    table: str,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 8,
    stride: int = 4,
) -> str:
    parts = " || ' ' || ".join(
        f"list_extract(t, i + {j})" for j in range(chunk_tokens)
    )
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {tokens_sql(text_col)} AS t FROM {table}
),
chunks AS (
  SELECT id, md5({parts}) AS ch
  FROM base,
       LATERAL UNNEST(generate_series(1, len(t) - {chunk_tokens - 1}, {stride}))
         AS g(i)
  WHERE len(t) >= {chunk_tokens}
),
cross_doc AS (
  SELECT ch, COUNT(DISTINCT id) AS ndocs FROM chunks GROUP BY ch
)
SELECT c.id AS {id_col},
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CAST(x.ndocs >= 2 AS BIGINT)) AS BIGINT) AS n_repeated,
       CAST((CAST(SUM(CAST(x.ndocs >= 2 AS BIGINT)) AS BIGINT)
             * CAST(1000000 AS BIGINT)) // CAST(COUNT(*) AS BIGINT) AS BIGINT)
         AS repeated_ppm
FROM chunks c JOIN cross_doc x ON c.ch = x.ch
GROUP BY c.id
"""


# ----------------------------------------------------- dataset card


def dataset_card(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str,
    source_col: str,
) -> DataFrame:
    """The one-row dataset card a corpus build publishes alongside the
    data: volume (docs, chars, whitespace + BPE tokens), provenance
    breadth (languages, sources), exact-duplicate rate, and the
    quality-score distribution — every number exact or a fixed IEEE
    chain, so two builds of the same data publish byte-identical
    cards (the property that makes a card diffable across runs).

    Scale: ONE aggregate pass (map-combinable counts/sums +
    two-phase distinct counts); the quality mean rides as an exact
    integer milli-sum (floor(q·1000) per doc — floor is portable,
    a decimal cast of full-precision doubles is not).

    Returns one row: (n_docs, n_langs, n_sources, total_chars,
    total_words, total_subwords, n_distinct_fp, exact_dup_ppm,
    mean_quality_milli).
    """
    from gis_city_county_spark.operators.textstats import (
        bpe_token_count,
        fingerprint_md5,
        quality_score,
        token_count,
    )

    agg = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct(lang_col).cast("bigint").alias("n_langs"),
        F.countDistinct(source_col).cast("bigint").alias("n_sources"),
        F.sum(F.length(text_col)).cast("bigint").alias("total_chars"),
        F.sum(token_count(text_col)).cast("bigint").alias("total_words"),
        F.sum(bpe_token_count(text_col)).cast("bigint").alias("total_subwords"),
        F.countDistinct(fingerprint_md5(text_col)).cast("bigint").alias(
            "n_distinct_fp"
        ),
        F.sum(
            F.floor(quality_score(text_col) * F.lit(1000.0)).cast("bigint")
        ).cast("bigint").alias("__q_milli_sum"),
    )
    return agg.select(
        "n_docs",
        "n_langs",
        "n_sources",
        "total_chars",
        "total_words",
        "total_subwords",
        "n_distinct_fp",
        F.expr(
            "((n_docs - n_distinct_fp) * CAST(1000000 AS BIGINT)) div n_docs"
        ).alias("exact_dup_ppm"),
        (
            F.col("__q_milli_sum").cast("double") / F.col("n_docs").cast("double")
        ).alias("mean_quality_milli"),
    )


def dataset_card_sql(
    table: str, id_col: str, text_col: str, lang_col: str, source_col: str
) -> str:
    from gis_city_county_spark.operators.textstats import (
        bpe_token_count_sql,
        normalized_text_sql,
        quality_score_sql,
        tokens_sql,
    )

    fp = f"md5({normalized_text_sql(text_col)})"
    return f"""
WITH agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT {lang_col}) AS BIGINT) AS n_langs,
         CAST(COUNT(DISTINCT {source_col}) AS BIGINT) AS n_sources,
         CAST(SUM(length({text_col})) AS BIGINT) AS total_chars,
         CAST(SUM(len({tokens_sql(text_col)})) AS BIGINT) AS total_words,
         CAST(SUM({bpe_token_count_sql(text_col)}) AS BIGINT) AS total_subwords,
         CAST(COUNT(DISTINCT {fp}) AS BIGINT) AS n_distinct_fp,
         CAST(SUM(CAST(FLOOR(({quality_score_sql(text_col)}) * 1000.0)
                       AS BIGINT)) AS BIGINT) AS q_milli_sum
  FROM {table}
)
SELECT n_docs, n_langs, n_sources, total_chars, total_words,
       total_subwords, n_distinct_fp,
       CAST(((n_docs - n_distinct_fp) * CAST(1000000 AS BIGINT)) // n_docs
            AS BIGINT) AS exact_dup_ppm,
       CAST(q_milli_sum AS DOUBLE) / CAST(n_docs AS DOUBLE)
         AS mean_quality_milli
FROM agg
"""


def quality_rule_audit(
    df: DataFrame,
    group_col: str,
    text_col: str,
    min_words: int = 20,
    max_words: int = 1000,
) -> DataFrame:
    """Gopher/C4-style rule battery, audited per source: how many
    documents each quality rule would drop, and what survives them
    all — the per-rule accounting a filtering pipeline publishes so a
    threshold change can be debated with numbers (a composite score
    hides WHICH rule did the dropping).

    Rules (each an exact integer comparison — cross-engine portable,
    no ratios of doubles):

    * ``short``      — fewer than ``min_words`` whitespace words
    * ``long``       — more than ``max_words`` words
    * ``stopword``   — English stopword count × 100 < 3 × words
      (the <3 % stopword screen on the operator's tiny built-in set)
    * ``symbol``     — non-alphanumeric chars × 10 > total chars
    * ``digit``      — digit chars × 5 > total chars
    * ``repetitive`` — distinct tokens × 2 < tokens (over half the
      words are repeats)

    One scan, one map-combinable aggregate; every flag is computed
    from scan-side array/regex expressions, so the audit fuses into
    whole-stage codegen and shuffles only per-group counters.

    Returns (group, n_docs, n_short, n_long, n_low_stopword,
    n_symbol_heavy, n_digit_heavy, n_repetitive, n_clean, clean_ppm).
    """
    return quality_rule_counts(
        df, group_col, text_col, min_words, max_words
    ).select(
        group_col,
        *QUALITY_RULE_COUNTERS,
        F.expr(
            "(n_clean * CAST(1000000 AS BIGINT)) div n_docs"
        ).alias("clean_ppm"),
    )


# The map-combinable counter columns of the audit, in output order.
QUALITY_RULE_COUNTERS = (
    "n_docs",
    "n_short",
    "n_long",
    "n_low_stopword",
    "n_symbol_heavy",
    "n_digit_heavy",
    "n_repetitive",
    "n_clean",
)


def quality_rule_counts(
    df: DataFrame,
    group_col: str,
    text_col: str,
    min_words: int = 20,
    max_words: int = 1000,
) -> DataFrame:
    """The counter block of :func:`quality_rule_audit` WITHOUT the
    derived ``clean_ppm`` — every column an exact BIGINT sum, so
    per-batch counter rows fold into the whole-corpus audit by plain
    addition (integer sums are associative).  This is the shared
    build path of the batch audit and the streaming twin
    (``streaming.quality.streaming_quality_rule_audit``), the same
    split as ``hll_registers`` / ``countmin_cells``."""
    from gis_city_county_spark.operators.textstats import (
        punct_char_count,
        stopword_count,
    )

    toks = tokens(text_col)
    n_words = F.size(toks)
    n_types = F.size(F.array_distinct(toks))
    n_chars = F.length(F.col(text_col))
    n_digits = n_chars - F.length(
        F.regexp_replace(F.col(text_col), "[0-9]", "")
    )
    f_short = n_words < min_words
    f_long = n_words > max_words
    f_stop = stopword_count(text_col, "en") * 100 < n_words * 3
    f_symbol = punct_char_count(text_col) * 10 > n_chars
    f_digit = n_digits * 5 > n_chars
    f_rep = n_types * 2 < n_words

    def _n(flag, name):
        return F.sum(flag.cast("int")).cast("bigint").alias(name)

    clean = ~(f_short | f_long | f_stop | f_symbol | f_digit | f_rep)
    return (
        df.groupBy(F.col(group_col).alias("__g"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            _n(f_short, "n_short"),
            _n(f_long, "n_long"),
            _n(f_stop, "n_low_stopword"),
            _n(f_symbol, "n_symbol_heavy"),
            _n(f_digit, "n_digit_heavy"),
            _n(f_rep, "n_repetitive"),
            _n(clean, "n_clean"),
        )
        .select(F.col("__g").alias(group_col), *QUALITY_RULE_COUNTERS)
    )


def quality_rule_audit_sql(
    table: str,
    group_col: str,
    text_col: str,
    min_words: int = 20,
    max_words: int = 1000,
) -> str:
    from gis_city_county_spark.operators.textstats import stopword_count_sql

    toks = tokens_sql(text_col)
    n_words = f"len({toks})"
    n_types = f"len(list_distinct({toks}))"
    n_chars = f"length({text_col})"
    # char class mirrors the Spark side's [^a-zA-Z0-9\s]: Java \s is
    # [ \t\n\x0B\f\r], so \x0B and \f must be excluded here too or a
    # vertical-tab/form-feed char flips n_symbol_heavy across engines
    n_punct = (
        f"{n_chars} - length(regexp_replace({text_col},"
        " '[^a-zA-Z0-9 \\t\\n\\x0B\\f\\r]', '', 'g'))"
    )
    n_digits = (
        f"{n_chars} - length(regexp_replace({text_col}, '[0-9]', '', 'g'))"
    )
    flags = {
        "n_short": f"{n_words} < {min_words}",
        "n_long": f"{n_words} > {max_words}",
        "n_low_stopword": f"{stopword_count_sql(text_col, 'en')} * 100 < {n_words} * 3",
        "n_symbol_heavy": f"({n_punct}) * 10 > {n_chars}",
        "n_digit_heavy": f"({n_digits}) * 5 > {n_chars}",
        "n_repetitive": f"{n_types} * 2 < {n_words}",
    }
    cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS {name}"
        for name, cond in flags.items()
    )
    clean = " OR ".join(f"({c})" for c in flags.values())
    return f"""
WITH agg AS (
  SELECT {group_col} AS g,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         {cols},
         CAST(SUM(CASE WHEN NOT ({clean}) THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clean
  FROM {table} GROUP BY {group_col}
)
SELECT g AS {group_col}, n_docs, n_short, n_long, n_low_stopword,
       n_symbol_heavy, n_digit_heavy, n_repetitive, n_clean,
       CAST((n_clean * CAST(1000000 AS BIGINT)) // n_docs AS BIGINT)
         AS clean_ppm
FROM agg
"""


def vocab_overlap_pairs(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources: how much of each
    pair's token vocabulary is shared — the redundancy map a mixture
    designer reads before upweighting a source (two crawls of the
    same sites show near-identical vocabularies; a genuinely novel
    source doesn't).

    Relational shape: one explode to distinct (source, token) TYPES
    (shuffle ∝ vocabulary × sources, never token instances), then an
    aliased self-equi-join on the token with ``src_a < src_b`` — the
    per-token fan-out is bounded by sources², and with S sources the
    whole pair table is ≤ S(S−1)/2 rows.  This is the by-design
    bound: vocabulary overlap is a per-SOURCE statistic, so S is the
    mixture's source count (dozens to thousands), not the corpus.
    NULL sources are dropped (countDistinct convention).

    Returns (src_a, src_b, n_types_a, n_types_b, n_common,
    jaccard_ppm) with jaccard_ppm = |∩| · 10⁶ div |∪| exact.
    """
    st = (
        df.filter(F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("__s"),
            F.explode(F.array_distinct(tokens(text_col))).alias("__tok"),
        )
        .distinct()
    )
    sizes = st.groupBy("__s").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n_types")
    )
    a = st.select(F.col("__s").alias("src_a"), F.col("__tok").alias("__t"))
    b = st.select(F.col("__s").alias("src_b"), F.col("__tok").alias("__t"))
    inter = (
        a.join(b, "__t")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    return (
        inter.join(
            sizes.select(
                F.col("__s").alias("src_a"), F.col("__n_types").alias("n_types_a")
            ),
            "src_a",
        )
        .join(
            sizes.select(
                F.col("__s").alias("src_b"), F.col("__n_types").alias("n_types_b")
            ),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_types_a",
            "n_types_b",
            "n_common",
            F.expr(
                "(n_common * CAST(1000000 AS BIGINT))"
                " div (n_types_a + n_types_b - n_common)"
            ).alias("jaccard_ppm"),
        )
    )


def vocab_overlap_pairs_sql(table: str, group_col: str, text_col: str) -> str:
    toks = tokens_sql(text_col)
    return f"""
WITH st AS (
  SELECT DISTINCT {group_col} AS s, t.tok AS tok
  FROM (SELECT {group_col}, list_distinct({toks}) AS tl FROM {table}
        WHERE {group_col} IS NOT NULL) src,
       LATERAL UNNEST(src.tl) AS t(tok)
),
sizes AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n_types FROM st GROUP BY s),
inter AS (
  SELECT a.s AS src_a, b.s AS src_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM st a JOIN st b ON a.tok = b.tok AND a.s < b.s
  GROUP BY a.s, b.s
)
SELECT inter.src_a, inter.src_b,
       sa.n_types AS n_types_a, sb.n_types AS n_types_b, inter.n_common,
       CAST((inter.n_common * CAST(1000000 AS BIGINT))
            // (sa.n_types + sb.n_types - inter.n_common) AS BIGINT)
         AS jaccard_ppm
FROM inter
JOIN sizes sa ON sa.s = inter.src_a
JOIN sizes sb ON sb.s = inter.src_b
"""


def token_drift(
    df_a: DataFrame, df_b: DataFrame, text_col: str, k: int = 30
) -> DataFrame:
    """Token-distribution drift between two corpus snapshots (two feed
    drops, two time windows, pre/post a scraper change): each token's
    occurrence share in exact integer ppm per side, and the top-``k``
    movers by absolute share change — the content-shift monitor that
    catches "the new crawl is suddenly 40% boilerplate" before it
    trains.

    Scale: one tokenize + map-combinable count per side (shuffle ∝
    vocabulary, not occurrences), a vocabulary-sized full-outer join,
    and two 1-row total scalars broadcast onto it; the top-``k`` is a
    TakeOrdered over the vocabulary relation, no single-partition
    sort.  Shares are exact floor divisions (``div`` / ``//``), so
    both engines emit identical integers.

    Returns (tok, cnt_a, cnt_b, ppm_a, ppm_b, drift_ppm) for the top
    ``k`` tokens by |drift_ppm| (ties broken by token).
    """

    def _counts(df, name):
        return (
            df.select(F.explode(tokens(text_col)).alias("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).cast("bigint").alias(name))
        )

    ca = _counts(df_a, "cnt_a")
    cb = _counts(df_b, "cnt_b")
    joined = ca.join(cb, "tok", "full_outer").select(
        "tok",
        F.coalesce("cnt_a", F.lit(0)).cast("bigint").alias("cnt_a"),
        F.coalesce("cnt_b", F.lit(0)).cast("bigint").alias("cnt_b"),
    )
    tot_a = ca.agg(F.sum("cnt_a").cast("bigint").alias("total_a"))
    tot_b = cb.agg(F.sum("cnt_b").cast("bigint").alias("total_b"))
    scored = (
        joined.crossJoin(F.broadcast(tot_a))
        .crossJoin(F.broadcast(tot_b))
        .select(
            "tok",
            "cnt_a",
            "cnt_b",
            F.expr("(cnt_a * CAST(1000000 AS BIGINT)) div total_a").alias(
                "ppm_a"
            ),
            F.expr("(cnt_b * CAST(1000000 AS BIGINT)) div total_b").alias(
                "ppm_b"
            ),
        )
        .withColumn("drift_ppm", F.col("ppm_b") - F.col("ppm_a"))
    )
    return scored.orderBy(
        F.abs(F.col("drift_ppm")).desc(), F.asc("tok")
    ).limit(k)


def token_drift_sql(
    source_a: str, source_b: str, text_col: str, k: int = 30
) -> str:
    toks = tokens_sql(text_col)
    return f"""
WITH ta AS (
  SELECT unnest({toks}) AS tok FROM ({source_a})
),
tb AS (
  SELECT unnest({toks}) AS tok FROM ({source_b})
),
ca AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt_a FROM ta GROUP BY tok),
cb AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt_b FROM tb GROUP BY tok),
joined AS (
  SELECT COALESCE(ca.tok, cb.tok) AS tok,
         COALESCE(cnt_a, 0) AS cnt_a,
         COALESCE(cnt_b, 0) AS cnt_b
  FROM ca FULL JOIN cb ON ca.tok = cb.tok
),
tot AS (
  SELECT (SELECT CAST(SUM(cnt_a) AS BIGINT) FROM ca) AS total_a,
         (SELECT CAST(SUM(cnt_b) AS BIGINT) FROM cb) AS total_b
)
SELECT tok, cnt_a, cnt_b,
       CAST((cnt_a * CAST(1000000 AS BIGINT)) // total_a AS BIGINT) AS ppm_a,
       CAST((cnt_b * CAST(1000000 AS BIGINT)) // total_b AS BIGINT) AS ppm_b,
       CAST((cnt_b * CAST(1000000 AS BIGINT)) // total_b
            - (cnt_a * CAST(1000000 AS BIGINT)) // total_a AS BIGINT)
         AS drift_ppm
FROM joined CROSS JOIN tot
ORDER BY ABS((cnt_b * CAST(1000000 AS BIGINT)) // total_b
             - (cnt_a * CAST(1000000 AS BIGINT)) // total_a) DESC, tok ASC
LIMIT {k}
"""


def epoch_shuffle_plan(
    df: DataFrame,
    key_col: str,
    n_epochs: int = 4,
    n_shards: int = 16,
) -> DataFrame:
    """Multi-epoch reshuffle audit: the deterministic per-epoch shard
    assignment a training loader uses to re-permute the corpus every
    epoch WITHOUT materializing a permutation — shard(e, k) =
    md5("e:"‖k) mod S — plus the two numbers that prove the plan is
    sound before a run starts: every epoch's shards stay hash-balanced,
    and each epoch genuinely MOVES documents (``n_same_as_epoch0``
    near n_docs/S, the random-assignment collision rate, not near
    n_docs, which would mean the "shuffle" barely shuffles).

    Pure projections (one row per document × epoch, the epoch list a
    tiny array explode) into one map-combinable aggregate — shuffle ∝
    documents · epochs, output exactly n_epochs · n_shards rows.

    Returns (epoch, shard, n_docs, n_same_as_epoch0).
    """
    key = F.col(key_col).cast("string")
    shard0 = _h60(F.concat(F.lit("0:"), key)) % n_shards
    rows = df.select(
        key.alias("__k"), shard0.alias("__s0"),
        F.explode(
            F.array(*[F.lit(e) for e in range(n_epochs)])
        ).alias("epoch"),
    ).select(
        "epoch",
        (
            _h60(F.concat(F.col("epoch").cast("string"), F.lit(":"),
                          F.col("__k"))) % n_shards
        ).alias("shard"),
        "__s0",
    )
    return (
        rows.groupBy("epoch", "shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(
                F.when(F.col("shard") == F.col("__s0"), 1).otherwise(0)
            ).cast("bigint").alias("n_same_as_epoch0"),
        )
        .select(
            F.col("epoch").cast("bigint").alias("epoch"),
            F.col("shard").cast("bigint").alias("shard"),
            "n_docs",
            "n_same_as_epoch0",
        )
    )


def epoch_shuffle_plan_sql(
    source_sql: str,
    key_col: str,
    n_epochs: int = 4,
    n_shards: int = 16,
) -> str:
    h = _h60_sql(f"CAST(e.epoch AS VARCHAR) || ':' || k")
    h0 = _h60_sql(f"'0:' || k")
    return f"""
WITH src AS (
  SELECT CAST({key_col} AS VARCHAR) AS k FROM ({source_sql})
),
epochs AS (
  SELECT unnest(generate_series(0, {n_epochs - 1})) AS epoch
),
rows_ AS (
  SELECT e.epoch, {h} % {n_shards} AS shard, {h0} % {n_shards} AS s0
  FROM src, epochs e
)
SELECT CAST(epoch AS BIGINT) AS epoch, CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN shard = s0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_same_as_epoch0
FROM rows_ GROUP BY epoch, shard
"""


def simpson_diversity(
    df: DataFrame, group_col: str, text_col: str
) -> DataFrame:
    """Token-level Simpson concentration per group — the log-free
    vocabulary-diversity number: Σ c_t² / N² (the probability two
    random tokens coincide), reported in exact parts-per-billion plus
    its inverse, the "effective vocabulary size" (N² div Σ c_t², the
    count of equally-frequent types that would give the same
    concentration).  High concentration = template/boilerplate corpus;
    effective vocab collapsing while raw vocab holds is the classic
    crawl-rot signal.

    Exact end to end: token counts, one Σc² BIGINT per group, two
    integer divisions — no entropy logs (libm is not bit-portable).
    Shuffle ∝ vocabulary.

    Returns (group, n_tokens, n_vocab, simpson_ppb, effective_vocab).
    """
    counts = (
        rebalance_for_fanout(df, multiplier=64.0)
        .select(
            F.col(group_col).alias("__g"),
            F.explode(tokens(text_col)).alias("__t"),
        )
        .groupBy("__g", "__t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    return (
        counts.groupBy("__g")
        .agg(
            F.sum("__c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_vocab"),
            F.sum(F.expr("__c * __c")).cast("bigint").alias("__sq"),
        )
        .select(
            F.col("__g").alias(group_col),
            "n_tokens",
            "n_vocab",
            F.expr(
                "CASE WHEN n_tokens > 0 THEN"
                " (__sq * CAST(1000000000 AS BIGINT))"
                " div (n_tokens * n_tokens) END"
            ).cast("bigint").alias("simpson_ppb"),
            F.expr(
                "CASE WHEN __sq > 0 THEN"
                " (n_tokens * n_tokens) div __sq END"
            ).cast("bigint").alias("effective_vocab"),
        )
    )


def simpson_diversity_sql(table: str, group_col: str, text_col: str) -> str:
    return f"""
WITH toks AS (
  SELECT {group_col} AS g, unnest({tokens_sql(text_col)}) AS t
  FROM {table}
),
counts AS (
  SELECT g, t, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY g, t
),
agg AS (
  SELECT g, CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_vocab,
         CAST(SUM(c * c) AS BIGINT) AS sq
  FROM counts GROUP BY g
)
SELECT g AS {group_col}, n_tokens, n_vocab,
       CASE WHEN n_tokens > 0 THEN
         CAST((sq * CAST(1000000000 AS BIGINT)) // (n_tokens * n_tokens)
              AS BIGINT)
       END AS simpson_ppb,
       CASE WHEN sq > 0 THEN
         CAST((n_tokens * n_tokens) // sq AS BIGINT)
       END AS effective_vocab
FROM agg
"""


def token_burstiness(
    df: DataFrame, id_col: str, text_col: str, top_k: int = 30
) -> DataFrame:
    """Per-token burstiness (Fano factor) over documents — the
    dispersion statistic that separates topical words (bursty: absent
    from most docs, clumped in a few) from function words (evenly
    sprinkled), a standard corpus-analysis feature for keyword
    weighting and quality filtering (Church & Gale 1995).

    For each of the ``top_k`` most frequent tokens: treat each
    document as a trial, c_d = the token's count in doc d (0 for docs
    without it), and report Fano = Var(c)/Mean(c) over ALL docs in
    exact milli units: with N docs, s = Σc, ss = Σc²,
    fano_milli = 1000·(N·ss − s²) div (N·s).  Zero-count docs cost
    nothing: s and ss come from the token's posting rows only, N is
    one corpus-level count.  ≈1000 means Poisson-like scatter; ≫1000
    means bursty.

    Scale: explode → one (token,doc) aggregate → one per-token
    aggregate (both map-combinable, shuffle ∝ postings), then a
    global top-k (TakeOrdered, never a full sort).  Ties break by
    token text.  Returns (token, doc_freq, total_count, fano_milli).
    """
    from gis_city_county_spark.operators.textstats import tokens

    n_docs = df.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n")
    )
    posting = (
        df.select(
            F.col(id_col).alias("__d"),
            F.explode(tokens(text_col)).alias("token"),
        )
        .groupBy("token", "__d")
        .agg(F.count(F.lit(1)).cast("decimal(19,0)").alias("__c"))
    )
    per_token = posting.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("doc_freq"),
        F.sum("__c").cast("decimal(19,0)").alias("__s"),
        F.sum((F.col("__c") * F.col("__c")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").alias("__ss"),
    )
    return (
        per_token.join(F.broadcast(n_docs))
        .select(
            "token",
            "doc_freq",
            F.col("__s").cast("bigint").alias("total_count"),
            F.expr(
                "CAST((CAST(1000 AS DECIMAL(38,0))"
                " * (__n * __ss - CAST(__s * __s AS DECIMAL(38,0))))"
                " div (__n * __s) AS BIGINT)"
            ).alias("fano_milli"),
        )
        .orderBy(F.col("total_count").desc(), F.col("token").asc())
        .limit(top_k)
    )


def token_burstiness_sql(
    source_sql: str, id_col: str, text_col: str, top_k: int = 30
) -> str:
    from gis_city_county_spark.operators.textstats import tokens_sql

    return f"""
WITH docs AS (SELECT {id_col} AS d, {text_col} AS txt FROM ({source_sql})),
n AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n_docs FROM docs),
posting AS (
  SELECT token, d, CAST(COUNT(*) AS HUGEINT) AS c
  FROM (SELECT d, UNNEST({tokens_sql('txt')}) AS token FROM docs)
  GROUP BY token, d
),
per_token AS (
  SELECT token,
         CAST(COUNT(*) AS BIGINT) AS doc_freq,
         CAST(SUM(c) AS HUGEINT) AS s,
         CAST(SUM(c * c) AS HUGEINT) AS ss
  FROM posting GROUP BY token
)
SELECT token, doc_freq,
       CAST(s AS BIGINT) AS total_count,
       CAST((1000 * (n.n_docs * ss - s * s)) // (n.n_docs * s) AS BIGINT)
         AS fano_milli
FROM per_token, n
ORDER BY total_count DESC, token ASC
LIMIT {top_k}
"""


def split_balance_audit(
    df: DataFrame, key_col: str, label_col: str
) -> DataFrame:
    """Split-balance audit for the deterministic train/val/test
    assignment — "did the hash split skew any label": for every
    (split, label) cell, the label's share WITHIN the split vs its
    share in the whole corpus, in exact ppm, plus the signed delta.
    A big |delta| on a small split is the hash-collision-with-
    structure smell (e.g. keys correlated with the label) that breaks
    eval comparability — caught here before any model sees the data.

    Two map-combinable aggregates over the split-assigned frame (the
    corpus marginals fold from the cell counts — the input is never
    re-scanned); output ∝ splits × labels.

    Returns (split, label, n, split_share_ppm, corpus_share_ppm,
    delta_ppm).
    """
    cells = (
        split_assign(df, key_col)
        .groupBy("split", F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    split_tot = cells.groupBy("split").agg(
        F.sum("n").cast("bigint").alias("__split_n")
    )
    label_tot = cells.groupBy("label").agg(
        F.sum("n").cast("bigint").alias("__label_n")
    )
    grand = cells.agg(F.sum("n").cast("bigint").alias("__grand_n"))
    return (
        cells.join(split_tot, "split")
        .join(F.broadcast(label_tot), "label")
        .join(F.broadcast(grand))
        .select(
            "split",
            "label",
            "n",
            F.expr("CAST((1000000 * n) div __split_n AS BIGINT)")
            .alias("split_share_ppm"),
            F.expr("CAST((1000000 * __label_n) div __grand_n AS BIGINT)")
            .alias("corpus_share_ppm"),
            (
                F.expr("CAST((1000000 * n) div __split_n AS BIGINT)")
                - F.expr(
                    "CAST((1000000 * __label_n) div __grand_n AS BIGINT)"
                )
            ).cast("bigint").alias("delta_ppm"),
        )
    )


def split_balance_audit_sql(
    source_sql: str, key_col: str, label_col: str
) -> str:
    return f"""
WITH assigned AS (
  SELECT {split_case_sql(key_col)} AS split, {label_col} AS label
  FROM ({source_sql})
),
cells AS (
  SELECT split, label, CAST(COUNT(*) AS BIGINT) AS n
  FROM assigned GROUP BY 1, 2
),
st AS (SELECT split, CAST(SUM(n) AS BIGINT) AS split_n FROM cells GROUP BY 1),
lt AS (SELECT label, CAST(SUM(n) AS BIGINT) AS label_n FROM cells GROUP BY 1),
g AS (SELECT CAST(SUM(n) AS BIGINT) AS grand_n FROM cells)
SELECT c.split, c.label, c.n,
       CAST((1000000 * c.n) // st.split_n AS BIGINT) AS split_share_ppm,
       CAST((1000000 * lt.label_n) // g.grand_n AS BIGINT)
         AS corpus_share_ppm,
       CAST((1000000 * c.n) // st.split_n AS BIGINT)
         - CAST((1000000 * lt.label_n) // g.grand_n AS BIGINT) AS delta_ppm
FROM cells c
JOIN st ON c.split = st.split
JOIN lt ON c.label = lt.label
CROSS JOIN g
"""


def chao1_richness(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """Chao1 vocabulary-richness estimate per group — the
    species-richness lower bound (Chao, 1984) every corpus census
    wants: how many token TYPES does this source really have, given
    we only sampled N tokens?  The frequency-of-frequencies carries
    the answer: with ``f1`` singletons and ``f2`` doubletons,
    ``chao1 = vocab + f1·(f1−1) / (2·(f2+1))`` (the bias-corrected
    form, defined even when f2 = 0).  Good-Turing rides along for
    free: the unseen-probability mass is ``f1 / N``.

    Exact end to end in house style: BIGINT frequency-of-frequency
    counts, the Chao1 correction as one integer floor division
    (documented: the true estimate is within 1 of the floored value),
    unseen mass in exact ppm — no logs, no doubles.  Scale shape: one
    (group, token) count — map-combinable, shuffle ∝ vocabulary —
    then a per-group fold over the counts relation.

    Returns (group, n_tokens, vocab, f1_singletons, f2_doubletons,
    chao1_vocab, unseen_ppm).
    """
    counts = (
        rebalance_for_fanout(df, multiplier=64.0)
        .select(
            F.col(group_col).alias("__g"),
            F.explode(tokens(text_col)).alias("__t"),
        )
        .groupBy("__g", "__t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    return (
        counts.groupBy("__g")
        .agg(
            F.sum("__c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("vocab"),
            F.sum(F.expr("CASE WHEN __c = 1 THEN 1 ELSE 0 END"))
            .cast("bigint").alias("f1_singletons"),
            F.sum(F.expr("CASE WHEN __c = 2 THEN 1 ELSE 0 END"))
            .cast("bigint").alias("f2_doubletons"),
        )
        .select(
            F.col("__g").alias(group_col),
            "n_tokens",
            "vocab",
            "f1_singletons",
            "f2_doubletons",
            F.expr(
                "vocab + (f1_singletons * (f1_singletons - 1))"
                " div (2 * (f2_doubletons + 1))"
            ).cast("bigint").alias("chao1_vocab"),
            F.expr(
                "CASE WHEN n_tokens > 0 THEN"
                " (f1_singletons * CAST(1000000 AS BIGINT)) div n_tokens END"
            ).cast("bigint").alias("unseen_ppm"),
        )
    )


def chao1_richness_sql(table: str, group_col: str, text_col: str) -> str:
    return f"""
WITH toks AS (
  SELECT {group_col} AS g, unnest({tokens_sql(text_col)}) AS t
  FROM {table}
),
counts AS (
  SELECT g, t, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY g, t
),
agg AS (
  SELECT g, CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM counts GROUP BY g
)
SELECT g AS {group_col}, n_tokens, vocab,
       f1 AS f1_singletons, f2 AS f2_doubletons,
       CAST(vocab + (f1 * (f1 - 1)) // (2 * (f2 + 1)) AS BIGINT)
         AS chao1_vocab,
       CASE WHEN n_tokens > 0 THEN
         CAST((f1 * CAST(1000000 AS BIGINT)) // n_tokens AS BIGINT)
       END AS unseen_ppm
FROM agg
"""


def split_leakage_audit(
    df: DataFrame, key_col: str, group_col: str
) -> DataFrame:
    """Group-leakage audit over the deterministic train/val/test
    split — the check every eval pipeline owes itself: when
    correlated documents share a GROUP (same source crawl, same
    author, same near-dup cluster), a per-document split puts
    siblings on both sides of the train/eval fence and the eval
    overstates generalization.  One row per leaking group (present in
    ≥ 2 splits) with its per-split counts and a sorted split list.

    Scale shape: :func:`split_assign` is a pure projection; the audit
    is one (group, split) count aggregate, one per-group rollup, a
    HAVING filter — map-combinable end to end, output bounded by the
    leaking-group count.

    Returns (group, n_splits, n_docs, n_train, n_val, n_test, splits)
    ordered by n_docs desc (tie: group).
    """
    assigned = split_assign(df, key_col)
    cells = (
        assigned.groupBy(
            F.col(group_col).alias("__g"), F.col("split").alias("__s")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    )
    return (
        cells.groupBy("__g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_splits"),
            F.sum("__n").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("__s") == "train", F.col("__n"))
                  .otherwise(0)).cast("bigint").alias("n_train"),
            F.sum(F.when(F.col("__s") == "val", F.col("__n"))
                  .otherwise(0)).cast("bigint").alias("n_val"),
            F.sum(F.when(F.col("__s") == "test", F.col("__n"))
                  .otherwise(0)).cast("bigint").alias("n_test"),
            F.array_join(F.array_sort(F.collect_list("__s")), ",")
            .alias("splits"),
        )
        .filter(F.col("n_splits") >= 2)
        .select(
            F.col("__g").alias(group_col),
            "n_splits", "n_docs", "n_train", "n_val", "n_test", "splits",
        )
        .orderBy(F.col("n_docs").desc(), F.col(group_col).asc())
    )


def split_leakage_audit_sql(table: str, key_col: str, group_col: str) -> str:
    return f"""
WITH cells AS (
  SELECT {group_col} AS g, {split_case_sql(key_col)} AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM {table} GROUP BY 1, 2
),
rolled AS (
  SELECT g,
         CAST(COUNT(*) AS BIGINT) AS n_splits,
         CAST(SUM(n) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN s = 'train' THEN n ELSE 0 END) AS BIGINT)
           AS n_train,
         CAST(SUM(CASE WHEN s = 'val' THEN n ELSE 0 END) AS BIGINT)
           AS n_val,
         CAST(SUM(CASE WHEN s = 'test' THEN n ELSE 0 END) AS BIGINT)
           AS n_test,
         list_aggregate(list_sort(list(s)), 'string_agg', ',') AS splits
  FROM cells GROUP BY 1
)
SELECT g AS {group_col}, n_splits, n_docs, n_train, n_val, n_test, splits
FROM rolled
WHERE n_splits >= 2
ORDER BY n_docs DESC, {group_col} ASC
"""


def heaps_curve(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: distinct token types seen
    by each power-of-two token-count checkpoint when the corpus is
    read in ``id_col`` order — the sub-linear V(N) curve whose shape
    (and whose flattening) tells you whether more data still buys
    vocabulary, without fitting Heaps' K·N^β (no logs, house style).

    Exactness + scale shape: every token occurrence gets a GLOBAL
    position = its document's exclusive token-count prefix (the
    two-phase ``ranged_cumsum`` over the doc frame — no
    single-partition window over docs) + its in-document index; a
    type's first occurrence is one min-aggregate; the curve is one
    count per checkpoint over the first-occurrence relation joined to
    the ≤ log₂(N)-row checkpoint frame.  All integers exact.

    Returns (checkpoint, vocab_seen) ordered by checkpoint — the
    final row's checkpoint is the exact corpus token total.
    """
    from gis_city_county_spark.operators.scale import ranged_cumsum
    from gis_city_county_spark.operators.textstats import tokens

    docs = df.select(
        F.col(id_col).alias("__id"), tokens(text_col).alias("__toks")
    ).select("__id", "__toks", F.size("__toks").cast("bigint").alias("__cnt"))
    offs = ranged_cumsum(
        docs, "__id", "__id", "__cnt", cum_col="__cum",
        total_col="__total", descending=False,
    ).select(
        "__id", "__toks",
        (F.col("__cum") - F.col("__cnt")).alias("__off"), "__total",
    )
    first = (
        offs.select(
            "__total",
            F.posexplode("__toks").alias("__pos", "__tok"),
            F.col("__off"),
        )
        .select("__tok", (F.col("__off") + F.col("__pos") + 1).alias("__gpos"),
                "__total")
        .groupBy("__tok")
        .agg(F.min("__gpos").alias("__first"), F.max("__total").alias("__t"))
    ).localCheckpoint(eager=False)
    total = first.agg(F.max("__t").cast("bigint").alias("__total"))
    # Power-of-two checkpoints up to (and including, via the exact
    # total) the corpus size — a <= 63-row frame, built with integer
    # shifts (no log2/pow: libm is not bit-portable, house rule).
    cps = total.select(
        F.explode(
            F.expr(
                "array_union("
                " filter(transform(sequence(0, 62),"
                "                  p -> shiftleft(CAST(1 AS BIGINT), p)),"
                "        c -> c <= __total),"
                " array(__total))"
            )
        ).alias("checkpoint")
    )
    return (
        cps.join(first, F.col("__first") <= F.col("checkpoint"), "left")
        .groupBy("checkpoint")
        .agg(F.count("__tok").cast("bigint").alias("vocab_seen"))
        .orderBy("checkpoint")
    )


def heaps_curve_sql(table: str, id_col: str, text_col: str) -> str:
    return f"""
WITH docs AS (
  SELECT {id_col} AS id, {tokens_sql(text_col)} AS toks
  FROM {table}
),
offs AS (
  SELECT id, toks,
         SUM(len(toks)) OVER (ORDER BY id ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)
           - len(toks) AS off,
         SUM(len(toks)) OVER () AS total
  FROM docs
),
first AS MATERIALIZED (
  SELECT tok, MIN(off + pos) AS first, MAX(total) AS total
  FROM (
    SELECT off, total, unnest(toks) AS tok,
           unnest(generate_series(1, len(toks))) AS pos
    FROM offs
  )
  GROUP BY tok
),
tot AS (SELECT CAST(MAX(total) AS BIGINT) AS total FROM first),
cps AS (
  SELECT DISTINCT checkpoint FROM (
    SELECT CAST(CAST(1 AS BIGINT) << p AS BIGINT) AS checkpoint
    FROM tot, LATERAL UNNEST(generate_series(0, 62)) g(p)
    WHERE (CAST(1 AS BIGINT) << p) <= total
    UNION ALL
    SELECT total FROM tot
  )
)
SELECT checkpoint, CAST(COUNT(tok) AS BIGINT) AS vocab_seen
FROM cps LEFT JOIN first ON first <= checkpoint
GROUP BY checkpoint
ORDER BY checkpoint
"""


# tokenizer_fertility lived here for one session in round 11; it
# near-duplicated the round-5 ``textstats.tokenizer_fertility`` (same
# counters, same metric, same source table) and was consolidated into
# that operator in round 12 — the textstats variant now also emits the
# ``n_chars``/``chars_per_token_milli`` columns this one added.


def tv_distance(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """Total-variation distance between each source's unigram
    distribution and the REST of the corpus — the mixture-design
    number a data curator reads before weighting sources: TV ≈ 0
    means the source adds volume but no distributional novelty,
    TV → 1 means it's a different language/register entirely.
    Unlike KL/JS divergence this needs NO logarithms (the house
    statistics rule), and it's a proper metric:
    ``TV(g) = ½ Σ_t |p_g(t) − p_rest(t)|``.

    Exact over the common denominator: with per-group token count
    ``N_g``, corpus total ``N``, per-(group, token) count ``c`` and
    corpus-wide token count ``C``, each in-vocabulary term is
    ``|c·(N−N_g) − (C−c)·N_g|`` and the tokens a group has NEVER seen
    contribute ``N_g·(N − S_g)`` in one closed form (``S_g`` = the
    corpus-wide count mass of the group's own vocabulary) — so the
    relation never has to materialize (group × full-vocab) zero
    cells.  Every product routes through DECIMAL(38,0)/HUGEINT
    (c·N overflows int64 near 10⁹·10¹⁰), and the ppm result is one
    floor division of non-negative exact integers.

    Scale shape: one (group, token) count (map-combinable, shuffle
    ∝ vocabulary — the chao1 discipline), a token-total equi-join on
    the token key, a broadcastable per-group total join, and one
    1-row corpus-total merge.

    Returns (group, n_tokens, vocab, tv_ppm) ordered by group —
    tv_ppm NULL for a single-group corpus (no "rest" to compare to).
    """
    counts = (
        rebalance_for_fanout(df, multiplier=64.0)
        .select(
            F.col(group_col).alias("__g"),
            F.explode(tokens(text_col)).alias("__t"),
        )
        .groupBy("__g", "__t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
        .localCheckpoint(eager=False)
    )
    tok_tot = counts.groupBy("__t").agg(
        F.sum("__c").cast("bigint").alias("__ct")
    )
    gtot = counts.groupBy("__g").agg(
        F.sum("__c").cast("bigint").alias("__ng")
    )
    n = gtot.agg(F.sum("__ng").cast("bigint").alias("__n"))
    joined = (
        counts.join(tok_tot, "__t")
        .join(gtot, "__g")
        .crossJoin(F.broadcast(n))  # 1-row corpus-total merge
    )
    per_g = joined.groupBy("__g").agg(
        F.max("__ng").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.max("__n").cast("bigint").alias("__ntot"),
        F.sum("__ct").cast("decimal(38,0)").alias("__sg"),
        F.sum(
            F.abs(
                F.col("__c").cast("decimal(18,0)")
                * (F.col("__n") - F.col("__ng")).cast("decimal(18,0)")
                - (F.col("__ct") - F.col("__c")).cast("decimal(18,0)")
                * F.col("__ng").cast("decimal(18,0)")
            )
        ).cast("decimal(38,0)").alias("__num_in"),
    )
    return per_g.select(
        F.col("__g").alias(group_col),
        "n_tokens",
        "vocab",
        F.expr(
            "CASE WHEN n_tokens > 0 AND __ntot > n_tokens THEN"
            " CAST((CAST(1000000 AS DECIMAL(7,0))"
            " * (__num_in + CAST(n_tokens AS DECIMAL(18,0))"
            "    * (CAST(__ntot AS DECIMAL(18,0)) - __sg)))"
            " div (2 * CAST(n_tokens AS DECIMAL(18,0))"
            "      * CAST(__ntot - n_tokens AS DECIMAL(18,0)))"
            " AS BIGINT) END"
        ).alias("tv_ppm"),
    ).orderBy(group_col)


def tv_distance_sql(table: str, group_col: str, text_col: str) -> str:
    return f"""
WITH toks AS (
  SELECT {group_col} AS g, unnest({tokens_sql(text_col)}) AS t
  FROM {table}
),
counts AS MATERIALIZED (
  SELECT g, t, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY g, t
),
tok_tot AS (
  SELECT t, CAST(SUM(c) AS BIGINT) AS ct FROM counts GROUP BY t
),
gtot AS (
  SELECT g, CAST(SUM(c) AS BIGINT) AS ng FROM counts GROUP BY g
),
n AS (SELECT CAST(SUM(ng) AS BIGINT) AS ntot FROM gtot),
per_g AS (
  SELECT counts.g,
         CAST(MAX(ng) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         CAST(MAX(ntot) AS BIGINT) AS ntot,
         CAST(SUM(CAST(ct AS HUGEINT)) AS HUGEINT) AS sg,
         CAST(SUM(ABS(CAST(c AS HUGEINT) * (ntot - ng)
                      - CAST(ct - c AS HUGEINT) * ng)) AS HUGEINT)
           AS num_in
  FROM counts
  JOIN tok_tot ON counts.t = tok_tot.t
  JOIN gtot ON counts.g = gtot.g
  CROSS JOIN n
  GROUP BY counts.g
)
SELECT g AS {group_col}, n_tokens, vocab,
       CASE WHEN n_tokens > 0 AND ntot > n_tokens THEN
         CAST((CAST(1000000 AS HUGEINT)
               * (num_in + CAST(n_tokens AS HUGEINT)
                  * (CAST(ntot AS HUGEINT) - sg)))
              // (2 * CAST(n_tokens AS HUGEINT)
                  * CAST(ntot - n_tokens AS HUGEINT)) AS BIGINT) END
         AS tv_ppm
FROM per_g
ORDER BY g
"""
