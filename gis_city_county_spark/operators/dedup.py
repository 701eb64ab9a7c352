"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Greenfield scale operators (SURVEY.md §7 phase 7). All are expressed
relationally — explode/groupBy/join — so they distribute: no
driver-side state, no O(n²) all-pairs stage. The only pairwise work
happens *within LSH buckets*, which is the standard way MinHash dedup
scales to 100 TB corpora (shingle → signature → band → bucket join).

Hash function: md5 (identical across Spark, DuckDB, Python), with
min() taken over the hex strings — for fixed-length hex,
lexicographic order equals numeric order on the 128-bit value, so
this is a faithful MinHash while staying oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gis_city_county_spark.operators.scale import (
    checkpoint_eager,
    checkpoint_lazy,
    rebalance_for_fanout,
)
from gis_city_county_spark.operators.textstats import (
    fingerprint_md5,
    normalized_text_sql,
    tokens,
    tokens_sql,
)

# ------------------------------------------------------------------ exact

def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup on the normalized-text fingerprint: keep the lowest
    id per group. One shuffle on the fingerprint (a uniform md5 —
    never skewed). Returns all rows annotated with the group's keeper
    and size; filter ``is_keeper`` for the survivor set."""
    fp = fingerprint_md5(text_col)
    w = Window.partitionBy("fp")
    return (
        df.withColumn("fp", fp)
        .withColumn("keeper_id", F.min(id_col).over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(w))
        .withColumn("is_keeper", F.col(id_col) == F.col("keeper_id"))
        .select(id_col, "fp", "keeper_id", "group_size", "is_keeper")
    )


def exact_dedup_sql(table: str, id_col: str, text_col: str) -> str:
    fp = normalized_text_sql(text_col)
    return f"""
SELECT {id_col}, md5({fp}) AS fp,
       MIN({id_col}) OVER (PARTITION BY md5({fp})) AS keeper_id,
       COUNT(*) OVER (PARTITION BY md5({fp})) AS group_size,
       {id_col} = MIN({id_col}) OVER (PARTITION BY md5({fp})) AS is_keeper
FROM {table}
"""


# ------------------------------------------------------------------ shingles

def _tokens_and_shingle_expr(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> tuple[DataFrame, Column]:
    """Shared builder: (tokenized frame keyed ``__id``, the DISTINCT
    k-shingle array expression over its ``__toks`` column).

    Callers must compose the returned expression INLINE into their
    consuming operator (``explode(expr)``, ``expr.alias(...)`` as the
    final output) rather than aliasing it to an intermediate column
    that a later ``explode`` references: exploding a mere attribute
    lets ``InferFiltersFromGenerate`` add ``size(col) > 0 AND
    isnotnull(col)``, and predicate pushdown then substitutes the
    WHOLE interpreted transform/array_distinct expression into a
    Filter below the repartition — evaluated twice more per row inside
    the single-task scan stage (measured 10.7s vs 0.7s for the shingle
    explode at sf0.1; the round-12 shingle-family regression)."""
    with_toks = rebalance_for_fanout(df, multiplier=64.0).select(
        F.col(id_col).alias("__id"), tokens(text_col).alias("__toks")
    )
    sh = F.when(
        F.size("__toks") >= k,
        F.expr(
            f"transform(sequence(1, size(__toks) - {k - 1}),"
            f" i -> concat_ws(' ', slice(__toks, i, {k})))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return with_toks, F.array_distinct(sh)


def shingle_array_df(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Per-row DISTINCT k-word shingle sets as arrays: (id, __shs).

    The array form of :func:`shingle_df` (same expressions, no
    explode): operators that verify candidate pairs row-locally
    (``array_intersect`` instead of an exploded equi-join fan-out)
    consume this directly; :func:`shingle_df` explodes the expression
    inline instead (see :func:`_tokens_and_shingle_expr` for why it
    must not explode this frame's attribute)."""
    with_toks, shs = _tokens_and_shingle_expr(df, id_col, text_col, k)
    return with_toks.select(
        "__id", shs.alias("__shs")
    ).withColumnRenamed("__id", id_col)


def shingle_df(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    *,
    unique_id_rows: bool = False,
) -> DataFrame:
    """Distinct k-word shingles per document: (id, shingle).

    Built with array expressions (transform over sequence + slice), so
    shingling happens JVM-side during the scan; explode produces the
    long (id, shingle) relation that every downstream dedup op keys
    on.

    ``unique_id_rows=True`` asserts each id appears on exactly ONE
    input row (a per-document key): the distinct-shingle set is then
    row-local and the cross-row ``dropDuplicates`` shuffle is skipped
    entirely. Leave it False for grouping keys that span rows (e.g. a
    source column), where two documents of one id can repeat a
    shingle."""
    # Dedupe inside the shingle array BEFORE exploding: a map-side
    # partial distinct that shrinks the exploded relation either way
    # (guide SS2.3 — shuffle fewer bytes). When the caller guarantees
    # one row per id, that row-local distinct IS the per-id distinct
    # set and the dropDuplicates shuffle is removed outright (guide
    # SS2.4); otherwise ids spanning rows still need the cross-row
    # dedup (a source key repeating a shingle across documents).
    # The array expression is composed INLINE into explode — exploding
    # an aliased attribute instead re-evaluates the whole interpreted
    # expression 2 extra times per row inside the single-task scan
    # stage via InferFiltersFromGenerate + pushdown (the r12 shingle
    # regression; see _tokens_and_shingle_expr).
    with_toks, shs = _tokens_and_shingle_expr(df, id_col, text_col, k)
    out = with_toks.select(
        F.col("__id").alias(id_col), F.explode(shs).alias("shingle")
    )
    if not unique_id_rows:
        out = out.dropDuplicates([id_col, "shingle"])
    return out


def shingle_sql(table: str, id_col: str, text_col: str, k: int = 3) -> str:
    parts = " || ' ' || ".join(f"list_extract(t, i + {j})" for j in range(k))
    return f"""
SELECT DISTINCT {id_col}, {parts} AS shingle
FROM (SELECT {id_col}, {tokens_sql(text_col)} AS t FROM {table}) s,
     LATERAL UNNEST(generate_series(1, len(t) - {k - 1})) AS g(i)
"""


# ------------------------------------------------------------------ minhash

def minhash_signatures(
    shingles: DataFrame, id_col: str, num_hashes: int = 16
) -> DataFrame:
    """MinHash signature per id: ``num_hashes`` min-aggregates computed
    in ONE groupBy pass over the shingle relation (not an explode per
    hash — the map-side partial agg keeps shuffle volume at one row
    per id)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}|"), F.col("shingle")))).alias(f"mh{s}")
        for s in range(num_hashes)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_bands(
    signatures: DataFrame, id_col: str, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """Split the signature into ``bands`` and hash each band:
    (id, band_idx, band_hash). Documents sharing any band hash are
    candidate duplicates."""
    rows = num_hashes // bands
    band_cols = [
        F.md5(F.concat(*[F.col(f"mh{b * rows + r}") for r in range(rows)]))
        for b in range(bands)
    ]
    return signatures.select(
        F.col(id_col),
        F.posexplode(F.array(*band_cols)).alias("band_idx", "band_hash"),
    )


def lsh_candidate_pairs(
    bands_df: DataFrame, id_col: str, max_bucket: int | None = None
) -> DataFrame:
    """Self-join within (band_idx, band_hash) buckets → distinct
    candidate pairs (a < b) with the number of matching bands.

    Scale: the join key is the band hash, so the shuffle groups only
    same-bucket rows; hot buckets (boilerplate/constant text) are the
    classic skew case — a bucket of n rows emits n² join rows, so one
    pathological bucket can dominate the whole stage. AQE skew-join
    splitting handles moderate skew; for adversarial corpora pass
    ``max_bucket`` to drop buckets larger than it before the self-join
    (candidate generation stays bounded at ``max_bucket²`` per bucket;
    near-dups inside a dropped bucket can still pair via their other,
    less-common bands). Audit the dropped mass with
    :func:`lsh_skew_report` — the gate-style companion."""
    if max_bucket is not None:
        sizes = bands_df.groupBy("band_idx", "band_hash").agg(
            F.count(F.lit(1)).alias("__bn")
        )
        bands_df = (
            bands_df.join(sizes, ["band_idx", "band_hash"])
            .filter(F.col("__bn") <= max_bucket)
            .drop("__bn")
        )
    a = bands_df.select(
        F.col(id_col).alias("a_id"), "band_idx", "band_hash"
    )
    b = bands_df.select(
        F.col(id_col).alias("b_id"), "band_idx", "band_hash"
    )
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def lsh_skew_report(bands_df: DataFrame, max_bucket: int) -> DataFrame:
    """Dropped-mass audit for the ``max_bucket`` cap in
    :func:`lsh_candidate_pairs`: one row with the bucket count, how
    many buckets exceed the cap, and how many (id, band) rows they
    hold — the log()-style gate a production dedup run records so a
    silent recall loss (boilerplate flood) is visible, in the same
    spirit as the reference's count gates (``bunny.py:228-229``)."""
    sizes = bands_df.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("__bn")
    )
    return sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.coalesce(
            F.sum((F.col("__bn") > max_bucket).cast("long")), F.lit(0)
        ).alias("n_buckets_dropped"),
        F.coalesce(
            F.sum(F.when(F.col("__bn") > max_bucket, F.col("__bn"))), F.lit(0)
        ).alias("n_rows_dropped"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Full MinHash-LSH candidate-pair pipeline."""
    sh = shingle_df(df, id_col, text_col, k, unique_id_rows=True)
    sig = minhash_signatures(sh, id_col, num_hashes)
    return lsh_candidate_pairs(lsh_bands(sig, id_col, num_hashes, bands), id_col)


def minhash_lsh_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> str:
    rows = num_hashes // bands
    mh_aggs = ",\n         ".join(
        f"min(md5('{s}|' || shingle)) AS mh{s}" for s in range(num_hashes)
    )
    band_exprs = ", ".join(
        "md5(" + " || ".join(f"mh{b * rows + r}" for r in range(rows)) + ")"
        for b in range(bands)
    )
    return f"""
WITH sh AS ({shingle_sql(table, id_col, text_col, k)}),
sig AS (
  SELECT {id_col},
         {mh_aggs}
  FROM sh GROUP BY {id_col}
),
bands AS (
  SELECT {id_col},
         CAST(unnest(generate_series(0, {bands - 1})) AS INTEGER) AS band_idx,
         unnest([{band_exprs}]) AS band_hash
  FROM sig
)
SELECT a.{id_col} AS a_id, b.{id_col} AS b_id, COUNT(*) AS n_bands
FROM bands a JOIN bands b
  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
 AND a.{id_col} < b.{id_col}
GROUP BY 1, 2
"""


# ------------------------------------------------------------------ jaccard

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Exact n-gram Jaccard verification over LSH candidates: the
    standard two-stage near-dup pipeline (cheap recall stage → exact
    verify stage touching only candidate pairs, never all pairs).

    Jaccard is computed from integer intersection/union counts —
    exact, so thresholding is deterministic."""
    # The per-document DISTINCT shingle sets are computed once in
    # ARRAY form (lazy localCheckpoint — materialized by the first
    # consumer, reused by the rest; at corpus scale checkpoint to the
    # cluster store instead, executor-local blocks don't survive
    # executor loss).  Candidate generation explodes the materialized
    # attribute (the equi-join blocking needs the long relation);
    # verification intersects the two arrays ROW-LOCALLY — the old
    # exploded verify fanned every candidate pair out by the a-side's
    # shingle count through two shuffle joins, then joined two size
    # relations back on, to compute numbers that two array cells
    # already determine (the containment_pairs shape, r13).  The pair
    # relation is the explicit broadcast build side: the planner's
    # static pick broadcast the array-payload frame per verify join.
    arr = shingle_array_df(df, id_col, text_col, k).transform(
        checkpoint_lazy
    )
    sh = arr.select(id_col, F.explode("__shs").alias("shingle"))
    sig = minhash_signatures(sh, id_col, num_hashes)
    cand = lsh_candidate_pairs(lsh_bands(sig, id_col, num_hashes, bands), id_col)
    a_arr = arr.select(F.col(id_col).alias("a_id"), F.col("__shs").alias("__sa"))
    b_arr = arr.select(F.col(id_col).alias("b_id"), F.col("__shs").alias("__sb"))
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        a_arr.join(F.broadcast(cand.select("a_id", "b_id")), "a_id")
        .transform(lambda d: b_arr.join(F.broadcast(d), "b_id"))
        .select(
            "a_id",
            "b_id",
            F.size(F.array_intersect("__sa", "__sb"))
            .cast("bigint")
            .alias("n_inter"),
            F.size("__sa").cast("bigint").alias("n_a"),
            F.size("__sb").cast("bigint").alias("n_b"),
        )
        # LSH candidates share a band hash, hence (md5 collisions
        # aside) at least one shingle — but the row-local verify keeps
        # zero-intersection pairs where the old inner intersection
        # join dropped them, so filter them explicitly for exact
        # shape parity at any threshold.
        .filter(F.col("n_inter") >= 1)
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "n_inter", "n_a", "n_b", "jaccard")
    )


def ngram_jaccard_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
) -> str:
    cand = minhash_lsh_pairs_sql(table, id_col, text_col, k, num_hashes, bands)
    return f"""
WITH cand AS ({cand}),
sh AS ({shingle_sql(table, id_col, text_col, k)}),
sizes AS (SELECT {id_col}, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT c.a_id, c.b_id, COUNT(*) AS n_inter
  FROM cand c
  JOIN sh a ON a.{id_col} = c.a_id
  JOIN sh b ON b.{id_col} = c.b_id AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT i.a_id, i.b_id, i.n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
       CAST(i.n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE)
         AS jaccard
FROM inter i
JOIN sizes sa ON sa.{id_col} = i.a_id
JOIN sizes sb ON sb.{id_col} = i.b_id
WHERE CAST(i.n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE)
      >= {threshold}
"""


# ------------------------------------------------------------------ simhash

def _md5_int(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative bigint (identical in
    DuckDB via CAST('0x' || substr(md5(x),1,15) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash over distinct tokens: per bit, sum +1/-1 votes
    across token hashes; bit set where the vote is positive. One
    explode + one groupBy with 16 conditional sums (map-side
    combinable)."""
    toks = (
        rebalance_for_fanout(df, multiplier=64.0)
        .select(F.col(id_col).alias("__id"), F.explode(tokens(text_col)).alias("tok"))
        .dropDuplicates(["__id", "tok"])
        .withColumn("h", _md5_int(F.col("tok")))
    )
    votes = [
        F.sum(
            F.when(F.expr(f"(h >> {j}) & 1") == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(16)
    ]
    agg = toks.groupBy("__id").agg(*votes)
    sim = None
    for j in range(16):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select(F.col("__id").alias(id_col), sim.cast("long").alias("simhash"))


def simhash32_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """32-bit SimHash over distinct k-token shingles. Shingles, not
    raw tokens: on small-vocabulary corpora token-SET similarity
    saturates (most documents share most tokens), while shingle sets
    keep near-dup selectivity sane; 32 bits keeps random collisions
    out of birthday range for warehouse-scale corpora. Same one-pass
    vote aggregate as :func:`simhash16`."""
    sh = shingle_df(df, id_col, text_col, k, unique_id_rows=True).withColumn(
        "h", _md5_int(F.col("shingle"))
    )
    votes = [
        F.sum(
            F.when(F.expr(f"(h >> {j}) & 1") == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(32)
    ]
    agg = sh.groupBy(id_col).agg(*votes)
    sim = None
    for j in range(32):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select(F.col(id_col), sim.cast("long").alias("simhash"))


def simhash32_shingles_sql(table: str, id_col: str, text_col: str, k: int = 3) -> str:
    votes = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(32)
    )
    sim = " + ".join(
        f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(32)
    )
    return f"""
SELECT {id_col}, CAST({sim} AS BIGINT) AS simhash
FROM (
  SELECT {id_col},
         {votes}
  FROM (
    SELECT {id_col},
           CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS h
    FROM ({shingle_sql(table, id_col, text_col, k)})
  ) h GROUP BY {id_col}
) v
"""


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-duplicate pairs at scale via the pigeonhole banded
    join (the classic web-scale simhash dedup): split the 32-bit
    shingle signature into ``bands`` equal bands — any pair within
    Hamming distance ``max_hamming`` < ``bands`` must agree EXACTLY on
    at least one band — self-join on (band_idx, band_value) buckets,
    then verify with the exact distance ``bit_count(a XOR b)``.
    Candidate generation is bucket-local (shuffle keys are band
    values), never all-pairs; same scale shape as MinHash LSH banding.

    Output: ``(a_id, b_id, hamming)`` with a < b."""
    if max_hamming >= bands:
        # not an assert: stripped under -O, and the failure mode is a
        # silent recall loss (pairs differing in every band missed)
        raise ValueError(
            f"pigeonhole banding needs max_hamming < bands "
            f"(got {max_hamming} >= {bands})"
        )
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    sig = simhash32_shingles(df, id_col, text_col)
    width = 32 // bands
    mask = (1 << width) - 1
    # the banded relation feeds both self-join legs — materialize the
    # shingle+signature subtree once (guide §3.3); buckets here are
    # uncapped so the join (never a per-bucket collect) stays
    banded = _materialize_for_multipass(sig.select(
        F.col(id_col).alias("__id"),
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.expr(f"(simhash >> {b * width}) & {mask}")
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    ))
    a = banded.select(
        F.col("__id").alias("a_id"), F.col("simhash").alias("a_sig"),
        "band_idx", "band_val",
    )
    b = banded.select(
        F.col("__id").alias("b_id"), F.col("simhash").alias("b_sig"),
        "band_idx", "band_val",
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id", "b_id",
            F.expr("bit_count(a_sig ^ b_sig)").cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_near_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> str:
    """DuckDB oracle twin of :func:`simhash_near_pairs`."""
    width = 32 // bands
    mask = (1 << width) - 1
    band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT {id_col} AS id, simhash, {b} AS band_idx,"
        f" (simhash >> {b * width}) & {mask} AS band_val FROM sig"
        for b in range(bands)
    )
    return f"""
WITH sig AS ({simhash32_shingles_sql(table, id_col, text_col)}),
banded AS (
  {band_rows}
),
cand AS (
  SELECT DISTINCT a.id AS a_id, b.id AS b_id,
         CAST(bit_count(CAST(xor(a.simhash, b.simhash) AS BIGINT)) AS INTEGER)
           AS hamming
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.id < b.id
)
SELECT a_id, b_id, hamming FROM cand WHERE hamming <= {max_hamming}
"""


def simhash16_sql(table: str, id_col: str, text_col: str) -> str:
    votes = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(16)
    )
    bits = " + ".join(f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(16))
    return f"""
WITH toks AS (
  SELECT DISTINCT {id_col} AS id, t.tok
  FROM (SELECT {id_col}, {tokens_sql(text_col)} AS tl FROM {table}) s,
       LATERAL UNNEST(s.tl) AS t(tok)
),
hashed AS (
  SELECT id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM toks
),
agg AS (
  SELECT id,
         {votes}
  FROM hashed GROUP BY id
)
SELECT id AS {id_col}, CAST({bits} AS BIGINT) AS simhash FROM agg
"""


# ------------------------------------------------- connected components

def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str,
    max_iters: int = 25,
) -> DataFrame:
    """Cluster near-duplicate pairs into connected components and pick
    a canonical keeper per cluster — the step a training-data pipeline
    runs *after* pair generation (pairs are not actionable on their
    own; "keep one doc per duplicate group" needs the transitive
    closure: a~b, b~c ⇒ {a,b,c} is one group even if (a,c) was never a
    candidate pair).

    Algorithm: iterative min-label propagation. ``comp`` starts as the
    node's own id; each round every node takes the min of its own
    label and its neighbors' labels; at fixpoint ``comp`` is the
    minimum id reachable in the component, which is also the canonical
    keeper (so ``is_keeper = (id == component)`` — no second pass).

    Scale: each round is one shuffle join (edges × labels, both keyed
    on id), one map-side-combinable min-aggregate, and one POINTER-
    JUMPING join (every node also takes its label's label — the
    Shiloach-Vishkin doubling step), so rounds needed are
    O(log diameter) rather than O(diameter): near-dup clusters are
    dense (diameter 2–4) and converge in 2-3 rounds either way, but a
    pathological chain component — which an 8× scaling probe of the
    semantic-dedup pipeline actually produced — finishes in ~log2(D)
    rounds instead of blowing the iteration cap at D.
    ``localCheckpoint`` after each round truncates the lineage so the
    plan doesn't grow quadratically across iterations; at 100 TB you'd
    checkpoint to the cluster store instead
    (``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()``) for
    executor-loss resilience.

    Returns one row per node: (id, component, component_size,
    is_keeper).
    """
    # Checkpoint the edge list ONCE. ``pairs`` is usually the output of
    # an expensive candidate-generation plan (shingle → minhash → band
    # join); without the materialization every propagation round would
    # re-execute that whole plan as a subtree of its join.
    edges = (
        pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
        .unionByName(
            pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst"))
        )
        .transform(checkpoint_lazy)
    )
    # Propagate labels only over nodes incident to at least one edge.
    # In a near-dup corpus the overwhelming majority of documents are
    # singletons; keeping them out of the loop shrinks every per-round
    # join/aggregate from |corpus| to |dup-involved nodes| — the
    # difference between shuffling 100 TB per round and shuffling the
    # (tiny) duplicate subgraph. Singletons are attached at the end
    # with constant-folded component columns (no shuffle).
    # Lazy checkpoints throughout the loop (r13): each round's
    # label-sum collect is the action that materializes that round's
    # frame, so the separate eager-checkpoint job disappears — one
    # driver job per round instead of two (and the same for the init
    # frame and the edge list, which the first collect pulls through).
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .transform(checkpoint_lazy)
    )

    def _label_sum(df: DataFrame) -> object:
        # Labels only ever decrease, so the (exact, decimal) sum
        # strictly decreases until the fixpoint — an O(1)-result scan
        # over the checkpointed frame, far cheaper than a per-round
        # old-vs-new join.
        return df.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]

    prev_sum = _label_sum(labels)
    for it in range(max_iters):
        msgs = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"), F.col("comp")
        )
        merged = (
            labels.unionByName(msgs).groupBy("id").agg(F.min("comp").alias("comp"))
        )
        # Pointer jumping: comp values are themselves node ids in the
        # label table (labels only ever move to the id of a reachable
        # node), so following one level of indirection — take your
        # label's label — halves the remaining distance to the
        # component minimum.  Skipped for the first two rounds: dense
        # near-dup clusters (diameter 2-4, the overwhelmingly common
        # case) reach fixpoint on plain propagation and never pay the
        # extra join; a pathological chain component still converges
        # in 2 + O(log diameter) rounds once the jump engages.
        if it >= 2:
            hop = merged.select(
                F.col("id").alias("__hid"), F.col("comp").alias("__hcomp")
            )
            merged = merged.join(hop, merged.comp == hop.__hid, "left").select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("__hcomp"), F.col("comp"))
                ).alias("comp"),
            )
        labels = merged.transform(checkpoint_lazy)
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iters} rounds")

    sizes = labels.groupBy("comp").agg(F.count(F.lit(1)).alias("component_size"))
    active = labels.join(sizes, "comp").select(
        F.col("id").alias(id_col),
        F.col("comp").alias("component"),
        F.col("component_size"),
        (F.col("id") == F.col("comp")).alias("is_keeper"),
    )
    singletons = (
        nodes.select(F.col(id_col))
        .join(labels.select(F.col("id").alias(id_col)), id_col, "left_anti")
        .select(
            F.col(id_col),
            F.col(id_col).alias("component"),
            F.lit(1).cast("long").alias("component_size"),
            F.lit(True).alias("is_keeper"),
        )
    )
    return active.unionByName(singletons)


def dedup_components(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """MinHash-LSH pairs → connected components → canonical keeper."""
    pairs = minhash_lsh_pairs(df, id_col, text_col, k, num_hashes, bands)
    return connected_components(df, pairs, id_col)


def dedup_components_sql(
    table: str,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> str:
    """Oracle: transitive closure via recursive CTE (min reachable id
    per node = the component label the propagation converges to)."""
    cand = minhash_lsh_pairs_sql(table, id_col, text_col, k, num_hashes, bands)
    return f"""
WITH RECURSIVE cand AS ({cand}),
edges AS (
  SELECT a_id AS src, b_id AS dst FROM cand
  UNION ALL
  SELECT b_id AS src, a_id AS dst FROM cand
),
reach AS (
  SELECT {id_col} AS src, {id_col} AS dst FROM {table}
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
),
comp AS (SELECT src AS {id_col}, MIN(dst) AS component FROM reach GROUP BY src)
SELECT {id_col}, component,
       COUNT(*) OVER (PARTITION BY component) AS component_size,
       {id_col} = component AS is_keeper
FROM comp
"""


# ------------------------------------------- prefix-filtering join


def prefix_jaccard_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    tau_num: int = 3,
    tau_den: int = 5,
    shingle_k: int | None = None,
) -> DataFrame:
    """EXACT token-set similarity self-join (Jaccard ≥ τ) by prefix
    filtering — the PPJoin-family scale path that needs no LSH and
    misses nothing: a pair can reach Jaccard ≥ τ only if the two sets
    share a token within each other's first ``n − ⌈τ·n⌉ + 1`` rarest
    tokens, so only those *prefix* tokens are exploded as join keys.
    Rare-token ordering keeps candidate buckets small (the most
    selective tokens block the join, the "the"-bucket never forms).

    τ is a rational ``tau_num/tau_den`` and every filter is integer
    arithmetic — ``⌈τn⌉ = (τ_num·n + τ_den − 1) div τ_den``, the size
    bound ``τ_den·n_min ≥ τ_num·n_max``, the final test
    ``τ_den·inter ≥ τ_num·(n_a + n_b − inter)`` — so the join is
    bit-deterministic on any engine; the reported ``jaccard`` double
    is display-only.

    Shapes at 100 TB: one (id, token) distinct relation feeds token
    document-frequencies (one aggregate), per-document prefix ranking
    (one (id)-keyed window — tokens order by (df, token), no global
    rank/sort anywhere), the prefix-token equi-join (shuffle on
    token), and the intersection verify touching candidate pairs
    only. No stage is O(n²) in the corpus.

    ``shingle_k`` switches the set universe from distinct tokens to
    distinct k-word shingles — use it when the vocabulary is small
    relative to document length (long documents' token sets over a
    tiny vocabulary all converge to the whole vocabulary and
    everything looks similar; shingle universes stay sparse).
    """
    if shingle_k is not None:
        toks = shingle_df(
            df, id_col, text_col, shingle_k, unique_id_rows=True
        ).select(
            F.col(id_col).alias("__id"), F.col("shingle").alias("token")
        )
    else:
        toks = df.select(
            F.col(id_col).alias("__id"),
            F.explode(F.array_distinct(tokens(text_col))).alias("token"),
        )
    # `toks` feeds five consumers (document frequencies, sizes, the
    # ranked prefix, and both verify legs); materialize the
    # tokenize/shingle explode ONCE instead of replaying it per
    # reference — the un-truncated plan held 84 exchanges / 28 scans
    # (guide SS3.3: materialize intermediates referenced many times).
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    toks = _materialize_for_multipass(toks)
    dfreq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("__df"))
    sizes = toks.groupBy("__id").agg(F.count(F.lit(1)).alias("n_t"))
    w = Window.partitionBy("__id").orderBy(F.col("__df").asc(), F.col("token").asc())
    ranked = (
        toks.join(dfreq, "token")
        .withColumn("__pos", F.row_number().over(w))
        .join(sizes, "__id")
    )
    # prefix length L = n − ⌈τ·n⌉ + 1 (exact integral ceiling)
    lmax = (
        F.col("n_t")
        - F.expr(f"(CAST({tau_num} AS BIGINT) * n_t + {tau_den} - 1) div {tau_den}")
        + 1
    )
    # the prefix relation feeds both join legs; the candidate set
    # feeds the verify join and the final report — truncate each once
    # (their subtrees hold the window rank / the candidate equi-join).
    prefix = _materialize_for_multipass(
        ranked.filter(F.col("__pos") <= lmax).select(
            "__id", "token", "n_t", "__pos"
        )
    )
    a = prefix.select(
        F.col("__id").alias("a_id"),
        "token",
        F.col("n_t").alias("n_a"),
        F.col("__pos").alias("p_a"),
    )
    b = prefix.select(
        F.col("__id").alias("b_id"),
        "token",
        F.col("n_t").alias("n_b"),
        F.col("__pos").alias("p_b"),
    )
    # PPJoin positional filter: a shared prefix token at positions
    # (p_a, p_b) can support at most min(n_a−p_a, n_b−p_b)+1 common
    # tokens, which must reach the overlap bound
    # α = ⌈τ/(1+τ)·(n_a+n_b)⌉ — exact pruning, big candidate cuts on
    # low-diversity corpora where prefix buckets are fat.
    alpha = F.expr(
        f"(CAST({tau_num} AS BIGINT) * (n_a + n_b) + {tau_num} + {tau_den} - 1)"
        f" div ({tau_num} + {tau_den})"
    )
    cand = (
        a.join(b, "token")
        .filter(F.col("a_id") < F.col("b_id"))
        # size-compatibility prune: τ·max ≤ min
        .filter(
            F.least("n_a", "n_b") * tau_den >= F.greatest("n_a", "n_b") * tau_num
        )
        .filter(
            F.least(F.col("n_a") - F.col("p_a"), F.col("n_b") - F.col("p_b")) + 1
            >= alpha
        )
        .select("a_id", "b_id", "n_a", "n_b")
        .distinct()
    )
    cand = _materialize_for_multipass(cand)
    a_t = toks.select(F.col("__id").alias("a_id"), "token")
    b_t = toks.select(F.col("__id").alias("b_id"), "token")
    inter = (
        cand.select("a_id", "b_id")
        .join(a_t, "a_id")
        .join(b_t, ["b_id", "token"])
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = cand.join(inter, ["a_id", "b_id"]).filter(
        F.col("n_inter") * tau_den
        >= (F.col("n_a") + F.col("n_b") - F.col("n_inter")) * tau_num
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return out.select("a_id", "b_id", "n_inter", "n_a", "n_b", jac.alias("jaccard"))


def prefix_jaccard_join_sql(
    table_sql: str,
    id_col: str,
    text_col: str,
    tau_num: int = 3,
    tau_den: int = 5,
    shingle_k: int | None = None,
) -> str:
    """DuckDB oracle twin of :func:`prefix_jaccard_join`."""
    if shingle_k is not None:
        toks_cte = (
            f"SELECT {id_col} AS id, shingle AS token FROM "
            f"({shingle_sql(f'({table_sql})', id_col, text_col, shingle_k)})"
        )
    else:
        toks_cte = (
            f"SELECT {id_col} AS id, t.token "
            f"FROM ({table_sql}), "
            f"LATERAL UNNEST(list_distinct({tokens_sql(text_col)})) AS t(token)"
        )
    return f"""
WITH toks AS (
  {toks_cte}
),
dfreq AS (SELECT token, COUNT(*) AS df FROM toks GROUP BY token),
sizes AS (SELECT id, COUNT(*) AS n_t FROM toks GROUP BY id),
ranked AS (
  SELECT toks.id, toks.token, sizes.n_t,
         ROW_NUMBER() OVER (PARTITION BY toks.id
                            ORDER BY dfreq.df ASC, toks.token ASC) AS pos
  FROM toks JOIN dfreq USING (token) JOIN sizes USING (id)
),
prefix AS (
  SELECT id, token, n_t, pos FROM ranked
  WHERE pos <= n_t - (({tau_num} * n_t + {tau_den} - 1) // {tau_den}) + 1
),
cand AS (
  SELECT DISTINCT a.id AS a_id, b.id AS b_id, a.n_t AS n_a, b.n_t AS n_b
  FROM prefix a JOIN prefix b ON a.token = b.token AND a.id < b.id
  WHERE least(a.n_t, b.n_t) * {tau_den} >= greatest(a.n_t, b.n_t) * {tau_num}
    AND least(a.n_t - a.pos, b.n_t - b.pos) + 1 >=
        ({tau_num} * (a.n_t + b.n_t) + {tau_num} + {tau_den} - 1)
          // ({tau_num} + {tau_den})
),
inter AS (
  SELECT c.a_id, c.b_id, COUNT(*) AS n_inter
  FROM cand c
  JOIN toks ta ON ta.id = c.a_id
  JOIN toks tb ON tb.id = c.b_id AND tb.token = ta.token
  GROUP BY c.a_id, c.b_id
)
SELECT c.a_id, c.b_id, i.n_inter, c.n_a, c.n_b,
       CAST(i.n_inter AS DOUBLE) / CAST(c.n_a + c.n_b - i.n_inter AS DOUBLE)
         AS jaccard
FROM cand c JOIN inter i ON c.a_id = i.a_id AND c.b_id = i.b_id
WHERE i.n_inter * {tau_den} >= (c.n_a + c.n_b - i.n_inter) * {tau_num}
"""


def novelty_scores(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Per-document novelty against everything *earlier* in the corpus
    (ordered by id): the fraction of the document's distinct k-gram
    shingles whose FIRST occurrence belongs to an earlier document —
    the redundancy curve used to decide where dedup stops paying
    (novelty → 0 means the tail is re-crawls and boilerplate).

    Relational shape: the distinct shingle relation, a min-id
    aggregate per shingle (first owner), and a join back — shuffle
    keys are shingles only; exact integer ppm.

    Output: ``(id, n_shingles, n_seen_before, novelty_ppm)``."""
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    # sh feeds the first-owner aggregate AND the join back —
    # materialize the scan-side shingle explode once (guide §3.3;
    # r12-before plan of corpus_novelty_scores: 8 Exchange / 4 scans)
    sh = _materialize_for_multipass(
        shingle_df(df, id_col, text_col, k, unique_id_rows=True)
    )
    first = sh.groupBy("shingle").agg(F.min(id_col).alias("__first"))
    joined = sh.join(first, "shingle")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                (F.col("__first") < F.col(id_col)).cast("long")
            ).alias("n_seen_before"),
        )
        .withColumn(
            "novelty_ppm",
            F.expr(
                "(CAST(n_shingles - n_seen_before AS DECIMAL(38,0)) * 1000000)"
                " div n_shingles"
            ).cast("long"),
        )
    )


def novelty_scores_sql(table: str, id_col: str, text_col: str, k: int = 3) -> str:
    """DuckDB oracle twin of :func:`novelty_scores`."""
    return f"""
WITH sh AS ({shingle_sql(table, id_col, text_col, k)}),
first AS (SELECT shingle, MIN({id_col}) AS first_id FROM sh GROUP BY shingle)
SELECT sh.{id_col}, COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN first.first_id < sh.{id_col} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_seen_before,
       CAST(CAST((COUNT(*) - SUM(CASE WHEN first.first_id < sh.{id_col}
                                      THEN 1 ELSE 0 END)) AS HUGEINT)
            * 1000000 // COUNT(*) AS BIGINT) AS novelty_ppm
FROM sh JOIN first USING (shingle)
GROUP BY sh.{id_col}
"""


# ------------------------------------------- row-local minhash bands

def minhash_bands_rowlocal(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(id, band_idx, band_hash) computed entirely row-locally — pure
    projections, no explode/groupBy — producing bit-identical band
    hashes to the relational ``shingle_df → minhash_signatures →
    lsh_bands`` chain (pinned by a pytest invariant).

    This is the STREAMING-SAFE form: a Structured Streaming source
    cannot run the explode+groupBy signature aggregation in append
    mode, but it can run per-row expressions, which is all MinHash
    actually needs (min over a doc's own shingles). Rows too short to
    yield a shingle produce no output, matching the relational chain.
    At batch scale the relational form is preferred — the explode
    feeds several downstream consumers once; row-local recomputes
    per use."""
    toks = tokens(text_col)
    sh = F.when(
        F.size(F.col("tl")) >= k,
        F.expr(
            f"transform(sequence(1, size(tl) - {k - 1}),"
            f" i -> concat_ws(' ', slice(tl, i, {k})))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = df.select(F.col(id_col), toks.alias("tl")).select(
        id_col, sh.alias("sh")
    )
    def _mh(seed: int):
        # NB: the lambda must be unary — Spark gives a 2-arg lambda
        # (element, index), so a `lambda x, s=seed` default-arg closure
        # would silently receive the array INDEX as the seed.
        return F.array_min(
            F.transform(
                F.col("sh"),
                lambda x: F.md5(F.concat(F.lit(f"{seed}|"), x)),
            )
        )

    mh = [_mh(s).alias(f"mh{s}") for s in range(num_hashes)]
    sigs = base.filter(F.size("sh") > 0).select(id_col, *mh)
    # sigs has exactly the (id, mh0..mhN) shape lsh_bands expects —
    # reuse it so the band hashing lives in ONE place and the
    # streaming/batch parity invariant can't silently fork.
    return lsh_bands(sigs, id_col, num_hashes, bands)


# ------------------------------------------- cluster-quality keeper


def cluster_quality_keeper(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Quality-aware keeper for NEAR-duplicate clusters: the retention
    policy a curation pipeline actually wants is "keep the BEST
    document of each duplicate group", not the arbitrary min-id that
    the component label happens to be.  Pipeline: MinHash-LSH pairs →
    connected components (transitive closure) → join each member's
    composite quality score → argmax per component (quality desc,
    id asc tiebreak).

    Scale: the component window partitions by ``component`` — cluster
    sizes, not corpus size, bound each task; the quality score is a
    pure projection on the scan side of the join.

    Returns (id, component, component_size, quality, keep).
    """
    from gis_city_county_spark.operators.textstats import quality_score

    comp = dedup_components(df, id_col, text_col, k, num_hashes, bands)
    scored = df.select(F.col(id_col), quality_score(text_col).alias("quality"))
    w = Window.partitionBy("component").orderBy(
        F.col("quality").desc(), F.col(id_col).asc()
    )
    return (
        comp.join(scored, id_col)
        .withColumn("__rk", F.row_number().over(w))
        .select(
            id_col,
            "component",
            "component_size",
            "quality",
            (F.col("__rk") == 1).alias("keep"),
        )
    )


def cluster_quality_keeper_sql(
    table: str,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> str:
    from gis_city_county_spark.operators.textstats import quality_score_sql

    comp = dedup_components_sql(table, id_col, text_col, k, num_hashes, bands)
    return f"""
WITH comp AS ({comp}),
scored AS (SELECT {id_col}, {quality_score_sql(text_col)} AS quality FROM {table})
SELECT c.{id_col}, c.component, c.component_size, s.quality,
       ROW_NUMBER() OVER (PARTITION BY c.component
                          ORDER BY s.quality DESC, c.{id_col} ASC) = 1 AS keep
FROM comp c JOIN scored s ON s.{id_col} = c.{id_col}
"""


# ------------------------------------------------- dedup yield report


def dedup_yield_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Per-``group_col`` dedup funnel: how many documents each source
    contributes, and how many survive exact dedup (min-id keeper per
    normalized-text fingerprint) and near-dup dedup (component
    keeper).  The report a corpus build publishes per feed so a
    regression in one upstream source (suddenly 90% dupes) is visible
    the day it happens.

    All three counts are exact integers — no floating point anywhere
    — so the report is bit-stable across engines and partitionings.
    """
    comp = dedup_components(df, id_col, text_col, k, num_hashes, bands)
    wfp = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    exact = (
        df.select(F.col(id_col), fingerprint_md5(text_col).alias("__fp"))
        .withColumn("__ek", F.row_number().over(wfp) == 1)
        .select(id_col, "__ek")
    )
    return (
        df.select(F.col(id_col), F.col(group_col))
        .join(exact, id_col)
        .join(comp.select(id_col, "is_keeper"), id_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("__ek").cast("bigint")).alias("n_exact_keepers"),
            F.sum(F.col("is_keeper").cast("bigint")).alias("n_near_keepers"),
        )
    )


def dedup_yield_report_sql(
    table: str,
    id_col: str,
    text_col: str,
    group_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> str:
    comp = dedup_components_sql(table, id_col, text_col, k, num_hashes, bands)
    return f"""
WITH comp AS ({comp}),
exact AS (
  SELECT {id_col},
         ROW_NUMBER() OVER (PARTITION BY md5({normalized_text_sql(text_col)})
                            ORDER BY {id_col} ASC) = 1 AS ek
  FROM {table}
)
SELECT t.{group_col},
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(e.ek AS BIGINT)) AS BIGINT) AS n_exact_keepers,
       CAST(SUM(CAST(c.is_keeper AS BIGINT)) AS BIGINT) AS n_near_keepers
FROM {table} t
JOIN exact e ON e.{id_col} = t.{id_col}
JOIN comp c ON c.{id_col} = t.{id_col}
GROUP BY t.{group_col}
"""


def cluster_size_histogram(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Shape of the near-duplicate cluster population: how many
    clusters exist at each size, how many documents they hold, and
    how many a keeper-per-cluster policy removes — the one-glance
    answer to "is the duplication a long tail of pairs or a few
    mega-clusters", which decides whether dedup is a trim or a
    rebuild (and whether a boilerplate source is flooding the feed).

    Scale: rides the same candidate chain as ``dedup_components``
    (shingle → MinHash band join → pointer-jumped components, never
    all-pairs); the histogram itself is one DISTINCT over (component,
    size) — at most one row per cluster — plus a count keyed by the
    handful of distinct sizes.  All exact integers.

    Returns (cluster_size, n_clusters, n_docs, n_removable), one row
    per observed size including the singletons (size 1, n_removable
    0).
    """
    comp = dedup_components(df, id_col, text_col, k, num_hashes, bands)
    clusters = comp.select("component", "component_size").distinct()
    return (
        clusters.groupBy(
            F.col("component_size").cast("bigint").alias("cluster_size")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_removable"),
        )
    )


def cluster_size_histogram_sql(
    table: str,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> str:
    comp = dedup_components_sql(table, id_col, text_col, k, num_hashes, bands)
    return f"""
WITH comp AS ({comp}),
clusters AS (SELECT DISTINCT component, component_size FROM comp)
SELECT CAST(component_size AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(component_size * COUNT(*) AS BIGINT) AS n_docs,
       CAST((component_size - 1) * COUNT(*) AS BIGINT) AS n_removable
FROM clusters GROUP BY component_size
"""


def blocking_recall(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sample_fraction: float = 0.1,
    truth_ppm: int = 700_000,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Blocking-quality audit: on a deterministic hash sample of the
    corpus, compare the MinHash-LSH candidate pairs against the
    ground-truth near-duplicate pairs (exact shingle Jaccard ≥
    ``truth_ppm``/1e6, found WITHOUT the bands) — the recall/precision
    readout that justifies a banding configuration with numbers
    instead of the (1/b)^(b/n) folklore curve.

    Scale: ground truth is inherently quadratic, so it runs on the
    hash sample only (a fixed absolute budget at 100 TB — lower
    ``sample_fraction`` as the corpus grows); even there the truth
    pass joins on shared shingles rather than crossing the sample, so
    zero-overlap pairs are never materialized (Jaccard > 0 requires a
    shared shingle, and ``truth_ppm`` > 0).  The LSH chain is the
    SAME code path production blocking uses, run over the same
    sample.  All counts exact integers; the Jaccard threshold is an
    exact integer comparison (``n_inter·1e6 ≥ ppm·union``) — no
    doubles anywhere.

    Returns one row: (n_docs_sampled, n_truth_pairs, n_blocked_pairs,
    n_hit, recall_ppm, precision_ppm) — recall/precision NULL when
    their denominator is 0.
    """
    from gis_city_county_spark.operators.sketch import hash_sample

    sample = hash_sample(df, id_col, sample_fraction)
    sh = shingle_df(
        sample, id_col, text_col, k, unique_id_rows=True
    ).transform(checkpoint_eager)

    # Ground truth: pairs sharing >= 1 shingle, verified by exact
    # integer Jaccard (pairs with no shared shingle have Jaccard 0 <
    # threshold, so the shingle equi-join loses nothing).
    a_sh = sh.select(F.col(id_col).alias("a_id"), "shingle")
    b_sh = sh.select(F.col(id_col).alias("b_id"), "shingle")
    inter = (
        a_sh.join(b_sh, "shingle")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    sizes = sh.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sh")
    )
    truth = (
        inter.join(
            sizes.select(F.col(id_col).alias("a_id"), F.col("n_sh").alias("n_a")),
            "a_id",
        )
        .join(
            sizes.select(F.col(id_col).alias("b_id"), F.col("n_sh").alias("n_b")),
            "b_id",
        )
        .filter(
            F.col("n_inter") * F.lit(1_000_000)
            >= F.lit(truth_ppm) * (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        )
        .select("a_id", "b_id")
    )

    # The production blocking chain, over the same sample.
    sig = minhash_signatures(sh, id_col, num_hashes)
    blocked = lsh_candidate_pairs(
        lsh_bands(sig, id_col, num_hashes, bands), id_col
    ).select("a_id", "b_id")

    n_docs = sample.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_sampled")
    )
    n_truth = truth.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_truth_pairs")
    )
    n_blocked = blocked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocked_pairs")
    )
    n_hit = truth.join(blocked, ["a_id", "b_id"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hit")
    )
    return (
        n_docs.crossJoin(n_truth)  # four 1-row audit scalars
        .crossJoin(n_blocked)
        .crossJoin(n_hit)
        .select(
            "n_docs_sampled",
            "n_truth_pairs",
            "n_blocked_pairs",
            "n_hit",
            # explicit zero guards: ANSI Spark raises on div-by-zero
            # where DuckDB's // would too — NULL is the contract
            F.expr(
                "CASE WHEN n_truth_pairs = 0 THEN CAST(NULL AS BIGINT)"
                " ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_truth_pairs"
                " END"
            ).alias("recall_ppm"),
            F.expr(
                "CASE WHEN n_blocked_pairs = 0 THEN CAST(NULL AS BIGINT)"
                " ELSE (n_hit * CAST(1000000 AS BIGINT)) div n_blocked_pairs"
                " END"
            ).alias("precision_ppm"),
        )
    )


def blocking_recall_sql(
    table: str,
    id_col: str,
    text_col: str,
    sample_fraction: float = 0.1,
    truth_ppm: int = 700_000,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> str:
    from gis_city_county_spark.operators.sketch import (
        hash_sample_predicate_sql,
    )

    pred = hash_sample_predicate_sql(id_col, sample_fraction)
    sample = f"(SELECT * FROM {table} WHERE {pred})"
    cand = minhash_lsh_pairs_sql(sample, id_col, text_col, k, num_hashes, bands)
    # outer CTE named tsh, NOT sh: the nested candidate subquery
    # defines its own `sh`, and shadowing a MATERIALIZED outer CTE of
    # the same name trips a DuckDB 1.0 internal error ("Recursive CTE
    # scan found without recursive CTE node")
    return f"""
WITH tsh AS MATERIALIZED ({shingle_sql(sample, id_col, text_col, k)}),
inter AS (
  SELECT a.{id_col} AS a_id, b.{id_col} AS b_id,
         CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM tsh a JOIN tsh b ON a.shingle = b.shingle AND a.{id_col} < b.{id_col}
  GROUP BY 1, 2
),
sizes AS (SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_sh FROM tsh GROUP BY 1),
truth AS (
  SELECT i.a_id, i.b_id
  FROM inter i
  JOIN sizes sa ON sa.{id_col} = i.a_id
  JOIN sizes sb ON sb.{id_col} = i.b_id
  WHERE i.n_inter * CAST(1000000 AS BIGINT)
        >= {truth_ppm} * (sa.n_sh + sb.n_sh - i.n_inter)
),
blocked AS (SELECT a_id, b_id FROM ({cand})),
agg AS (
  SELECT
    (SELECT CAST(COUNT(*) AS BIGINT) FROM {sample}) AS n_docs_sampled,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth_pairs,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM blocked) AS n_blocked_pairs,
    (SELECT CAST(COUNT(*) AS BIGINT)
     FROM truth t JOIN blocked c ON t.a_id = c.a_id AND t.b_id = c.b_id)
      AS n_hit
)
SELECT n_docs_sampled, n_truth_pairs, n_blocked_pairs, n_hit,
       CASE WHEN n_truth_pairs = 0 THEN CAST(NULL AS BIGINT)
            ELSE CAST((n_hit * CAST(1000000 AS BIGINT)) // n_truth_pairs
                      AS BIGINT) END AS recall_ppm,
       CASE WHEN n_blocked_pairs = 0 THEN CAST(NULL AS BIGINT)
            ELSE CAST((n_hit * CAST(1000000 AS BIGINT)) // n_blocked_pairs
                      AS BIGINT) END AS precision_ppm
FROM agg
"""


# ---------------------------------------------- containment (subset) dup


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold_ppm: int = 600_000,
    max_shingle_df: int = 8,
) -> DataFrame:
    """Asymmetric near-dup detection: containment(a,b) =
    |A∩B| / min(|A|,|B|) over k-token shingle sets — catches a short
    document EMBEDDED in a longer one (quote farms, scraped mirrors
    with boilerplate wrappers), which symmetric Jaccard misses because
    the union is dominated by the longer side.

    Candidates: pairs sharing at least one RARE shingle (document
    frequency ≤ ``max_shingle_df``) — the same df-capped blocking idea
    as the prefix filter; a hot boilerplate shingle never fans out a
    bucket join.  Guarantee: any contained doc owning ≥ 1 rare
    shingle is found (a doc made ENTIRELY of ubiquitous shingles has
    no discriminative content to block on — raise the cap for that
    corpus).  Verification is exact: full shared-shingle count per
    candidate pair, integer ppm threshold test, no floats anywhere.

    ``id_col`` must be UNIQUE per input row (a per-document key, the
    same contract as ``shingle_df(unique_id_rows=True)``): the
    row-local verify id-equi-joins the per-row shingle arrays, so an
    id spanning multiple rows would emit one output row per
    underlying row pair with per-row set sizes instead of one
    aggregated row per id pair.

    Returns (a_id, b_id, n_inter, n_a, n_b, containment_ppm).
    """
    # The shingle SETS are computed once in array form (r12, guide
    # §2.3/§3.3): candidate generation explodes them (equi-join
    # blocking needs the long relation), but verification intersects
    # the two arrays ROW-LOCALLY — the old exploded verify fanned every
    # candidate pair out by the a-side's shingle count (|cand| × ~k·|doc|
    # rows through two shuffle joins) to compute a number that two
    # array cells already determine.
    arr = shingle_array_df(df, id_col, text_col, k).transform(
        checkpoint_lazy
    )
    sh = arr.select(id_col, F.explode("__shs").alias("shingle"))
    # Candidate generation fused into ONE aggregate (r13): the old
    # shape computed the document frequencies (groupBy + broadcast
    # back), joined them onto the exploded relation TWICE (both
    # self-join legs), and self-joined on the shingle — four
    # broadcast-build driver jobs and two replays of the explode.
    # One groupBy(shingle) yields both the df cap AND the per-shingle
    # id list (bounded at ``max_shingle_df`` ids by the filter), and
    # the C(m,2) ordered pairs explode ROW-LOCALLY from the sorted id
    # array — identical pair set (ids are distinct per shingle: one
    # row per id, row-local distinct shingle arrays).
    cand = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(id_col)).alias("__ids"))
        .filter(F.size("__ids") <= max_shingle_df)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(__ids, (x, i) ->"
                    " transform(slice(__ids, i + 2, size(__ids)),"
                    " y -> struct(x AS a_id, y AS b_id))))"
                )
            ).alias("__p")
        )
        .select("__p.a_id", "__p.b_id")
        .distinct()
    )
    a_arr = arr.select(F.col(id_col).alias("a_id"), F.col("__shs").alias("__sa"))
    b_arr = arr.select(F.col(id_col).alias("b_id"), F.col("__shs").alias("__sb"))
    # Build side = the PAIR relation (bounded by the blocking cap),
    # never the array-payload side: the planner's static pick
    # broadcast the shingle-array frame twice (~10 MB of array cells
    # serialized per build job) to join a few hundred id pairs.  The
    # id-keyed probes stream the arrays exactly once each (guide §3.1:
    # broadcast the side you KNOW is small).
    return (
        a_arr.join(F.broadcast(cand), "a_id")
        .transform(lambda d: b_arr.join(F.broadcast(d), "b_id"))
        .select(
            "a_id",
            "b_id",
            F.size(F.array_intersect("__sa", "__sb"))
            .cast("bigint")
            .alias("n_inter"),
            F.size("__sa").cast("bigint").alias("n_a"),
            F.size("__sb").cast("bigint").alias("n_b"),
        )
        .withColumn(
            "containment_ppm",
            F.expr("(n_inter * CAST(1000000 AS BIGINT)) div least(n_a, n_b)"),
        )
        .filter(
            F.col("n_inter") * F.lit(1_000_000)
            >= F.lit(threshold_ppm) * F.least("n_a", "n_b")
        )
        .select("a_id", "b_id", "n_inter", "n_a", "n_b", "containment_ppm")
    )


def containment_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold_ppm: int = 600_000,
    max_shingle_df: int = 8,
) -> str:
    return f"""
WITH sh AS ({shingle_sql(table, id_col, text_col, k)}),
sizes AS (SELECT {id_col}, COUNT(*) AS n_sh FROM sh GROUP BY 1),
rare AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {max_shingle_df}
),
rsh AS (SELECT s.{id_col}, s.shingle FROM sh s JOIN rare r ON s.shingle = r.shingle),
cand AS (
  SELECT DISTINCT a.{id_col} AS a_id, b.{id_col} AS b_id
  FROM rsh a JOIN rsh b ON a.shingle = b.shingle AND a.{id_col} < b.{id_col}
),
inter AS (
  SELECT c.a_id, c.b_id, COUNT(*) AS n_inter
  FROM cand c
  JOIN sh a ON a.{id_col} = c.a_id
  JOIN sh b ON b.{id_col} = c.b_id AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT i.a_id, i.b_id, i.n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
       CAST((i.n_inter * CAST(1000000 AS BIGINT)) // LEAST(sa.n_sh, sb.n_sh)
            AS BIGINT) AS containment_ppm
FROM inter i
JOIN sizes sa ON sa.{id_col} = i.a_id
JOIN sizes sb ON sb.{id_col} = i.b_id
WHERE i.n_inter * 1000000 >= {threshold_ppm} * LEAST(sa.n_sh, sb.n_sh)
"""


# ----------------------------------------------- incremental ingest dedup


def incremental_dedup_report(
    base: DataFrame,
    incoming: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
) -> DataFrame:
    """Per-``group_col`` ingest funnel for an INCREMENTAL corpus build:
    of the incoming batch, how many documents' exact fingerprints
    already exist in the accumulated base (skip), how many collide
    within the batch itself (keep the min-id), and how many actually
    ingest — the report each nightly feed drop publishes, turning a
    suddenly-90%-duplicate upstream into a same-day alarm.

    Scale: fingerprints are md5 of normalized text (pure projection);
    "already in base" is a left-semi/anti join on the fingerprint —
    at 100 TB the base side is the accumulated FINGERPRINT TABLE (one
    slim column), not the corpus, and the join shuffles only the
    incoming batch against it.  All counts exact integers.

    Returns (group, n_incoming, n_dup_vs_base, n_dup_in_batch,
    n_ingested).
    """
    from gis_city_county_spark.operators.textstats import fingerprint_md5

    base_fp = base.select(fingerprint_md5(text_col).alias("__fp")).distinct()
    return incremental_dedup_report_from_fps(
        base_fp, incoming, id_col, text_col, group_col
    )


def incremental_dedup_report_from_fps(
    base_fp: DataFrame,
    incoming: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
) -> DataFrame:
    """Core of :func:`incremental_dedup_report` taking the accumulated
    base as its slim FINGERPRINT table (one distinct ``__fp`` string
    column) — the representation a 100 TB incremental build actually
    persists between feed drops, and the one the streaming twin
    (:func:`streaming.dedup.streaming_incremental_dedup`) accumulates
    across micro-batches."""
    from pyspark.sql import Window

    from gis_city_county_spark.operators.textstats import fingerprint_md5

    # inc feeds the per-group census AND the anti join; it is
    # projection-only (so _materialize_for_multipass would wave it
    # through) but the projection normalizes+md5s the FULL text per
    # reference while its output is three slim columns — checkpoint
    # it explicitly.  fresh stays UN-materialized: its two consumers
    # replay only a cheap anti join over the checkpointed inc, and
    # the LeftAnti must remain visible in the executed plan (the
    # test_plan_quality gate; a checkpoint would hide it behind a
    # Scan ExistingRDD).  (guide §3.3; r12-before plan: 12 Exchange /
    # 10 parquet scans)
    inc = incoming.select(
        F.col(group_col).alias("__grp"),
        F.col(id_col).alias("__id"),
        fingerprint_md5(text_col).alias("__fp"),
    ).localCheckpoint(eager=False)
    fresh = inc.join(base_fp, "__fp", "left_anti")
    w = Window.partitionBy("__fp").orderBy(F.col("__id").asc())
    kept = fresh.withColumn("__rk", F.row_number().over(w))
    # Null-safe group joins (eqNullSafe / IS NOT DISTINCT FROM in the
    # twin): rows with a NULL group form a real "NULL" group, and a
    # plain equi-join would never match it — every NULL-group incoming
    # row would then be misreported as a base-dup with n_ingested = 0.
    fresh_g = (
        fresh.groupBy("__grp")
        .agg(F.count(F.lit(1)).alias("__n_fresh"))
        .withColumnRenamed("__grp", "__grp_f")
    )
    kept_g = (
        kept.filter(F.col("__rk") == 1)
        .groupBy("__grp")
        .agg(F.count(F.lit(1)).alias("__n_kept"))
        .withColumnRenamed("__grp", "__grp_k")
    )
    per_group = (
        inc.groupBy("__grp").agg(F.count(F.lit(1)).alias("n_incoming"))
        .join(fresh_g, F.col("__grp").eqNullSafe(F.col("__grp_f")), "left")
        .join(kept_g, F.col("__grp").eqNullSafe(F.col("__grp_k")), "left")
    )
    return per_group.select(
        F.col("__grp").alias(group_col),
        "n_incoming",
        (F.col("n_incoming") - F.coalesce(F.col("__n_fresh"), F.lit(0))).alias(
            "n_dup_vs_base"
        ),
        (
            F.coalesce(F.col("__n_fresh"), F.lit(0))
            - F.coalesce(F.col("__n_kept"), F.lit(0))
        ).alias("n_dup_in_batch"),
        F.coalesce(F.col("__n_kept"), F.lit(0)).alias("n_ingested"),
    )


def incremental_dedup_report_sql(
    base_sql: str,
    incoming_sql: str,
    id_col: str,
    text_col: str,
    group_col: str,
) -> str:
    from gis_city_county_spark.operators.textstats import normalized_text_sql

    fp = f"md5({normalized_text_sql(text_col)})"
    return f"""
WITH base_fp AS (SELECT DISTINCT {fp} AS fp FROM ({base_sql})),
inc AS (
  SELECT {group_col} AS grp, {id_col} AS id, {fp} AS fp FROM ({incoming_sql})
),
fresh AS (
  -- LEFT JOIN ... IS NULL, not NOT IN: a single NULL fingerprint in
  -- the base would make NOT IN return zero rows, and NULL-fp incoming
  -- rows must stay (Spark's left_anti keeps them: NULL matches
  -- nothing), so the join-based spelling is the exact anti-join twin.
  SELECT i.grp, i.id, i.fp FROM inc i
  LEFT JOIN base_fp b ON i.fp = b.fp
  WHERE b.fp IS NULL
),
kept AS (
  SELECT grp, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY id ASC) AS rk
  FROM fresh
)
SELECT i.grp AS {group_col},
       CAST(COUNT(*) AS BIGINT) AS n_incoming,
       CAST(COUNT(*) - COALESCE(MAX(f.nf), 0) AS BIGINT) AS n_dup_vs_base,
       CAST(COALESCE(MAX(f.nf), 0) - COALESCE(MAX(k.nk), 0) AS BIGINT)
         AS n_dup_in_batch,
       CAST(COALESCE(MAX(k.nk), 0) AS BIGINT) AS n_ingested
FROM inc i
LEFT JOIN (SELECT grp, COUNT(*) AS nf FROM fresh GROUP BY grp) f
       ON f.grp IS NOT DISTINCT FROM i.grp
LEFT JOIN (SELECT grp, COUNT(*) AS nk FROM kept WHERE rk = 1 GROUP BY grp) k
       ON k.grp IS NOT DISTINCT FROM i.grp
GROUP BY i.grp
"""


# ------------------------------------------------ exact substring spans


def substring_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_match_tokens: int = 20,
    max_window_df: int = 16,
) -> DataFrame:
    """Exact-substring duplication: pairs of documents sharing a LONG
    run of identical consecutive tokens — the "same paragraph pasted
    into two pages" signal substring-level training-data dedup keys on
    (shingle-set containment sees the overlap but not whether it is
    one contiguous span or scattered phrases).

    Rewrite: every k-token window of every document, WITH its
    position; two documents sharing a span of L ≥ k tokens share
    exactly L−k+1 windows on one (pos_a − pos_b) DIAGONAL, so the
    longest common substring (in tokens) is k − 1 + the longest
    consecutive run of matched windows on any diagonal — a
    gaps-and-islands count (row_number per (pair, diagonal), group by
    pos − row_number), never an alignment matrix.

    Candidates block on RARE windows (document frequency ≤
    ``max_window_df``, the containment-pairs idea): a boilerplate
    window shared by half the corpus never fans out the bucket join,
    and any span of ≥ ``min_match_tokens`` that contains at least one
    rare window is found.  Verification joins the candidates back to
    the FULL positioned-window relation, so run lengths are exact.

    Returns (a_id, b_id, n_matches, max_run, longest_match_tokens)
    filtered to longest_match_tokens ≥ ``min_match_tokens``; all
    integers, no floats anywhere.
    """
    with_toks = rebalance_for_fanout(df, multiplier=64.0).select(
        F.col(id_col).alias("__id"), tokens(text_col).alias("__toks")
    )
    win = F.when(
        F.size("__toks") >= k,
        F.expr(
            f"transform(sequence(1, size(__toks) - {k - 1}),"
            f" i -> concat_ws(' ', slice(__toks, i, {k})))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    pw = with_toks.select(
        "__id", F.posexplode(win).alias("pos", "w")
    ).transform(checkpoint_eager)

    # r12: `dw` feeds the document-frequency census AND the candidate
    # generator — materialize the distinct shuffle once (guide §3.3).
    # Candidates then come from a per-window sorted id array: a rare
    # window holds ≤ max_window_df ids by construction, so the pair
    # fan-out is ROW-LOCAL (≤ C(max_window_df, 2) per window) instead
    # of a self-join that evaluated the rdw subtree twice (§2.4; the
    # same rewrite as cooccurrence_pairs).
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    dw = _materialize_for_multipass(pw.select("__id", "w").distinct())
    rare = (
        dw.groupBy("w")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= max_window_df)
        .select("w")
    )
    cand = (
        dw.join(rare, "w")
        .groupBy("w")
        .agg(F.array_sort(F.collect_list("__id")).alias("__ids"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(__ids, (x, i) ->"
                    " transform(slice(__ids, i + 2, size(__ids)),"
                    " y -> struct(x AS a_id, y AS b_id))))"
                )
            ).alias("__p")
        )
        .select("__p.a_id", "__p.b_id")
        .distinct()
    )

    pa = pw.select(
        F.col("__id").alias("a_id"), F.col("pos").alias("pos_a"), "w"
    )
    pb = pw.select(
        F.col("__id").alias("b_id"), F.col("pos").alias("pos_b"), "w"
    )
    matched = (
        cand.join(pa, "a_id")
        .join(pb, ["b_id", "w"])
        .select(
            "a_id", "b_id", "pos_a",
            (F.col("pos_a") - F.col("pos_b")).alias("diag"),
        )
        # repeated windows inside one document can hit the same
        # (diagonal, pos_a) cell more than once — one run cell each
        .distinct()
    )
    rn = F.row_number().over(
        Window.partitionBy("a_id", "b_id", "diag").orderBy("pos_a")
    )
    runs = (
        matched.select("a_id", "b_id", "diag", "pos_a", rn.alias("__rn"))
        .select(
            "a_id", "b_id", "diag",
            (F.col("pos_a") - F.col("__rn")).alias("__grp"),
        )
        .groupBy("a_id", "b_id", "diag", "__grp")
        .agg(F.count(F.lit(1)).alias("__run"))
    )
    return (
        runs.groupBy("a_id", "b_id")
        .agg(
            F.sum("__run").cast("bigint").alias("n_matches"),
            F.max("__run").cast("bigint").alias("max_run"),
        )
        .withColumn(
            "longest_match_tokens",
            (F.col("max_run") + F.lit(k - 1)).cast("bigint"),
        )
        .filter(F.col("longest_match_tokens") >= min_match_tokens)
        .select(
            "a_id", "b_id", "n_matches", "max_run", "longest_match_tokens"
        )
    )


def substring_dup_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_match_tokens: int = 20,
    max_window_df: int = 16,
) -> str:
    parts = " || ' ' || ".join(f"list_extract(t, i + {j})" for j in range(k))
    return f"""
WITH toks AS (SELECT {id_col} AS id, {tokens_sql(text_col)} AS t FROM {table}),
pw AS MATERIALIZED (
  SELECT id, i AS pos, {parts} AS w
  FROM toks, LATERAL UNNEST(generate_series(1, len(t) - {k - 1})) AS g(i)
  WHERE len(t) >= {k}
),
dw AS (SELECT DISTINCT id, w FROM pw),
rare AS (SELECT w FROM dw GROUP BY w HAVING COUNT(*) <= {max_window_df}),
rdw AS (SELECT d.id, d.w FROM dw d JOIN rare r ON d.w = r.w),
cand AS (
  SELECT DISTINCT a.id AS a_id, b.id AS b_id
  FROM rdw a JOIN rdw b ON a.w = b.w AND a.id < b.id
),
matched AS (
  SELECT DISTINCT c.a_id, c.b_id, pa.pos AS pos_a, pa.pos - pb.pos AS diag
  FROM cand c
  JOIN pw pa ON pa.id = c.a_id
  JOIN pw pb ON pb.id = c.b_id AND pb.w = pa.w
),
runs AS (
  SELECT a_id, b_id, diag,
         pos_a - ROW_NUMBER() OVER (PARTITION BY a_id, b_id, diag
                                    ORDER BY pos_a) AS grp,
         1 AS one
  FROM matched
),
per_run AS (
  SELECT a_id, b_id, diag, grp, COUNT(*) AS run
  FROM runs GROUP BY a_id, b_id, diag, grp
)
SELECT a_id, b_id,
       CAST(SUM(run) AS BIGINT) AS n_matches,
       CAST(MAX(run) AS BIGINT) AS max_run,
       CAST(MAX(run) + {k - 1} AS BIGINT) AS longest_match_tokens
FROM per_run
GROUP BY a_id, b_id
HAVING MAX(run) + {k - 1} >= {min_match_tokens}
"""


def threshold_yield_curve(
    df: DataFrame,
    id_col: str,
    text_col: str,
    thresholds: tuple[int, ...] = (500, 600, 700, 800, 900),
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Dedup threshold sweep — "what does each Jaccard cutoff cost":
    for every candidate threshold (permille), the number of verified
    near-dup pairs at or above it and the number of distinct
    documents those pairs touch.  This is the planning row a pipeline
    owner reads before picking the production cutoff, answered from
    ONE run of the LSH→exact-verify chain (never one run per
    threshold).

    Thresholding is exact: the verify stage's integer
    (n_inter, n_a, n_b) give jaccard_permille = 1000·n_inter div
    (n_a+n_b−n_inter), so a pair sits on the same side of every
    cutoff on every engine.  The per-threshold distinct-doc count
    explodes each verified pair into ≤ 2·|thresholds| slim rows —
    fan-out bounded by the constant threshold list, applied AFTER
    candidate verification (∝ verified pairs, never the corpus).

    Returns (threshold_permille, n_pairs, n_docs_affected), one row
    per threshold in ascending order.
    """
    # the verified-pair relation feeds the pair count AND the
    # distinct-doc count; truncate the LSH→verify chain once instead
    # of replaying signatures+band join+verify per output branch
    # (guide SS3.3 — the plan held 30 broadcast joins before; pairs
    # are the bounded post-verify relation, the cheap thing to hold)
    pairs = ngram_jaccard_pairs(
        df, id_col, text_col, k=k, threshold=0.0,
        num_hashes=num_hashes, bands=bands,
    ).select(
        "a_id",
        "b_id",
        F.expr("CAST((1000 * n_inter) div (n_a + n_b - n_inter) AS BIGINT)")
        .alias("__pm"),
    ).localCheckpoint(eager=False)
    t_arr = F.array(*[F.lit(int(t)) for t in thresholds])
    hits = pairs.select(
        "a_id", "b_id", "__pm",
        F.explode(t_arr).alias("threshold_permille"),
    ).filter(F.col("__pm") >= F.col("threshold_permille"))
    n_pairs = hits.groupBy("threshold_permille").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    docs = (
        hits.select(
            "threshold_permille", F.col("a_id").alias("__doc")
        )
        .unionByName(
            hits.select("threshold_permille", F.col("b_id").alias("__doc"))
        )
        .distinct()
        .groupBy("threshold_permille")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs_affected"))
    )
    base = df.sparkSession.createDataFrame(
        [(int(t),) for t in thresholds], "threshold_permille int"
    )
    return (
        base.join(n_pairs, "threshold_permille", "left")
        .join(docs, "threshold_permille", "left")
        .select(
            F.col("threshold_permille").cast("bigint")
            .alias("threshold_permille"),
            F.coalesce("n_pairs", F.lit(0).cast("bigint")).alias("n_pairs"),
            F.coalesce("n_docs_affected", F.lit(0).cast("bigint"))
            .alias("n_docs_affected"),
        )
    )


def threshold_yield_curve_sql(
    table: str,
    id_col: str,
    text_col: str,
    thresholds: tuple[int, ...] = (500, 600, 700, 800, 900),
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> str:
    inner = ngram_jaccard_pairs_sql(
        table, id_col, text_col, k=k, threshold=0.0,
        num_hashes=num_hashes, bands=bands,
    )
    tvals = ", ".join(str(int(t)) for t in thresholds)
    return f"""
WITH pairs AS (
  SELECT a_id, b_id,
         CAST((1000 * n_inter) // (n_a + n_b - n_inter) AS BIGINT) AS pm
  FROM ({inner})
),
t AS (SELECT UNNEST([{tvals}]) AS threshold_permille),
hits AS (
  SELECT t.threshold_permille, p.a_id, p.b_id
  FROM pairs p JOIN t ON p.pm >= t.threshold_permille
),
np AS (
  SELECT threshold_permille, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM hits GROUP BY 1
),
nd AS (
  SELECT threshold_permille, CAST(COUNT(*) AS BIGINT) AS n_docs_affected
  FROM (
    SELECT DISTINCT threshold_permille, doc
    FROM (
      SELECT threshold_permille, a_id AS doc FROM hits
      UNION ALL
      SELECT threshold_permille, b_id AS doc FROM hits
    )
  ) GROUP BY 1
)
SELECT CAST(t.threshold_permille AS BIGINT) AS threshold_permille,
       COALESCE(np.n_pairs, 0) AS n_pairs,
       COALESCE(nd.n_docs_affected, 0) AS n_docs_affected
FROM t
LEFT JOIN np ON t.threshold_permille = np.threshold_permille
LEFT JOIN nd ON t.threshold_permille = nd.threshold_permille
"""


def minhash_accuracy(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Sketch-quality audit: how far the MinHash Jaccard ESTIMATE
    (matching signature components / num_hashes) sits from the exact
    shingle Jaccard, over the verified candidate pairs.  This is the
    calibration row that justifies a signature width before anyone
    trusts the estimator at 100 TB: e = est − exact in permille,
    histogrammed in 100-permille buckets.

    One extra signature self-join over the verified pairs (both sides
    ≤ |candidates|); everything else rides the existing LSH→verify
    chain — inlined here (not a call into :func:`ngram_jaccard_pairs`)
    so the checkpointed shingle relation and the signatures are built
    ONCE and feed candidates, exact verify, AND the estimate join
    (re-deriving them doubled the tokenize+shingle work).
    Integer-exact: component matches are a CASE sum, both permilles
    are integral divisions.

    Returns (err_bucket, n_pairs, min_err_permille, max_err_permille),
    err_bucket = floor(e/100).
    """
    sh = shingle_df(
        df, id_col, text_col, k, unique_id_rows=True
    ).transform(checkpoint_eager)
    sig = minhash_signatures(sh, id_col, num_hashes)
    cand = lsh_candidate_pairs(
        lsh_bands(sig, id_col, num_hashes, bands), id_col
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n_sh"))
    a_sh = sh.select(F.col(id_col).alias("a_id"), "shingle")
    b_sh = sh.select(F.col(id_col).alias("b_id"), "shingle")
    inter = (
        cand.join(a_sh, "a_id")
        .join(b_sh, ["b_id", "shingle"])
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("__n_inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("a_id"),
                        F.col("__n_sh").alias("__n_a"))
    sz_b = sizes.select(F.col(id_col).alias("b_id"),
                        F.col("__n_sh").alias("__n_b"))
    pairs = (
        inter.join(sz_a, "a_id")
        .join(sz_b, "b_id")
        .select(
            "a_id",
            "b_id",
            F.expr(
                "CAST((1000 * __n_inter) div (__n_a + __n_b - __n_inter)"
                " AS BIGINT)"
            ).alias("__exact_pm"),
        )
    )
    sa = sig.select(
        F.col(id_col).alias("a_id"),
        *[F.col(f"mh{s}").alias(f"__a{s}") for s in range(num_hashes)],
    )
    sb = sig.select(
        F.col(id_col).alias("b_id"),
        *[F.col(f"mh{s}").alias(f"__b{s}") for s in range(num_hashes)],
    )
    matches = sum(
        (F.when(F.col(f"__a{s}") == F.col(f"__b{s}"), 1).otherwise(0)
         for s in range(num_hashes)),
        F.lit(0),
    )
    est_pm = F.expr(
        f"CAST((1000 * __matches) div {num_hashes} AS BIGINT)"
    )
    err = (est_pm - F.col("__exact_pm")).cast("bigint")
    return (
        pairs.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("__matches", matches.cast("bigint"))
        .select(F.col("__exact_pm"), F.col("__matches"))
        .select(err.alias("__err"))
        .select(
            F.expr(
                "CAST(CASE WHEN __err >= 0 THEN __err div 100"
                " ELSE -((-__err + 99) div 100) END AS BIGINT)"
            ).alias("err_bucket"),
            "__err",
        )
        .groupBy("err_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.min("__err").cast("bigint").alias("min_err_permille"),
            F.max("__err").cast("bigint").alias("max_err_permille"),
        )
    )


def minhash_accuracy_sql(
    table: str,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> str:
    inner = ngram_jaccard_pairs_sql(
        table, id_col, text_col, k=k, threshold=0.0,
        num_hashes=num_hashes, bands=bands,
    )
    sig_aggs = ", ".join(
        f"MIN(md5('{s}|' || shingle)) AS mh{s}" for s in range(num_hashes)
    )
    match_sum = " + ".join(
        f"(CASE WHEN sa.mh{s} = sb.mh{s} THEN 1 ELSE 0 END)"
        for s in range(num_hashes)
    )
    return f"""
WITH pairs AS (
  SELECT a_id, b_id,
         CAST((1000 * n_inter) // (n_a + n_b - n_inter) AS BIGINT)
           AS exact_pm
  FROM ({inner})
),
sh2 AS ({shingle_sql(table, id_col, text_col, k)}),
sig AS (SELECT {id_col}, {sig_aggs} FROM sh2 GROUP BY 1),
err AS (
  SELECT CAST((1000 * ({match_sum})) // {num_hashes} AS BIGINT)
           - p.exact_pm AS e
  FROM pairs p
  JOIN sig sa ON sa.{id_col} = p.a_id
  JOIN sig sb ON sb.{id_col} = p.b_id
)
SELECT CAST(CASE WHEN e >= 0 THEN e // 100
            ELSE -((-e + 99) // 100) END AS BIGINT) AS err_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(MIN(e) AS BIGINT) AS min_err_permille,
       CAST(MAX(e) AS BIGINT) AS max_err_permille
FROM err GROUP BY 1
"""


# ---------------------------------------------------------------- winnowing


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm) with a cross-document sharing
    audit: hash every k-token shingle, slide a window of ``w``
    consecutive hashes, select each window's minimum (ties →
    RIGHTMOST, the paper's rule), and dedupe selections — the classic
    guarantee that any shared run of ``w + k - 1`` tokens between two
    documents produces at least one shared fingerprint, at ~2/(w+1)
    of the shingle density.

    Everything is exact integer arithmetic shared by both engines:
    the (hash, position) pair is packed into ONE bigint key ``(h36 +
    1) * 2^24 - pos`` so the window MIN itself implements the
    rightmost-tie rule (same 36-bit hash → larger pos → smaller key)
    without engine-specific struct ordering.  Positions are capped at
    2^24 - 1 shingles (~16M tokens) per document — beyond that the
    packing would collide, so longer documents must be chunked first
    (``corpus.chunk_documents``).

    Scale shape: shingle+hash is scan-side array math; the selection
    is ONE doc-partitioned ordered window (never global); the sharing
    audit is a map-combinable count over the winnowed (not raw)
    fingerprint relation — the whole point of winnowing at 100 TB is
    that downstream joins see ~2/(w+1) of the positions.

    Returns (id, n_shingles, n_fingerprints, n_shared_fp, shared_ppm)
    for documents with at least one full window (n_shingles >= w);
    ``n_shared_fp`` counts this document's fingerprints whose hash is
    also selected by at least one OTHER document.
    """
    m = 1 << 24
    base = rebalance_for_fanout(df, multiplier=16.0).select(
        F.col(id_col).alias("__id"), tokens(text_col).alias("__toks")
    )
    sh = base.filter(F.size("__toks") >= k + w - 1).select(
        "__id",
        (F.size("__toks") - (k - 1)).alias("__nsh"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(__toks) - {k - 1}),"
                f" i -> concat_ws(' ', slice(__toks, i, {k})))"
            )
        ).alias("__p0", "__sh"),
    ).select(
        "__id",
        "__nsh",
        (F.col("__p0") + 1).alias("__pos"),
        (
            (F.conv(F.substring(F.md5("__sh"), 1, 9), 16, 10)
             .cast("long") + 1) * m - (F.col("__p0") + 1)
        ).alias("__key"),
    )
    wspec = (
        Window.partitionBy("__id").orderBy("__pos").rowsBetween(0, w - 1)
    )
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    # fp feeds the per-hash doc census AND the final join — without
    # the materialization the shingle explode + window + distinct
    # subtree runs twice (guide §3.3; the r12-before plan held 10
    # Exchange / 4 parquet scans)
    fp = _materialize_for_multipass(
        sh.withColumn("__wmin", F.min("__key").over(wspec))
        .filter(F.col("__pos") <= F.col("__nsh") - (w - 1))
        .select("__id", "__nsh", F.col("__wmin").alias("__key"))
        .distinct()
        .withColumn("__h", F.expr(f"(__key + {m}) div {m} - 1"))
    )
    hdocs = (
        fp.select("__h", "__id").distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__nd"))
    )
    return (
        fp.join(hdocs, "__h")
        .groupBy("__id", "__nsh")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_fingerprints"),
            F.sum(F.when(F.col("__nd") >= 2, 1).otherwise(0))
            .cast("bigint").alias("n_shared_fp"),
        )
        .select(
            F.col("__id").alias("id"),
            F.col("__nsh").cast("bigint").alias("n_shingles"),
            "n_fingerprints",
            "n_shared_fp",
            F.expr(
                "CAST((n_shared_fp * CAST(1000000 AS BIGINT))"
                " div n_fingerprints AS BIGINT)"
            ).alias("shared_ppm"),
        )
    )


def winnowing_fingerprints_sql(
    table: str, id_col: str, text_col: str, k: int = 4, w: int = 4
) -> str:
    m = 1 << 24
    parts = " || ' ' || ".join(
        f"list_extract(t, i + {j})" for j in range(k)
    )
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {tokens_sql(text_col)} AS t FROM {table}
),
sh AS (
  SELECT id, len(t) - {k - 1} AS nsh, i AS pos,
         (CAST('0x' || substr(md5({parts}), 1, 9) AS BIGINT) + 1)
           * {m} - i AS key
  FROM base, LATERAL UNNEST(generate_series(1, len(t) - {k - 1})) AS g(i)
  WHERE len(t) >= {k + w - 1}
),
sel AS (
  SELECT DISTINCT id, nsh,
         MIN(key) OVER (PARTITION BY id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
           AS key
  FROM sh
  QUALIFY pos <= nsh - {w - 1}
),
fp AS (
  SELECT id, nsh, key, (key + {m}) // {m} - 1 AS h FROM sel
),
hdocs AS (
  SELECT h, COUNT(*) AS nd FROM (SELECT DISTINCT h, id FROM fp) GROUP BY h
)
SELECT fp.id AS id,
       CAST(fp.nsh AS BIGINT) AS n_shingles,
       CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
       CAST(SUM(CASE WHEN hdocs.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared_fp,
       CAST((SUM(CASE WHEN hdocs.nd >= 2 THEN 1 ELSE 0 END)
             * CAST(1000000 AS BIGINT)) // COUNT(*) AS BIGINT)
         AS shared_ppm
FROM fp JOIN hdocs ON fp.h = hdocs.h
GROUP BY fp.id, fp.nsh
"""
