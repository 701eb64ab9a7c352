"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the correctness baseline: a broadcast
cross-join of a small probe set against the corpus with the distance
computed in JVM array expressions (zip_with + aggregate fold — no
Python, no explode). At 100 TB the scale path is LSH bucketing
(random-hyperplane signatures, same banded-join shape as MinHash in
:mod:`dedup`) so probes only meet a bucket's worth of corpus.

Determinism: Spark's ``aggregate`` fold and DuckDB's
``list_dot_product`` both accumulate left-to-right in double, so the
dot products (and everything derived from them) are bit-identical —
verified empirically on the test embeddings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot_product(a: Column, b: Column) -> Column:
    """Sequential left-to-right double dot product (JVM-side)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def with_norm2(df: DataFrame, vec_col: str, out: str = "norm2") -> DataFrame:
    """Attach the squared L2 norm."""
    return df.withColumn(out, dot_product(F.col(vec_col), F.col(vec_col)))


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    max_probes: int | None = 10_000,
) -> DataFrame:
    """Top-k cosine neighbors per probe (self-matches excluded).

    ``probes`` must be small (it is broadcast); the corpus streams
    through one pass — no shuffle until the per-probe top-k window,
    which partitions by probe id. Norms are computed once per side,
    not per pair.

    This is the exact SMALL-PROBE baseline: work is |corpus|×|probes|.
    The ``max_probes`` guard fails loudly when the probe side exceeds
    it (a bounded ``limit().count()`` probe, same barrier class as the
    reference's count gates) — at scale use :func:`lsh_ann_topk` /
    :func:`ivf_ann_topk`, whose candidate generation is bucket-local.
    Pass ``max_probes=None`` only when the caller has already bounded
    the probe side."""
    from gis_city_county_spark.operators.scale import rebalance_for_fanout

    if max_probes is not None:
        if probes.limit(max_probes + 1).count() > max_probes:
            raise ValueError(
                f"cosine_topk probe side exceeds max_probes={max_probes}: "
                "brute-force scoring is |corpus|x|probes| — use "
                "lsh_ann_topk/ivf_ann_topk for large probe sets, or pass "
                "max_probes=None to override"
            )

    # Each corpus row is scored against every probe — row work scales
    # with |probes|, so a narrow scan must be spread across slots.
    corpus = rebalance_for_fanout(corpus, multiplier=8.0)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
    c = c.withColumn("__cnorm2", dot_product(F.col("__cvec"), F.col("__cvec")))
    p = probes.select(F.col(id_col).alias("probe_id"), F.col(vec_col).alias("__pvec"))
    p = p.withColumn("__pnorm2", dot_product(F.col("__pvec"), F.col("__pvec")))

    joined = c.crossJoin(F.broadcast(p)).filter(F.col("neighbor_id") != F.col("probe_id"))
    cos = dot_product(F.col("__cvec"), F.col("__pvec")) / (
        F.sqrt("__pnorm2") * F.sqrt("__cnorm2")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        joined.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank", "cosine")
    )


# ---------------------------------------------------------- LSH scale path

def hyperplanes(dim: int = 64, n_planes: int = 64, seed: int = 7) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH, rounded to 6
    decimals so the literal text parsed by DuckDB equals the double
    Spark receives bit-for-bit."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return [[round(float(x), 6) for x in row] for row in rng.standard_normal((n_planes, dim))]


def rp_lsh_bands(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
    bands: int,
) -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) LSH band keys:
    ``(__id, band_idx, band_val)`` — one thin row per band; consumers
    re-attach vectors by id for the exact-scoring stage.

    Sign bits ``dot(v, plane) >= 0`` are packed into ``bands`` integer
    band values; vectors sharing any band value are similarity
    candidates.

    The signature kernel is a vectorized Arrow-batched ``mapInPandas``
    — one ``n×planes×dim`` numpy multiply per chunk instead of
    ``planes×dim`` interpreted higher-order-function steps per row
    (the expression form was the bottleneck of the whole LSH path at
    64 planes). Determinism: ``np.cumsum`` along the dim axis is a
    sequential prefix sum, so its last element reproduces the exact
    left-to-right IEEE fold of DuckDB's ``list_dot_product`` — signs,
    and hence band values, are bit-identical to the SQL twin (a
    pairwise/BLAS ``np.dot`` would not be)."""
    import numpy as np
    import pandas as pd

    from gis_city_county_spark.operators.scale import rebalance_for_fanout

    n_planes = len(planes)
    rows = n_planes // bands
    plane_mat = np.array(planes, dtype=np.float64)  # planes × dim
    weights = (1 << np.arange(rows)).astype(np.int64)
    out_schema = T.StructType(
        [
            T.StructField("__id", T.LongType()),
            T.StructField("band_idx", T.IntegerType()),
            T.StructField("band_val", T.IntegerType()),
        ]
    )
    chunk = 2048  # n×planes×dim float64 ⇒ ~64 MB per chunk at 64×64

    def signatures(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            vecs = pdf[vec_col].to_numpy()
            for lo in range(0, len(ids), chunk):
                hi = min(lo + chunk, len(ids))
                v = np.array(list(vecs[lo:hi]), dtype=np.float64)
                prods = v[:, None, :] * plane_mat[None, :, :]
                dots = np.cumsum(prods, axis=2)[:, :, -1]
                bits = (dots >= 0).astype(np.int64).reshape(-1, bands, rows)
                band_vals = (bits * weights).sum(axis=2).astype(np.int32)
                n = hi - lo
                yield pd.DataFrame(
                    {
                        "__id": np.repeat(ids[lo:hi], bands),
                        "band_idx": np.tile(
                            np.arange(bands, dtype=np.int32), n
                        ),
                        "band_val": band_vals.ravel(),
                    }
                )

    src = rebalance_for_fanout(df.select(id_col, vec_col), multiplier=float(bands))
    return src.mapInPandas(signatures, out_schema)


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_planes: int = 64,
    bands: int = 8,
    dim: int = 64,
    max_bucket: int | None = 256,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing: only
    vectors sharing an LSH band are compared, so the pairwise stage is
    per-bucket, never all-pairs. Approximate by construction (recall
    is the banding probability); the oracle runs the identical
    algorithm so results match exactly.

    Band width sets the bucket count and hence the pair blowup: 8-bit
    bands (the default, 64 planes / 8 bands) give 256 buckets per
    band, so expected pairs/band ~ n²/256 instead of n²/16 with 4-bit
    bands — the difference between a feasible and a quadratic shuffle
    at corpus scale. Recall for a pair at angle θ is
    ``1 - (1 - (1-θ/π)^8)^8`` — ≈0.99 at cosine 0.95, ≈0.93 at 0.9 —
    i.e. true near-dups are kept; only far-apart marginal pairs are
    increasingly dropped.

    ``max_bucket`` (default 256) bounds the residual quadratic term BY
    CONSTRUCTION — the 8× scaling probe read 0.68× linear and the
    growth is exactly per-bucket occupancy (pairs/band ~ n²/256):
    buckets with more than ``max_bucket`` members are first
    md5-rank-sampled down to the cap (deterministic — the same ids
    survive on every engine, every run, every partitioning), so
    per-bucket fan-out never exceeds C(cap, 2) and total candidate
    work is O(band_rows · cap) instead of O(Σ bucket²).  A pair
    dropped from one oversized bucket can still surface via any of
    the other 7 bands, so the recall loss concentrates where LSH is
    least informative (giant near-constant buckets).  Audit which
    buckets were capped with :func:`lsh_bucket_truncation_report`;
    pass ``max_bucket=None`` only when bucket occupancy is known
    bounded."""
    planes = hyperplanes(dim, n_planes)
    bd = rp_lsh_bands(df, id_col, vec_col, planes, bands)
    # Pair on thin (id, band) rows only: the candidate-pair explosion
    # shuffles 16-byte id pairs, not 0.5 KB vectors. Vectors re-attach
    # afterwards by id (AQE broadcasts the side if it's small; at
    # corpus scale it's a shuffle join on id over far fewer rows than
    # the raw band join would have carried).
    thin = bd.select("__id", "band_idx", "band_val")
    if max_bucket is not None:
        # r12: the cap bounds every bucket at ``max_bucket`` ids, so
        # the pair fan-out is ROW-LOCAL — collect each bucket's sorted
        # id array (reuses the cap window's clustering on the band
        # keys, no new exchange) and explode the C(m,2) ordered pairs
        # from ONE evaluation, instead of a banded self-join that
        # evaluated the 64-plane projection + cap window twice
        # (guide §2.4/§3.3; the cooccurrence_pairs rewrite).
        w = Window.partitionBy("band_idx", "band_val").orderBy(
            F.md5(F.col("__id").cast("string")), F.col("__id")
        )
        cand = (
            thin.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= max_bucket)
            .groupBy("band_idx", "band_val")
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
            .dropDuplicates(["a_id", "b_id"])
        )
    else:
        # uncapped buckets can be huge — keep the self-join (never a
        # per-bucket collect), but materialize the banded relation
        # once for its two legs
        from gis_city_county_spark.operators.scale import (
            _materialize_for_multipass,
        )

        thin = _materialize_for_multipass(thin)
        a = thin.select(F.col("__id").alias("a_id"), "band_idx", "band_val")
        b = thin.select(F.col("__id").alias("b_id"), "band_idx", "band_val")
        cand = (
            a.join(b, ["band_idx", "band_val"])
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id")
            .dropDuplicates(["a_id", "b_id"])
        )
    from gis_city_county_spark.operators.scale import checkpoint_lazy

    # lazy-checkpointed: the norms column feeds both join legs AND the
    # final cosine>=threshold filter — live, constraint propagation
    # infers isnotnull(<norm expr>) and pushdown substitutes the whole
    # interpreted zip_with/aggregate dot product into per-row Filters
    # inside the single-task scan stage (2 extra evaluations/row); a
    # materialized frame pins the filter to the concrete column.
    vecs = checkpoint_lazy(df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        dot_product(F.col(vec_col), F.col(vec_col)).alias("__n2"),
    ))
    av = vecs.select(
        F.col("__id").alias("a_id"), F.col("__v").alias("a_v"), F.col("__n2").alias("a_n2")
    )
    bv = vecs.select(
        F.col("__id").alias("b_id"), F.col("__v").alias("b_v"), F.col("__n2").alias("b_n2")
    )
    cos = dot_product(F.col("a_v"), F.col("b_v")) / (
        F.sqrt("a_n2") * F.sqrt("b_n2")
    )
    return (
        cand.join(av, "a_id")
        .join(bv, "b_id")
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cosine")
    )


def lsh_ann_topk(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    probe_pred: Column,
    k: int = 5,
    n_planes: int = 64,
    bands: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k neighbors: probes meet only same-band corpus
    rows (the 100 TB path — bucket join instead of cross join), then
    exact cosine + per-probe window rank over the candidates."""
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    planes = hyperplanes(dim, n_planes)
    bd = rp_lsh_bands(corpus, id_col, vec_col, planes, bands)
    # Thin-pair join (see embedding_cosine_pairs): vectors re-attach
    # by id after the candidate dedupe.  The banded relation feeds
    # BOTH the probe and candidate legs — materialize the hyperplane
    # projection once instead of re-running the 64-plane dot products
    # per leg (guide §3.3).
    thin = _materialize_for_multipass(
        bd.select("__id", "band_idx", "band_val")
    )
    probes = thin.filter(probe_pred).select(
        F.col("__id").alias("probe_id"), "band_idx", "band_val"
    )
    cand = thin.select(F.col("__id").alias("neighbor_id"), "band_idx", "band_val")
    pairs = (
        probes.join(cand, ["band_idx", "band_val"])
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select("probe_id", "neighbor_id")
        .dropDuplicates(["probe_id", "neighbor_id"])
    )
    vecs = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        dot_product(F.col(vec_col), F.col(vec_col)).alias("__n2"),
    )
    pv = vecs.select(
        F.col("__id").alias("probe_id"), F.col("__v").alias("p_v"),
        F.col("__n2").alias("p_n2"),
    )
    cv = vecs.select(
        F.col("__id").alias("neighbor_id"), F.col("__v").alias("c_v"),
        F.col("__n2").alias("c_n2"),
    )
    cos = dot_product(F.col("c_v"), F.col("p_v")) / (
        F.sqrt("p_n2") * F.sqrt("c_n2")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.join(pv, "probe_id")
        .join(cv, "neighbor_id")
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank", "cosine")
    )


# ---------------------------------------------------------- IVF scale path

def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid (max cosine,
    centroid-id tiebreak) → ``(id, vec, norm2, cid)`` — the inverted
    lists, keyed by centroid. Centroids are broadcast (nlist ≈ √N rows
    even at 100 TB), so assignment is one map-side pass + a window over
    the corpus id; at scale the result would be written bucketed by
    ``cid`` so a probe reads only its nprobe lists."""
    c = centroids.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("__cv")
    ).withColumn("__cn2", dot_product(F.col("__cv"), F.col("__cv")))
    e = corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    e = e.withColumn("__n2", dot_product(F.col("__v"), F.col("__v")))
    cos = dot_product(F.col("__v"), F.col("__cv")) / (F.sqrt("__n2") * F.sqrt("__cn2"))
    w = Window.partitionBy("__id").orderBy(F.desc("__ccos"), F.asc("cid"))
    return (
        e.crossJoin(F.broadcast(c))
        .withColumn("__ccos", cos)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("__id", "__v", "__n2", "cid")
    )


def ivf_ann_topk(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    probe_pred: Column,
    k: int = 5,
    nlist: int = 32,
    nprobe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: a coarse quantizer partitions the corpus
    into ``nlist`` inverted lists; each probe scores only the vectors
    in its ``nprobe`` nearest lists (an equi-join on list id — never a
    cross join against the corpus).

    The quantizer here is deterministic — centroids are the vectors
    with ``id < nlist`` — so the DuckDB oracle can replay the identical
    index; production would train k-means on a sample and plug the
    centroid table in unchanged (the assignment/search plans don't
    depend on how centroids were chosen). ``probe_pred`` is evaluated
    against the assigned-corpus ``__id`` column."""
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    cents = corpus.filter(F.col(id_col) < nlist)
    # the assigned inverted lists feed the probe selection AND the
    # scoring join — materialize once or the ×nlist assignment
    # crossjoin + argmin window replays per reference (guide §3.3;
    # the r12-before plan held 10 Exchange / 6 BNLJ / 18 Sorts)
    lists = _materialize_for_multipass(
        ivf_assign(corpus, cents, id_col, vec_col)
    )

    c = cents.select(
        F.col(id_col).alias("pcid"), F.col(vec_col).alias("__pcv")
    ).withColumn("__pcn2", dot_product(F.col("__pcv"), F.col("__pcv")))
    probes = lists.filter(probe_pred).select(
        F.col("__id").alias("probe_id"), F.col("__v").alias("p_v"), F.col("__n2").alias("p_n2")
    )
    pcos = dot_product(F.col("p_v"), F.col("__pcv")) / (F.sqrt("p_n2") * F.sqrt("__pcn2"))
    wp = Window.partitionBy("probe_id").orderBy(F.desc("__pcos"), F.asc("pcid"))
    probe_lists = (
        probes.crossJoin(F.broadcast(c))
        .withColumn("__pcos", pcos)
        .withColumn("__prn", F.row_number().over(wp))
        .filter(F.col("__prn") <= nprobe)
        .select("probe_id", "p_v", "p_n2", F.col("pcid").alias("cid"))
    )
    cos = dot_product(F.col("__v"), F.col("p_v")) / (F.sqrt("p_n2") * F.sqrt("__n2"))
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("__id"))
    return (
        probe_lists.join(lists, "cid")
        .filter(F.col("__id") != F.col("probe_id"))
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", F.col("__id").alias("neighbor_id"), "rank", "cosine")
    )


def build_ivf_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    nlist: int = 32,
) -> None:
    """Materialize the IVF index on disk: inverted lists hive-
    partitioned by centroid id (``<path>/lists/cid=N/``) plus the
    centroid table (``<path>/centroids``). Pay the assignment pass
    once at build; every subsequent probe reads only its ``nprobe``
    list DIRECTORIES — partition pruning, the on-disk form of
    bucket-local ANN. Same deterministic quantizer as
    :func:`ivf_ann_topk` (centroids = vectors with id < nlist), so
    query results are identical to the in-memory path."""
    from gis_city_county_spark.sources.layout import write_partitioned

    cents = corpus.filter(F.col(id_col) < nlist)
    lists = ivf_assign(corpus, cents, id_col, vec_col)
    write_partitioned(lists, f"{path}/lists", ["cid"])
    cents.select(id_col, vec_col).write.mode("overwrite").parquet(
        f"{path}/centroids"
    )


def ivf_index_topk(
    spark: SparkSession,
    path: str,
    id_col: str,
    vec_col: str,
    probe_pred: Column,
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """Query a :func:`build_ivf_index` index. The probe→list routing
    (probes × broadcast centroids) yields at most ``nlist`` distinct
    list ids; collecting them (a bounded, metadata-scale driver hop —
    same class as dynamic partition pruning) turns the corpus scan
    into a literal ``cid IN (...)`` partition filter, so only the
    probed list directories are read no matter how large the corpus
    grows."""
    from pyspark.sql import SparkSession as _S  # noqa: F401 (signature doc)

    cents = spark.read.parquet(f"{path}/centroids")
    c = cents.select(
        F.col(id_col).alias("pcid"), F.col(vec_col).alias("__pcv")
    ).withColumn("__pcn2", dot_product(F.col("__pcv"), F.col("__pcv")))

    lists_all = spark.read.parquet(f"{path}/lists")
    probes = lists_all.filter(probe_pred).select(
        F.col("__id").alias("probe_id"),
        F.col("__v").alias("p_v"),
        F.col("__n2").alias("p_n2"),
    )
    pcos = dot_product(F.col("p_v"), F.col("__pcv")) / (
        F.sqrt("p_n2") * F.sqrt("__pcn2")
    )
    wp = Window.partitionBy("probe_id").orderBy(F.desc("__pcos"), F.asc("pcid"))
    probe_lists = (
        probes.crossJoin(F.broadcast(c))
        .withColumn("__pcos", pcos)
        .withColumn("__prn", F.row_number().over(wp))
        .filter(F.col("__prn") <= nprobe)
        .select("probe_id", "p_v", "p_n2", F.col("pcid").alias("cid"))
    )
    needed = [r[0] for r in probe_lists.select("cid").distinct().collect()]
    pruned = spark.read.parquet(f"{path}/lists").filter(
        F.col("cid").isin(needed or [-1])
    )
    cos = dot_product(F.col("__v"), F.col("p_v")) / (
        F.sqrt("p_n2") * F.sqrt("__n2")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("__id"))
    return (
        probe_lists.join(pruned, "cid")
        .filter(F.col("__id") != F.col("probe_id"))
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", F.col("__id").alias("neighbor_id"), "rank", "cosine")
    )


def ivf_ann_topk_sql(
    table: str,
    id_col: str,
    vec_col: str,
    probe_filter: str,
    k: int = 5,
    nlist: int = 32,
    nprobe: int = 4,
) -> str:
    """DuckDB twin of :func:`ivf_ann_topk` — replays the identical
    deterministic index. ``probe_filter`` must be qualified against
    alias ``p`` — e.g. ``"p.id % 50 = 0"``."""
    vd = f"list_transform({vec_col}, x -> CAST(x AS DOUBLE))"
    return f"""
WITH e AS (
  SELECT {id_col} AS id, {vd} AS v, list_dot_product({vd}, {vd}) AS n2
  FROM {table}
),
cent AS (SELECT id AS cid, v AS cv, n2 AS cn2 FROM e WHERE id < {nlist}),
assigned AS (
  SELECT id, v, n2, cid FROM (
    SELECT e.id, e.v, e.n2, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY e.id
             ORDER BY list_dot_product(e.v, c.cv) / (sqrt(e.n2) * sqrt(c.cn2)) DESC,
                      c.cid ASC) AS rn
    FROM e CROSS JOIN cent c) t
  WHERE rn = 1
),
probe_lists AS (
  SELECT probe_id, p_v, p_n2, cid FROM (
    SELECT p.id AS probe_id, p.v AS p_v, p.n2 AS p_n2, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY p.id
             ORDER BY list_dot_product(p.v, c.cv) / (sqrt(p.n2) * sqrt(c.cn2)) DESC,
                      c.cid ASC) AS prn
    FROM assigned p CROSS JOIN cent c
    WHERE {probe_filter}) t
  WHERE prn <= {nprobe}
),
scored AS (
  SELECT pl.probe_id, a.id AS neighbor_id,
         list_dot_product(a.v, pl.p_v) / (sqrt(pl.p_n2) * sqrt(a.n2)) AS cosine
  FROM probe_lists pl JOIN assigned a USING (cid)
  WHERE a.id != pl.probe_id
)
SELECT probe_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cosine
FROM (
  SELECT probe_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY probe_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) t
WHERE rank <= {k}
"""


def _planes_sql(planes: list[list[float]]) -> list[str]:
    return ["[" + ", ".join(repr(x) for x in p) + "]" for p in planes]


def _bands_cte_sql(
    table: str, id_col: str, vec_col: str, n_planes: int, bands: int, dim: int
) -> str:
    """Shared SQL CTEs producing the (id, v, n2, band_idx, band_val)
    relation with the same hyperplanes as the Spark side."""
    planes = hyperplanes(dim, n_planes)
    lits = _planes_sql(planes)
    rows = n_planes // bands
    vd = f"list_transform({vec_col}, x -> CAST(x AS DOUBLE))"
    bits = [
        f"CASE WHEN list_dot_product(v, {lits[i]}) >= 0 THEN 1 ELSE 0 END"
        for i in range(n_planes)
    ]
    band_exprs = [
        " + ".join(f"{bits[b * rows + r]} * {1 << r}" for r in range(rows))
        for b in range(bands)
    ]
    idx_list = ", ".join(str(i) for i in range(bands))
    band_list = ", ".join(band_exprs)
    return f"""
e AS (
  SELECT {id_col} AS id, {vd} AS v,
         list_dot_product({vd}, {vd}) AS n2
  FROM {table}
),
bands AS (
  SELECT id, v, n2,
         unnest([{idx_list}]) AS band_idx,
         unnest([{band_list}]) AS band_val
  FROM e
)"""


def embedding_cosine_pairs_sql(
    table: str,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_planes: int = 64,
    bands: int = 8,
    dim: int = 64,
    max_bucket: int | None = 256,
) -> str:
    ctes = _bands_cte_sql(table, id_col, vec_col, n_planes, bands, dim)
    if max_bucket is not None:
        capped = f"""
capped AS (
  SELECT id, band_idx, band_val FROM (
    SELECT id, band_idx, band_val,
           ROW_NUMBER() OVER (
             PARTITION BY band_idx, band_val
             ORDER BY md5(CAST(id AS VARCHAR)), id
           ) AS rk
    FROM bands
  ) WHERE rk <= {max_bucket}
),"""
    else:
        capped = """
capped AS (
  SELECT id, band_idx, band_val FROM bands
),"""
    return f"""
WITH {ctes},{capped}
cand AS (
  SELECT DISTINCT a.id AS a_id, b.id AS b_id
  FROM capped a JOIN capped b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.id < b.id
)
SELECT c.a_id, c.b_id,
       list_dot_product(ea.v, eb.v) / (sqrt(ea.n2) * sqrt(eb.n2)) AS cosine
FROM cand c JOIN e ea ON ea.id = c.a_id JOIN e eb ON eb.id = c.b_id
WHERE list_dot_product(ea.v, eb.v) / (sqrt(ea.n2) * sqrt(eb.n2)) >= {threshold}
"""


def lsh_bucket_truncation_report(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int = 64,
    bands: int = 8,
    dim: int = 64,
    max_bucket: int = 256,
) -> DataFrame:
    """The loud half of the :func:`embedding_cosine_pairs` bound: one
    row per OVERSIZED LSH bucket (member count > ``max_bucket``) with
    its true occupancy and the candidate-pair count the cap discards —
    run it alongside a capped pair search so truncation is an audited,
    quantified decision instead of a silent recall loss (the
    co-occurrence-cap discipline, applied to the LSH path).

    Scale shape: one map-combinable count per (band_idx, band_val)
    and a scan-side filter — no self-join, safe at any skew.  Returns
    (band_idx, band_val, n_members, n_pairs_true, n_pairs_kept,
    n_pairs_dropped) sorted by n_members desc (tie: band_idx,
    band_val) — bounded output: only buckets past the cap.
    """
    planes = hyperplanes(dim, n_planes)
    bd = rp_lsh_bands(df, id_col, vec_col, planes, bands)
    cap = F.lit(max_bucket).cast("bigint")
    n = F.col("n_members")
    return (
        bd.groupBy("band_idx", "band_val")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .filter(n > cap)
        .select(
            "band_idx",
            "band_val",
            "n_members",
            (n * (n - 1) / 2).cast("bigint").alias("n_pairs_true"),
            (cap * (cap - 1) / 2).cast("bigint").alias("n_pairs_kept"),
            (n * (n - 1) / 2 - cap * (cap - 1) / 2)
            .cast("bigint")
            .alias("n_pairs_dropped"),
        )
        .orderBy(F.col("n_members").desc(), "band_idx", "band_val")
    )


def lsh_ann_topk_sql(
    table: str,
    id_col: str,
    vec_col: str,
    probe_filter: str,
    k: int = 5,
    n_planes: int = 64,
    bands: int = 8,
    dim: int = 64,
) -> str:
    """``probe_filter`` must be written against ``p.id`` — the banded
    id alias (e.g. ``"p.id % 50 = 0"``)."""
    ctes = _bands_cte_sql(table, id_col, vec_col, n_planes, bands, dim)
    return f"""
WITH {ctes},
cand AS (
  SELECT DISTINCT p.id AS probe_id, c.id AS neighbor_id
  FROM bands p JOIN bands c
    ON p.band_idx = c.band_idx AND p.band_val = c.band_val AND p.id != c.id
  WHERE {probe_filter}
),
scored AS (
  SELECT cd.probe_id, cd.neighbor_id,
         list_dot_product(ec.v, ep.v) / (sqrt(ep.n2) * sqrt(ec.n2)) AS cosine
  FROM cand cd JOIN e ep ON ep.id = cd.probe_id JOIN e ec ON ec.id = cd.neighbor_id
)
SELECT probe_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cosine
FROM (
  SELECT probe_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY probe_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) t
WHERE rank <= {k}
"""


def cosine_topk_sql(
    table: str,
    id_col: str,
    vec_col: str,
    probe_filter: str,
    k: int = 5,
) -> str:
    """DuckDB oracle twin (``list_dot_product`` accumulates in the
    same order as the Spark fold — bit-identical doubles).

    ``probe_filter`` must be fully qualified against alias ``p``,
    e.g. ``"p.vec_id % 50 = 0"``."""
    vd = f"list_transform({vec_col}, x -> CAST(x AS DOUBLE))"
    return f"""
WITH e AS (
  SELECT {id_col}, {vd} AS v,
         list_dot_product({vd}, {vd}) AS norm2
  FROM {table}
),
scored AS (
  SELECT p.{id_col} AS probe_id, c.{id_col} AS neighbor_id,
         list_dot_product(c.v, p.v) / (sqrt(p.norm2) * sqrt(c.norm2)) AS cosine
  FROM e c, e p
  WHERE c.{id_col} != p.{id_col}
    AND p.{id_col} IN (SELECT {id_col} FROM {table} p WHERE {probe_filter})
)
SELECT probe_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cosine
FROM (
  SELECT probe_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY probe_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) t
WHERE rank <= {k}
"""


# ------------------------------------------------- centroids / outliers


def label_centroids(
    df: DataFrame, vec_col: str, label_col: str
) -> DataFrame:
    """Per-label centroid of an embedding column: ``(label,
    centroid array<double>)``.

    Plan: posexplode to (label, pos, val) — a narrow dim-fold fan-out
    — then one aggregation on (label, pos) whose map-side partial agg
    collapses each partition's rows to |labels|·dim cells before the
    shuffle, then a per-label array rebuild (sorted by position).

    Determinism: values are floor-quantized to 1e-8 resolution and
    summed as exact integers (DECIMAL(38,0) — order-independent, and
    unlike a direct double→DECIMAL(38,10) cast there is no rounding
    step, hence no half-tie whose direction engines disagree on);
    the mean is then two double divisions, identical everywhere.
    """
    per_dim = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    ).withColumn("val", F.col("val").cast("double"))
    scaled = F.floor(F.col("val") * F.lit(1e8)).cast("decimal(38,0)")
    cells = per_dim.groupBy("label", "pos").agg(
        (
            F.sum(scaled).cast("double") / F.count("val") / F.lit(1e8)
        ).alias("cval")
    )
    return cells.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cval"))),
            lambda s: s["cval"],
        ).alias("centroid")
    )


def centroid_outliers(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 5,
) -> DataFrame:
    """Top-k farthest vectors from their own label centroid (squared
    L2) — the standard per-cluster anomaly/mislabeled-example scan.

    The centroid table is |labels| rows — broadcast — so the corpus
    streams through one scan; the only wide exchange is the per-label
    top-k window. Distance = dot(diff, diff) with the same
    left-to-right fold as the DuckDB oracle's ``list_dot_product``.
    """
    cents = label_centroids(df, vec_col, label_col)
    j = df.select(
        F.col(id_col), F.col(label_col).alias("label"), F.col(vec_col).alias("__v")
    ).join(F.broadcast(cents), "label")
    diff = F.zip_with(
        F.col("__v"), F.col("centroid"), lambda x, y: x.cast("double") - y
    )
    w = Window.partitionBy("label").orderBy(F.desc("dist2"), F.asc(id_col))
    return (
        j.withColumn("dist2", dot_product(diff, diff))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("label", id_col, "dist2", "rank")
    )


def centroid_outliers_sql(
    table: str, id_col: str, vec_col: str, label_col: str, dim: int, k: int = 5
) -> str:
    avg = (
        "CAST(CAST(SUM(CAST(floor(val * 1e8) AS DECIMAL(38,0))) AS VARCHAR)"
        " AS DOUBLE) / COUNT(val) / 1e8 AS cval"
    )
    return f"""
WITH per_dim AS (
  SELECT {label_col} AS label, g.i AS pos,
         CAST(list_extract({vec_col}, g.i) AS DOUBLE) AS val
  FROM {table}, LATERAL UNNEST(generate_series(1, {dim})) AS g(i)
),
cells AS (
  SELECT label, pos, {avg} FROM per_dim GROUP BY label, pos
),
cent AS (
  SELECT label, list(cval ORDER BY pos) AS centroid FROM cells GROUP BY label
),
diffs AS (
  SELECT e.{id_col}, e.{label_col} AS label,
         list_transform(generate_series(1, {dim}),
           i -> CAST(list_extract(e.{vec_col}, i) AS DOUBLE)
                - list_extract(c.centroid, i)) AS diff
  FROM {table} e JOIN cent c ON e.{label_col} = c.label
),
scored AS (
  SELECT {id_col}, label, list_dot_product(diff, diff) AS dist2 FROM diffs
)
SELECT label, {id_col}, dist2, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY label
              ORDER BY dist2 DESC, {id_col} ASC) AS BIGINT) AS rank
  FROM scored
) t WHERE rank <= {k}
"""


# ----------------------------------------------- scalar quantization


def quantize_report(df: DataFrame, vec_col: str) -> DataFrame:
    """Per-dimension int8 symmetric scalar quantization report: for
    each embedding dimension, the corpus-wide max |x| (the scale
    anchor), and the mean absolute reconstruction error of
    ``code = ⌊x · 127 / maxabs⌋`` — the calibration pass you run
    before shipping a quantized ANN index, telling you which
    dimensions lose precision.

    Shape: one ``posexplode`` flattens vectors to (dim, value) — a
    narrow scan-side op — then two keyed aggregations over |dims| ≪ n
    groups (max, then the error fold), with the per-dim scale attached
    back by broadcast. All arithmetic is IEEE double with floor (not
    round, whose half-case tie rules differ between engines) and the
    error mean goes through DECIMAL(38,10), so the report is
    bit-deterministic at any parallelism.

    Output: ``(dim, n, maxabs, mean_abs_err)``.
    """
    flat = df.select(
        F.posexplode(vec_col).alias("dim", "x")
    ).select("dim", F.col("x").cast("double").alias("x"))
    scales = flat.groupBy("dim").agg(F.max(F.abs(F.col("x"))).alias("maxabs"))
    code = F.floor(F.col("x") * F.lit(127.0) / F.col("maxabs"))
    recon = code.cast("double") * F.col("maxabs") / F.lit(127.0)
    err = F.when(F.col("maxabs") > 0.0, F.abs(F.col("x") - recon)).otherwise(F.lit(0.0))
    return (
        flat.join(F.broadcast(scales), "dim")
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("maxabs").alias("maxabs"),
            (
                F.sum(err.cast("decimal(38,10)")).cast("double") / F.count(F.lit(1))
            ).alias("mean_abs_err"),
        )
        .orderBy("dim")
    )


def quantize_report_sql(table_sql: str, vec_col: str) -> str:
    """DuckDB oracle twin of :func:`quantize_report` (0-based dims via
    generate_series + 1-based list indexing — DuckDB 1.0 has no UNNEST
    WITH ORDINALITY; VARCHAR-routed decimal→double)."""
    return f"""
WITH flat AS (
  SELECT CAST(ord - 1 AS INTEGER) AS dim, CAST({vec_col}[ord] AS DOUBLE) AS x
  FROM ({table_sql}),
       LATERAL (SELECT UNNEST(generate_series(1, len({vec_col}))) AS ord)
),
scales AS (SELECT dim, MAX(abs(x)) AS maxabs FROM flat GROUP BY dim)
SELECT f.dim, COUNT(*) AS n, MAX(s.maxabs) AS maxabs,
       CAST(CAST(SUM(CAST(
         CASE WHEN s.maxabs > 0.0
              THEN abs(f.x - floor(f.x * 127.0 / s.maxabs) * s.maxabs / 127.0)
              ELSE 0.0 END AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) / COUNT(*)
         AS mean_abs_err
FROM flat f JOIN scales s USING (dim)
GROUP BY f.dim ORDER BY f.dim
"""


def pq_adc_topk(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    probe_pred: Column,
    k: int = 5,
    m: int = 4,
    ksub: int = 8,
    dim: int = 64,
    max_probe_batch: int | None = None,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (ADC): vectors compress to ``m`` codebook ids (here 4×3 bits ≈
    12 bits vs 64×32-bit floats — the memory ratio that lets a 100 TB
    corpus's index live in RAM); probes score the *compressed* codes
    through a per-probe lookup table, never touching raw corpus
    vectors.

    Deterministic codebooks — subspace ``s``'s codewords are the
    sub-slices of the vectors with ``id < ksub`` — so the oracle
    replays the identical index (same stance as ``ivf_ann_topk``;
    production swaps in k-means codebooks without changing any plan).

    Relational shape, per stage: encode = bounded explode (m rows per
    vector) ⋈ broadcast codebook → per-(vector, subspace) argmin
    window → pivot back to one code row per vector. Search = probes ×
    broadcast ADC table (m·ksub rows per probe) joined onto the code
    columns — every join broadcast, the only big operand is the code
    relation itself, scanned once. Distances use the
    ``n2(a) + n2(b) − 2·dot(a,b)`` identity over the same
    left-to-right fold both engines share, summed across subspaces in
    fixed column order — bit-deterministic.

    ``max_probe_batch`` bounds how many probes one invocation scores
    (the lowest ``max_probe_batch`` probe ids, a deterministic
    per-partition top-N — no global sort): ADC scoring is ∝ corpus ×
    probes, so an unbounded probe side that grows WITH the corpus
    turns the scan quadratic.  Callers mining more probes than the
    cap run successive batches — the production serving pattern — and
    each batch's cost stays linear in the corpus.

    Output: ``(probe_id, neighbor_id, rank, dist2)`` (ADC estimate of
    squared L2, ascending)."""
    sub = dim // m

    def sub_slice(col: Column, s: int) -> Column:
        return F.slice(col, s * sub + 1, sub)

    e = corpus.select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
    # subspace-exploded corpus: (id, s, sub_v)
    subs = e.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(s).alias("s"), sub_slice(F.col("__v"), s).alias("sv"))
                    for s in range(m)
                ]
            )
        ).alias("p"),
    ).select("__id", F.col("p.s").alias("s"), F.col("p.sv").alias("sv"))
    # the m·ksub-row codebook is broadcast into the assignment join,
    # the probe ADC table, and (via adt) m search joins — truncate it
    # once instead of replaying the corpus explode per reference
    # (guide SS3.3; the plan held 34 parquet scans before)
    cb = subs.filter(F.col("__id") < ksub).select(
        F.col("s").alias("cs"), F.col("__id").alias("cid"), F.col("sv").alias("cv")
    ).localCheckpoint(eager=False)
    d2 = (
        dot_product(F.col("sv"), F.col("sv"))
        + dot_product(F.col("cv"), F.col("cv"))
        - 2 * dot_product(F.col("sv"), F.col("cv"))
    )
    wa = Window.partitionBy("__id", "s").orderBy(F.asc("__d2"), F.asc("cid"))
    assigned = (
        subs.join(F.broadcast(cb), F.col("s") == F.col("cs"))
        .withColumn("__d2", d2)
        .withColumn("__rn", F.row_number().over(wa))
        .filter(F.col("__rn") == 1)
        .select("__id", "s", "cid")
    )
    codes = assigned.groupBy("__id").agg(
        *[
            F.max(F.when(F.col("s") == s, F.col("cid"))).alias(f"c{s}")
            for s in range(m)
        ]
    )
    # per-probe ADC lookup table: dist from probe's sub-vector to every codeword
    probe_ids = e.filter(probe_pred).select(F.col("__id").alias("__pid"))
    if max_probe_batch is not None:
        # Deterministic bounded slice: TakeOrderedAndProject (per-
        # partition top-N + driver merge), not a single-partition
        # global sort.
        probe_ids = probe_ids.orderBy(F.asc("__pid")).limit(max_probe_batch)
    probes = subs.join(
        probe_ids,
        F.col("__id") == F.col("__pid"),
    ).select(F.col("__pid").alias("pid"), F.col("s").alias("ps"), F.col("sv").alias("pv"))
    adt = (
        probes.join(F.broadcast(cb), F.col("ps") == F.col("cs"))
        .withColumn(
            "d",
            dot_product(F.col("pv"), F.col("pv"))
            + dot_product(F.col("cv"), F.col("cv"))
            - 2 * dot_product(F.col("pv"), F.col("cv")),
        )
        .select("pid", "ps", "cid", "d")
        # bounded: |probes|·m·ksub rows, broadcast m+1 times below
        .localCheckpoint(eager=False)
    )
    scored = codes.crossJoin(
        F.broadcast(adt.select("pid").distinct())
    )
    for s in range(m):
        a_s = adt.filter(F.col("ps") == s).select(
            F.col("pid").alias(f"__p{s}"),
            F.col("cid").alias(f"__cc{s}"),
            F.col("d").alias(f"d{s}"),
        )
        scored = scored.join(
            F.broadcast(a_s),
            (F.col("pid") == F.col(f"__p{s}")) & (F.col(f"c{s}") == F.col(f"__cc{s}")),
        )
    score = F.col("d0")
    for s in range(1, m):
        score = score + F.col(f"d{s}")
    w = Window.partitionBy("pid").orderBy(F.asc("dist2"), F.asc("__id"))
    return (
        scored.withColumn("dist2", score)
        .filter(F.col("__id") != F.col("pid"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("pid").alias("probe_id"),
            F.col("__id").alias("neighbor_id"),
            "rank",
            "dist2",
        )
    )


def pq_adc_topk_sql(
    table: str,
    id_col: str,
    vec_col: str,
    probe_filter: str,
    k: int = 5,
    m: int = 4,
    ksub: int = 8,
    dim: int = 64,
    max_probe_batch: int | None = None,
) -> str:
    """DuckDB oracle twin of :func:`pq_adc_topk` (identical
    deterministic codebooks and expression shapes). ``probe_filter``
    is qualified against alias ``e`` — e.g. ``"e.id % 50 = 0"``."""
    sub = dim // m
    cap = (
        f" ORDER BY id ASC LIMIT {int(max_probe_batch)}"
        if max_probe_batch is not None
        else ""
    )
    vd = f"list_transform({vec_col}, x -> CAST(x AS DOUBLE))"
    sub_rows = " UNION ALL ".join(
        f"SELECT id, {s} AS s, list_slice(v, {s * sub + 1}, {(s + 1) * sub}) AS sv FROM e"
        for s in range(m)
    )
    code_cols = ", ".join(
        f"MAX(CASE WHEN s = {s} THEN cid END) AS c{s}" for s in range(m)
    )
    adt_joins = "\n  ".join(
        f"JOIN adt a{s} ON a{s}.pid = p.pid AND a{s}.ps = {s} AND a{s}.cid = c.c{s}"
        for s in range(m)
    )
    score = " + ".join(f"a{s}.d" for s in range(m))
    return f"""
WITH e AS (SELECT {id_col} AS id, {vd} AS v FROM {table}),
subs AS ({sub_rows}),
cb AS (SELECT s AS cs, id AS cid, sv AS cv FROM subs WHERE id < {ksub}),
assigned AS (
  SELECT id, s, cid FROM (
    SELECT subs.id, subs.s, cb.cid,
           ROW_NUMBER() OVER (
             PARTITION BY subs.id, subs.s
             ORDER BY (list_dot_product(subs.sv, subs.sv)
                       + list_dot_product(cb.cv, cb.cv))
                      - 2 * list_dot_product(subs.sv, cb.cv) ASC,
                      cb.cid ASC) AS rn
    FROM subs JOIN cb ON subs.s = cb.cs) t
  WHERE rn = 1
),
codes AS (SELECT id, {code_cols} FROM assigned GROUP BY id),
probe_ids AS (SELECT id AS pid FROM e WHERE {probe_filter}{cap}),
adt AS (
  SELECT subs.id AS pid, subs.s AS ps, cb.cid,
         (list_dot_product(subs.sv, subs.sv) + list_dot_product(cb.cv, cb.cv))
         - 2 * list_dot_product(subs.sv, cb.cv) AS d
  FROM subs JOIN probe_ids ON subs.id = probe_ids.pid
  JOIN cb ON subs.s = cb.cs
),
scored AS (
  SELECT p.pid, c.id, {score} AS dist2
  FROM codes c
  CROSS JOIN probe_ids p
  {adt_joins}
  WHERE c.id != p.pid
)
SELECT pid AS probe_id, id AS neighbor_id, CAST(rank AS INTEGER) AS rank, dist2
FROM (
  SELECT pid, id, dist2,
         ROW_NUMBER() OVER (PARTITION BY pid ORDER BY dist2 ASC, id ASC) AS rank
  FROM scored
) t
WHERE rank <= {k}
"""


def kmeans_refine(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iterations: int = 2,
) -> DataFrame:
    """K-means Lloyd refinement as a relational program — the codebook
    trainer that upgrades the deterministic seeds `ivf_ann_topk` /
    `pq_adc_topk` start from: seed centroids are the vectors with
    ``id < k``, then each iteration assigns every vector to its
    nearest centroid (squared-L2 via the n2+cn2−2·dot identity,
    centroid-id tiebreak) and recomputes per-dimension centroid means.

    Engine-exact iteration: assignments compare bit-identical dots;
    the new means go through the decimal-sum convention (exact,
    order-independent) with one double division — so even after
    ``iterations`` rounds both engines hold bit-equal centroids.

    Scale shape per iteration: one broadcast of k centroid rows, one
    argmin window per vector, one (cid, dim) aggregate (bounded by
    k·dim rows out). The corpus is scanned ``iterations + 1`` times —
    cache/checkpoint it in production.

    Output: ``(cid, n_assigned, centroid: array<double>)``."""
    e = corpus.select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
    cents = e.filter(F.col("__id") < k).select(
        F.col("__id").alias("cid"), F.col("__v").alias("cv")
    )

    def assign(centroids: DataFrame) -> DataFrame:
        d2 = (
            dot_product(F.col("__v"), F.col("__v"))
            + dot_product(F.col("cv"), F.col("cv"))
            - 2 * dot_product(F.col("__v"), F.col("cv"))
        )
        # argmin via lexicographic struct-min — identical (d2 ASC, cid
        # ASC) tie semantics as a row_number window, but map-side
        # combinable: the shuffle carries one partially-reduced row per
        # (partition, vector) instead of sorting the k-times-expanded
        # join output.
        return (
            e.crossJoin(F.broadcast(centroids))
            .withColumn("__d2", d2)
            .groupBy("__id")
            .agg(
                F.min(F.struct("__d2", "cid")).alias("__m"),
                F.first("__v").alias("__v"),
            )
            .select("__id", "__v", F.col("__m.cid").alias("cid"))
        )

    # Mean of full-precision doubles: the decimal(38,10) sum convention
    # would round at 1e-10 (engines round the cast differently there),
    # so instead fold the values in CANONICAL (sorted) order — both
    # engines then run the identical IEEE addition sequence.
    sorted_fold = F.aggregate(
        F.array_sort(F.collect_list(F.col("val"))),
        F.lit(0.0),
        lambda a, x: a + x,
    )

    for _ in range(iterations):
        assigned = assign(cents)
        dims = assigned.select(
            "cid", F.posexplode(F.col("__v")).alias("dim", "val")
        )
        means = dims.groupBy("cid", "dim").agg(
            (sorted_fold / F.count("val")).alias("m")
        )
        cents = means.groupBy("cid").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim, m))), p -> p.m)"
            ).alias("cv")
        # truncate the k-row centroid frame per iteration: the final
        # assign AND the closing join both reference `cents`, which
        # otherwise replays every earlier iteration's corpus pass per
        # reference (guide SS3.3; k rows — negligible storage)
        ).localCheckpoint(eager=False)

    final = assign(cents)
    counts = final.groupBy("cid").agg(F.count(F.lit(1)).alias("n_assigned"))
    return (
        counts.join(cents, "cid")
        .select("cid", "n_assigned", F.col("cv").alias("centroid"))
    )


def kmeans_refine_sql(
    table: str,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iterations: int = 2,
) -> str:
    """DuckDB oracle twin of :func:`kmeans_refine` (iterations
    unrolled as CTE chains; identical decimal-mean convention)."""
    vd = f"list_transform({vec_col}, x -> CAST(x AS DOUBLE))"
    # canonical-order fold (see kmeans_refine): sort, then left fold
    dec_mean = (
        "list_reduce(list_sort(list(val)), (a, b) -> a + b) / COUNT(val)"
    )
    ctes = [
        f"e AS (SELECT {id_col} AS id, {vd} AS v FROM {table})",
        f"c0 AS (SELECT id AS cid, v AS cv FROM e WHERE id < {k})",
    ]
    for it in range(1, iterations + 1):
        p = it - 1
        ctes.append(
            f"""a{it} AS (
  SELECT id, v, cid FROM (
    SELECT e.id, e.v, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY
             (list_dot_product(e.v, e.v) + list_dot_product(c.cv, c.cv))
             - 2 * list_dot_product(e.v, c.cv) ASC, c.cid ASC) AS rn
    FROM e CROSS JOIN c{p} c) t
  WHERE rn = 1
),
m{it} AS (
  SELECT cid, g.d - 1 AS dim, {dec_mean.replace('val', 'v[g.d]')} AS m
  FROM a{it}, LATERAL UNNEST(generate_series(1, len(v))) AS g(d)
  GROUP BY cid, g.d
),
c{it} AS (
  SELECT cid, list(m ORDER BY dim) AS cv FROM m{it} GROUP BY cid
)"""
        )
    last = iterations
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
fin AS (
  SELECT id, cid FROM (
    SELECT e.id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY
             (list_dot_product(e.v, e.v) + list_dot_product(c.cv, c.cv))
             - 2 * list_dot_product(e.v, c.cv) ASC, c.cid ASC) AS rn
    FROM e CROSS JOIN c{last} c) t
  WHERE rn = 1
)
SELECT fin.cid, COUNT(*) AS n_assigned, MAX(c{last}.cv) AS centroid
FROM fin JOIN c{last} ON fin.cid = c{last}.cid
GROUP BY fin.cid"""
    )


# -------------------------------------------- PQ shortlist + re-rank


def pq_rerank_topk(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    probe_pred: Column,
    k: int = 5,
    shortlist: int = 20,
    m: int = 4,
    ksub: int = 8,
    dim: int = 64,
    max_probe_batch: int | None = 128,
) -> DataFrame:
    """Two-stage retrieval — the production ANN serving pattern: the
    compressed PQ-ADC index nominates a ``shortlist`` of candidates
    per probe (RAM-resident codes, never touching raw vectors), then
    ONLY those ``shortlist × probes`` pairs fetch their raw vectors
    for an exact squared-L2 re-rank to the final ``k``.  Recall comes
    from the shortlist width, precision from the exact stage, and the
    raw-vector I/O is proportional to the shortlist — not the corpus —
    which is the whole economics of a 100 TB embedding store.

    Relational shape: stage 1 is :func:`pq_adc_topk` (all joins
    broadcast, codes scanned once); stage 2 is two id-equi-joins of
    the (probes × shortlist) pair relation against the vector table
    and a per-probe window over ≤ ``shortlist`` rows.

    ``max_probe_batch`` (default 128) is the stage-1 probe-slice cap:
    the probe side of an ANN service grows with the corpus, and an
    uncapped batch makes ADC scoring quadratic at scale — the cap
    keeps one invocation's cost linear in the corpus, and a larger
    probe population mines in successive batches (the contract lives
    in the signature, not in ops prose; the 8× scaling probe pinned
    the uncapped drift at 1.03× linear).  The cap selects the LOWEST
    probe ids, deterministically, so the oracle twin replays the same
    slice.

    Output: ``(probe_id, neighbor_id, rank, dist2, dist2_adc)`` —
    exact distance plus the stage-1 estimate, so the calibration gap
    of the quantizer is visible in the result itself.
    """
    coarse = pq_adc_topk(
        corpus, id_col, vec_col, probe_pred, k=shortlist, m=m, ksub=ksub,
        dim=dim, max_probe_batch=max_probe_batch,
    ).select("probe_id", "neighbor_id", F.col("dist2").alias("dist2_adc"))
    vecs = corpus.select(
        F.col(id_col).alias("__vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__vv"),
    )
    paired = (
        coarse.join(
            vecs.select(
                F.col("__vid").alias("__pidv"), F.col("__vv").alias("__pv")
            ),
            F.col("probe_id") == F.col("__pidv"),
        )
        .join(
            vecs.select(
                F.col("__vid").alias("__nidv"), F.col("__vv").alias("__nv")
            ),
            F.col("neighbor_id") == F.col("__nidv"),
        )
    )
    exact = (
        dot_product(F.col("__pv"), F.col("__pv"))
        + dot_product(F.col("__nv"), F.col("__nv"))
        - 2 * dot_product(F.col("__pv"), F.col("__nv"))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.asc("dist2"), F.asc("neighbor_id")
    )
    return (
        paired.withColumn("dist2", exact)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank", "dist2", "dist2_adc")
    )


def pq_rerank_topk_sql(
    table: str,
    id_col: str,
    vec_col: str,
    probe_filter: str,
    k: int = 5,
    shortlist: int = 20,
    m: int = 4,
    ksub: int = 8,
    dim: int = 64,
    max_probe_batch: int | None = 128,
) -> str:
    coarse = pq_adc_topk_sql(
        table, id_col, vec_col, probe_filter, k=shortlist, m=m, ksub=ksub,
        dim=dim, max_probe_batch=max_probe_batch,
    )
    vd = f"list_transform({vec_col}, x -> CAST(x AS DOUBLE))"
    return f"""
WITH coarse AS ({coarse}),
vx AS (SELECT {id_col} AS vid, {vd} AS vv FROM {table})
SELECT probe_id, neighbor_id, CAST(rank AS INTEGER) AS rank, dist2, dist2_adc
FROM (
  SELECT c.probe_id, c.neighbor_id, c.dist2 AS dist2_adc,
         (list_dot_product(p.vv, p.vv) + list_dot_product(n.vv, n.vv))
         - 2 * list_dot_product(p.vv, n.vv) AS dist2,
         ROW_NUMBER() OVER (
           PARTITION BY c.probe_id
           ORDER BY (list_dot_product(p.vv, p.vv) + list_dot_product(n.vv, n.vv))
                    - 2 * list_dot_product(p.vv, n.vv) ASC,
                    c.neighbor_id ASC) AS rank
  FROM coarse c
  JOIN vx p ON p.vid = c.probe_id
  JOIN vx n ON n.vid = c.neighbor_id
) t
WHERE rank <= {k}
"""


# ---------------------------------------------------- bitext mining


def bitext_mining_top1(
    emb: DataFrame,
    meta: DataFrame,
    id_col: str,
    vec_col: str,
    meta_id_col: str,
    lang_col: str,
    src_lang: str,
    tgt_lang: str,
    probe_mod: int = 10,
) -> DataFrame:
    """Cross-lingual sentence/document alignment (bitext mining, the
    margin-based criterion of Artetxe & Schwenk): for each sampled
    source-language probe, the best target-language neighbor by
    cosine plus the MARGIN ``cos1/cos2`` (best over runner-up) — the
    standard confidence score that filters false alignments before a
    translation corpus admits a pair.

    Engine-exact: cosines use the sequential left-to-right dot-product
    fold (bit-equal to ``list_dot_product``), the margin is one IEEE
    division of two such values.

    Scale: the corpus side is ONLY the target language's vectors (a
    scan-side filter); probes broadcast (sampled by ``probe_mod``, the
    same guard convention as the brute-force baseline — the LSH/IVF
    bucketed variants apply unchanged when the probe side grows).

    Returns (probe_id, best_id, cos1, cos2, margin).
    """
    langs = meta.select(
        F.col(meta_id_col).alias("__mid"), F.col(lang_col).alias("__lang")
    )
    tagged = emb.join(
        langs, emb[id_col] == F.col("__mid")
    ).select(id_col, vec_col, "__lang")
    corpus = tagged.filter(F.col("__lang") == tgt_lang)
    probes = tagged.filter(
        (F.col("__lang") == src_lang) & (F.col(id_col) % probe_mod == 0)
    )
    top2 = cosine_topk(corpus, probes, id_col, vec_col, k=2)
    return (
        top2.groupBy("probe_id")
        .agg(
            F.min(F.when(F.col("rank") == 1, F.col("neighbor_id"))).alias(
                "best_id"
            ),
            F.min(F.when(F.col("rank") == 1, F.col("cosine"))).alias("cos1"),
            F.min(F.when(F.col("rank") == 2, F.col("cosine"))).alias("cos2"),
        )
        .filter(F.col("cos2").isNotNull())
        .select(
            "probe_id",
            "best_id",
            "cos1",
            "cos2",
            (F.col("cos1") / F.col("cos2")).alias("margin"),
        )
    )


def bitext_mining_top1_sql(
    emb_table: str,
    meta_table: str,
    id_col: str,
    vec_col: str,
    meta_id_col: str,
    lang_col: str,
    src_lang: str,
    tgt_lang: str,
    probe_mod: int = 10,
) -> str:
    vd = f"list_transform({vec_col}, x -> CAST(x AS DOUBLE))"
    return f"""
WITH tagged AS (
  SELECT e.{id_col}, {vd} AS v,
         list_dot_product({vd}, {vd}) AS norm2, m.{lang_col} AS lang
  FROM {emb_table} e JOIN {meta_table} m ON e.{id_col} = m.{meta_id_col}
),
scored AS (
  SELECT p.{id_col} AS probe_id, c.{id_col} AS neighbor_id,
         list_dot_product(c.v, p.v) / (sqrt(p.norm2) * sqrt(c.norm2)) AS cosine
  FROM tagged c, tagged p
  WHERE c.lang = '{tgt_lang}' AND p.lang = '{src_lang}'
    AND p.{id_col} % {probe_mod} = 0 AND c.{id_col} != p.{id_col}
),
ranked AS (
  SELECT probe_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY probe_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
),
piv AS (
  SELECT probe_id,
         MIN(CASE WHEN rank = 1 THEN neighbor_id END) AS best_id,
         MIN(CASE WHEN rank = 1 THEN cosine END) AS cos1,
         MIN(CASE WHEN rank = 2 THEN cosine END) AS cos2
  FROM ranked WHERE rank <= 2 GROUP BY probe_id
)
SELECT probe_id, best_id, cos1, cos2, cos1 / cos2 AS margin
FROM piv WHERE cos2 IS NOT NULL
"""


def bitext_mining_top1_lsh(
    emb: DataFrame,
    meta: DataFrame,
    id_col: str,
    vec_col: str,
    meta_id_col: str,
    lang_col: str,
    src_lang: str,
    tgt_lang: str,
    n_planes: int = 64,
    bands: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Bucketed bitext mining — the FULL-CORPUS scale path for the
    margin criterion of :func:`bitext_mining_top1`: every
    source-language row is a probe (no ``probe_mod`` sampling), and
    candidate generation is the sign-LSH band join of
    :func:`lsh_ann_topk` instead of a broadcast brute-force scan, so
    probe-side growth costs a bucket join, not probes × corpus
    cosines.

    Per probe: exact cosine over the same-band target-language
    candidates, top-2 by (cosine DESC, id ASC), margin = cos1/cos2;
    probes with fewer than two same-band target candidates drop (the
    brute-force operator's ``cos2 IS NOT NULL`` rule applied to the
    bucketed candidate set).

    Scale: band signatures are one vectorized Arrow pass over the
    tagged corpus; the candidate join is an equi-join on
    (band_idx, band_val) restricted scan-side to src-lang probes and
    tgt-lang candidates; exact scoring touches only candidate pairs.
    This is the composition the brute-force docstring promised — with
    LSH recall semantics: a true best pair sharing no band is missed,
    the standard ANN trade (recall rises with ``bands``).

    Returns (probe_id, best_id, cos1, cos2, margin).
    """
    langs = meta.select(
        F.col(meta_id_col).alias("__mid"), F.col(lang_col).alias("__lang")
    )
    tagged = emb.join(langs, emb[id_col] == F.col("__mid")).select(
        id_col, vec_col, "__lang"
    )
    planes = hyperplanes(dim, n_planes)
    bd = rp_lsh_bands(tagged, id_col, vec_col, planes, bands)
    ids = tagged.select(F.col(id_col).alias("__id"), "__lang")
    # the tagged+banded relation feeds BOTH language legs — truncate
    # the hyperplane projection + language join once (guide §3.3)
    from gis_city_county_spark.operators.scale import (
        _materialize_for_multipass,
    )

    thin = _materialize_for_multipass(bd.join(ids, "__id"))
    probes = thin.filter(F.col("__lang") == src_lang).select(
        F.col("__id").alias("probe_id"), "band_idx", "band_val"
    )
    cand = thin.filter(F.col("__lang") == tgt_lang).select(
        F.col("__id").alias("neighbor_id"), "band_idx", "band_val"
    )
    pairs = (
        probes.join(cand, ["band_idx", "band_val"])
        .select("probe_id", "neighbor_id")
        .dropDuplicates(["probe_id", "neighbor_id"])
    )
    vecs = emb.select(
        F.col(id_col).alias("__vid"),
        F.col(vec_col).alias("__v"),
        dot_product(F.col(vec_col), F.col(vec_col)).alias("__n2"),
    )
    pv = vecs.select(
        F.col("__vid").alias("probe_id"), F.col("__v").alias("p_v"),
        F.col("__n2").alias("p_n2"),
    )
    cv = vecs.select(
        F.col("__vid").alias("neighbor_id"), F.col("__v").alias("c_v"),
        F.col("__n2").alias("c_n2"),
    )
    cos = dot_product(F.col("c_v"), F.col("p_v")) / (
        F.sqrt("p_n2") * F.sqrt("c_n2")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    top2 = (
        pairs.join(pv, "probe_id")
        .join(cv, "neighbor_id")
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 2)
    )
    return (
        top2.groupBy("probe_id")
        .agg(
            F.min(F.when(F.col("rank") == 1, F.col("neighbor_id"))).alias(
                "best_id"
            ),
            F.min(F.when(F.col("rank") == 1, F.col("cosine"))).alias("cos1"),
            F.min(F.when(F.col("rank") == 2, F.col("cosine"))).alias("cos2"),
        )
        .filter(F.col("cos2").isNotNull())
        .select(
            "probe_id",
            "best_id",
            "cos1",
            "cos2",
            (F.col("cos1") / F.col("cos2")).alias("margin"),
        )
    )


def bitext_mining_top1_lsh_sql(
    emb_table: str,
    meta_table: str,
    id_col: str,
    vec_col: str,
    meta_id_col: str,
    lang_col: str,
    src_lang: str,
    tgt_lang: str,
    n_planes: int = 64,
    bands: int = 8,
    dim: int = 64,
) -> str:
    """DuckDB twin replaying the identical banding (same hyperplanes,
    same sequential dot-product fold, so band values — and therefore
    the candidate set — are bit-identical to the Spark side)."""
    ctes = _bands_cte_sql(emb_table, id_col, vec_col, n_planes, bands, dim)
    return f"""
WITH {ctes},
lang AS (
  SELECT {meta_id_col} AS mid, {lang_col} AS lng FROM {meta_table}
),
cand AS (
  SELECT DISTINCT p.id AS probe_id, c.id AS neighbor_id
  FROM bands p JOIN bands c
    ON p.band_idx = c.band_idx AND p.band_val = c.band_val
  WHERE p.id IN (SELECT mid FROM lang WHERE lng = '{src_lang}')
    AND c.id IN (SELECT mid FROM lang WHERE lng = '{tgt_lang}')
),
scored AS (
  SELECT cd.probe_id, cd.neighbor_id,
         list_dot_product(ec.v, ep.v) / (sqrt(ep.n2) * sqrt(ec.n2)) AS cosine
  FROM cand cd
  JOIN e ep ON ep.id = cd.probe_id
  JOIN e ec ON ec.id = cd.neighbor_id
),
ranked AS (
  SELECT probe_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY probe_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
),
piv AS (
  SELECT probe_id,
         MIN(CASE WHEN rank = 1 THEN neighbor_id END) AS best_id,
         MIN(CASE WHEN rank = 1 THEN cosine END) AS cos1,
         MIN(CASE WHEN rank = 2 THEN cosine END) AS cos2
  FROM ranked WHERE rank <= 2 GROUP BY probe_id
)
SELECT probe_id, best_id, cos1, cos2, cos1 / cos2 AS margin
FROM piv WHERE cos2 IS NOT NULL
"""


def cosine_pair_histogram(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    probe_fraction: float = 0.05,
    max_probes: int | None = 10_000,
) -> DataFrame:
    """Cosine-similarity DISTRIBUTION over a deterministic pair
    sample — the calibration histogram read before picking a
    near-duplicate cosine threshold or an ANN probe budget (where
    does the corpus's similarity mass actually sit?).

    Pairing: a hash sample of ids (``probe_fraction``) joins the full
    corpus with ``probe_id < corpus_id`` (each unordered pair at most
    once), so work is |corpus|·|probes| — the bounded brute-force
    budget, like :func:`cosine_topk`; the ``max_probes`` guard fails
    loudly if the sample outgrows it.  Cosines use the same
    left-to-right fold as every sim_* op (bit-identical to DuckDB's
    ``list_dot_product``), bucketed by ``floor(cos·1000)`` — floor on
    BOTH engines — into at most 2001 output rows.

    Returns (bucket_milli, n_pairs).
    """
    from gis_city_county_spark.operators.scale import rebalance_for_fanout
    from gis_city_county_spark.operators.sketch import hash_sample

    probes = hash_sample(
        df.select(F.col(id_col), F.col(vec_col)), id_col, probe_fraction
    )
    if max_probes is not None:
        if probes.limit(max_probes + 1).count() > max_probes:
            raise ValueError(
                f"cosine_pair_histogram probe sample exceeds "
                f"max_probes={max_probes}: lower probe_fraction"
            )
    p = with_norm2(probes, vec_col, "__pn").select(
        F.col(id_col).alias("__pid"),
        F.col(vec_col).alias("__pvec"),
        "__pn",
    )
    c = with_norm2(
        rebalance_for_fanout(df.select(id_col, vec_col), multiplier=8.0),
        vec_col,
        "__cn",
    ).select(
        F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cvec"), "__cn"
    )
    pairs = c.join(F.broadcast(p), F.col("__pid") < F.col("__cid"))
    cos = dot_product(F.col("__cvec"), F.col("__pvec")) / (
        F.sqrt("__pn") * F.sqrt("__cn")
    )
    return (
        pairs.select(F.floor(cos * F.lit(1000.0)).cast("long").alias("bucket_milli"))
        .groupBy("bucket_milli")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


def cosine_pair_histogram_sql(
    table: str, id_col: str, vec_col: str, probe_fraction: float = 0.05
) -> str:
    from gis_city_county_spark.operators.sketch import (
        hash_sample_predicate_sql,
    )

    # the e CTE aliases the key to `id`, so build the predicate
    # against that name directly
    pred = hash_sample_predicate_sql("id", probe_fraction)
    vd = f"list_transform({vec_col}, x -> CAST(x AS DOUBLE))"
    return f"""
WITH e AS (
  SELECT {id_col} AS id, {vd} AS v, list_dot_product({vd}, {vd}) AS n2
  FROM ({table})
),
p AS (SELECT * FROM e WHERE {pred}),
scored AS (
  SELECT CAST(FLOOR(list_dot_product(c.v, p.v)
                    / (sqrt(p.n2) * sqrt(c.n2)) * 1000.0) AS BIGINT)
           AS bucket_milli
  FROM e c JOIN p ON p.id < c.id
)
SELECT bucket_milli, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM scored GROUP BY bucket_milli
"""


def centroid_drift(
    df_a: DataFrame, df_b: DataFrame, vec_col: str
) -> DataFrame:
    """Per-dimension embedding-centroid drift between two snapshots —
    the cheap first alarm an embedding-space monitor raises before
    anything expensive (re-clustering, recall audits) runs: if the
    mean vector moved, the encoder, the corpus mix, or the
    normalization changed.

    Determinism is the ``label_centroids`` convention: values
    floor-quantize to 1e-8 and sum as exact DECIMAL(38,0) integers
    (order-independent), so per-dimension sums are exact BIGINTs and
    each mean is two IEEE divisions; ``delta`` is the single double
    subtraction of the two means.  Shuffle is one aggregate keyed on
    dimension index — |dims| cells regardless of corpus size; output
    is |dims| rows.

    Returns (pos, n_a, n_b, sum_q8_a, sum_q8_b, mean_a, mean_b,
    delta) — means NULL for an empty side.
    """
    def _cells(df: DataFrame, tag: str) -> DataFrame:
        per_dim = df.select(
            F.posexplode(F.col(vec_col)).alias("pos", "val")
        ).withColumn("val", F.col("val").cast("double"))
        scaled = F.floor(F.col("val") * F.lit(1e8)).cast("decimal(38,0)")
        return per_dim.groupBy("pos").agg(
            F.count("val").cast("bigint").alias(f"n_{tag}"),
            F.sum(scaled).cast("bigint").alias(f"sum_q8_{tag}"),
        )

    joined = _cells(df_a, "a").join(_cells(df_b, "b"), "pos", "full_outer")
    mean = lambda t: F.when(  # noqa: E731
        F.col(f"n_{t}") > 0,
        F.col(f"sum_q8_{t}").cast("double")
        / F.col(f"n_{t}").cast("double")
        / F.lit(1e8),
    )
    return joined.select(
        F.col("pos").cast("int").alias("pos"),
        F.coalesce("n_a", F.lit(0)).cast("bigint").alias("n_a"),
        F.coalesce("n_b", F.lit(0)).cast("bigint").alias("n_b"),
        F.coalesce("sum_q8_a", F.lit(0)).cast("bigint").alias("sum_q8_a"),
        F.coalesce("sum_q8_b", F.lit(0)).cast("bigint").alias("sum_q8_b"),
        mean("a").alias("mean_a"),
        mean("b").alias("mean_b"),
        (mean("b") - mean("a")).alias("delta"),
    )


def centroid_drift_sql(source_a: str, source_b: str, vec_col: str) -> str:
    def cells(src: str, tag: str) -> str:
        return f"""
  SELECT g.i - 1 AS pos, CAST(COUNT(*) AS BIGINT) AS n_{tag},
         CAST(SUM(CAST(floor(CAST(list_extract({vec_col}, g.i) AS DOUBLE)
                             * 1e8) AS DECIMAL(38,0))) AS BIGINT)
           AS sum_q8_{tag}
  FROM ({src}), LATERAL UNNEST(generate_series(1, len({vec_col}))) AS g(i)
  GROUP BY g.i"""

    mean = lambda t: (  # noqa: E731
        f"CASE WHEN n_{t} > 0 THEN CAST(sum_q8_{t} AS DOUBLE)"
        f" / CAST(n_{t} AS DOUBLE) / 1e8 END"
    )
    return f"""
WITH ca AS ({cells(source_a, 'a')}),
cb AS ({cells(source_b, 'b')}),
j AS (
  SELECT COALESCE(ca.pos, cb.pos) AS pos,
         COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b,
         COALESCE(sum_q8_a, 0) AS sum_q8_a,
         COALESCE(sum_q8_b, 0) AS sum_q8_b
  FROM ca FULL JOIN cb ON ca.pos = cb.pos
)
SELECT CAST(pos AS INTEGER) AS pos, n_a, n_b, sum_q8_a, sum_q8_b,
       {mean('a')} AS mean_a, {mean('b')} AS mean_b,
       ({mean('b')}) - ({mean('a')}) AS delta
FROM j
"""


def norm_histogram(
    df: DataFrame, vec_col: str, band_milli: int = 100
) -> DataFrame:
    """Squared-L2-norm histogram of an embedding column — the
    two-minute sanity gate before any cosine machinery runs: cosine
    scores silently degrade to dot products when vectors arrive
    un-normalized, and the histogram shows it immediately (a unit-norm
    corpus is one spike at band 1000/band_milli).

    Per-vector norm² is the FIXED-ORDER index fold
    ``fold(v, 0.0, (acc, x) -> acc + x·x)`` — the same left-to-right
    chain as DuckDB's ``list_reduce``, so the doubles are bit-equal
    (the tfidf pattern; no reordering aggregation ever touches the
    per-vector value).  Banding floors norm²·1000 into
    ``band_milli``-wide integer bands; output ∝ distinct bands.

    Returns (band, norm2_lo_milli, n_vecs) where band =
    floor(norm2·1000 / band_milli) and norm2_lo_milli = band ·
    band_milli (the band's inclusive lower edge).
    """
    norm2 = F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    band = F.expr(
        f"CAST(floor(__norm2 * 1000) AS BIGINT) div {band_milli}"
    )
    return (
        df.filter(F.col(vec_col).isNotNull())
        .select(norm2.alias("__norm2"))
        .select(band.cast("bigint").alias("band"))
        .groupBy("band")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
        .select(
            "band",
            (F.col("band") * band_milli).cast("bigint").alias("norm2_lo_milli"),
            "n_vecs",
        )
    )


def norm_histogram_sql(
    source_sql: str, vec_col: str, band_milli: int = 100
) -> str:
    norm2 = (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform({vec_col},"
        f" x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b)"
    )
    return f"""
WITH norms AS (
  SELECT {norm2} AS norm2 FROM ({source_sql}) WHERE {vec_col} IS NOT NULL
),
banded AS (
  SELECT CAST(floor(norm2 * 1000) AS BIGINT) // {band_milli} AS band
  FROM norms
)
SELECT CAST(band AS BIGINT) AS band,
       CAST(band * {band_milli} AS BIGINT) AS norm2_lo_milli,
       CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM banded GROUP BY band
"""


def mmr_rerank(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    probe_id: int,
    n_candidates: int = 50,
    k: int = 5,
    lambda_milli: int = 700,
) -> DataFrame:
    """Maximal Marginal Relevance re-rank (Carbonell & Goldstein 1998)
    — the diversity pass a retrieval pipeline runs over its ANN
    shortlist so the final k results aren't k copies of the same
    near-duplicate: greedily pick
    argmax λ·rel(c) − (1−λ)·max_{s∈picked} sim(c, s).

    Two-stage scale shape: stage 1 scores the corpus against the
    1-row broadcast probe (the brute-force baseline shape — swap in
    :func:`lsh_ann_topk` candidates at 100 TB) and keeps the top
    ``n_candidates`` via TakeOrdered.  Stage 2 runs the k greedy
    steps LAZILY on that ≤``n_candidates``-row frame: each step is a
    1-row broadcast of the last pick (its vector rides along — no
    collect), a ``greatest`` fold of the running max-similarity, and
    an (score desc, id asc) argmax.  Work is O(n_candidates·k) dot
    products after the scan — the candidate frame is localCheckpointed
    once so the k-step plan doesn't replay the corpus scan per step.

    All similarity arithmetic is the sequential zip_with/aggregate
    fold (bit-equal to DuckDB's list_dot_product); the MMR score is a
    fixed-order IEEE expression of two doubles and two integer
    literals.  Ties break by id.

    Returns (rank, id, relevance, mmr_score) — k rows, rank 1..k.
    """
    lam = float(lambda_milli) / 1000.0
    probe = (
        with_norm2(
            df.filter(F.col(id_col) == probe_id), vec_col, "__pn2"
        )
        .select(F.col(vec_col).alias("__pv"), "__pn2")
    )
    scored = (
        with_norm2(df.filter(F.col(id_col) != probe_id), vec_col, "__n2")
        .join(F.broadcast(probe))
        .select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("__v"),
            "__n2",
            (
                dot_product(F.col(vec_col), F.col("__pv"))
                / F.sqrt(F.col("__n2") * F.col("__pn2"))
            ).alias("relevance"),
        )
    )
    cand = (
        scored.orderBy(F.col("relevance").desc(), F.col("id").asc())
        .limit(n_candidates)
        .withColumn("__maxsim", F.lit(float("-inf")))
        .localCheckpoint(eager=False)
    )
    picks = []
    remaining = cand
    for step in range(k):
        # Step 1 has no picked set: the (1−λ)·max_sim term is 0.
        score = (
            F.lit(lam) * F.col("relevance")
            - F.lit(1.0 - lam) * F.when(
                F.col("__maxsim") == float("-inf"), F.lit(0.0)
            ).otherwise(F.col("__maxsim"))
        )
        ranked = remaining.withColumn("__score", score).orderBy(
            F.col("__score").desc(), F.col("id").asc()
        )
        pick = ranked.limit(1)
        picks.append(
            pick.select(
                F.lit(step + 1).cast("int").alias("rank"),
                "id",
                "relevance",
                F.col("__score").alias("mmr_score"),
            )
        )
        if step + 1 < k:
            pv = pick.select(
                F.col("id").alias("__pid"),
                F.col("__v").alias("__sv"),
                F.col("__n2").alias("__sn2"),
            )
            remaining = (
                remaining.join(F.broadcast(pv))
                .filter(F.col("id") != F.col("__pid"))
                .select(
                    "id",
                    "__v",
                    "__n2",
                    "relevance",
                    F.greatest(
                        F.col("__maxsim"),
                        dot_product(F.col("__v"), F.col("__sv"))
                        / F.sqrt(F.col("__n2") * F.col("__sn2")),
                    ).alias("__maxsim"),
                )
                # truncate per step: step j's lineage otherwise embeds
                # every earlier step's join, and the k unioned picks
                # replay that pyramid O(k^2) times (the plan held 52
                # BroadcastNestedLoopJoins before; guide SS3.3)
                .localCheckpoint(eager=False)
            )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out


def mmr_rerank_sql(
    table: str,
    id_col: str,
    vec_col: str,
    probe_id: int,
    n_candidates: int = 50,
    k: int = 5,
    lambda_milli: int = 700,
) -> str:
    lam = float(lambda_milli) / 1000.0
    # Spark's zip_with fold promotes each float element to double
    # BEFORE multiplying; DuckDB must do the same or the dot products
    # drift at float32 precision (the _bands_cte_sql convention).
    vd = f"list_transform({vec_col}, x -> CAST(x AS DOUBLE))"
    ctes = [f"""
probe AS (
  SELECT {vd} AS pv, list_dot_product({vd}, {vd}) AS pn2
  FROM {table} WHERE {id_col} = {probe_id}
),
cand0 AS (
  SELECT * FROM (
    SELECT {id_col} AS id, {vd} AS v,
           list_dot_product({vd}, {vd}) AS n2,
           list_dot_product({vd}, pv) / sqrt(
             list_dot_product({vd}, {vd}) * pn2) AS relevance
    FROM {table}, probe WHERE {id_col} != {probe_id}
  )
  ORDER BY relevance DESC, id ASC LIMIT {n_candidates}
)"""]
    prev = "cand0"
    sel_union = []
    for step in range(1, k + 1):
        if step == 1:
            score = f"{lam!r} * relevance"
        else:
            score = f"{lam!r} * relevance - {1.0 - lam!r} * maxsim"
        ctes.append(f"""
s{step} AS (
  SELECT id, v, n2, relevance, {score} AS mmr_score
  FROM {prev} ORDER BY mmr_score DESC, id ASC LIMIT 1
)""")
        sel_union.append(
            f"SELECT {step} AS rank, id, relevance, mmr_score FROM s{step}"
        )
        if step < k:
            ctes.append(f"""
r{step} AS (
  SELECT c.id, c.v, c.n2, c.relevance,
         {"GREATEST(c.maxsim, " if step > 1 else "("}
           list_dot_product(c.v, s.v) / sqrt(c.n2 * s.n2)) AS maxsim
  FROM {prev} c, s{step} s WHERE c.id != s.id
)""")
            prev = f"r{step}"
    return (
        "WITH " + ",".join(ctes) + "\n"
        + "\nUNION ALL\n".join(sel_union)
    )


def lsh_recall_audit(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    probe_mod: int = 50,
    k: int = 5,
    n_planes: int = 64,
    bands: int = 8,
    dim: int = 64,
) -> DataFrame:
    """ANN recall audit — the blocking_recall discipline applied to
    the vector path: on a bounded probe sample, compare
    :func:`lsh_ann_topk`'s answer against the exact brute-force
    cosine top-k and report recall@k in exact ppm.  This is the
    number that justifies (or indicts) the banding/bucket-cap
    configuration before anyone trusts the approximate path at
    corpus scale.

    Scale shape: the exact side is |corpus| × |probes| BY DESIGN —
    the audit's budget — bounded by ``cosine_topk``'s probe guard;
    the probe set is the deterministic ``id % probe_mod == 0``
    hash-slice (same convention as the registered ANN queries).  The
    approximate side rides the production LSH chain, so the audit
    measures what actually ships.  The hit check is one equi-join on
    (probe_id, neighbor_id); totals are map-combinable.

    Returns one row: (n_probes, k, n_exact_pairs, n_hit_pairs,
    recall_ppm).
    """
    # `exact` feeds the hit join AND the totals aggregate — truncate
    # the |corpus|×|probes| brute-force subtree once (bounded:
    # ≤ |probes|·k rows; guide §3.3)
    exact = cosine_topk(
        corpus, corpus.filter(F.col(id_col) % probe_mod == 0),
        id_col, vec_col, k,
    ).select("probe_id", "neighbor_id").localCheckpoint(eager=False)
    approx = lsh_ann_topk(
        corpus, id_col, vec_col, F.col("__id") % probe_mod == 0,
        k, n_planes, bands, dim,
    ).select("probe_id", "neighbor_id")
    hits = exact.join(approx, ["probe_id", "neighbor_id"], "left_semi")
    ex_tot = exact.agg(
        F.count_distinct("probe_id").cast("bigint").alias("n_probes"),
        F.count(F.lit(1)).cast("bigint").alias("n_exact_pairs"),
    )
    hit_tot = hits.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hit_pairs")
    )
    return ex_tot.crossJoin(F.broadcast(hit_tot)).select(
        "n_probes",
        F.lit(k).cast("bigint").alias("k"),
        "n_exact_pairs",
        "n_hit_pairs",
        F.expr(
            "CASE WHEN n_exact_pairs > 0 THEN"
            " (n_hit_pairs * CAST(1000000 AS BIGINT)) div n_exact_pairs"
            " ELSE 0 END"
        ).cast("bigint").alias("recall_ppm"),
    )


def lsh_recall_audit_sql(
    table: str,
    id_col: str,
    vec_col: str,
    probe_mod: int = 50,
    k: int = 5,
    n_planes: int = 64,
    bands: int = 8,
    dim: int = 64,
) -> str:
    """DuckDB oracle twin of :func:`lsh_recall_audit` — the probe
    filter is spelled per side (``p.{id_col}`` for the exact twin,
    ``p.id`` for the banded twin, their respective conventions)."""
    exact = cosine_topk_sql(
        table, id_col, vec_col, f"p.{id_col} % {probe_mod} = 0", k
    )
    approx = lsh_ann_topk_sql(
        table, id_col, vec_col, f"p.id % {probe_mod} = 0", k,
        n_planes, bands, dim,
    )
    return f"""
WITH exact AS MATERIALIZED ({exact}),
approx AS MATERIALIZED ({approx}),
hits AS (
  SELECT e.probe_id, e.neighbor_id
  FROM exact e JOIN approx a
    ON e.probe_id = a.probe_id AND e.neighbor_id = a.neighbor_id
),
ex_tot AS (
  SELECT CAST(COUNT(DISTINCT probe_id) AS BIGINT) AS n_probes,
         CAST(COUNT(*) AS BIGINT) AS n_exact_pairs
  FROM exact
),
hit_tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_hit_pairs FROM hits
)
SELECT n_probes, CAST({k} AS BIGINT) AS k, n_exact_pairs, n_hit_pairs,
       CASE WHEN n_exact_pairs > 0 THEN
         CAST((n_hit_pairs * CAST(1000000 AS BIGINT)) // n_exact_pairs
              AS BIGINT)
       ELSE 0 END AS recall_ppm
FROM ex_tot CROSS JOIN hit_tot
"""
