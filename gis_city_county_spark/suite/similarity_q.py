"""Similarity-search queries over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gis_city_county_spark.operators.similarity import (
    centroid_outliers,
    centroid_outliers_sql,
    cosine_topk,
    cosine_topk_sql,
    ivf_ann_topk,
    ivf_ann_topk_sql,
    lsh_ann_topk,
    lsh_ann_topk_sql,
)
from gis_city_county_spark.sources.tables import load_table
from gis_city_county_spark.suite import QuerySpec


def q_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5: every 50th vector probes the corpus.
    The correctness baseline for ANN variants."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0)
    return cosine_topk(emb, probes, "vec_id", "embedding", k=5)


def q_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 — the 100 TB path: probes meet
    only same-band corpus rows instead of the whole corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_ann_topk(emb, "vec_id", "embedding", F.col("__id") % 50 == 0, k=5)


def q_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 — coarse-quantized inverted lists, probes
    score only their nprobe nearest lists (equi-join on list id)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_ann_topk(
        emb, "vec_id", "embedding", F.col("__id") % 50 == 0, k=5, nlist=32, nprobe=4
    )


def q_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid + the 5 vectors farthest from their own
    centroid (squared L2) — mislabeled-example / anomaly scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    return centroid_outliers(emb, "vec_id", "embedding", "label", k=5)


SPECS = [
    QuerySpec(
        "sim_centroid_outliers",
        q_centroid_outliers,
        centroid_outliers_sql("embeddings", "vec_id", "embedding", "label", dim=64, k=5),
    ),
    QuerySpec(
        "sim_bruteforce_cosine_topk",
        q_bruteforce_topk,
        cosine_topk_sql("embeddings", "vec_id", "embedding", "p.vec_id % 50 = 0", k=5),
    ),
    QuerySpec(
        "sim_lsh_ann_topk",
        q_lsh_ann_topk,
        lsh_ann_topk_sql("embeddings", "vec_id", "embedding", "p.id % 50 = 0", k=5),
    ),
    QuerySpec(
        "sim_ivf_ann_topk",
        q_ivf_ann_topk,
        ivf_ann_topk_sql(
            "embeddings", "vec_id", "embedding", "p.id % 50 = 0", k=5, nlist=32, nprobe=4
        ),
    ),
]
