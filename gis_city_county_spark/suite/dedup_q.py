"""Deduplication queries over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gis_city_county_spark.operators.dedup import (
    dedup_components,
    dedup_components_sql,
    exact_dedup,
    exact_dedup_sql,
    minhash_lsh_pairs,
    minhash_lsh_pairs_sql,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_sql,
    simhash16,
    simhash16_sql,
)
from gis_city_county_spark.operators.similarity import (
    embedding_cosine_pairs,
    embedding_cosine_pairs_sql,
)
from gis_city_county_spark.sources.tables import load_table
from gis_city_county_spark.suite import QuerySpec


def q_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, "doc_id", "text")


def q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "doc_id", "text")


def q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash16(docs, "doc_id", "text")


def q_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (LSH-bucketed, threshold 0.4 —
    the test embeddings have no planted duplicates; max pairwise
    cosine is ~0.51, so 0.4 exercises real output)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_cosine_pairs(emb, "vec_id", "embedding", threshold=0.4)


def q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash pairs clustered to duplicate groups (transitive
    closure) with the canonical keeper per group."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_components(docs, "doc_id", "text")


SPECS = [
    QuerySpec("dedup_exact", q_exact, exact_dedup_sql("documents", "doc_id", "text")),
    QuerySpec(
        "dedup_connected_components",
        q_components,
        dedup_components_sql("documents", "doc_id", "text"),
    ),
    QuerySpec(
        "dedup_minhash_lsh_pairs",
        q_minhash,
        minhash_lsh_pairs_sql("documents", "doc_id", "text"),
    ),
    QuerySpec(
        "dedup_ngram_jaccard",
        q_jaccard,
        ngram_jaccard_pairs_sql("documents", "doc_id", "text", threshold=0.5),
    ),
    QuerySpec("dedup_simhash", q_simhash, simhash16_sql("documents", "doc_id", "text")),
    QuerySpec(
        "dedup_embedding_cosine",
        q_embedding_cosine,
        embedding_cosine_pairs_sql("embeddings", "vec_id", "embedding", threshold=0.4),
    ),
]
