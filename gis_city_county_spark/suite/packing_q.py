"""Training-shard preparation queries: quota sampling, sequence
packing, TF-IDF keyword search."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from gis_city_county_spark.operators.packing import pack_summary, pack_summary_sql
from gis_city_county_spark.operators.search import (
    conjunctive_search,
    conjunctive_search_sql,
    phrase_search,
    phrase_search_sql,
    fuzzy_join_blocked,
    fuzzy_join_blocked_sql,
    fuzzy_lookup,
    fuzzy_lookup_sql,
    tfidf_topk,
    tfidf_topk_sql,
)
from gis_city_county_spark.operators.sketch import quota_sample, quota_sample_sql
from gis_city_county_spark.sources.tables import load_table
from gis_city_county_spark.suite import QuerySpec

_TERMS = ["spark", "query", "join", "vector"]


def q_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At most 20 documents per language, chosen by deterministic
    hash order (the training-mix cap)."""
    docs = load_table(spark, sf_dir, "documents")
    return quota_sample(docs, ["lang"], "doc_id", 20).select(
        "doc_id", "lang", "source", "sample_rank"
    )


_QUOTA_ORACLE = f"""
SELECT doc_id, lang, source, sample_rank
FROM ({quota_sample_sql("SELECT * FROM documents", ["lang"], "doc_id", 20)})
"""


def q_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~4000-char shards per language: per-pack
    doc count and size."""
    docs = load_table(spark, sf_dir, "documents")
    return pack_summary(docs, ["lang"], "doc_id", "n_chars", 4000)


_PACK_ORACLE = pack_summary_sql(
    "SELECT * FROM documents", ["lang"], "doc_id", "n_chars", 4000
)


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by TF-IDF for a fixed keyword set."""
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_topk(docs, "doc_id", "text", _TERMS, k=20)


_TFIDF_ORACLE = tfidf_topk_sql("SELECT * FROM documents", "doc_id", "text", _TERMS, 20)


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by Okapi BM25 (rational idf, k1=1.2, b=0.75)
    for the same keyword set — the length-normalized ranker TF-IDF
    approximates."""
    from gis_city_county_spark.operators.search import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, "doc_id", "text", _TERMS, k=20)


def _bm25_oracle() -> str:
    from gis_city_county_spark.operators.search import bm25_topk_sql

    return bm25_topk_sql("SELECT * FROM documents", "doc_id", "text", _TERMS, 20)

_CONJ_TERMS = ["spark", "join"]


def q_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index AND search: documents containing every query
    term, ranked by summed term frequency (operators.search
    .conjunctive_search — n-way posting intersection as one
    aggregation)."""
    docs = load_table(spark, sf_dir, "documents")
    return conjunctive_search(docs, "doc_id", "text", _CONJ_TERMS, k=20)


_CONJ_ORACLE = conjunctive_search_sql(
    "SELECT * FROM documents", "doc_id", "text", _CONJ_TERMS, 20
)


def q_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy name crosswalk: every 50th part name, first character
    dropped (a deterministic 'typo'), matched back to its 3 nearest
    part names by edit distance."""
    part = load_table(spark, sf_dir, "part")
    probes = part.filter(F.col("p_partkey") % 50 == 0).select(
        "p_partkey", F.expr("substring(p_name, 2)").alias("p_name")
    )
    return fuzzy_lookup(part, probes, "p_partkey", "p_name", k=3)


_FUZZY_ORACLE = fuzzy_lookup_sql(
    "SELECT p_partkey, p_name FROM part",
    "SELECT p_partkey, substring(p_name, 2) AS p_name FROM part"
    " WHERE p_partkey % 50 = 0",
    "p_partkey",
    "p_name",
    k=3,
)


def q_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded fuzzy crosswalk (the scale path): same probes as
    ``search_fuzzy_name_lookup`` but paired through the length-band
    equi-join and scored with the early-exit threshold distance."""
    part = load_table(spark, sf_dir, "part")
    probes = part.filter(F.col("p_partkey") % 50 == 0).select(
        "p_partkey", F.expr("substring(p_name, 2)").alias("p_name")
    )
    return fuzzy_join_blocked(part, probes, "p_partkey", "p_name", max_dist=2, k=3)


_FUZZY_BLOCKED_ORACLE = fuzzy_join_blocked_sql(
    "SELECT p_partkey, p_name FROM part",
    "SELECT p_partkey, substring(p_name, 2) AS p_name FROM part"
    " WHERE p_partkey % 50 = 0",
    "p_partkey",
    "p_name",
    max_dist=2,
    k=3,
)


_PHRASE = ["table", "hash"]


def q_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase search: documents with the words 'table hash'
    adjacent, via positional postings (posexplode → per-term filters →
    position+1 equi-joins), ranked by occurrence count."""
    docs = load_table(spark, sf_dir, "documents")
    return phrase_search(docs, "doc_id", "text", _PHRASE, k=20)


_PHRASE_ORACLE = phrase_search_sql(
    "SELECT * FROM documents", "doc_id", "text", _PHRASE, 20
)


def q_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR/3 proximity search: documents where 'spark' and 'join'
    occur within 3 tokens (either order), ranked by pair count then
    closest distance — the operator between AND and exact phrase."""
    from gis_city_county_spark.operators.search import proximity_search

    docs = load_table(spark, sf_dir, "documents")
    return proximity_search(docs, "doc_id", "text", "spark", "join", within=3, k=20)


def _proximity_oracle() -> str:
    from gis_city_county_spark.operators.search import proximity_search_sql

    return proximity_search_sql(
        "SELECT * FROM documents", "doc_id", "text", "spark", "join", 3, 20
    )


SPECS = [
    QuerySpec("pipeline_quota_sample", q_quota, _QUOTA_ORACLE),
    QuerySpec("pipeline_pack_sequences", q_pack, _PACK_ORACLE),
    QuerySpec("search_tfidf_topk", q_tfidf, _TFIDF_ORACLE),
    QuerySpec("search_bm25_topk", q_bm25, _bm25_oracle()),
    QuerySpec("search_conjunctive", q_conjunctive, _CONJ_ORACLE),
    QuerySpec("search_phrase", q_phrase, _PHRASE_ORACLE),
    QuerySpec("search_proximity", q_proximity, _proximity_oracle()),
    QuerySpec("search_fuzzy_name_lookup", q_fuzzy, _FUZZY_ORACLE),
    QuerySpec("search_fuzzy_join_blocked", q_fuzzy_blocked, _FUZZY_BLOCKED_ORACLE),
]
