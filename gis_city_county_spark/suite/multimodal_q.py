"""Multimodal binary-column plumbing queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gis_city_county_spark.operators.multimodal import binary_features, to_binary_payload
from gis_city_county_spark.sources.tables import load_table
from gis_city_county_spark.suite import QuerySpec


def q_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents' text encoded as binary payloads and pushed through
    the Arrow-batched mapInPandas feature extractor (the multimodal
    decode-path plumbing with a deterministic stand-in decoder)."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = to_binary_payload(docs, "text")
    return binary_features(payloads, "doc_id", "payload")


# Text here is ASCII, so octet_length(text) == n_bytes and the md5 of
# the first 64 chars equals the md5 of the first 64 bytes.
_BINARY_ORACLE = """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST((strlen(text) + 255) // 256 AS BIGINT) AS n_chunks,
       md5(substr(text, 1, 64)) AS head_hash
FROM documents
"""


SPECS = [
    QuerySpec("mm_binary_features", q_binary_features, _BINARY_ORACLE),
]
