"""Multimodal binary-column plumbing queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gis_city_county_spark.operators.multimodal import (
    audio_window_energy,
    binary_features,
    sample_frames,
    to_binary_payload,
)
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


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads (video-keyframe plumbing
    with a byte-slice stand-in for the codec)."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = to_binary_payload(docs, "text")
    return sample_frames(payloads, "doc_id", "payload", frame_size=256, stride=512)


# ASCII text: byte slices == character substrings.
_FRAME_ORACLE = """
SELECT doc_id,
       CAST(i AS INTEGER) AS frame_idx,
       CAST(i * 512 AS BIGINT) AS frame_offset,
       CAST(least(256, strlen(text) - i * 512) AS INTEGER) AS n_frame_bytes,
       md5(substr(text, i * 512 + 1, 256)) AS frame_hash
FROM documents,
     LATERAL UNNEST(generate_series(0, CAST(ceil(strlen(text) / 512.0) AS BIGINT) - 1)) AS g(i)
"""


def q_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio-energy extraction: payload bytes as u8 PCM
    samples, 64-sample frames, per-frame integer energy/peak via the
    vectorized mapInPandas path."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = to_binary_payload(docs, "text")
    return audio_window_energy(payloads, "doc_id", "payload", window=64)


# ASCII text: sample value at 1-based position p is ascii(text[p]).
_AUDIO_ORACLE = """
WITH samples AS (
  SELECT doc_id,
         CAST((g.p - 1) // 64 AS INTEGER) AS win_idx,
         ascii(substr(text, g.p, 1)) AS v
  FROM documents,
       LATERAL UNNEST(generate_series(1, strlen(text))) AS g(p)
)
SELECT doc_id, win_idx,
       CAST(COUNT(*) AS INTEGER) AS n_samples,
       CAST(SUM(v) AS BIGINT) AS energy,
       CAST(MAX(v) AS INTEGER) AS peak
FROM samples GROUP BY 1, 2
"""


def q_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over sampled frames: consecutive frame
    hashes that differ mark a cut; per payload, frame count and cut
    count — the scene-segmentation shape (a real pipeline swaps the
    byte-slice hash for a perceptual frame distance, same plumbing)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    payloads = to_binary_payload(docs, "text")
    frames = sample_frames(payloads, "doc_id", "payload", frame_size=256, stride=512)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    flagged = frames.withColumn("__prev", F.lag("frame_hash").over(w))
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(
            (
                F.col("__prev").isNotNull()
                & (F.col("frame_hash") != F.col("__prev"))
            ).cast("long")
        ).alias("n_cuts"),
    )


_SHOT_ORACLE = f"""
WITH frames AS ({_FRAME_ORACLE}),
flagged AS (
  SELECT doc_id, frame_hash,
         LAG(frame_hash) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
  FROM frames
)
SELECT doc_id, COUNT(*) AS n_frames,
       CAST(SUM(CASE WHEN prev IS NOT NULL AND frame_hash != prev
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts
FROM flagged GROUP BY doc_id
"""


SPECS = [
    QuerySpec("mm_binary_features", q_binary_features, _BINARY_ORACLE),
    QuerySpec("mm_frame_sample", q_frame_sample, _FRAME_ORACLE),
    QuerySpec("mm_audio_windows", q_audio_windows, _AUDIO_ORACLE),
    QuerySpec("mm_shot_boundaries", q_shot_boundaries, _SHOT_ORACLE),
]
