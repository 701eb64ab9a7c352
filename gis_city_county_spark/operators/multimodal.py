"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
typed metadata struct alongside. The Spark-side machinery — schema
convention, Arrow-batched ``mapInPandas`` processing, partition-sized
batches — is real and tested; the actual codecs are STUBBED
(``NotImplementedError`` / deterministic fake) because no media
libraries exist in this environment. Swapping a real decoder into
``decode_image``/``decode_audio`` requires no plumbing changes.

Scale notes: mapInPandas streams Arrow batches (no per-row pickling);
payload columns are pruned unless referenced, so metadata-only
queries never read the bytes; a production table would store payloads
in their own parquet column chunk (large row groups hurt — keep
``parquet.block.size`` moderate and let column pruning do its job).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata convention for opaque media columns.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """STUB — real implementation needs an image codec (PIL/opencv),
    not present in this environment. The engine's contract: bytes in,
    HxWxC array out."""
    raise NotImplementedError("image decode requires a codec library (stubbed)")


def decode_audio(payload: bytes) -> "object":
    """STUB — see :func:`decode_image`."""
    raise NotImplementedError("audio decode requires a codec library (stubbed)")


def fake_feature(payload: bytes, head: int = 64) -> str:
    """Deterministic stand-in for a decoded feature: md5 of the first
    ``head`` bytes. Keeps the batch plumbing testable end-to-end."""
    return hashlib.md5(payload[:head]).hexdigest()


def binary_features(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    head: int = 64,
    chunk: int = 256,
) -> DataFrame:
    """Per-payload features via Arrow-batched ``mapInPandas``: byte
    length, chunk count, and the (stubbed) decoded feature hash.

    This is the multimodal hot path shape: one pass over partitions,
    vectorized batches, output schema declared up front."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("n_chunks", T.LongType()),
            T.StructField("head_hash", T.StringType()),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "n_chunks": payloads.map(
                        lambda b: (len(b) + chunk - 1) // chunk
                    ).astype("int64"),
                    "head_hash": payloads.map(lambda b: fake_feature(b, head)),
                }
            )

    from gis_city_county_spark.operators.scale import rebalance_for_fanout

    # The decode stage is CPU-bound per row; a single-split input would
    # serialize it on one slot, so rebalance narrow scans first.
    src = rebalance_for_fanout(df.select(id_col, payload_col), multiplier=8.0)
    return src.mapInPandas(process, out_schema)


def to_binary_payload(df: DataFrame, text_col: str, out: str = "payload") -> DataFrame:
    """Encode a string column as a binary payload (UTF-8) — used to
    exercise the binary plumbing against the documents table."""
    return df.withColumn(out, F.encode(F.col(text_col), "UTF-8"))


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """STUB — real implementation needs a codec (see
    :func:`decode_image`); contract: encoded bytes in, re-encoded
    resized bytes out."""
    raise NotImplementedError("image resize requires a codec library (stubbed)")


def sample_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    frame_size: int = 256,
    stride: int = 512,
) -> DataFrame:
    """Frame sampling over opaque media payloads: emit a frame of
    ``frame_size`` bytes every ``stride`` bytes with its hash — the
    video-keyframe-extraction plumbing shape (one input row fans out
    to many frame rows inside the same Arrow batch; a real pipeline
    swaps the byte-slice for a codec's keyframe decode).

    Output: (id, frame_idx, frame_offset, n_frame_bytes, frame_hash).
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_offset", T.LongType()),
            T.StructField("n_frame_bytes", T.IntegerType()),
            T.StructField("frame_hash", T.StringType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, sizes, hashes = [], [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                for i, off in enumerate(range(0, len(payload), stride)):
                    frame = payload[off : off + frame_size]
                    ids.append(rid)
                    idxs.append(i)
                    offs.append(off)
                    sizes.append(len(frame))
                    hashes.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_offset": pd.Series(offs, dtype="int64"),
                    "n_frame_bytes": pd.Series(sizes, dtype="int32"),
                    "frame_hash": pd.Series(hashes, dtype="object"),
                }
            )

    from gis_city_county_spark.operators.scale import rebalance_for_fanout

    src = rebalance_for_fanout(df.select(id_col, payload_col), multiplier=8.0)
    return src.mapInPandas(gen, out_schema)


def audio_window_energy(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    window: int = 64,
) -> DataFrame:
    """Windowed audio-feature extraction over opaque payloads: treat
    the payload as unsigned 8-bit PCM samples (the deterministic
    stand-in decode — a real pipeline swaps in ``decode_audio``),
    split into non-overlapping ``window``-sample frames, and emit
    per-frame energy (sum of sample values) and peak — the
    VAD/loudness-profile plumbing shape.

    Vectorized end-to-end: numpy reshapes each payload once (no
    per-sample Python), Arrow carries the batches, and the fan-out
    (one row → n_frames rows) happens inside the executor, never on
    the driver. All-integer outputs — engine-exact."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("win_idx", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("energy", T.LongType()),
            T.StructField("peak", T.IntegerType()),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids: list[int] = []
            widx: list[int] = []
            nsamp: list[int] = []
            energy: list[int] = []
            peak: list[int] = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                a = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(a) == 0:
                    continue
                n_win = -(-len(a) // window)
                padded = np.zeros(n_win * window, dtype=np.int64)
                padded[: len(a)] = a
                frames = padded.reshape(n_win, window)
                ids.extend([rid] * n_win)
                widx.extend(range(n_win))
                last = len(a) - (n_win - 1) * window
                nsamp.extend([window] * (n_win - 1) + [last])
                energy.extend(frames.sum(axis=1).tolist())
                # pad is 0, which never beats a real uint8 sample max
                # in a nonempty frame
                peak.extend(frames.max(axis=1).tolist())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "win_idx": pd.Series(widx, dtype="int32"),
                    "n_samples": pd.Series(nsamp, dtype="int32"),
                    "energy": pd.Series(energy, dtype="int64"),
                    "peak": pd.Series(peak, dtype="int32"),
                }
            )

    from gis_city_county_spark.operators.scale import rebalance_for_fanout

    src = rebalance_for_fanout(df.select(id_col, payload_col), multiplier=8.0)
    return src.mapInPandas(process, out_schema)
