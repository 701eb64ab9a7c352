"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
typed metadata struct alongside. The Spark-side machinery — schema
convention, Arrow-batched ``mapInPandas`` processing, partition-sized
batches — is real and tested. Decode is real for the two public
container formats parseable with the stdlib alone: uncompressed
24-bit **BMP** (``decode_image``/``encode_bmp``/``resize_image``)
and PCM **WAV** 8/16-bit (``decode_audio``/``encode_wav``). Other
codecs (JPEG/PNG/MP3/…) still need an external library; swapping one
into the same functions requires no plumbing changes.

Scale notes: mapInPandas streams Arrow batches (no per-row pickling);
payload columns are pruned unless referenced, so metadata-only
queries never read the bytes; a production table would store payloads
in their own parquet column chunk (large row groups hurt — keep
``parquet.block.size`` moderate and let column pruning do its job).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
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


def encode_bmp(pixels) -> bytes:
    """Encode an HxWx3 uint8 RGB array as an uncompressed 24-bit BMP
    (BITMAPINFOHEADER, bottom-up rows, 4-byte row padding) — the
    published Windows DIB layout."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_bmp expects an HxWx3 array")
    h, w, _ = a.shape
    row_raw = w * 3
    pad = (-row_raw) % 4
    img_size = (row_raw + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    bgr = a[:, :, ::-1]  # BMP stores BGR
    rows = []
    zeros = b"\x00" * pad
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(bgr[y].tobytes() + zeros)
    return header + info + b"".join(rows)


def decode_image(payload: bytes):
    """Decode an uncompressed 24-bit BMP into an HxWx3 uint8 RGB
    array. Handles bottom-up (positive height) and top-down (negative
    height) row order and 4-byte row padding. Contract: bytes in,
    HxWxC array out; other image codecs need an external library."""
    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    row_raw = w * 3
    stride = row_raw + ((-row_raw) % 4)
    buf = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = buf.reshape(h, stride)[:, :row_raw].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_wav(samples, sample_rate: int = 8000, bits: int = 16) -> bytes:
    """Encode a 1-D sample array as a mono PCM WAV (RIFF/fmt/data).
    ``bits``: 16 (signed) or 8 (unsigned)."""
    import numpy as np

    if bits == 16:
        a = np.asarray(samples, dtype=np.int16)
    elif bits == 8:
        a = np.asarray(samples, dtype=np.uint8)
    else:
        raise ValueError("bits must be 8 or 16")
    data = a.tobytes()
    block = bits // 8
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * block, block, bits
    )
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_audio(payload: bytes):
    """Decode a PCM WAV payload (mono/multi-channel, 8-bit unsigned or
    16-bit signed) into ``(samples, sample_rate)`` where samples is an
    (n, channels) int numpy array. Walks RIFF chunks, so extra chunks
    (LIST/INFO) are skipped. Compressed formats need an external
    library."""
    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    dt = np.int16 if bits == 16 else np.uint8
    a = np.frombuffer(data, dtype=dt)
    n = len(a) // channels
    return a[: n * channels].reshape(n, channels).astype(np.int64), sample_rate


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
    """Resize a BMP payload to ``width``×``height`` by nearest-neighbor
    resampling (deterministic integer index map — engine-exact) and
    re-encode. Contract: encoded bytes in, re-encoded resized bytes
    out."""
    import numpy as np

    img = decode_image(payload)
    h, w, _ = img.shape
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return encode_bmp(img[ys][:, xs])


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


def image_stats(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """REAL decode in the executors: per BMP payload, dimensions and
    integer per-channel sums via :func:`decode_image` inside
    Arrow-batched ``mapInPandas``. All-integer outputs — engine-exact.
    Output: (id, width, height, sum_r, sum_g, sum_b)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("sum_r", T.LongType()),
            T.StructField("sum_g", T.LongType()),
            T.StructField("sum_b", T.LongType()),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (id_col, "width", "height", "sum_r", "sum_g", "sum_b")}
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_image(bytes(payload))
                h, w, _ = img.shape
                s = img.reshape(-1, 3).sum(axis=0, dtype="int64")
                rows[id_col].append(rid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["sum_r"].append(int(s[0]))
                rows["sum_g"].append(int(s[1]))
                rows["sum_b"].append(int(s[2]))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(rows[id_col], dtype="int64"),
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "sum_r": pd.Series(rows["sum_r"], dtype="int64"),
                    "sum_g": pd.Series(rows["sum_g"], dtype="int64"),
                    "sum_b": pd.Series(rows["sum_b"], dtype="int64"),
                }
            )

    from gis_city_county_spark.operators.scale import rebalance_for_fanout

    src = rebalance_for_fanout(df.select(id_col, payload_col), multiplier=8.0)
    return src.mapInPandas(process, out_schema)


def audio_stats(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """REAL decode in the executors: per WAV payload, sample count,
    rate, integer sum of absolute sample values, and peak amplitude
    via :func:`decode_audio`. Output: (id, n_samples, sample_rate,
    sum_abs, peak)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("sum_abs", T.LongType()),
            T.StructField("peak", T.LongType()),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in (id_col, "n_samples", "sample_rate", "sum_abs", "peak")}
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                samples, rate = decode_audio(bytes(payload))
                mono = np.abs(samples).sum(axis=1)
                out[id_col].append(rid)
                out["n_samples"].append(samples.shape[0])
                out["sample_rate"].append(rate)
                out["sum_abs"].append(int(np.abs(samples).sum()))
                out["peak"].append(int(mono.max()) if len(mono) else 0)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(out[id_col], dtype="int64"),
                    "n_samples": pd.Series(out["n_samples"], dtype="int64"),
                    "sample_rate": pd.Series(out["sample_rate"], dtype="int32"),
                    "sum_abs": pd.Series(out["sum_abs"], dtype="int64"),
                    "peak": pd.Series(out["peak"], dtype="int64"),
                }
            )

    from gis_city_county_spark.operators.scale import rebalance_for_fanout

    src = rebalance_for_fanout(df.select(id_col, payload_col), multiplier=8.0)
    return src.mapInPandas(process, out_schema)


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


def patch_plan(
    df: DataFrame, id_col: str, payload_col: str, patch: int = 2
) -> DataFrame:
    """ViT-style patch-grid plan per image: decode the REAL payload
    for its dimensions (the :func:`image_stats` mapInPandas path),
    then the pad-to-patch geometry a vision tokenizer needs — padded
    dims, patch counts per axis, total patch count, and the resulting
    token budget (patches + 1 CLS token).  This is the planning row a
    multimodal training pipeline materializes per image so sequence
    packing can budget tokens WITHOUT re-decoding anything.

    All integer arithmetic (ceil division as ``-(-w div p)``-free
    ``(w + p - 1) div p``), so the oracle re-derives the plan from
    the fixture dimension formula exactly.

    Output: (id, width, height, pad_w, pad_h, n_patch_x, n_patch_y,
    n_patches, n_tokens).
    """
    dims = image_stats(df, id_col, payload_col).select(
        id_col, "width", "height"
    )
    npx = F.expr(f"(width + {patch - 1}) div {patch}")
    npy = F.expr(f"(height + {patch - 1}) div {patch}")
    out = dims.select(
        F.col(id_col),
        "width",
        "height",
        npx.cast("int").alias("n_patch_x"),
        npy.cast("int").alias("n_patch_y"),
    )
    return out.select(
        id_col,
        "width",
        "height",
        (F.col("n_patch_x") * patch - F.col("width"))
        .cast("int")
        .alias("pad_w"),
        (F.col("n_patch_y") * patch - F.col("height"))
        .cast("int")
        .alias("pad_h"),
        "n_patch_x",
        "n_patch_y",
        (F.col("n_patch_x") * F.col("n_patch_y"))
        .cast("bigint")
        .alias("n_patches"),
        (F.col("n_patch_x") * F.col("n_patch_y") + 1)
        .cast("bigint")
        .alias("n_tokens"),
    )


# The SDXL-style aspect-ratio ladder: (index, bucket_w, bucket_h) in
# REDUCED aspect terms (only the ratio matters for assignment).  A
# training run multiplies each by its resolution step; the assignment
# below is resolution-independent.
ASPECT_BUCKETS: tuple[tuple[int, int, int], ...] = (
    (0, 1, 1),
    (1, 4, 3),
    (2, 3, 4),
    (3, 3, 2),
    (4, 2, 3),
    (5, 16, 9),
    (6, 9, 16),
    (7, 2, 1),
    (8, 1, 2),
)


def aspect_bucket_plan(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """Aspect-ratio bucketing plan per image (the SDXL training-batch
    trick: group images by nearest aspect bucket so every batch crops
    minimally instead of square-cropping everything).  Dims come from
    the REAL payload decode (the :func:`image_stats` mapInPandas
    path); assignment and waste are exact integers.

    Per image and candidate bucket (bw, bh): the relative aspect error
    is ``1e6·|w·bh − h·bw| div (h·bw)`` (cross-multiplied — no
    division by the image side, no floats), the winner the minimal
    (error, bucket index) pair via a per-image window over the
    9-row broadcast ladder.  ``crop_ppm`` is the pixel fraction lost
    scaling-to-cover then center-cropping the winner:
    ``1e6 − (1e6·bw·h) div (w·bh)`` when the image is wider than the
    bucket, mirrored otherwise — the number a curation pass thresholds
    to route extreme panoramas to a letterbox path instead.

    Output: (id, width, height, bucket_id, bucket_w, bucket_h,
    aspect_err_ppm, crop_ppm) — one row per image.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    dims = image_stats(df, id_col, payload_col).select(
        id_col, "width", "height"
    )
    ladder = spark.createDataFrame(
        list(ASPECT_BUCKETS), "bucket_id int, bw int, bh int"
    )
    scored = dims.join(F.broadcast(ladder)).select(
        id_col,
        "width",
        "height",
        "bucket_id",
        "bw",
        "bh",
        F.expr(
            "(abs(width * bh - height * bw) * CAST(1000000 AS BIGINT))"
            " div (height * bw)"
        ).alias("aspect_err_ppm"),
    )
    w = Window.partitionBy(id_col).orderBy("aspect_err_ppm", "bucket_id")
    best = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    crop = F.expr(
        "CASE WHEN width * bh >= height * bw THEN"
        "  CAST(1000000 AS BIGINT)"
        "  - (bw * height * CAST(1000000 AS BIGINT)) div (width * bh)"
        " ELSE"
        "  CAST(1000000 AS BIGINT)"
        "  - (bh * width * CAST(1000000 AS BIGINT)) div (height * bw)"
        " END"
    )
    return best.select(
        id_col,
        "width",
        "height",
        F.col("bucket_id").cast("bigint").alias("bucket_id"),
        F.col("bw").cast("int").alias("bucket_w"),
        F.col("bh").cast("int").alias("bucket_h"),
        F.col("aspect_err_ppm").cast("bigint").alias("aspect_err_ppm"),
        crop.cast("bigint").alias("crop_ppm"),
    )


def aspect_bucket_plan_sql(dims_sql: str, id_col: str) -> str:
    """DuckDB twin over a (id, width, height) dims relation (the
    oracle re-derives dims from the fixture formula, decode-free)."""
    ladder = ", ".join(f"({i}, {bw}, {bh})" for i, bw, bh in ASPECT_BUCKETS)
    return f"""
WITH dims AS ({dims_sql}),
ladder(bucket_id, bw, bh) AS (VALUES {ladder}),
scored AS (
  SELECT d.{id_col}, d.width, d.height, l.bucket_id, l.bw, l.bh,
         (ABS(d.width * l.bh - d.height * l.bw) * CAST(1000000 AS BIGINT))
           // (d.height * l.bw) AS aspect_err_ppm
  FROM dims d, ladder l
),
best AS (
  SELECT * FROM scored
  QUALIFY ROW_NUMBER() OVER (PARTITION BY {id_col}
                             ORDER BY aspect_err_ppm, bucket_id) = 1
)
SELECT {id_col}, width, height,
       CAST(bucket_id AS BIGINT) AS bucket_id,
       CAST(bw AS INTEGER) AS bucket_w,
       CAST(bh AS INTEGER) AS bucket_h,
       CAST(aspect_err_ppm AS BIGINT) AS aspect_err_ppm,
       CAST(CASE WHEN width * bh >= height * bw THEN
              CAST(1000000 AS BIGINT)
              - (bw * height * CAST(1000000 AS BIGINT)) // (width * bh)
            ELSE
              CAST(1000000 AS BIGINT)
              - (bh * width * CAST(1000000 AS BIGINT)) // (height * bw)
            END AS BIGINT) AS crop_ppm
FROM best
"""


def multimodal_token_budget(
    docs: DataFrame,
    images: DataFrame,
    doc_id: str,
    text_col: str,
    img_key,
    img_id: str,
    payload_col: str,
    patch: int = 2,
    sep_tokens: int = 2,
    bucket: int = 128,
) -> DataFrame:
    """Per-sample token budget for an interleaved text+image example —
    the ONE number a multimodal packer needs per row before it can
    bin-pack sequences: BPE-ish text tokens + the image's ViT patch
    tokens (from :func:`patch_plan`, REAL decode for the dims, CLS
    included) + ``sep_tokens`` modality separators, plus the
    ``bucket``-sized length bucket the packer groups by.  ``img_key``
    is the Column mapping a doc to its image id (a real pipeline has
    a foreign key; the registered fixture uses ``doc_id % n_images``).

    Scale shape: the text count is a scan-side regex (no explode);
    the image side runs :func:`patch_plan` once over the image table
    (∝ images, usually ≪ docs) and broadcast-joins onto the docs by
    the sample's image key.  Nothing re-decodes at pack time.

    Returns (doc_id, text_tokens, image_tokens, budget_tokens,
    seq_bucket).
    """
    from gis_city_county_spark.operators.textstats import bpe_tokens

    plans = patch_plan(images, img_id, payload_col, patch).select(
        F.col(img_id).alias("__img"),
        F.col("n_tokens").alias("image_tokens"),
    )
    txt = docs.select(
        F.col(doc_id).alias("doc_id"),
        F.size(bpe_tokens(F.col(text_col))).cast("bigint")
        .alias("text_tokens"),
        img_key.alias("__img"),
    )
    return (
        txt.join(F.broadcast(plans), "__img")
        .select(
            "doc_id",
            "text_tokens",
            "image_tokens",
            (
                F.col("text_tokens") + F.col("image_tokens")
                + F.lit(sep_tokens)
            ).cast("bigint").alias("budget_tokens"),
        )
        .withColumn(
            "seq_bucket",
            F.expr(
                f"CAST((text_tokens + image_tokens + {sep_tokens})"
                f" div {bucket} AS BIGINT)"
            ),
        )
    )


def image_dhash(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Perceptual difference-hash (dHash) over REAL executor-side BMP
    decode — the image twin of text MinHash: near-identical images
    (re-encodes, tiny crops, brightness-preserving noise) land at
    small Hamming distance, so corpus-scale image dedup becomes a
    band-bucketed hash join instead of pixel-space comparison.

    Every step is integer-exact so an oracle can recompute it from
    pixel arithmetic: grayscale is the fixed-point luma ``(77·R +
    150·G + 29·B) >> 8``; the 9×8 resample is nearest-neighbor with
    ``src = (dst · src_dim) div dst_dim``; bit (y, x) is ``gray(y,
    x+1) > gray(y, x)``.  The 64 bits are returned as two bigint
    halves (``dhash_hi`` = rows 0-3, ``dhash_lo`` = rows 4-7) —
    avoiding unsigned-64 overflow AND giving the banded near-pair
    join its two natural 32-bit bands for free.

    Scale shape: Arrow-batched ``mapInPandas`` decode (the one
    genuinely non-relational step), everything downstream is plain
    integer columns.  Output: (id, width, height, dhash_hi,
    dhash_lo).
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("dhash_hi", T.LongType()),
            T.StructField("dhash_lo", T.LongType()),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (id_col, "width", "height",
                                    "dhash_hi", "dhash_lo")}
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_image(bytes(payload)).astype(np.int64)
                h, w, _ = img.shape
                gray = (77 * img[:, :, 0] + 150 * img[:, :, 1]
                        + 29 * img[:, :, 2]) >> 8
                ys = (np.arange(8) * h) // 8
                xs = (np.arange(9) * w) // 9
                g = gray[np.ix_(ys, xs)]
                bits = (g[:, 1:] > g[:, :-1]).astype(np.int64)
                hi = lo = 0
                for y in range(4):
                    for x in range(8):
                        hi |= int(bits[y, x]) << (y * 8 + x)
                for y in range(4, 8):
                    for x in range(8):
                        lo |= int(bits[y, x]) << ((y - 4) * 8 + x)
                rows[id_col].append(rid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["dhash_hi"].append(hi)
                rows["dhash_lo"].append(lo)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(rows[id_col], dtype="int64"),
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "dhash_hi": pd.Series(rows["dhash_hi"], dtype="int64"),
                    "dhash_lo": pd.Series(rows["dhash_lo"], dtype="int64"),
                }
            )

    from gis_city_county_spark.operators.scale import rebalance_for_fanout

    src = rebalance_for_fanout(df.select(id_col, payload_col), multiplier=8.0)
    return src.mapInPandas(process, out_schema)


def dhash_near_pairs(
    hashes: DataFrame, id_col: str, max_hamming: int = 6, bands: int = 8,
    max_bucket: int | None = 256,
) -> DataFrame:
    """Near-duplicate image pairs from :func:`image_dhash` output —
    banded exactly like SimHash text dedup: split the 64-bit dHash
    (stored as two 32-bit halves) into ``bands`` equal bands; by
    pigeonhole any pair within Hamming distance ``max_hamming`` <
    ``bands`` must agree EXACTLY on at least one band, so candidates
    come from (band_idx, band_val) equi-join buckets, never an
    all-pairs scan; the exact popcount filter then keeps true
    near-pairs.  (Two 32-bit bands only guarantee recall for Hamming
    ≤ 1 — bits split across both halves escape the half-match join —
    hence the default 8 × 8-bit banding for the default
    ``max_hamming`` of 6.)

    ``max_bucket`` (default 256) bounds the residual quadratic term
    BY CONSTRUCTION — 8-bit bands give only 256 buckets per band, so
    a uniform corpus's per-bucket occupancy grows with n and the
    candidate join would grow n²·bands/256 (the price of the
    narrow-band recall guarantee): buckets past the cap are md5-rank
    sampled down (deterministic — the same ids survive on every
    engine, every run, every partitioning), capping per-bucket
    fan-out at C(cap, 2); a pair dropped from one oversized bucket
    has the other 7 bands to surface through.  The co-occurrence-cap
    discipline (``graph.cooccurrence_truncation_report`` /
    ``similarity.lsh_bucket_truncation_report``) — truncation is a
    deliberate, audited recall trade, not a silent one.

    Output: (a_id, b_id, hamming), a_id < b_id, ordered by (hamming,
    a_id, b_id).
    """
    if max_hamming >= bands:
        # not an assert: stripped under -O, and the failure mode is a
        # silent recall loss (pairs differing in every band missed)
        raise ValueError(
            f"pigeonhole banding needs max_hamming < bands "
            f"(got {max_hamming} >= {bands})"
        )
    if bands % 2 or 32 % (bands // 2):
        raise ValueError(f"bands must split two 32-bit halves evenly "
                         f"(got {bands})")
    half_bands = bands // 2
    width = 32 // half_bands
    mask = (1 << width) - 1
    band_vals = [
        F.expr(f"({src} >> {i * width}) & {mask}")
        for src in ("dhash_hi", "dhash_lo")
        for i in range(half_bands)
    ]
    banded = hashes.select(
        F.col(id_col).alias("__id"), "dhash_hi", "dhash_lo",
        F.posexplode(F.array(*band_vals)).alias("band_idx", "band_val"),
    )
    if max_bucket is not None:
        w = Window.partitionBy("band_idx", "band_val").orderBy(
            F.md5(F.col("__id").cast("string")), F.col("__id")
        )
        banded = (
            banded.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= max_bucket)
            .drop("__rk")
        )
    a = banded.select(
        F.col("__id").alias("a_id"),
        F.col("dhash_hi").alias("__ahi"), F.col("dhash_lo").alias("__alo"),
        "band_idx", "band_val",
    )
    b = banded.select(
        F.col("__id").alias("b_id"),
        F.col("dhash_hi").alias("__bhi"), F.col("dhash_lo").alias("__blo"),
        "band_idx", "band_val",
    )
    ham = (
        F.bit_count(F.expr("__ahi ^ __bhi"))
        + F.bit_count(F.expr("__alo ^ __blo"))
    ).cast("bigint")
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("hamming", "a_id", "b_id")
    )


def audio_fingerprints(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    win: int = 64,
    fanout: int = 3,
) -> DataFrame:
    """Landmark audio fingerprinting (the Shazam constellation idea
    in its SQL-checkable time-domain form): REAL executor-side WAV
    decode, one PEAK per non-overlapping ``win``-sample window
    (argmax |amplitude|, earliest-sample tie — integer-exact), then
    each peak pairs with the peaks of the next ``fanout`` windows
    into a packed landmark hash ``offset_a·2¹⁶ + offset_b·2⁸ + dt``.
    Two clips sharing audio share hashes at a CONSISTENT window
    offset — which is what :func:`audio_fingerprint_matches` votes
    on.

    Everything after the decode is integer arithmetic an oracle can
    recompute from a sample formula; no FFT, so the fingerprint is
    robust to nothing fancier than time shifts — the point here is
    the distributed SHAPE (decode → scan-side landmarks →
    equi-join matching), the production swap-in being spectral peaks
    from the same window grid.

    Output: (id, win_idx, fp_hash) — one row per landmark;
    ``win_idx`` is the anchor window index.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("win_idx", T.LongType()),
            T.StructField("fp_hash", T.LongType()),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, wins, hashes = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                samples, _ = decode_audio(bytes(payload))
                mono = samples[:, 0]
                n_win = len(mono) // win
                peaks = []
                for w in range(n_win):
                    seg = np.abs(mono[w * win:(w + 1) * win])
                    peaks.append(int(np.argmax(seg)))  # earliest max
                for a in range(n_win):
                    for d in range(1, fanout + 1):
                        b = a + d
                        if b >= n_win:
                            break
                        ids.append(rid)
                        wins.append(a)
                        hashes.append(
                            (peaks[a] << 16) | (peaks[b] << 8) | d
                        )
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "win_idx": pd.Series(wins, dtype="int64"),
                    "fp_hash": pd.Series(hashes, dtype="int64"),
                }
            )

    from gis_city_county_spark.operators.scale import rebalance_for_fanout

    src = rebalance_for_fanout(df.select(id_col, payload_col), multiplier=8.0)
    return src.mapInPandas(process, out_schema)


def audio_fingerprint_matches(
    fps: DataFrame, id_col: str, min_votes: int = 3
) -> DataFrame:
    """Clip-pair matching over :func:`audio_fingerprints` output: an
    equi-join on the landmark hash (never an all-pairs scan), then a
    Hough-style vote over the WINDOW-OFFSET difference — genuinely
    shared audio piles votes on one consistent offset, while chance
    hash collisions scatter.  Reports each pair's best offset and its
    vote count.

    Output: (a_id, b_id, n_shared, best_offset, best_votes) for
    pairs whose best offset collects ≥ ``min_votes`` votes; a_id <
    b_id, ordered by (best_votes desc, a_id, b_id).
    """
    a = fps.select(
        F.col(id_col).alias("a_id"),
        F.col("win_idx").alias("__wa"),
        "fp_hash",
    )
    b = fps.select(
        F.col(id_col).alias("b_id"),
        F.col("win_idx").alias("__wb"),
        "fp_hash",
    )
    votes = (
        a.join(b, "fp_hash")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy(
            "a_id", "b_id",
            (F.col("__wb") - F.col("__wa")).alias("offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("__votes"))
    )
    w = Window.partitionBy("a_id", "b_id").orderBy(
        F.col("__votes").desc(), F.col("offset").asc()
    )
    return (
        votes.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "n_shared",
            F.sum("__votes").over(
                Window.partitionBy("a_id", "b_id")
            ).cast("bigint"),
        )
        .filter((F.col("__rn") == 1) & (F.col("__votes") >= min_votes))
        .select(
            "a_id", "b_id", "n_shared",
            F.col("offset").cast("bigint").alias("best_offset"),
            F.col("__votes").alias("best_votes"),
        )
        .orderBy(F.col("best_votes").desc(), "a_id", "b_id")
    )


# ------------------------------------------------------------- video


def encode_y4m(frames, fps: tuple[int, int] = (25, 1)) -> bytes:
    """Encode an (n_frames, h, w) uint8 luma array as a YUV4MPEG2
    stream (``Cmono`` colourspace — luma plane only), the
    uncompressed interchange format every video toolchain speaks.
    Real container, real bytes: a text stream header, then one
    ``FRAME\\n`` marker + h·w raw luma bytes per frame."""
    import numpy as np

    a = np.asarray(frames, dtype=np.uint8)
    n, h, w = a.shape
    hdr = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n"
    out = [hdr.encode("ascii")]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(a[i].tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes):
    """Decode a ``Cmono`` YUV4MPEG2 payload into ``(frames, fps)``
    where frames is an (n, h, w) uint8 numpy array.  Real parse:
    stream-header tokens (W/H/F/C), per-frame ``FRAME`` markers
    (frame-header parameters after ``FRAME`` are tolerated).
    Chroma-bearing colourspaces need an external library."""
    import numpy as np

    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    fps = (25, 1)
    for tok in payload[:nl].decode("ascii", "replace").split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            num, den = tok[1:].split(":")
            fps = (int(num), int(den))
        elif tok[0] == "C" and tok[1:] != "mono":
            raise ValueError(f"only Cmono supported, got {tok}")
    if not w or not h:
        raise ValueError("missing W/H in stream header")
    frames = []
    pos = nl + 1
    size = w * h
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos:pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at offset {pos}")
        body = payload[fnl + 1 : fnl + 1 + size]
        if len(body) < size:
            raise ValueError("truncated frame")
        frames.append(np.frombuffer(body, dtype=np.uint8).reshape(h, w))
        pos = fnl + 1 + size
    return np.stack(frames), fps


def video_frame_stats(
    df: DataFrame, id_col: str, payload_col: str, every: int = 2
) -> DataFrame:
    """Frame-sampled luma statistics per video — the frame-extraction
    plumbing a multimodal training pipeline runs before any model
    sees pixels (sample every ``every``-th frame, score it, decide
    what to keep).  REAL executor-side Y4M decode in Arrow-batched
    ``mapInPandas`` (the image/audio discipline: schema, batch shape
    and partitioning are the production path; only the codec set is
    minimal).  Per sampled frame the stats are exact integers:
    ``mean_luma_milli = 1000·Σluma div (h·w)``, min, max.

    Returns (id, n_frames, frame_idx, mean_luma_milli, min_luma,
    max_luma) — one row per SAMPLED frame.
    """
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("mean_luma_milli", T.LongType()),
            T.StructField("min_luma", T.IntegerType()),
            T.StructField("max_luma", T.IntegerType()),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in ("id", "n_frames", "frame_idx",
                                    "mean_luma_milli", "min_luma",
                                    "max_luma")}
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                frames, _ = decode_y4m(bytes(payload))
                n, h, w = frames.shape
                for i in range(0, n, every):
                    f = frames[i].astype(np.int64)
                    rows["id"].append(rid)
                    rows["n_frames"].append(n)
                    rows["frame_idx"].append(i)
                    rows["mean_luma_milli"].append(
                        int(1000 * int(f.sum()) // (h * w))
                    )
                    rows["min_luma"].append(int(f.min()))
                    rows["max_luma"].append(int(f.max()))
            yield pd.DataFrame(
                {
                    "id": pd.Series(rows["id"], dtype="int64"),
                    "n_frames": pd.Series(rows["n_frames"], dtype="int32"),
                    "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                    "mean_luma_milli": pd.Series(
                        rows["mean_luma_milli"], dtype="int64"
                    ),
                    "min_luma": pd.Series(rows["min_luma"], dtype="int32"),
                    "max_luma": pd.Series(rows["max_luma"], dtype="int32"),
                }
            )

    from gis_city_county_spark.operators.scale import rebalance_for_fanout

    src = rebalance_for_fanout(df.select(id_col, payload_col),
                               multiplier=8.0)
    return src.mapInPandas(process, out_schema)


def video_scene_cuts(
    frame_stats: DataFrame, threshold_milli: int = 40_000
) -> DataFrame:
    """Scene-change detection over :func:`video_frame_stats` output —
    the shot segmenter in its exact-integer luma-delta form: a cut is
    a sampled frame whose mean luma jumped at least
    ``threshold_milli`` (milli-luma units) from the previous SAMPLED
    frame of the same video.  Group-partitioned lag window only —
    never a global sort.

    Returns (id, frame_idx, prev_idx, delta_milli) — one row per
    detected cut, ordered by (id, frame_idx).
    """
    w = Window.partitionBy("id").orderBy(F.col("frame_idx").asc())
    lagged = frame_stats.select(
        "id",
        "frame_idx",
        F.lag("frame_idx").over(w).alias("prev_idx"),
        (F.col("mean_luma_milli")
         - F.lag("mean_luma_milli").over(w)).alias("__delta"),
    )
    return (
        lagged.filter(
            F.col("prev_idx").isNotNull()
            & (F.abs(F.col("__delta")) >= threshold_milli)
        )
        .select(
            "id", "frame_idx", "prev_idx",
            F.abs(F.col("__delta")).cast("bigint").alias("delta_milli"),
        )
        .orderBy("id", "frame_idx")
    )
