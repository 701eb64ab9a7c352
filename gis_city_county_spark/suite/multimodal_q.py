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


def _fixture_bmps(spark: SparkSession) -> DataFrame:
    """Deterministic BMP fixtures: image i is (4 + i%3)×(3 + i%2) with
    pixel value (i*31 + y*7 + x*3 + c*11) % 256 at channel c — the
    formula is re-derivable in pure SQL, so the oracle independently
    checks that decode inverts encode."""
    import numpy as np

    from gis_city_county_spark.operators.multimodal import encode_bmp

    rows = []
    for i in range(8):
        w, h = 4 + i % 3, 3 + i % 2
        y, x, c = np.ogrid[0:h, 0:w, 0:3]
        img = ((i * 31 + y * 7 + x * 3 + c * 11) % 256).astype(np.uint8)
        rows.append((i, bytearray(encode_bmp(img))))
    return spark.createDataFrame(rows, "img_id long, payload binary")


def q_image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode: BMP fixtures round-trip through
    encode_bmp → executor-side decode_image → per-channel sums."""
    from gis_city_county_spark.operators.multimodal import image_stats

    return image_stats(_fixture_bmps(spark), "img_id", "payload")


_IMAGE_DECODE_ORACLE = """
WITH g AS (
  SELECT i, 4 + i % 3 AS w, 3 + i % 2 AS h
  FROM (SELECT unnest(generate_series(0, 7)) AS i)
),
px AS (
  SELECT g.i, g.w, g.h, y.y, x.x
  FROM g,
       LATERAL UNNEST(generate_series(0, g.h - 1)) y(y),
       LATERAL UNNEST(generate_series(0, g.w - 1)) x(x)
)
SELECT i AS img_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(SUM((i*31 + y*7 + x*3) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((i*31 + y*7 + x*3 + 11) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((i*31 + y*7 + x*3 + 22) % 256) AS BIGINT) AS sum_b
FROM px GROUP BY 1, 2, 3
"""


def q_image_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize: 8×8 formula BMPs nearest-neighbor downsampled to
    4×4 in the executors (mapInPandas over resize_image), then decoded
    stats — resized pixel (y,x) must equal source pixel (2y,2x), which
    the oracle recomputes arithmetically."""
    import numpy as np

    from gis_city_county_spark.operators.multimodal import encode_bmp, image_stats

    rows = []
    for i in range(6):
        y, x, c = np.ogrid[0:8, 0:8, 0:3]
        img = ((i * 31 + y * 7 + x * 3 + c * 11) % 256).astype(np.uint8)
        rows.append((i, bytearray(encode_bmp(img))))
    src = spark.createDataFrame(rows, "img_id long, payload binary")

    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from gis_city_county_spark.operators.multimodal import resize_image

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "img_id": pdf["img_id"],
                    "payload": pdf["payload"].map(
                        lambda b: resize_image(bytes(b), 4, 4)
                    ),
                }
            )

    schema = T.StructType(
        [T.StructField("img_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    resized = src.mapInPandas(do_resize, schema)
    return image_stats(resized, "img_id", "payload")


_IMAGE_RESIZE_ORACLE = """
WITH px AS (
  SELECT g.i, y.y, x.x
  FROM (SELECT unnest(generate_series(0, 5)) AS i) g,
       LATERAL UNNEST(generate_series(0, 3)) y(y),
       LATERAL UNNEST(generate_series(0, 3)) x(x)
)
SELECT i AS img_id, CAST(4 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
       CAST(SUM((i*31 + (y*2)*7 + (x*2)*3) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((i*31 + (y*2)*7 + (x*2)*3 + 11) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((i*31 + (y*2)*7 + (x*2)*3 + 22) % 256) AS BIGINT) AS sum_b
FROM px GROUP BY 1
"""


def q_audio_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode: PCM WAV fixtures (16-bit mono, formulaic
    samples) round-trip through encode_wav → executor-side
    decode_audio → integer amplitude stats."""
    import numpy as np

    from gis_city_county_spark.operators.multimodal import audio_stats, encode_wav

    rows = []
    for i in range(8):
        n = 50 + 10 * (i % 4)
        j = np.arange(n)
        samples = ((i * 13 + j * 7) % 200) - 100
        rows.append((i, bytearray(encode_wav(samples, 8000 + 100 * i, bits=16))))
    clips = spark.createDataFrame(rows, "clip_id long, payload binary")
    return audio_stats(clips, "clip_id", "payload")


_AUDIO_DECODE_ORACLE = """
WITH g AS (SELECT unnest(generate_series(0, 7)) AS i),
s AS (
  SELECT g.i, ((g.i*13 + j.j*7) % 200) - 100 AS v
  FROM g, LATERAL UNNEST(generate_series(0, 50 + 10*(g.i%4) - 1)) j(j)
)
SELECT i AS clip_id,
       CAST(50 + 10*(i%4) AS BIGINT) AS n_samples,
       CAST(8000 + 100*i AS INTEGER) AS sample_rate,
       CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
       CAST(MAX(ABS(v)) AS BIGINT) AS peak
FROM s GROUP BY 1, 2, 3
"""


def q_patch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT patch-grid plan over REAL decoded BMP dims (patch=2):
    pad-to-patch geometry + per-image token budget — the row a
    multimodal packer materializes so sequence packing never
    re-decodes."""
    from gis_city_county_spark.operators.multimodal import patch_plan

    return patch_plan(_fixture_bmps(spark), "img_id", "payload", patch=2)


# The oracle re-derives the plan from the fixture dimension formula
# (w = 4 + i%3, h = 3 + i%2) — decode must invert encode for the
# dims, and the geometry is pure integer arithmetic.
_PATCH_PLAN_ORACLE = """
WITH g AS (
  SELECT i, 4 + i % 3 AS w, 3 + i % 2 AS h
  FROM (SELECT unnest(generate_series(0, 7)) AS i)
)
SELECT i AS img_id,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(((w + 1) // 2) * 2 - w AS INTEGER) AS pad_w,
       CAST(((h + 1) // 2) * 2 - h AS INTEGER) AS pad_h,
       CAST((w + 1) // 2 AS INTEGER) AS n_patch_x,
       CAST((h + 1) // 2 AS INTEGER) AS n_patch_y,
       CAST(((w + 1) // 2) * ((h + 1) // 2) AS BIGINT) AS n_patches,
       CAST(((w + 1) // 2) * ((h + 1) // 2) + 1 AS BIGINT) AS n_tokens
FROM g
"""


def q_aspect_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SDXL-style aspect-ratio bucket assignment over REAL decoded BMP
    dims: nearest ladder bucket by exact cross-multiplied aspect error
    + the center-crop pixel waste in ppm."""
    from gis_city_county_spark.operators.multimodal import aspect_bucket_plan

    return aspect_bucket_plan(_fixture_bmps(spark), "img_id", "payload")


def _aspect_bucket_oracle() -> str:
    # dims re-derived from the fixture formula (decode must invert
    # encode), the bucketing itself shared with the Spark side
    from gis_city_county_spark.operators.multimodal import (
        aspect_bucket_plan_sql,
    )

    dims = (
        "SELECT i AS img_id, CAST(4 + i % 3 AS INTEGER) AS width,"
        " CAST(3 + i % 2 AS INTEGER) AS height"
        " FROM (SELECT unnest(generate_series(0, 7)) AS i)"
    )
    return aspect_bucket_plan_sql(dims, "img_id")


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved text+image token budget per document: BPE-ish text
    tokens + ViT patch tokens (REAL decode on the BMP fixtures, image
    assigned by doc_id % 8) + 2 separators, with the 128-token packing
    bucket."""
    from gis_city_county_spark.operators.multimodal import (
        multimodal_token_budget,
    )

    docs = load_table(spark, sf_dir, "documents")
    return multimodal_token_budget(
        docs, _fixture_bmps(spark), "doc_id", "text",
        F.col("doc_id") % 8, "img_id", "payload",
        patch=2, sep_tokens=2, bucket=128,
    )


def _token_budget_oracle() -> str:
    from gis_city_county_spark.operators.textstats import bpe_token_count_sql

    # Image side re-derived from the fixture formula (w=4+i%3, h=3+i%2,
    # patch=2 ⇒ tokens = ceil(w/2)·ceil(h/2) + 1), text side from the
    # shared BPE regex; decode must invert encode for the dims.
    return f"""
WITH img AS (
  SELECT i AS img, ((4 + i % 3 + 1) // 2) * ((3 + i % 2 + 1) // 2) + 1
           AS image_tokens
  FROM (SELECT unnest(generate_series(0, 7)) AS i)
),
txt AS (
  SELECT doc_id, CAST({bpe_token_count_sql('text')} AS BIGINT) AS text_tokens,
         doc_id % 8 AS img
  FROM documents
)
SELECT doc_id, text_tokens,
       CAST(image_tokens AS BIGINT) AS image_tokens,
       CAST(text_tokens + image_tokens + 2 AS BIGINT) AS budget_tokens,
       CAST((text_tokens + image_tokens + 2) // 128 AS BIGINT) AS seq_bucket
FROM txt JOIN img USING (img)
"""




def _dhash_fixture_bmps(spark: SparkSession) -> DataFrame:
    """Deterministic 16×12 BMP fixtures for the perceptual-hash ops:
    channel c of image i at pixel (y, x) is ``(b + y·ym + x·xm +
    c·11 + tweak) % 256`` where the structure driver ``j = 0 for
    i ≤ 2 else i`` sets ``b = j·37, ym = 7 + 11·(j%4), xm = 3 +
    5·(j%3)`` — images 0 and 1 are bit-identical (an exact duplicate
    pair),
    image 2 adds +100 to R at the SAMPLED pixel (y=6, x=7) only (a
    near-duplicate within a couple of dHash bits), the rest are
    unrelated.  The formula is re-derivable in pure SQL, so the
    oracle recomputes the full hash from pixel arithmetic."""
    import numpy as np

    from gis_city_county_spark.operators.multimodal import encode_bmp

    rows = []
    for i in range(10):
        j = 0 if i <= 2 else i
        base, ym, xm = j * 37, 7 + 11 * (j % 4), 3 + 5 * (j % 3)
        y, x, c = np.ogrid[0:12, 0:16, 0:3]
        img = (base + y * ym + x * xm + c * 11).astype(np.int64)
        if i == 2:
            img[6, 7, 0] += 100
        rows.append((i, bytearray(encode_bmp((img % 256).astype(np.uint8)))))
    return spark.createDataFrame(rows, "img_id long, payload binary")


def q_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL perceptual hashing: BMP fixtures round-trip through
    encode_bmp → executor-side decode → integer luma → 9×8
    nearest-neighbor grid → 64 difference bits in two 32-bit
    halves."""
    from gis_city_county_spark.operators.multimodal import image_dhash

    return image_dhash(_dhash_fixture_bmps(spark), "img_id", "payload")


# The oracle recomputes the ENTIRE hash from the fixture formula:
# luma (77R + 150G + 29B) // 256 at the nearest-neighbor sample
# points sy = (y·12)//8, sx = (x·16)//9, then difference bits packed
# little-endian into the two halves.
_DHASH_PIXELS = """
imgs AS (
  SELECT i, j * 37 AS b, 7 + 11 * (j % 4) AS ym, 3 + 5 * (j % 3) AS xm
  FROM (SELECT i, CASE WHEN i <= 2 THEN 0 ELSE i END AS j
        FROM (SELECT unnest(generate_series(0, 9)) AS i))
),
g AS (
  SELECT imgs.i, y.y8, x.x9,
         (y.y8 * 12) // 8 AS sy, (x.x9 * 16) // 9 AS sx
  FROM imgs,
       LATERAL UNNEST(generate_series(0, 7)) y(y8),
       LATERAL UNNEST(generate_series(0, 8)) x(x9)
),
px AS (
  SELECT i, y8, x9,
         (77 * ((b + sy*ym + sx*xm
                 + CASE WHEN i = 2 AND sy = 6 AND sx = 7
                        THEN 100 ELSE 0 END) % 256)
          + 150 * ((b + sy*ym + sx*xm + 11) % 256)
          + 29 * ((b + sy*ym + sx*xm + 22) % 256)) // 256 AS gray
  FROM g JOIN imgs USING (i)
),
bits AS (
  SELECT i, y8, x9 AS x,
         CASE WHEN LEAD(gray) OVER (PARTITION BY i, y8 ORDER BY x9)
                   > gray THEN 1 ELSE 0 END AS bit
  FROM px
  QUALIFY x9 <= 7
),
hashes AS (
  SELECT i AS img_id,
         CAST(SUM(CASE WHEN y8 <= 3
                       THEN bit * (CAST(1 AS BIGINT) << (y8 * 8 + x))
                       ELSE 0 END) AS BIGINT) AS dhash_hi,
         CAST(SUM(CASE WHEN y8 >= 4
                       THEN bit * (CAST(1 AS BIGINT) << ((y8 - 4) * 8 + x))
                       ELSE 0 END) AS BIGINT) AS dhash_lo
  FROM bits GROUP BY i
)
"""

_DHASH_ORACLE = f"""
WITH {_DHASH_PIXELS}
SELECT img_id, CAST(16 AS INTEGER) AS width, CAST(12 AS INTEGER) AS height,
       dhash_hi, dhash_lo
FROM hashes
"""


def q_dhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded near-duplicate image pairs over the dHash fixtures:
    the exact-dup pair (0,1) at Hamming 0 and the tweaked image 2 a
    few bits away, found via the pigeonhole half-match join, never
    all pairs."""
    from gis_city_county_spark.operators.multimodal import (
        dhash_near_pairs,
        image_dhash,
    )

    hashes = image_dhash(_dhash_fixture_bmps(spark), "img_id", "payload")
    return dhash_near_pairs(hashes, "img_id", max_hamming=6)


# 8 × 8-bit pigeonhole bands (4 per 32-bit half) — guaranteed recall
# for Hamming < 8, mirroring operators.multimodal.dhash_near_pairs.
# The operator's md5-rank bucket cap (max_bucket=256) cannot bind on
# the 10-image fixture (≤ 10 members per bucket), so the twin omits
# the rank window; the binding-cap behavior is pinned by
# tests/test_round10_operators.py's subset assertion instead.
_DHASH_BAND_ROWS = "\n  UNION ALL\n  ".join(
    f"SELECT img_id, dhash_hi, dhash_lo, {src_i * 4 + i} AS band_idx,"
    f" ({src} >> {i * 8}) & 255 AS band_val FROM hashes"
    for src_i, src in enumerate(("dhash_hi", "dhash_lo"))
    for i in range(4)
)

_DHASH_PAIRS_ORACLE = f"""
WITH {_DHASH_PIXELS},
banded AS (
  {_DHASH_BAND_ROWS}
),
cand AS (
  SELECT DISTINCT a.img_id AS a_id, b.img_id AS b_id,
         CAST(bit_count(xor(a.dhash_hi, b.dhash_hi))
              + bit_count(xor(a.dhash_lo, b.dhash_lo)) AS BIGINT)
           AS hamming
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.img_id < b.img_id
)
SELECT a_id, b_id, hamming FROM cand
WHERE hamming <= 6
ORDER BY hamming, a_id, b_id
"""




def _audio_fp_fixture_wavs(spark: SparkSession) -> DataFrame:
    """Deterministic 16-bit mono WAV fixtures for the landmark
    fingerprint ops: clip i's sample t is ``((i·53 + 7t² + 13t) %
    211) − 105`` — except clip 1, which is clip 0 DELAYED by 128
    samples (two 64-sample windows) with a zero lead-in, so the
    matcher must find the (0, 1) pair dominating at best_offset = +2
    (clip 1's windows lag clip 0's by two).  1024
    samples per clip (16 windows).  The formula is re-derivable in
    pure SQL, so the oracle recomputes every landmark from sample
    arithmetic."""
    import numpy as np

    from gis_city_county_spark.operators.multimodal import encode_wav

    def f(i, t):
        return ((i * 53 + 7 * t * t + 13 * t) % 211) - 105

    rows = []
    t = np.arange(1024)
    for i in range(6):
        if i == 1:
            samples = np.where(t >= 128, f(0, t - 128), 0)
        else:
            samples = f(i, t)
        rows.append((i, bytearray(encode_wav(samples, 8000, bits=16))))
    return spark.createDataFrame(rows, "clip_id long, payload binary")


def q_audio_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL landmark fingerprinting: WAV fixtures round-trip through
    encode_wav → executor-side decode → per-window peak landmarks."""
    from gis_city_county_spark.operators.multimodal import audio_fingerprints

    return audio_fingerprints(
        _audio_fp_fixture_wavs(spark), "clip_id", "payload"
    )


_AUDIO_FP_PEAKS = """
g AS (
  SELECT i.i, t.t,
         CASE WHEN i.i = 1 THEN
           CASE WHEN t.t >= 128
                THEN ((0 * 53 + 7*(t.t-128)*(t.t-128) + 13*(t.t-128))
                      % 211) - 105
                ELSE 0 END
         ELSE ((i.i * 53 + 7*t.t*t.t + 13*t.t) % 211) - 105
         END AS s
  FROM (SELECT unnest(generate_series(0, 5)) AS i) i,
       (SELECT unnest(generate_series(0, 1023)) AS t) t
),
peaks AS (
  SELECT i, t // 64 AS w, t % 64 AS o
  FROM (
    SELECT i, t, ROW_NUMBER() OVER (
             PARTITION BY i, t // 64 ORDER BY ABS(s) DESC, t ASC
           ) AS rn
    FROM g
  ) WHERE rn = 1
),
landmarks AS (
  SELECT a.i AS clip_id, a.w AS win_idx,
         CAST(a.o * 65536 + b.o * 256 + (b.w - a.w) AS BIGINT) AS fp_hash
  FROM peaks a JOIN peaks b
    ON a.i = b.i AND b.w - a.w BETWEEN 1 AND 3
)
"""

_AUDIO_FP_ORACLE = f"""
WITH {_AUDIO_FP_PEAKS}
SELECT clip_id, CAST(win_idx AS BIGINT) AS win_idx, fp_hash
FROM landmarks
"""


def q_audio_fp_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hough-vote clip matching over the landmark fixtures: the
    shifted copy (clips 0, 1) must dominate at one consistent
    offset; unrelated clips must stay below the vote floor."""
    from gis_city_county_spark.operators.multimodal import (
        audio_fingerprint_matches,
        audio_fingerprints,
    )

    fps = audio_fingerprints(
        _audio_fp_fixture_wavs(spark), "clip_id", "payload"
    )
    return audio_fingerprint_matches(fps, "clip_id", min_votes=3)


_AUDIO_FP_MATCH_ORACLE = f"""
WITH {_AUDIO_FP_PEAKS},
votes AS (
  SELECT a.clip_id AS a_id, b.clip_id AS b_id,
         b.win_idx - a.win_idx AS off,
         CAST(COUNT(*) AS BIGINT) AS votes
  FROM landmarks a JOIN landmarks b ON a.fp_hash = b.fp_hash
  WHERE a.clip_id < b.clip_id
  GROUP BY 1, 2, 3
),
best AS (
  SELECT a_id, b_id, off, votes,
         ROW_NUMBER() OVER (PARTITION BY a_id, b_id
                            ORDER BY votes DESC, off ASC) AS rn,
         SUM(votes) OVER (PARTITION BY a_id, b_id) AS n_shared
  FROM votes
)
SELECT a_id, b_id, CAST(n_shared AS BIGINT) AS n_shared,
       CAST(off AS BIGINT) AS best_offset,
       votes AS best_votes
FROM best
WHERE rn = 1 AND votes >= 3
ORDER BY best_votes DESC, a_id, b_id
"""


def _y4m_fixture_vids(spark: SparkSession) -> DataFrame:
    """Deterministic Cmono Y4M fixtures for the video ops: 4 clips ×
    12 frames × 8×8 luma, pixel ``luma(v, f, y, x) = v·13 + f·9 +
    (f ≥ 8 ? 80 : 0) + 2y + x`` — max 239, so nothing wraps and the
    formula is re-derivable in pure SQL.  The +80 step at frame 8 is
    a scene cut every clip shares; within-scene frame deltas are 9
    luma (18 at the every-2 sampling), far under the 40-luma cut
    threshold."""
    import numpy as np

    from gis_city_county_spark.operators.multimodal import encode_y4m

    y, x = np.ogrid[0:8, 0:8]
    rows = []
    for v in range(4):
        frames = np.stack(
            [
                (v * 13 + f * 9 + (80 if f >= 8 else 0) + 2 * y + x)
                .astype(np.uint8)
                for f in range(12)
            ]
        )
        rows.append((v, bytearray(encode_y4m(frames))))
    return spark.createDataFrame(rows, "vid_id long, payload binary")


def q_y4m_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container plumbing: Y4M fixtures round-trip through
    encode_y4m → executor-side stream/FRAME-marker parse → exact
    integer luma stats on every 2nd frame (the frame-extraction
    sampling a multimodal pipeline runs before any model sees
    pixels)."""
    from gis_city_county_spark.operators.multimodal import video_frame_stats

    return video_frame_stats(
        _y4m_fixture_vids(spark), "vid_id", "payload", every=2
    )


def q_y4m_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-change detection over the sampled Y4M frames: the +80
    luma step at frame 8 is the one cut per clip (6→8 in sampled
    indices); within-scene deltas stay far below the threshold."""
    from gis_city_county_spark.operators.multimodal import (
        video_frame_stats,
        video_scene_cuts,
    )

    stats = video_frame_stats(
        _y4m_fixture_vids(spark), "vid_id", "payload", every=2
    )
    return video_scene_cuts(stats, threshold_milli=40_000)


# The oracle recomputes every sampled frame's stats from the fixture
# formula (the dHash/audio discipline: pixel arithmetic in pure SQL).
_Y4M_PIXELS = """
fr AS (
  SELECT v.v, f.f
  FROM (SELECT unnest(generate_series(0, 3)) AS v) v,
       LATERAL UNNEST(generate_series(0, 11)) f(f)
  WHERE f.f % 2 = 0
),
px AS (
  SELECT v, f,
         v * 13 + f * 9 + CASE WHEN f >= 8 THEN 80 ELSE 0 END
           + 2 * y.y + x.x AS luma
  FROM fr,
       LATERAL UNNEST(generate_series(0, 7)) y(y),
       LATERAL UNNEST(generate_series(0, 7)) x(x)
),
stats AS (
  SELECT v AS id, CAST(12 AS INTEGER) AS n_frames,
         CAST(f AS INTEGER) AS frame_idx,
         CAST((1000 * SUM(luma)) // 64 AS BIGINT) AS mean_luma_milli,
         CAST(MIN(luma) AS INTEGER) AS min_luma,
         CAST(MAX(luma) AS INTEGER) AS max_luma
  FROM px GROUP BY v, f
)
"""

_Y4M_STATS_ORACLE = f"""
WITH {_Y4M_PIXELS}
SELECT id, n_frames, frame_idx, mean_luma_milli, min_luma, max_luma
FROM stats
"""

_Y4M_CUTS_ORACLE = f"""
WITH {_Y4M_PIXELS},
lagged AS (
  SELECT id, frame_idx,
         LAG(frame_idx) OVER (PARTITION BY id ORDER BY frame_idx)
           AS prev_idx,
         ABS(mean_luma_milli
             - LAG(mean_luma_milli)
               OVER (PARTITION BY id ORDER BY frame_idx)) AS delta_milli
  FROM stats
)
SELECT id, frame_idx, prev_idx, CAST(delta_milli AS BIGINT) AS delta_milli
FROM lagged
WHERE prev_idx IS NOT NULL AND delta_milli >= 40000
ORDER BY id, frame_idx
"""


SPECS = [
    QuerySpec("mm_token_budget", q_token_budget, _token_budget_oracle()),
    QuerySpec("mm_binary_features", q_binary_features, _BINARY_ORACLE),
    QuerySpec("mm_aspect_bucket", q_aspect_bucket, _aspect_bucket_oracle(),
              bench=False),
    QuerySpec("mm_patch_plan", q_patch_plan, _PATCH_PLAN_ORACLE, bench=False),
    QuerySpec("mm_frame_sample", q_frame_sample, _FRAME_ORACLE),
    QuerySpec("mm_audio_windows", q_audio_windows, _AUDIO_ORACLE),
    QuerySpec("mm_shot_boundaries", q_shot_boundaries, _SHOT_ORACLE),
    QuerySpec("mm_image_decode_stats", q_image_decode_stats, _IMAGE_DECODE_ORACLE, bench=False),
    QuerySpec("mm_image_resize_stats", q_image_resize_stats, _IMAGE_RESIZE_ORACLE, bench=False),
    QuerySpec("mm_audio_decode_stats", q_audio_decode_stats, _AUDIO_DECODE_ORACLE, bench=False),
    QuerySpec("mm_image_dhash", q_image_dhash, _DHASH_ORACLE, bench=False),
    QuerySpec("mm_dhash_near_pairs", q_dhash_near_pairs,
              _DHASH_PAIRS_ORACLE, bench=False),
    QuerySpec("mm_audio_fingerprints", q_audio_fingerprints,
              _AUDIO_FP_ORACLE, bench=False),
    QuerySpec("mm_audio_fp_matches", q_audio_fp_matches,
              _AUDIO_FP_MATCH_ORACLE, bench=False),
    QuerySpec("mm_y4m_frame_stats", q_y4m_frame_stats,
              _Y4M_STATS_ORACLE, bench=False),
    QuerySpec("mm_y4m_scene_cuts", q_y4m_scene_cuts,
              _Y4M_CUTS_ORACLE, bench=False),
]
