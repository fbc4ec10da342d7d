"""Multimodal queries: real BMP/PNG/WAV/AVI codecs through Arrow-batched Pandas
UDFs, oracle-checked.

The engine writes a byte-correct media file per document and then parses
its binary header with ``struct`` (operators/multimodal.py). The oracle
recomputes every decoded field — including the exact payload byte size —
from the deterministic generation rule, so a wrong writer (bad header
layout, wrong padding) or a wrong parser (misread offset, wrong chunk
walk) fails the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.operators import multimodal as M
from similarity_search_with_hadoop_mapreduce_spark.registry.base import register, table

# the generation rule (operators.multimodal._media_dims) in SQL
_DIMS_CTE = """
base AS (
  SELECT doc_id, octet_length(encode(text)) AS n_text FROM documents
),
meta AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN 'bmp'
              WHEN doc_id % 2 = 0 THEN 'png'
              ELSE 'wav' END AS format,
         CASE WHEN doc_id % 2 = 0 THEN CAST(n_text % 64 + 1 AS INTEGER) END
           AS width,
         CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 48 + 1 AS INTEGER) END
           AS height,
         CASE WHEN doc_id % 2 = 1
              THEN CAST(([8000, 16000, 22050, 44100])[CAST(doc_id % 4 AS INTEGER) + 1]
                   AS INTEGER) END AS sample_rate,
         CASE WHEN doc_id % 2 = 1 THEN CAST(n_text % 500 + 50 AS INTEGER) END
           AS n_samples
  FROM base
)
"""


# the aHash generation-rule replay: 64 nearest-neighbor samples of the
# deterministic gradient v(x,y) = (3x + 7y + doc_id) % 256 per BMP,
# exact-integer mean compare, packed into four 16-bit bands.
# _AHASH_CORE expects an upstream CTE ``base(doc_id, n_text)``.
_AHASH_CORE = """
imgs AS (
  SELECT doc_id, CAST(n_text % 64 + 1 AS INTEGER) AS w,
         CAST(doc_id % 48 + 1 AS INTEGER) AS h
  FROM base WHERE doc_id % 2 = 0
),
grid AS (SELECT gx.i AS bx, gy.i AS by FROM range(8) gx(i), range(8) gy(i)),
samples AS (
  SELECT doc_id, w, h, by * 8 + bx AS b,
         (3 * ((2 * bx + 1) * w // 16)
          + 7 * ((2 * by + 1) * h // 16) + doc_id) % 256 AS v
  FROM imgs, grid
),
tot AS (SELECT doc_id, sum(v) AS total FROM samples GROUP BY doc_id),
bits AS (
  SELECT s.doc_id, s.b,
         CASE WHEN s.v * 64 >= t.total THEN 1 ELSE 0 END AS bit
  FROM samples s JOIN tot t USING (doc_id)
),
ahash_hashes AS (
  SELECT i.doc_id, i.w AS width, i.h AS height,
         CAST(sum(CASE WHEN b // 16 = 0 THEN bit * (1 << (b % 16)) ELSE 0 END)
              AS INTEGER) AS b0,
         CAST(sum(CASE WHEN b // 16 = 1 THEN bit * (1 << (b % 16)) ELSE 0 END)
              AS INTEGER) AS b1,
         CAST(sum(CASE WHEN b // 16 = 2 THEN bit * (1 << (b % 16)) ELSE 0 END)
              AS INTEGER) AS b2,
         CAST(sum(CASE WHEN b // 16 = 3 THEN bit * (1 << (b % 16)) ELSE 0 END)
              AS INTEGER) AS b3
  FROM bits JOIN imgs i USING (doc_id) GROUP BY i.doc_id, i.w, i.h
)
"""

_AHASH_CTE = (
    """
base AS (
  SELECT doc_id, octet_length(encode(text)) AS n_text FROM documents
),"""
    + _AHASH_CORE
)

# the audio energy-fingerprint generation-rule replay: int16 sawtooth
# s(i) = ((37 i + doc_id) % 2001) - 1000, 64 frames (sample i -> frame
# i*64//n), bit = frame |energy| >= mean frame energy (exact integers).
# Expects an upstream CTE ``base(doc_id, n_text)``.
_AUDIO_CORE = """
wavs AS (
  SELECT doc_id, CAST(n_text % 500 + 50 AS INTEGER) AS n
  FROM base WHERE doc_id % 2 = 1
),
sidx AS (SELECT doc_id, n, unnest(range(n)) AS i FROM wavs),
svals AS (
  SELECT doc_id, CAST(i * 64 // n AS INTEGER) AS f,
         abs(((37 * i + doc_id) % 2001) - 1000) AS a
  FROM sidx
),
aframes AS (SELECT doc_id, f, sum(a) AS e FROM svals GROUP BY doc_id, f),
atot AS (SELECT doc_id, sum(e) AS te FROM aframes GROUP BY doc_id),
afbits AS (
  SELECT fr.doc_id, fr.f,
         CASE WHEN fr.e * 64 >= t.te THEN 1 ELSE 0 END AS bit
  FROM aframes fr JOIN atot t USING (doc_id)
),
audio_hashes AS (
  SELECT w.doc_id, w.n AS n_samples,
         CAST(sum(CASE WHEN f // 16 = 0 THEN bit * (1 << (f % 16)) ELSE 0 END)
              AS INTEGER) AS b0,
         CAST(sum(CASE WHEN f // 16 = 1 THEN bit * (1 << (f % 16)) ELSE 0 END)
              AS INTEGER) AS b1,
         CAST(sum(CASE WHEN f // 16 = 2 THEN bit * (1 << (f % 16)) ELSE 0 END)
              AS INTEGER) AS b2,
         CAST(sum(CASE WHEN f // 16 = 3 THEN bit * (1 << (f % 16)) ELSE 0 END)
              AS INTEGER) AS b3
  FROM afbits JOIN wavs w USING (doc_id) GROUP BY w.doc_id, w.n
)
"""

_AUDIO_CTE = (
    """
base AS (
  SELECT doc_id, octet_length(encode(text)) AS n_text FROM documents
),"""
    + _AUDIO_CORE
)




# the per-frame video aHash generation-rule replay: gradient
# v(x,y,f) = (3x + 7y + 11f + doc_id) % 256 per AVI frame.
# Expects an upstream CTE ``base(doc_id, n_text)``.
_VIDEO_CORE = """
vids AS (
  SELECT doc_id, CAST(n_text % 16 + 4 AS INTEGER) AS w,
         CAST(doc_id % 12 + 4 AS INTEGER) AS h,
         CAST(doc_id % 5 + 2 AS INTEGER) AS nf
  FROM base
),
vframes AS (
  SELECT doc_id, w, h, CAST(unnest(range(nf)) AS INTEGER) AS frame_idx
  FROM vids
),
vgrid AS (SELECT gx.i AS bx, gy.i AS by FROM range(8) gx(i), range(8) gy(i)),
vsamples AS (
  SELECT doc_id, frame_idx, w, h, by * 8 + bx AS b,
         (3 * ((2 * bx + 1) * w // 16)
          + 7 * ((2 * by + 1) * h // 16)
          + 11 * frame_idx + doc_id) % 256 AS v
  FROM vframes, vgrid
),
vtot AS (
  SELECT doc_id, frame_idx, sum(v) AS total
  FROM vsamples GROUP BY doc_id, frame_idx
),
vbits AS (
  SELECT s.doc_id, s.frame_idx, s.b,
         CASE WHEN s.v * 64 >= t.total THEN 1 ELSE 0 END AS bit
  FROM vsamples s JOIN vtot t USING (doc_id, frame_idx)
),
video_hashes AS (
  SELECT f.doc_id, f.frame_idx, f.w AS width, f.h AS height,
         CAST(sum(CASE WHEN b // 16 = 0 THEN bit * (1 << (b % 16)) ELSE 0 END)
              AS INTEGER) AS b0,
         CAST(sum(CASE WHEN b // 16 = 1 THEN bit * (1 << (b % 16)) ELSE 0 END)
              AS INTEGER) AS b1,
         CAST(sum(CASE WHEN b // 16 = 2 THEN bit * (1 << (b % 16)) ELSE 0 END)
              AS INTEGER) AS b2,
         CAST(sum(CASE WHEN b // 16 = 3 THEN bit * (1 << (b % 16)) ELSE 0 END)
              AS INTEGER) AS b3
  FROM vbits b JOIN vframes f USING (doc_id, frame_idx)
  GROUP BY f.doc_id, f.frame_idx, f.w, f.h
)
"""

_VIDEO_CTE = (
    """
base AS (
  SELECT doc_id, octet_length(encode(text)) AS n_text FROM documents
),"""
    + _VIDEO_CORE
)


# the resize generation-rule replay: nearest-neighbor floor mapping
# src = dst * src_dim // dst_dim into the shared gradient, then the same
# 64-sample aHash over the RESIZED 16x12 grid (sample xs2 = 2bx+1,
# ys2 = (2by+1)*12//16). Expects an upstream CTE ``base(doc_id, n_text)``.
_RESIZED_CORE = """
resz AS (
  SELECT doc_id, CAST(n_text % 64 + 1 AS INTEGER) AS w,
         CAST(doc_id % 48 + 1 AS INTEGER) AS h
  FROM base WHERE doc_id % 2 = 0
),
rgrid AS (SELECT gx.i AS bx, gy.i AS by FROM range(8) gx(i), range(8) gy(i)),
rsamples AS (
  SELECT doc_id, by * 8 + bx AS b,
         (3 * ((((2 * bx + 1) * 16) // 16) * w // 16)
          + 7 * ((((2 * by + 1) * 12) // 16) * h // 12)
          + doc_id) % 256 AS v
  FROM resz, rgrid
),
rtot AS (SELECT doc_id, sum(v) AS total FROM rsamples GROUP BY doc_id),
rbits AS (
  SELECT s.doc_id, s.b,
         CASE WHEN s.v * 64 >= t.total THEN 1 ELSE 0 END AS bit
  FROM rsamples s JOIN rtot t USING (doc_id)
),
resized_hashes AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN b // 16 = 0 THEN bit * (1 << (b % 16)) ELSE 0 END)
              AS INTEGER) AS b0,
         CAST(sum(CASE WHEN b // 16 = 1 THEN bit * (1 << (b % 16)) ELSE 0 END)
              AS INTEGER) AS b1,
         CAST(sum(CASE WHEN b // 16 = 2 THEN bit * (1 << (b % 16)) ELSE 0 END)
              AS INTEGER) AS b2,
         CAST(sum(CASE WHEN b // 16 = 3 THEN bit * (1 << (b % 16)) ELSE 0 END)
              AS INTEGER) AS b3
  FROM rbits GROUP BY doc_id
)
"""


# the audio-resample generation-rule replay: duration-preserving
# nearest-sample mapping out_n = n * 16000 // rate, src = i * n // out_n
# into the shared sawtooth, then the same 64-frame energy fingerprint
# over the RESAMPLED stream. Expects an upstream CTE ``base``.
_RESAMPLED_CORE = """
rsw AS (
  SELECT doc_id,
         CAST(n_text % 500 + 50 AS INTEGER) AS n,
         CAST(([8000, 16000, 22050, 44100])[CAST(doc_id % 4 AS INTEGER) + 1]
              AS INTEGER) AS rate
  FROM base WHERE doc_id % 2 = 1
),
rsn AS (
  SELECT doc_id, n, rate, CAST(n * 16000 // rate AS INTEGER) AS out_n
  FROM rsw
),
rsidx AS (SELECT doc_id, n, out_n, unnest(range(out_n)) AS i FROM rsn),
rsvals AS (
  SELECT doc_id, CAST(i * 64 // out_n AS INTEGER) AS f,
         abs(((37 * (i * n // out_n) + doc_id) % 2001) - 1000) AS a
  FROM rsidx
),
rsframes AS (SELECT doc_id, f, sum(a) AS e FROM rsvals GROUP BY doc_id, f),
rstot AS (SELECT doc_id, sum(e) AS te FROM rsframes GROUP BY doc_id),
rsbits AS (
  SELECT fr.doc_id, fr.f,
         CASE WHEN fr.e * 64 >= t.te THEN 1 ELSE 0 END AS bit
  FROM rsframes fr JOIN rstot t USING (doc_id)
),
resampled_hashes AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN f // 16 = 0 THEN bit * (1 << (f % 16)) ELSE 0 END)
              AS INTEGER) AS b0,
         CAST(sum(CASE WHEN f // 16 = 1 THEN bit * (1 << (f % 16)) ELSE 0 END)
              AS INTEGER) AS b1,
         CAST(sum(CASE WHEN f // 16 = 2 THEN bit * (1 << (f % 16)) ELSE 0 END)
              AS INTEGER) AS b2,
         CAST(sum(CASE WHEN f // 16 = 3 THEN bit * (1 << (f % 16)) ELSE 0 END)
              AS INTEGER) AS b3
  FROM rsbits GROUP BY doc_id
)
"""

# JPEG is LOSSY, so the oracle replays the decode through the one shape
# with a closed-form inverse: block-constant content. A flat 8x8 block
# has a single non-zero coefficient (DC = 8*(v-128)); through the
# Annex K DC quantum 16 the decoded value is exactly
# v' = clamp(2*floor((v-128)/2 + 0.5) + 128, 0, 255) — pure integer
# arithmetic both engines agree on. The engine side runs the REAL codec
# (marker walk, canonical huffman decode, dequant, IDCT); the fixture's
# content rule v(x,y) = (3*(x//8) + 7*(y//8) + doc_id) % 256 is what
# makes the lossy round trip SQL-pinnable (operators/jpeg.py docstring).
_JPEG_AHASH_CORE = """
jimgs AS (
  SELECT doc_id, CAST(n_text % 64 + 1 AS INTEGER) AS w,
         CAST(doc_id % 48 + 1 AS INTEGER) AS h
  FROM base
),
jgrid AS (SELECT gx.i AS bx, gy.i AS by FROM range(8) gx(i), range(8) gy(i)),
jsamples AS (
  SELECT doc_id, w, h, by * 8 + bx AS b,
         least(255, greatest(0,
           2 * CAST(floor(
             ((3 * (((2 * bx + 1) * w // 16) // 8)
               + 7 * (((2 * by + 1) * h // 16) // 8)
               + doc_id) % 256 - 128) / 2.0 + 0.5) AS BIGINT) + 128))
           AS v
  FROM jimgs, jgrid
),
jtot AS (SELECT doc_id, sum(v) AS total FROM jsamples GROUP BY doc_id),
jbits AS (
  SELECT s.doc_id, s.b,
         CASE WHEN s.v * 64 >= t.total THEN 1 ELSE 0 END AS bit
  FROM jsamples s JOIN jtot t USING (doc_id)
),
jpeg_hashes AS (
  SELECT i.doc_id, i.w AS width, i.h AS height,
         CAST(sum(CASE WHEN b // 16 = 0 THEN bit * (1 << (b % 16)) ELSE 0 END)
              AS INTEGER) AS b0,
         CAST(sum(CASE WHEN b // 16 = 1 THEN bit * (1 << (b % 16)) ELSE 0 END)
              AS INTEGER) AS b1,
         CAST(sum(CASE WHEN b // 16 = 2 THEN bit * (1 << (b % 16)) ELSE 0 END)
              AS INTEGER) AS b2,
         CAST(sum(CASE WHEN b // 16 = 3 THEN bit * (1 << (b % 16)) ELSE 0 END)
              AS INTEGER) AS b3
  FROM jbits JOIN jimgs i USING (doc_id) GROUP BY i.doc_id, i.w, i.h
)
"""

_JPEG_AHASH_CTE = (
    """
base AS (
  SELECT doc_id, octet_length(encode(text)) AS n_text FROM documents
),"""
    + _JPEG_AHASH_CORE
)


_JPEG_RESIZE_CORE = """
jrgrid AS (SELECT gx.i AS bx, gy.i AS by FROM range(8) gx(i), range(8) gy(i)),
jrsamples AS (
  SELECT doc_id, by * 8 + bx AS b,
         least(255, greatest(0,
           2 * CAST(floor(
             ((3 * (((((2 * bx + 1) * 16) // 16) * w // 16) // 8)
               + 7 * (((((2 * by + 1) * 12) // 16) * h // 12) // 8)
               + doc_id) % 256 - 128) / 2.0 + 0.5) AS BIGINT) + 128))
           AS v
  FROM jimgs, jrgrid
),
jrtot AS (SELECT doc_id, sum(v) AS total FROM jrsamples GROUP BY doc_id),
jrbits AS (
  SELECT s.doc_id, s.b,
         CASE WHEN s.v * 64 >= t.total THEN 1 ELSE 0 END AS bit
  FROM jrsamples s JOIN jrtot t USING (doc_id)
),
jpeg_resized AS (
  SELECT doc_id,
         CAST(16 AS INTEGER) AS width, CAST(12 AS INTEGER) AS height,
         CAST(68 + 17 * 12 AS INTEGER) AS n_bytes,
         CAST(sum(CASE WHEN b // 16 = 0 THEN bit * (1 << (b % 16)) ELSE 0 END)
              AS INTEGER) AS b0,
         CAST(sum(CASE WHEN b // 16 = 1 THEN bit * (1 << (b % 16)) ELSE 0 END)
              AS INTEGER) AS b1,
         CAST(sum(CASE WHEN b // 16 = 2 THEN bit * (1 << (b % 16)) ELSE 0 END)
              AS INTEGER) AS b2,
         CAST(sum(CASE WHEN b // 16 = 3 THEN bit * (1 << (b % 16)) ELSE 0 END)
              AS INTEGER) AS b3
  FROM jrbits GROUP BY doc_id
)
"""

_JPEG_RESIZE_CTE = (
    """
base AS (
  SELECT doc_id, octet_length(encode(text)) AS n_text FROM documents
),"""
    + _JPEG_AHASH_CORE
    + ","
    + _JPEG_RESIZE_CORE
)




@register(
    "multimodal_video_subsample",
    oracle="WITH base AS (\n"
    "  SELECT doc_id, octet_length(encode(text)) AS n_text FROM documents\n"
    "),"
    + _VIDEO_CORE
    + """
SELECT v.doc_id,
       CAST(h.frame_idx // 2 AS INTEGER) AS frame_idx,
       v.w AS width, v.h AS height,
       CAST((v.nf + 1) // 2 AS INTEGER) AS n_frames,
       CAST(224 + ((v.nf + 1) // 2)
                  * (8 + ((v.w * 3 + 3) // 4 * 4) * v.h) AS INTEGER)
         AS n_bytes,
       h.b0, h.b1, h.b2, h.b3
FROM vids v JOIN video_hashes h USING (doc_id)
WHERE h.frame_idx % 2 = 0
""",
)
def multimodal_video_subsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame subsampling through the container codec (r7):
    walk every AVI's movi list, keep every 2nd frame, re-encode a
    byte-correct AVI — then prove the output is a real video by running
    :func:`operators.multimodal.video_frame_hashes` ON THE SUBSAMPLED
    PAYLOAD (a second full container decode). One row per kept frame;
    the oracle re-derives the new frame indices, the closed-form
    container byte size, and all 64 hash bits of each kept frame (which
    must equal the ORIGINAL frames at the even source indices)."""
    docs = table(spark, sf_dir, "documents")
    vs = M.video_subsample(M.attach_video_payload(docs), every_n=2)
    hashes = M.video_frame_hashes(vs.select("doc_id", "payload")).select(
        "doc_id", "frame_idx", "b0", "b1", "b2", "b3"
    )
    return vs.select(
        "doc_id", "width", "height", "n_frames", "n_bytes"
    ).join(hashes, "doc_id").select(
        "doc_id", "frame_idx", "width", "height", "n_frames", "n_bytes",
        "b0", "b1", "b2", "b3",
    )


@register(
    "multimodal_audio_resample",
    oracle="WITH base AS (\n"
    "  SELECT doc_id, octet_length(encode(text)) AS n_text FROM documents\n"
    "),"
    + _RESAMPLED_CORE
    + """
SELECT r.doc_id,
       CAST(16000 AS INTEGER) AS sample_rate,
       r.out_n AS n_samples,
       CAST(44 + 2 * r.out_n AS INTEGER) AS n_bytes,
       h.b0, h.b1, h.b2, h.b3
FROM rsn r JOIN resampled_hashes h USING (doc_id)
""",
)
def multimodal_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio resample through the codec (r7): decode every WAV's
    int16 samples (RIFF chunk walk), convert to 16 kHz by the
    duration-preserving nearest-sample integer mapping, re-encode a
    byte-correct WAV — then prove the output is a real clip by running
    :func:`operators.multimodal.audio_energy_hash` ON THE RESAMPLED
    PAYLOAD (a second full decode). The oracle re-derives the output
    sample count, the exact byte size, and all 64 fingerprint bits of
    the resampled sawtooth."""
    docs = table(spark, sf_dir, "documents")
    rz = M.audio_resample(M.attach_media_payload(docs), out_rate=16000)
    bands = M.audio_energy_hash(rz.select("doc_id", "payload")).select(
        "doc_id", "b0", "b1", "b2", "b3"
    )
    return rz.select("doc_id", "sample_rate", "n_samples", "n_bytes").join(
        bands, "doc_id"
    )


@register(
    "multimodal_image_resize",
    oracle="WITH base AS (\n"
    "  SELECT doc_id, octet_length(encode(text)) AS n_text FROM documents\n"
    "),"
    + _RESIZED_CORE
    + """
SELECT r.doc_id,
       CAST(16 AS INTEGER) AS width,
       CAST(12 AS INTEGER) AS height,
       CAST(68 + 17 * 12 AS INTEGER) AS n_bytes,
       h.b0, h.b1, h.b2, h.b3
FROM resz r JOIN resized_hashes h USING (doc_id)
""",
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize through two codecs (r7): decode every BMP/PNG
    pixel array (PNG: full zlib+unfilter inverse), nearest-neighbor
    resample to 16x12 with the exact-integer floor mapping, re-encode as
    a spec-correct PNG — then prove the output is a real image by
    running :func:`operators.multimodal.image_ahash` ON THE RESIZED
    PAYLOAD (a second full decode). The oracle re-derives the resized
    dims, the closed-form PNG byte size, and all 64 hash bits of the
    resampled gradient — a wrong resample rule, a broken re-encode, or a
    broken re-decode all fail the value hash."""
    docs = table(spark, sf_dir, "documents")
    rz = M.image_resize(M.attach_media_payload(docs), out_w=16, out_h=12)
    bands = M.image_ahash(rz.select("doc_id", "payload")).select(
        "doc_id", "b0", "b1", "b2", "b3"
    )
    return rz.select("doc_id", "width", "height", "n_bytes").join(
        bands, "doc_id"
    )



@register(
    "multimodal_decode_meta",
    oracle="WITH "
    + _DIMS_CTE
    + ","
    + _AHASH_CORE
    + ","
    + _AUDIO_CORE
    + """
SELECT m.doc_id, m.format,
       CAST(CASE WHEN m.format = 'bmp'
                 THEN 54 + ((m.width * 3 + 3) // 4 * 4) * m.height
                 WHEN m.format = 'png'
                 -- sig 8 + IHDR 25 + IDAT 12+overhead + IEND 12 with a
                 -- hand-written stored-deflate stream: one block per
                 -- 65535 raw bytes (dims keep it to one)
                 THEN 63 + (m.width + 1) * m.height
                      + 5 * greatest(1, ((m.width + 1) * m.height + 65534)
                                        // 65535)
                 ELSE 44 + m.n_samples * 2 END AS INTEGER) AS n_bytes,
       m.width, m.height, m.sample_rate, m.n_samples,
       CAST(m.n_samples * 1000 // m.sample_rate AS INTEGER) AS duration_ms,
       CAST(CASE WHEN m.format IN ('bmp', 'png') THEN 1
                 ELSE m.n_samples // 25 + 1 END AS INTEGER) AS n_frames,
       h.b0, h.b1, h.b2, h.b3,
       au.b0 AS a0, au.b1 AS a1, au.b2 AS a2, au.b3 AS a3
FROM meta m
LEFT JOIN ahash_hashes h USING (doc_id)
LEFT JOIN audio_hashes au USING (doc_id)
""",
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media payload → Arrow-batched ``mapInPandas`` decode → typed
    metadata, widened (r6) with the per-payload fingerprints — image
    rows carry the perceptual aHash bands (REAL pixel decoding: header
    offset, bottom-up padded rows, 64 sampled pixels), audio rows the
    energy-fingerprint bands (REAL sample decoding: RIFF chunk walk,
    int16 unpack, 64-frame energy profile); the other modality's bands
    are NULL. The payloads are real files and the decode genuinely
    parses bytes with ``struct``; the oracle re-derives every field —
    file size, dims, AND all 128 fingerprint bits — from the generation
    rules."""
    docs = table(spark, sf_dir, "documents")
    mm = M.attach_media_payload(docs)
    meta = M.decode_media(mm)
    bands = M.image_ahash(mm).select("doc_id", "b0", "b1", "b2", "b3")
    abands = M.audio_energy_hash(mm).select(
        "doc_id",
        F.col("b0").alias("a0"),
        F.col("b1").alias("a1"),
        F.col("b2").alias("a2"),
        F.col("b3").alias("a3"),
    )
    return meta.join(bands, "doc_id", "left").join(abands, "doc_id", "left")


@register(
    "multimodal_frame_sample",
    oracle="WITH "
    + _DIMS_CTE
    + ","
    + _AHASH_CORE
    + ","
    + _AUDIO_CORE
    + ","
    + _VIDEO_CORE
    + ","
    + _RESIZED_CORE
    + ","
    + _RESAMPLED_CORE
    + ","
    + _JPEG_AHASH_CORE
    + ","
    + _JPEG_RESIZE_CORE
    + """
, frames AS (
  SELECT doc_id,
         CAST(CASE WHEN format IN ('bmp', 'png') THEN 1
                   ELSE n_samples // 25 + 1 END AS INTEGER) AS n_frames
  FROM meta
),
abands AS (
  SELECT doc_id, b0, b1, b2, b3,
         unnest([0, 1, 2, 3]) AS band,
         unnest([b0, b1, b2, b3]) AS bh
  FROM ahash_hashes
),
img_pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(CAST(a.b0 AS BIGINT), CAST(b.b0 AS BIGINT)))
              + bit_count(xor(CAST(a.b1 AS BIGINT), CAST(b.b1 AS BIGINT)))
              + bit_count(xor(CAST(a.b2 AS BIGINT), CAST(b.b2 AS BIGINT)))
              + bit_count(xor(CAST(a.b3 AS BIGINT), CAST(b.b3 AS BIGINT)))
              AS INTEGER) AS hamming
  FROM abands a JOIN abands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
  WHERE bit_count(xor(CAST(a.b0 AS BIGINT), CAST(b.b0 AS BIGINT)))
        + bit_count(xor(CAST(a.b1 AS BIGINT), CAST(b.b1 AS BIGINT)))
        + bit_count(xor(CAST(a.b2 AS BIGINT), CAST(b.b2 AS BIGINT)))
        + bit_count(xor(CAST(a.b3 AS BIGINT), CAST(b.b3 AS BIGINT))) <= 3
),
wbands AS (
  SELECT doc_id, b0, b1, b2, b3,
         unnest([0, 1, 2, 3]) AS band,
         unnest([b0, b1, b2, b3]) AS bh
  FROM audio_hashes
),
audio_pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(CAST(a.b0 AS BIGINT), CAST(b.b0 AS BIGINT)))
              + bit_count(xor(CAST(a.b1 AS BIGINT), CAST(b.b1 AS BIGINT)))
              + bit_count(xor(CAST(a.b2 AS BIGINT), CAST(b.b2 AS BIGINT)))
              + bit_count(xor(CAST(a.b3 AS BIGINT), CAST(b.b3 AS BIGINT)))
              AS INTEGER) AS hamming
  FROM wbands a JOIN wbands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
  WHERE bit_count(xor(CAST(a.b0 AS BIGINT), CAST(b.b0 AS BIGINT)))
        + bit_count(xor(CAST(a.b1 AS BIGINT), CAST(b.b1 AS BIGINT)))
        + bit_count(xor(CAST(a.b2 AS BIGINT), CAST(b.b2 AS BIGINT)))
        + bit_count(xor(CAST(a.b3 AS BIGINT), CAST(b.b3 AS BIGINT))) <= 3
)
SELECT 'frame' AS shape, doc_id,
       CAST(n_frames AS BIGINT) AS n1,
       CAST(unnest(range(0, n_frames, 8)) AS BIGINT) AS n2
FROM frames
UNION ALL
SELECT 'img_pair' AS shape, doc_a AS doc_id,
       CAST(doc_b AS BIGINT) AS n1, CAST(hamming AS BIGINT) AS n2
FROM img_pairs
UNION ALL
SELECT 'img_pair_capped' AS shape, doc_a AS doc_id,
       CAST(doc_b AS BIGINT) AS n1, CAST(hamming AS BIGINT) AS n2
FROM (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(CAST(a.b0 AS BIGINT), CAST(b.b0 AS BIGINT)))
              + bit_count(xor(CAST(a.b1 AS BIGINT), CAST(b.b1 AS BIGINT)))
              + bit_count(xor(CAST(a.b2 AS BIGINT), CAST(b.b2 AS BIGINT)))
              + bit_count(xor(CAST(a.b3 AS BIGINT), CAST(b.b3 AS BIGINT)))
              AS INTEGER) AS hamming
  FROM abands a
  JOIN (SELECT band, bh, count(*) AS n, min(doc_id) AS rep
        FROM abands GROUP BY band, bh) c
    ON c.band = a.band AND c.bh = a.bh
  JOIN abands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
  WHERE (c.n <= 4 OR a.doc_id = c.rep)
    AND bit_count(xor(CAST(a.b0 AS BIGINT), CAST(b.b0 AS BIGINT)))
        + bit_count(xor(CAST(a.b1 AS BIGINT), CAST(b.b1 AS BIGINT)))
        + bit_count(xor(CAST(a.b2 AS BIGINT), CAST(b.b2 AS BIGINT)))
        + bit_count(xor(CAST(a.b3 AS BIGINT), CAST(b.b3 AS BIGINT))) <= 3
)
UNION ALL
SELECT 'audio_pair' AS shape, doc_a AS doc_id,
       CAST(doc_b AS BIGINT) AS n1, CAST(hamming AS BIGINT) AS n2
FROM audio_pairs
UNION ALL
SELECT 'vframe_hi' AS shape, doc_id,
       CAST(frame_idx AS BIGINT) AS n1,
       CAST(b0 AS BIGINT) * 65536 + b1 AS n2
FROM video_hashes
UNION ALL
SELECT 'vframe_lo' AS shape, doc_id,
       CAST(frame_idx AS BIGINT) AS n1,
       CAST(b2 AS BIGINT) * 65536 + b3 AS n2
FROM video_hashes
UNION ALL
SELECT 'resized_meta' AS shape, doc_id,
       CAST(68 + 17 * 12 AS BIGINT) AS n1,
       CAST(16 * 1000 + 12 AS BIGINT) AS n2
FROM resz
UNION ALL
SELECT 'resized_hash' AS shape, doc_id,
       CAST(b0 AS BIGINT) * 65536 + b1 AS n1,
       CAST(b2 AS BIGINT) * 65536 + b3 AS n2
FROM resized_hashes
UNION ALL
SELECT 'resampled_meta' AS shape, doc_id,
       CAST(44 + 2 * out_n AS BIGINT) AS n1,
       CAST(out_n AS BIGINT) AS n2
FROM rsn
UNION ALL
SELECT 'resampled_hash' AS shape, doc_id,
       CAST(b0 AS BIGINT) * 65536 + b1 AS n1,
       CAST(b2 AS BIGINT) * 65536 + b3 AS n2
FROM resampled_hashes
UNION ALL
SELECT 'vsub_meta' AS shape, doc_id,
       CAST(224 + ((nf + 1) // 2) * (8 + ((w * 3 + 3) // 4 * 4) * h)
            AS BIGINT) AS n1,
       CAST(((nf + 1) // 2) * 1000000 + w * 1000 + h AS BIGINT) AS n2
FROM vids
UNION ALL
SELECT 'vsub_hi' AS shape, doc_id,
       CAST(frame_idx // 2 AS BIGINT) AS n1,
       CAST(b0 AS BIGINT) * 65536 + b1 AS n2
FROM video_hashes WHERE frame_idx % 2 = 0
UNION ALL
SELECT 'vsub_lo' AS shape, doc_id,
       CAST(frame_idx // 2 AS BIGINT) AS n1,
       CAST(b2 AS BIGINT) * 65536 + b3 AS n2
FROM video_hashes WHERE frame_idx % 2 = 0
UNION ALL
SELECT 'video_pair' AS shape, v.doc_a AS doc_id,
       CAST(v.doc_b AS BIGINT) AS n1,
       CAST(v.matched_frames * 1000000 + least(ca.nf, cb.nf) AS BIGINT) AS n2
FROM (
  SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS matched_frames
  FROM (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.frame_idx
    FROM (SELECT doc_id, frame_idx, b0, b1, b2, b3,
                 unnest([0, 1, 2, 3]) AS band,
                 unnest([b0, b1, b2, b3]) AS bh FROM video_hashes) a
    JOIN (SELECT doc_id, frame_idx, b0, b1, b2, b3,
                 unnest([0, 1, 2, 3]) AS band,
                 unnest([b0, b1, b2, b3]) AS bh FROM video_hashes) b
      ON a.frame_idx = b.frame_idx AND a.band = b.band AND a.bh = b.bh
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(CAST(a.b0 AS BIGINT), CAST(b.b0 AS BIGINT)))
          + bit_count(xor(CAST(a.b1 AS BIGINT), CAST(b.b1 AS BIGINT)))
          + bit_count(xor(CAST(a.b2 AS BIGINT), CAST(b.b2 AS BIGINT)))
          + bit_count(xor(CAST(a.b3 AS BIGINT), CAST(b.b3 AS BIGINT))) <= 3
  ) fm GROUP BY doc_a, doc_b
) v
JOIN vids ca ON ca.doc_id = v.doc_a
JOIN vids cb ON cb.doc_id = v.doc_b
WHERE v.matched_frames * 2 >= least(ca.nf, cb.nf)
UNION ALL
SELECT 'video_pair_capped' AS shape, v.doc_a AS doc_id,
       CAST(v.doc_b AS BIGINT) AS n1,
       CAST(v.matched_frames * 1000000 + least(ca.nf, cb.nf) AS BIGINT) AS n2
FROM (
  SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS matched_frames
  FROM (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.frame_idx
    FROM (SELECT doc_id, frame_idx, b0, b1, b2, b3,
                 unnest([0, 1, 2, 3]) AS band,
                 unnest([b0, b1, b2, b3]) AS bh FROM video_hashes) a
    JOIN (SELECT frame_idx, band, bh, count(*) AS n, min(doc_id) AS rep
          FROM (SELECT doc_id, frame_idx,
                       unnest([0, 1, 2, 3]) AS band,
                       unnest([b0, b1, b2, b3]) AS bh FROM video_hashes)
          GROUP BY frame_idx, band, bh) c
      ON c.frame_idx = a.frame_idx AND c.band = a.band AND c.bh = a.bh
    JOIN (SELECT doc_id, frame_idx, b0, b1, b2, b3,
                 unnest([0, 1, 2, 3]) AS band,
                 unnest([b0, b1, b2, b3]) AS bh FROM video_hashes) b
      ON a.frame_idx = b.frame_idx AND a.band = b.band AND a.bh = b.bh
     AND a.doc_id < b.doc_id
    WHERE (c.n <= 4 OR a.doc_id = c.rep)
      AND bit_count(xor(CAST(a.b0 AS BIGINT), CAST(b.b0 AS BIGINT)))
          + bit_count(xor(CAST(a.b1 AS BIGINT), CAST(b.b1 AS BIGINT)))
          + bit_count(xor(CAST(a.b2 AS BIGINT), CAST(b.b2 AS BIGINT)))
          + bit_count(xor(CAST(a.b3 AS BIGINT), CAST(b.b3 AS BIGINT))) <= 3
  ) fm GROUP BY doc_a, doc_b
) v
JOIN vids ca ON ca.doc_id = v.doc_a
JOIN vids cb ON cb.doc_id = v.doc_b
WHERE v.matched_frames * 2 >= least(ca.nf, cb.nf)
UNION ALL
SELECT 'jpeg_hash' AS shape, doc_id,
       CAST(b0 AS BIGINT) * 65536 + b1 AS n1,
       CAST(b2 AS BIGINT) * 65536 + b3 AS n2
FROM jpeg_hashes
UNION ALL
SELECT 'jpeg_resized' AS shape, doc_id,
       CAST(b0 AS BIGINT) * 65536 + b1 AS n1,
       CAST(b2 AS BIGINT) * 65536 + b3 AS n2
FROM jpeg_resized
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union of the frame-sampling row explosion (every 8th frame
    index downstream of the real header decode — native explode
    topology) and the r6 near-duplicate detection for ALL THREE media modalities
    (members: multimodal_image_dedup — real pixel decoding;
    multimodal_audio_dedup — real sample decoding;
    multimodal_video_frames + multimodal_video_dedup — real AVI
    container/frame decoding, per-frame hashes and aligned
    frame-voting pairs; banded hamming <= 3 joins throughout;
    r7: multimodal_image_resize — the two-codec resize round trip,
    pinned by resized-payload byte size, dims, and the aHash of the
    RE-DECODED resized PNG — and multimodal_audio_resample, the
    16 kHz normalize round trip pinned the same way through the
    energy fingerprint of the re-decoded resampled WAV — and
    multimodal_video_subsample, the every-2nd-frame re-encoded AVI
    pinned through the per-frame hashes of the re-decoded container)."""
    docs = table(spark, sf_dir, "documents")
    mm = M.attach_media_payload(docs)
    fr = M.frame_sample(M.decode_media(mm)).select(
        F.lit("frame").alias("shape"),
        "doc_id",
        F.col("n_frames").cast("bigint").alias("n1"),
        F.col("frame_idx").cast("bigint").alias("n2"),
    )
    pr = M.image_hash_pairs(
        M.image_ahash(mm), max_hamming=3, max_bucket=None
    ).select(
        F.lit("img_pair").alias("shape"),
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").cast("bigint").alias("n1"),
        F.col("hamming").cast("bigint").alias("n2"),
    )
    cpr = M.image_hash_pairs(
        M.image_ahash(mm), max_hamming=3, max_bucket=4
    ).select(
        F.lit("img_pair_capped").alias("shape"),
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").cast("bigint").alias("n1"),
        F.col("hamming").cast("bigint").alias("n2"),
    )
    ap = M.band_hash_pairs(
        M.audio_energy_hash(mm), max_hamming=3, max_bucket=None
    ).select(
        F.lit("audio_pair").alias("shape"),
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").cast("bigint").alias("n1"),
        F.col("hamming").cast("bigint").alias("n2"),
    )
    vh = M.video_frame_hashes(M.attach_video_payload(docs))
    vhi = vh.select(
        F.lit("vframe_hi").alias("shape"),
        "doc_id",
        F.col("frame_idx").cast("bigint").alias("n1"),
        (F.col("b0").cast("bigint") * 65536 + F.col("b1")).alias("n2"),
    )
    vlo = vh.select(
        F.lit("vframe_lo").alias("shape"),
        "doc_id",
        F.col("frame_idx").cast("bigint").alias("n1"),
        (F.col("b2").cast("bigint") * 65536 + F.col("b3")).alias("n2"),
    )
    vp = M.video_dedup_pairs(vh, max_hamming=3, max_bucket=None).select(
        F.lit("video_pair").alias("shape"),
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").cast("bigint").alias("n1"),
        (
            F.col("matched_frames") * 1000000 + F.col("min_frames")
        ).alias("n2"),
    )
    vpc = M.video_dedup_pairs(vh, max_hamming=3, max_bucket=4).select(
        F.lit("video_pair_capped").alias("shape"),
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").cast("bigint").alias("n1"),
        (
            F.col("matched_frames") * 1000000 + F.col("min_frames")
        ).alias("n2"),
    )
    rz = M.image_resize(mm, out_w=16, out_h=12)
    rmeta = rz.select(
        F.lit("resized_meta").alias("shape"),
        "doc_id",
        F.col("n_bytes").cast("bigint").alias("n1"),
        (F.col("width").cast("bigint") * 1000 + F.col("height")).alias("n2"),
    )
    rhash = M.image_ahash(rz.select("doc_id", "payload")).select(
        F.lit("resized_hash").alias("shape"),
        "doc_id",
        (F.col("b0").cast("bigint") * 65536 + F.col("b1")).alias("n1"),
        (F.col("b2").cast("bigint") * 65536 + F.col("b3")).alias("n2"),
    )
    rs = M.audio_resample(mm, out_rate=16000)
    rsmeta = rs.select(
        F.lit("resampled_meta").alias("shape"),
        "doc_id",
        F.col("n_bytes").cast("bigint").alias("n1"),
        F.col("n_samples").cast("bigint").alias("n2"),
    )
    rshash = M.audio_energy_hash(rs.select("doc_id", "payload")).select(
        F.lit("resampled_hash").alias("shape"),
        "doc_id",
        (F.col("b0").cast("bigint") * 65536 + F.col("b1")).alias("n1"),
        (F.col("b2").cast("bigint") * 65536 + F.col("b3")).alias("n2"),
    )
    vs = M.video_subsample(M.attach_video_payload(docs), every_n=2)
    vsmeta = vs.select(
        F.lit("vsub_meta").alias("shape"),
        "doc_id",
        F.col("n_bytes").cast("bigint").alias("n1"),
        (
            F.col("n_frames").cast("bigint") * 1000000
            + F.col("width").cast("bigint") * 1000
            + F.col("height")
        ).alias("n2"),
    )
    jp = M.attach_jpeg_payload(docs)
    jh = M.image_ahash(jp).select(
        F.lit("jpeg_hash").alias("shape"),
        "doc_id",
        (F.col("b0").cast("bigint") * 65536 + F.col("b1")).alias("n1"),
        (F.col("b2").cast("bigint") * 65536 + F.col("b3")).alias("n2"),
    )
    jrz = M.image_resize(jp, out_w=16, out_h=12)
    jrh = M.image_ahash(jrz.select("doc_id", "payload")).select(
        F.lit("jpeg_resized").alias("shape"),
        "doc_id",
        (F.col("b0").cast("bigint") * 65536 + F.col("b1")).alias("n1"),
        (F.col("b2").cast("bigint") * 65536 + F.col("b3")).alias("n2"),
    )
    vsh = M.video_frame_hashes(vs.select("doc_id", "payload"))
    vshi = vsh.select(
        F.lit("vsub_hi").alias("shape"),
        "doc_id",
        F.col("frame_idx").cast("bigint").alias("n1"),
        (F.col("b0").cast("bigint") * 65536 + F.col("b1")).alias("n2"),
    )
    vslo = vsh.select(
        F.lit("vsub_lo").alias("shape"),
        "doc_id",
        F.col("frame_idx").cast("bigint").alias("n1"),
        (F.col("b2").cast("bigint") * 65536 + F.col("b3")).alias("n2"),
    )
    return (
        fr.unionByName(pr)
        .unionByName(ap)
        .unionByName(vhi)
        .unionByName(vlo)
        .unionByName(rmeta)
        .unionByName(rhash)
        .unionByName(rsmeta)
        .unionByName(rshash)
        .unionByName(vsmeta)
        .unionByName(vshi)
        .unionByName(vslo)
        .unionByName(vp)
        .unionByName(vpc)
        .unionByName(jh)
        .unionByName(jrh)
        .unionByName(cpr)
    )


@register(
    "multimodal_image_ahash",
    oracle="WITH " + _AHASH_CTE + "\nSELECT * FROM ahash_hashes",
)
def multimodal_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash of every BMP: the engine DECODES PIXELS
    from the real payload bytes (header offset, bottom-up padded rows,
    64 nearest-neighbor samples, exact-integer mean threshold) while the
    oracle recomputes the same 64 bits from the gradient generation
    rule — a wrong pixel walk (stride, row order, channel offset) or a
    wrong writer fails the value hash."""
    docs = table(spark, sf_dir, "documents")
    return M.image_ahash(M.attach_media_payload(docs))


@register(
    "multimodal_image_resize_jpeg",
    oracle="WITH " + _JPEG_RESIZE_CTE + "\nSELECT * FROM jpeg_resized",
)
def multimodal_image_resize_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-codec transform round trip (r8): decode the real JPEG
    (huffman + IDCT), nearest-neighbor resize to 16×12, re-encode as
    PNG (lossless, closed-form size), then PROVE the output is a real
    image by re-decoding it through image_ahash. The oracle replays the
    whole chain — the lossy JPEG decode via the flat-block rule, the
    exact-integer resize mapping, the PNG's closed-form byte size, and
    all 64 aHash bits of the resized pixels."""
    docs = table(spark, sf_dir, "documents")
    rz = M.image_resize(M.attach_jpeg_payload(docs), out_w=16, out_h=12)
    hashes = M.image_ahash(rz.select("doc_id", "payload")).select(
        "doc_id", "b0", "b1", "b2", "b3"
    )
    return rz.select("doc_id", "width", "height", "n_bytes").join(
        hashes, "doc_id"
    )


@register(
    "multimodal_image_ahash_jpeg",
    oracle="WITH " + _JPEG_AHASH_CTE + "\nSELECT * FROM jpeg_hashes",
)
def multimodal_image_ahash_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash through the REAL baseline-JPEG codec
    (r8, closing the r7 entropy-coding boundary): every document gets a
    spec-correct grayscale JPEG (Annex K quant + huffman tables, full
    DCT entropy coding — operators/jpeg.py), and image_ahash decodes it
    with the full inverse (marker walk, canonical huffman, dequant,
    IDCT) before sampling the same 64 aHash pixels as the BMP/PNG
    branches. The oracle replays the lossy round trip exactly because
    the fixture content is block-constant (closed-form DC-only decode);
    the codec's general path is hypothesis-tested in
    tests/test_multimodal.py."""
    docs = table(spark, sf_dir, "documents")
    return M.image_ahash(M.attach_jpeg_payload(docs))


@register(
    "multimodal_image_dedup",
    oracle="WITH "
    + _AHASH_CTE
    + """
, bands AS (
  SELECT doc_id, b0, b1, b2, b3,
         unnest([0, 1, 2, 3]) AS band,
         unnest([b0, b1, b2, b3]) AS bh
  FROM ahash_hashes
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(CAST(a.b0 AS BIGINT), CAST(b.b0 AS BIGINT)))
            + bit_count(xor(CAST(a.b1 AS BIGINT), CAST(b.b1 AS BIGINT)))
            + bit_count(xor(CAST(a.b2 AS BIGINT), CAST(b.b2 AS BIGINT)))
            + bit_count(xor(CAST(a.b3 AS BIGINT), CAST(b.b3 AS BIGINT)))
            AS INTEGER) AS hamming
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
WHERE bit_count(xor(CAST(a.b0 AS BIGINT), CAST(b.b0 AS BIGINT)))
      + bit_count(xor(CAST(a.b1 AS BIGINT), CAST(b.b1 AS BIGINT)))
      + bit_count(xor(CAST(a.b2 AS BIGINT), CAST(b.b2 AS BIGINT)))
      + bit_count(xor(CAST(a.b3 AS BIGINT), CAST(b.b3 AS BIGINT))) <= 3
""",
)
def multimodal_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image pairs by banded aHash (hamming <= 3 over 64
    bits; pigeonhole over four 16-bit bands guarantees recall) — image
    dedup with REAL pixel decoding on the engine side and a full
    generation-rule replay on the oracle side."""
    docs = table(spark, sf_dir, "documents")
    return M.image_hash_pairs(
        M.image_ahash(M.attach_media_payload(docs)), max_hamming=3,
        max_bucket=None,  # exact-pair-set oracle baseline (r9 flipped
        # the operator default to 1000)
    )


@register(
    "multimodal_image_dedup_capped",
    oracle="WITH "
    + _AHASH_CTE
    + """
, bands AS (
  SELECT doc_id, b0, b1, b2, b3,
         unnest([0, 1, 2, 3]) AS band,
         unnest([b0, b1, b2, b3]) AS bh
  FROM ahash_hashes
),
bc AS (
  SELECT band, bh, count(*) AS n, min(doc_id) AS rep
  FROM bands GROUP BY band, bh
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(CAST(a.b0 AS BIGINT), CAST(b.b0 AS BIGINT)))
            + bit_count(xor(CAST(a.b1 AS BIGINT), CAST(b.b1 AS BIGINT)))
            + bit_count(xor(CAST(a.b2 AS BIGINT), CAST(b.b2 AS BIGINT)))
            + bit_count(xor(CAST(a.b3 AS BIGINT), CAST(b.b3 AS BIGINT)))
            AS INTEGER) AS hamming
FROM bands a
JOIN bc c ON c.band = a.band AND c.bh = a.bh
JOIN bands b
  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
WHERE (c.n <= 4 OR a.doc_id = c.rep)
  AND bit_count(xor(CAST(a.b0 AS BIGINT), CAST(b.b0 AS BIGINT)))
      + bit_count(xor(CAST(a.b1 AS BIGINT), CAST(b.b1 AS BIGINT)))
      + bit_count(xor(CAST(a.b2 AS BIGINT), CAST(b.b2 AS BIGINT)))
      + bit_count(xor(CAST(a.b3 AS BIGINT), CAST(b.b3 AS BIGINT))) <= 3
""",
)
def multimodal_image_dedup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production star-cap mode of the banded image near-dup join
    (r8, closing the scale-sweep finding: the 16-bit band value space is
    fixed, so uncapped bucket occupancy — and the pair count — grows
    quadratically with the corpus, measured 48× wall for 10× docs):
    band buckets over ``max_bucket=4`` emit only min-doc-anchored star
    pairs, bounding candidate GENERATION at O(B) per bucket with
    cluster connectivity preserved (the same contract as the text
    MinHash/SimHash families). The oracle replays the cap rule exactly
    — per-bucket counts, the representative, and the anchored-pair
    predicate."""
    docs = table(spark, sf_dir, "documents")
    return M.image_hash_pairs(
        M.image_ahash(M.attach_media_payload(docs)),
        max_hamming=3,
        max_bucket=4,
    )


@register(
    "multimodal_audio_hash",
    oracle="WITH " + _AUDIO_CTE + "\nSELECT * FROM audio_hashes",
)
def multimodal_audio_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy fingerprint of every WAV: the engine DECODES SAMPLES from
    the real payload bytes (RIFF chunk walk to the data chunk, int16
    PCM unpack, 64-frame absolute-energy profile, exact-integer mean
    threshold) while the oracle recomputes the same 64 bits from the
    sawtooth generation rule — a wrong chunk walk, endianness, or frame
    mapping fails the value hash."""
    docs = table(spark, sf_dir, "documents")
    return M.audio_energy_hash(M.attach_media_payload(docs))


@register(
    "multimodal_audio_dedup",
    oracle="WITH "
    + _AUDIO_CTE
    + """
, wbands AS (
  SELECT doc_id, b0, b1, b2, b3,
         unnest([0, 1, 2, 3]) AS band,
         unnest([b0, b1, b2, b3]) AS bh
  FROM audio_hashes
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(CAST(a.b0 AS BIGINT), CAST(b.b0 AS BIGINT)))
            + bit_count(xor(CAST(a.b1 AS BIGINT), CAST(b.b1 AS BIGINT)))
            + bit_count(xor(CAST(a.b2 AS BIGINT), CAST(b.b2 AS BIGINT)))
            + bit_count(xor(CAST(a.b3 AS BIGINT), CAST(b.b3 AS BIGINT)))
            AS INTEGER) AS hamming
FROM wbands a JOIN wbands b
  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
WHERE bit_count(xor(CAST(a.b0 AS BIGINT), CAST(b.b0 AS BIGINT)))
      + bit_count(xor(CAST(a.b1 AS BIGINT), CAST(b.b1 AS BIGINT)))
      + bit_count(xor(CAST(a.b2 AS BIGINT), CAST(b.b2 AS BIGINT)))
      + bit_count(xor(CAST(a.b3 AS BIGINT), CAST(b.b3 AS BIGINT))) <= 3
""",
)
def multimodal_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate audio pairs by the banded energy fingerprint —
    the hash-family-agnostic band_hash_pairs join over real decoded
    samples, full generation-rule replay on the oracle side."""
    docs = table(spark, sf_dir, "documents")
    return M.band_hash_pairs(
        M.audio_energy_hash(M.attach_media_payload(docs)), max_hamming=3,
        max_bucket=None,  # exact-pair-set oracle baseline (r9 flipped
        # the operator default to 1000)
    )


@register(
    "multimodal_video_frames",
    oracle="WITH " + _VIDEO_CTE + "\nSELECT * FROM video_hashes",
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame perceptual hashes of every AVI — REAL video container
    decoding: RIFF/'AVI ' magic, avih main-header dims, movi-list 00db
    frame walk, then the 64-sample aHash over each frame's DIB pixel
    array; the oracle recomputes every frame's 64 bits from the
    per-frame gradient rule. The frame-level feature table video dedup
    and shot retrieval build on."""
    docs = table(spark, sf_dir, "documents")
    return M.video_frame_hashes(M.attach_video_payload(docs))


@register(
    "multimodal_video_dedup",
    oracle="WITH "
    + _VIDEO_CTE
    + """
, vbands AS (
  SELECT doc_id, frame_idx, b0, b1, b2, b3,
         unnest([0, 1, 2, 3]) AS band,
         unnest([b0, b1, b2, b3]) AS bh
  FROM video_hashes
),
fmatch AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.frame_idx
  FROM vbands a JOIN vbands b
    ON a.frame_idx = b.frame_idx AND a.band = b.band AND a.bh = b.bh
   AND a.doc_id < b.doc_id
  WHERE bit_count(xor(CAST(a.b0 AS BIGINT), CAST(b.b0 AS BIGINT)))
        + bit_count(xor(CAST(a.b1 AS BIGINT), CAST(b.b1 AS BIGINT)))
        + bit_count(xor(CAST(a.b2 AS BIGINT), CAST(b.b2 AS BIGINT)))
        + bit_count(xor(CAST(a.b3 AS BIGINT), CAST(b.b3 AS BIGINT))) <= 3
),
vvotes AS (
  SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS matched_frames
  FROM fmatch GROUP BY doc_a, doc_b
)
SELECT v.doc_a, v.doc_b, v.matched_frames,
       CAST(least(ca.nf, cb.nf) AS BIGINT) AS min_frames
FROM vvotes v
JOIN vids ca ON ca.doc_id = v.doc_a
JOIN vids cb ON cb.doc_id = v.doc_b
WHERE v.matched_frames * 2 >= least(ca.nf, cb.nf)
""",
)
def multimodal_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate video pairs by aligned frame voting: same-index
    frames near-match through the banded hamming<=3 contract, a pair
    survives when at least half the shorter video's frames match —
    real container decoding on the engine side, full per-frame
    generation-rule replay on the oracle side."""
    docs = table(spark, sf_dir, "documents")
    return M.video_dedup_pairs(
        M.video_frame_hashes(M.attach_video_payload(docs)), max_hamming=3,
        max_bucket=None,  # exact-pair-set oracle baseline (r9 flipped
        # the operator default to 1000)
    )


@register(
    "multimodal_video_dedup_capped",
    oracle="WITH "
    + _VIDEO_CTE
    + """
, vbands AS (
  SELECT doc_id, frame_idx, b0, b1, b2, b3,
         unnest([0, 1, 2, 3]) AS band,
         unnest([b0, b1, b2, b3]) AS bh
  FROM video_hashes
),
vbc AS (
  SELECT frame_idx, band, bh, count(*) AS n, min(doc_id) AS rep
  FROM vbands GROUP BY frame_idx, band, bh
),
fmatch AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.frame_idx
  FROM vbands a
  JOIN vbc c
    ON c.frame_idx = a.frame_idx AND c.band = a.band AND c.bh = a.bh
  JOIN vbands b
    ON a.frame_idx = b.frame_idx AND a.band = b.band AND a.bh = b.bh
   AND a.doc_id < b.doc_id
  WHERE (c.n <= 4 OR a.doc_id = c.rep)
    AND bit_count(xor(CAST(a.b0 AS BIGINT), CAST(b.b0 AS BIGINT)))
        + bit_count(xor(CAST(a.b1 AS BIGINT), CAST(b.b1 AS BIGINT)))
        + bit_count(xor(CAST(a.b2 AS BIGINT), CAST(b.b2 AS BIGINT)))
        + bit_count(xor(CAST(a.b3 AS BIGINT), CAST(b.b3 AS BIGINT))) <= 3
),
vvotes AS (
  SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS matched_frames
  FROM fmatch GROUP BY doc_a, doc_b
)
SELECT v.doc_a, v.doc_b, v.matched_frames,
       CAST(least(ca.nf, cb.nf) AS BIGINT) AS min_frames
FROM vvotes v
JOIN vids ca ON ca.doc_id = v.doc_a
JOIN vids cb ON cb.doc_id = v.doc_b
WHERE v.matched_frames * 2 >= least(ca.nf, cb.nf)
""",
)
def multimodal_video_dedup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production star-cap mode of the frame-voting video near-dup
    join (r8: the full-registry sweep's worst outlier — 48.7× wall /
    144.6M raw pairs at 10× docs uncapped; 2.4 s capped): over-cap
    (frame_idx, band, value) buckets emit only min-doc-anchored frame
    matches, so votes accumulate on rep-anchored pairs with cluster
    connectivity preserved. The oracle replays the cap rule — per-bucket
    counts, the representative, the anchored-match predicate, and the
    unchanged vote threshold."""
    docs = table(spark, sf_dir, "documents")
    return M.video_dedup_pairs(
        M.video_frame_hashes(M.attach_video_payload(docs)),
        max_hamming=3,
        max_bucket=4,
    )
