"""Multimodal queries: real BMP/WAV codecs through Arrow-batched Pandas
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

from similarity_search_with_hadoop_mapreduce_spark.operators import multimodal as M
from similarity_search_with_hadoop_mapreduce_spark.registry.base import register, table

# the generation rule (operators.multimodal._media_dims) in SQL
_DIMS_CTE = """
base AS (
  SELECT doc_id, octet_length(encode(text)) AS n_text FROM documents
),
meta AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS format,
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


@register(
    "multimodal_decode_meta",
    oracle="WITH "
    + _DIMS_CTE
    + """
SELECT doc_id, format,
       CAST(CASE WHEN format = 'bmp'
                 THEN 54 + ((width * 3 + 3) // 4 * 4) * height
                 ELSE 44 + n_samples * 2 END AS INTEGER) AS n_bytes,
       width, height, sample_rate, n_samples,
       CAST(n_samples * 1000 // sample_rate AS INTEGER) AS duration_ms,
       CAST(CASE WHEN format = 'bmp' THEN 1
                 ELSE n_samples // 25 + 1 END AS INTEGER) AS n_frames
FROM meta
""",
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media payload → Arrow-batched ``mapInPandas`` decode → typed
    metadata. The payloads are real files (24-bit BMP / 16-bit PCM WAV,
    one per document) and the decode genuinely parses their headers with
    ``struct`` — magic, offsets, RIFF chunk walk; the oracle re-derives
    every field (and the exact file size) from the generation rule."""
    docs = table(spark, sf_dir, "documents")
    return M.decode_media(M.attach_media_payload(docs))


@register(
    "multimodal_frame_sample",
    oracle="WITH "
    + _DIMS_CTE
    + """
, frames AS (
  SELECT doc_id,
         CAST(CASE WHEN format = 'bmp' THEN 1
                   ELSE n_samples // 25 + 1 END AS INTEGER) AS n_frames
  FROM meta
)
SELECT doc_id, n_frames,
       CAST(unnest(range(0, n_frames, 8)) AS INTEGER) AS frame_idx
FROM frames
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling row explosion (every 8th frame index) downstream of
    the real header decode — native explode topology."""
    docs = table(spark, sf_dir, "documents")
    return M.frame_sample(M.decode_media(M.attach_media_payload(docs)))
