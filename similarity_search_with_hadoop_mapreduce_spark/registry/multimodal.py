"""Multimodal queries: the Pandas-UDF decode plumbing, oracle-checked.

The stub decoder derives all outputs from sha256 of the payload, which
DuckDB can recompute — so even the Python-side batch path gets a
full-value oracle (hex-digit arithmetic replaces int(hex, 16) in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from similarity_search_with_hadoop_mapreduce_spark.operators import multimodal as M
from similarity_search_with_hadoop_mapreduce_spark.registry.base import register, table

_HEX = "0123456789abcdef"


def _hexpair(col: str, i: int) -> str:
    """SQL for int(hex[i:i+2], 16) on a hex-string column (1-based i)."""
    return (
        f"((strpos('{_HEX}', substr({col}, {i}, 1)) - 1) * 16"
        f" + (strpos('{_HEX}', substr({col}, {i + 1}, 1)) - 1))"
    )


@register(
    "multimodal_decode_meta",
    oracle=f"""
WITH h AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
         sha256(text) AS sha256
  FROM documents
)
SELECT doc_id, n_bytes, sha256,
       CAST({_hexpair('sha256', 1)} AS INTEGER) AS fake_width,
       CAST({_hexpair('sha256', 3)} AS INTEGER) AS fake_height,
       CAST({_hexpair('sha256', 5)} % 32 + 1 AS INTEGER) AS n_frames
FROM h
""",
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → Arrow-batched mapInPandas stub decode → typed
    metadata. Exercises the real production plumbing (schema declaration,
    batch iterator, vectorized transfer); only the codec is fake."""
    docs = table(spark, sf_dir, "documents")
    return M.decode_stub(M.attach_binary_payload(docs))


@register(
    "multimodal_frame_sample",
    oracle=f"""
WITH h AS (
  SELECT doc_id, sha256(text) AS sha FROM documents
),
f AS (
  SELECT doc_id,
         CAST({_hexpair('sha', 5)} % 32 + 1 AS INTEGER) AS n_frames
  FROM h
)
SELECT doc_id, n_frames,
       CAST(unnest(range(0, n_frames, 8)) AS INTEGER) AS frame_idx
FROM f
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling row explosion (every 8th frame index) downstream of
    the stub decode — native posexplode topology."""
    docs = table(spark, sf_dir, "documents")
    return M.frame_sample_stub(M.decode_stub(M.attach_binary_payload(docs)))
