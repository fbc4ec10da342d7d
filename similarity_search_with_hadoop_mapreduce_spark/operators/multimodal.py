"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed through Arrow-batched Pandas UDFs.

A 100 TB multimodal corpus stores media as binary columns (or object-store
pointers) beside typed metadata; the decode/feature-extract step is the
one place Python is genuinely required (codec libraries), so the Spark
side must get the plumbing right: explicit result schema, Arrow batch
transfer via ``mapInPandas``, partition-sized batches, no driver
round-trips. That plumbing is real and tested here.

The codec itself is STUBBED: this container has no image/audio libraries,
so :func:`decode_stub` derives deterministic fake dimensions from the
payload's sha256 (clearly marked; swap ``_fake_decode`` for a real PIL /
torchaudio call in production). ``decode_real`` raises
``NotImplementedError`` to make the boundary explicit.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as STypes

from similarity_search_with_hadoop_mapreduce_spark.sources.tables import fan_out

DECODED_SCHEMA = STypes.StructType(
    [
        STypes.StructField("doc_id", STypes.LongType()),
        STypes.StructField("n_bytes", STypes.IntegerType()),
        STypes.StructField("sha256", STypes.StringType()),
        STypes.StructField("fake_width", STypes.IntegerType()),
        STypes.StructField("fake_height", STypes.IntegerType()),
        STypes.StructField("n_frames", STypes.IntegerType()),
    ]
)


def attach_binary_payload(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + typed metadata.

    In production this column comes straight from parquet ``BINARY``; the
    encode here only exists because the fixtures are text-only.
    """
    return documents.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("n_bytes"),
        ).alias("media_meta"),
    )


def decode_real(payload: bytes) -> dict:
    """The real decode boundary — requires media libraries not present in
    this environment."""
    raise NotImplementedError(
        "media decode requires PIL/ffmpeg-class libraries; use decode_stub"
    )


def _fake_decode(payload: bytes) -> tuple[str, int, int, int]:
    """Deterministic stand-in for a media decoder: dimensions and frame
    count derived from the payload digest (stable across engines/runs)."""
    h = hashlib.sha256(payload).hexdigest()
    width = int(h[:2], 16)
    height = int(h[2:4], 16)
    n_frames = int(h[4:6], 16) % 32 + 1
    return h, width, height, n_frames


def decode_stub(multimodal: DataFrame) -> DataFrame:
    """Arrow-batched "decode": ``mapInPandas`` over (doc_id, payload).

    The batch shape is the production one — an iterator of pandas
    DataFrames per partition, vectorized columns in, typed struct-free
    columns out, schema declared up front so Catalyst can plan downstream
    operators without running Python.
    """
    # under-split scans would otherwise feed ONE Python worker
    cols = fan_out(multimodal).select("doc_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "sha256": [d[0] for d in decoded],
                    "fake_width": [d[1] for d in decoded],
                    "fake_height": [d[2] for d in decoded],
                    "n_frames": [d[3] for d in decoded],
                }
            )

    return cols.mapInPandas(batches, schema=DECODED_SCHEMA)


def frame_sample_stub(decoded: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame-sampling plumbing for "video" payloads: one output row per
    sampled frame index (posexplode of a sequence), the row-explosion
    topology a real sampler produces. Native expressions — the per-frame
    decode would again be a Pandas UDF in production."""
    return decoded.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
