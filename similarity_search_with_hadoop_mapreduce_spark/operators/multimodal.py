"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed through Arrow-batched Pandas UDFs.

A 100 TB multimodal corpus stores media as binary columns (or object-store
pointers) beside typed metadata; the decode/feature-extract step is the
one place Python is genuinely required (codec libraries), so the Spark
side must get the plumbing right: explicit result schema, Arrow batch
transfer via ``mapInPandas``, partition-sized batches, no driver
round-trips.

The container has no image/audio libraries, so the *codecs* here are the
two formats the Python stdlib can honestly round-trip with ``struct``:

- **BMP** (24-bit uncompressed, BITMAPINFOHEADER) — :func:`_encode_bmp`
  writes a byte-correct file, :func:`_decode_payload` parses the real
  header fields (magic, pixel-array offset, width, height);
- **WAV** (16-bit mono PCM, RIFF) — :func:`_encode_wav` writes a
  byte-correct file, the decoder walks the RIFF chunk list to the
  ``fmt ``/``data`` chunks and derives sample rate, sample count and
  duration.

The fixtures are text-only, so :func:`attach_media_payload` synthesizes
one real media file per document (dimensions derived deterministically
from the row); the decode then parses actual binary headers — the DuckDB
oracle recomputes every decoded field (including the exact file size)
from the same generation rule, so a wrong writer OR a wrong parser fails
the value hash. ``decode_real`` marks the richer-codec boundary (PIL /
ffmpeg-class pixel decoding) that stays out of scope here.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as STypes

from similarity_search_with_hadoop_mapreduce_spark.sources.tables import fan_out

DECODED_SCHEMA = STypes.StructType(
    [
        STypes.StructField("doc_id", STypes.LongType()),
        STypes.StructField("format", STypes.StringType()),
        STypes.StructField("n_bytes", STypes.IntegerType()),
        STypes.StructField("width", STypes.IntegerType()),
        STypes.StructField("height", STypes.IntegerType()),
        STypes.StructField("sample_rate", STypes.IntegerType()),
        STypes.StructField("n_samples", STypes.IntegerType()),
        STypes.StructField("duration_ms", STypes.IntegerType()),
        STypes.StructField("n_frames", STypes.IntegerType()),
    ]
)

WAV_RATES = (8000, 16000, 22050, 44100)


def _encode_bmp(width: int, height: int) -> bytes:
    """Byte-correct 24-bit bottom-up BMP with zeroed pixels."""
    row = (width * 3 + 3) // 4 * 4  # rows pad to 4-byte boundaries
    pixel_bytes = row * height
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM",
        54 + pixel_bytes,  # file size
        0,
        0,
        54,  # pixel-array offset
        40,  # BITMAPINFOHEADER size
        width,
        height,
        1,  # planes
        24,  # bits per pixel
        0,  # BI_RGB
        pixel_bytes,
        2835,
        2835,
        0,
        0,
    )
    return header + b"\x00" * pixel_bytes


def _encode_wav(sample_rate: int, n_samples: int) -> bytes:
    """Byte-correct RIFF/WAVE, 16-bit mono PCM, zeroed samples."""
    data = b"\x00\x00" * n_samples
    return (
        struct.pack(
            "<4sI4s" "4sIHHIIHH" "4sI",
            b"RIFF",
            36 + len(data),
            b"WAVE",
            b"fmt ",
            16,
            1,  # PCM
            1,  # mono
            sample_rate,
            sample_rate * 2,  # byte rate
            2,  # block align
            16,  # bits per sample
            b"data",
            len(data),
        )
        + data
    )


def _media_dims(doc_id: int, n_text_bytes: int) -> tuple:
    """Deterministic per-row media parameters — the generation rule the
    DuckDB oracle recomputes field for field."""
    if doc_id % 2 == 0:
        return ("bmp", n_text_bytes % 64 + 1, doc_id % 48 + 1, None, None)
    return (
        "wav",
        None,
        None,
        WAV_RATES[doc_id % 4],
        n_text_bytes % 500 + 50,
    )


def attach_media_payload(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a real media file per document: even doc_ids get a BMP,
    odd get a WAV, dimensions derived from the row. In production this
    column comes straight from parquet ``BINARY``; the Arrow-batched
    encode stage exists because the fixtures are text-only — and doubles
    as the write half of the codec the decode stage must invert."""
    cols = fan_out(documents).select(
        "doc_id", F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("n_text")
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, mimes = [], []
            for doc_id, n_text in zip(pdf["doc_id"], pdf["n_text"]):
                fmt, w, h, sr, ns = _media_dims(int(doc_id), int(n_text))
                if fmt == "bmp":
                    payloads.append(_encode_bmp(w, h))
                    mimes.append("image/bmp")
                else:
                    payloads.append(_encode_wav(sr, ns))
                    mimes.append("audio/wav")
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "mime": mimes}
            )

    return cols.mapInPandas(
        batches, schema="doc_id LONG, payload BINARY, mime STRING"
    )


def decode_real(payload: bytes) -> dict:
    """The richer-codec boundary — pixel/sample decoding requires
    PIL/ffmpeg-class libraries not present in this environment; header
    decoding is implemented for real in :func:`_decode_payload`."""
    raise NotImplementedError(
        "pixel/sample decode requires PIL/ffmpeg-class libraries; "
        "header metadata decode is implemented in _decode_payload"
    )


def _decode_payload(payload: bytes) -> tuple:
    """Parse real BMP/WAV headers with ``struct`` — no generation-rule
    shortcuts: everything comes off the bytes.

    Returns (format, width, height, sample_rate, n_samples, duration_ms,
    n_frames). ``n_frames`` frames a downstream sampler: 1 for stills,
    one frame per 25 samples (+1) for audio.
    """
    if payload[:2] == b"BM":
        width, height = struct.unpack_from("<ii", payload, 18)
        return ("bmp", width, abs(height), None, None, None, 1)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        off, sample_rate, block_align, data_size = 12, None, 2, None
        while off + 8 <= len(payload):
            chunk_id, chunk_size = struct.unpack_from("<4sI", payload, off)
            if chunk_id == b"fmt ":
                _fmt, _ch, sample_rate, _br, block_align, _bits = (
                    struct.unpack_from("<HHIIHH", payload, off + 8)
                )
            elif chunk_id == b"data":
                data_size = chunk_size
            off += 8 + chunk_size + (chunk_size % 2)  # chunks pad to even
        if sample_rate is None or data_size is None:
            raise ValueError("malformed WAV: missing fmt/data chunk")
        n_samples = data_size // block_align
        duration_ms = n_samples * 1000 // sample_rate
        return (
            "wav",
            None,
            None,
            sample_rate,
            n_samples,
            duration_ms,
            n_samples // 25 + 1,
        )
    raise ValueError(f"unknown media magic: {payload[:4]!r}")


def decode_media(multimodal: DataFrame) -> DataFrame:
    """Arrow-batched media decode: ``mapInPandas`` over (doc_id, payload),
    parsing real BMP/WAV headers per row.

    The batch shape is the production one — an iterator of pandas
    DataFrames per partition, vectorized columns in, typed columns out,
    schema declared up front so Catalyst can plan downstream operators
    without running Python.
    """
    cols = fan_out(multimodal).select("doc_id", "payload")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_decode_payload(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": [r[0] for r in rows],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": pd.array([r[1] for r in rows], dtype="Int32"),
                    "height": pd.array([r[2] for r in rows], dtype="Int32"),
                    "sample_rate": pd.array([r[3] for r in rows], dtype="Int32"),
                    "n_samples": pd.array([r[4] for r in rows], dtype="Int32"),
                    "duration_ms": pd.array([r[5] for r in rows], dtype="Int32"),
                    "n_frames": pd.array([r[6] for r in rows], dtype="Int32"),
                }
            )

    return cols.mapInPandas(batches, schema=DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index
    (explode of a sequence), the row-explosion topology a real sampler
    produces. Native expressions — the per-frame decode would again be a
    Pandas UDF in production."""
    return decoded.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


# Backwards-compatible aliases (round-1 names)
attach_binary_payload = attach_media_payload
decode_stub = decode_media
frame_sample_stub = frame_sample
