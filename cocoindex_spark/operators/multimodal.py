"""Multimodal column handling: image/audio/video as opaque BINARY
columns with typed metadata (training-data-pipeline extension;
reference analog: LiteLLMTranscriber audio→text, ops/litellm.py:325).

The real Spark-side plumbing — schema, Arrow batching via
``mapInPandas``, partition-preserving decode — is implemented and
tested. The actual codec step is STUBBED: the container has no
image/audio libraries, so ``decode_image_meta`` derives deterministic
fake metadata from the md5 of the payload. A production deployment
replaces ``_fake_decode_row`` with PIL/ffmpeg calls; everything
around it (batch shape, schema contract, partitioning) is unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("content_md5", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("modality", StringType()),
    ]
)


def _fake_decode_row(doc_id: int, payload: bytes) -> dict:
    """Deterministic stand-in for a real image/av decode.

    Derives pseudo-metadata from the content hash — replace with a real
    codec (PIL.Image.open etc.) in production. NOT RANDOM: must agree
    with the SQL oracle.
    """
    h = hashlib.md5(payload).hexdigest()
    w = int(h[0:4], 16) % 1920 + 1
    ht = int(h[4:8], 16) % 1080 + 1
    frames = int(h[8:12], 16) % 240 + 1
    modality = ("image", "audio", "video")[int(h[12:14], 16) % 3]
    return {
        "doc_id": doc_id,
        "byte_len": len(payload),
        "content_md5": h,
        "width": w,
        "height": ht,
        "n_frames": frames,
        "modality": modality,
    }


def decode_binary_meta(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """Arrow-batched decode of an opaque binary column → typed metadata.

    Partition-preserving ``mapInPandas``: no shuffle, batches stream
    through Python with Arrow transfer, executor-parallel — the shape a
    real 100 TB multimodal decode uses (plus binaryFile input splitting).
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _fake_decode_row(int(i), bytes(b))
                for i, b in zip(pdf[id_col], pdf[binary_col])
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_SCHEMA.fields])

    narrow = df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(binary_col).cast("binary").alias(binary_col)
    )
    return narrow.mapInPandas(decode_batches, DECODE_SCHEMA)


def sql_fake_decode(doc_table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of decode_binary_meta over utf-8 encoded text payloads."""
    h = f"md5({text_col})"

    def hex4(start: int) -> str:
        out = "CAST(0 AS BIGINT)"
        for i in range(start, start + 4):
            out = f"({out} * 16 + (strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1))"
        return out

    hex2 = (
        f"((strpos('0123456789abcdef', substr({h}, 13, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substr({h}, 14, 1)) - 1))"
    )
    return f"""
  SELECT {id_col} AS doc_id,
    CAST(octet_length(encode({text_col})) AS BIGINT) AS byte_len,
    {h} AS content_md5,
    {hex4(0)} % 1920 + 1 AS width,
    {hex4(4)} % 1080 + 1 AS height,
    {hex4(8)} % 240 + 1 AS n_frames,
    (['image', 'audio', 'video'])[{hex2} % 3 + 1] AS modality
  FROM {doc_table}
"""
