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


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_md5", StringType()),
        StructField("out_width", LongType()),
        StructField("out_height", LongType()),
    ]
)

RESIZE_MAX = 224  # longest-side cap, integer-exact downscale


def _resize(w: int, h: int) -> tuple[int, int]:
    """Deterministic longest-side-224 downscale (integer floor math —
    replicable in SQL; upscales never happen)."""
    g = max(w, h)
    if g <= RESIZE_MAX:
        return w, h
    return max(1, w * RESIZE_MAX // g), max(1, h * RESIZE_MAX // g)


def sample_frames(
    df: DataFrame, id_col: str, binary_col: str, every_k: int = 24
) -> DataFrame:
    """Frame sampling + resize: one→many UDTF over the binary column.

    For each item, the (stubbed) decode yields ``n_frames``; frames are
    sampled at a fixed stride (0, k, 2k, …) and each sampled frame gets
    deterministic identity (md5 of content hash + index) and resized
    dims. Runs as partition-preserving ``mapInPandas`` — the fan-out
    happens executor-side inside the Arrow batch, no shuffle, so a
    100 TB video corpus explodes to frames without ever collecting or
    re-partitioning. A production deployment swaps the per-frame body
    for real ffmpeg frame extraction; batch shape and schema hold.
    """

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in FRAME_SCHEMA.fields}
            for i, b in zip(pdf[id_col], pdf[binary_col]):
                meta = _fake_decode_row(int(i), bytes(b))
                ow, oh = _resize(meta["width"], meta["height"])
                for fidx in range(0, meta["n_frames"], every_k):
                    out["doc_id"].append(int(i))
                    out["frame_idx"].append(fidx)
                    out["frame_md5"].append(
                        hashlib.md5(
                            f"{meta['content_md5']}:{fidx}".encode()
                        ).hexdigest()
                    )
                    out["out_width"].append(ow)
                    out["out_height"].append(oh)
            yield pd.DataFrame(out)

    narrow = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(binary_col).cast("binary").alias(binary_col),
    )
    return narrow.mapInPandas(sample_batches, FRAME_SCHEMA)


def sql_sample_frames(decoded_cte: str, every_k: int = 24) -> str:
    """DuckDB twin of sample_frames over a decoded CTE (doc_id,
    content_md5, width, height, n_frames). ``range(0, n, k)`` is
    end-exclusive, matching Python's ``range``."""
    return f"""
  SELECT doc_id,
         CAST(f AS BIGINT) AS frame_idx,
         md5(content_md5 || ':' || CAST(f AS VARCHAR)) AS frame_md5,
         CAST(CASE WHEN GREATEST(width, height) <= {RESIZE_MAX} THEN width
              ELSE GREATEST(1, (width * {RESIZE_MAX}) // GREATEST(width, height)) END AS BIGINT) AS out_width,
         CAST(CASE WHEN GREATEST(width, height) <= {RESIZE_MAX} THEN height
              ELSE GREATEST(1, (height * {RESIZE_MAX}) // GREATEST(width, height)) END AS BIGINT) AS out_height
  FROM (
    SELECT d.*, unnest(range(0, CAST(d.n_frames AS BIGINT), {every_k})) AS f
    FROM ({decoded_cte}) d
  )
"""


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
