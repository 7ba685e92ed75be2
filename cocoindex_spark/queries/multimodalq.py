"""Multimodal pipeline queries: binary payload → Arrow-batched decode
stub → metadata aggregation. The decode itself runs through real
``mapInPandas`` plumbing (see operators/multimodal.py); the oracle
recomputes the deterministic fake decode in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cocoindex_spark.operators.multimodal import decode_binary_meta, sql_fake_decode
from cocoindex_spark.queries.registry import register, table

_DECODED = sql_fake_decode("documents", "doc_id", "text")


# --- q70: decode stub over binary column (mapInPandas, Arrow batches)
@register(
    "q70_multimodal_decode",
    oracle=f"""
WITH decoded AS ({_DECODED})
SELECT doc_id, byte_len, content_md5, width, height, n_frames, modality
FROM decoded
""",
)
def q70_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return decode_binary_meta(d, "doc_id", "payload")


# --- q71: metadata rollup after decode (per-modality size/shape stats)
@register(
    "q71_multimodal_stats",
    oracle=f"""
WITH decoded AS ({_DECODED})
SELECT modality, COUNT(*) AS n,
  CAST(SUM(byte_len) AS BIGINT) AS total_bytes,
  MIN(width) AS min_width, MAX(width) AS max_width,
  CAST(SUM(width * height) AS DOUBLE) / SUM(n_frames) AS px_per_frame
FROM decoded GROUP BY modality
""",
)
def q71_multimodal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    meta = decode_binary_meta(d, "doc_id", "payload")
    return meta.groupBy("modality").agg(
        F.count("*").alias("n"),
        F.sum("byte_len").alias("total_bytes"),
        F.min("width").alias("min_width"),
        F.max("width").alias("max_width"),
        (
            F.sum(F.col("width") * F.col("height")).cast("double") / F.sum("n_frames")
        ).alias("px_per_frame"),
    )


# --- q72: frame sampling + resize (one→many fan-out inside the Arrow
#     batch — the video-corpus shape: explode to frames executor-side,
#     never through the driver, never a shuffle)
from cocoindex_spark.operators.multimodal import (  # noqa: E402
    sample_frames,
    sql_sample_frames,
)

_EVERY_K = 24


@register(
    "q72_multimodal_frames",
    oracle=f"""
WITH frames AS ({sql_sample_frames(_DECODED, _EVERY_K)})
SELECT doc_id, frame_idx, frame_md5, out_width, out_height
FROM frames
""",
)
def q72_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return sample_frames(d, "doc_id", "payload", every_k=_EVERY_K)


# --- q73: audio transcription plumbing (LiteLLMTranscriber analog,
#     ops/litellm.py:325-380): binary payload → text via an injected
#     backend. The backend here is the deterministic fake (production
#     injects the model/API call); the Arrow-batched mapInPandas
#     plumbing is identical either way.
from cocoindex_spark.operators.embed import transcribe_column  # noqa: E402


def _fake_transcribe(b: bytes) -> str:
    import hashlib

    return f"len={len(b)} md5={hashlib.md5(b).hexdigest()[:8]}"


@register(
    "q73_transcribe",
    oracle="""
SELECT doc_id,
       'len=' || CAST(octet_length(encode(text)) AS VARCHAR)
         || ' md5=' || substr(md5(text), 1, 8) AS transcript
FROM documents
""",
)
def q73_transcribe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("audio")
    )
    return transcribe_column(d, "audio", transcribe_fn=_fake_transcribe).select(
        "doc_id", "transcript"
    )
