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


# --- q74: cross-video frame near-dup (perceptual-hash-style dedup of
#     a video corpus): each sampled frame gets a 16-bit signature, the
#     top 8 bits are the blocking bucket (equi-join — pigeonhole: any
#     pair within hamming ≤ 2 on the low byte shares the high byte
#     exactly when the differing bits fall low, which is the candidate
#     class this blocks on), and candidates verify by exact popcount of
#     the XOR. Production swaps the md5-derived signature for a real
#     pHash over decoded pixels; join shape and verify are identical.
from cocoindex_spark.operators.text_ops import hex_to_int, sql_hex_to_int  # noqa: E402


@register(
    "q74_frame_near_dup",
    oracle=f"""
WITH frames AS ({sql_sample_frames(_DECODED, _EVERY_K)}),
sig AS (
  SELECT doc_id, frame_idx,
         {sql_hex_to_int("frame_md5", 4)} AS s,
         {sql_hex_to_int("frame_md5", 4)} // 256 AS bucket
  FROM frames
)
SELECT a.doc_id AS a_doc, b.doc_id AS b_doc,
       CAST(COUNT(*) AS BIGINT) AS n_similar_frames
FROM sig a JOIN sig b
  ON a.bucket = b.bucket AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)) <= 2
GROUP BY a.doc_id, b.doc_id
""",
)
def q74_frame_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    frames = sample_frames(d, "doc_id", "payload", every_k=_EVERY_K)
    sig = frames.select(
        "doc_id",
        hex_to_int(F.col("frame_md5"), 4).alias("s"),
        (hex_to_int(F.col("frame_md5"), 4) / F.lit(256)).cast("long").alias("bucket"),
    ).localCheckpoint(eager=True)  # decode runs once, feeds both sides
    a = sig.select(F.col("doc_id").alias("a_doc"), F.col("s").alias("a_s"), "bucket")
    b = sig.select(F.col("doc_id").alias("b_doc"), F.col("s").alias("b_s"), F.col("bucket").alias("b_bucket"))
    hamming = F.bit_count(F.expr("a_s ^ b_s"))
    return (
        a.join(b, (F.col("bucket") == F.col("b_bucket")) & (F.col("a_doc") < F.col("b_doc")))
        .filter(hamming <= 2)
        .groupBy("a_doc", "b_doc")
        .agg(F.count(F.lit(1)).alias("n_similar_frames"))
    )
