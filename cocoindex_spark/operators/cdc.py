"""Content-defined chunking (FastCDC-style word gear) as a reusable
operator — pure array-land SQL expressions, no UDF, no window — so the
SAME plan runs on a batch frame (q147) or a streaming frame
(streaming.sketch_stream.cdc_chunk_stream): per-row work composes with
Structured Streaming's built-in aggregation state.

Boundary rule: 0-based word index i (1..n-1) cuts BEFORE word i+1 when
gear(w_i, w_{i+1}) % 8 == 0 — local content only, so an edit moves at
most the two chunks that touch it (the CDC stability property).
Single-word documents have no interior boundaries and emit one
whole-doc chunk (sequence(1, 0) is DESCENDING in Spark, hence the
explicit guard)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GEAR = (
    "CAST(conv(substring(md5(concat(element_at(w, CAST(i AS INT)), ' ', "
    "element_at(w, CAST(i AS INT) + 1))), 1, 12), 16, 10) AS BIGINT) % 8 = 0"
)

_MARKS = (
    "concat(array(CAST(0 AS BIGINT)), "
    "filter(CASE WHEN size(w) >= 2 THEN sequence(CAST(1 AS BIGINT), size(w) - 1) "
    f"ELSE CAST(array() AS ARRAY<BIGINT>) END, i -> {_GEAR}))"
)

_CHUNK_HASHES = (
    "transform(sequence(1, size(bs)), j -> md5(concat_ws(' ', "
    "slice(w, CAST(element_at(bs, j) + 1 AS INT), "
    "CAST((IF(j = size(bs), size(w), element_at(bs, j + 1))) "
    "- element_at(bs, j) AS INT)))))"
)


def cdc_chunk_hashes(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per content-defined chunk: every input column except
    ``text_col``, plus ``chunk_hash``. Blank documents emit nothing."""
    keep = [c for c in docs.columns if c != text_col]
    d = docs.filter(F.length(F.trim(F.col(text_col))) > 0)
    w = F.split(F.trim(F.col(text_col)), " ")
    return (
        d.select(*keep, w.alias("w"))
        .withColumn("bs", F.expr(_MARKS))
        .select(*keep, F.explode(F.expr(_CHUNK_HASHES)).alias("chunk_hash"))
    )
