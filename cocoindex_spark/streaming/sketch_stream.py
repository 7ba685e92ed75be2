"""Streaming sketch maintenance — the §2.11 twin of q102/q135.

HLL registers are MAX-mergeable, which is exactly the shape Spark's
built-in streaming aggregation state wants: ``groupBy(group, j).max(rho)``
over a document stream keeps one bounded row per (group, register) in
the state store, updated per micro-batch with map-side partial merges —
no custom stateful operator needed (contrast the sessionizer/deduper,
whose semantics genuinely need ``applyInPandasWithState``). At 100 TB
of stream history the state is still ``m`` rows per group.

The register math is ``operators/sketch.hll_registers`` verbatim (pure
DataFrame expressions, so the same code plans on a batch OR streaming
frame); parity with the batch sketch over the same rows is pinned in
``tests/test_stateful_streaming.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cocoindex_spark.operators.sketch import hll_registers


def hll_register_stream(docs: DataFrame, group_col: str = "source") -> DataFrame:
    """Streaming register table (group, j, M) from a document stream
    with ``text``: tokenize then MAX-aggregate register ranks. Run with
    ``outputMode("update")`` (or ``"complete"`` for a full snapshot) —
    MAX is monotone, so update-mode rows are always safe to upsert into
    a serving table keyed by (group, j)."""
    toks = docs.select(
        group_col, F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    )
    return hll_registers(toks, [group_col], "tok")


def cm_cell_stream(docs: DataFrame) -> DataFrame:
    """Streaming Count-Min cell table (row, cell, n): SUM-mergeable, so
    it is likewise a built-in streaming aggregation with bounded state
    (d·w rows total). Cell math is ``operators/sketch.cm_cells``
    verbatim. SUM in update mode emits the RUNNING total per cell —
    upsert (replace, don't add) into a serving table keyed by
    (row, cell)."""
    from cocoindex_spark.operators.sketch import cm_cells

    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    )
    return cm_cells(toks, "tok")


def cdc_chunk_stream(docs: DataFrame) -> DataFrame:
    """Streaming content-defined-chunk dedup counts (chunk_hash,
    n_occurrences) — q147's live twin. Chunking is per-row array work
    (operators/cdc.py, shared with the batch query), so the only state
    is the built-in COUNT aggregation keyed by chunk hash —
    SUM-mergeable across micro-batches like cm_cell_stream. Update
    mode emits running totals per hash; upsert (replace) into a
    serving table keyed by chunk_hash."""
    from cocoindex_spark.operators.cdc import cdc_chunk_hashes

    return (
        cdc_chunk_hashes(docs)
        .groupBy("chunk_hash")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )
