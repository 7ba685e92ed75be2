"""Text splitters: SeparatorSplitter and RecursiveSplitter semantics
(reference: python/cocoindex/ops/text.py:40-86,121-155; impls
rust/ops_text/src/split/by_separators.rs and recursive.rs:591-650).

Chunks carry byte/char/line/col positions like the reference's
``Chunk`` dataclass (docs data_types.mdx:150-188).

Execution shape: the pure-Python splitting core is wrapped in an
Arrow-batched pandas UDF returning ``ARRAY<STRUCT<...>>`` which is
exploded — one Python round-trip per batch, no shuffle, scales
per-partition (SURVEY.md §2.10 mapping). Tree-sitter syntax awareness
is stubbed: language configs reduce to separator hierarchies (the
fallback path the reference itself uses for non-tree-sitter languages,
docs text.mdx:131-169).
"""

from __future__ import annotations

import bisect
import re
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

CHUNK_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("start_char", IntegerType()),
        StructField("end_char", IntegerType()),
        StructField("start_line", IntegerType()),
        StructField("start_col", IntegerType()),
        StructField("end_line", IntegerType()),
        StructField("end_col", IntegerType()),
    ]
)

# Separator hierarchies per "language" — the recursive splitter's
# fallback configs (text.mdx separator-fallback languages).
LANGUAGE_SEPARATORS: dict[str, list[str]] = {
    "text": [r"\n\n+", r"\n", r"(?<=[.!?])\s+", r"\s+"],
    "markdown": [r"\n#{1,6}\s", r"\n\n+", r"\n", r"(?<=[.!?])\s+", r"\s+"],
    "python": [r"\nclass\s", r"\ndef\s|\n\tdef\s|\n    def\s", r"\n\n+", r"\n", r"\s+"],
    "rust": [r"\nfn\s|\nimpl\s|\nmod\s", r"\n\n+", r"\n", r"\s+"],
}


@dataclass
class Chunk:
    text: str
    start_char: int
    end_char: int
    start_line: int
    start_col: int
    end_line: int
    end_col: int


class _LineIndex:
    def __init__(self, text: str):
        self.starts = [0]
        for m in re.finditer("\n", text):
            self.starts.append(m.end())

    def linecol(self, offset: int) -> tuple[int, int]:
        """1-based (line, col) for a char offset."""
        line = bisect.bisect_right(self.starts, offset)
        return line, offset - self.starts[line - 1] + 1


def _mk_chunk(text: str, idx: _LineIndex, start: int, end: int) -> Chunk:
    sl, sc = idx.linecol(start)
    el, ec = idx.linecol(max(end - 1, start))
    return Chunk(text[start:end], start, end, sl, sc, el, ec)


def split_by_separator(
    text: str,
    separator: str = r"\n\n+",
    chunk_size: int = 512,
    chunk_overlap: int = 0,
) -> list[Chunk]:
    """SeparatorSplitter.split (ops/text.py:40-86): split at a regex
    separator, greedily pack pieces into chunks of at most
    ``chunk_size`` chars; consecutive chunks overlap by up to
    ``chunk_overlap`` chars (whole-piece granularity)."""
    if not text:
        return []
    idx = _LineIndex(text)
    # piece boundaries: [start, end) spans between separator matches
    bounds: list[tuple[int, int]] = []
    prev = 0
    for m in re.finditer(separator, text):
        if m.start() > prev:
            bounds.append((prev, m.start()))
        prev = m.end()
    if prev < len(text):
        bounds.append((prev, len(text)))
    if not bounds:
        return []

    chunks: list[Chunk] = []
    cur_start, cur_end = bounds[0]
    for s, e in bounds[1:]:
        if e - cur_start <= chunk_size:
            cur_end = e
        else:
            chunks.append(_mk_chunk(text, idx, cur_start, cur_end))
            # overlap: reach back up to chunk_overlap chars into the
            # previous chunk (0 ⇒ start exactly at the new piece)
            cur_start = max(s - chunk_overlap, cur_start, 0)
            cur_end = e
    chunks.append(_mk_chunk(text, idx, cur_start, cur_end))
    return chunks


def split_recursive(
    text: str,
    chunk_size: int = 512,
    min_chunk_size: int = 0,
    language: str = "text",
    separators: list[str] | None = None,
) -> list[Chunk]:
    """RecursiveSplitter.split (ops/text.py:121-155): try the coarsest
    separator first; any piece still larger than ``chunk_size`` is
    re-split with the next separator; last resort is a hard character
    cut. Adjacent undersized pieces (< min_chunk_size) are merged."""
    seps = separators or LANGUAGE_SEPARATORS.get(language, LANGUAGE_SEPARATORS["text"])
    idx = _LineIndex(text)

    def rec(start: int, end: int, level: int) -> list[tuple[int, int]]:
        if end - start <= chunk_size:
            return [(start, end)] if end > start else []
        if level >= len(seps):  # hard cut
            return [
                (s, min(s + chunk_size, end)) for s in range(start, end, chunk_size)
            ]
        pieces: list[tuple[int, int]] = []
        prev = start
        for m in re.finditer(seps[level], text[start:end]):
            ps, pe = start + m.start(), start + m.end()
            if ps > prev:
                pieces.append((prev, ps))
            prev = pe
        if prev < end:
            pieces.append((prev, end))
        if len(pieces) <= 1:  # separator didn't help; go finer
            return rec(start, end, level + 1)
        # greedy repack to chunk_size, recursing into oversized pieces
        out: list[tuple[int, int]] = []
        cur_s, cur_e = None, None
        for ps, pe in pieces:
            if pe - ps > chunk_size:
                if cur_s is not None:
                    out.append((cur_s, cur_e))
                    cur_s = None
                out.extend(rec(ps, pe, level + 1))
            elif cur_s is None:
                cur_s, cur_e = ps, pe
            elif pe - cur_s <= chunk_size:
                cur_e = pe
            else:
                out.append((cur_s, cur_e))
                cur_s, cur_e = ps, pe
        if cur_s is not None:
            out.append((cur_s, cur_e))
        return out

    spans = rec(0, len(text), 0)
    # merge undersized neighbors (min_chunk_size)
    if min_chunk_size > 0 and spans:
        merged: list[tuple[int, int]] = [spans[0]]
        for s, e in spans[1:]:
            ls, le = merged[-1]
            if (le - ls < min_chunk_size or e - s < min_chunk_size) and e - ls <= chunk_size:
                merged[-1] = (ls, e)
            else:
                merged.append((s, e))
        spans = merged
    return [_mk_chunk(text, idx, s, e) for s, e in spans if e > s]


# --- Spark surface ------------------------------------------------------


def _chunks_to_records(chunks: list[Chunk]) -> list[dict]:
    return [c.__dict__ for c in chunks]


def split_udf(
    mode: str = "recursive",
    chunk_size: int = 512,
    chunk_overlap: int = 0,
    min_chunk_size: int = 0,
    language: str = "text",
    separator: str = r"\n\n+",
) -> Column:
    """Returns a pandas-UDF column: text → ARRAY<STRUCT<chunk fields>>.

    Usage::

        df.select("path", F.posexplode(split_chunks(F.col("text"))))
    """

    def split_series(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append([])
            elif mode == "recursive":
                out.append(
                    _chunks_to_records(
                        split_recursive(
                            t,
                            chunk_size=chunk_size,
                            min_chunk_size=min_chunk_size,
                            language=language,
                        )
                    )
                )
            else:
                out.append(
                    _chunks_to_records(
                        split_by_separator(
                            t,
                            separator=separator,
                            chunk_size=chunk_size,
                            chunk_overlap=chunk_overlap,
                        )
                    )
                )
        return pd.Series(out)

    return F.pandas_udf(split_series, ArrayType(CHUNK_SCHEMA))


def explode_chunks(df, text_col: str, **split_kwargs):
    """df + chunk columns: one row per chunk with positions."""
    arr = split_udf(**split_kwargs)(F.col(text_col))
    exploded = df.withColumn("__chunks", arr).select(
        *[c for c in df.columns], F.posexplode("__chunks").alias("chunk_idx", "__c")
    )
    return exploded.select(
        *[c for c in df.columns],
        "chunk_idx",
        F.col("__c.text").alias("chunk_text"),
        F.col("__c.start_char").alias("start_char"),
        F.col("__c.end_char").alias("end_char"),
        F.col("__c.start_line").alias("start_line"),
        F.col("__c.start_col").alias("start_col"),
        F.col("__c.end_line").alias("end_line"),
        F.col("__c.end_col").alias("end_col"),
    )
