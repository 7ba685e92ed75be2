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

# Separator hierarchies per language — the recursive splitter's
# boundary configs. The reference splits these 31 languages
# syntax-aware via tree-sitter (docs ops/text.mdx "Supported
# languages"; rust/ops_text/src/split/recursive.rs) and falls back to
# separator hierarchies for the rest; without tree-sitter in this
# container, every language gets a per-language boundary hierarchy
# (function/class/impl/section patterns first, then blank lines,
# lines, sentences, whitespace) — the reference's own fallback
# strategy, with language-specific coarse levels.
_TAIL = [r"\n\n+", r"\n", r"(?<=[.!?])\s+", r"\s+"]


def _lang(*coarse: str) -> list[str]:
    return [*coarse, *_TAIL]


# Every boundary pattern consumes ONLY the newline and looks ahead at
# the construct keyword — the split drops separator-matched text from
# the output, so a pattern that consumed "def " would lose it from the
# chunk. `\n(?=...)` keeps boundaries zero-width beyond the newline.
LANGUAGE_SEPARATORS: dict[str, list[str]] = {
    "text": list(_TAIL),
    # -- the reference's 31 tree-sitter languages (text.mdx table) --
    "astro": _lang(r"\n(?=---\s*\n)", r"\n(?=<[A-Za-z][^>\n]*>)"),
    "c": _lang(
        r"\n(?=(?:struct|enum|union|typedef)\s)",
        r"\n(?=[A-Za-z_][\w \t\*]*\([^\n]*\)\s*\{)",
    ),
    "cpp": _lang(
        r"\n(?=(?:class|struct|enum|union|typedef|namespace|template)\s)",
        r"\n(?=[A-Za-z_][\w :<>,&\t\*]*\([^\n]*\)\s*\{)",
    ),
    "c_sharp": _lang(
        r"\n(?=\s*(?:public|private|protected|internal|static|sealed|abstract)?\s*(?:class|interface|struct|enum|record)\s)",
        r"\n(?=\s+(?:public|private|protected|internal|static|override|virtual|async)[\w <>,\[\]]*\([^\n]*\))",
    ),
    "css": _lang(r"\n(?=@\w)", r"(?<=\})\s*\n"),
    "fortran": _lang(r"(?i)\n(?=\s*(?:subroutine|function|module|program|contains)\b)"),
    "go": _lang(r"\n(?=(?:func|type)\s)", r"\n(?=(?:var|const)\s)"),
    "html": _lang(
        r"\n(?=<(?:div|section|article|head|body|table|h[1-6])\b)",
        r"\n(?=<[A-Za-z][^>\n]*>)",
    ),
    "java": _lang(
        r"\n(?=\s*(?:public|private|protected)?\s*(?:abstract\s+|final\s+|static\s+)*(?:class|interface|enum|record)\s)",
        r"\n(?=\s+(?:public|private|protected|static|final|synchronized)[\w <>,\[\]]*\([^\n]*\))",
    ),
    "javascript": _lang(
        r"\n(?=(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s|(?:export\s+)?class\s)",
        r"\n(?=(?:export\s+)?(?:const|let|var)\s|\s+[A-Za-z_$][\w$]*\s*\([^\n]*\)\s*\{)",
    ),
    "json": [r"(?<=,)\n", *_TAIL],
    "julia": _lang(r"\n(?=(?:function|module|struct|macro|mutable struct)\s)"),
    "kotlin": _lang(
        r"\n(?=\s*(?:data\s+|sealed\s+|abstract\s+|open\s+)*(?:class|interface|object)\s)",
        r"\n(?=\s*(?:override\s+|suspend\s+|private\s+|public\s+|internal\s+)*fun\s)",
    ),
    "markdown": [r"\n(?=#{1,6}\s)", r"\n(?=(?:---+|\*\*\*+)\s*\n)", *_TAIL],
    "pascal": _lang(
        r"(?i)\n(?=\s*(?:procedure|function|unit|interface|implementation|begin)\b)"
    ),
    "php": _lang(
        r"\n(?=(?:namespace|class|interface|trait)\s)",
        r"\n(?=\s*(?:public\s+|private\s+|protected\s+|static\s+)*function\s)",
    ),
    "python": _lang(r"\n(?=class\s)", r"\n(?=[ \t]*(?:async\s+)?def\s)"),
    "r": _lang(r"\n(?=[A-Za-z._][\w.]*\s*(?:<-|=)\s*function)"),
    "ruby": _lang(r"\n(?=\s*(?:class|module)\s)", r"\n(?=\s*def\s)"),
    "rust": _lang(
        r"\n(?=(?:pub\s+)?(?:fn|impl|mod|trait|enum|struct|macro_rules!)\s)",
    ),
    "scala": _lang(
        r"\n(?=\s*(?:case\s+)?(?:class|object|trait)\s)",
        r"\n(?=\s*(?:override\s+|private\s+|protected\s+)*def\s)",
    ),
    "solidity": _lang(
        r"\n(?=\s*(?:contract|library|interface)\s)",
        r"\n(?=\s*(?:function|modifier|event)\s)",
    ),
    "sql": [
        r"(?<=;)\s*\n",
        r"(?i)\n(?=(?:CREATE|ALTER|DROP|INSERT|UPDATE|DELETE|SELECT|WITH|BEGIN|GRANT)\b)",
        *_TAIL,
    ],
    "svelte": _lang(r"\n(?=<(?:script|style|template)\b)", r"\n(?=<[A-Za-z][^>\n]*>)"),
    "swift": _lang(r"\n(?=\s*(?:func|class|struct|enum|extension|protocol)\s)"),
    "toml": [r"\n(?=\[{1,2}[^\]\n]+\]{1,2}\s*\n)", *_TAIL],
    "tsx": _lang(
        r"\n(?=(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s|(?:export\s+)?(?:abstract\s+)?class\s)",
        r"\n(?=(?:export\s+)?(?:const|let|var|type|interface)\s)",
    ),
    "typescript": _lang(
        r"\n(?=(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s|(?:export\s+)?(?:abstract\s+)?class\s)",
        r"\n(?=(?:export\s+)?(?:const|let|var|type|interface)\s)",
    ),
    "vue": _lang(r"\n(?=<(?:script|style|template)\b)", r"\n(?=<[A-Za-z][^>\n]*>)"),
    "xml": _lang(r"\n(?=<[A-Za-z][^>\n]*>)"),
    "yaml": [r"\n(?=---\s*\n)", r"\n(?=\S[^\n]*:)", *_TAIL],
    # -- separator-fallback languages the reference names (text.mdx) --
    "bash": _lang(r"\n(?=(?:function\s+)?[A-Za-z_]\w*\s*\(\)\s*\{|function\s)"),
    "dart": _lang(
        r"\n(?=\s*(?:class|mixin|enum|extension)\s)",
        r"\n(?=\s*(?:void|Future|Stream|[A-Z]\w*)\s+\w+\s*\()",
    ),
    "elixir": _lang(
        r"\n(?=\s*(?:defmodule|defprotocol|defimpl)\s)",
        r"\n(?=\s*(?:def|defp|defmacro)\s)",
    ),
    "elm": _lang(r"\n(?=[a-z]\w*\s*:)", r"\n(?=(?:type|module|import)\s)"),
    "haskell": _lang(
        r"\n(?=[a-z_][\w']*\s*::)",
        r"\n(?=(?:data|newtype|type|class|instance|module)\s)",
    ),
    "lua": _lang(r"\n(?=(?:local\s+)?function\s)"),
    "perl": _lang(r"\n(?=sub\s+\w+)", r"\n(?=(?:package|use)\s)"),
}

# Case-insensitive aliases (the reference resolves languages via
# UniCase + alias tables, recursive.rs RecursiveChunker::new).
LANGUAGE_ALIASES: dict[str, str] = {
    "c++": "cpp", "cxx": "cpp", "cc": "cpp",
    "csharp": "c_sharp", "cs": "c_sharp", "c#": "c_sharp",
    "js": "javascript", "mjs": "javascript", "cjs": "javascript", "jsx": "javascript",
    "ts": "typescript",
    "py": "python",
    "md": "markdown",
    "yml": "yaml",
    "rs": "rust",
    "golang": "go",
    "sh": "bash", "shell": "bash", "zsh": "bash",
    "plaintext": "text", "txt": "text", "plain": "text",
    "htm": "html",
    "kt": "kotlin", "kts": "kotlin",
    "f90": "fortran", "f95": "fortran",
    "pas": "pascal",
    "rb": "ruby",
    "jl": "julia",
    "pl": "perl",
}


def resolve_language(language: str | None) -> str:
    """Canonical language key: case-insensitive, alias-resolved,
    unknown → 'text' (the reference degrades unknown languages to the
    default splitter, recursive.rs split routing)."""
    key = (language or "text").lower()
    key = LANGUAGE_ALIASES.get(key, key)
    return key if key in LANGUAGE_SEPARATORS else "text"


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
            # previous chunk (0 ⇒ start exactly at the new piece), but
            # never back TO its start — starts stay strictly increasing
            cur_start = max(s - chunk_overlap, cur_start + 1, 0)
            cur_end = e
    chunks.append(_mk_chunk(text, idx, cur_start, cur_end))
    return chunks


def split_recursive(
    text: str,
    chunk_size: int = 512,
    min_chunk_size: int = 0,
    language: str = "text",
    separators: list[str] | None = None,
    chunk_overlap: int = 0,
) -> list[Chunk]:
    """RecursiveSplitter.split (ops/text.py:121-155): try the coarsest
    separator first; any piece still larger than ``chunk_size`` is
    re-split with the next separator; last resort is a hard character
    cut. Adjacent undersized pieces (< min_chunk_size) are merged.
    ``chunk_overlap`` reaches each chunk's start back into its
    predecessor by up to that many chars (clamped so a chunk never
    exceeds ``chunk_size`` — the reference clamps overlap to
    min_chunk_size similarly, recursive.rs split()).

    For ``language="python"`` (no explicit ``separators``) boundaries
    come from the stdlib ``ast`` parse tree — exact def/class spans by
    nesting depth, the analog of the reference's tree-sitter recursive
    chunking (recursive.rs:591-650) — so a ``def`` inside a docstring
    or comment is never a split point. Sources that fail to parse fall
    back to the regex hierarchy, exactly as the reference degrades
    non-parsing files to separator splitting.

    Each level of the hierarchy is either a regex separator (str) or a
    precomputed sorted list of zero-width boundary offsets (list[int]).
    """
    seps: list[str | list[int]]
    if separators is not None:
        seps = list(separators)
    else:
        lang = resolve_language(language)
        seps = list(LANGUAGE_SEPARATORS[lang])
        if lang == "python":
            from cocoindex_spark.operators.pyast import py_boundaries

            levels = py_boundaries(text)
            if levels is not None:
                # AST depth levels replace the regex class/def
                # lookaheads; the blank-line/line/sentence tail stays.
                seps = [*levels, *_TAIL]
        else:
            from cocoindex_spark.operators.code_boundaries import brace_boundaries

            levels = brace_boundaries(text, lang)
            if levels:
                # Token-stream boundaries (strings/comments skipped by
                # the lexer) replace the regex keyword lookaheads for
                # brace languages; unsupported languages and sources
                # with no constructs keep the regex hierarchy.
                seps = [*levels, *_TAIL]
    idx = _LineIndex(text)

    def rec(start: int, end: int, level: int) -> list[tuple[int, int]]:
        if end - start <= chunk_size:
            return [(start, end)] if end > start else []
        if level >= len(seps):  # hard cut
            return [
                (s, min(s + chunk_size, end)) for s in range(start, end, chunk_size)
            ]
        sep = seps[level]
        if isinstance(sep, list):  # zero-width AST boundary offsets
            matches = [(b, b) for b in sep if start < b < end]
        else:
            matches = [
                (start + m.start(), start + m.end())
                for m in re.finditer(sep, text[start:end])
            ]
        pieces: list[tuple[int, int]] = []
        prev = start
        for ps, pe in matches:
            if ps > prev:
                pieces.append((prev, ps))
            prev = max(prev, pe)
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
    # overlap: each chunk (except the first) starts up to chunk_overlap
    # chars inside its predecessor, never growing past chunk_size and
    # never reaching back TO the predecessor's start (strictly
    # increasing starts — a chunk that starts where its predecessor
    # does fully contains it).
    if chunk_overlap > 0 and len(spans) > 1:
        out_spans = [spans[0]]
        for i in range(1, len(spans)):
            s, e = spans[i]
            prev_s = spans[i - 1][0]
            out_spans.append(
                (max(s - chunk_overlap, prev_s + 1, e - chunk_size, 0), e)
            )
        spans = out_spans
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
                            chunk_overlap=chunk_overlap,
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
