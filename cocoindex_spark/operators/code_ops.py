"""Code-aware operators: language detection and structural pattern
matching (reference: `python/cocoindex/ops/text.py:20`
``detect_code_language``; language table `rust/code_ast/src/prog_langs.rs`;
`python/cocoindex/ops/code.py:115-160` ``CodePattern.match_source`` with
the cheap lexical prefilter ``might_match`` at `ops/code.py:143`).

Spark-first design:

- Language detection is a **broadcast map lookup** on the file
  extension — a JVM-side ``CASE`` chain built from a literal table, so
  it stays inside whole-stage codegen (no Python UDF, no shuffle).
- Pattern matching mirrors the reference's two-phase plan: a cheap
  ``contains()`` prefilter on the pattern's literal tokens prunes the
  candidate set *before* the expensive regex/capture stage runs
  (`ops/code.py:143` — "cheap lexical prefilter before AST match").
  At 100 TB the prefilter is the difference between regexing every
  document and regexing the ~1% that can possibly match; both stages
  are per-row (embarrassingly parallel, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Extension → language, mirroring the reference's full tree-sitter
# language table (prog_langs.rs; docs ops/text.mdx "Supported
# languages" extension column). Public knowledge: standard
# file-extension conventions. Language names match the reference's
# `language=` values (and the splitter's LANGUAGE_SEPARATORS keys).
LANG_BY_EXT: dict[str, str] = {
    "astro": "astro",
    "c": "c",
    "h": "c",
    "cc": "cpp",
    "cpp": "cpp",
    "cxx": "cpp",
    "hpp": "cpp",
    "cs": "c_sharp",
    "css": "css",
    "f": "fortran",
    "f90": "fortran",
    "f95": "fortran",
    "go": "go",
    "html": "html",
    "htm": "html",
    "java": "java",
    "js": "javascript",
    "mjs": "javascript",
    "cjs": "javascript",
    "jsx": "javascript",
    "json": "json",
    "jsonc": "json",
    "jl": "julia",
    "kt": "kotlin",
    "kts": "kotlin",
    "md": "markdown",
    "markdown": "markdown",
    "pas": "pascal",
    "php": "php",
    "py": "python",
    "r": "r",
    "rb": "ruby",
    "rs": "rust",
    "scala": "scala",
    "sol": "solidity",
    "sql": "sql",
    "svelte": "svelte",
    "swift": "swift",
    "toml": "toml",
    "ts": "typescript",
    "tsx": "tsx",
    "vue": "vue",
    "xml": "xml",
    "yaml": "yaml",
    "yml": "yaml",
}


def ext_of(path: Column) -> Column:
    """Lowercased extension of a path column (empty string if none)."""
    return F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]+)$", 1))


def detect_code_language(path: Column, default: str = "unknown") -> Column:
    """filename → language enum (ops/text.py:20 analog).

    Emitted as one JVM-side CASE chain over the literal table — Catalyst
    constant-folds it; nothing leaves codegen.
    """
    ext = ext_of(path)
    expr: Column = F.lit(default)
    # Build WHEN chain in deterministic (sorted) order.
    for e, lang in sorted(LANG_BY_EXT.items(), reverse=True):
        expr = F.when(ext == e, F.lit(lang)).otherwise(expr)
    return expr


def sql_detect_code_language(path: str, default: str = "unknown") -> str:
    """DuckDB spelling of the same CASE chain (for oracle parity)."""
    ext = f"lower(regexp_extract({path}, '\\.([A-Za-z0-9]+)$', 1))"
    whens = "\n".join(
        f"WHEN '{e}' THEN '{lang}'" for e, lang in sorted(LANG_BY_EXT.items())
    )
    return f"CASE {ext} {whens} ELSE '{default}' END"


def might_match(text: Column, literal_tokens: list[str]) -> Column:
    """Cheap lexical prefilter (CodePattern.might_match, ops/code.py:143):
    a pattern can only match if every literal token it contains appears
    in the text. Conjunction of ``contains`` — codegen-friendly, no
    regex engine involved."""
    cond = F.lit(True)
    for tok in literal_tokens:
        cond = cond & text.contains(tok)
    return cond


def match_pattern(
    df: DataFrame,
    text_col: str,
    regex: str,
    capture_group: int = 1,
    prefilter_tokens: list[str] | None = None,
) -> DataFrame:
    """Structural pattern matching with captures (CodePattern.match_source
    analog, ops/code.py:115-160; capture syntax \\NAME in the reference
    maps to regex capture groups here).

    Two-phase plan: prefilter (contains) → regexp_extract_all → explode.
    Returns the input rows with a ``match`` column, one row per capture.
    """
    if prefilter_tokens:
        df = df.filter(might_match(F.col(text_col), prefilter_tokens))
    return df.withColumn(
        "match",
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(regex), F.lit(capture_group))),
    )
