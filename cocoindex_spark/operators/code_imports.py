"""Import/include element views — the dependency-edge slice of the
reference's per-language AST element views (rust/code_ast/src/elements/
lang/go.rs:24 carries the import path as ``base_namespace``; the view
layer classifies declaration elements per language, lang.rs). Extracted
from the SAME comment/string-exact token stream as the definition
walkers (operators/code_match.tokenize), so an ``import`` inside a
string literal or comment can never become an edge.

Per-language statement grammars recognized (token-level, lexer-exact):

- python      ``import a.b [as x][, c]`` / ``from a.b import x, y``
- javascript/typescript/tsx
              ``import … from "m"`` / ``import "m"`` /
              ``export … from "m"`` / ``require("m")``
- java        ``import [static] a.b.C;`` / ``a.b.*;``
- go          ``import "m"`` / ``import ( [alias] "m" … )``
- rust        ``use a::b::{c, d};`` → base path ``a::b``
- c/cpp       ``#include <m>`` / ``#include "m"`` (the lexer already
              folds a preprocessor directive into one token)

Spark surface: :func:`imports_df` explodes one row per import edge,
Arrow-batched (the same per-row plumbing as definitions_df).
"""

from __future__ import annotations

import re

from cocoindex_spark.operators.code_match import Tok, tokenize

_WORD = re.compile(r"\w", re.UNICODE)
_STR = re.compile(r"""^(['"]).*\1$""", re.S)
_INCLUDE = re.compile(r'#\s*include\s*[<"]([^>"]+)[>"]')


def _line_leading(text: str, tok: Tok) -> bool:
    ls = text.rfind("\n", 0, tok.start) + 1
    return not text[ls : tok.start].strip()


def _strip_quotes(s: str) -> str:
    return s[1:-1] if _STR.match(s) else s


def _joined(text: str, prev: Tok, cur: Tok) -> bool:
    """True when ``cur`` continues ``prev``'s logical line (python
    statements are line-scoped; the token stream has no newline
    tokens, so the statement walk must stop at line breaks)."""
    return "\n" not in text[prev.end : cur.start]


def imports_of(text: str, language: str = "python") -> list[dict]:
    """[{module, start, end, kind}] sorted by position; ``module`` is
    the imported path/namespace, ``kind`` one of import/from/include/
    use/require. Unsupported languages return []."""
    toks = tokenize(text, language)
    out: list[dict] = []
    n = len(toks)

    if language == "python":
        i = 0
        while i < n:
            t = toks[i]
            if t.text in ("import", "from") and _line_leading(text, t):
                if t.text == "from":
                    j = i + 1
                    parts: list[str] = []
                    while (
                        j < n
                        and _joined(text, toks[j - 1], toks[j])
                        and (toks[j].text == "." or _WORD.match(toks[j].text))
                        and toks[j].text != "import"
                    ):
                        parts.append(toks[j].text)
                        j += 1
                    if parts and j < n and toks[j].text == "import":
                        out.append(
                            {
                                "module": "".join(parts),
                                "start": t.start,
                                "end": toks[j - 1].end,
                                "kind": "from",
                            }
                        )
                    i = j + 1
                    continue
                # import a.b [as x][, c.d]
                j = i + 1
                while j < n:
                    parts = []
                    k = j
                    while (
                        k < n
                        and _joined(text, toks[k - 1], toks[k])
                        and (toks[k].text == "." or _WORD.match(toks[k].text))
                    ):
                        if toks[k].text == "as":
                            break
                        parts.append(toks[k].text)
                        k += 1
                    if parts:
                        out.append(
                            {
                                "module": "".join(parts),
                                "start": toks[j].start,
                                "end": toks[k - 1].end,
                                "kind": "import",
                            }
                        )
                    if (
                        k < n
                        and toks[k].text == "as"
                        and _joined(text, toks[k - 1], toks[k])
                    ):
                        k += 2
                    if (
                        k < n
                        and toks[k].text == ","
                        and _joined(text, toks[k - 1], toks[k])
                    ):
                        j = k + 1
                        continue
                    # resume the outer scan AT k (the trailing i += 1
                    # lands there), so a statement starting right after
                    # this one — `import m\nfrom p import x` — is seen
                    i = k - 1
                    break
                else:
                    i = j
            i += 1
        return out

    if language in ("javascript", "typescript", "tsx"):
        i = 0
        while i < n:
            t = toks[i]
            if t.text in ("import", "export"):
                # … from "m"  |  import "m"
                j = i + 1
                if t.text == "import" and j < n and _STR.match(toks[j].text):
                    out.append(
                        {
                            "module": _strip_quotes(toks[j].text),
                            "start": t.start,
                            "end": toks[j].end,
                            "kind": "import",
                        }
                    )
                    i = j + 1
                    continue
                while j < n and toks[j].text not in (";", "import", "export"):
                    if toks[j].text == "from" and j + 1 < n and _STR.match(
                        toks[j + 1].text
                    ):
                        out.append(
                            {
                                "module": _strip_quotes(toks[j + 1].text),
                                "start": t.start,
                                "end": toks[j + 1].end,
                                "kind": "import",
                            }
                        )
                        break
                    j += 1
                i = j + 1
                continue
            if (
                t.text == "require"
                and i + 2 < n
                and toks[i + 1].text == "("
                and _STR.match(toks[i + 2].text)
            ):
                out.append(
                    {
                        "module": _strip_quotes(toks[i + 2].text),
                        "start": t.start,
                        "end": toks[i + 2].end,
                        "kind": "require",
                    }
                )
                i += 3
                continue
            i += 1
        return out

    if language == "java":
        i = 0
        while i < n:
            if toks[i].text == "import":
                j = i + 1
                if j < n and toks[j].text == "static":
                    j += 1
                parts = []
                while j < n and toks[j].text != ";":
                    parts.append(toks[j].text)
                    j += 1
                if parts:
                    out.append(
                        {
                            "module": "".join(parts),
                            "start": toks[i].start,
                            "end": toks[j - 1].end,
                            "kind": "import",
                        }
                    )
                i = j
            i += 1
        return out

    if language == "go":
        i = 0
        while i < n:
            if toks[i].text == "import":
                if i + 1 < n and _STR.match(toks[i + 1].text):
                    out.append(
                        {
                            "module": _strip_quotes(toks[i + 1].text),
                            "start": toks[i].start,
                            "end": toks[i + 1].end,
                            "kind": "import",
                        }
                    )
                    i += 2
                    continue
                if i + 1 < n and toks[i + 1].text == "(":
                    j = i + 2
                    while j < n and toks[j].text != ")":
                        if _STR.match(toks[j].text):
                            out.append(
                                {
                                    "module": _strip_quotes(toks[j].text),
                                    "start": toks[j].start,
                                    "end": toks[j].end,
                                    "kind": "import",
                                }
                            )
                        j += 1
                    i = j
            i += 1
        return out

    if language == "rust":
        i = 0
        while i < n:
            if toks[i].text == "use":
                j = i + 1
                parts = []
                while j < n and toks[j].text not in (";", "{", "as"):
                    parts.append(toks[j].text)
                    j += 1
                base = "".join(parts).rstrip(":")
                if base:
                    out.append(
                        {
                            "module": base,
                            "start": toks[i].start,
                            "end": toks[j - 1].end if j > i + 1 else toks[i].end,
                            "kind": "use",
                        }
                    )
                while j < n and toks[j].text != ";":
                    j += 1
                i = j
            i += 1
        return out

    if language in ("c", "cpp"):
        # preprocessor directives lex as ONE token; parse its text
        for t in toks:
            m = _INCLUDE.match(t.text)
            if m:
                out.append(
                    {
                        "module": m.group(1).strip(),
                        "start": t.start,
                        "end": t.end,
                        "kind": "include",
                    }
                )
        return out

    return []


def imports_df(df, text_col: str, language: str = "python"):
    """One row per import edge found in ``text_col`` — Arrow-batched
    per-row extraction + explode, the definitions_df plumbing."""
    import pandas as pd
    from pyspark.sql import functions as F

    schema = (
        "array<struct<module: string, start: long, end: long, kind: string>>"
    )

    def run(texts):
        return pd.Series(
            [
                [
                    (d["module"], d["start"], d["end"], d["kind"])
                    for d in imports_of(t or "", language)
                ]
                for t in texts
            ]
        )

    udf = F.pandas_udf(run, schema)

    return df.withColumn("__i", F.explode(udf(F.col(text_col)))).select(
        *[c for c in df.columns],
        F.col("__i.module").alias("module"),
        F.col("__i.start").alias("imp_start"),
        F.col("__i.end").alias("imp_end"),
        F.col("__i.kind").alias("imp_kind"),
    )
