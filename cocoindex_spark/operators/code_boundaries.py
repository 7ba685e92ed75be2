"""Syntax-aware chunk boundaries for brace-structured languages.

The reference derives recursive-chunk boundaries from tree-sitter
parse trees (rust/ops_text/src/split/recursive.rs:591-650). Python
gets exact spans from the stdlib ast (operators/pyast.py); this module
covers the C-family languages with the next-best public tool already
in the repo: the code_match lexer, which skips strings and comments
per language. Boundaries are derived from the TOKEN stream —
construct keywords at brace depth 0/1, and ``) {`` function headers —
so a ``func`` inside a string literal or a ``/* class */`` comment can
never become a split point, which is exactly the failure mode of the
regex lookahead hierarchy (operators/split.py LANGUAGE_SEPARATORS).

Output matches ``pyast.py_boundaries``: line-start offsets grouped by
nesting depth (depth 0 = top level, depth 1 = members), consumed by
``split_recursive`` as zero-width separator levels before the
blank-line/line/sentence tail.
"""

from __future__ import annotations

from cocoindex_spark.operators.code_match import _C_FAMILY, tokenize

# Construct-introducing keywords per language, and the modifier words
# allowed before them on the same line (a keyword is only a boundary
# when it starts its statement — everything before it on the line must
# be a modifier, which is how `return fn(x)` or `x = function() {}`
# stay chunk-internal).
_KEYWORDS: dict[str, set[str]] = {
    "c": {"struct", "enum", "union", "typedef"},
    "cpp": {"struct", "enum", "union", "typedef", "namespace", "template", "class"},
    "c_sharp": {"class", "interface", "struct", "enum", "record", "namespace"},
    "java": {"class", "interface", "enum", "record"},
    "javascript": {"function", "class", "const", "let", "var"},
    "typescript": {"function", "class", "const", "let", "var", "interface", "type", "enum", "namespace"},
    "tsx": {"function", "class", "const", "let", "var", "interface", "type", "enum"},
    "go": {"func", "type", "var", "const"},
    "rust": {"fn", "impl", "mod", "trait", "enum", "struct", "union", "macro_rules"},
    "kotlin": {"fun", "class", "interface", "object"},
    "scala": {"def", "class", "object", "trait"},
    "swift": {"func", "class", "struct", "enum", "extension", "protocol"},
    "php": {"function", "class", "interface", "trait", "namespace"},
    "dart": {"class", "mixin", "enum", "extension"},
    "solidity": {"contract", "library", "interface", "function", "modifier", "event"},
}

_MODIFIERS = {
    "pub", "export", "default", "public", "private", "protected", "internal",
    "static", "final", "abstract", "sealed", "async", "unsafe", "extern",
    "inline", "const", "data", "open", "override", "suspend", "virtual",
    "declare", "readonly", "partial", "external", "crate",
}

# Languages where a bare `name(args) {` header opens a function with no
# introducing keyword (C functions, C++/Java/C# methods).
_HEADER_LANGS = {"c", "cpp", "java", "c_sharp"}

_MAX_DEPTH = 1  # boundary levels: top level and first-level members


def supports(language: str) -> bool:
    return language in _C_FAMILY and language in (_KEYWORDS.keys() | _HEADER_LANGS)


def brace_boundaries(text: str, language: str) -> list[list[int]] | None:
    """Line-start boundary offsets grouped by brace depth, or None when
    the language is unsupported or the source yields no boundaries
    (caller falls back to the regex hierarchy)."""
    if not supports(language):
        return None
    toks = tokenize(text, language)
    if not toks:
        return None
    keywords = _KEYWORDS.get(language, set())

    line_starts = [0]
    for i, ch in enumerate(text):
        if ch == "\n":
            line_starts.append(i + 1)

    import bisect

    def line_start_of(offset: int) -> int:
        return line_starts[bisect.bisect_right(line_starts, offset) - 1]

    def starts_statement(idx: int) -> bool:
        """Every earlier token on the same line is a modifier."""
        ls = line_start_of(toks[idx].start)
        j = idx - 1
        while j >= 0 and toks[j].start >= ls:
            if toks[j].text not in _MODIFIERS:
                return False
            j -= 1
        return True

    by_depth: dict[int, set[int]] = {}
    depth = 0
    for i, t in enumerate(toks):
        if t.text == "{":
            # `) {` at a boundary depth: a keywordless function/method
            # header (C functions, Java/C# methods). The boundary sits
            # at the line start of the header's opening identifier.
            if (
                language in _HEADER_LANGS
                and depth <= _MAX_DEPTH
                and i >= 2
                and toks[i - 1].text == ")"
            ):
                # walk back over the balanced (...) to the name token
                bal = 0
                j = i - 1
                while j >= 0:
                    if toks[j].text == ")":
                        bal += 1
                    elif toks[j].text == "(":
                        bal -= 1
                        if bal == 0:
                            break
                    j -= 1
                if j > 0 and (toks[j - 1].text[0].isalpha() or toks[j - 1].text[0] == "_"):
                    off = line_start_of(toks[j - 1].start)
                    if off > 0:
                        by_depth.setdefault(depth, set()).add(off)
            depth += 1
            continue
        if t.text == "}":
            depth = max(0, depth - 1)
            continue
        if depth <= _MAX_DEPTH and t.text in keywords and starts_statement(i):
            off = line_start_of(t.start)
            if off > 0:
                by_depth.setdefault(depth, set()).add(off)
    if not by_depth:
        return None
    max_d = max(by_depth)
    return [sorted(by_depth.get(d, set())) for d in range(max_d + 1)]
