"""AST-exact code intelligence for Python sources via the stdlib
``ast`` module (public, zero extra deps).

The reference drives recursive chunking and definition views off real
tree-sitter parse trees (rust/ops_text/src/split/recursive.rs:591-650;
rust/code_ast/src/view/lang.rs classify/is_region). The repo's regex
boundary hierarchies (operators/split.py) and token matcher
(operators/code_match.py) approximate that but mis-handle keywords
inside strings/comments — a ``def`` inside a docstring is a split
boundary to a regex and a definition to the token matcher. For
``language="python"`` this module supplies exact spans from the parse
tree; the regex/token paths remain the fallback for every other
language and for sources that do not parse.

Everything here is pure per-row Python intended to run inside the
existing Arrow-batched pandas UDFs — no new Spark surface, no shuffle.
"""

from __future__ import annotations

import ast


def _line_starts(text: str) -> list[int]:
    starts = [0]
    for i, ch in enumerate(text):
        if ch == "\n":
            starts.append(i + 1)
    return starts


def _offset(starts: list[int], lineno: int, col: int) -> int:
    """Char offset for a 1-based line / 0-based col (ast convention)."""
    return starts[lineno - 1] + col


def parse_python(text: str) -> ast.Module | None:
    """``ast.parse`` that degrades to None instead of raising — the
    caller falls back to the regex/token path, mirroring the
    reference's tree-sitter → separator-hierarchy fallback."""
    try:
        return ast.parse(text)
    except (SyntaxError, ValueError, MemoryError, RecursionError):
        return None


_DEF_NODES = (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)


def py_definitions(text: str, tree: ast.Module | None = None) -> list[dict] | None:
    """AST-exact definition regions: [{kind, name, start, end, depth}]
    sorted by position, or None when the source does not parse.

    ``start`` points at the first decorator when present (the region a
    chunker should keep with the definition); ``end`` is the exact end
    of the body. Nested definitions are reported with their depth
    (0 = module level).
    """
    if tree is None:
        tree = parse_python(text)
    if tree is None:
        return None
    starts = _line_starts(text)
    out: list[dict] = []

    def walk(node: ast.AST, depth: int) -> None:
        for child in ast.iter_child_nodes(node):
            if isinstance(child, _DEF_NODES):
                first = child.decorator_list[0] if child.decorator_list else child
                begin = _offset(starts, first.lineno, first.col_offset)
                if child.decorator_list:
                    # the decorator node's offset points at the
                    # expression AFTER the '@' — back up to include it
                    at = text.rfind("@", starts[first.lineno - 1], begin)
                    if at != -1:
                        begin = at
                out.append(
                    {
                        "kind": "class" if isinstance(child, ast.ClassDef) else "function",
                        "name": child.name,
                        "start": begin,
                        "end": _offset(
                            starts, child.end_lineno, child.end_col_offset
                        ),
                        "depth": depth,
                    }
                )
                walk(child, depth + 1)
            elif isinstance(
                child,
                (
                    ast.If,
                    ast.Try,
                    ast.With,
                    ast.AsyncWith,
                    ast.For,
                    ast.AsyncFor,
                    ast.While,
                    ast.Match,
                    ast.match_case,
                ),
            ):
                # defs guarded by module-level if/try/for/while/match
                # keep their depth: they are still top-level regions to
                # a chunker (tree-sitter surfaces them the same way).
                walk(child, depth)

    walk(tree, 0)
    return sorted(out, key=lambda d: d["start"])


def py_boundaries(text: str, tree: ast.Module | None = None) -> list[list[int]] | None:
    """Chunk-boundary offsets grouped by nesting depth, or None when
    the source does not parse.

    ``result[0]`` holds the line-start offsets of every module-level
    def/class (decorators included), ``result[1]`` the one-level-nested
    ones (methods), and so on — the split hierarchy a tree-sitter
    chunker derives from the parse tree. Offsets are line starts so a
    split never lands mid-line; offset 0 is never emitted (a boundary
    at the very start splits nothing).
    """
    defs = py_definitions(text, tree)
    if defs is None:
        return None
    starts = _line_starts(text)
    by_depth: dict[int, list[int]] = {}
    for d in defs:
        # back up to the start of the definition's first line
        import bisect

        line_idx = bisect.bisect_right(starts, d["start"]) - 1
        off = starts[line_idx]
        if off > 0:
            by_depth.setdefault(d["depth"], []).append(off)
    if not by_depth:
        return []
    max_d = max(by_depth)
    return [sorted(set(by_depth.get(i, []))) for i in range(max_d + 1)]
