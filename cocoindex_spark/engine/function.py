"""@fn decorator: tracked transforms with logic fingerprints
(reference: python/cocoindex/_internal/function.py:2199 `fn`,
logic fp at function.py:613-668; docs function.mdx:125-247).

A decorated transform carries:
- ``logic_fp`` — canonical-AST hash + version + transitive dep
  fingerprints. Editing a dependency's body invalidates every caller
  (function.mdx:48), because dep fingerprints are folded in.
- ``memo`` — whether App.sync_table consults the memo table.

Batching is inherent: transforms are DataFrame→DataFrame, so Spark
already executes them in Arrow batches (the reference's
``batching=True`` machinery, utils/batching.rs:46-172, is subsumed).
"""

from __future__ import annotations

import ast
import inspect
import textwrap
from collections.abc import Callable

from cocoindex_spark.fingerprint import fp_logic

# Library namespaces whose functions are NOT logic dependencies: their
# behavior is pinned by the environment, not the user's code (the
# reference likewise only walks the user's own call graph,
# function.py:613-668).
_SKIP_TOPLEVEL = {
    "pyspark", "builtins", "numpy", "pandas", "py4j", "functools",
    "itertools", "json", "re", "os", "math",
}


def _referenced_names(f: Callable) -> set[str]:
    try:
        tree = ast.parse(textwrap.dedent(inspect.getsource(f)))
    except (OSError, TypeError, SyntaxError):
        return set()
    return {
        n.id
        for n in ast.walk(tree)
        if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
    }


def _auto_dep_fps(f: Callable, _seen: set | None = None) -> tuple[str, ...]:
    """Transitive call-graph fingerprints, discovered from the
    function's own AST: every loaded name that resolves (via closure or
    module globals) to a tracked ``@fn`` OR to a plain function in the
    same top-level package folds its logic fp into the caller's —
    editing a helper's body invalidates every (transitive) caller,
    exactly the reference's dependency semantics (function.mdx:48;
    function.py:613-668). Cycle-guarded; deterministic (names sorted).
    Library functions (pyspark/numpy/stdlib …) are environment, not
    logic, and are skipped."""
    seen = _seen if _seen is not None else set()
    key = (getattr(f, "__module__", None), getattr(f, "__qualname__", None))
    if key in seen:
        return ()
    seen.add(key)
    g = getattr(f, "__globals__", None) or {}
    cl: dict[str, object] = {}
    code = getattr(f, "__code__", None)
    closure = getattr(f, "__closure__", None)
    if code is not None and closure:
        for name, cell in zip(code.co_freevars, closure):
            try:
                cl[name] = cell.cell_contents
            except ValueError:  # empty cell
                pass
    top = (getattr(f, "__module__", "") or "").split(".")[0]
    fps: list[str] = []
    for name in sorted(_referenced_names(f) - {getattr(f, "__name__", "")}):
        obj = cl.get(name, g.get(name))
        if obj is None or obj is f:
            continue
        lf = getattr(obj, "logic_fp", None)
        if isinstance(lf, str):
            fps.append(f"{name}:{lf}")
            continue
        if inspect.isfunction(obj):
            omod = (getattr(obj, "__module__", "") or "").split(".")[0]
            if omod and omod == top and omod not in _SKIP_TOPLEVEL:
                fps.append(
                    f"{name}:{fp_logic(obj, deps=_auto_dep_fps(obj, seen))}"
                )
    return tuple(fps)


def fn(
    memo: bool = True,
    version: int | None = None,
    deps: tuple[Callable, ...] = (),
) -> Callable:
    def deco(f: Callable) -> Callable:
        explicit = tuple(
            getattr(d, "logic_fp", None) or fp_logic(d) for d in deps
        )
        f.logic_fp = fp_logic(
            f, version=version, deps=explicit + _auto_dep_fps(f)
        )
        f.memo = memo
        return f

    return deco
