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

from collections.abc import Callable

from cocoindex_spark.fingerprint import fp_logic


def fn(
    memo: bool = True,
    version: int | None = None,
    deps: tuple[Callable, ...] = (),
) -> Callable:
    def deco(f: Callable) -> Callable:
        dep_fps = tuple(
            getattr(d, "logic_fp", None) or fp_logic(d) for d in deps
        )
        f.logic_fp = fp_logic(f, version=version, deps=dep_fps)
        f.memo = memo
        return f

    return deco
