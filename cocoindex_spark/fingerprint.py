"""Canonical fingerprints for memoization and change detection.

Reference: 16-byte Blake2b over a canonical serde stream
(rust/utils/src/fingerprint.rs:38-52); logic fingerprints from a
canonicalized (docstring-stripped) function AST + version + deps
(python/cocoindex/_internal/function.py:613-668).

Two surfaces:
- Driver-side Python fingerprints (``fp_bytes``/``fp_value``/
  ``fp_logic``) for pipeline/function identity — tiny, computed once.
- Column-level fingerprints (``fp_col``) built from Spark's ``sha2``
  over canonical string/JSON encodings — computed distributed,
  JVM-side, for per-row change detection at any scale.
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import textwrap
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

FP_LEN = 16  # bytes, like the reference's Fingerprint


def fp_bytes(data: bytes) -> str:
    """16-byte blake2b digest, hex-encoded."""
    return hashlib.blake2b(data, digest_size=FP_LEN).hexdigest()


class NotMemoKeyable:
    """Poison marker (memo_fingerprint.py's NotMemoKeyable analog):
    instances — and instances of subclasses — refuse fingerprinting
    even when they would otherwise be structurally encodable, so a
    type that must never silently become a memo key (an open handle, a
    live client) fails loudly at key-derivation time."""


_MEMO_KEY_FNS: dict[type, Any] = {}


def register_memo_key(tp: type):
    """Register a key-derivation function for ``tp`` (the reference's
    registered-key-fn path, memo_fingerprint.py:268-404). The decorated
    function receives the instance and returns any fingerprintable
    value; exact-type match only (no MRO walk — same as the reference's
    registry lookup)."""

    def deco(fn):
        _MEMO_KEY_FNS[tp] = fn
        return fn

    return deco


def _canonical(value: Any) -> bytes:
    """Canonical byte encoding of a Python value tree (sorted mappings,
    type-tagged scalars) — the memo-key canonicalization analog of
    memo_fingerprint.py:177-232. Precedence for non-primitive values
    (memo_fingerprint.py:268-404): poison > registered key fn >
    ``__coco_memo_key__`` override > dataclass > pydantic model >
    containers. Class-keyed encodings are tagged with the qualified
    class name so two classes with equal field dicts never collide."""
    if isinstance(value, NotMemoKeyable):
        raise TypeError(
            f"not memo-keyable (NotMemoKeyable): {type(value).__qualname__}"
        )
    keyfn = _MEMO_KEY_FNS.get(type(value))
    if keyfn is not None:
        return b"k" + type(value).__qualname__.encode() + b"\x02" + _canonical(
            keyfn(value)
        )
    override = getattr(type(value), "__coco_memo_key__", None)
    if override is not None:
        return b"k" + type(value).__qualname__.encode() + b"\x02" + _canonical(
            value.__coco_memo_key__()
        )
    import dataclasses

    if dataclasses.is_dataclass(value) and not isinstance(value, type):
        fields = {f.name: getattr(value, f.name) for f in dataclasses.fields(value)}
        return (
            b"d" + type(value).__qualname__.encode() + b"\x02" + _canonical(fields)
        )
    dump = getattr(value, "model_dump", None)
    if dump is not None and callable(dump) and hasattr(type(value), "model_fields"):
        # pydantic v2 duck-type (the library is optional here)
        return b"p" + type(value).__qualname__.encode() + b"\x02" + _canonical(dump())
    if value is None:
        return b"n"
    if isinstance(value, bool):
        return b"b1" if value else b"b0"
    if isinstance(value, int):
        return b"i" + str(value).encode()
    if isinstance(value, float):
        return b"f" + repr(value).encode()
    if isinstance(value, str):
        return b"s" + value.encode("utf-8")
    if isinstance(value, bytes):
        return b"y" + value
    if isinstance(value, (list, tuple)):
        return b"l" + b"\x00".join(_canonical(v) for v in value) + b"\x01"
    if isinstance(value, dict):
        items = sorted((str(k), v) for k, v in value.items())
        return (
            b"m"
            + b"\x00".join(_canonical(k) + b"\x02" + _canonical(v) for k, v in items)
            + b"\x01"
        )
    if isinstance(value, (set, frozenset)):
        return b"e" + b"\x00".join(sorted(_canonical(v) for v in value)) + b"\x01"
    raise TypeError(f"not fingerprintable: {type(value)!r}")


def fp_value(value: Any) -> str:
    return fp_bytes(_canonical(value))


class _DocstringStripper(ast.NodeTransformer):
    def _strip(self, node):
        if (
            node.body
            and isinstance(node.body[0], ast.Expr)
            and isinstance(node.body[0].value, ast.Constant)
            and isinstance(node.body[0].value.value, str)
        ):
            node.body = node.body[1:] or [ast.Pass()]
        return node

    def visit_FunctionDef(self, node):
        self.generic_visit(node)
        return self._strip(node)

    def visit_AsyncFunctionDef(self, node):
        self.generic_visit(node)
        return self._strip(node)

    def visit_ClassDef(self, node):
        self.generic_visit(node)
        return self._strip(node)


def fp_logic(fn, version: int | None = None, deps: tuple[str, ...] = ()) -> str:
    """Logic fingerprint: canonical AST (docstrings stripped) + version
    + dependency fingerprints. Editing the function body changes the
    fingerprint; editing only docstrings/comments does not
    (function.py:624-668 semantics)."""
    try:
        src = textwrap.dedent(inspect.getsource(fn))
        tree = ast.parse(src)
        tree = _DocstringStripper().visit(tree)
        canon = ast.dump(tree, annotate_fields=False)
    except (OSError, TypeError, SyntaxError):
        canon = repr(fn)  # builtins / lambdas without source
    payload = _canonical({"ast": canon, "version": version, "deps": list(deps)})
    return fp_bytes(payload)


def fp_col(*cols: Column) -> Column:
    """Distributed row fingerprint: sha2-256 (truncated to 32 hex chars)
    over an unambiguous per-column JSON encoding.

    Each column is wrapped in a single-field struct and serialized with
    ``to_json`` — JSON string escaping makes the value self-delimiting
    (control chars like the old ``\\x1f`` joiner become ``\\u001F``, so a
    value can never shift bytes across field boundaries) and complex
    types serialize structurally (``["a, b"]`` vs ``["a","b"]`` stay
    distinct, unlike their string casts). NULL encodes as ``{}`` —
    distinct from any non-null value including the string 'null'. This
    is the length-prefix-free analog of the reference's canonical serde
    (rust/utils/src/fingerprint.rs:38-52). All JVM-side: to_json +
    sha2 stay inside whole-stage codegen / vectorized expression eval.

    Changing this encoding is an upgrade event: every persisted
    args_fp / tracking fp / source_fp computed under the old encoding
    mismatches, so the first sync after an upgrade re-transforms the
    full corpus and write-throughs every target row (convergent — the
    reconcile semantics make it a one-time full reprocess, not
    corruption). Treat edits here like a state-format bump.
    """
    encoded = [F.to_json(F.struct(c.alias("v"))) for c in cols]
    return F.substring(F.sha2(F.concat_ws("\x1f", *encoded), 256), 1, FP_LEN * 2)
