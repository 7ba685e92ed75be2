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


class NonExistenceType:
    """Singleton marker handed to a state method on its FIRST run — no
    previous state exists yet (the reference's ``coco.NON_EXISTENCE``,
    typing.py). Use :func:`is_non_existence` to detect it."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return "NON_EXISTENCE"


NON_EXISTENCE = NonExistenceType()


def is_non_existence(v: Any) -> bool:
    return isinstance(v, NonExistenceType)


class MemoStateOutcome:
    """Return value of a memo state method (docs memoization_keys.mdx
    "Memo state validation"): ``state`` is persisted for the next run;
    ``memo_valid`` (default False) says whether the cached result may
    be reused. The three shapes: new state + invalid (recompute),
    same state + valid (reuse, nothing to write), NEW state + valid
    (e.g. mtime changed but content hash didn't — reuse the cache AND
    persist the refreshed state)."""

    __slots__ = ("state", "memo_valid")

    def __init__(self, state: Any, memo_valid: bool = False):
        self.state = state
        self.memo_valid = memo_valid


_MEMO_KEY_FNS: dict[type, Any] = {}
_MEMO_STATE_FNS: dict[type, Any] = {}


def register_memo_key(tp: type, key_fn: Any = None, *, state_fn: Any = None):
    """Register a key-derivation function for ``tp`` (the reference's
    registered-key-fn path, memo_fingerprint.py:268-404). The decorated
    function receives the instance and returns any fingerprintable
    value; exact-type match only (no MRO walk — same as the reference's
    registry lookup). Usable as a decorator (``@register_memo_key(T)``)
    or a direct call (``register_memo_key(T, key_fn, state_fn=...)`` —
    the reference's ``register_memo_key_function`` spelling). The
    optional ``state_fn(obj, prev_state) -> MemoStateOutcome`` attaches
    memo STATE validation for instances of ``tp`` (docs
    memoization_keys.mdx "Register a state function")."""

    def deco(fn):
        _MEMO_KEY_FNS[tp] = fn
        if state_fn is not None:
            _MEMO_STATE_FNS[tp] = state_fn
        return fn

    if key_fn is not None:
        return deco(key_fn)
    return deco


def _canonical(value: Any, states: list | None = None) -> bytes:
    """Canonical byte encoding of a Python value tree (sorted mappings,
    type-tagged scalars) — the memo-key canonicalization analog of
    memo_fingerprint.py:177-232. Precedence for non-primitive values
    (memo_fingerprint.py:268-404): poison > registered key fn >
    ``__coco_memo_key__`` override > dataclass > pydantic model >
    containers. Class-keyed encodings are tagged with the qualified
    class name so two classes with equal field dicts never collide.

    When ``states`` is given, every value carrying a memo STATE method
    (``__coco_memo_state__`` or a registered ``state_fn``) appends a
    bound ``prev -> MemoStateOutcome`` callable in traversal order —
    the reference collects state entries the same way during
    canonicalization (memo_fingerprint.py StateFnEntry)."""
    if isinstance(value, NotMemoKeyable):
        raise TypeError(
            f"not memo-keyable (NotMemoKeyable): {type(value).__qualname__}"
        )
    if states is not None:
        sfn = _MEMO_STATE_FNS.get(type(value))
        if sfn is not None:
            states.append(lambda prev, _o=value, _f=sfn: _f(_o, prev))
        elif getattr(type(value), "__coco_memo_state__", None) is not None:
            states.append(value.__coco_memo_state__)
    keyfn = _MEMO_KEY_FNS.get(type(value))
    if keyfn is not None:
        return b"k" + type(value).__qualname__.encode() + b"\x02" + _canonical(
            keyfn(value), states
        )
    override = getattr(type(value), "__coco_memo_key__", None)
    if override is not None:
        return b"k" + type(value).__qualname__.encode() + b"\x02" + _canonical(
            value.__coco_memo_key__(), states
        )
    import dataclasses

    if dataclasses.is_dataclass(value) and not isinstance(value, type):
        fields = {f.name: getattr(value, f.name) for f in dataclasses.fields(value)}
        return (
            b"d" + type(value).__qualname__.encode() + b"\x02" + _canonical(fields, states)
        )
    dump = getattr(value, "model_dump", None)
    if dump is not None and callable(dump) and hasattr(type(value), "model_fields"):
        # pydantic v2 duck-type (the library is optional here)
        return b"p" + type(value).__qualname__.encode() + b"\x02" + _canonical(dump(), states)
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
        return b"l" + b"\x00".join(_canonical(v, states) for v in value) + b"\x01"
    if isinstance(value, dict):
        items = sorted((str(k), v) for k, v in value.items())
        return (
            b"m"
            + b"\x00".join(_canonical(k, states) + b"\x02" + _canonical(v, states) for k, v in items)
            + b"\x01"
        )
    if isinstance(value, (set, frozenset)):
        return b"e" + b"\x00".join(sorted(_canonical(v, states) for v in value)) + b"\x01"
    raise TypeError(f"not fingerprintable: {type(value)!r}")


def fp_value(value: Any) -> str:
    return fp_bytes(_canonical(value))


def fp_value_with_states(value: Any):
    """(fingerprint, [state callables]) — the key plus the ordered
    state entries collected during canonicalization; the callables
    take the stored previous state (or NON_EXISTENCE) and return a
    :class:`MemoStateOutcome`, possibly awaitable (async state
    methods, memoization_keys.mdx)."""
    states: list = []
    fp = fp_bytes(_canonical(value, states))
    return fp, states


def resolve_outcomes(outcomes: list) -> list:
    """Resolve any awaitable MemoStateOutcomes (the reference's
    resolve_awaitables_sync, context_keys.py:28-70): gathered via
    asyncio.run from a sync context; raises inside a running loop."""
    import inspect as _inspect

    idx = [i for i, o in enumerate(outcomes) if _inspect.isawaitable(o)]
    if not idx:
        return outcomes
    import asyncio

    try:
        asyncio.get_running_loop()
    except RuntimeError:
        pass
    else:
        raise RuntimeError(
            "Async memo state method called from a running event loop; "
            "resolve the state outside the loop"
        )

    async def _gather():
        return list(await asyncio.gather(*(outcomes[i] for i in idx)))

    resolved = asyncio.run(_gather())
    out = list(outcomes)
    for i, v in zip(idx, resolved):
        out[i] = v
    return out


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
