"""Per-function memo_key= overrides, logic_tracking modes, value deps,
and the lazy logic-fp resolution that makes forward-referenced /
attribute-accessed helpers participate in change detection (reference:
docs memoization_keys.mdx "Override at the call site", function.mdx
`logic_tracking` / `deps`; r5 advisor finding on decoration-time
snapshots)."""

from __future__ import annotations

import importlib.util
import sys
import textwrap

import pytest

from cocoindex_spark import App, fn


@pytest.fixture()
def app(spark, tmp_state):
    a = App("mk", state_dir=tmp_state, spark=spark)
    yield a
    a.drop()


# ---- memo_key= validation (decoration time) ----------------------------


def test_memo_key_unknown_param_raises():
    with pytest.raises(ValueError, match="not a parameter"):

        @fn(memo_key={"nope": None})
        def f(x):
            return x


def test_memo_key_bad_override_type_raises():
    with pytest.raises(TypeError, match="callable or None"):

        @fn(memo_key={"x": 42})
        def f(x):
            return x


# ---- memo_key= behavior (call_fn) ---------------------------------------


def test_memo_key_none_excludes_parameter(app):
    calls = []

    @fn(memo=True, memo_key={"debug": None})
    def compute(x, debug):
        calls.append((x, debug))
        return x * 2

    assert app.call_fn(compute, 3, debug=True) == 6
    assert app.call_fn(compute, 3, debug=False) == 6  # debug ignored
    assert calls == [(3, True)]
    assert app.call_fn(compute, 4, debug=True) == 8  # x still keys
    assert len(calls) == 2


def test_memo_key_callable_transforms_fingerprint(app):
    calls = []

    @fn(memo=True, memo_key={"entry": lambda e: (e["name"], e["version"])})
    def render(entry):
        calls.append(entry["name"])
        return f"{entry['name']}@{entry['version']}"

    assert app.call_fn(render, {"name": "a", "version": 1, "noise": "x"}) == "a@1"
    # only (name, version) fingerprint: noise changes still hit
    assert app.call_fn(render, {"name": "a", "version": 1, "noise": "y"}) == "a@1"
    assert calls == ["a"]
    # a keyed field change misses
    assert app.call_fn(render, {"name": "a", "version": 2, "noise": "y"}) == "a@2"
    assert calls == ["a", "a"]


def test_memo_key_varargs(app):
    calls = []

    @fn(memo=True, memo_key={"rest": None})
    def head(x, *rest):
        calls.append(x)
        return x

    assert app.call_fn(head, 1, 2, 3) == 1
    assert app.call_fn(head, 1, 9, 9, 9) == 1  # variadic tail excluded
    assert calls == [1]


# ---- logic_tracking / deps ----------------------------------------------


def _load_module(path, name: str, src: str):
    path.mkdir(parents=True, exist_ok=True)
    p = path / f"{name}.py"
    p.write_text(textwrap.dedent(src))
    spec = importlib.util.spec_from_file_location(name, p)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


_CALLER_SRC = """
    from cocoindex_spark import fn

    @fn({decorator_args})
    def caller(df):
        return helper(df)

    def helper(df):
        return {helper_body}
"""


def test_forward_referenced_helper_participates(tmp_path):
    """The helper is defined BELOW the decorated caller; because the
    logic fp resolves lazily (first use, after the module executed),
    editing the helper's body still changes the caller's fp — the r5
    advisor's stale-memo scenario is closed."""
    m1 = _load_module(
        tmp_path, "fwd_v1", _CALLER_SRC.format(decorator_args="", helper_body="df")
    )
    m2 = _load_module(
        tmp_path,
        "fwd_v2",
        _CALLER_SRC.format(decorator_args="", helper_body="df.distinct()"),
    )
    assert m1.caller.logic_fp != m2.caller.logic_fp


def test_attribute_access_helper_participates(tmp_path):
    """module.helper call targets fold in via the one-level dotted walk
    (same-top-level-package rule: user code, not libraries)."""
    helpers_src = """
        def scale(df):
            return {body}
    """
    caller_src = """
        from mkpkg import mkh
        from cocoindex_spark import fn

        @fn()
        def caller(df):
            return mkh.scale(df)
    """
    (tmp_path / "mkpkg").mkdir()
    (tmp_path / "mkpkg" / "__init__.py").write_text("")
    sys.path.insert(0, str(tmp_path))
    try:
        _load_module(tmp_path / "mkpkg", "mkpkg.mkh", helpers_src.format(body="df"))
        c1 = _load_module(tmp_path / "mkpkg", "mkpkg.caller_v1", caller_src)
        fp1 = c1.caller.logic_fp
        _load_module(
            tmp_path / "mkpkg", "mkpkg.mkh", helpers_src.format(body="df.distinct()")
        )
        c2 = _load_module(tmp_path / "mkpkg", "mkpkg.caller_v2", caller_src)
        assert fp1 != c2.caller.logic_fp
    finally:
        sys.path.remove(str(tmp_path))
        for m in ("mkpkg", "mkpkg.mkh", "mkpkg.caller_v1", "mkpkg.caller_v2"):
            sys.modules.pop(m, None)


def test_logic_tracking_self_ignores_helpers(tmp_path):
    m1 = _load_module(
        tmp_path,
        "self_v1",
        _CALLER_SRC.format(
            decorator_args="logic_tracking='self'", helper_body="df"
        ),
    )
    m2 = _load_module(
        tmp_path,
        "self_v2",
        _CALLER_SRC.format(
            decorator_args="logic_tracking='self'", helper_body="df.distinct()"
        ),
    )
    assert m1.caller.logic_fp == m2.caller.logic_fp


def test_logic_tracking_none_is_stable_across_edits(tmp_path):
    src = """
        from cocoindex_spark import fn

        @fn(logic_tracking=None)
        def embed(text):
            return {body}
    """
    m1 = _load_module(tmp_path / "x", "untracked_m", src.format(body="[1.0]"))
    fp1 = m1.embed.logic_fp
    m2 = _load_module(tmp_path / "y", "untracked_m", src.format(body="[2.0, 3.0]"))
    assert fp1 == m2.embed.logic_fp  # edits invisible by declaration


def test_deps_value_snapshot():
    def build(prompt):
        @fn(deps=prompt)
        def summarize(text):
            return text

        return summarize

    assert build("prompt A").logic_fp != build("prompt B").logic_fp
    assert build("prompt A").logic_fp == build("prompt A").logic_fp
    # dict-shaped deps (function.mdx multiple dependencies)
    def build2(model):
        @fn(deps={"prompt": "p", "model": model})
        def g(text):
            return text

        return g

    assert build2("m1").logic_fp != build2("m2").logic_fp


def test_deps_with_tracking_disabled_raises():
    with pytest.raises(ValueError, match="requires logic_tracking"):

        @fn(logic_tracking=None, deps="prompt")
        def f(x):
            return x


def test_invalid_logic_tracking_raises():
    with pytest.raises(ValueError, match="logic_tracking"):

        @fn(logic_tracking="everything")
        def f(x):
            return x
