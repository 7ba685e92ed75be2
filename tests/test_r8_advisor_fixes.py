"""Round-8 advisor-finding regressions.

1. SCC joint fingerprints fold AUTO call-graph deps of cycle members
   (r7 advice: explicit-deps-only contributions served stale memo
   results after editing a tracked helper called by a cycle member).
2. Logic-fp resolution is thread-safe: concurrent resolution of
   caller/callee from two threads must not false-detect a cycle
   (r7 advice: the module-global resolve stack could interleave).
"""

from __future__ import annotations

import importlib.util
import itertools
import sys
import threading

import pytest

from cocoindex_spark import App

_SCC_EXT_BODY = """
from cocoindex_spark import fn

@fn()
def helper(n):
    return n + {delta}

@fn()
def ping(n):
    return helper(n) if n == 0 else pong(n - 1)

@fn()
def pong(n):
    return 0 if n == 0 else ping(n - 1)
"""


def _load_module(tmp_path, name: str, body: str, tag: str = ""):
    """Load `body` as module `name` (the fp folds the module name, so
    variants of the same logical module must share it; `tag` only
    distinguishes the backing file)."""
    p = tmp_path / f"{name}_{tag}.py"
    p.write_text(body)
    spec = importlib.util.spec_from_file_location(name, p)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_scc_members_track_external_callees(tmp_path):
    """Editing a tracked helper CALLED BY a mutually-recursive fn must
    change every cycle member's logic_fp — the helper's fp folds into
    ping's cycle contribution via the auto call-graph walk."""
    m1 = _load_module(tmp_path, "sccext", _SCC_EXT_BODY.format(delta=1), "a")
    fp1 = (m1.ping.logic_fp, m1.pong.logic_fp)

    # identical code → identical fps (stability)
    m2 = _load_module(tmp_path, "sccext", _SCC_EXT_BODY.format(delta=1), "b")
    assert (m2.ping.logic_fp, m2.pong.logic_fp) == fp1

    # edit ONLY the helper (not any cycle member's own body)
    m3 = _load_module(tmp_path, "sccext", _SCC_EXT_BODY.format(delta=2), "c")
    assert m3.ping.logic_fp != fp1[0], "helper edit must invalidate ping"
    assert m3.pong.logic_fp != fp1[1], "helper edit must invalidate pong"
    sys.modules.pop("sccext", None)


_CALLER_CALLEE_BODY = """
from cocoindex_spark import fn

@fn()
def callee(n):
    return n * 3

@fn()
def caller(n):
    return callee(n) + 1
"""


def test_concurrent_resolution_no_false_cycle(tmp_path, monkeypatch):
    """Thread A resolves callee while thread B resolves caller (whose
    walk reaches callee). A shared resolve stack would see callee on
    the stack from thread A and mint a bogus joint fingerprint for
    {caller, callee}; the thread-local stack must not."""
    from cocoindex_spark.engine import function as fmod

    # serial ground truth from an identical module
    ref = _load_module(tmp_path, "ccmod", _CALLER_CALLEE_BODY, "ref")
    want = (ref.caller.logic_fp, ref.callee.logic_fp)

    mod = _load_module(tmp_path, "ccmod", _CALLER_CALLEE_BODY, "par")
    barrier = threading.Barrier(2)
    counter = itertools.count()
    real = fmod._auto_dep_fps

    def rendezvous(f, _seen=None, _exclude=None):
        # hold the first two resolutions (one per thread) mid-flight
        # so both stacks are live simultaneously
        if next(counter) < 2:
            try:
                barrier.wait(timeout=10)
            except threading.BrokenBarrierError:
                pass
        return real(f, _seen, _exclude)

    monkeypatch.setattr(fmod, "_auto_dep_fps", rendezvous)
    got: dict[str, str] = {}
    t1 = threading.Thread(target=lambda: got.__setitem__("callee", mod.callee.logic_fp))
    t2 = threading.Thread(target=lambda: got.__setitem__("caller", mod.caller.logic_fp))
    t1.start(); t2.start(); t1.join(timeout=30); t2.join(timeout=30)
    monkeypatch.setattr(fmod, "_auto_dep_fps", real)

    assert mod.caller._scc_peers == set(), "false cycle detected"
    assert mod.callee._scc_peers == set(), "false cycle detected"
    assert (got["caller"], got["callee"]) == want
    sys.modules.pop("ccmod", None)


# ---- 3. legacy bare-value envelope false positive -----------------------


@pytest.fixture()
def app(spark, tmp_state):
    a = App("r8fix", state_dir=tmp_state, spark=spark)
    yield a
    a.drop()


def test_legacy_bare_dict_with_marker_not_unwrapped(app):
    """A PRE-envelope memo row whose bare user value is a dict carrying
    __coco_memo__ == 1 and a 'v' key PLUS other keys must be returned
    intact — only the exact envelope key set unwraps."""
    import json

    from cocoindex_spark import fn

    @fn()
    def produce(name):
        raise AssertionError("must replay from memo, not re-run")

    legacy_value = {"__coco_memo__": 1, "v": "user data", "extra": 42}

    from cocoindex_spark.fingerprint import fp_value_with_states

    logic_fp = produce.logic_fp
    args_fp, _ = fp_value_with_states([["k"], {}])
    row = app.spark.createDataFrame(
        [(logic_fp, args_fp, json.dumps(legacy_value), None, 0)],
        app.state.memo.schema,
    )
    app.state.memo.merge_upsert(row)

    assert app.call_fn(produce, "k") == legacy_value
