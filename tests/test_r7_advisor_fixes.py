"""Round-7 advisor-finding regressions:

1. q147 CDC chunking must not crash on single-word documents (Spark's
   sequence(1, 0) is DESCENDING → out-of-range element_at) and must
   emit the same whole-doc chunk the DuckDB oracle does.
2. gc_memo must sweep memo generations stranded by detect_change
   context rotation (previously unreachable: different folded
   logic_fp, filtered out forever).
3. Mutual-recursion logic fps must be independent of which member's fp
   resolves first, and an edit to EITHER member must invalidate both.
4. A memoized value that happens to be a dict containing the literal
   key '__coco_memo__' must round-trip (always-enveloped persistence).
5. A state fn returning a tuple must not force a redundant
   merge_upsert on every hit (JSON-canonical comparison).
"""

from __future__ import annotations

import importlib.util
import sys
import uuid

import pytest
from pyspark.sql import functions as F

from cocoindex_spark import App, ContextKey, MemoStateOutcome, fn, is_non_existence, use_context
from cocoindex_spark.engine.context import _reset_used_keys


@pytest.fixture(autouse=True)
def _fresh_keys():
    _reset_used_keys()
    yield


@pytest.fixture()
def app(spark, tmp_state):
    a = App("r7fix", state_dir=tmp_state, spark=spark)
    yield a
    a.drop()


# ---- 1. q147 single-word documents ------------------------------------


def test_cdc_chunks_single_word_doc(spark, monkeypatch):
    import duckdb
    import pandas as pd

    import cocoindex_spark.queries.textq as tq
    from cocoindex_spark.queries import all_oracles

    pdf = pd.DataFrame(
        {
            "doc_id": ["d1", "d2", "d3", "d4"],
            "text": ["hello", "a b c d e f g h i j", "hello", "  lone  "],
            "source": ["s", "s", "t", "t"],
        }
    )
    df = spark.createDataFrame(pdf)
    monkeypatch.setattr(tq, "table", lambda sp, sf, name: df)
    got = {
        (r.chunk_hash, r.n_occurrences, r.n_docs)
        for r in tq.q147_cdc_chunk_dedup(spark, "ignored").collect()
    }
    con = duckdb.connect()
    con.register("documents", pdf)
    want = {tuple(r) for r in con.execute(all_oracles()["q147_cdc_chunk_dedup"]).fetchall()}
    assert got == want
    # the single-word docs surface as one shared whole-doc chunk
    assert any(n_occ == 2 and n_docs == 2 for _, n_occ, n_docs in got)


# ---- 2. gc_memo sweeps rotated-context generations ---------------------


def _scaler(key: ContextKey):
    @fn(memo=True)
    def scale_rows(df):
        k = use_context(key)
        return df.select(
            "__args_fp",
            "__component_path",
            "id",
            (F.col("x") * F.lit(k)).cast("long").alias("y"),
        )

    return scale_rows


def test_gc_memo_sweeps_rotated_context_generations(app, spark, tmp_state):
    key = ContextKey(f"gcscale-{uuid.uuid4().hex[:8]}", detect_change=True)
    transform = _scaler(key)
    t = app.target(f"{tmp_state}/t", ["id"], "id LONG, y LONG")
    src = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "id LONG, x LONG")

    for v in (2, 3, 4):
        app.provide(key, v)
        app.sync_table(src, ["id"], transform, t)

    # three context generations × 3 rows; the two rotated-away
    # generations (6 rows) are dead keys no current lookup addresses
    assert app.gc_memo(src, transform) == 6
    assert app.gc_memo(src, transform) == 0  # idempotent

    # the current generation survives: warm re-run is still all-hit
    warm = app.sync_table(src, ["id"], transform, t)
    assert warm.memo_misses == 0 and warm.updates == 0


# ---- 3. mutual-recursion fp order independence -------------------------

_SCC_BODY = """
from cocoindex_spark import fn

@fn()
def even(n):
    return True if n == 0 else odd(n - 1)

@fn()
def odd(n):
    return {odd_ret} if n == 0 else even(n - 1)
"""


def _load_scc_module(tmp_path, tag: str, odd_ret: str):
    p = tmp_path / f"sccmod_{tag}.py"
    p.write_text(_SCC_BODY.format(odd_ret=odd_ret))
    spec = importlib.util.spec_from_file_location("sccmod", p)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["sccmod"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_mutual_recursion_fp_order_independent(tmp_path):
    m1 = _load_scc_module(tmp_path, "a", "False")
    even_first = (m1.even.logic_fp, m1.odd.logic_fp)

    m2 = _load_scc_module(tmp_path, "b", "False")
    odd_fp = m2.odd.logic_fp  # resolve the OTHER member first
    odd_first = (m2.even.logic_fp, odd_fp)

    assert even_first == odd_first  # access order is invisible
    assert even_first[0] != even_first[1]  # members still distinct

    # an edit to odd's body invalidates BOTH members' fps
    m3 = _load_scc_module(tmp_path, "c", "None")
    assert m3.even.logic_fp != even_first[0]
    assert m3.odd.logic_fp != even_first[1]
    sys.modules.pop("sccmod", None)


# ---- 4. envelope-marker value round-trip -------------------------------


def test_memo_value_containing_envelope_marker(app):
    calls = []

    @fn()
    def produce(name):
        calls.append(name)
        return {"__coco_memo__": "user data", "x": 7}

    want = {"__coco_memo__": "user data", "x": 7}
    assert app.call_fn(produce, "k") == want
    assert app.call_fn(produce, "k") == want  # replayed, not KeyError
    assert calls == ["k"]


# ---- 5. tuple-returning state fn: no redundant upsert ------------------


class TupleStateFile:
    def __init__(self, path: str, mtime: int):
        self.path = path
        self.mtime = mtime

    def __coco_memo_key__(self):
        return self.path

    def __coco_memo_state__(self, prev):
        if is_non_existence(prev):
            return MemoStateOutcome(state=(self.mtime, "h"))
        return MemoStateOutcome(state=tuple(prev), memo_valid=True)


def test_tuple_state_no_redundant_upsert(app, monkeypatch):
    @fn(memo=True)
    def summarize(file):
        return f"sum:{file.path}"

    assert app.call_fn(summarize, TupleStateFile("/a", 1)) == "sum:/a"

    upserts = []
    real = app.state.memo.merge_upsert
    monkeypatch.setattr(
        app.state.memo, "merge_upsert", lambda df: (upserts.append(1), real(df))[1]
    )
    # unchanged state (tuple vs stored JSON list): a pure hit must not
    # rewrite the memo row
    assert app.call_fn(summarize, TupleStateFile("/a", 1)) == "sum:/a"
    assert upserts == []
