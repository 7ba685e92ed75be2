"""Round-9 advisor-finding regressions.

1. `_path_col` encodes NULL pk components as an EMPTY segment, so
   `_keys_from_paths` can never shift later segments onto earlier pk
   columns (r9 advice: concat_ws silently dropped NULLs, so a NULL in
   a non-final composite-pk column made the no-scan delete mapping
   parse — and sweep — the wrong key).
2. A delete-bearing target with neither `schema` nor `read` fails with
   a clear TypeError instead of `None[i]` deep inside the path parser.
"""

from __future__ import annotations

import pytest

from cocoindex_spark.engine.app import App, _keys_from_paths


@pytest.fixture()
def app(tmp_state):
    return App("advisor9", state_dir=tmp_state)


def test_null_pk_component_keeps_positions(spark, app):
    """name/<NULL>/7 must encode as 'name//7', not 'name/7' — and the
    parse must round-trip (NULL, 7) for safe non-string pk types."""
    df = spark.createDataFrame(
        [(None, 7), (3, 9)], "a int, b int"
    ).withColumn("__tp", App._path_col("t", ["a", "b"]))
    paths = {r["__tp"] for r in df.collect()}
    assert paths == {"t//7", "t/3/9"}

    back = _keys_from_paths(df.select("__tp"), "t", ["a", "b"], ["int", "int"])
    got = {(r["a"], r["b"]) for r in back.collect()}
    assert got == {(None, 7), (3, 9)}


def test_non_null_paths_unchanged(spark):
    """The explicit encoding is byte-identical to the old concat_ws
    form for non-null values (tracking target_path stability)."""
    df = spark.createDataFrame([("x", 1)], "k string, v int").withColumn(
        "__tp", App._path_col("tgt", ["k", "v"])
    )
    assert df.collect()[0]["__tp"] == "tgt/x/1"


def test_schemaless_readless_delete_target_fails_clearly(spark, app):
    """An apply-only sink (no `read`) without a `schema` cannot map
    dead paths to pk values; the sync must say so, not TypeError on
    None subscripting."""

    class ApplyOnly:
        name = "wire"
        pk = ["k"]

        def __init__(self):
            self.upserts = []

        def upsert(self, df):
            self.upserts.append(df.collect())

        def delete(self, df):  # pragma: no cover - unreachable
            raise AssertionError("delete should not be reached")

    tgt = ApplyOnly()
    src1 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    with pytest.raises(TypeError, match="declares no `schema`"):
        app.sync_table(src1, ["k"], lambda d: d, tgt, memo=False)


@pytest.mark.parametrize("flag", ["1", "0"])
def test_merge_apply_ab_flag_converges(spark, tmp_state, monkeypatch, flag):
    """COCO_FUSE_MERGE_APPLY=0 (the A/B lever for the r9 fusion) must
    be semantics-identical to the fused path on a mixed
    upsert+delete sync — only the write shape differs."""
    monkeypatch.setenv("COCO_FUSE_MERGE_APPLY", flag)
    app = App(f"abflag{flag}", state_dir=tmp_state)
    tgt = app.target(
        f"{tmp_state}/t", ["k"], "k STRING, v INT"
    )
    s1 = spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)], "k string, v int")
    app.sync_table(s1, ["k"], lambda d: d, tgt, memo=False)
    # mixed sync: edit a, delete b, add d
    s2 = spark.createDataFrame([("a", 10), ("c", 3), ("d", 4)], "k string, v int")
    st = app.sync_table(s2, ["k"], lambda d: d, tgt, memo=False)
    assert st.updates == 1 and st.deletes == 1 and st.inserts == 1
    got = {(r["k"], r["v"]) for r in tgt.read(spark).collect()}
    assert got == {("a", 10), ("c", 3), ("d", 4)}
