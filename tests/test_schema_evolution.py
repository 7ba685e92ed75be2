"""Target schema evolution scenarios (docs target_state.mdx:140-144:
add column ⇒ lossy backfill with may_be_missing forcing; pk change ⇒
destructive drop/recreate + child invalidation; reference tests:
connector suites' schema-evolution assertions, SURVEY §5.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cocoindex_spark.engine.app import App
from cocoindex_spark.engine.function import fn


@fn(memo=True)
def v1(df):
    return df.select(
        "__args_fp", "__component_path", "path", F.length("text").alias("n")
    )


@fn(memo=True, version=2)
def v2_extra_col(df):
    return df.select(
        "__args_fp",
        "__component_path",
        "path",
        F.length("text").alias("n"),
        F.upper("text").alias("up"),
    )


@pytest.fixture()
def app(spark, tmp_state):
    a = App("evo", state_dir=tmp_state, spark=spark)
    yield a
    a.drop()


def _src(spark):
    return spark.createDataFrame(
        [("a.md", "hello"), ("b.md", "world")], "path STRING, text STRING"
    )


def test_add_column_is_lossy_backfill(app, spark, tmp_state):
    t1 = app.target(f"{tmp_state}/evo_t", ["path"], "path STRING, n INT")
    s1 = app.sync_table(_src(spark), ["path"], v1, t1)
    assert s1.extra["schema_evolution"] == "initial" and s1.inserts == 2

    # same pk, wider schema ⇒ lossy: rows kept, everything write-through
    t2 = app.target(f"{tmp_state}/evo_t", ["path"], "path STRING, n INT, up STRING")
    s2 = app.sync_table(_src(spark), ["path"], v2_extra_col, t2)
    assert s2.extra["schema_evolution"] == "lossy"
    assert s2.updates == 2 and s2.inserts == 0 and s2.deletes == 0
    rows = {r.path: (r.n, r.up) for r in t2.read(spark).collect()}
    assert rows == {"a.md": (5, "HELLO"), "b.md": (5, "WORLD")}

    # steady state afterwards: contract matches, warm noop
    s3 = app.sync_table(_src(spark), ["path"], v2_extra_col, t2)
    assert s3.extra["schema_evolution"] == "none" and s3.noops == 2


def test_pk_change_is_destructive(app, spark, tmp_state):
    t1 = app.target(f"{tmp_state}/evo_pk", ["path"], "path STRING, n INT")
    app.sync_table(_src(spark), ["path"], v1, t1)
    assert t1.read(spark).count() == 2

    @fn(memo=True, version=3)
    def v3(df):
        return df.select(
            "__args_fp", "__component_path", "path",
            F.lit(0).alias("idx"), F.length("text").alias("n"),
        )

    # pk [path] → [path, idx] ⇒ destructive: old rows dropped, tracking
    # reset, then everything re-inserted fresh
    t2 = app.target(f"{tmp_state}/evo_pk", ["path", "idx"], "path STRING, idx INT, n INT")
    s = app.sync_table(_src(spark), ["path"], v3, t2)
    assert s.extra["schema_evolution"] == "destructive"
    assert s.inserts == 2 and s.deletes == 0
    assert t2.read(spark).count() == 2


def test_lossy_forces_writethrough_even_on_same_fp(app, spark, tmp_state):
    """Column removed then re-added: fingerprints match the tracked
    ones, but may_be_missing=True must force the write anyway."""
    t1 = app.target(f"{tmp_state}/evo_m", ["path"], "path STRING, n INT")
    app.sync_table(_src(spark), ["path"], v1, t1)

    # shrink schema (lossy #1) — drop the n column
    t_small = app.target(f"{tmp_state}/evo_m", ["path"], "path STRING")

    @fn(memo=True, version=4)
    def v_small(df):
        return df.select("__args_fp", "__component_path", "path")

    s_small = app.sync_table(_src(spark), ["path"], v_small, t_small)
    assert s_small.extra["schema_evolution"] == "lossy"

    # grow back to the original schema (lossy #2): same fp as the very
    # first sync per-row, but may_be_missing forces updates, not noops
    t_back = app.target(f"{tmp_state}/evo_m", ["path"], "path STRING, n INT")
    s_back = app.sync_table(_src(spark), ["path"], v1, t_back)
    assert s_back.extra["schema_evolution"] == "lossy"
    assert s_back.updates == 2 and s_back.noops == 0
    rows = {r.path: r.n for r in t_back.read(spark).collect()}
    assert rows == {"a.md": 5, "b.md": 5}
