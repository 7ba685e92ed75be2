"""Composition scenarios: a two-stage incremental pipeline (chunk →
enrich) where stage 2's source is stage 1's target — the reference's
component-tree shape (mount_each nesting, SURVEY §2.4) — plus engine
child-existence maintenance and the pair-resolver operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cocoindex_spark.engine.app import App
from cocoindex_spark.engine.function import fn
from cocoindex_spark.operators.entity_resolution import resolve_pairs_with


@fn(memo=True)
def chunk(df):
    """Stage 1: doc → word chunks (one→many)."""
    return df.select(
        "__args_fp",
        "__component_path",
        "path",
        F.posexplode(F.split(F.col("text"), " ")).alias("idx", "word"),
    )


@fn(memo=True)
def enrich(df):
    """Stage 2: chunk → enriched chunk."""
    return df.select(
        "__args_fp",
        "__component_path",
        "path",
        "idx",
        F.upper("word").alias("word_up"),
    )


@pytest.fixture()
def app(spark, tmp_state):
    a = App("pipe", state_dir=tmp_state, spark=spark)
    yield a
    a.drop()


def test_two_stage_incremental_pipeline(app, spark, tmp_state):
    chunks_t = app.target(
        f"{tmp_state}/chunks", ["path", "idx"], "path STRING, idx INT, word STRING"
    )
    enriched_t = app.target(
        f"{tmp_state}/enriched", ["path", "idx"], "path STRING, idx INT, word_up STRING"
    )

    def run_both(src):
        s1 = app.sync_table(src, ["path"], chunk, chunks_t)
        s2 = app.sync_table(
            chunks_t.read(spark), ["path", "idx"], enrich, enriched_t
        )
        return s1, s2

    src1 = spark.createDataFrame(
        [("a.md", "x y z"), ("b.md", "p q")], "path STRING, text STRING"
    )
    s1, s2 = run_both(src1)
    assert s1.inserts == 5 and s2.inserts == 5

    # warm: both stages all-hit, all-noop
    s1w, s2w = run_both(src1)
    assert s1w.memo_misses == 0 and s1w.noops == 5
    assert s2w.memo_misses == 0 and s2w.noops == 5

    # edit b.md: stage 1 recomputes ONE doc; stage 2 recomputes only
    # b.md's changed chunks (blast radius bounded end-to-end)
    src2 = spark.createDataFrame(
        [("a.md", "x y z"), ("b.md", "p R")], "path STRING, text STRING"
    )
    s1e, s2e = run_both(src2)
    assert s1e.memo_misses == 1  # one doc recomputed
    assert s1e.updates == 1 and s1e.noops == 4  # only chunk (b,1) changed
    assert s2e.memo_misses == 1  # only the changed chunk re-enriched
    assert s2e.updates == 1 and s2e.noops == 4
    got = {
        (r.path, r.idx): r.word_up for r in enriched_t.read(spark).collect()
    }
    assert got[("b.md", 1)] == "R" and got[("a.md", 0)] == "X"

    # delete b.md: cascade flows through both stages
    src3 = spark.createDataFrame([("a.md", "x y z")], "path STRING, text STRING")
    s1d, s2d = run_both(src3)
    assert s1d.deletes == 2 and s2d.deletes == 2
    assert enriched_t.read(spark).count() == 3


def test_child_existence_tracks_components(app, spark, tmp_state):
    t = app.target(f"{tmp_state}/ce", ["path"], "path STRING, n INT")

    @fn(memo=True)
    def count_len(df):
        return df.select(
            "__args_fp", "__component_path", "path", F.length("text").alias("n")
        )

    src = spark.createDataFrame([("a", "x"), ("b", "yy")], "path STRING, text STRING")
    app.sync_table(src, ["path"], count_len, t)
    kids = {r.child_key for r in app.children(t).collect()}
    assert kids == {"pipe/ce/a", "pipe/ce/b"}

    # shrink: removed key leaves the child set
    src2 = spark.createDataFrame([("a", "x")], "path STRING, text STRING")
    app.sync_table(src2, ["path"], count_len, t)
    assert {r.child_key for r in app.children(t).collect()} == {"pipe/ce/a"}


def test_pair_resolver_retry_budget(spark):
    pairs = spark.createDataFrame(
        [("a", "b", 0.9), ("c", "d", 0.8), ("e", "f", 0.7)],
        "a_id STRING, b_id STRING, sim DOUBLE",
    )

    def flaky_decide(a, b, attempt):
        if a == "a":
            return True  # clean yes
        if a == "c":  # fails attempt 1, succeeds attempt 2 (re-prompt)
            if attempt == 1:
                raise RuntimeError("malformed response")
            return True
        return "not-a-bool" if attempt == 1 else None  # never validates

    out = {r.a_id: (r.same_entity, r.attempts) for r in resolve_pairs_with(
        pairs, flaky_decide, retry_budget=2
    ).collect()}
    assert out["a"] == (True, 1)
    assert out["c"] == (True, 2)  # retried once
    assert out["e"] == (False, 2)  # budget exhausted ⇒ conservative no
