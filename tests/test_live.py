"""Live mode: last-wins coalescing, tombstone deletes, partial-batch
reconcile, file-stream catch-up via foreachBatch (reference:
tests/core/test_live_component.py scenarios)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cocoindex_spark.engine.app import App
from cocoindex_spark.engine.function import fn
from cocoindex_spark.streaming.live import LiveSync, last_wins


@fn(memo=True)
def passthrough(df):
    return df.select(
        "__args_fp", "__component_path", "k", F.upper(F.col("v")).alias("v_up")
    )


@pytest.fixture()
def app(spark, tmp_state):
    a = App("live", state_dir=tmp_state, spark=spark)
    yield a
    a.drop()


def test_last_wins(spark):
    df = spark.createDataFrame(
        [("k1", "old", 1), ("k1", "new", 2), ("k2", "only", 5)],
        "k STRING, v STRING, offset LONG",
    )
    out = {r["k"]: r["v"] for r in last_wins(df, ["k"], ["offset"]).collect()}
    assert out == {"k1": "new", "k2": "only"}


def test_partial_batch_and_tombstones(app, spark, tmp_state):
    target = app.target(f"{tmp_state}/live_out", ["k"], "k STRING, v_up STRING")
    sync = LiveSync(app, ["k"], passthrough, target, order_cols=["offset"], tombstone_col="deleted")

    # batch 1: two upserts (duplicate op for k1 in one batch → last wins)
    b1 = spark.createDataFrame(
        [("k1", "a", 1, False), ("k1", "b", 2, False), ("k2", "c", 3, False)],
        "k STRING, v STRING, offset LONG, deleted BOOLEAN",
    )
    sync.process_batch(b1, 0)
    assert {r["k"]: r["v_up"] for r in target.read(spark).collect()} == {"k1": "B", "k2": "C"}

    # batch 2: touches only k1 — k2 must remain untouched (partial scope)
    b2 = spark.createDataFrame(
        [("k1", "z", 4, False)], "k STRING, v STRING, offset LONG, deleted BOOLEAN"
    )
    sync.process_batch(b2, 1)
    assert {r["k"]: r["v_up"] for r in target.read(spark).collect()} == {"k1": "Z", "k2": "C"}

    # batch 3: tombstone k1 (null-payload delete), upsert after tombstone k3
    b3 = spark.createDataFrame(
        [("k1", None, 5, True), ("k3", "n", 6, False)],
        "k STRING, v STRING, offset LONG, deleted BOOLEAN",
    )
    sync.process_batch(b3, 2)
    assert {r["k"]: r["v_up"] for r in target.read(spark).collect()} == {"k2": "C", "k3": "N"}
    assert sync.batch_stats[2].deletes == 1


def test_file_stream_catch_up(app, spark, tmp_state):
    """readStream over a directory, AvailableNow catch-up, foreachBatch
    sync — live_mode 'write once choose at runtime' parity."""
    src_dir = os.path.join(tmp_state, "stream_src")
    ckpt = os.path.join(tmp_state, "ckpt")
    os.makedirs(src_dir)
    spark.createDataFrame(
        [("k1", "a", 1, False), ("k2", "b", 2, False)],
        "k STRING, v STRING, offset LONG, deleted BOOLEAN",
    ).write.mode("overwrite").parquet(os.path.join(src_dir, "batch1"))

    target = app.target(f"{tmp_state}/stream_out", ["k"], "k STRING, v_up STRING")
    sync = LiveSync(app, ["k"], passthrough, target, order_cols=["offset"], tombstone_col="deleted")

    stream = (
        spark.readStream.schema("k STRING, v STRING, offset LONG, deleted BOOLEAN")
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    q = sync.start(stream, ckpt, available_now=True)
    q.awaitTermination(120)
    assert {r["k"]: r["v_up"] for r in target.read(spark).collect()} == {"k1": "A", "k2": "B"}

    # second catch-up run with a new file: only the delta processed
    spark.createDataFrame(
        [("k2", "b2", 3, False)], "k STRING, v STRING, offset LONG, deleted BOOLEAN"
    ).write.mode("overwrite").parquet(os.path.join(src_dir, "batch2"))
    q2 = sync.start(stream, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert {r["k"]: r["v_up"] for r in target.read(spark).collect()} == {"k1": "A", "k2": "B2"}


def test_auto_refresh_rounds_and_delete_propagation(app, spark, tmp_state):
    """auto_refresh: each round is a full snapshot reconcile — an item
    removed from the source between rounds is deleted from the target
    with no change feed (live_mode.mdx:68-95)."""
    from cocoindex_spark.streaming.live import auto_refresh

    t = app.target(f"{tmp_state}/ar", ["k"], "k STRING, n INT")
    state = {"rows": [("a", "x"), ("b", "yy")]}

    @fn(memo=True)
    def measure(df):
        return df.select(
            "__args_fp", "__component_path", "k", F.length("v").alias("n")
        )

    def build():
        out = spark.createDataFrame(state["rows"], "k STRING, v STRING")
        state["rows"] = [("a", "x")]  # next round: b disappears
        return out

    stats = auto_refresh(
        app, build, ["k"], measure, t, interval_sec=0.0, max_rounds=2
    )
    assert [s.inserts for s in stats] == [2, 0]
    assert stats[1].deletes == 1  # b swept by the snapshot reconcile
    assert {r.k for r in t.read(spark).collect()} == {"a"}
