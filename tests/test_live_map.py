"""LiveMap scenario tests (reference resources/live_map.py:218-313):
an in-memory keyed map that is an engine target (entries exist while a
component declares them) and a live view (snapshot-then-changes watch
with the `==` gate, single-watch rule, and the arm-before-snapshot seq
gate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cocoindex_spark.engine.app import App
from cocoindex_spark.engine.function import fn
from cocoindex_spark.streaming.live_map import LiveMap, LiveMapSubscriber


@fn(memo=True)
def enrich(df):
    return df.select(
        "__args_fp",
        "__component_path",
        F.col("path"),
        F.upper(F.col("text")).alias("text_upper"),
    )


def _source(spark, rows):
    return spark.createDataFrame(rows, "path STRING, text STRING")


@pytest.fixture()
def app(spark, tmp_state):
    a = App("lm", state_dir=tmp_state, spark=spark)
    yield a
    a.drop()


def _map(spark):
    from pyspark.sql.types import StringType, StructField, StructType

    return LiveMap(
        "live_docs",
        ["path"],
        StructType(
            [
                StructField("path", StringType(), False),
                StructField("text_upper", StringType(), True),
            ]
        ),
    )


class Recorder(LiveMapSubscriber):
    def __init__(self):
        self.events: list[tuple] = []
        self.ready = False

    def mark_ready(self):
        self.ready = True

    def update(self, key, value):
        self.events.append(("update", key, value))

    def delete(self, key):
        self.events.append(("delete", key))


def test_sync_into_map_and_watch(app, spark):
    lm = _map(spark)
    src = _source(spark, [("a.md", "hello"), ("b.md", "world")])
    s1 = app.sync_table(src, ["path"], enrich, lm)
    assert s1.inserts == 2
    assert dict(lm.items()) == {"a.md": ("HELLO",), "b.md": ("WORLD",)}

    rec = Recorder()
    watch = lm.watch(rec)
    assert rec.ready
    # initial snapshot delivered through update_all
    assert sorted(rec.events) == [
        ("update", "a.md", ("HELLO",)),
        ("update", "b.md", ("WORLD",)),
    ]
    rec.events.clear()

    # warm sync: engine reconciles to noops — nothing reaches the map
    s2 = app.sync_table(src, ["path"], enrich, lm)
    assert s2.noops == 2 and watch.pump() == 0 and rec.events == []

    # one edit → exactly one change delivered
    src2 = _source(spark, [("a.md", "hello!"), ("b.md", "world")])
    s3 = app.sync_table(src2, ["path"], enrich, lm)
    assert s3.updates == 1
    assert watch.pump() == 1
    assert rec.events == [("update", "a.md", ("HELLO!",))]
    rec.events.clear()

    # key disappears from the source → ownership delete flows through
    src3 = _source(spark, [("b.md", "world")])
    s4 = app.sync_table(src3, ["path"], enrich, lm)
    assert s4.deletes == 1
    assert watch.pump() == 1
    assert rec.events == [("delete", "a.md")]
    watch.close()


def test_equal_value_gate(spark):
    lm = _map(spark)
    df = spark.createDataFrame([("a", "X")], "path STRING, text_upper STRING")
    lm.upsert(df)
    rec = Recorder()
    watch = lm.watch(rec)
    rec.events.clear()
    lm.upsert(df)  # equal value: the `==` gate suppresses notification
    assert watch.pump() == 0 and lm._seq == 1
    lm.upsert(spark.createDataFrame([("a", "Y")], "path STRING, text_upper STRING"))
    assert watch.pump() == 1
    assert rec.events == [("update", "a", ("Y",))]
    watch.close()


def test_single_watch(spark):
    lm = _map(spark)
    w = lm.watch(Recorder())
    with pytest.raises(RuntimeError, match="single active watch"):
        lm.watch(Recorder())
    w.close()
    lm.watch(Recorder()).close()  # slot released


def test_seq_gate_change_between_arm_and_snapshot(spark):
    """A change landing between queue arming and the initial snapshot is
    both queued and snapshotted; the seq gate must drop the queued copy
    instead of re-notifying (live_map.py:288-305)."""
    lm = _map(spark)
    lm.upsert(spark.createDataFrame([("a", "X")], "path STRING, text_upper STRING"))

    class RacySub(Recorder):
        def update_all(self, live_map):
            # mutate AFTER the queue armed but BEFORE the snapshot scan
            live_map.upsert(
                spark.createDataFrame([("b", "Y")], "path STRING, text_upper STRING")
            )
            super().update_all(live_map)

    rec = RacySub()
    watch = lm.watch(rec)
    # both entries are in the snapshot...
    assert sorted(rec.events) == [
        ("update", "a", ("X",)),
        ("update", "b", ("Y",)),
    ]
    rec.events.clear()
    # ...and the queued copy of b's change is gated out, not redelivered
    assert watch.pump() == 0 and rec.events == []
    watch.close()


def test_stage_decoupling_to_df(app, spark, tmp_state):
    """Stage A syncs into the map; stage B consumes the map's snapshot
    DataFrame as its source — the mount_each hand-off pattern."""
    lm = _map(spark)
    app.sync_table(
        _source(spark, [("a.md", "hello"), ("b.md", "world")]),
        ["path"],
        enrich,
        lm,
    )
    snap = lm.to_df(spark)
    assert snap.count() == 2
    assert set(snap.columns) == {"path", "text_upper"}
    downstream = app.target(
        f"{tmp_state}/stage_b", ["path"], "path STRING, text_upper STRING"
    )

    @fn(memo=True)
    def passthrough(df):
        return df.select("__args_fp", "__component_path", "path", "text_upper")

    s = app.sync_table(snap, ["path"], passthrough, downstream)
    assert s.inserts == 2
    assert {r["path"] for r in downstream.read(spark).collect()} == {"a.md", "b.md"}
