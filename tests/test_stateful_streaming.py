"""Custom stateful streaming operator (applyInPandasWithState):
cross-batch sessionization — per-key state survives micro-batch
boundaries, gaps close sessions, open sessions stay in state."""

from __future__ import annotations

import os
import time

import pandas as pd


def test_sessionizer_logic_unit():
    """The state function itself, unit-tested with a fake GroupState
    (the reference's injected-fake strategy)."""
    from cocoindex_spark.streaming.stateful import make_sessionizer

    class FakeState:
        def __init__(self):
            self._v = None
            self.hasTimedOut = False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

        def remove(self):
            self._v = None

        def setTimeoutDuration(self, ms):
            pass

    fn = make_sessionizer(gap_sec=30)
    st = FakeState()

    # batch 1: two events 10 apart → one open session in state, nothing emitted
    out = list(fn(("a",), [pd.DataFrame({"ts": [0, 10]})], st))
    assert out == [] and st.get == (0, 10, 2)

    # batch 2: a gap > 30 closes the carried session and opens a new one
    out = list(fn(("a",), [pd.DataFrame({"ts": [100, 105]})], st))
    assert len(out) == 1
    assert out[0].iloc[0].tolist() == ["a", 0, 10, 2]
    assert st.get == (100, 105, 2)

    # timeout: the open session flushes and state clears
    st.hasTimedOut = True
    out = list(fn(("a",), [], st))
    assert out[0].iloc[0].tolist() == ["a", 100, 105, 2]
    assert not st.exists


def test_sessionize_stream_cross_batch(spark, tmp_state):
    """End-to-end on a real file stream forced into one-file
    micro-batches: key 'a' closes its session only because of an event
    in a LATER batch; key 'b' spans both batches without closing —
    state genuinely crosses batch boundaries."""
    from cocoindex_spark.streaming.stateful import sessionize_stream

    src = os.path.join(tmp_state, "events_in")
    os.makedirs(src)
    chk = os.path.join(tmp_state, "chk")

    b1 = spark.createDataFrame([("a", 0), ("a", 10), ("b", 5)], "key STRING, ts LONG")
    b2 = spark.createDataFrame([("a", 100), ("b", 20)], "key STRING, ts LONG")
    b1.coalesce(1).write.parquet(os.path.join(src, "f1"))
    b2.coalesce(1).write.parquet(os.path.join(src, "f2"))

    stream = (
        spark.readStream.schema("key STRING, ts LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    sessions = sessionize_stream(stream, gap_sec=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        if q.isActive:
            q.stop()

    rows = [tuple(r) for r in spark.sql("SELECT * FROM sess_out").collect()]
    # only a's first session closed (by the cross-batch gap); b's is
    # still open in state, a's second too
    assert rows == [("a", 0, 10, 2)]
    spark.catalog.dropTempView("sess_out")
