"""Custom stateful streaming operator (applyInPandasWithState):
cross-batch sessionization — per-key state survives micro-batch
boundaries, gaps close sessions, open sessions stay in state."""

from __future__ import annotations

import os
import time

import pandas as pd
from pyspark.sql import functions as F


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


class _FakeState:
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


def test_anomaly_scorer_single_batch_matches_q121(spark):
    """One batch carrying the whole history ≡ batch q121 exactly."""
    from cocoindex_spark.queries.registry import table
    from cocoindex_spark.queries.streamingq import q121_rate_anomaly
    from cocoindex_spark.streaming.stateful import make_anomaly_scorer

    sf = "/root/testdata/sf0.001"
    from pyspark.sql import functions as F

    buckets = (
        table(spark, sf, "events")
        .groupBy("event_type", F.col("ts").cast("date").cast("string").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )
    by_type: dict = {}
    for r in buckets:
        by_type.setdefault(r.event_type, []).append((r.day, r.n))

    fn = make_anomaly_scorer()
    got = set()
    for etype, rows in by_type.items():
        st = _FakeState()
        pdf = pd.DataFrame({"day": [d for d, _ in rows], "n": [n for _, n in rows]})
        for out in fn((etype,), [pdf], st):
            for rec in out.itertuples(index=False):
                got.add((rec.event_type, rec.day, rec.n, rec.direction))

    want = {
        (r.event_type, str(r.day), r.n, r.direction)
        for r in q121_rate_anomaly(spark, sf).collect()
    }
    assert got == want and want  # non-vacuous


def test_anomaly_scorer_state_accumulates_across_batches():
    from cocoindex_spark.streaming.stateful import make_anomaly_scorer

    fn = make_anomaly_scorer()
    st = _FakeState()
    # batch 1: a flat baseline — nothing anomalous, stats persist
    flat = pd.DataFrame({"day": [f"d{i}" for i in range(8)], "n": [10] * 8})
    assert list(fn(("t",), [flat], st)) == []
    assert st.get == (8, 80, 800)
    # batch 2: one spike bucket scored against the ACCUMULATED stats
    out = list(fn(("t",), [pd.DataFrame({"day": ["d8"], "n": [100]})], st))
    assert st.get == (9, 180, 10800)
    flags = out[0]
    assert list(flags["direction"]) == ["spike"] and list(flags["day"]) == ["d8"]


def test_hll_register_stream_matches_batch(spark, tmp_state):
    """Streaming HLL maintenance is a BUILT-IN streaming aggregation
    (MAX is mergeable), state = m rows per group. Two one-file
    micro-batches; the final register snapshot must equal the batch
    sketch over the union of both batches — the partition-merge ≡
    whole-data property, exercised across micro-batch state merges."""
    from cocoindex_spark.operators.sketch import hll_registers
    from cocoindex_spark.streaming.sketch_stream import hll_register_stream

    src = os.path.join(tmp_state, "docs_in")
    os.makedirs(src)
    chk = os.path.join(tmp_state, "chk_hll")

    rows1 = [("web", "alpha beta gamma alpha"), ("lit", "delta epsilon")]
    rows2 = [("web", "zeta beta NEW words here"), ("lit", "eta theta iota")]
    schema = "source STRING, text STRING"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(src + "/f2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    regs = hll_register_stream(stream)
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("complete")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        if q.isActive:
            q.stop()

    got = {
        (r["source"], r["j"], r["M"])
        for r in spark.sql("SELECT * FROM hll_regs").collect()
    }
    both = spark.createDataFrame(rows1 + rows2, schema)
    toks = both.select(
        "source", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    )
    want = {
        (r["source"], r["j"], r["M"])
        for r in hll_registers(toks, ["source"], "tok").collect()
    }
    assert got == want
    spark.catalog.dropTempView("hll_regs")


def test_cm_cell_stream_matches_batch(spark, tmp_state):
    """Count-Min cells SUM-merge across micro-batches as a built-in
    streaming aggregation; the final snapshot equals the batch sketch
    over the union."""
    from cocoindex_spark.operators.sketch import cm_cells
    from cocoindex_spark.streaming.sketch_stream import cm_cell_stream

    src = os.path.join(tmp_state, "docs_cm")
    os.makedirs(src)
    chk = os.path.join(tmp_state, "chk_cm")
    rows1 = [("web", "alpha beta alpha"), ("lit", "gamma")]
    rows2 = [("web", "beta delta delta"), ("lit", "alpha")]
    schema = "source STRING, text STRING"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(src + "/f2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        cm_cell_stream(stream)
        .writeStream.format("memory")
        .queryName("cm_cells_out")
        .outputMode("complete")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        if q.isActive:
            q.stop()

    got = {
        (r["row"], r["cell"], r["n"])
        for r in spark.sql("SELECT * FROM cm_cells_out").collect()
    }
    both = spark.createDataFrame(rows1 + rows2, schema)
    toks = both.select(
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    )
    want = {(r["row"], r["cell"], r["n"]) for r in cm_cells(toks, "tok").collect()}
    assert got == want
    spark.catalog.dropTempView("cm_cells_out")


def test_cdc_chunk_stream_matches_batch(spark, tmp_state):
    """CDC chunk dedup on the live path: two one-file micro-batches;
    the final per-chunk counts must equal the batch chunker over the
    union (cross-micro-batch parity — chunk boundaries are per-row
    content, state is the built-in COUNT agg)."""
    from cocoindex_spark.operators.cdc import cdc_chunk_hashes
    from cocoindex_spark.streaming.sketch_stream import cdc_chunk_stream

    src = os.path.join(tmp_state, "cdc_in")
    os.makedirs(src)
    chk = os.path.join(tmp_state, "chk_cdc")

    rows1 = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "hello"),  # single word: one whole-doc chunk
    ]
    rows2 = [
        (3, "the quick brown fox jumps over the lazy dog again and again"),
        (4, "hello"),
        (5, "completely different words in this one document here"),
    ]
    schema = "doc_id LONG, text STRING"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(src + "/f2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        cdc_chunk_stream(stream)
        .writeStream.format("memory")
        .queryName("cdc_counts")
        .outputMode("complete")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        if q.isActive:
            q.stop()

    got = {
        (r["chunk_hash"], r["n_occurrences"])
        for r in spark.sql("SELECT * FROM cdc_counts").collect()
    }
    both = spark.createDataFrame(rows1 + rows2, schema)
    want = {
        (r["chunk_hash"], r["n"])
        for r in cdc_chunk_hashes(both)
        .groupBy("chunk_hash")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    assert got == want
    # identical docs dedup across micro-batches: every chunk of doc 1/3
    # (and the single-word doc 2/4) counts exactly twice
    assert {n for _, n in got} == {1, 2}
    spark.catalog.dropTempView("cdc_counts")
