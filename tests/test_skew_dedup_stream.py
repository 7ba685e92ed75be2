"""Salted joins (result-identical to unsalted) and the cross-batch
streaming dedup operator."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain_join(spark):
    from cocoindex_spark.operators.skew import salted_join

    probe = spark.createDataFrame(
        [(k, i) for i in range(50) for k in ("hot", f"cold{i % 7}")],
        "k STRING, pv INT",
    )
    build = spark.createDataFrame(
        [("hot", 1), ("hot", 2), ("cold1", 10), ("cold3", 30), ("nowhere", 99)],
        "k STRING, bv INT",
    )
    expected = _sorted_rows(probe.join(build, "k", "inner"))
    got = _sorted_rows(salted_join(probe, build, ["k"], n_salts=4))
    assert got == expected

    expected_l = _sorted_rows(probe.join(build, "k", "left"))
    got_l = _sorted_rows(salted_join(probe, build, ["k"], n_salts=4, how="left"))
    assert got_l == expected_l


def test_selective_salted_join(spark):
    from cocoindex_spark.operators.skew import selective_salted_join, top_keys

    probe = spark.createDataFrame(
        [("hot", i) for i in range(40)] + [("cold", 1), ("warm", 2)],
        "k STRING, pv INT",
    )
    build = spark.createDataFrame(
        [("hot", 100), ("hot", 200), ("cold", 5)], "k STRING, bv INT"
    )
    hot = top_keys(probe, ["k"], min_count=10)
    assert [r["k"] for r in hot.collect()] == ["hot"]
    expected = _sorted_rows(probe.join(build, "k", "inner"))
    got = _sorted_rows(selective_salted_join(probe, build, ["k"], hot, n_salts=4))
    assert got == expected


def test_salted_join_spreads_hot_key(spark):
    """The mechanism itself: a hot key's probe rows land on multiple
    salt replicas (that is what breaks the single-task straggler)."""
    from cocoindex_spark.operators.skew import salted_join  # noqa: F401 (import path)

    probe = spark.createDataFrame([("hot", i) for i in range(64)], "k STRING, pv INT")
    salts = probe.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(8))
    )
    n_distinct = salts.select("__salt").distinct().count()
    assert n_distinct >= 4  # 64 hashed rows cover most of 8 salt slots


def test_deduper_logic_unit():
    from cocoindex_spark.streaming.stateful import make_deduper

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

    fn = make_deduper()
    st = FakeState()
    # first batch: key emitted once with its min ts and 2 dups
    out = list(fn(("k",), [pd.DataFrame({"ts": [9, 5, 7]})], st))
    assert len(out) == 1 and out[0].iloc[0].tolist() == ["k", 5, 2]
    assert st.get == (5, 3)
    # second batch: silent (append mode), counter bumps
    out = list(fn(("k",), [pd.DataFrame({"ts": [1]})], st))
    assert out == [] and st.get == (5, 4)

    fn_u = make_deduper(emit_updates=True)
    st2 = FakeState()
    list(fn_u(("k",), [pd.DataFrame({"ts": [3]})], st2))
    out = list(fn_u(("k",), [pd.DataFrame({"ts": [4, 8]})], st2))
    assert out[0].iloc[0].tolist() == ["k", 3, 2]


def test_dedup_stream_cross_batch(spark, tmp_state):
    """Key seen in batch 1 is NOT re-emitted when it reappears in batch
    2 — the state store genuinely suppresses cross-batch duplicates."""
    from cocoindex_spark.streaming.stateful import dedup_stream

    src = os.path.join(tmp_state, "in")
    os.makedirs(src)
    chk = os.path.join(tmp_state, "chk")
    b1 = spark.createDataFrame([("a", 10), ("a", 12), ("b", 11)], "key STRING, ts LONG")
    b2 = spark.createDataFrame([("a", 20), ("c", 21)], "key STRING, ts LONG")
    b1.coalesce(1).write.parquet(os.path.join(src, "f1"))
    b2.coalesce(1).write.parquet(os.path.join(src, "f2"))

    stream = (
        spark.readStream.schema("key STRING, ts LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
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
    rows = sorted(tuple(r) for r in spark.sql("SELECT * FROM dedup_out").collect())
    # each key exactly once, first_ts = its first-batch min arrival
    assert [r[0] for r in rows] == ["a", "b", "c"]
    by_key = {r[0]: r for r in rows}
    assert by_key["a"][1] == 10 and by_key["b"][1] == 11 and by_key["c"][1] == 21
    spark.catalog.dropTempView("dedup_out")


def test_kgrams_matches_python_reference(spark):
    """kgrams (zip_with chain) vs a plain-Python sliding window, on
    deliberately nasty token sets: empties, unicode, repeated tokens,
    and lengths straddling k."""
    from cocoindex_spark.operators.text_ops import kgrams

    cases = [
        [],
        ["a"],
        ["a", "b"],
        ["a", "b", "c"],
        ["a", "b", "c", "d", "e"],
        ["", "", ""],
        ["x", "", "y", ""],
        ["日本", "語", "テスト", "日本"],
        ["t"] * 10,
    ]
    for k in (2, 3, 4):
        rows = [(i, toks) for i, toks in enumerate(cases)]
        df = spark.createDataFrame(rows, "i INT, w ARRAY<STRING>")
        import pyspark.sql.functions as F

        got = {
            r["i"]: list(r["g"])
            for r in df.select("i", kgrams(F.col("w"), k).alias("g")).collect()
        }
        for i, toks in enumerate(cases):
            expected = (
                [" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)]
                if len(toks) >= k
                else []
            )
            assert got[i] == expected, (k, toks)


def test_kgrams_hypothesis_random_tokens(spark):
    """Randomized equivalence of kgrams vs the Python sliding window
    (one Spark job over many generated rows — hypothesis-style coverage
    without per-example Spark overhead)."""
    import random

    from cocoindex_spark.operators.text_ops import kgrams

    rng = random.Random(123)
    alphabet = ["a", "bb", "ccc", "", "δ", "tok"]
    cases = [
        [rng.choice(alphabet) for _ in range(rng.randint(0, 12))] for _ in range(200)
    ]
    import pyspark.sql.functions as F

    for k in (2, 3):
        df = spark.createDataFrame(
            [(i, toks) for i, toks in enumerate(cases)], "i INT, w ARRAY<STRING>"
        )
        got = {
            r["i"]: list(r["g"])
            for r in df.select("i", kgrams(F.col("w"), k).alias("g")).collect()
        }
        for i, toks in enumerate(cases):
            expected = (
                [" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)]
                if len(toks) >= k
                else []
            )
            assert got[i] == expected, (k, i, toks)
