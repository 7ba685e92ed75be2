"""Deadline semantics (reference: tests/core test_deadline.py model —
slow work cancelled at budget; fast work unaffected)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from cocoindex_spark.engine.deadline import DeadlineExceeded, with_deadline


def test_fast_action_completes(spark):
    out = with_deadline(
        spark,
        lambda: spark.range(100).agg(F.sum("id")).collect()[0][0],
        timeout_sec=30,
    )
    assert out == 4950


def test_slow_action_cancelled(spark):
    from pyspark.sql.types import LongType

    @F.udf(LongType())
    def slow(x):
        time.sleep(30)
        return x

    df = spark.range(64).repartition(8).select(slow(F.col("id")).alias("v"))
    t0 = time.perf_counter()
    with pytest.raises(DeadlineExceeded):
        with_deadline(spark, lambda: df.collect(), timeout_sec=3)
    # cancelled near the deadline, not after the 30s sleep
    assert time.perf_counter() - t0 < 25


def test_later_jobs_untagged(spark):
    with pytest.raises(DeadlineExceeded):
        with_deadline(
            spark,
            lambda: (_ for _ in ()).throw(DeadlineExceeded("x")),
            timeout_sec=5,
        )
    # session still healthy for subsequent jobs
    assert spark.range(10).count() == 10
