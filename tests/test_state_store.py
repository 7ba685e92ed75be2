"""ManagedTable / StateStore: idempotent MERGE, atomic version swap,
crash convergence (reference: LMDB storage.rs + submit_session.rs)."""

from __future__ import annotations

import os

from pyspark.sql.types import StructType

from cocoindex_spark.state.store import ManagedTable


def _schema():
    return StructType.fromDDL("k STRING, v BIGINT")


def _rows(table, spark):
    return {(r["k"], r["v"]) for r in table.read(spark).collect()}


def test_merge_upsert_and_delete(spark, tmp_state):
    t = ManagedTable(os.path.join(tmp_state, "t"), ["k"], _schema())
    assert t.read(spark).count() == 0

    t.merge_upsert(spark.createDataFrame([("a", 1), ("b", 2)], _schema()))
    assert _rows(t, spark) == {("a", 1), ("b", 2)}

    # upsert overwrites on key, keeps others
    t.merge_upsert(spark.createDataFrame([("b", 20), ("c", 3)], _schema()))
    assert _rows(t, spark) == {("a", 1), ("b", 20), ("c", 3)}

    t.delete_keys(spark.createDataFrame([("a", 0)], _schema()).select("k"))
    assert _rows(t, spark) == {("b", 20), ("c", 3)}


def test_merge_idempotent(spark, tmp_state):
    t = ManagedTable(os.path.join(tmp_state, "t"), ["k"], _schema())
    batch = spark.createDataFrame([("a", 1)], _schema())
    t.merge_upsert(batch)
    t.merge_upsert(batch)  # re-apply after simulated crash
    assert _rows(t, spark) == {("a", 1)}


def test_crash_between_write_and_swap_keeps_old_version(spark, tmp_state):
    t = ManagedTable(os.path.join(tmp_state, "t"), ["k"], _schema())
    t.overwrite(spark.createDataFrame([("a", 1)], _schema()))
    # Simulate a crash: a new version dir exists but the pointer was
    # never swapped — readers must still see the old version.
    orphan = os.path.join(t.path, "v_9999999999999999")
    spark.createDataFrame([("bad", 666)], _schema()).write.mode("overwrite").parquet(orphan)
    assert _rows(t, spark) == {("a", 1)}


def test_version_gc(spark, tmp_state):
    t = ManagedTable(os.path.join(tmp_state, "t"), ["k"], _schema())
    for i in range(8):
        t.overwrite(spark.createDataFrame([("a", i)], _schema()))
    versions = [d for d in os.listdir(t.path) if d.startswith("v_")]
    assert len(versions) <= 5  # keep window + current
    assert _rows(t, spark) == {("a", 7)}
