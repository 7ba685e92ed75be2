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


def test_hadoop_fs_roundtrip(spark, tmp_state):
    """The Hadoop-FileSystem metadata backend, driven through the
    file:// scheme (same JVM API as hdfs/abfss): atomic write + read
    back (bytes must cross the Py4J boundary), listing, dir checks,
    sizes, recursive delete."""
    from cocoindex_spark.state.fs import HadoopFS

    root = os.path.join(tmp_state, "hfs")
    fs = HadoopFS(f"file://{root}")
    fs.makedirs(root)
    assert fs.read_text(os.path.join(root, "missing")) is None

    payload = '{"n_buckets": 8, "buckets": {"0": "v_1"}}'
    ptr = os.path.join(root, "_CURRENT")
    fs.write_atomic(ptr, payload)
    assert fs.read_text(ptr) == payload
    fs.write_atomic(ptr, payload + " ")  # overwrite path
    assert fs.read_text(ptr) == payload + " "

    fs.makedirs(os.path.join(root, "v_1"))
    assert sorted(fs.listdir(root)) == ["_CURRENT", "v_1"]
    assert fs.isdir(os.path.join(root, "v_1")) and not fs.isdir(ptr)
    assert fs.total_bytes(root) == len(payload) + 1
    fs.rmtree(os.path.join(root, "v_1"))
    assert fs.listdir(root) == ["_CURRENT"]


def test_adaptive_bucket_growth(spark, tmp_state):
    """maybe_grow doubles the bucket count once the average referenced
    bucket exceeds the threshold; the count persists in the pointer,
    data survives the rehash, and scoped merges keep working under the
    new count."""
    t = ManagedTable(os.path.join(tmp_state, "t"), ["k"], _schema(), n_buckets=4)
    rows = [(f"k{i}", i) for i in range(50)]
    t.merge_upsert(spark.createDataFrame(rows, _schema()))
    assert t._meta()[0] == 4

    # no growth under a huge threshold
    assert t.maybe_grow(spark, max_bucket_bytes=1 << 40) is False
    # forced growth under a 1-byte threshold
    assert t.maybe_grow(spark, max_bucket_bytes=1) is True
    assert t._meta()[0] == 8
    assert _rows(t, spark) == set(rows)

    # a fresh handle (new process analog) sees the grown count
    t2 = ManagedTable(os.path.join(tmp_state, "t"), ["k"], _schema(), n_buckets=4)
    assert t2._meta()[0] == 8
    t2.merge_upsert(spark.createDataFrame([("k1", 100), ("new", 1)], _schema()))
    got = dict(_rows(t2, spark))
    assert got["k1"] == 100 and got["new"] == 1 and len(got) == 51


def test_legacy_pointer_format(spark, tmp_state):
    """A pre-adaptive pointer (flat bucket→version map) still reads;
    the constructor bucket count applies."""
    import json

    t = ManagedTable(os.path.join(tmp_state, "t"), ["k"], _schema(), n_buckets=4)
    t.merge_upsert(spark.createDataFrame([("a", 1), ("b", 2)], _schema()))
    ptr_path = os.path.join(t.path, "_CURRENT")
    with open(ptr_path) as f:
        doc = json.load(f)
    with open(ptr_path, "w") as f:
        json.dump(doc["buckets"], f)  # rewrite in the legacy flat format
    t2 = ManagedTable(os.path.join(tmp_state, "t"), ["k"], _schema(), n_buckets=4)
    assert t2._meta()[0] == 4
    assert _rows(t2, spark) == {("a", 1), ("b", 2)}


def test_merge_apply_combined_upsert_delete(spark, tmp_state):
    """merge_apply = merge_upsert + delete_keys in ONE bucket rewrite
    (the mixed-sync path): upserts land, deleted keys vanish, a key in
    BOTH channels ends deleted (sequential semantics), untouched keys
    survive — and only one new version is published."""
    t = ManagedTable(os.path.join(tmp_state, "t"), ["k"], _schema())
    t.merge_upsert(
        spark.createDataFrame([("a", 1), ("b", 2), ("c", 3), ("d", 4)], _schema())
    )
    versions_before = set(t._pointer().values())

    t.merge_apply(
        spark.createDataFrame([("b", 20), ("e", 5), ("x", 9)], _schema()),
        spark.createDataFrame([("a", 0), ("x", 0)], _schema()).select("k"),
    )
    # b updated, e inserted, a deleted, x (both channels) deleted,
    # c/d untouched
    assert _rows(t, spark) == {("b", 20), ("c", 3), ("d", 4), ("e", 5)}
    # exactly one new version name across all rewritten buckets
    assert len(set(t._pointer().values()) - versions_before) == 1

    # idempotent re-application converges
    t.merge_apply(
        spark.createDataFrame([("b", 20), ("e", 5), ("x", 9)], _schema()),
        spark.createDataFrame([("a", 0), ("x", 0)], _schema()).select("k"),
    )
    assert _rows(t, spark) == {("b", 20), ("c", 3), ("d", 4), ("e", 5)}

    # degenerate channels: empty updates = delete_keys; empty deletes =
    # merge_upsert
    t.merge_apply(
        spark.createDataFrame([], _schema()),
        spark.createDataFrame([("e", 0)], _schema()).select("k"),
    )
    assert _rows(t, spark) == {("b", 20), ("c", 3), ("d", 4)}
    t.merge_apply(
        spark.createDataFrame([("f", 6)], _schema()),
        spark.createDataFrame([], "k STRING"),
    )
    assert _rows(t, spark) == {("b", 20), ("c", 3), ("d", 4), ("f", 6)}
