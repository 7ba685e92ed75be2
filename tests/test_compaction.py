"""ManagedTable auto-compaction (state/store.py maybe_compact —
reference analog: LanceDB's auto-OPTIMIZE fragment heuristics,
lancedb/_target.py:368-583): N small syncs must not accumulate
unbounded version directories, and compaction must not change what a
reader sees."""

from __future__ import annotations

import os

from pyspark.sql.types import LongType, StringType, StructField, StructType

from cocoindex_spark.state.store import ManagedTable

SCHEMA = StructType(
    [StructField("k", LongType()), StructField("v", StringType())]
)


def _rows(t, spark):
    return {(r["k"], r["v"]) for r in t.read(spark).collect()}


def _referenced_versions(t):
    return set(t._pointer().values())


def _version_dirs(t):
    return [d for d in os.listdir(t.path) if d.startswith("v_")]


def test_many_small_merges_compact_to_one_version(spark, tmp_state):
    t = ManagedTable(f"{tmp_state}/tbl", ["k"], SCHEMA, n_buckets=4)
    t.overwrite(spark.createDataFrame([(i, f"v{i}") for i in range(40)], SCHEMA))
    # 12 single-key merges: each rewrites one bucket into its own fresh
    # version dir — the fragment spread compaction exists to bound.
    for i in range(12):
        t.merge_upsert(spark.createDataFrame([(i, f"edit{i}")], SCHEMA))
    expected = {(i, f"edit{i}" if i < 12 else f"v{i}") for i in range(40)}
    assert _rows(t, spark) == expected
    assert len(_referenced_versions(t)) == 4  # one live version per bucket

    assert t.maybe_compact(spark, max_versions=3) is True
    # one live version, one file set, unchanged read-back
    assert len(_referenced_versions(t)) == 1
    assert _rows(t, spark) == expected
    # GC keeps a bounded crash-safety tail of unreferenced dirs
    assert len(_version_dirs(t)) <= 1 + 2

    # already compact: a second call is a no-op
    assert t.maybe_compact(spark, max_versions=3) is False


def test_dead_bytes_trigger(spark, tmp_state):
    """A version dir referenced by ONE bucket keeps every other bucket's
    superseded file alive — the dead-bytes fraction trigger."""
    t = ManagedTable(f"{tmp_state}/tbl2", ["k"], SCHEMA, n_buckets=4)
    t.overwrite(spark.createDataFrame([(i, "x" * 200) for i in range(40)], SCHEMA))
    # rewrite most keys (3 of 4 buckets, say) in one merge: the old
    # version stays referenced by the untouched bucket, its other
    # bucket files now dead weight
    t.merge_upsert(
        spark.createDataFrame([(i, "y" * 200) for i in range(30)], SCHEMA)
    )
    before = _rows(t, spark)
    compacted = t.maybe_compact(spark, max_versions=99, max_waste_fraction=0.3)
    if compacted:  # fires unless the 30 keys all hashed into <2 buckets
        assert len(_referenced_versions(t)) == 1
    assert _rows(t, spark) == before


def test_sync_loop_keeps_version_count_bounded(spark, tmp_state):
    """N small engine syncs: the cleanup hook compacts both the state
    tables and the sink target, so version-dir counts stay bounded and
    the target reads back exactly the last synced state."""
    from pyspark.sql import functions as F

    from cocoindex_spark.engine.app import App
    from cocoindex_spark.engine.function import fn

    @fn(memo=True)
    def ident(df):
        return df.select(
            "__args_fp", "__component_path", "k", F.upper("v").alias("v")
        )

    app = App("compact_sync", state_dir=tmp_state, spark=spark)
    target = app.target(f"{tmp_state}/out", ["k"], "k LONG, v STRING")
    base = [(i, f"val{i}") for i in range(20)]
    try:
        for round_no in range(10):
            rows = [
                (k, f"edit{round_no}" if k == round_no % 20 else v)
                for k, v in base
            ]
            app.sync_table(
                spark.createDataFrame(rows, "k LONG, v STRING"),
                ["k"], ident, target,
            )
        # target + every state table stay within the compaction bound
        # (max_versions=8 live + 2 GC tail + the fresh write)
        for tbl in (
            target._table,
            app.state.tracking,
            app.state.memo,
            app.state.source_fp,
        ):
            assert len(_version_dirs(tbl)) <= 8 + 2 + 1, tbl.path
        got = {(r["k"], r["v"]) for r in target.read(spark).collect()}
        want = {
            (k, ("edit9" if k == 9 else f"val{k}").upper()) for k, v in base
        }
        assert got == want
    finally:
        app.drop()
