"""Usage index maintained by the reconcile machinery — element +
reference rows as a sync target with a name-probe layout (q159; the
FTS/LSH synced-index pattern applied to code usage search, reference
types.rs:119-142). Pins: edit blast radius 1, stale rows converge,
probe prunes file I/O, probe answer matches from-scratch extraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cocoindex_spark.engine.app import App
from cocoindex_spark.queries.codeq import sync_usage_index
from cocoindex_spark.state.store import _PROBE_COL


@pytest.fixture()
def app(spark, tmp_state):
    a = App("usageidx", state_dir=tmp_state, spark=spark)
    yield a
    a.drop()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, code STRING")


def test_usage_index_blast_radius_and_probe(app, spark):
    from test_probe_layout import files_read

    docs = _docs(
        spark,
        [
            (1, "mod srv { pub fn api() -> u64 { 1 } }\n"),
            (2, "fn go2() -> u64 { srv::api() + srv::api() }\n"),
            (3, "fn go3() -> u64 { srv::api() }\n// srv::api()\n"),
            (4, 'fn other() -> u64 { helper() }\nstatic S: &str = "srv::api()";\n'),
        ],
    )
    target, cold = sync_usage_index(app, docs)
    assert cold.memo_misses == 4

    pids = target.probe_partitions(spark, ["api"])
    probed = (
        target.read_indexed(spark)
        .filter(F.col(_PROBE_COL).isin(pids))
        .filter((F.col("name") == "api") & (F.col("owner") == "srv"))
    )
    got = probed.groupBy("row_kind").count().collect()
    counts = {r["row_kind"]: r["count"] for r in got}
    # one definition; three real call sites (decoys in comment/string
    # never indexed — the lexer dropped them at sync time)
    assert counts == {"element": 1, "reference": 3}
    assert files_read(probed) < files_read(target.read(spark))

    # edit doc 2: one recompute; its rows converge (one call now)
    docs2 = _docs(
        spark,
        [
            (1, "mod srv { pub fn api() -> u64 { 1 } }\n"),
            (2, "fn go2() -> u64 { srv::api() }\n"),
            (3, "fn go3() -> u64 { srv::api() }\n// srv::api()\n"),
            (4, 'fn other() -> u64 { helper() }\nstatic S: &str = "srv::api()";\n'),
        ],
    )
    _, edit = sync_usage_index(app, docs2)
    assert edit.memo_misses == 1
    # re-plan the probe: read() resolves the CURRENT pointer (the old
    # `probed` frame captured the pre-edit version paths)
    refs2 = (
        target.read_indexed(spark)
        .filter(F.col(_PROBE_COL).isin(pids))
        .filter(
            (F.col("name") == "api")
            & (F.col("owner") == "srv")
            & (F.col("row_kind") == "reference")
        )
    )
    assert refs2.count() == 2
    assert {r["doc_id"] for r in refs2.collect()} == {2, 3}
