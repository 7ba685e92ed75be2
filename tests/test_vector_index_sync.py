"""Vector index maintained by the reconcile machinery (SURVEY §7.4.6):
the LSH bucket table is itself a sync target — an embedding edit
re-syncs exactly that vector's bucket row, and top-k queries read the
maintained table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cocoindex_spark.engine.app import App
from cocoindex_spark.engine.function import fn
from cocoindex_spark.operators.vector_ops import cosine_fixed, sign_bucket


@fn(memo=True)
def bucketize(df):
    return df.select(
        "__args_fp",
        "__component_path",
        "vec_id",
        sign_bucket(F.col("embedding"), 4).alias("bucket"),
        "embedding",
    )


@pytest.fixture()
def app(spark, tmp_state):
    a = App("vidx", state_dir=tmp_state, spark=spark)
    yield a
    a.drop()


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")


def test_lsh_table_incremental_and_queryable(app, spark, tmp_state):
    t = app.target(
        f"{tmp_state}/lsh",
        ["vec_id"],
        "vec_id LONG, bucket INT, embedding ARRAY<FLOAT>",
    )
    # probe_col: the synced table also lays down __probe partition
    # dirs on the bucket, so query probes prune FILE I/O
    t.declare_index("lsh", "embedding", bits=4, probe_col="bucket")

    src = _vecs(
        spark,
        [
            (1, [1.0, 0.0, 0.5, 0.1]),
            (2, [0.9, 0.1, 0.4, 0.2]),
            (3, [-1.0, -0.2, -0.1, -0.5]),
        ],
    )
    cold = app.sync_table(src, ["vec_id"], bucketize, t)
    assert cold.inserts == 3
    assert [i["kind"] for i in t.indexes()] == ["lsh"]

    # incremental: one vector edited ⇒ one recompute, one row rewritten
    src2 = _vecs(
        spark,
        [
            (1, [1.0, 0.0, 0.5, 0.1]),
            (2, [-0.9, -0.1, -0.4, -0.2]),  # flipped orthant
            (3, [-1.0, -0.2, -0.1, -0.5]),
        ],
    )
    edit = app.sync_table(src2, ["vec_id"], bucketize, t)
    assert edit.memo_misses == 1 and edit.updates == 1 and edit.noops == 2

    # query path: bucket-pruned top-k over the maintained table
    idx = t.read(spark)
    q = [-1.0, -0.15, -0.2, -0.35]
    qb = spark.createDataFrame([(q,)], "q ARRAY<FLOAT>").select(
        sign_bucket(F.col("q"), 4).alias("bucket")
    )
    hits = (
        idx.join(F.broadcast(qb), "bucket")
        .withColumn("sim", cosine_fixed(F.col("embedding"), F.array(*[F.lit(x) for x in q])))
        .orderBy(F.desc("sim"), "vec_id")
    )
    got = [r.vec_id for r in hits.collect()]
    # both negative-orthant vectors land in the query's bucket; flipped
    # vector 2 is found there, vector 1 is pruned away
    assert set(got) == {2, 3} and 1 not in got

    # file-I/O pruning: the probe-partitioned read of the query's
    # bucket reads fewer files than the full index scan, same rows
    from cocoindex_spark.state.store import _PROBE_COL

    from test_probe_layout import files_read

    qb_val = qb.collect()[0]["bucket"]
    pids = t.probe_partitions(spark, [int(qb_val)])
    probed = (
        t.read_indexed(spark)
        .filter(F.col(_PROBE_COL).isin(pids))
        .filter(F.col("bucket") == int(qb_val))
    )
    assert {r.vec_id for r in probed.collect()} == {2, 3}
    assert files_read(probed) < files_read(t.read(spark))
