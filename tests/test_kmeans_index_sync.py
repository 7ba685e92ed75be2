"""IVF/k-means cell assignment maintained by the reconcile machinery:
train the coarse quantizer once, then the (vec_id → cell) table is a
sync target — an embedding edit re-syncs exactly that vector's cell
row, and IVF probes read the maintained table. The 100 TB contract:
re-clustering never reprocesses the corpus; only changed vectors
re-assign (centroid refresh is a separate, rarer training run)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cocoindex_spark.engine.app import App
from cocoindex_spark.engine.function import fn

# the trained coarse quantizer: frozen centroids (training happens out
# of band, like q118's Lloyd step); literals so the logic fingerprint
# covers them — retraining = new fingerprint = full re-assign, by design
_CENTS = ((0, (1.0, 0.0, 0.0, 0.0)), (1, (-1.0, 0.0, 0.5, 0.0)))
_Q = 1048576.0  # 2^20 fixed point, as the q113 primitive


def _qv(col):
    return F.transform(col, lambda x: F.floor(x.cast("double") * F.lit(_Q)).cast("long"))


def _d2(a, cv):
    cq = F.array(*[F.floor(F.lit(float(x)) * F.lit(_Q)).cast("long") for x in cv])
    return F.aggregate(
        F.zip_with(a, cq, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )


@fn(memo=True)
def assign_cell(df):
    q = _qv(F.col("embedding"))
    d0 = _d2(q, _CENTS[0][1])
    d1 = _d2(q, _CENTS[1][1])
    cell = F.when(d0 <= d1, F.lit(_CENTS[0][0])).otherwise(F.lit(_CENTS[1][0]))
    return df.select(
        "__args_fp",
        "__component_path",
        "vec_id",
        cell.cast("int").alias("cell"),
        "embedding",
    )


@pytest.fixture()
def app(spark, tmp_state):
    a = App("kmidx", state_dir=tmp_state, spark=spark)
    yield a
    a.drop()


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")


def test_cell_table_incremental_and_probe(app, spark, tmp_state):
    t = app.target(
        f"{tmp_state}/cells",
        ["vec_id"],
        "vec_id LONG, cell INT, embedding ARRAY<FLOAT>",
    )
    t.declare_index("ivf", "embedding", cells=len(_CENTS), probe_col="cell")

    src = _vecs(
        spark,
        [
            (1, [0.9, 0.1, 0.0, 0.0]),
            (2, [0.8, -0.1, 0.2, 0.0]),
            (3, [-0.9, 0.0, 0.4, 0.1]),
            (4, [-1.0, 0.1, 0.6, 0.0]),
        ],
    )
    cold = app.sync_table(src, ["vec_id"], assign_cell, t)
    assert cold.inserts == 4
    cells = {r.vec_id: r.cell for r in t.read(spark).collect()}
    assert cells == {1: 0, 2: 0, 3: 1, 4: 1}

    # one vector crosses the cell boundary ⇒ exactly one recompute,
    # one row rewritten; the other three rows never load content
    src2 = _vecs(
        spark,
        [
            (1, [0.9, 0.1, 0.0, 0.0]),
            (2, [-0.8, 0.1, 0.4, 0.0]),  # flipped toward centroid 1
            (3, [-0.9, 0.0, 0.4, 0.1]),
            (4, [-1.0, 0.1, 0.6, 0.0]),
        ],
    )
    edit = app.sync_table(src2, ["vec_id"], assign_cell, t)
    assert edit.memo_misses == 1 and edit.updates == 1 and edit.noops == 3
    assert {r.vec_id: r.cell for r in t.read(spark).collect()}[2] == 1

    # IVF probe over the MAINTAINED table: nearest cell to the query,
    # then candidates come only from that cell
    q = [-0.95, 0.05, 0.5, 0.05]
    import math

    def dist(c):
        return sum((a - b) * (a - b) for a, b in zip(q, c))

    probe = min(_CENTS, key=lambda kv: (dist(kv[1]), kv[0]))[0]
    assert probe == 1
    hits = sorted(
        r.vec_id for r in t.read(spark).filter(F.col("cell") == probe).collect()
    )
    assert hits == [2, 3, 4]
    assert math.isfinite(dist(_CENTS[0][1]))  # sanity on the helper


def test_delete_removes_cell_row(app, spark, tmp_state):
    t = app.target(
        f"{tmp_state}/cells2",
        ["vec_id"],
        "vec_id LONG, cell INT, embedding ARRAY<FLOAT>",
    )
    src = _vecs(spark, [(1, [1.0, 0.0, 0.0, 0.0]), (2, [-1.0, 0.0, 0.5, 0.0])])
    app.sync_table(src, ["vec_id"], assign_cell, t)
    gone = app.sync_table(
        _vecs(spark, [(1, [1.0, 0.0, 0.0, 0.0])]), ["vec_id"], assign_cell, t
    )
    assert gone.deletes == 1
    assert [r.vec_id for r in t.read(spark).collect()] == [1]
