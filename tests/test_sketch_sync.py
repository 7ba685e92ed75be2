"""Sketches maintained by the sync engine — the incremental form of
q102/q103 (same pattern as the LSH band table and FTS postings
index): the target holds PER-DOCUMENT sketch contributions, so a
document edit recomputes exactly that document's rows, and the global
sketch is a bounded rollup over the maintained table (SUM for
Count-Min, MAX for HLL).

The per-doc decomposition is what makes the sketches DELETE-correct:
a single global register/cell table cannot subtract a departed
document (HLL has no inverse; CM would need negative replay), but the
rollup over remaining contribution rows is exactly the sketch of the
remaining corpus — asserted against a from-scratch rebuild after
every mutation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cocoindex_spark.engine.app import App
from cocoindex_spark.engine.function import fn
from cocoindex_spark.operators.sketch import (
    CM_WIDTH,
    cm_cells,
    hll_registers,
)

_TOKS = "filter(split(trim(text), ' '), t -> t != '')"
# distinct tokens with per-doc counts, FTS-postings style
_PAIRS = (
    f"transform(array_distinct({_TOKS}), t -> struct("
    f"t AS t, CAST(size(filter({_TOKS}, x -> x = t)) AS BIGINT) AS n))"
)


def _cm_hash(i: int, var: str) -> str:
    # == operators/sketch hex_to_int(md5_hex('cm{i}#' || t), 12) % W
    return (
        f"CAST(conv(substring(md5(encode(concat('cm{i}#', {var}), 'UTF-8')),"
        f" 1, 12), 16, 10) AS BIGINT) % {CM_WIDTH}"
    )


@fn(memo=True)
def cm_contrib(df):
    cells = ", ".join(
        f"struct({i} AS row, {_cm_hash(i, 'p.t')} AS cell, p.n AS n)"
        for i in range(4)
    )
    return df.select(
        "__args_fp",
        "__component_path",
        "doc_id",
        F.expr(f"flatten(transform({_PAIRS}, p -> array({cells})))").alias(
            "cells"
        ),
    )


_H = (
    "CAST(conv(substring(md5(encode(p.t, 'UTF-8')), 1, 12), 16, 10) AS BIGINT)"
)


@fn(memo=True)
def hll_contrib(df):
    reg = (
        f"struct(CAST({_H} % 256 AS BIGINT) AS j,"
        f" CAST(CASE WHEN {_H} div 256 > 0"
        f" THEN 41 - length(bin({_H} div 256)) ELSE 41 END AS BIGINT) AS rho)"
    )
    return df.select(
        "__args_fp",
        "__component_path",
        "doc_id",
        F.expr(f"transform({_PAIRS}, p -> {reg})").alias("regs"),
    )


@pytest.fixture()
def app(spark, tmp_state):
    a = App("sketchidx", state_dir=tmp_state, spark=spark)
    yield a
    a.drop()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _toks(df):
    return df.select(F.explode(F.expr(_TOKS)).alias("tok"))


_D1 = (1, "alpha beta gamma alpha")
_D2 = (2, "beta delta epsilon")
_D3 = (3, "zeta eta theta iota")
_D2b = (2, "rewritten totally new words")


def _rolled_cm(t, spark):
    return {
        tuple(r)
        for r in t.read(spark)
        .select(F.explode("cells").alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.cell").alias("cell"))
        .agg(F.sum("c.n").alias("n"))
        .collect()
    }


def _direct_cm(spark, rows):
    return {tuple(r) for r in cm_cells(_toks(_docs(spark, rows)), "tok").collect()}


def test_cm_cells_sync_maintained(app, spark, tmp_state):
    t = app.target(
        f"{tmp_state}/cmidx",
        ["doc_id"],
        "doc_id LONG, cells ARRAY<STRUCT<row INT, cell BIGINT, n BIGINT>>",
    )
    cold = app.sync_table(_docs(spark, [_D1, _D2, _D3]), ["doc_id"], cm_contrib, t)
    assert cold.inserts == 3
    assert _rolled_cm(t, spark) == _direct_cm(spark, [_D1, _D2, _D3])

    # edit one doc: exactly one recompute; rollup == rebuilt sketch
    edit = app.sync_table(
        _docs(spark, [_D1, _D2b, _D3]), ["doc_id"], cm_contrib, t
    )
    assert edit.memo_misses == 1 and edit.updates == 1
    assert _rolled_cm(t, spark) == _direct_cm(spark, [_D1, _D2b, _D3])

    # delete one doc: the departed contribution subtracts exactly
    dele = app.sync_table(_docs(spark, [_D1, _D2b]), ["doc_id"], cm_contrib, t)
    assert dele.deletes == 1
    assert _rolled_cm(t, spark) == _direct_cm(spark, [_D1, _D2b])


def _rolled_hll(t, spark):
    return {
        tuple(r)
        for r in t.read(spark)
        .select(F.explode("regs").alias("r"))
        .groupBy(F.col("r.j").alias("j"))
        .agg(F.max("r.rho").alias("M"))
        .collect()
    }


def _direct_hll(spark, rows):
    regs = hll_registers(
        _toks(_docs(spark, rows)).select(F.lit("g").alias("g"), "tok"),
        ["g"],
        "tok",
    )
    return {(r["j"], r["M"]) for r in regs.collect()}


def test_hll_registers_sync_maintained(app, spark, tmp_state):
    t = app.target(
        f"{tmp_state}/hllidx",
        ["doc_id"],
        "doc_id LONG, regs ARRAY<STRUCT<j BIGINT, rho BIGINT>>",
    )
    app.sync_table(_docs(spark, [_D1, _D2, _D3]), ["doc_id"], hll_contrib, t)
    assert _rolled_hll(t, spark) == _direct_hll(spark, [_D1, _D2, _D3])

    # delete: naive global registers can never un-count doc 3; the
    # per-doc MAX rollup is exactly the remaining corpus's registers
    dele = app.sync_table(_docs(spark, [_D1, _D2]), ["doc_id"], hll_contrib, t)
    assert dele.deletes == 1
    assert _rolled_hll(t, spark) == _direct_hll(spark, [_D1, _D2])
