"""Incrementally-maintained aggregation via the sync engine: components
are GROUPS (not rows), each fingerprinted by the sorted list of its
members' row fingerprints — so a warm run replays every group, an edit
recomputes exactly the touched group, and group disappearance cascades.
This is the 100 TB rollup recipe: per-partition aggregates stay
materialized and only partitions whose membership fp changed
reaggregate (reference analog: update-stats rollups re-derived per
component, SURVEY §2.6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cocoindex_spark.engine.app import App
from cocoindex_spark.engine.function import fn
from cocoindex_spark.fingerprint import fp_col


@fn(memo=True)
def rollup(df):
    """Compute the group aggregate from the packed member stats."""
    return df.select(
        "__args_fp",
        "__component_path",
        "source",
        F.size("lens").alias("n_docs"),
        F.aggregate("lens", F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "total_chars"
        ),
    )


def _grouped(docs):
    """(source, packed member lens, order-independent membership fp).

    The group fp hashes the SORTED member fingerprints, so it is
    stable under shuffle order and changes iff any member's content
    (or the member set) changes."""
    per_doc = docs.select(
        "source",
        F.length("text").alias("len"),
        fp_col(F.col("doc_id"), F.col("text")).alias("doc_fp"),
    )
    return per_doc.groupBy("source").agg(
        F.array_sort(F.collect_list(F.struct("doc_fp", "len"))).alias("m")
    ).select(
        "source",
        F.col("m.len").alias("lens"),
        fp_col(F.to_json("m")).alias("group_fp"),
    )


@pytest.fixture()
def app(spark, tmp_state):
    a = App("agg", state_dir=tmp_state, spark=spark)
    yield a
    a.drop()


def test_incremental_group_rollup(app, spark, tmp_state):
    t = app.target(
        f"{tmp_state}/rollup", ["source"],
        "source STRING, n_docs INT, total_chars LONG",
    )
    docs = spark.createDataFrame(
        [(0, "alpha", "web"), (1, "beta", "web"), (2, "gamma", "books"),
         (3, "delta", "books"), (4, "epsilon", "code")],
        "doc_id LONG, text STRING, source STRING",
    )
    cold = app.sync_table(_grouped(docs), ["source"], rollup, t)
    assert cold.memo_misses == 3  # one per group
    got = {r["source"]: (r["n_docs"], r["total_chars"]) for r in t.read(spark).collect()}
    assert got == {"web": (2, 9), "books": (2, 10), "code": (1, 7)}

    # warm: every group replays, nothing recomputes
    warm = app.sync_table(_grouped(docs), ["source"], rollup, t)
    assert warm.memo_misses == 0 and warm.noops == 3

    # edit one doc -> ONLY its group reaggregates
    edited = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 2, F.lit("gamma-longer")).otherwise(F.col("text")),
    )
    edit = app.sync_table(_grouped(edited), ["source"], rollup, t)
    assert edit.memo_misses == 1, "one member edit = one group recompute"
    assert edit.updates == 1 and edit.noops == 2
    got = {r["source"]: (r["n_docs"], r["total_chars"]) for r in t.read(spark).collect()}
    assert got["books"] == (2, 17) and got["web"] == (2, 9)

    # membership change (doc moves source): BOTH touched groups, only those
    moved = edited.withColumn(
        "source",
        F.when(F.col("doc_id") == 4, F.lit("web")).otherwise(F.col("source")),
    )
    mv = app.sync_table(_grouped(moved), ["source"], rollup, t)
    # web gained a member -> recompute; code vanished -> cascade delete
    assert mv.memo_misses == 1 and mv.deletes == 1 and mv.noops == 1
    got = {r["source"]: (r["n_docs"], r["total_chars"]) for r in t.read(spark).collect()}
    assert got == {"web": (3, 16), "books": (2, 17)}
