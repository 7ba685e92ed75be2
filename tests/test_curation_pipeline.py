"""End-to-end curation pipeline through the sync engine: the near-dup
signature index (stage 1, engine-maintained) feeds leakage-safe split
assignment (stage 2) — the q116 semantics as INCREMENTAL mounts.

Stage 2's source rows carry (doc_id, component_id) — the connected
component derived from the maintained signature table — so the memo
keys on exactly what the split depends on: a doc re-syncs its split
row iff its dup-group membership changed. An edit that re-links one
doc recomputes one signature row (stage 1) and one split row (stage
2); every other row is a memo hit/no-op."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cocoindex_spark.engine.app import App
from cocoindex_spark.engine.function import fn
from cocoindex_spark.operators.entity_resolution import connected_components
from cocoindex_spark.operators.text_ops import hex_to_int, md5_hex
from cocoindex_spark.queries.dedup import _band_pairs, _simhash_index


@fn(memo=True)
def assign_split(df):
    """(doc_id, component_id) → leakage-safe split: hash the GROUP's
    canonical id, so every member of a dup-group lands together."""
    key = md5_hex(F.concat(F.lit("split:"), F.col("component_id").cast("string")))
    b = hex_to_int(key, 8) % 100
    split = F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    return df.select(
        "__args_fp",
        "__component_path",
        "doc_id",
        "component_id",
        split.alias("split"),
    )


@pytest.fixture()
def app(spark, tmp_state):
    a = App("curation", state_dir=tmp_state, spark=spark)
    yield a
    a.drop()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


BASE = "the quick brown fox jumps over the lazy dog again and again today"
OTHER = "completely unrelated corpus of words with nothing shared at all ever"


def _components(t, spark):
    idx = t.read(spark).select("doc_id", "simhash")
    nodes = idx.select("doc_id")
    edges = _band_pairs(idx).select("a_id", "b_id")
    return connected_components(nodes, edges, id_col="doc_id").select(
        F.col("id").alias("doc_id"), "component_id"
    )


def test_incremental_leakage_safe_splits(app, spark, tmp_state):
    sig_t = app.target(
        f"{tmp_state}/sig", ["doc_id"], "doc_id LONG, simhash LONG"
    )
    split_t = app.target(
        f"{tmp_state}/splits",
        ["doc_id"],
        "doc_id LONG, component_id LONG, split STRING",
    )

    src = _docs(spark, [(1, BASE), (2, BASE), (3, OTHER)])
    s1 = app.sync_table(src, ["doc_id"], _simhash_index, sig_t)
    assert s1.inserts == 3
    s2 = app.sync_table(_components(sig_t, spark), ["doc_id"], assign_split, split_t)
    assert s2.inserts == 3

    rows = {r.doc_id: r for r in split_t.read(spark).collect()}
    assert rows[1].component_id == rows[2].component_id == 1
    assert rows[3].component_id == 3
    assert rows[1].split == rows[2].split  # dup-group moves together

    # warm: both stages fully memoized, zero writes
    w1 = app.sync_table(src, ["doc_id"], _simhash_index, sig_t)
    w2 = app.sync_table(_components(sig_t, spark), ["doc_id"], assign_split, split_t)
    assert w1.memo_misses == 0 and w1.noops == 3
    assert w2.memo_misses == 0 and w2.noops == 3

    # edit: doc 3 becomes a near-dup of 1 — stage 1 recomputes exactly
    # doc 3's signature; stage 2 recomputes exactly doc 3's split row
    # (docs 1/2 keep component 1 → memo hits)
    src2 = _docs(spark, [(1, BASE), (2, BASE), (3, BASE)])
    e1 = app.sync_table(src2, ["doc_id"], _simhash_index, sig_t)
    assert e1.memo_misses == 1 and e1.updates == 1 and e1.noops == 2
    e2 = app.sync_table(_components(sig_t, spark), ["doc_id"], assign_split, split_t)
    assert e2.memo_misses == 1 and e2.updates == 1 and e2.noops == 2

    rows = {r.doc_id: r for r in split_t.read(spark).collect()}
    assert rows[1].component_id == rows[2].component_id == rows[3].component_id == 1
    assert len({rows[i].split for i in (1, 2, 3)}) == 1  # leak-free

    # delete doc 2: signature row and split row cascade out
    src3 = _docs(spark, [(1, BASE), (3, BASE)])
    d1 = app.sync_table(src3, ["doc_id"], _simhash_index, sig_t)
    assert d1.deletes == 1
    d2 = app.sync_table(_components(sig_t, spark), ["doc_id"], assign_split, split_t)
    assert d2.deletes == 1
    assert sorted(r.doc_id for r in split_t.read(spark).collect()) == [1, 3]
