"""Near-dup detection maintained by the sync engine: the MinHash band
table is itself a sync target, so a document edit recomputes exactly
that document's band rows, and the pair query over the maintained
table reflects the change — the incremental form of q32."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cocoindex_spark.engine.app import App
from cocoindex_spark.engine.function import fn
from cocoindex_spark.operators.text_ops import hex_to_int, md5_hex, shingles_expr

_P = (1 << 61) - 1


def _band_cols():
    # 4 minhash values folded into 2 bands of 2 (tiny but same shape
    # as q32's signature → bands → bucket-join pipeline)
    base = hex_to_int(md5_hex(F.col("g")), 12)
    return [
        F.min((F.lit(37 + 8 * s) * base + F.lit(1013904223 * (s + 1))) % F.lit(_P)).alias(
            f"h{s}"
        )
        for s in range(4)
    ]


@fn(memo=True)
def band_keys(df):
    sh = df.select(
        "__args_fp", "__component_path", "doc_id", F.explode(shingles_expr("text", 2)).alias("g")
    )
    sig = sh.groupBy("__args_fp", "__component_path", "doc_id").agg(*_band_cols())
    return sig.select(
        "__args_fp",
        "__component_path",
        "doc_id",
        F.concat_ws("#", "h0", "h1").alias("band0"),
        F.concat_ws("#", "h2", "h3").alias("band1"),
    )


@pytest.fixture()
def app(spark, tmp_state):
    a = App("dedup_idx", state_dir=tmp_state, spark=spark)
    yield a
    a.drop()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _pairs(t, spark):
    """Band-bucket candidate pairs from the maintained table."""
    idx = t.read(spark)
    bands = idx.select("doc_id", F.col("band0").alias("bk")).unionByName(
        idx.select("doc_id", F.col("band1").alias("bk"))
    )
    a = bands.select(F.col("doc_id").alias("a_id"), "bk")
    b = bands.select(F.col("doc_id").alias("b_id"), "bk")
    return {
        (r["a_id"], r["b_id"])
        for r in a.join(b, "bk").filter(F.col("a_id") < F.col("b_id")).distinct().collect()
    }


def test_band_table_incremental_pairs(app, spark, tmp_state):
    t = app.target(
        f"{tmp_state}/bands",
        ["doc_id"],
        "doc_id LONG, band0 STRING, band1 STRING",
    )
    src = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here now"),
        ],
    )
    cold = app.sync_table(src, ["doc_id"], band_keys, t)
    assert cold.inserts == 3 and cold.memo_misses == 3
    p0 = _pairs(t, spark)
    assert (1, 2) in p0  # near-identical docs share a band
    assert (1, 3) not in p0 and (2, 3) not in p0

    # warm: nothing recomputes, pairs stable
    warm = app.sync_table(src, ["doc_id"], band_keys, t)
    assert warm.memo_misses == 0 and warm.noops == 3
    assert _pairs(t, spark) == p0

    # edit doc 2 to be unrelated: exactly one recompute, pair dissolves
    src2 = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "unrelated rewritten content with nothing shared"),
            (3, "completely different words entirely here now"),
        ],
    )
    edit = app.sync_table(src2, ["doc_id"], band_keys, t)
    assert edit.memo_misses == 1 and edit.updates == 1 and edit.noops == 2
    p1 = _pairs(t, spark)
    assert (1, 2) not in p1

    # delete doc 3: cascade removes its band rows
    src3 = src2.filter(F.col("doc_id") != 3)
    dele = app.sync_table(src3, ["doc_id"], band_keys, t)
    assert dele.deletes == 1 and dele.memo_misses == 0
    assert {r["doc_id"] for r in t.read(spark).collect()} == {1, 2}
