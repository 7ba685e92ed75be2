"""The wide-SimHash pair relation maintained by the sync engine
(queries/dedup.py q99 machinery): the per-doc signature table is a sync
target, so one document edit recomputes exactly that document's
signature row (memoized — blast radius 1), and the band-join pair view
over the maintained table reflects the change incrementally."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cocoindex_spark.engine.app import App
from cocoindex_spark.queries.dedup import _band_pairs, _simhash_index


@pytest.fixture()
def app(spark, tmp_state):
    a = App("pair_rel", state_dir=tmp_state, spark=spark)
    yield a
    a.drop()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _pairs(t, spark):
    idx = t.read(spark).select("doc_id", "simhash")
    return {
        (r["a_id"], r["b_id"]) for r in _band_pairs(idx).collect()
    }


BASE = "the quick brown fox jumps over the lazy dog again and again today"


def test_pair_relation_incremental(app, spark, tmp_state):
    t = app.target(
        f"{tmp_state}/simhash_idx", ["doc_id"], "doc_id LONG, simhash LONG"
    )
    src = _docs(
        spark,
        [
            (1, BASE),
            (2, BASE),  # identical token set → hamming 0 (deterministic pair)
            (3, "completely unrelated corpus of words with nothing shared at all ever"),
        ],
    )
    cold = app.sync_table(src, ["doc_id"], _simhash_index, t)
    assert cold.inserts == 3 and cold.memo_misses == 3
    p0 = _pairs(t, spark)
    assert (1, 2) in p0
    assert (1, 3) not in p0 and (2, 3) not in p0

    # warm: zero recomputes, relation stable
    warm = app.sync_table(src, ["doc_id"], _simhash_index, t)
    assert warm.memo_misses == 0 and warm.noops == 3
    assert _pairs(t, spark) == p0

    # edit doc 2 to be unrelated: blast radius is exactly doc 2 — one
    # memo miss, one target-row update (its band buckets), others noop
    src2 = _docs(
        spark,
        [
            (1, BASE),
            (2, "rewritten unrelated text sharing no vocabulary with anything else now"),
            (3, "completely unrelated corpus of words with nothing shared at all ever"),
        ],
    )
    edit = app.sync_table(src2, ["doc_id"], _simhash_index, t)
    assert edit.memo_misses == 1 and edit.updates == 1 and edit.noops == 2
    p1 = _pairs(t, spark)
    assert (1, 2) not in p1

    # delete doc 1: cascade removes its signature row from the index
    src3 = src2.filter(F.col("doc_id") != 1)
    dele = app.sync_table(src3, ["doc_id"], _simhash_index, t)
    assert dele.deletes == 1 and dele.memo_misses == 0
    assert {r["doc_id"] for r in t.read(spark).collect()} == {2, 3}


def test_retention_pipeline_reads_maintained_index(app, spark, tmp_state):
    """End-to-end retention scenario: the drop decision reads the
    ENGINE-MAINTAINED signature index (never re-shingles the corpus);
    an edit flows through one signature row and flips the decision."""
    from pyspark.sql import functions as F

    from cocoindex_spark.queries.dedup import retention_drops

    t = app.target(
        f"{tmp_state}/ret_idx", ["doc_id"], "doc_id LONG, simhash LONG"
    )
    docs = [
        (1, BASE),
        (2, BASE),  # exact near-dup of 1: equal tokens → doc 2 dropped
        (3, "completely unrelated corpus of words with nothing shared at all ever"),
    ]
    src = _docs(spark, docs)
    app.sync_table(src, ["doc_id"], _simhash_index, t)

    def drops():
        pairs = _band_pairs(t.read(spark).select("doc_id", "simhash")).select(
            "a_id", "b_id"
        )
        qual = src.select(
            "doc_id",
            F.size(F.split(F.trim(F.col("text")), " ")).cast("long").alias("n_tokens"),
        )
        return {
            (r["doc_id"], r["kept_by"]) for r in retention_drops(pairs, qual).collect()
        }

    # equal token counts → the lower doc_id dominates: 2 dropped, kept by 1
    assert drops() == {(2, 1)}

    # edit doc 2 away from doc 1: one signature row recomputes, the
    # pair dissolves, nothing is dropped any more
    src = _docs(
        spark,
        [
            (1, BASE),
            (2, "rewritten unrelated text sharing no vocabulary with anything else now"),
            (3, "completely unrelated corpus of words with nothing shared at all ever"),
        ],
    )
    edit = app.sync_table(src, ["doc_id"], _simhash_index, t)
    assert edit.memo_misses == 1 and edit.updates == 1
    assert drops() == set()
