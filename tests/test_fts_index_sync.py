"""FTS inverted index maintained by the reconcile machinery — the
``declare_fts_index`` analog made real (reference
python/cocoindex/connectors/lancedb/_target.py:1288,1337): the per-doc
postings row is a sync target, a document edit re-tokenizes exactly
that document, and BM25 queries read the maintained table (same
pattern as the LSH table in test_vector_index_sync.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cocoindex_spark.engine.app import App
from cocoindex_spark.engine.function import fn
from cocoindex_spark.operators.fts import bm25_join, tokens_col


_TOKS = "filter(split(trim(text), ' '), t -> t != '')"


@fn(memo=True)
def tokenize_doc(df):
    toks = tokens_col(F.col("text"))
    return df.select(
        "__args_fp",
        "__component_path",
        "doc_id",
        F.expr(
            f"transform(array_distinct({_TOKS}), t -> struct("
            f"t AS term, CAST(size(filter({_TOKS}, x -> x = t)) AS BIGINT) AS tf))"
        ).alias("postings"),
        F.size(toks).cast("long").alias("dl"),
    )


@pytest.fixture()
def app(spark, tmp_state):
    a = App("ftsidx", state_dir=tmp_state, spark=spark)
    yield a
    a.drop()


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_fts_postings_incremental_and_queryable(app, spark, tmp_state):
    t = app.target(
        f"{tmp_state}/fts",
        ["doc_id"],
        "doc_id LONG, postings ARRAY<STRUCT<term STRING, tf BIGINT>>, dl LONG",
    )
    t.declare_index("fts", "text")

    src = _docs(
        spark,
        [
            (1, "spark shuffles data across the cluster"),
            (2, "spark broadcasts small tables"),
            (3, "ducks swim in the pond"),
        ],
    )
    cold = app.sync_table(src, ["doc_id"], tokenize_doc, t)
    assert cold.inserts == 3
    assert [i["kind"] for i in t.indexes()] == ["fts"]

    # incremental: one document edited ⇒ one recompute, one row rewritten
    src2 = _docs(
        spark,
        [
            (1, "spark shuffles data across the cluster"),
            (2, "flink broadcasts small tables"),  # spark -> flink
            (3, "ducks swim in the pond"),
        ],
    )
    edit = app.sync_table(src2, ["doc_id"], tokenize_doc, t)
    assert edit.memo_misses == 1 and edit.updates == 1 and edit.noops == 2

    # query path: BM25 from the MAINTAINED table (explode the per-doc
    # postings back into the (term, doc_id, tf) index shape)
    idx = t.read(spark)
    postings = idx.select(
        "doc_id", F.explode("postings").alias("p")
    ).select(F.col("p.term").alias("term"), "doc_id", F.col("p.tf").alias("tf"))
    doclens = idx.select("doc_id", "dl")
    qt = spark.createDataFrame([("spark",), ("cluster",)], "term STRING")
    scored = bm25_join(postings, doclens, qt, "doc_id").orderBy(
        F.desc("bm25_int"), "doc_id"
    )
    rows = scored.collect()
    # after the edit only doc 1 contains "spark"; it also has "cluster"
    assert [r["doc_id"] for r in rows] == [1]


def test_term_keyed_postings_probe_pruned(app, spark, tmp_state):
    """q155's target shape: term-keyed postings rows with the __probe
    layout on term — one edited doc re-syncs only its rows (blast
    radius 1), and a term probe reads fewer files than the full scan."""
    from pyspark.sql import functions as F

    from cocoindex_spark.queries.ftsq import sync_fts_index
    from cocoindex_spark.state.store import _PROBE_COL
    from test_probe_layout import files_read

    docs = _docs(
        spark,
        [
            (1, "spark shuffles data across the cluster"),
            (2, "spark broadcasts small tables"),
            (3, "ducks swim in the pond"),
        ],
    )
    target, cold = sync_fts_index(app, docs)
    assert cold.memo_misses == 3

    # edit one doc: exactly one recompute; its postings rows converge
    docs2 = _docs(
        spark,
        [
            (1, "spark shuffles data across the cluster"),
            (2, "flink broadcasts small tables"),
            (3, "ducks swim in the pond"),
        ],
    )
    _, edit = sync_fts_index(app, docs2)
    assert edit.memo_misses == 1
    terms = {
        r["term"] for r in target.read(spark).filter(F.col("doc_id") == 2).collect()
    }
    assert "flink" in terms and "spark" not in terms

    # seek-shaped probe: the 'spark' partition reads fewer files
    pids = target.probe_partitions(spark, ["spark"])
    probed = (
        target.read_indexed(spark)
        .filter(F.col(_PROBE_COL).isin(pids))
        .filter(F.col("term") == "spark")
    )
    assert {r["doc_id"] for r in probed.collect()} == {1}
    assert files_read(probed) < files_read(target.read(spark))


def test_fts_live_maintenance(app, spark, tmp_state):
    """The synced FTS index maintained through the LIVE path
    (streaming/live.py): a watched-file edit re-syncs EXACTLY the
    edited document's term rows (blast radius 1), the probe layout
    stays live across micro-batches, and the probe answer matches a
    from-scratch BM25 over the current corpus (q155's oracle shape).
    Reference: live_mode.mdx 'write once, choose at run time' — the
    same tokenize_postings transform drives batch sync_fts_index and
    this stream."""
    import os

    from cocoindex_spark.operators.fts import bm25_join
    from cocoindex_spark.queries.ftsq import tokenize_postings
    from cocoindex_spark.state.store import _PROBE_COL
    from cocoindex_spark.streaming.live import LiveSync

    target = app.target(
        f"{tmp_state}/postings",
        ["doc_id", "term"],
        "doc_id LONG, term STRING, tf LONG, dl LONG",
    )
    target.declare_index("fts", "text", probe_col="term")

    src_dir = os.path.join(tmp_state, "docs_src")
    ckpt = os.path.join(tmp_state, "fts_ckpt")
    os.makedirs(src_dir)
    schema = "doc_id LONG, text STRING, offset LONG"
    spark.createDataFrame(
        [
            (1, "spark shuffles data across the cluster", 1),
            (2, "spark broadcasts small tables", 2),
            (3, "ducks swim in the pond", 3),
        ],
        schema,
    ).write.mode("overwrite").parquet(os.path.join(src_dir, "b1"))

    sync = LiveSync(app, ["doc_id"], tokenize_postings, target, order_cols=["offset"])
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    q = sync.start(stream, ckpt, available_now=True)
    q.awaitTermination(120)
    assert sync.batch_stats[-1].memo_misses == 3

    # watched-file edit: doc 2 swaps spark -> flink
    spark.createDataFrame(
        [(2, "flink broadcasts small tables", 4)], schema
    ).write.mode("overwrite").parquet(os.path.join(src_dir, "b2"))
    q2 = sync.start(stream, ckpt, available_now=True)
    q2.awaitTermination(120)

    # blast radius 1: only the edited doc recomputed, siblings untouched
    edit = sync.batch_stats[-1]
    assert edit.memo_misses == 1
    terms2 = {
        r["term"] for r in target.read(spark).filter(F.col("doc_id") == 2).collect()
    }
    assert "flink" in terms2 and "spark" not in terms2

    # probe-answer parity with a from-scratch BM25 over the CURRENT
    # corpus: the probe reads only the query terms' __probe dirs
    current = _docs(
        spark,
        [
            (1, "spark shuffles data across the cluster"),
            (2, "flink broadcasts small tables"),
            (3, "ducks swim in the pond"),
        ],
    )
    qt = spark.createDataFrame([("spark",), ("tables",)], "term STRING")
    fresh_postings = current.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(array_distinct({_TOKS}), t -> struct("
                f"t AS term, CAST(size(filter({_TOKS}, x -> x = t)) AS BIGINT) AS tf))"
            )
        ).alias("p"),
    ).select(F.col("p.term").alias("term"), "doc_id", F.col("p.tf").alias("tf"))
    fresh_dl = current.select(
        "doc_id", F.size(tokens_col(F.col("text"))).cast("long").alias("dl")
    )
    want = {
        (r["doc_id"], r["bm25_int"])
        for r in bm25_join(fresh_postings, fresh_dl, qt, "doc_id").collect()
    }

    pids = target.probe_partitions(spark, ["spark", "tables"])
    probed = (
        target.read_indexed(spark)
        .filter(F.col(_PROBE_COL).isin(pids))
        .filter(F.col("term").isin("spark", "tables"))
    )
    live_postings = probed.select("term", "doc_id", "tf")
    live_dl = target.read(spark).select("doc_id", "dl").distinct()
    got = {
        (r["doc_id"], r["bm25_int"])
        for r in bm25_join(live_postings, live_dl, qt, "doc_id").collect()
    }
    assert got == want

    # the probe still prunes file I/O after live micro-batches
    from test_probe_layout import files_read

    assert files_read(probed) < files_read(target.read(spark))
