"""Text-embedding quickstart app — the Spark-first restatement of the
reference's canonical pipeline (examples/text_embedding/main.py:
walk_dir → split → embed → vector table with a similarity index):

    documents → 32-word overlapping chunks → feature-hash embedding
    → LSH-bucketed vector table maintained incrementally.

Run it with the CLI (re-running is incremental — unchanged documents
replay memoized chunks and the sync is all no-ops):

    python -m cocoindex_spark.cli update examples/text_embedding_app.py
    python -m cocoindex_spark.cli show   examples/text_embedding_app.py
    python -m cocoindex_spark.cli drop   examples/text_embedding_app.py
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cocoindex_spark.engine.function import fn
from cocoindex_spark.operators.embed import hash_embed_expr
from cocoindex_spark.operators.vector_ops import cosine_fixed, sign_bucket

APP_NAME = "text_embedding_example"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

CHUNK = 32
STRIDE = 24
EMB_DIM = 16
LSH_BITS = 4


@fn(memo=True)
def chunk_and_embed(df):
    """doc → chunks → embeddings, one output row per chunk (the memo
    key is the whole document: an edited doc re-embeds its chunks, an
    untouched one replays them)."""
    w = F.split(F.trim(F.col("text")), " ")
    n = F.size(w)
    extra = F.greatest(n - F.lit(CHUNK), F.lit(0))
    n_chunks = (
        F.floor(extra.cast("double") / F.lit(STRIDE)).cast("long")
        + F.when(extra % STRIDE > 0, 1).otherwise(0)
        + 1
    )
    chunks = df.select(
        "__args_fp",
        "__component_path",
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.concat_ws(" ", F.slice(w, i * STRIDE + 1, CHUNK)),
            )
        ).alias("chunk_idx", "chunk_text"),
    ).filter(F.length("chunk_text") > 0)
    toks = F.split(F.col("chunk_text"), " ")
    emb = hash_embed_expr(toks, EMB_DIM)
    return chunks.select(
        "__args_fp",
        "__component_path",
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk_text",
        emb.alias("embedding"),
        sign_bucket(emb, LSH_BITS).cast("int").alias("bucket"),
    )


def app_main(app):
    spark = app.spark
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    state_root = app.state.root
    target = app.target(
        os.path.join(state_root, "targets", "chunks"),
        ["doc_id", "chunk_idx"],
        "doc_id LONG, chunk_idx LONG, chunk_text STRING, "
        "embedding ARRAY<FLOAT>, bucket INT",
    )
    target.declare_index("lsh", "embedding", bits=LSH_BITS)
    stats = app.sync_table(docs, ["doc_id"], chunk_and_embed, target)

    # Query the maintained table: bucket-pruned cosine top-3 for the
    # first document's first chunk as the probe.
    idx = target.read(spark)
    probe = idx.orderBy("doc_id", "chunk_idx").limit(1).select(
        F.col("embedding").alias("q"), F.col("bucket").alias("qb")
    )
    hits = (
        idx.join(F.broadcast(probe), idx.bucket == F.col("qb"))
        .withColumn("sim", cosine_fixed(F.col("embedding"), F.col("q")))
        .orderBy(F.desc("sim"), "doc_id", "chunk_idx")
        .limit(3)
        .collect()
    )
    return {
        "chunks_tracked": int(idx.count()),
        "memo_hits": stats.memo_hits,
        "memo_misses": stats.memo_misses,
        "inserts": stats.inserts,
        "noops": stats.noops,
        "top_hit_doc": int(hits[0]["doc_id"]) if hits else -1,
    }
