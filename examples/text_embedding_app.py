"""Text-embedding quickstart app — the Spark-first restatement of the
reference's canonical pipeline (examples/text_embedding/main.py:
walk_dir → split → embed → vector table with a similarity index):

    documents → 32-word overlapping chunks → feature-hash embedding
    → LSH-bucketed vector table maintained incrementally.

The pipeline itself lives in `cocoindex_spark.queries.quickstart` —
the SAME transform and sync this app runs is registered as the
value-oracled query `q137_quickstart_topk`, so the example can never
drift from the verified flow.

Run it with the CLI (re-running is incremental — unchanged documents
replay memoized chunks and the sync is all no-ops):

    python -m cocoindex_spark.cli update examples/text_embedding_app.py
    python -m cocoindex_spark.cli show   examples/text_embedding_app.py
    python -m cocoindex_spark.cli drop   examples/text_embedding_app.py
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cocoindex_spark.operators.vector_ops import cosine_fixed
from cocoindex_spark.queries.quickstart import (
    LSH_BITS,
    sync_quickstart_table,
)

APP_NAME = "text_embedding_example"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def app_main(app):
    spark = app.spark
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    target, stats = sync_quickstart_table(app, docs)

    # Query the maintained table: bucket-pruned cosine top-3 for the
    # first document's first chunk as the probe (the same question
    # q137_quickstart_topk value-oracles at sf0.01).
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
