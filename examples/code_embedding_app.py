"""Code-embedding app — the Spark-first restatement of the reference's
`examples/code_embedding/main.py` (walk codebase → detect language →
tree-sitter-aware recursive chunks → embed → vector table):

    synthetic code files (path + source text, four languages) →
    `detect_code_language` on the path → structure-exact recursive
    chunking for that language (AST for python, lexer-exact brace
    boundaries for rust/js, markdown sections for .md) → feature-hash
    embedding per chunk → engine-maintained vector table keyed by
    (path, chunk_idx). Re-running is incremental: unchanged files
    replay their chunks from the memo, the sync is all no-ops.

    python -m cocoindex_spark.cli update examples/code_embedding_app.py
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cocoindex_spark.engine.function import fn
from cocoindex_spark.operators.code_ops import detect_code_language
from cocoindex_spark.operators.split import explode_chunks
from cocoindex_spark.queries.quickstart import EMB_DIM, LSH_BITS

APP_NAME = "code_embedding_example"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

CHUNK_CHARS = 120

_EXT = {0: "py", 1: "rs", 2: "js", 3: "md"}


def _synthetic_code(docs):
    """Deterministic per-doc source files in four languages (doc text
    is a word stream; real repos arrive via sources/localfs.walk_dir —
    same columns, so the pipeline below is unchanged)."""
    sid = F.col("doc_id").cast("string")
    ext = F.element_at(
        F.array(*[F.lit(e) for e in _EXT.values()]),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    body = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("def fa"), sid, F.lit("():\n    return 1\n\n"),
                F.lit("def fb"), sid, F.lit("():\n    s = \"def fake(): pass\"\n    return s\n"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit("fn ra"), sid, F.lit("() -> u64 { 1 }\n\n"),
                F.lit("fn rb"), sid, F.lit("() -> u64 { let s = \"fn decoy() {}\"; 2 }\n"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(
                F.lit("function ja"), sid, F.lit("() { return 1; }\n\n"),
                F.lit("function jb"), sid, F.lit("() { const s = `function decoy() {}`; }\n"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("# Title "), sid, F.lit("\nintro words\n\n## Section\nbody text\n"),
            )
        )
    )
    return docs.select(
        F.concat(F.lit("repo/src/f"), sid, F.lit("."), ext).alias("path"),
        body.alias("content"),
    )


@fn(memo=True)
def chunk_and_embed_code(df):
    """file → language → structure-exact chunks → hash embeddings."""
    lang = detect_code_language(F.col("path"))
    langed = df.withColumn("language", lang)
    out = []
    # chunk per detected language so each file gets ITS grammar's
    # boundaries (the reference passes `language=file.extension` into
    # SplitRecursively the same way)
    for lg in ("python", "rust", "javascript", "markdown"):
        sub = langed.filter(F.col("language") == lg)
        chunked = explode_chunks(
            sub, "content", mode="recursive", chunk_size=CHUNK_CHARS, language=lg
        )
        out.append(chunked)
    allc = out[0]
    for part in out[1:]:
        allc = allc.unionByName(part)
    pairs = F.expr(
        "transform("
        "  transform(split(chunk_text, ' '),"
        "            t -> conv(substring(md5(encode(t, 'UTF-8')), 1, 9), 16, 10)),"
        "  h -> struct(CAST(CAST(h AS BIGINT) div 16 % " + str(EMB_DIM) + " AS INT) AS b,"
        "              CASE WHEN CAST(h AS BIGINT) % 2 = 0 THEN CAST(1.0 AS DOUBLE)"
        "                   ELSE CAST(-1.0 AS DOUBLE) END AS s))"
    )

    def _sum_dim(i: int):
        return lambda acc, p: acc + F.when(p["b"] == i, p["s"]).otherwise(F.lit(0.0))

    emb = F.array(
        *[
            F.aggregate(pairs, F.lit(0.0), _sum_dim(i)).cast("float")
            for i in range(EMB_DIM)
        ]
    )
    return allc.select(
        "__args_fp",
        "__component_path",
        "path",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "language",
        "chunk_text",
        emb.alias("embedding"),
    )


def app_main(app):
    spark = app.spark
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id"
    )
    files = _synthetic_code(docs)
    target = app.target(
        os.path.join(app.state.root, "targets", "code_chunks"),
        ["path", "chunk_idx"],
        "path STRING, chunk_idx LONG, language STRING, chunk_text STRING, "
        "embedding ARRAY<FLOAT>",
    )
    target.declare_index("lsh", "embedding", bits=LSH_BITS)
    stats = app.sync_table(files, ["path"], chunk_and_embed_code, target)
    idx = target.read(spark)
    per_lang = {
        r["language"]: r["n"]
        for r in idx.groupBy("language").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return {
        "chunks_tracked": int(idx.count()),
        # comma-joined: the CLI's JSON summary keeps scalar values only
        "languages": ",".join(sorted(per_lang)),
        "memo_misses": stats.memo_misses,
        "noops": stats.noops,
    }
