"""FTS query pack: BM25 ranking from a real inverted index
(SURVEY.md §2.2 ``declare_fts_index`` — reference
python/cocoindex/connectors/lancedb/_target.py:1288,1337 builds a
tantivy index; here the index is the postings DataFrame of
operators/fts.py, and tests/test_fts_index_sync.py shows the same
table incrementally maintained by the sync engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cocoindex_spark.operators.fts import (
    bm25_join,
    build_postings,
    doc_lengths,
    sql_bm25,
    sql_tokens,
    tokens_col,
)
from cocoindex_spark.queries.registry import register, table


# --- q75: BM25 top-20 over the documents corpus, query = doc 0's
#     distinct tokens. Plan shape: postings pruned by a broadcast term
#     join BEFORE any aggregation; corpus stats are one broadcast row;
#     the per-doc score is an integer SUM of fixed-point per-term
#     scores (order-independent, engine-exact — see operators/fts.py).
@register(
    "q75_fts_bm25",
    oracle=f"""
WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id <> 0),
postings AS (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, UNNEST({sql_tokens("text")}) AS term FROM corpus)
  GROUP BY term, doc_id
),
doclens AS (
  SELECT doc_id, CAST(len({sql_tokens("text")}) AS BIGINT) AS dl FROM corpus
),
qt AS (
  SELECT DISTINCT UNNEST({sql_tokens("text")}) AS term
  FROM documents WHERE doc_id = 0
),
scored AS ({sql_bm25("doc_id")})
SELECT doc_id, bm25_int FROM scored
ORDER BY bm25_int DESC, doc_id ASC
LIMIT 20
""",
)
def q75_fts_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") != 0)
    postings = build_postings(corpus, "doc_id", "text")
    doclens = doc_lengths(corpus, "doc_id", "text")
    qt = (
        d.filter(F.col("doc_id") == 0)
        .select(F.explode(F.array_distinct(tokens_col(F.col("text")))).alias("term"))
    )
    scored = bm25_join(postings, doclens, qt, "doc_id")
    return scored.orderBy(F.desc("bm25_int"), F.asc("doc_id")).limit(20)
