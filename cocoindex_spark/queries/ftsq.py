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


# --- q90: phrase search — the positional-index extension of q75. The
#     query phrase is doc 0's first two tokens; a doc matches when the
#     two tokens appear ADJACENT (over the empty-filtered token
#     sequence, both engines). Spark side is the index-backed plan a
#     positional inverted index executes: the (doc, pos, term) posting
#     rows are pruned to the two broadcast query terms BEFORE any join,
#     then adjacency is a pure equi-join on (doc_id, pos+1) — never an
#     array scan of the corpus. The oracle is the naive per-doc array
#     scan (same result, quadratic-free either way). Occurrence counts
#     are integers; no floats anywhere.
@register(
    "q90_phrase_search",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {sql_tokens("text")} AS w FROM documents
),
q AS (SELECT w[1] AS t1, w[2] AS t2 FROM toks WHERE doc_id = 0)
SELECT t.doc_id,
  CAST(list_sum(list_transform(range(1, len(t.w)), i ->
    CASE WHEN t.w[i] = q.t1 AND t.w[i+1] = q.t2 THEN 1 ELSE 0 END
  )) AS BIGINT) AS n_occ
FROM toks t, q
WHERE t.doc_id <> 0
  AND CAST(list_sum(list_transform(range(1, len(t.w)), i ->
    CASE WHEN t.w[i] = q.t1 AND t.w[i+1] = q.t2 THEN 1 ELSE 0 END
  )) AS BIGINT) > 0
""",
)
def q90_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    q = d.filter(F.col("doc_id") == 0).select(
        F.element_at(tokens_col(F.col("text")), 1).alias("t1"),
        F.element_at(tokens_col(F.col("text")), 2).alias("t2"),
    )
    pos = d.filter(F.col("doc_id") != 0).select(
        "doc_id", F.posexplode(tokens_col(F.col("text"))).alias("pos", "term")
    )
    withq = pos.crossJoin(F.broadcast(q))
    p1 = withq.filter(F.col("term") == F.col("t1")).select(
        "doc_id", (F.col("pos") + 1).alias("p2")
    )
    p2 = withq.filter(F.col("term") == F.col("t2")).select(
        "doc_id", F.col("pos").alias("p2")
    )
    return (
        p1.join(p2, ["doc_id", "p2"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
