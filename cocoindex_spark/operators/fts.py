"""Full-text search: a real inverted index (postings table) plus an
integer-exact BM25 ranker.

The reference accepts ``declare_fts_index`` and builds a tantivy-backed
inverted index inside LanceDB (python/cocoindex/connectors/lancedb/
_target.py:1288,1337). The Spark-native shape is a *postings
DataFrame* — ``(term, id, tf)`` with per-doc lengths — built by
explode + groupBy (two narrow shuffles), maintained incrementally by
the same sync machinery as any other target (see
tests/test_fts_index_sync.py), and queried by an equi-join on term.
At 100 TB the postings join touches only the query's terms (broadcast
of a tiny term list, partition-pruned by the term key), never the
corpus's token arrays.

Cross-engine exactness: BM25's floats go through the repo's
fixed-point discipline (operators/vector_ops.py pattern). The usual
``ln``-based idf is NOT portable — neither engine promises correctly
rounded transcendentals — so the ranker uses the raw idf odds ratio
``(N - df + 0.5) / (df + 0.5)`` (IEEE ops, correctly rounded
everywhere) times the standard BM25 tf saturation
``tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``. Each per-term score is
quantized to BIGINT (×2^20, floor) and SUMmed as integers — sum order
cannot change the result, so Spark and DuckDB hash identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tokenization matches q63's lexical path: trim, split on single
# space. Empty tokens (from double spaces) are dropped.
_BM25_SCALE = 1 << 20


def tokens_col(text: Column) -> Column:
    """ARRAY<STRING> of non-empty whitespace tokens (single-space
    split, trim — the q63 contract)."""
    return F.filter(F.split(F.trim(text), " "), lambda t: t != "")


def sql_tokens(text_expr: str) -> str:
    """DuckDB mirror of ``tokens_col``."""
    return f"list_filter(string_split(trim({text_expr}), ' '), t -> t <> '')"


def build_postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Inverted index rows: (term, {id_col}, tf) — one explode + one
    groupBy, the map-side-combinable shape."""
    return (
        df.select(F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, dl) token counts per document."""
    return df.select(
        F.col(id_col), F.size(tokens_col(F.col(text_col))).cast("long").alias("dl")
    )


def bm25_join(
    postings: DataFrame,
    doclens: DataFrame,
    query_terms: DataFrame,
    id_col: str,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, bm25_int) — integer BM25 score per document for the given
    query term set.

    ``query_terms``: one-column (term) DataFrame, assumed tiny — it is
    broadcast, so the postings side is pruned on the term equi-join
    BEFORE any aggregation; per-term document frequency is computed on
    the pruned subset (identical value — all of a term's postings
    survive the prune). Corpus stats (N, Σdl) come from one aggregate
    over the doc-length table, carried as a broadcast single row.

    Every per-term double is a fixed sequence of correctly-rounded IEEE
    ops on integers, floored to BIGINT at 2^20; the per-doc SUM is pure
    integer arithmetic — bit-identical across engines regardless of
    aggregation order.
    """
    qp = postings.join(F.broadcast(query_terms.select("term")), "term")
    dfq = qp.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    stats = doclens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    scored = (
        qp.join(F.broadcast(dfq), "term")
        .join(doclens, id_col)
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    tfc = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
    )
    term_score = F.floor(idf * tfc * F.lit(float(_BM25_SCALE))).cast("long")
    return scored.groupBy(id_col).agg(F.sum(term_score).alias("bm25_int"))


def sql_bm25(
    id_col: str,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB mirror of ``bm25_join`` as a SELECT over three expected
    CTE names — ``postings(term, {id}, tf)``, ``doclens({id}, dl)``,
    ``qt(term)`` — with the arithmetic expression tree kept shape-
    identical to the Spark column tree so every intermediate double
    matches bit-for-bit."""
    avgdl = "(CAST(st.sum_dl AS DOUBLE) / st.n_docs)"
    idf = "((CAST(st.n_docs AS DOUBLE) - dfq.df + 0.5) / (dfq.df + 0.5))"
    tfc = (
        f"((p.tf * {k1 + 1.0!r}) / "
        f"(p.tf + {k1!r} * ({1.0 - b!r} + {b!r} * d.dl / {avgdl})))"
    )
    return f"""
SELECT p.{id_col} AS {id_col},
       CAST(SUM(CAST(floor({idf} * {tfc} * {float(_BM25_SCALE)!r}) AS BIGINT)) AS BIGINT) AS bm25_int
FROM postings p
JOIN qt ON p.term = qt.term
JOIN (
  SELECT pp.term, COUNT(DISTINCT pp.{id_col}) AS df
  FROM postings pp JOIN qt ON pp.term = qt.term
  GROUP BY pp.term
) dfq ON p.term = dfq.term
JOIN doclens d ON p.{id_col} = d.{id_col}
CROSS JOIN (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM doclens) st
GROUP BY p.{id_col}
"""
