"""Sketch queries — mergeable cardinality/frequency estimation over
the documents corpus (operators/sketch.py). At 100 TB exact
countDistinct shuffles every distinct token; the HLL register table is
m rows per group and merges with MAX, the Count-Min table is d·w rows
total and merges with SUM — bounded state regardless of corpus size,
the property that makes them per-partition/per-sync mergeable.

Both estimators are integer-deterministic (md5-prefix hashes, bitlength
ranks, exact-BIGINT harmonic sums) so the estimates — not just the
exact counts — are value-oracled cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cocoindex_spark.operators.sketch import (
    cm_cells_from_counts,
    cm_lookup,
    hll_estimate,
    hll_registers,
    sql_cm_cells,
    sql_cm_probe_cells,
    sql_hll_estimate,
)
from cocoindex_spark.queries.registry import register, table

_TOKENS_SQL = (
    "(SELECT source, UNNEST(string_split(trim(text), ' ')) AS tok FROM documents)"
)


# --- q102: per-source distinct-token cardinality — exact vs HLL.
#     The exact side is the oracle-of-record; the HLL side is the
#     operator under test: ~6.5% standard error from 256 registers per
#     source, and at scale the register table is what ships between
#     stages (merge = MAX per register), not the token stream.
@register(
    "q102_hll_distinct",
    oracle=f"""
WITH hll AS ({sql_hll_estimate(_TOKENS_SQL, "source", "tok")}),
exact AS (
  SELECT source, CAST(COUNT(DISTINCT tok) AS BIGINT) AS exact_distinct
  FROM {_TOKENS_SQL} GROUP BY source
)
SELECT e.source, e.exact_distinct, h.hll_estimate
FROM exact e JOIN hll h ON e.source = h.source
""",
)
def q102_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    )
    regs = hll_registers(toks, ["source"], "tok")
    est = hll_estimate(regs, ["source"])
    exact = toks.groupBy("source").agg(
        F.countDistinct("tok").alias("exact_distinct")
    )
    return exact.join(est, "source").select(
        "source", "exact_distinct", "hll_estimate"
    )


# --- q103: heavy hitters via Count-Min — the exact top-20 tokens with
#     their sketch estimates (cm_estimate ≥ exact by construction; the
#     gap is the sketch's collision overcount). The probe side is
#     d·20 cells broadcast onto the bounded (d·w)-row sketch — the
#     corpus is scanned once to build the sketch and never again.
@register(
    "q103_countmin_heavy_hitters",
    oracle=f"""
WITH toks AS (SELECT tok FROM {_TOKENS_SQL}),
sketch AS ({sql_cm_cells("toks", "tok")}),
top AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_n
  FROM toks GROUP BY tok
  ORDER BY exact_n DESC, tok LIMIT 20
),
cells AS ({sql_cm_probe_cells("top", "tok")}),
est AS (
  SELECT c.tok, CAST(MIN(s.n) AS BIGINT) AS cm_estimate
  FROM cells c JOIN sketch s ON c.row = s.row AND c.cell = s.cell
  GROUP BY c.tok
)
SELECT t.tok, t.exact_n, e.cm_estimate
FROM top t JOIN est e ON t.tok = e.tok
""",
)
def q103_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok"))
    # Single corpus pass: the per-token count table feeds BOTH the
    # exact top-20 and the sketch (cell-identical to hashing every
    # occurrence, but md5 runs once per distinct token, spread across
    # the count shuffle's partitions — not once per occurrence on the
    # raw scan's input split, which for a small parquet is ONE task).
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    sketch = cm_cells_from_counts(counts, "tok", "cnt")
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("tok"))
        .limit(20)
        .select("tok", F.col("cnt").alias("exact_n"))
    )
    est = cm_lookup(sketch, top.select("tok"), "tok")
    return top.join(est, "tok").select("tok", "exact_n", "cm_estimate")
