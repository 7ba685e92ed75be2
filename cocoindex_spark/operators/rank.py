"""Distributed global ranking.

``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY funnels the
entire dataset through one task — correct at small scale, a
single-executor bottleneck at 100 TB. ``global_row_number`` computes
the identical numbering as a two-phase rank:

1. range-repartition by the sort key (a sampled range Exchange — the
   same machinery ``orderBy`` uses, so partitions are globally ordered
   and balanced),
2. ``row_number`` within each partition (parallel),
3. add each partition's starting offset — a prefix sum over the
   per-partition counts, which is at most ``n_parts`` rows and
   broadcast back.

The per-partition counts reuse the range Exchange (Spark dedupes the
identical subplan into a ReusedExchange), so upstream computation runs
once. The caller must include a unique tiebreaker in ``order_by`` for
a deterministic numbering — same requirement the global window had.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    out_col: str,
    n_parts: int = 32,
) -> DataFrame:
    """Add ``out_col`` = the 1-based global row number of ``df`` under
    ``order_by`` (list of ``F.asc``/``F.desc`` columns), computed
    without a single-partition Exchange."""
    dfp = df.repartitionByRange(n_parts, *order_by).withColumn(
        "__pid", F.spark_partition_id()
    )
    local = F.row_number().over(Window.partitionBy("__pid").orderBy(*order_by))
    counts = dfp.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    # Prefix-sum window over ≤ n_parts rows — trivially single-partition.
    # The explicit constant partitionBy keeps semantics identical while
    # silencing WindowExec's "no partition defined" warning (intentional
    # here: the input is bounded by n_parts).
    offsets = counts.select(
        "__pid",
        F.coalesce(
            F.sum("__cnt").over(
                Window.partitionBy(F.lit(0))
                .orderBy("__pid")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__off"),
    )
    return (
        dfp.withColumn("__rn", local)
        .join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__rn") + F.col("__off")).cast("long"))
        .drop("__pid", "__rn", "__off")
    )
