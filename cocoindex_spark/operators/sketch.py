"""Mergeable sketches — the cardinality/frequency primitives of a
100 TB pipeline: HyperLogLog registers (distinct counts that merge
across partitions/syncs with MAX) and Count-Min cells (frequency
estimates that merge with SUM). Reference analog: the stats rollups a
curation run reports (SURVEY §2.6); at cluster scale the sketch IS the
only way to keep per-partition state mergeable and bounded.

Built integer-deterministic so the sketches are cross-engine
ORACLE-ABLE (the repo's correctness standard): hashes are md5-prefix
BIGINTs, register ranks are ``41 - bitlength`` integers, and the HLL
harmonic sum is computed as an exact BIGINT (``Σ 2^(maxM − M_j)``,
bounded by m·2^41 < 2^50) — the single float is one literal-constant
multiply + one IEEE division of exact integers, bit-identical in Spark
and DuckDB. No small-range linear-counting correction (it needs ln);
this is the RAW HLL estimator, and the oracle computes the identical
formula, so parity is exact regardless of estimator accuracy.

Plan shape (both sketches): one token explode → one hash groupBy —
partial aggregation map-side, register/cell space bounded (m, d×w)
per group regardless of data size. Estimation joins probe only the
sketch table, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cocoindex_spark.operators.text_ops import (
    hex_to_int,
    md5_hex,
    sql_hex_to_int,
)

HLL_M = 256  # registers (b=8); standard error ≈ 1.04/√m ≈ 6.5%
_HLL_W_BITS = 40  # 48-bit hash minus 8 index bits
# alpha_m · m² for m=256, embedded as ONE decimal literal in both
# engines so the parsed double is identical.
HLL_ALPHA_M2 = repr(0.7213 / (1 + 1.079 / HLL_M) * HLL_M * HLL_M)

CM_DEPTH = 4
CM_WIDTH = 1024


def _hll_hash(tok: Column) -> Column:
    return hex_to_int(md5_hex(tok), 12)  # 48-bit


def hll_registers(df: DataFrame, group_cols: list[str], token_col: str) -> DataFrame:
    """Per-group HLL register table (group..., j, M) — the mergeable
    sketch state: registers from different partitions/syncs merge with
    MAX(M), which is what the groupBy's partial aggregation already
    does map-side."""
    h = _hll_hash(F.col(token_col))
    w = F.expr(f"__h div {HLL_M}")
    rho = F.when(w > 0, F.lit(_HLL_W_BITS + 1) - F.length(F.bin(w))).otherwise(
        F.lit(_HLL_W_BITS + 1)
    )
    return (
        df.withColumn("__h", h)
        .select(*group_cols, (F.col("__h") % HLL_M).alias("j"), rho.alias("rho"))
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("M"))
    )


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Raw HLL estimate per group from the register table. Absent
    registers count as M=0. The harmonic sum is the exact BIGINT
    Σ 2^(maxM − M_j) (+ absent·2^maxM); the estimate is
    alpha·m² · 2^maxM / Σ — deterministic IEEE on exact inputs."""
    w = Window.partitionBy(*group_cols)
    with_max = regs.withColumn("maxM", F.max("M").over(w))
    agg = with_max.groupBy(*group_cols).agg(
        F.max("maxM").alias("maxM"),
        F.count(F.lit(1)).alias("present"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), maxM - M)")).alias("s_present"),
    )
    intsum = F.col("s_present") + (F.lit(HLL_M) - F.col("present")) * F.expr(
        "shiftleft(CAST(1 AS BIGINT), maxM)"
    )
    est = (
        F.lit(float(HLL_ALPHA_M2))
        * F.expr("shiftleft(CAST(1 AS BIGINT), maxM)").cast("double")
        / intsum.cast("double")
    )
    return agg.select(*group_cols, est.alias("hll_estimate"))


def sql_hll_registers(token_table: str, group_col: str, token_col: str) -> str:
    """DuckDB twin of hll_registers: (group_col, j, M)."""
    h = sql_hex_to_int(f"md5({token_col})", 12)
    return f"""
  SELECT {group_col}, j, MAX(rho) AS M
  FROM (
    SELECT {group_col}, __h % {HLL_M} AS j,
           CASE WHEN (__h // {HLL_M}) > 0
                THEN {_HLL_W_BITS + 1} - length(bin(__h // {HLL_M}))
                ELSE {_HLL_W_BITS + 1} END AS rho
    FROM (SELECT {group_col}, {h} AS __h FROM {token_table})
  )
  GROUP BY {group_col}, j
"""


def sql_hll_estimate_from_regs(regs_table: str, group_cols: list[str]) -> str:
    """DuckDB twin of hll_estimate over an existing (group..., j, M)
    register table: (group..., hll_estimate)."""
    g = ", ".join(group_cols)
    part = ", ".join(group_cols)
    return f"""
  SELECT {g},
         {HLL_ALPHA_M2} * CAST((CAST(1 AS BIGINT) << maxM) AS DOUBLE)
           / CAST(s_present + ({HLL_M} - present) * (CAST(1 AS BIGINT) << maxM) AS DOUBLE)
           AS hll_estimate
  FROM (
    SELECT {g}, MAX(maxM) AS maxM, COUNT(*) AS present,
           SUM(CAST(1 AS BIGINT) << (maxM - M)) AS s_present
    FROM (
      SELECT {g}, j, M, MAX(M) OVER (PARTITION BY {part}) AS maxM
      FROM {regs_table}
    )
    GROUP BY {g}
  )
"""


def sql_hll_estimate(token_table: str, group_col: str, token_col: str) -> str:
    """DuckDB twin of hll_registers → hll_estimate: SELECT group_col,
    hll_estimate FROM the same register pipeline."""
    regs = f"({sql_hll_registers(token_table, group_col, token_col)})"
    return sql_hll_estimate_from_regs(regs, [group_col])


def cm_cells(df: DataFrame, token_col: str) -> DataFrame:
    """Count-Min sketch table (row, cell, n): d salted hash rows of
    width w. Mergeable with SUM(n); one explode + one groupBy."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (
                    hex_to_int(
                        md5_hex(F.concat(F.lit(f"cm{i}#"), F.col(token_col))), 12
                    )
                    % CM_WIDTH
                ).alias("cell"),
            )
            for i in range(CM_DEPTH)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("rc"))
        .select(F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
        .groupBy("row", "cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cm_cells_from_counts(
    counts: DataFrame, token_col: str, cnt_col: str
) -> DataFrame:
    """Count-Min sketch from a pre-aggregated (token, count) relation —
    cell-identical to ``cm_cells`` over the raw occurrence stream
    (SUM of per-token counts per cell == the cell's occurrence count),
    but hashes each DISTINCT token once instead of once per occurrence,
    and the hash work runs across the count-shuffle's partitions
    instead of the raw scan's input splits. The shape of choice when a
    per-token count table already exists in the plan (exchange reuse
    makes the corpus scan single-pass)."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (
                    hex_to_int(
                        md5_hex(F.concat(F.lit(f"cm{i}#"), F.col(token_col))), 12
                    )
                    % CM_WIDTH
                ).alias("cell"),
            )
            for i in range(CM_DEPTH)
        ]
    )
    return (
        counts.select(F.explode(pairs).alias("rc"), F.col(cnt_col).alias("__cnt"))
        .select("rc.row", "rc.cell", "__cnt")
        .groupBy("row", "cell")
        .agg(F.sum("__cnt").alias("n"))
    )


def cm_probe_cells(probes: DataFrame, token_col: str) -> DataFrame:
    """The (token, row, cell) coordinates each probe token reads — the
    same per-row hash the sketch was built with. Exposed separately so
    a cell-probed synced sketch (q136) can turn the bounded cell list
    into partition-pruned file I/O before the lookup join."""
    return probes.select(
        token_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        (
                            hex_to_int(
                                md5_hex(
                                    F.concat(F.lit(f"cm{i}#"), F.col(token_col))
                                ),
                                12,
                            )
                            % CM_WIDTH
                        ).alias("cell"),
                    )
                    for i in range(CM_DEPTH)
                ]
            )
        ).alias("rc"),
    ).select(token_col, F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))


def cm_lookup(sketch: DataFrame, probes: DataFrame, token_col: str) -> DataFrame:
    """Estimate each probe token's count: min over the d rows of its
    cell counts. The probe side is tiny (d·|probes| cells) — broadcast
    onto the bounded sketch table; the corpus is never rescanned."""
    cells = cm_probe_cells(probes, token_col)
    return (
        sketch.join(F.broadcast(cells), ["row", "cell"])
        .groupBy(token_col)
        .agg(F.min("n").alias("cm_estimate"))
    )


def _sql_cm_hash(token_col: str, i: int) -> str:
    return sql_hex_to_int("md5('cm" + str(i) + "#' || " + token_col + ")", 12)


def sql_cm_cells(token_table: str, token_col: str) -> str:
    rows = " UNION ALL ".join(
        f"SELECT {i} AS row, ({_sql_cm_hash(token_col, i)}) % {CM_WIDTH} AS cell"
        f" FROM {token_table}"
        for i in range(CM_DEPTH)
    )
    return f"SELECT row, cell, COUNT(*) AS n FROM ({rows}) GROUP BY row, cell"


def sql_cm_probe_cells(probe_table: str, token_col: str) -> str:
    return " UNION ALL ".join(
        f"SELECT {token_col}, {i} AS row,"
        f" ({_sql_cm_hash(token_col, i)}) % {CM_WIDTH} AS cell FROM {probe_table}"
        for i in range(CM_DEPTH)
    )


# --- HDR-style mergeable histogram: power-of-2 exponent buckets with
#     2^HIST_S linear sub-buckets — bounded relative error 2^-HIST_S
#     (~3.1%), pure integer bit arithmetic (no log), so bucket ids and
#     the recovered quantiles are bit-identical cross-engine. State is
#     (group, bucket, n), SUM-mergeable, ≤ 64·2^HIST_S rows per group
#     regardless of data size — the quantile analog of the HLL/CM
#     sketches above.

HIST_S = 5  # sub-bucket bits; relative error ≤ 2^-5
_HIST_BASE = 1 << (HIST_S + 1)  # bucket id = e * BASE + sub, totally ordered


def hist_bucket(colname: str) -> Column:
    """Totally-ordered BIGINT bucket id for a non-negative BIGINT
    column (same SQL text as ``sql_hist_bucket`` modulo shift
    spelling)."""
    e = f"(CASE WHEN {colname} > 0 THEN length(bin(CAST({colname} AS BIGINT)))" \
        f" ELSE 0 END)"
    sub = (
        f"(CASE WHEN {e} <= {HIST_S + 1} THEN {colname}"
        f" ELSE shiftright(CAST({colname} AS BIGINT), {e} - 1 - {HIST_S}) END)"
    )
    return F.expr(f"CAST(CAST({e} AS BIGINT) * {_HIST_BASE} + {sub} AS BIGINT)")


def sql_hist_bucket(v: str) -> str:
    e = f"(CASE WHEN {v} > 0 THEN length(bin(CAST({v} AS BIGINT))) ELSE 0 END)"
    sub = (
        f"(CASE WHEN {e} <= {HIST_S + 1} THEN {v}"
        f" ELSE CAST({v} AS BIGINT) >> ({e} - 1 - {HIST_S}) END)"
    )
    return f"(CAST({e} AS BIGINT) * {_HIST_BASE} + {sub})"


def hist_lower(colname: str) -> Column:
    """Lower bound of a bucket-id column — the deterministic quantile
    estimate."""
    return F.expr(
        f"CAST(CASE WHEN {colname} div {_HIST_BASE} <= {HIST_S + 1}"
        f" THEN {colname} % {_HIST_BASE}"
        f" ELSE shiftleft({colname} % {_HIST_BASE},"
        f" ({colname} div {_HIST_BASE}) - 1 - {HIST_S}) END AS BIGINT)"
    )


def sql_hist_lower(b: str) -> str:
    return (
        f"(CASE WHEN {b} // {_HIST_BASE} <= {HIST_S + 1} THEN {b} % {_HIST_BASE}"
        f" ELSE ({b} % {_HIST_BASE}) << ({b} // {_HIST_BASE} - 1 - {HIST_S})"
        f" END)"
    )


def hist_cells(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """(group..., bucket, n) — merge with SUM(n) per bucket."""
    return (
        df.withColumn("__hv", F.col(value_col).cast("long"))
        .withColumn("__hb", hist_bucket("__hv"))
        .groupBy(*group_cols, F.col("__hb").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def hist_quantiles(
    cells: DataFrame, group_cols: list[str], percentiles: list[int]
) -> DataFrame:
    """Per-group quantile estimates from the histogram: for each
    integer percentile p, the lower bound of the first bucket whose
    cumulative count reaches ceil(p·n/100). Integer thresholds —
    deterministic, oracle-able."""
    w = Window.partitionBy(*group_cols).orderBy("bucket")
    wp = Window.partitionBy(*group_cols)
    cum = cells.withColumn("cum", F.sum("n").over(w)).withColumn(
        "tot", F.sum("n").over(wp)
    )
    parts = []
    for p in percentiles:
        thr = F.expr(f"(tot * {p} + 99) div 100")
        parts.append(
            cum.filter(F.col("cum") >= thr)
            .groupBy(*group_cols)
            .agg(F.min("bucket").alias("__hb"))
            .select(
                *group_cols,
                F.lit(p).alias("p"),
                hist_lower("__hb").alias("est"),
            )
        )
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out
