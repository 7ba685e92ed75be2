"""Skew-aware join helpers.

A shuffle equi-join sends every row with the same key to one task; a
hot key (a stop-word shingle, a part with thousands of suppliers, a
celebrity node) turns that task into the straggler that dominates the
stage. AQE's skew-join handling splits oversized *partitions*, but it
only helps sort-merge joins and only after a partition exceeds its
thresholds; salting fixes the key itself.

``salted_join`` replicates the build side R times and scatters the
probe side across the R replicas — every row still meets every
matching row exactly once, so the join result is identical, but each
hot key's work spreads over R tasks.

Salting is worth its 2-4× build-side duplication only for genuinely
skewed keys; for uniform keys it just multiplies shuffle volume. The
``salt_keys`` parameter therefore supports *selective* salting: pass a
small DataFrame of hot keys (e.g. from a cheap approx count) and only
those keys are replicated, everything else joins unsalted.

Reference analog: none (single-node engine); this is the 100 TB
companion to the skew note in queries/graphq.py (q67).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the key space salted ``n_salts`` ways.

    ``build`` is replicated ``n_salts`` times (explode of a literal
    range — no driver round-trip); ``probe`` rows pick one replica by a
    hash of their full row, spreading each hot key across tasks. Result
    columns = probe columns + build's non-key columns, exactly as an
    unsalted ``probe.join(build, on, how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left")
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    b = build.withColumn("__salt", F.explode(salts))
    # xxhash64 over all probe columns: deterministic, uniform; pmod
    # keeps it in [0, n_salts).
    p = probe.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in probe.columns]), F.lit(n_salts))
    )
    return p.join(b, [*on, "__salt"], how).drop("__salt")


def top_keys(df: DataFrame, on: list[str], min_count: int) -> DataFrame:
    """Keys whose row count reaches ``min_count`` — the hot-key probe
    for selective salting (one groupBy, run it on a sample at scale)."""
    return (
        df.groupBy(*on).agg(F.count(F.lit(1)).alias("__cnt"))
        .filter(F.col("__cnt") >= min_count)
        .select(*on)
    )


def selective_salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    hot_keys: DataFrame,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join where only ``hot_keys`` rows are salted.

    The cold remainder takes the ordinary single-shuffle join; the hot
    subset joins via ``salted_join``. Both probe/build sides are split
    with a broadcast semi/anti join against the (small) hot-key list,
    so the split itself adds no shuffle.
    """
    hk = F.broadcast(hot_keys.select(*on))
    p_hot = probe.join(hk, on, "left_semi")
    p_cold = probe.join(hk, on, "left_anti")
    b_hot = build.join(hk, on, "left_semi")
    b_cold = build.join(hk, on, "left_anti")
    cold = p_cold.join(b_cold, on, "inner")
    hot = salted_join(p_hot, b_hot, on, n_salts=n_salts, how="inner")
    return cold.unionByName(hot)
