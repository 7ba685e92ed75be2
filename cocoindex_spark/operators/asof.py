"""Distributed as-of join (point-in-time lookup).

For each left row, find the single right row with the largest
``right_ts`` satisfying ``right_ts < left_ts`` (or ``<=``), matching on
equality keys — the classic "last quote before the trade" /
"attribution: last click before the purchase" shape.

A naive range join explodes into O(|L|·|R|) comparisons per key. The
scale-correct plan is the union-and-scan trick:

1. tag both sides and union them (one schema, one dataset),
2. one shuffle: ``Window.partitionBy(keys).orderBy(ts, side)`` — the
   same single hash Exchange a groupBy would do,
3. within each key partition, ``last(right_payload, ignorenulls=True)``
   over ``rowsBetween(unboundedPreceding, 0)`` carries the most recent
   right row forward onto every left row,
4. keep the left rows.

No range explosion, no per-key skew beyond what the key distribution
itself has, and the window is partitioned (never a single-task global
window). Strictness is encoded in the intra-timestamp sort order: for
``strict=True`` left rows sort *before* right rows at an equal
timestamp (so an equal-ts right row is not yet visible), for
``strict=False`` they sort after it.

Reference analog: cocoindex's recency/ownership "latest wins" joins
(python/cocoindex/ops — see SURVEY §2.6); DuckDB expresses the same
operator as ``ASOF JOIN``, which the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    strict: bool = True,
    how: str = "left",
) -> DataFrame:
    """As-of join ``left`` to ``right`` on equality keys ``on`` plus the
    temporal predicate ``right_ts < left_ts`` (``<=`` if not strict).

    Returns all ``left`` columns plus each non-key ``right`` column
    renamed ``r_<name>`` (NULL when no right row qualifies; rows with
    no match are dropped when ``how="inner"``).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join: how must be 'left' or 'inner', got {how!r}")
    r_payload = [c for c in right.columns if c not in on]
    l_cols = list(left.columns)

    # One unified schema: keys, event time, side tag, both payloads.
    lt = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in l_cols]).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in r_payload]).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    rt = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in l_cols]).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*[F.col(c) for c in r_payload]).alias("__r"),
    )
    # strict: left sorts before right at equal __ts (tag desc: 1 then 0),
    # so an equal-ts right row is not visible to the left row.
    # non-strict: right first (tag asc), equal-ts right rows are visible.
    # Final xxhash64(__r) key: when several right rows share (key, ts),
    # F.last must pick the same one on every run/partitioning — without
    # it the winner is whatever the sort happened to leave last. Left
    # rows (all NULL __r, hash ties) are unaffected: no right row sorts
    # between two equal-ts left rows, so their carry value is identical.
    tag_order = F.desc("__is_left") if strict else F.asc("__is_left")
    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc("__ts"), tag_order, F.asc(F.xxhash64("__r")))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = (
        lt.unionByName(rt)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
    )
    if how == "inner":
        joined = joined.filter(F.col("__match").isNotNull())
    out = joined.select(
        *[F.col(f"__l.{c}").alias(c) for c in l_cols],
        *[F.col(f"__match.{c}").alias(f"r_{c}") for c in r_payload],
    )
    return out


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    count_col: str = "n_in_range",
) -> DataFrame:
    """Count, per left row, the right rows with
    ``left_ts + lower_us <= right_ts < left_ts + upper_us`` (epoch-
    microsecond offsets, lower inclusive / upper exclusive), matching on
    equality keys.

    Scale path: a *bucketed* range join. Both sides get a time bucket of
    width ``upper_us - lower_us``; each left row probes exactly two
    buckets (its own and the previous), making the join a pure equi-join
    on ``(keys, bucket)`` — Catalyst picks sort-merge/shuffled-hash, and
    the candidate set per row is bounded by bucket occupancy instead of
    the whole key history. The exact range predicate then filters the
    two-bucket candidates.
    """
    from functools import reduce

    width = upper_us - lower_us
    if width <= 0:
        raise ValueError("range_count_join: upper_us must be > lower_us")
    l_cols = list(left.columns)
    # Collapse duplicate left rows up front, remembering multiplicity.
    # Each duplicate must receive the SAME per-row count (not a combined
    # one), and groupBy treats NULLs as equal — so distinct-first is both
    # the duplicate fix and the NULL fix for the zero-hit restoration
    # below (which r2 did by a null-unsafe join on every left column).
    ld = (
        left.groupBy(*l_cols)
        .agg(F.count(F.lit(1)).alias("__mult"))
        .withColumn("__lus", F.unix_micros(F.col(left_ts)))
    )
    rt = (
        right.select(*on, F.unix_micros(F.col(right_ts)).alias("__rus"))
        .withColumn("__bkt", F.floor(F.col("__rus") / F.lit(width)))
    )
    # Left probes bucket(start) and bucket(start)+1 where start = lus+lower:
    # any right row in [start, start+width) lives in one of those two.
    probe = ld.withColumn(
        "__bkt", F.explode(
            F.array(
                F.floor((F.col("__lus") + F.lit(lower_us)) / F.lit(width)),
                F.floor((F.col("__lus") + F.lit(lower_us)) / F.lit(width)) + 1,
            )
        )
    )
    hits = (
        probe.join(rt, on=[*on, "__bkt"], how="inner")
        .filter(
            (F.col("__rus") >= F.col("__lus") + F.lit(lower_us))
            & (F.col("__rus") < F.col("__lus") + F.lit(upper_us))
        )
        .groupBy(*[F.col(c) for c in l_cols])
        .agg(F.count(F.lit(1)).alias(count_col))
    )
    # Zero-hit rows fall out of the aggregate — restore with a NULL-SAFE
    # left join (ld rows are distinct, so hits has at most one row each),
    # then re-expand the original duplicates. The hits side is renamed
    # first: ld and hits share lineage, so unaliased ld[c]/hits[c]
    # references resolve ambiguously.
    hits_r = hits.select(
        *[F.col(c).alias(f"__h_{c}") for c in l_cols], F.col(count_col)
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"__h_{c}")) for c in l_cols],
    )
    return (
        ld.join(hits_r, cond, "left")
        .select(
            *l_cols,
            F.coalesce(F.col(count_col), F.lit(0)).cast("long").alias(count_col),
            F.explode(F.array_repeat(F.lit(1), F.col("__mult").cast("int"))).alias("__rep"),
        )
        .drop("__rep")
    )
