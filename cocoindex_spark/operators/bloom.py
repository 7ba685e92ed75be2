"""Bloom-filter runtime prefilter — the semi-join reducer of a 100 TB
pipeline. A huge fact side that will be joined to a selective dim
subset should not shuffle (or even carry) the rows that cannot match;
a Bloom bitmap over the dim keys is bounded state (m bits regardless
of corpus size), OR-mergeable across partitions/syncs like the other
sketches (operators/sketch.py), and probes as K broadcast hash joins —
ZERO shuffles on the fact side. False positives are then removed by
the exact join, which now runs over a fraction of the input.

Reference analog: the `might_match` literal prefilter
(/root/reference/python/cocoindex/ops/code.py — cheap pre-test before
the expensive exact matcher); this is the same contract generalized to
join keys, expressed as mergeable relational state.

Integer-deterministic (md5-prefix positions, BIGINT word masks) so
both the bitmap AND the candidate set are value-oracled cross-engine.

Layout: m bits packed 32 per BIGINT word — rows (word, bits). 32 (not
64) keeps every mask = 1 << (pos % 32) well inside BIGINT in both
engines (DuckDB's `<<` on BIGINT errors at bit 63). Merge = bit_or per
word. Sizing: m and k are per-filter parameters; at 100 TB you size m
to the dim-subset cardinality (1.44·k·n bits for the target FP rate)
and the word table stays broadcast-size (m/32 rows) into the GiB-bit
range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cocoindex_spark.operators.text_ops import hex_to_int, md5_hex, sql_hex_to_int

BLOOM_M = 1024  # bits (didactic default; a real dim subset sizes this up)
BLOOM_K = 2  # hash functions
_WORD = 32  # bits packed per BIGINT word


def _pos(key: Column, i: int, m_bits: int) -> Column:
    """Bit position of hash i for a key (48-bit md5 prefix, mod m)."""
    return (
        hex_to_int(md5_hex(F.concat(F.lit(f"bl{i}#"), key.cast("string"))), 12)
        % m_bits
    )


def _sql_pos(key_expr: str, i: int, m_bits: int) -> str:
    h = sql_hex_to_int(f"md5('bl{i}#' || CAST({key_expr} AS VARCHAR))", 12)
    return f"(({h}) % {m_bits})"


def bloom_words(
    keys: DataFrame, key_col: str, m_bits: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """Build the filter: (word, bits) rows, at most m/32 of them.

    One explode (k rows per key) + one groupBy word with bit_or — the
    partial aggregation collapses map-side to ≤ m/32 rows per
    partition, so the shuffle is bounded by the filter size, not the
    key count. Filters built on disjoint key sets merge with
    bit_or(bits) per word (tested)."""
    masks = F.array(
        *[
            F.struct(
                F.expr(f"__p{i} div {_WORD}").alias("word"),
                F.expr(f"shiftleft(CAST(1 AS BIGINT), __p{i} % {_WORD})").alias(
                    "mask"
                ),
            )
            for i in range(k)
        ]
    )
    with_pos = keys.select(
        *[_pos(F.col(key_col), i, m_bits).alias(f"__p{i}") for i in range(k)]
    )
    return (
        with_pos.select(F.explode(masks).alias("wm"))
        .select("wm.word", "wm.mask")
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_prefilter(
    fact: DataFrame,
    key_col: str,
    words: DataFrame,
    m_bits: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Keep only fact rows whose key passes all k bit tests.

    K broadcast hash joins on the word index (the filter is ≤ m/32
    rows) + a JVM bit-test filter — the fact side is never shuffled
    and never carries non-candidate rows downstream. Inner joins: a
    word row absent from the filter means no bit in it is set."""
    out = fact
    for i in range(k):
        wtab = words.select(
            F.col("word").alias(f"__w{i}"), F.col("bits").alias(f"__b{i}")
        )
        out = (
            out.withColumn(f"__p{i}", _pos(F.col(key_col), i, m_bits))
            .join(
                F.broadcast(wtab),
                F.expr(f"__p{i} div {_WORD}") == F.col(f"__w{i}"),
            )
            .filter(F.expr(f"(shiftright(__b{i}, __p{i} % {_WORD}) & 1) = 1"))
        )
    return out.drop(
        *[c for i in range(k) for c in (f"__p{i}", f"__w{i}", f"__b{i}")]
    )


def sql_bloom_words(
    key_table: str, key_col: str, m_bits: int = BLOOM_M, k: int = BLOOM_K
) -> str:
    """DuckDB twin of bloom_words → (word, bits)."""
    rows = " UNION ALL ".join(
        f"SELECT {_sql_pos(key_col, i, m_bits)} AS p FROM {key_table}"
        for i in range(k)
    )
    return (
        f"SELECT p // {_WORD} AS word,"
        f" CAST(bit_or(CAST(1 AS BIGINT) << (p % {_WORD})) AS BIGINT) AS bits"
        f" FROM ({rows}) GROUP BY p // {_WORD}"
    )


def sql_bloom_pass(key_expr: str, i: int, m_bits: int = BLOOM_M) -> tuple[str, str]:
    """(join condition on alias w{i}, bit-test predicate) for hash i —
    the DuckDB twin of one bloom_prefilter join step."""
    p = _sql_pos(key_expr, i, m_bits)
    return (
        f"w{i}.word = ({p}) // {_WORD}",
        f"((w{i}.bits >> (({p}) % {_WORD})) & 1) = 1",
    )
