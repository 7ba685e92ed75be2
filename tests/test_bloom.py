"""Bloom prefilter (operators/bloom.py): mergeability (the 100 TB
property — filters built on disjoint key partitions OR together into
exactly the whole-set filter), the no-false-negative contract, and
bounded state."""

from __future__ import annotations

from pyspark.sql import functions as F

from cocoindex_spark.operators.bloom import (
    _WORD,
    bloom_prefilter,
    bloom_words,
)

_M = 4096  # roomy: FP-free membership checks below


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key")
    )


def test_bloom_words_merge_with_bit_or(spark):
    whole = _keys(spark, 0, 500)
    half_a, half_b = _keys(spark, 0, 250), _keys(spark, 250, 500)
    merged = (
        bloom_words(half_a, "key", _M)
        .unionByName(bloom_words(half_b, "key", _M))
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    direct = bloom_words(whole, "key", _M)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in direct.collect()
    }


def test_bloom_state_bounded(spark):
    words = bloom_words(_keys(spark, 0, 10_000), "key", _M)
    assert words.count() <= _M // _WORD  # rows bounded by m/32, not key count


def test_no_false_negatives_and_fp_cleanup(spark):
    members = _keys(spark, 0, 100)
    words = bloom_words(members, "key", _M)
    fact = _keys(spark, 0, 2000)  # 100 members + 1900 non-members
    cand = {r["key"] for r in bloom_prefilter(fact, "key", words, _M).collect()}
    member_set = {r["key"] for r in members.collect()}
    assert member_set <= cand  # every member passes — no false negatives
    # with m=4096 and 100·2 set bits (fill ≈ 4.8%) FPs are rare; the
    # filter must have actually filtered (candidates ≪ fact)
    assert len(cand) < 300
