"""Wide SimHash (operators/text_ops.py simhash_wide): band recall is
pigeonhole-EXACT — 4×15-bit bands must surface every pair within
hamming distance 3 — and the signature arithmetic must agree with an
independent Python reimplementation bit-for-bit."""

from __future__ import annotations

import hashlib
import itertools

from pyspark.sql import functions as F

from cocoindex_spark.operators.text_ops import simhash_wide

N_BITS = 60
N_BANDS = 4
BAND_W = N_BITS // N_BANDS


def py_simhash(tokens: set[str], n_bits: int = N_BITS) -> int:
    n_hex = (n_bits + 3) // 4
    sums = [0] * n_bits
    for t in tokens:
        h = int(hashlib.md5(t.encode()).hexdigest()[:n_hex], 16)
        for j in range(n_bits):
            sums[j] += 1 if (h >> j) & 1 else -1
    return sum(1 << j for j in range(n_bits) if sums[j] > 0)


def test_signature_matches_python_reimplementation(spark):
    docs = {
        1: {"alpha", "beta", "gamma"},
        2: {"alpha", "beta", "delta"},
        3: {"omega"},
    }
    rows = [(i, t) for i, ts in docs.items() for t in ts]
    df = spark.createDataFrame(rows, "doc_id LONG, tok STRING")
    got = {
        r["doc_id"]: r["simhash"]
        for r in simhash_wide(df, "doc_id", "tok", N_BITS).collect()
    }
    assert got == {i: py_simhash(ts) for i, ts in docs.items()}


def test_band_recall_is_pigeonhole_exact(spark):
    # 40 token-set docs with overlapping vocab → many near signatures
    docs = {i: {f"w{(i * 7 + k) % 23}" for k in range(6)} for i in range(40)}
    rows = [(i, t) for i, ts in docs.items() for t in ts]
    df = spark.createDataFrame(rows, "doc_id LONG, tok STRING")
    sim = simhash_wide(df, "doc_id", "tok", N_BITS)

    # banded candidates (the q76 plan shape)
    bands = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("band"),
                    F.expr(f"(simhash div {1 << (BAND_W * j)}) % {1 << BAND_W}").alias("bval"),
                )
                for j in range(N_BANDS)
            ])
        ).alias("bs"),
    ).select("doc_id", "simhash", "bs.band", "bs.bval")
    a = bands.select(F.col("doc_id").alias("a_id"), F.col("simhash").alias("a_sim"), "band", "bval")
    b = bands.select(F.col("doc_id").alias("b_id"), F.col("simhash").alias("b_sim"), "band", "bval")
    got = {
        (r["a_id"], r["b_id"])
        for r in (
            a.join(b, ["band", "bval"])
            .filter(F.col("a_id") < F.col("b_id"))
            .filter(F.bit_count(F.col("a_sim").bitwiseXOR(F.col("b_sim"))) <= 3)
            .select("a_id", "b_id")
            .distinct()
            .collect()
        )
    }

    # brute-force ground truth in Python
    sigs = {i: py_simhash(ts) for i, ts in docs.items()}
    want = {
        (i, j)
        for i, j in itertools.combinations(sorted(docs), 2)
        if bin(sigs[i] ^ sigs[j]).count("1") <= 3
    }
    assert want, "test corpus must actually contain near pairs"
    assert got == want  # no misses (pigeonhole) and no extras (verify)
