"""Cross-engine exactness: the vector primitives must produce
BIT-IDENTICAL results in Spark and DuckDB (the correctness gate hashes
values, so 1-ulp drift fails it). Randomized vectors across dimensions
— beyond the fixed oracle corpus."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from cocoindex_spark.operators.vector_ops import (
    dot_fixed,
    sign_bucket,
    sql_dot_fixed,
    sql_sign_bucket,
)


def test_sign_bucket_and_dot_parity(spark, tmp_path):
    random.seed(7)
    rows = []
    for i in range(150):
        dim = random.choice([3, 8, 64, 100])
        vec = [
            random.uniform(-2, 2) if random.random() > 0.05 else 0.0
            for _ in range(dim)
        ]
        rows.append((i, vec))
    out = str(tmp_path / "vec.parquet")
    spark.createDataFrame(rows, "id LONG, embedding ARRAY<FLOAT>").coalesce(
        1
    ).write.parquet(out)

    got = {
        r["id"]: (r["b"], r["d"])
        for r in spark.read.parquet(out)
        .select(
            "id",
            sign_bucket(F.col("embedding"), 8).alias("b"),
            dot_fixed(F.col("embedding"), F.col("embedding")).alias("d"),
        )
        .collect()
    }
    con = duckdb.connect()
    exp = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"SELECT id, {sql_sign_bucket('embedding', 8)}, "
            f"{sql_dot_fixed('embedding', 'embedding')} "
            f"FROM read_parquet('{out}/*.parquet')"
        ).fetchall()
    }
    assert got == exp


def test_arrow_vector_ops_bit_equal_to_expressions(spark):
    """The Arrow (numpy) spellings of the fixed-point dot and sign-LSH
    bucket must be bit-identical to the JVM expression spellings on
    random float32 vectors — same guarantee the DuckDB oracle relies
    on, so either path can serve the pair-verify hot stage."""
    import random
    import struct

    from pyspark.sql import functions as F

    from cocoindex_spark.operators.vector_ops import (
        dot_fixed,
        dot_fixed_arrow,
        sign_bucket,
        sign_bucket_arrow,
    )

    rng = random.Random(42)

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    rows = [
        (i, [f32(rng.gauss(0, 1)) for _ in range(64)], [f32(rng.gauss(0, 1)) for _ in range(64)])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "i INT, a ARRAY<FLOAT>, b ARRAY<FLOAT>")
    bad = df.select(
        (dot_fixed(F.col("a"), F.col("b")) == dot_fixed_arrow(F.col("a"), F.col("b"))).alias("d_eq"),
        (sign_bucket(F.col("a"), 8) == sign_bucket_arrow(F.col("a"), 8)).alias("b_eq"),
    ).filter(~F.col("d_eq") | ~F.col("b_eq")).count()
    assert bad == 0


def test_integer_division_parity_nonnegative(spark):
    """Spark's `div` truncates toward zero; DuckDB's `//` floors. The
    query pack's integer-division discipline (q82 PageRank, q84/q86
    epoch bucketing, q88 batching, q92 decay) therefore only ever
    divides NON-NEGATIVE operands, where the two agree exactly. Pin
    both facts: agreement on non-negatives, and the documented
    divergence on negatives that motivates the guard."""
    import duckdb

    pairs = [
        (a, b)
        for a in [0, 1, 2, 3, 7, 99, 10**12, 2**40, -1, -3, -99, -(10**12)]
        for b in [1, 2, 3, 7, 64, 10**6]
    ]
    df = spark.createDataFrame(pairs, "a LONG, b LONG").selectExpr("a", "b", "a div b AS q")
    got = {(r.a, r.b): r.q for r in df.collect()}
    for (a, b), q in got.items():
        (dq,) = duckdb.sql(f"SELECT CAST({a} AS BIGINT) // {b}").fetchone()
        assert q == int(dq), (a, b, q, dq)
    # Both TRUNCATE toward zero (DuckDB's integer `//` is NOT Python
    # floor division): -3 div 2 = -3 // 2 = -1 in both engines.
    assert got[(-3, 2)] == -1


def test_quickstart_embed_spelling_bit_equal_to_operator(spark):
    """The quickstart pipeline's md5-once embedding spelling must be
    bit-identical to operators/embed.hash_embed_expr (the reference
    formula): same bucket (first 8 hex digits), same sign (9th digit
    parity), float sums of ±1 are exact in any order."""
    from pyspark.sql import functions as F

    from cocoindex_spark.operators.embed import hash_embed_expr
    from cocoindex_spark.queries.quickstart import EMB_DIM

    df = spark.createDataFrame(
        [("alpha beta gamma alpha",), ("the quick brown fox",), ("",), ("один 两个 emoji😀",)],
        "chunk_text STRING",
    )
    ref = df.select(
        hash_embed_expr(F.split(F.col("chunk_text"), " "), EMB_DIM).alias("e")
    ).collect()
    pairs = F.expr(
        "transform("
        "  transform(split(chunk_text, ' '),"
        "            t -> conv(substring(md5(encode(t, 'UTF-8')), 1, 9), 16, 10)),"
        "  h -> struct(CAST(CAST(h AS BIGINT) div 16 % " + str(EMB_DIM) + " AS INT) AS b,"
        "              CASE WHEN CAST(h AS BIGINT) % 2 = 0 THEN CAST(1.0 AS DOUBLE)"
        "                   ELSE CAST(-1.0 AS DOUBLE) END AS s))"
    )

    def _sum_dim(i):
        return lambda acc, p: acc + F.when(p["b"] == i, p["s"]).otherwise(F.lit(0.0))

    fast = df.select(
        F.array(
            *[F.aggregate(pairs, F.lit(0.0), _sum_dim(i)).cast("float") for i in range(EMB_DIM)]
        ).alias("e")
    ).collect()
    assert [r["e"] for r in ref] == [r["e"] for r in fast]
