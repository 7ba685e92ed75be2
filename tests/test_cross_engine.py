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
