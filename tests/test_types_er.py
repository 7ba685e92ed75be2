"""Type inference (datatype.py analog) + entity resolution pipeline
(test_entity_resolution.py analog: deterministic synthetic clusters)."""

from __future__ import annotations

import dataclasses
import datetime
import math
from typing import Optional

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    LongType,
    MapType,
    StringType,
    TimestampType,
)

from cocoindex_spark.datamodel.types import Vector, schema_of, spark_type
from cocoindex_spark.operators.entity_resolution import resolve_entities


def test_leaf_types():
    assert spark_type(int) == (LongType(), False)
    assert spark_type(str) == (StringType(), False)
    assert spark_type(float) == (DoubleType(), False)
    assert spark_type(bool) == (BooleanType(), False)
    assert spark_type(datetime.datetime) == (TimestampType(), False)


def test_optional_and_containers():
    dt, nullable = spark_type(Optional[int])
    assert dt == LongType() and nullable
    dt, _ = spark_type(list[str])
    assert dt == ArrayType(StringType(), False)
    dt, _ = spark_type(dict[str, int])
    assert dt == MapType(StringType(), LongType(), False)


def test_vector_annotation():
    dt, _ = spark_type(Vector[32])
    assert dt == ArrayType(FloatType(), False)


def test_dataclass_schema():
    @dataclasses.dataclass
    class DocEmbedding:
        id: str
        filename: str
        chunk_idx: int
        text: Optional[str]
        embedding: Vector[32]

    s = schema_of(DocEmbedding)
    assert [f.name for f in s.fields] == ["id", "filename", "chunk_idx", "text", "embedding"]
    assert s["chunk_idx"].dataType == LongType()
    assert s["text"].nullable
    assert s["embedding"].dataType == ArrayType(FloatType(), False)


def _cluster_vec(group: int, jitter: int, dim: int = 8) -> list[float]:
    """Deterministic unit vectors: same group ⇒ cosine ≈ 1, different
    group ⇒ orthogonal-ish (FIXTURES.md §6 contract)."""
    base = [0.0] * dim
    base[group % dim] = 1.0
    base[(group + 3) % dim] = 0.15 * ((jitter % 3) - 1)
    n = math.sqrt(sum(x * x for x in base))
    return [x / n for x in base]


def test_resolve_entities(spark):
    rows = []
    # 3 clusters of aliases; cluster 0 has a PINNED existing canonical
    for g in range(3):
        for j in range(4):
            rows.append(
                (
                    f"entity_g{g}_{j}",
                    _cluster_vec(g, j),
                    g == 0 and j == 2,  # pinned seed in cluster 0
                )
            )
    df = spark.createDataFrame(
        rows, "name STRING, embedding ARRAY<FLOAT>, is_existing_canonical BOOLEAN"
    )
    out = resolve_entities(df, threshold=0.7).collect()
    canon = {r["name"]: r["canonical"] for r in out}

    # every alias resolved; groups map to exactly one canonical each
    assert len(canon) == 12
    for g in range(3):
        group_canons = {canon[f"entity_g{g}_{j}"] for j in range(4)}
        assert len(group_canons) == 1, f"group {g} split: {group_canons}"
    # distinct groups stay distinct
    assert len({canon[f"entity_g{g}_0"] for g in range(3)}) == 3
    # PINNED entity keeps its identity as the canonical of its cluster
    assert canon["entity_g0_0"] == "entity_g0_2"
    # determinism: unpinned clusters resolve to the lexicographically
    # smallest member (sorted order contract)
    assert canon["entity_g1_3"] == "entity_g1_0"


def test_resolve_entities_bucketed(spark):
    rows = [(f"e{g}_{j}", _cluster_vec(g, j), False) for g in range(3) for j in range(3)]
    df = spark.createDataFrame(
        rows, "name STRING, embedding ARRAY<FLOAT>, is_existing_canonical BOOLEAN"
    )
    out = resolve_entities(df, threshold=0.7, bucket_bits=2).collect()
    canon = {r["name"]: r["canonical"] for r in out}
    for g in range(3):
        assert len({canon[f"e{g}_{j}"] for j in range(3)}) == 1
