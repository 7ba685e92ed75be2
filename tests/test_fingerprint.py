"""Fingerprint semantics mirroring the reference's contracts
(test_logic_change_detection.py: docstring edits don't invalidate,
body edits do, dep edits propagate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cocoindex_spark.engine.function import fn
from cocoindex_spark.fingerprint import fp_col, fp_logic, fp_value


def test_fp_value_canonical():
    assert fp_value({"b": 1, "a": 2}) == fp_value({"a": 2, "b": 1})
    assert fp_value([1, 2]) != fp_value([2, 1])
    assert fp_value("1") != fp_value(1)
    assert fp_value(None) != fp_value("")
    assert fp_value(True) != fp_value(1)


def test_fp_col_unambiguous_boundaries(spark):
    """Two distinct rows must never share a fingerprint: values
    containing the old joiner byte must not shift across field
    boundaries, and complex types must encode structurally (the
    reference's canonical-serde guarantee, rust/utils fingerprint)."""
    df = spark.createDataFrame(
        [("a\x1fb", "c"), ("a", "b\x1fc")], "x STRING, y STRING"
    ).select(fp_col(F.col("x"), F.col("y")).alias("fp"))
    fps = [r["fp"] for r in df.collect()]
    assert fps[0] != fps[1]

    arr = spark.createDataFrame([(["a, b"],), (["a", "b"],)], "v ARRAY<STRING>").select(
        fp_col(F.col("v")).alias("fp")
    )
    a, b = [r["fp"] for r in arr.collect()]
    assert a != b

    nulls = spark.createDataFrame([(None,), ("null",), ("",)], "v STRING").select(
        fp_col(F.col("v")).alias("fp")
    )
    seen = [r["fp"] for r in nulls.collect()]
    assert len(set(seen)) == 3


def test_fp_logic_docstring_invariant():
    # Redefinitions of the SAME function name (simulating an edit):
    # docstring-only change keeps the fingerprint, body change breaks it.
    def f(x):
        """Doc A."""
        return x + 1

    fp_a = fp_logic(f)

    def f(x):  # noqa: F811
        """Completely different docs."""
        return x + 1

    fp_b = fp_logic(f)

    def f(x):  # noqa: F811
        """Doc A."""
        return x + 2

    fp_c = fp_logic(f)

    assert fp_a == fp_b
    assert fp_a != fp_c


def test_fp_logic_version_and_deps():
    def f(x):
        return x

    assert fp_logic(f, version=1) != fp_logic(f, version=2)
    assert fp_logic(f, deps=("a",)) != fp_logic(f, deps=("b",))


def test_fn_decorator_dep_propagation():
    @fn()
    def dep_v1(df):
        return df

    # Same body, new name binding — identical AST apart from name.
    @fn()
    def caller_a(df):
        return df

    fp_with_dep1 = fn(deps=(dep_v1,))(lambda df: df).logic_fp

    @fn(version=2)
    def dep_v2(df):
        return df

    fp_with_dep2 = fn(deps=(dep_v2,))(lambda df: df).logic_fp
    assert fp_with_dep1 != fp_with_dep2
    assert caller_a.logic_fp  # decorated fns always carry a fingerprint
