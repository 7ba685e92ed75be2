"""Schema inference from Python type annotations — the reference's
datatype analysis (python/cocoindex/_internal/datatype.py:205-274
`analyze_type_info`) mapped onto Spark types per SURVEY.md §1.2's
canonical table (postgres/_target.py:212-306 → Spark).

Supports dataclasses, NamedTuples, TypedDicts, Optional/unions,
lists/sequences, dicts/mappings, numpy scalar types, and
``Vector[dim]`` annotations (VectorSchema analog,
resources/schema.py:23-58).
"""

from __future__ import annotations

import dataclasses
import datetime
import decimal
import typing
import uuid
from typing import Any, get_args, get_origin

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DayTimeIntervalType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

try:
    import numpy as np

    _NUMPY_MAP: dict[Any, DataType] = {
        np.int8: ShortType(),
        np.int16: ShortType(),
        np.int32: IntegerType(),
        np.int64: LongType(),
        np.float16: FloatType(),
        np.float32: FloatType(),
        np.float64: DoubleType(),
    }
except ImportError:  # pragma: no cover
    _NUMPY_MAP = {}

_LEAF_MAP: dict[Any, DataType] = {
    bool: BooleanType(),
    int: LongType(),
    float: DoubleType(),
    decimal.Decimal: DecimalType(38, 18),
    str: StringType(),
    bytes: BinaryType(),
    uuid.UUID: StringType(),  # canonical hex form
    datetime.date: DateType(),
    datetime.datetime: TimestampType(),
    datetime.time: StringType(),  # no direct Spark type
    datetime.timedelta: DayTimeIntervalType(),
    **_NUMPY_MAP,
}


class Vector:
    """Vector[dim] / Vector[dim, dtype] annotation — the VectorSchema
    analog. Maps to ARRAY<FLOAT> (containsNull=False)."""

    def __class_getitem__(cls, params):
        if not isinstance(params, tuple):
            params = (params,)
        dim = params[0]
        dtype = params[1] if len(params) > 1 else float
        return typing.Annotated[list[dtype], ("vector", dim)]


def _is_record(tp) -> bool:
    return dataclasses.is_dataclass(tp) or (
        isinstance(tp, type)
        and (
            hasattr(tp, "_fields")  # NamedTuple
            or hasattr(tp, "__annotations__")
            and hasattr(tp, "__total__")  # TypedDict
        )
    )


def spark_type(tp) -> tuple[DataType, bool]:
    """(DataType, nullable) for a Python annotation."""
    origin = get_origin(tp)

    if origin is typing.Annotated:
        args = get_args(tp)
        meta = args[1] if len(args) > 1 else None
        if isinstance(meta, tuple) and meta and meta[0] == "vector":
            inner, _ = spark_type(get_args(args[0])[0])
            return ArrayType(FloatType() if isinstance(inner, (FloatType, DoubleType)) else inner, False), False
        return spark_type(args[0])

    if origin in (typing.Union, getattr(__import__("types"), "UnionType", None)):
        args = [a for a in get_args(tp)]
        nullable = type(None) in args
        non_null = [a for a in args if a is not type(None)]
        if len(non_null) == 1:
            dt, _ = spark_type(non_null[0])
            return dt, nullable
        return StringType(), True  # heterogeneous union → JSON string

    if origin in (list, tuple, typing.Sequence, getattr(typing, "MutableSequence", None)) or (
        origin is not None and origin in (set, frozenset)
    ):
        args = get_args(tp)
        elem, elem_null = spark_type(args[0]) if args else (StringType(), True)
        return ArrayType(elem, elem_null), False

    if origin in (dict, typing.Mapping, getattr(typing, "MutableMapping", None)):
        k, v = get_args(tp) or (str, str)
        kt, _ = spark_type(k)
        vt, v_null = spark_type(v)
        return MapType(kt, vt, v_null), False

    if tp in _LEAF_MAP:
        return _LEAF_MAP[tp], False

    if _is_record(tp):
        return schema_of(tp), False

    return StringType(), True  # Any / unknown → JSON string


def schema_of(record_type) -> StructType:
    """StructType from a dataclass / NamedTuple / TypedDict
    (TableSchema.from_class analog, postgres/_target.py:364-441)."""
    hints = typing.get_type_hints(record_type, include_extras=True)
    fields = []
    for name, tp in hints.items():
        dt, nullable = spark_type(tp)
        fields.append(StructField(name, dt, nullable))
    return StructType(fields)
