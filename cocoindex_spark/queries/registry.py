from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator registering a query and (optionally) its DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(_ORACLES)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # UTC session zone unconditionally: every NTZ→TIMESTAMP cast in the
    # query pack (events normalization below, orders epoch extraction)
    # must be the identity on the epoch value so unix_micros matches
    # DuckDB's tz-free epoch_us. Runtime-settable, so this works on
    # driver-provided sessions too.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS). Depending on the Spark
        # version this reads as a nanos LONG (legacy conf) or as
        # TIMESTAMP_NTZ (Spark 4.1+ reads nanos natively, truncated to
        # micros). Normalize both to a plain TIMESTAMP.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if name == "events":
        dt = df.schema["ts"].dataType
        if isinstance(dt, LongType):
            # nanos long → micros timestamp (floor = DuckDB truncation)
            df = df.withColumn(
                "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
            )
        elif isinstance(dt, TimestampNTZType):
            # NTZ→TIMESTAMP cast interprets wall time in the session zone;
            # with UTC set above this is the identity on the epoch value.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
