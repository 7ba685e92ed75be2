"""SparkSession factory tuned for the engine.

Defaults target local[N] testing but every knob is chosen so the same
code scales to a 1000-executor cluster against ~100 TB:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing).
- Arrow on (all Python<->JVM transfer is columnar; pandas UDFs batch).
- Broadcast threshold raised: all TPC-H-ish dimension tables broadcast.
- ``spark.sql.shuffle.partitions`` defaults to the local core count; on a
  real cluster AQE coalescing makes the initial number mostly irrelevant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(app_name: str = "cocoindex-spark", cpus: int | None = None) -> SparkSession:
    cpus = cpus or CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS); read as long and convert.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if not os.environ.get("SPARK_GRAFT_REMOTE"):
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Register every testdata parquet as a temp view and return the dict."""
    dfs = {}
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(t)
            dfs[t] = df
    return dfs
