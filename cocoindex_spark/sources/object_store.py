"""Object-store sources: S3 / Azure Blob / GCS / OCI listings as keyed
file DataFrames (reference: `python/cocoindex/connectors/amazon_s3/
_source.py:363` ``list_objects``, `azure_blob/_source.py:72-115`
(etag → fingerprint), `oci_object_storage/_source.py:640`,
`google_drive/_source.py`).

Spark-first: all object stores are HDFS-compatible URI schemes
(`s3a://`, `abfss://`, `gs://`, `oci://`), so one reader covers them:
`spark.read.format("binaryFile")` with `pathGlobFilter` pushdown.
The listing itself is distributed (driver lists prefixes, executors
read objects); the file's (length, modificationTime) pair is the
cheap first-level fingerprint, content hash the second — the
reference's two-level memo validation (SURVEY §1.3).

This container has no cloud credentials, so tests run the same reader
against `file://` URIs — the code path is identical up to the scheme.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SUPPORTED_SCHEMES = ("s3a://", "abfss://", "gs://", "oci://", "wasbs://", "file://")


def list_objects(
    spark: SparkSession,
    uri: str,
    glob: str | None = None,
    with_content: bool = True,
    recursive: bool = True,
) -> DataFrame:
    """Bucket/prefix listing → keyed file items (list_objects analog).

    Returns DF(path, size, mtime[, content]); key = path (the object
    key, stable across runs — the reference's StableKey for files).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(uri)
    cols = [
        F.col("path"),
        F.col("length").alias("size"),
        F.col("modificationTime").alias("mtime"),
    ]
    if with_content:
        cols.append(F.col("content"))
    return df.select(*cols)


def cheap_fingerprint(df: DataFrame) -> DataFrame:
    """First-level change fingerprint from listing metadata only
    (etag/mtime+size — azure_blob/_source.py:72-115): no content read.
    Rows whose cheap fp matches the tracked one skip the content stage
    entirely (two-level memo validation, component.rs:86-101)."""
    return df.withColumn(
        "cheap_fp",
        F.sha2(F.concat_ws("|", F.col("path"), F.col("size"), F.col("mtime").cast("string")), 256),
    )
