"""Engine state store: versioned parquet tables with atomic pointer
swap — the Spark-native re-home of the reference's LMDB state store
(rust/core/src/state_store/storage.rs, db_schema.rs:64-92).

Keyspaces map to managed tables under one state root:

- ``tracking``   — per-(component_path, target_path) fingerprints with
                   ``possible_fps`` array + ``may_be_missing`` for
                   interrupted-run convergence
                   (custom_target_connector.mdx:74-87, 211-213)
- ``memo``       — function memoization keyed by (logic_fp, args_fp)
                   (FunctionMemoization, db_schema.rs:67-70)
- ``child_existence`` — child key sets per parent path (0xa0)
- ``user_state`` — persistent per-component scratch (0x34)

Writes are convergent roll-forward: a new immutable version directory
is written, then the ``_CURRENT`` pointer file is atomically replaced
(os.replace). A crash mid-write leaves the old version live; re-running
converges (same relaxation the reference documents for its per-backend
atomic batches, processing_component.mdx:248-253). On a cluster the
same layout works on any HDFS-compatible FS with an atomic rename.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_POINTER = "_CURRENT"
_KEEP_VERSIONS = 3


class ManagedTable:
    """A keyed parquet table with upsert/delete via full rewrite of a
    new version + atomic pointer swap.

    At 100 TB the rewrite becomes partition-scoped (only partitions
    containing touched keys are rewritten — partition pruning on the
    key-hash prefix); the pointer/version protocol is unchanged.
    """

    def __init__(self, path: str, key_cols: list[str], schema: StructType):
        self.path = path
        self.key_cols = key_cols
        self.schema = schema
        os.makedirs(path, exist_ok=True)

    # -- version plumbing -------------------------------------------------
    def _current_version_dir(self) -> str | None:
        ptr = os.path.join(self.path, _POINTER)
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            name = f.read().strip()
        vdir = os.path.join(self.path, name)
        return vdir if os.path.isdir(vdir) else None

    def _swap_to(self, version_name: str) -> None:
        ptr = os.path.join(self.path, _POINTER)
        tmp = ptr + ".tmp"
        with open(tmp, "w") as f:
            f.write(version_name)
        os.replace(tmp, ptr)  # atomic on POSIX

    def _gc(self) -> None:
        current = os.path.basename(self._current_version_dir() or "")
        versions = sorted(
            d for d in os.listdir(self.path) if d.startswith("v_") and d != current
        )
        for d in versions[:-_KEEP_VERSIONS]:
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)

    # -- read/write -------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        vdir = self._current_version_dir()
        if vdir is None:
            return spark.createDataFrame([], self.schema)
        return spark.read.schema(self.schema).parquet(vdir)

    def overwrite(self, df: DataFrame) -> None:
        version_name = f"v_{int(time.time() * 1e6)}"
        out = os.path.join(self.path, version_name)
        df.write.mode("overwrite").parquet(out)
        self._swap_to(version_name)
        self._gc()

    def merge_upsert(self, updates: DataFrame) -> None:
        """Idempotent MERGE: new rows win over current rows on key
        equality. Repeated application of the same batch converges."""
        current = self.read(updates.sparkSession)
        merged = current.join(updates.select(self.key_cols).distinct(), self.key_cols, "left_anti")
        self.overwrite(merged.unionByName(updates.select(*[f.name for f in self.schema.fields])))

    def delete_keys(self, keys: DataFrame) -> None:
        current = self.read(keys.sparkSession)
        self.overwrite(current.join(keys.select(self.key_cols).distinct(), self.key_cols, "left_anti"))


def _schema(*fields: tuple) -> StructType:
    # Built without fromDDL: that needs an active SparkContext at
    # import time.
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        LongType,
        StringType,
        StructField,
    )

    type_map = {
        "string": StringType(),
        "long": LongType(),
        "bool": BooleanType(),
        "array<string>": ArrayType(StringType()),
    }
    return StructType([StructField(n, type_map[t], True) for n, t in fields])


TRACKING_SCHEMA = _schema(
    ("component_path", "string"),
    ("target_path", "string"),
    ("fp", "string"),
    ("possible_fps", "array<string>"),
    ("may_be_missing", "bool"),
    ("version", "long"),
    ("pending_token", "string"),
)

MEMO_SCHEMA = _schema(
    ("logic_fp", "string"),
    ("args_fp", "string"),
    ("result_json", "string"),
    ("version", "long"),
)

CHILD_EXISTENCE_SCHEMA = _schema(
    ("parent_path", "string"), ("child_key", "string"), ("version", "long")
)

USER_STATE_SCHEMA = _schema(
    ("component_path", "string"),
    ("state_key", "string"),
    ("value_json", "string"),
    ("version", "long"),
)


class StateStore:
    """All engine state tables under one root directory."""

    def __init__(self, root: str):
        self.root = root
        self.tracking = ManagedTable(
            os.path.join(root, "tracking"), ["component_path", "target_path"], TRACKING_SCHEMA
        )
        self.memo = ManagedTable(os.path.join(root, "memo"), ["logic_fp", "args_fp"], MEMO_SCHEMA)
        self.child_existence = ManagedTable(
            os.path.join(root, "child_existence"), ["parent_path", "child_key"], CHILD_EXISTENCE_SCHEMA
        )
        self.user_state = ManagedTable(
            os.path.join(root, "user_state"), ["component_path", "state_key"], USER_STATE_SCHEMA
        )

    def drop(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)


def empty_df(spark: SparkSession, schema: StructType) -> DataFrame:
    return spark.createDataFrame([], schema)


def with_version(df: DataFrame, version: int) -> DataFrame:
    return df.withColumn("version", F.lit(version).cast("long"))
