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

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_POINTER = "_CURRENT"
_KEEP_UNREFERENCED = 2
_BUCKET_COL = "__bucket"


class ManagedTable:
    """A keyed parquet table with **bucket-scoped** upsert/delete.

    Rows hash-partition into ``n_buckets`` by key; each write rewrites
    only the buckets containing touched keys into a new immutable
    version directory, then atomically replaces the single pointer file
    (bucket → version map, ``os.replace``). A crash mid-write leaves
    the old pointer live; re-running converges (the reference's
    roll-forward relaxation, processing_component.mdx:248-253).

    This is the 100 TB shape: an edit touching k keys costs
    O(k/n_buckets · table) I/O instead of a full-table rewrite, and the
    bucket column is the natural cluster/shuffle key on a real cluster
    (same layout works on any HDFS-compatible FS with atomic rename).
    """

    def __init__(self, path: str, key_cols: list[str], schema: StructType, n_buckets: int = 16):
        from cocoindex_spark.state.fs import fs_for

        self.path = path
        self.key_cols = key_cols
        self.schema = schema
        self.n_buckets = n_buckets  # initial count; live count is in the pointer
        self.fs = fs_for(path)
        self.fs.makedirs(path)

    # -- pointer plumbing ---------------------------------------------------
    def _meta(self) -> tuple[int, dict[str, str]]:
        """(live bucket count, bucket(str) → version dir name). The
        bucket count persists in the pointer so every reader/writer
        hashes consistently even after adaptive growth; a legacy
        flat-mapping pointer implies the constructor count."""
        text = self.fs.read_text(os.path.join(self.path, _POINTER))
        if text is None:
            return self.n_buckets, {}
        doc = json.loads(text)
        if "buckets" in doc:
            return int(doc.get("n_buckets", self.n_buckets)), doc["buckets"]
        return self.n_buckets, doc  # legacy format

    def _pointer(self) -> dict[str, str]:
        return self._meta()[1]

    def _swap_pointer(self, mapping: dict[str, str], n_buckets: int | None = None) -> None:
        doc = {
            "n_buckets": n_buckets if n_buckets is not None else self._meta()[0],
            "buckets": mapping,
        }
        self.fs.write_atomic(os.path.join(self.path, _POINTER), json.dumps(doc))

    def _bucket_expr(self, n_buckets: int) -> F.Column:
        return F.pmod(
            F.xxhash64(*[F.col(c).cast("string") for c in self.key_cols]),
            F.lit(n_buckets),
        )

    def _bucket_paths(self, mapping: dict[str, str], buckets: list[int] | None = None) -> list[str]:
        out = []
        for b, ver in mapping.items():
            if buckets is not None and int(b) not in buckets:
                continue
            p = os.path.join(self.path, ver, f"{_BUCKET_COL}={b}")
            if self.fs.isdir(p):
                out.append(p)
        return out

    def _gc(self) -> None:
        referenced = set(self._pointer().values())
        versions = sorted(d for d in self.fs.listdir(self.path) if d.startswith("v_"))
        stale = [d for d in versions if d not in referenced]
        for d in stale[:-_KEEP_UNREFERENCED] if len(stale) > _KEEP_UNREFERENCED else []:
            self.fs.rmtree(os.path.join(self.path, d))

    # -- read/write -------------------------------------------------------
    def read(self, spark: SparkSession, buckets: list[int] | None = None) -> DataFrame:
        paths = self._bucket_paths(self._pointer(), buckets)
        if not paths:
            return spark.createDataFrame([], self.schema)
        return spark.read.schema(self.schema).parquet(*paths)

    def _write_version(self, df: DataFrame, n_buckets: int) -> tuple[str, list[int]]:
        """Write df (bucketed) into a new version dir; returns (version
        name, buckets actually written — empty buckets produce no dir)."""
        version_name = f"v_{int(time.time() * 1e6)}_{os.getpid()}"
        out = os.path.join(self.path, version_name)
        (
            df.withColumn(_BUCKET_COL, self._bucket_expr(n_buckets))
            # One task (and one file) per bucket: state tables are
            # metadata-sized relative to the data they track, so fewer,
            # fuller files beat 32×n_buckets fragments.
            .repartition(n_buckets, F.col(_BUCKET_COL))
            .write.mode("overwrite")
            .partitionBy(_BUCKET_COL)
            .parquet(out)
        )
        written = [
            int(d.split("=", 1)[1])
            for d in self.fs.listdir(out)
            if d.startswith(f"{_BUCKET_COL}=")
        ]
        return version_name, written

    def overwrite(self, df: DataFrame, n_buckets: int | None = None) -> None:
        n = n_buckets if n_buckets is not None else self._meta()[0]
        version_name, written = self._write_version(df, n)
        self._swap_pointer({str(b): version_name for b in written}, n_buckets=n)
        self._gc()

    def _merge_into_buckets(self, touched: list[int], replacement: DataFrame) -> None:
        """Swap the touched buckets to a freshly-written version; other
        buckets keep pointing at their current versions."""
        n, mapping = self._meta()
        version_name, written = self._write_version(replacement, n)
        for b in touched:
            mapping.pop(str(b), None)  # bucket emptied unless re-written
        for b in written:
            mapping[str(b)] = version_name
        self._swap_pointer(mapping, n_buckets=n)
        self._gc()

    def _touched_buckets(self, keys: DataFrame) -> list[int]:
        n = self._meta()[0]
        rows = (
            keys.select(self._bucket_expr(n).alias(_BUCKET_COL)).distinct().collect()
        )  # bounded by n_buckets — a constant, never data-sized
        return [r[_BUCKET_COL] for r in rows]

    # -- adaptive sharding -------------------------------------------------
    def maybe_grow(self, spark: SparkSession, max_bucket_bytes: int = 256 << 20) -> bool:
        """Double the bucket count when the average referenced bucket
        exceeds ``max_bucket_bytes`` (fixed 16 buckets under-shards a
        100 TB tracking table; doubling keeps rewrites amortized).
        Rehashing rewrites the whole table, so callers invoke this only
        BETWEEN syncs — never between a touched_buckets() and the
        merges that reuse those ids. Returns True if it grew."""
        n, mapping = self._meta()
        if not mapping or n >= 65536:
            return False
        # Sum only the bucket directories the pointer references — a
        # referenced version dir can still hold superseded bucket files
        # (remapped to newer versions but not yet GC'd); counting them
        # would trigger premature full-table rehashes.
        size = sum(self.fs.total_bytes(p) for p in self._bucket_paths(mapping))
        if size / n <= max_bucket_bytes:
            return False
        self.overwrite(self.read(spark), n_buckets=n * 2)
        return True

    def maybe_compact(
        self,
        spark: SparkSession,
        max_versions: int = 8,
        max_waste_fraction: float = 0.5,
    ) -> bool:
        """Auto-OPTIMIZE for fragmented tables (reference: LanceDB's
        fragment-count/deleted-rows compaction heuristics,
        python/cocoindex/connectors/lancedb/_target.py:368-583).

        N small syncs leave (a) each bucket pointing into its own
        version dir — the reader globs O(versions) directories — and
        (b) superseded bucket files alive inside still-referenced dirs
        (a dir stays until NO bucket references it, so its dead files
        survive the GC). Compaction rewrites the table into ONE fresh
        version — one file per bucket — when the live mapping spans
        more than ``max_versions`` dirs OR dead bytes exceed
        ``max_waste_fraction`` of referenced bytes.

        The scan is filesystem metadata only (bounded by
        versions × buckets). Same contract as maybe_grow: call only
        BETWEEN syncs. Returns True if it compacted."""
        n, mapping = self._meta()
        if not mapping:
            return False
        versions = set(mapping.values())
        trigger = len(versions) > max_versions
        if not trigger:
            live = set(self._bucket_paths(mapping))
            ref_bytes = live_bytes = 0
            for ver in versions:
                vp = os.path.join(self.path, ver)
                for d in self.fs.listdir(vp):
                    if not d.startswith(f"{_BUCKET_COL}="):
                        continue
                    p = os.path.join(vp, d)
                    b = self.fs.total_bytes(p)
                    ref_bytes += b
                    if p in live:
                        live_bytes += b
            dead = ref_bytes - live_bytes
            trigger = ref_bytes > 0 and dead / ref_bytes > max_waste_fraction
        if not trigger:
            return False
        self.overwrite(self.read(spark), n_buckets=n)
        return True

    def touched_buckets(self, keys: DataFrame) -> list[int]:
        """Bucket ids the given key rows hash into. Callers that drive
        several phase writes off one key set compute this once and pass
        it to merge_upsert / the scoped read — the ids MUST cover every
        key later merged, or unscoped buckets would swap to a version
        missing their current rows."""
        return self._touched_buckets(keys)

    def merge_upsert(self, updates: DataFrame, touched: list[int] | None = None) -> None:
        """Idempotent MERGE: new rows win over current rows on key
        equality. Repeated application of the same batch converges.
        Only buckets containing updated keys are rewritten.

        ``touched`` lets callers pass precomputed bucket ids (when the
        same key set drives several phase writes) to skip the discovery
        job. The updates are cached for the duration: their lineage is
        evaluated twice (bucket discovery + version write) and may read
        this very table's current version — caching pins the pre-swap
        snapshot."""
        updates = updates.select(*[f.name for f in self.schema.fields]).cache()
        try:
            if touched is None:
                touched = self._touched_buckets(updates)
            if not touched:
                return
            current = self.read(updates.sparkSession, touched)
            kept = current.join(
                updates.select(self.key_cols).distinct(), self.key_cols, "left_anti"
            )
            self._merge_into_buckets(touched, kept.unionByName(updates))
        finally:
            updates.unpersist()

    def delete_keys(self, keys: DataFrame) -> None:
        keys = keys.select(self.key_cols).distinct().cache()
        try:
            touched = self._touched_buckets(keys)
            if not touched:
                return
            current = self.read(keys.sparkSession, touched)
            self._merge_into_buckets(touched, current.join(keys, self.key_cols, "left_anti"))
        finally:
            keys.unpersist()


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

# decl_json: the declared target states — JSON array of
# {target_path, fp} — recorded at flush time so a replay can feed the
# reconcile diff WITHOUT deserializing the payload rows (result_json).
# At scale this is the difference between a warm run that parses the
# whole corpus's memoized payloads and one that reads two short strings
# per component; payloads are parsed only for the rare replayed rows
# the reconcile marks insert/update (recovery/divergence). Rows written
# before this column existed read as NULL and are treated as memo
# misses — they recompute once and converge to the new format.
MEMO_SCHEMA = _schema(
    ("logic_fp", "string"),
    ("args_fp", "string"),
    ("result_json", "string"),
    ("decl_json", "string"),
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

# Failure isolation (reference: a failed component is logged and
# skipped, siblings continue; UpdateStats exposes error counts —
# processing_component.mdx "What happens when a component fails").
# One row per currently-failing component; cleared on recovery.
ERRORS_SCHEMA = _schema(
    ("component_path", "string"),
    ("error", "string"),
    ("version", "long"),
)

# Two-level change detection (reference: cheap version validated before
# the content fingerprint, rust/core/src/engine/component.rs:86-101;
# data_types.mdx:37-39): per-component mapping cheap_fp → the content
# args_fp last computed under it. A cheap-fp match lets a warm run skip
# loading content entirely.
SOURCE_FP_SCHEMA = _schema(
    ("component_path", "string"),
    ("cheap_fp", "string"),
    ("args_fp", "string"),
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
        self.source_fp = ManagedTable(
            os.path.join(root, "source_fp"), ["component_path"], SOURCE_FP_SCHEMA
        )
        self.errors = ManagedTable(
            os.path.join(root, "errors"), ["component_path"], ERRORS_SCHEMA
        )

    def drop(self) -> None:
        from cocoindex_spark.state.fs import fs_for

        fs_for(self.root).rmtree(self.root)


def empty_df(spark: SparkSession, schema: StructType) -> DataFrame:
    return spark.createDataFrame([], schema)


def with_version(df: DataFrame, version: int) -> DataFrame:
    return df.withColumn("version", F.lit(version).cast("long"))
