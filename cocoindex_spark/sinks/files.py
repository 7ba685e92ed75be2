"""Directory target: one real file per row — the reference's localfs
DirTarget (`python/cocoindex/connectors/localfs/_target.py:300,327,451`
`declare_file(filename, content)` + dir-tree reconcile).

Writes happen executor-side via ``foreachPartition`` (no driver loop,
no collect): each task writes its partition's files, so a 1000-executor
run fans file I/O out exactly like the reference fans out async tasks.
On a cluster the root must be a shared filesystem (NFS/FUSE-mounted
object store) — the same requirement the reference's localfs connector
has. Writes are convergent: re-writing the same content is a no-op
from the reader's perspective, and deletes of missing files are
ignored (idempotent MERGE semantics, processing_component.mdx:250-253).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class DirTarget:
    """Keyed file tree: key = relative filename, value = content."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def upsert(
        self, rows: DataFrame, filename_col: str = "filename", content_col: str = "content"
    ) -> None:
        """Write/overwrite one file per row, executor-side."""
        root = self.root
        pairs = rows.select(
            F.col(filename_col).alias("f"), F.col(content_col).alias("c")
        )

        def write_partition(it) -> None:
            for r in it:
                path = os.path.join(root, r["f"])
                os.makedirs(os.path.dirname(path) or root, exist_ok=True)
                data = r["c"]
                if isinstance(data, str):
                    data = data.encode("utf-8")
                tmp = path + ".__tmp__"
                with open(tmp, "wb") as fh:
                    fh.write(data if data is not None else b"")
                os.replace(tmp, path)  # atomic publish per file

        pairs.foreachPartition(write_partition)

    def delete(self, keys: DataFrame, filename_col: str = "filename") -> None:
        root = self.root

        def rm_partition(it) -> None:
            for r in it:
                try:
                    os.remove(os.path.join(root, r[filename_col]))
                except FileNotFoundError:
                    pass  # idempotent re-application

        keys.select(filename_col).foreachPartition(rm_partition)

    def list_files(self, spark: SparkSession) -> DataFrame:
        """Current tree as DF(filename, size) — the reconcile read side.
        Column pruning keeps the binaryFile scan content-free."""
        from cocoindex_spark.sources.localfs import scan_dir

        return scan_dir(spark, self.root).select(
            F.col("relpath").alias("filename"), "size"
        )

    def read_files(self, spark: SparkSession) -> DataFrame:
        from cocoindex_spark.sources.localfs import scan_dir

        return scan_dir(spark, self.root).select(
            F.col("relpath").alias("filename"), "content"
        )
