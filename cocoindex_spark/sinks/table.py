"""Table target: the parquet-backed analog of the reference's
table-shaped sinks (postgres/sqlite/bigquery/snowflake/doris TableTarget,
e.g. python/cocoindex/connectors/postgres/_target.py:742-836 —
chunked upsert + chunked delete, convergent/idempotent).

Apply is a MERGE over the managed table keyed by the declared primary
key; deletes are anti-joins. Optional index declarations are recorded
as table metadata (declare_vector_index analog) — consumers (the
similarity operators) read them to pick an LSH bucket table.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from cocoindex_spark.state.store import ManagedTable


class TableTarget:
    def __init__(self, path: str, pk: list[str], schema: StructType):
        self.name = os.path.basename(path.rstrip("/"))
        self.path = path
        self.pk = pk
        self.schema = schema
        self._table = ManagedTable(path, pk, schema)
        self._meta_path = os.path.join(path, "_meta.json")

    def read(self, spark: SparkSession) -> DataFrame:
        return self._table.read(spark)

    def upsert(self, rows: DataFrame) -> None:
        self._table.merge_upsert(rows.select(*[f.name for f in self.schema.fields]))

    def delete(self, keys: DataFrame) -> None:
        self._table.delete_keys(keys)

    # -- schema contract (target_state.mdx:140-144 schema evolution) ----
    def stored_contract(self) -> dict | None:
        """The (pk, schema) contract recorded at last sync; None before
        the first sync."""
        meta = self._read_meta()
        return meta.get("contract")

    def store_contract(self) -> None:
        meta = self._read_meta()
        meta["contract"] = {
            "pk": self.pk,
            "columns": [[f.name, f.dataType.simpleString()] for f in self.schema.fields],
        }
        self._write_meta(meta)

    def truncate(self) -> None:
        """Destructive recreate (pk change): drop all rows."""
        spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
        self._table.overwrite(spark.createDataFrame([], self.schema))

    # -- index metadata (declare_vector_index / declare_fts_index analog)
    def declare_index(self, kind: str, column: str, **options) -> None:
        meta = self._read_meta()
        entry = {"kind": kind, "column": column, **options}
        if entry not in meta.setdefault("indexes", []):
            meta["indexes"].append(entry)
        self._write_meta(meta)

    def _write_meta(self, meta: dict) -> None:
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path)

    def indexes(self) -> list[dict]:
        return self._read_meta().get("indexes", [])

    def _read_meta(self) -> dict:
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                return json.load(f)
        return {}
