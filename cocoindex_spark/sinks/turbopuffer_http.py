"""Turbopuffer namespace-write sink — the serverless-vector-store wire
dialect (reference: python/cocoindex/connectors/turbopuffer/
_target.py:287-312 — one ``namespace.write`` call carrying
``upsert_rows`` and/or ``deletes``; namespaces are created implicitly
on first write, so there is no create call).

Protocol (public turbopuffer v2 REST API):
``POST /v2/namespaces/{ns}`` with
``{"upsert_rows": [{"id", "vector", ...attributes}],
   "deletes": [id, ...], "distance_metric": "cosine_distance"}``,
``Authorization: Bearer <api_key>``.

Spark-first shape: executor-side ``foreachPartition``, chunked writes,
row-level idempotency by id (a retried chunk re-asserts the same rows
— converges under the engine's MERGE contract). Non-integer keys map
to deterministic UUID5 strings, same scheme as the Qdrant sink.

Tests run against a recording ``http.server``
(tests/test_turbopuffer_http.py); the framing — path, body shape,
flattened attributes, bearer auth, chunking — is the tested contract.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from cocoindex_spark.sinks.qdrant_http import point_id


def _post(url: str, api_key: str, body: dict) -> None:
    import urllib.request

    req = urllib.request.Request(url, data=json.dumps(body).encode(), method="POST")
    req.add_header("Content-Type", "application/json")
    req.add_header("Authorization", f"Bearer {api_key}")
    with urllib.request.urlopen(req) as resp:
        raw = resp.read()
        try:
            payload = json.loads(raw) if raw else {}
        except ValueError:
            payload = {}
        if payload.get("status", "OK") not in ("OK", "ok", "success"):
            raise RuntimeError(f"turbopuffer write failed: {url} -> {payload}")


class TurbopufferHttpTarget:
    """TableTarget-contract sink over the turbopuffer write API."""

    def __init__(
        self,
        name: str,
        pk: list[str],
        schema: StructType,
        endpoint: str,
        api_key: str = "",
        vector_col: str = "embedding",
        distance_metric: str = "cosine_distance",
        rows_per_write: int = 512,
        num_writers: int = 8,
    ):
        if len(pk) != 1:
            raise ValueError("turbopuffer rows have a single id: pk must be one column")
        self.name = name
        self.pk = pk
        self.schema = schema
        self.endpoint = endpoint.rstrip("/")
        self.api_key = api_key
        self.vector_col = vector_col
        self.distance_metric = distance_metric
        self.rows_per_write = rows_per_write
        self._num_writers = num_writers

    @property
    def write_url(self) -> str:
        return f"{self.endpoint}/v2/namespaces/{self.name}"

    def upsert(self, rows: DataFrame) -> None:
        key = self.pk[0]
        vec = self.vector_col
        attrs = [f.name for f in self.schema.fields if f.name not in (key, vec)]
        url, api_key, chunk = self.write_url, self.api_key, self.rows_per_write
        metric = self.distance_metric

        def write_partition(it) -> None:
            buf: list[dict] = []

            def flush() -> None:
                if buf:
                    _post(
                        url,
                        api_key,
                        {"upsert_rows": list(buf), "distance_metric": metric},
                    )
                    buf.clear()

            for row in it:
                buf.append(
                    {
                        "id": point_id(row[key]),
                        "vector": [float(x) for x in (row[vec] or [])],
                        # attributes ride FLATTENED in the row dict —
                        # the v2 row shape (reference _row_to_upsert)
                        **{c: row[c] for c in attrs},
                    }
                )
                if len(buf) >= chunk:
                    flush()
            flush()

        (
            rows.select(key, vec, *attrs)
            .dropDuplicates([key])
            .repartition(self._num_writers, key)
            .foreachPartition(write_partition)
        )

    def delete(self, keys: DataFrame) -> None:
        key = self.pk[0]
        url, api_key, chunk = self.write_url, self.api_key, self.rows_per_write

        def delete_partition(it) -> None:
            buf: list = []

            def flush() -> None:
                if buf:
                    _post(url, api_key, {"deletes": list(buf)})
                    buf.clear()

            for row in it:
                buf.append(point_id(row[key]))
                if len(buf) >= chunk:
                    flush()
            flush()

        (
            keys.select(key)
            .distinct()
            .repartition(self._num_writers, key)
            .foreachPartition(delete_partition)
        )
