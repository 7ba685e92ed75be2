"""Qdrant REST point sink — the vector-store wire dialect
(reference: python/cocoindex/connectors/qdrant/_target.py:240-315 —
point-level upsert via client.upsert, deletes via PointIdsList; the
engine tracks per-point fingerprints, so the sink only ever receives
the delta).

Protocol (public Qdrant REST API):
- upsert: ``PUT /collections/{c}/points?wait=true`` with
  ``{"points": [{"id", "vector", "payload"}]}``
- delete: ``POST /collections/{c}/points/delete?wait=true`` with
  ``{"points": [id, ...]}``

Spark-first shape, same as the SQL/stream-load sinks: executor-side
``foreachPartition``, chunked requests, nothing driver-side. Qdrant
point upserts are idempotent by id — retries and replays converge,
which is the contract the engine's MERGE phase assumes.

Point ids: Qdrant accepts unsigned ints or UUIDs. Integer keys pass
through; any other key becomes a deterministic UUID5 of its string
form, so the same component always writes the same point — rename
detection and deletes keep working across runs.

Tests run against a recording ``http.server``
(tests/test_qdrant_http.py); no Qdrant ships in this container, so the
protocol framing — paths, bodies, chunking, id mapping — is the tested
contract (the same standard as the Doris stream-load sink).
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame
from pyspark.sql.types import IntegralType, StructType

_NAMESPACE = uuid.UUID("6ba7b810-9dad-11d1-80b4-00c04fd430c8")  # uuid.NAMESPACE_DNS


def point_id(value) -> int | str:
    """Deterministic Qdrant point id for an arbitrary key value."""
    if isinstance(value, int) and value >= 0:
        return value
    return str(uuid.uuid5(_NAMESPACE, str(value)))


def _request(url: str, method: str, body: dict) -> None:
    import urllib.request

    req = urllib.request.Request(
        url, data=json.dumps(body).encode(), method=method
    )
    req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req) as resp:
        raw = resp.read()
        try:
            payload = json.loads(raw) if raw else {}
        except ValueError:
            payload = {}
        # Qdrant reports {"status": "ok" | {"error": ...}}
        status = payload.get("status", "ok")
        if status != "ok" and not (
            isinstance(status, str) and status in ("ok", "accepted")
        ):
            raise RuntimeError(f"qdrant request failed: {url} -> {payload}")


class QdrantHttpTarget:
    """TableTarget-contract sink speaking the Qdrant REST dialect.

    ``pk`` must be a single column (the point id); ``vector_col`` names
    the ``array<float>`` column; every other schema column rides in the
    point payload.
    """

    def __init__(
        self,
        name: str,
        pk: list[str],
        schema: StructType,
        endpoint: str,
        vector_col: str = "embedding",
        points_per_request: int = 512,
        num_writers: int = 8,
    ):
        if len(pk) != 1:
            raise ValueError("qdrant points have a single id: pk must be one column")
        self.name = name
        self.pk = pk
        self.schema = schema
        self.endpoint = endpoint.rstrip("/")
        self.vector_col = vector_col
        self.points_per_request = points_per_request
        self._num_writers = num_writers
        self._int_key = isinstance(schema[pk[0]].dataType, IntegralType)

    @property
    def upsert_url(self) -> str:
        return f"{self.endpoint}/collections/{self.name}/points?wait=true"

    @property
    def delete_url(self) -> str:
        return f"{self.endpoint}/collections/{self.name}/points/delete?wait=true"

    def upsert(self, rows: DataFrame) -> None:
        key = self.pk[0]
        vec = self.vector_col
        payload_cols = [
            f.name for f in self.schema.fields if f.name not in (key, vec)
        ]
        url, chunk = self.upsert_url, self.points_per_request

        def write_partition(it) -> None:
            buf: list[dict] = []

            def flush() -> None:
                if buf:
                    _request(url, "PUT", {"points": list(buf)})
                    buf.clear()

            for row in it:
                buf.append(
                    {
                        "id": point_id(row[key]),
                        "vector": [float(x) for x in (row[vec] or [])],
                        "payload": {c: row[c] for c in payload_cols},
                    }
                )
                if len(buf) >= chunk:
                    flush()
            flush()

        (
            rows.select(key, vec, *payload_cols)
            .dropDuplicates([key])
            .repartition(self._num_writers, key)
            .foreachPartition(write_partition)
        )

    def delete(self, keys: DataFrame) -> None:
        key = self.pk[0]
        url, chunk = self.delete_url, self.points_per_request

        def delete_partition(it) -> None:
            buf: list = []

            def flush() -> None:
                if buf:
                    _request(url, "POST", {"points": list(buf)})
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
