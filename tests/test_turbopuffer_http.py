"""TurbopufferHttpTarget (sinks/turbopuffer_http.py) against a
recording http.server: namespace-write path, flattened row shape,
bearer auth, delete bodies, chunking."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
from pyspark.sql.types import StructType

from cocoindex_spark.sinks.turbopuffer_http import TurbopufferHttpTarget


@pytest.fixture()
def record_server():
    received: list[dict] = []
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            with lock:
                received.append(
                    {
                        "path": self.path,
                        "auth": self.headers.get("Authorization"),
                        "body": json.loads(body),
                    }
                )
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b'{"status":"OK"}')

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}", received
    srv.shutdown()


def _target(endpoint, **kw):
    return TurbopufferHttpTarget(
        "corpus",
        ["doc_id"],
        StructType.fromDDL("doc_id LONG, embedding ARRAY<FLOAT>, lang STRING"),
        endpoint,
        api_key="tpuf-key",
        num_writers=2,
        **kw,
    )


def test_write_framing(spark, record_server):
    endpoint, received = record_server
    t = _target(endpoint, rows_per_write=2)
    df = spark.createDataFrame(
        [(i, [float(i)], f"l{i}") for i in range(5)], t.schema
    )
    t.upsert(df)
    assert all(r["path"] == "/v2/namespaces/corpus" for r in received)
    assert all(r["auth"] == "Bearer tpuf-key" for r in received)
    rows = [p for r in received for p in r["body"]["upsert_rows"]]
    assert {p["id"] for p in rows} == set(range(5))
    r0 = next(p for p in rows if p["id"] == 0)
    # attributes flattened into the row dict, not nested
    assert r0["lang"] == "l0" and r0["vector"] == [0.0]
    assert all(len(r["body"]["upsert_rows"]) <= 2 for r in received)
    assert all(r["body"]["distance_metric"] == "cosine_distance" for r in received)


def test_deletes(spark, record_server):
    endpoint, received = record_server
    t = _target(endpoint)
    t.delete(spark.createDataFrame([(4,), (9,)], "doc_id LONG"))
    ids = [i for r in received for i in r["body"]["deletes"]]
    assert set(ids) == {4, 9}
    assert all("upsert_rows" not in r["body"] for r in received)
