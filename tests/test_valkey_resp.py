"""ValkeyRespTarget (sinks/valkey_resp.py) against a recording RESP
server: protocol framing, the atomic DEL+HSET upsert envelope, f32
vector packing, pipelining, deletes, and -ERR surfacing."""

from __future__ import annotations

import socketserver
import struct
import threading

import pytest
from pyspark.sql.types import StructType

from cocoindex_spark.sinks.valkey_resp import (
    ValkeyRespTarget,
    encode_command,
    pack_f32,
)


class _RespHandler(socketserver.StreamRequestHandler):
    """Parses RESP command arrays, records them, replies like a server."""

    def _read_command(self):
        line = self.rfile.readline()
        if not line:
            return None
        assert line[:1] == b"*", line
        n = int(line[1:].strip())
        args = []
        for _ in range(n):
            hdr = self.rfile.readline()
            assert hdr[:1] == b"$"
            ln = int(hdr[1:].strip())
            args.append(self.rfile.read(ln))
            self.rfile.read(2)  # \r\n
        return args

    def handle(self):
        while True:
            cmd = self._read_command()
            if cmd is None:
                return
            name = cmd[0].decode().upper()
            self.server.commands.append([name] + cmd[1:])
            if self.server.fail_on and name == self.server.fail_on:
                self.wfile.write(b"-ERR injected failure\r\n")
            elif name == "MULTI":
                self.wfile.write(b"+OK\r\n")
            elif name == "EXEC":
                self.wfile.write(b"*2\r\n:1\r\n:1\r\n")
            else:  # DEL / HSET queued inside MULTI or standalone DEL
                self.wfile.write(b"+QUEUED\r\n" if name in ("DEL", "HSET") else b":1\r\n")
            self.wfile.flush()


@pytest.fixture()
def resp_server():
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _RespHandler)
    srv.commands = []
    srv.fail_on = None
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv
    srv.shutdown()


def _target(srv, **kw):
    return ValkeyRespTarget(
        "idx",
        ["doc_id"],
        StructType.fromDDL("doc_id LONG, embedding ARRAY<FLOAT>, title STRING"),
        "127.0.0.1",
        srv.server_address[1],
        vector_col="embedding",
        num_writers=2,
        **kw,
    )


def test_upsert_envelope_and_packing(spark, resp_server):
    t = _target(resp_server)
    df = spark.createDataFrame([(7, [1.0, 2.5], "hello")], t.schema)
    t.upsert(df)
    names = [c[0] for c in resp_server.commands]
    # the atomic envelope, in order: MULTI, DEL, HSET, EXEC
    assert names == ["MULTI", "DEL", "HSET", "EXEC"]
    _, del_cmd, hset_cmd, _ = resp_server.commands
    assert del_cmd[1] == b"idx:7"
    assert hset_cmd[1] == b"idx:7"
    kv = dict(zip(hset_cmd[2::2], hset_cmd[3::2]))
    assert kv[b"title"] == b"hello"
    assert kv[b"embedding"] == struct.pack("<2f", 1.0, 2.5)  # f32-LE wire form


def test_delete_framing(spark, resp_server):
    t = _target(resp_server)
    t.delete(spark.createDataFrame([(1,), (2,)], "doc_id LONG"))
    dels = [c for c in resp_server.commands if c[0] == "DEL"]
    keys = {k for c in dels for k in c[1:]}
    assert keys == {b"idx:1", b"idx:2"}


def test_pipelining_batches_replies(spark, resp_server):
    t = _target(resp_server, docs_per_pipeline=2)
    df = spark.createDataFrame(
        [(i, [float(i)], f"t{i}") for i in range(6)], t.schema
    )
    t.upsert(df)
    hsets = [c for c in resp_server.commands if c[0] == "HSET"]
    assert {c[1] for c in hsets} == {b"idx:%d" % i for i in range(6)}


def test_err_reply_raises(spark, resp_server):
    resp_server.fail_on = "HSET"
    from py4j.protocol import Py4JJavaError

    t = _target(resp_server)
    df = spark.createDataFrame([(1, [0.1], "x")], t.schema)
    with pytest.raises(Py4JJavaError, match="valkey error reply"):
        t.upsert(df)


def test_resp_encoding_binary_safe():
    raw = encode_command("HSET", "k", b"\x00\xff\r\n")
    assert b"$4\r\n\x00\xff\r\n\r\n" in raw
    assert pack_f32([1.0]) == struct.pack("<1f", 1.0)
