"""SqlTableTarget (wire SQL sink) tests — the TableTarget contract
exercised against a real SQL database (sqlite, the stand-in DB-API
driver; the SQL dialect is the same INSERT..ON CONFLICT the reference
sends to PostgreSQL, postgres/_target.py:742-836)."""

from __future__ import annotations

import os
import sqlite3

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from cocoindex_spark.engine.app import App
from cocoindex_spark.engine.function import fn
from cocoindex_spark.sinks.sql_table import SqlTableTarget, _sanitize


def _factory(db_path):
    def connect():
        return sqlite3.connect(db_path, timeout=30)

    return connect


def _target(tmp_state, name="t1", pk=None, ddl="k STRING, v STRING, n LONG"):
    return SqlTableTarget(
        name,
        pk or ["k"],
        StructType.fromDDL(ddl),
        _factory(os.path.join(tmp_state, "db.sqlite")),
        num_writers=2,
    )


def test_upsert_delete_roundtrip(spark, tmp_state):
    t = _target(tmp_state)
    df = spark.createDataFrame(
        [("a", "1", 1), ("b", "2", 2), ("c", "3", 3)], t.schema
    )
    t.upsert(df)
    got = {r["k"]: (r["v"], r["n"]) for r in t.read(spark).collect()}
    assert got == {"a": ("1", 1), "b": ("2", 2), "c": ("3", 3)}

    # upsert is a MERGE: same pk overwrites, repeat application converges
    df2 = spark.createDataFrame([("b", "2x", 20), ("d", "4", 4)], t.schema)
    t.upsert(df2)
    t.upsert(df2)
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got == {"a": "1", "b": "2x", "c": "3", "d": "4"}

    t.delete(spark.createDataFrame([("a",), ("d",)], "k STRING"))
    assert {r["k"] for r in t.read(spark).collect()} == {"b", "c"}


def test_chunking_small_bind_limit(spark, tmp_state):
    """A bind limit smaller than the batch forces multiple chunks per
    partition; every row must still land exactly once."""
    t = SqlTableTarget(
        "chunked",
        ["k"],
        StructType.fromDDL("k LONG, v STRING"),
        _factory(os.path.join(tmp_state, "db.sqlite")),
        bind_limit=7,  # 3 rows of 2 params per statement
        num_writers=2,
    )
    df = spark.range(100).select(F.col("id").alias("k"), F.col("id").cast("string").alias("v"))
    t.upsert(df)
    assert t.read(spark).count() == 100
    t.delete(spark.range(60).select(F.col("id").alias("k")))
    assert t.read(spark).count() == 40


def test_duplicate_pk_in_one_batch_picks_winner(spark, tmp_state):
    """Two rows with the same pk in one upsert batch must not crash the
    multi-row ON CONFLICT statement (PostgreSQL: 'cannot affect row a
    second time') — one arbitrary winner lands, like the parquet MERGE."""
    t = _target(tmp_state, name="dup")
    df = spark.createDataFrame(
        [("a", "v1", 1), ("a", "v2", 2), ("b", "x", 3)], t.schema
    )
    t.upsert(df)
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert set(got) == {"a", "b"}
    assert got["a"] in ("v1", "v2")


def test_composite_pk_delete(spark, tmp_state):
    t = _target(tmp_state, name="t2", pk=["k", "v"])
    df = spark.createDataFrame(
        [("a", "1", 1), ("a", "2", 2), ("b", "1", 3)], t.schema
    )
    t.upsert(df)
    t.delete(spark.createDataFrame([("a", "2")], "k STRING, v STRING"))
    got = {(r["k"], r["v"]) for r in t.read(spark).collect()}
    assert got == {("a", "1"), ("b", "1")}


def test_nul_sanitization(spark, tmp_state):
    assert _sanitize("a\x00b") == "ab"
    t = _target(tmp_state, name="t3")
    df = spark.createDataFrame([("k1", "has\x00nul", 1)], t.schema)
    t.upsert(df)
    assert t.read(spark).collect()[0]["v"] == "hasnul"


def test_contract_and_index_metadata(tmp_state):
    t = _target(tmp_state, name="t4")
    assert t.stored_contract() is None
    t.store_contract()
    assert t.stored_contract() == {
        "pk": ["k"],
        "columns": [["k", "string"], ["v", "string"], ["n", "bigint"]],
    }
    t.declare_index("vector", "v", metric="cosine")
    t.declare_index("vector", "v", metric="cosine")  # idempotent
    assert t.indexes() == [{"kind": "vector", "column": "v", "metric": "cosine"}]


@fn(memo=True)
def _enrich(df):
    return df.select(
        "__args_fp",
        "__component_path",
        F.col("path").alias("k"),
        F.upper(F.col("text")).alias("v"),
        F.length(F.col("text")).cast("long").alias("n"),
    )


def test_full_sync_loop_against_sql_sink(spark, tmp_state):
    """The whole engine loop (reconcile + memo + schema contract)
    running against the wire sink: cold, warm no-op, edit, delete."""
    app = App("sqlsync", state_dir=tmp_state, spark=spark)
    t = SqlTableTarget(
        "docs",
        ["k"],
        StructType.fromDDL("k STRING, v STRING, n LONG"),
        _factory(os.path.join(tmp_state, "db.sqlite")),
        num_writers=2,
    )
    src = spark.createDataFrame(
        [("a.md", "hello"), ("b.md", "world")], "path STRING, text STRING"
    )
    s1 = app.sync_table(src, ["path"], _enrich, t)
    assert s1.inserts == 2
    assert {r["k"]: r["v"] for r in t.read(spark).collect()} == {
        "a.md": "HELLO",
        "b.md": "WORLD",
    }

    s2 = app.sync_table(src, ["path"], _enrich, t)
    assert s2.memo_misses == 0 and s2.noops == 2

    src2 = spark.createDataFrame([("a.md", "hello!")], "path STRING, text STRING")
    s3 = app.sync_table(src2, ["path"], _enrich, t)
    assert s3.updates == 1 and s3.deletes == 1
    assert {r["k"]: r["v"] for r in t.read(spark).collect()} == {"a.md": "HELLO!"}
    app.drop()


# ---- MERGE dialect (BigQuery / Snowflake / DuckDB>=1.3 semantics) ----
#
# No MERGE-capable engine ships in this container (sqlite has none,
# bundled duckdb 1.0 predates MERGE), so the dialect is contract-tested
# against a DB-API fake that EXECUTES the generated statement's
# semantics over a file-backed table (file-backed + flock because
# foreachPartition runs in executor worker processes) — chunking,
# parameter order, matched-update / not-matched-insert, idempotency —
# and the statement text itself is pinned against the ANSI form those
# services accept (reference bigquery/_target.py:294,
# snowflake/_target.py:280-310).

import fcntl as _fcntl
import json as _json
import re as _re


def _merge_factory(path):
    def connect():
        class Cursor:
            def execute(self, sql, params=None):
                params = list(params or [])
                with open(path, "a+") as f:
                    _fcntl.flock(f, _fcntl.LOCK_EX)
                    f.seek(0)
                    raw = f.read()
                    state = _json.loads(raw) if raw else {"tables": {}, "stmts": []}
                    self._apply(state, sql, params)
                    f.seek(0)
                    f.truncate()
                    f.write(_json.dumps(state))

            @staticmethod
            def _apply(state, sql, params):
                state["stmts"].append(sql)
                tables = state["tables"]
                if sql.startswith("CREATE TABLE"):
                    name = _re.search(r'"([\w]+)"', sql).group(1)
                    tables.setdefault(name, {})
                    return
                if sql.startswith("MERGE INTO"):
                    m = _re.match(
                        r'MERGE INTO "(\w+)" AS tgt USING \(VALUES (.+)\) AS src '
                        r"\(([^)]+)\) ON (.+?) "
                        r"(?:WHEN MATCHED THEN UPDATE SET (.+?) )?"
                        r"WHEN NOT MATCHED THEN INSERT \(([^)]+)\) VALUES",
                        sql,
                    )
                    assert m, f"unparseable MERGE: {sql}"
                    table, values, src_cols, on, _upd, _ins = m.groups()
                    cols = [c.strip().strip('"') for c in src_cols.split(",")]
                    n = len(cols)
                    n_rows = values.count("(")
                    assert len(params) == n * n_rows, "param count mismatch"
                    pk_cols = [
                        p.split("=")[0].strip().replace("tgt.", "").strip('"')
                        for p in on.split(" AND ")
                    ]
                    tbl = tables.setdefault(table, {})
                    for i in range(n_rows):
                        row = dict(zip(cols, params[i * n : (i + 1) * n]))
                        key = "\x1f".join(str(row[c]) for c in pk_cols)
                        tbl[key] = row  # matched→update, not matched→insert
                    return
                if sql.startswith("DELETE FROM"):
                    name = _re.search(r'"(\w+)"', sql).group(1)
                    tbl = tables.setdefault(name, {})
                    if " IN " in sql:
                        for p in params:
                            tbl.pop(str(p), None)
                    elif not params:
                        tables[name] = {}
                    return
                # SELECT / meta-table writes: no-op for this fake

            def fetchone(self):
                return None

            def fetchall(self):
                return []

        class Con:
            def cursor(self):
                return Cursor()

            def commit(self):
                pass

            def close(self):
                pass

        return Con()

    return connect


def _merge_state(path):
    with open(path) as f:
        return _json.load(f)


def test_merge_dialect_statement_shape(tmp_state):
    factory = _merge_factory(os.path.join(tmp_state, "merge.json"))
    t = SqlTableTarget(
        "m1", ["k"], StructType.fromDDL("k STRING, v STRING, n LONG"),
        factory, dialect="merge", num_writers=2,
    )
    sql = t.upsert_sql(2)
    assert sql == (
        'MERGE INTO "m1" AS tgt '
        'USING (VALUES (?, ?, ?), (?, ?, ?)) AS src ("k", "v", "n") '
        'ON tgt."k" = src."k" '
        'WHEN MATCHED THEN UPDATE SET "v" = src."v", "n" = src."n" '
        'WHEN NOT MATCHED THEN INSERT ("k", "v", "n") '
        'VALUES (src."k", src."v", src."n")'
    )
    # pk-only table: no UPDATE clause (nothing to set)
    t2 = SqlTableTarget(
        "m2", ["k"], StructType.fromDDL("k STRING"),
        factory, dialect="merge",
    )
    assert "WHEN MATCHED" not in t2.upsert_sql(1)
    assert 'WHEN NOT MATCHED THEN INSERT ("k") VALUES (src."k")' in t2.upsert_sql(1)


def test_merge_dialect_upsert_delete_semantics(spark, tmp_state):
    db = os.path.join(tmp_state, "merge.json")
    t = SqlTableTarget(
        "m1", ["k"], StructType.fromDDL("k STRING, v STRING, n LONG"),
        _merge_factory(db), dialect="merge", num_writers=2, bind_limit=6,  # 2 rows/chunk
    )
    df = spark.createDataFrame(
        [("a", "1", 1), ("b", "2", 2), ("c", "3", 3), ("d", "4", 4), ("e", "5", 5)],
        t.schema,
    )
    t.upsert(df)
    tbl = _merge_state(db)["tables"]["m1"]
    assert {k: r["v"] for k, r in tbl.items()} == {
        "a": "1", "b": "2", "c": "3", "d": "4", "e": "5",
    }
    # matched rows update; repeat application converges (idempotent)
    df2 = spark.createDataFrame([("b", "2x", 20), ("f", "6", 6)], t.schema)
    t.upsert(df2)
    t.upsert(df2)
    tbl = _merge_state(db)["tables"]["m1"]
    assert tbl["b"]["v"] == "2x" and tbl["f"]["v"] == "6" and len(tbl) == 6
    # chunking respected the bind limit (3 cols x 2 rows = 6 binds max)
    merges = [s for s in _merge_state(db)["stmts"] if s.startswith("MERGE")]
    assert merges and all(s.count("(?, ?, ?)") <= 2 for s in merges)

    t.delete(spark.createDataFrame([("a",), ("f",)], "k STRING"))
    assert set(_merge_state(db)["tables"]["m1"]) == {"b", "c", "d", "e"}
