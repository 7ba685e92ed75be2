"""Connector-library tests: graph target, topic target, object-store
source, JDBC spec, user state — the rebuild's analog of the reference's
connector E2E suite (python/tests/connectors/, SURVEY.md §5.2):
assert final backend contents after insert/update/delete cycles.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from cocoindex_spark.engine.app import App
from cocoindex_spark.sinks.graph import GraphTarget
from cocoindex_spark.sinks.topic import TopicTarget
from cocoindex_spark.sources.jdbc import JdbcTableSource
from cocoindex_spark.sources.object_store import cheap_fingerprint, list_objects


def _node_schema():
    return StructType.fromDDL("id string, label string, name string")


def _edge_schema():
    return StructType.fromDDL("src string, dst string, rel string, weight long")


def test_graph_upsert_and_cascade_delete(spark, tmp_state):
    g = GraphTarget(os.path.join(tmp_state, "g"), _node_schema(), _edge_schema())
    nodes = spark.createDataFrame(
        [("a", "person", "Ann"), ("b", "person", "Bob"), ("c", "org", "Corp")],
        _node_schema(),
    )
    g.upsert_nodes(nodes)
    edges = spark.createDataFrame(
        [("a", "b", "knows", 1), ("a", "c", "works_at", 2), ("x", "a", "ghost", 3)],
        _edge_schema(),
    )
    # dangling edge (x) dropped by endpoint validation
    g.upsert_edges(edges)
    got = {(r.src, r.dst, r.rel) for r in g.read_edges(spark).collect()}
    assert got == {("a", "b", "knows"), ("a", "c", "works_at")}

    # upsert is idempotent + updates props on key match
    g.upsert_edges(spark.createDataFrame([("a", "b", "knows", 9)], _edge_schema()))
    row = g.read_edges(spark).filter("rel = 'knows'").collect()[0]
    assert row.weight == 9
    assert g.read_edges(spark).count() == 2

    # degrees
    deg = {r.id: (r.out_degree, r.in_degree) for r in g.degrees(spark).collect()}
    assert deg["a"] == (2, 0) and deg["b"] == (0, 1) and deg["c"] == (0, 1)

    # node delete cascades incident edges (relationship cleanup)
    g.delete_nodes(spark.createDataFrame([("b",)], "id string"))
    assert {r.id for r in g.read_nodes(spark).collect()} == {"a", "c"}
    assert {(r.src, r.dst) for r in g.read_edges(spark).collect()} == {("a", "c")}


def test_topic_compaction_last_wins_and_tombstone(spark, tmp_state):
    t = TopicTarget(os.path.join(tmp_state, "topic"))
    t.produce(
        spark.createDataFrame([("k1", "v1"), ("k2", "v2")], "k string, v string"), "k", "v"
    )
    t.produce(spark.createDataFrame([("k1", "v1b")], "k string, v string"), "k", "v")
    t.produce_tombstones(spark.createDataFrame([("k2",)], "k string"), "k")

    state = {r.key: r.value for r in t.read_compacted(spark).collect()}
    # k2 tombstoned away; k1 shows the newest value (last-writer-wins)
    assert set(state) == {"k1"}
    assert "v1b" in state["k1"]
    # the raw log keeps everything (append-only)
    assert t.read_log(spark).count() == 4


def test_topic_offsets_deterministic_replay(spark, tmp_state):
    """Replaying an identical batch must assign identical within-batch
    per-key ordinals (byte-stable modulo the batch seq) — the old
    monotonically_increasing_id ordering was plan-dependent. Batch seqs
    are strictly increasing with a stride larger than any per-key
    count, so two produce calls can never interleave offsets."""
    rows = [("k1", f"o{i}", f"v{i}") for i in range(10)] + [("k2", "o0", "w")]
    df = spark.createDataFrame(rows, "k string, o string, v string").repartition(8)

    t1 = TopicTarget(os.path.join(tmp_state, "t1"))
    t2 = TopicTarget(os.path.join(tmp_state, "t2"))
    for t in (t1, t2):
        t.produce(df, "k", "v", ordinal_col="o")

    def rel_offsets(t):
        log = t.read_log(spark).collect()
        base = min(r.offset for r in log)
        return sorted((r.key, r.value, r.offset - base) for r in log)

    assert rel_offsets(t1) == rel_offsets(t2)

    # last-wins respects the caller's ordinal, not plan order
    assert "v9" in {r.value for r in t1.read_compacted(spark).collect() if r.key == "k1"}.pop()

    # consecutive batches never collide even when produced back-to-back:
    # offsets are unique per key (each key is its own partition-let —
    # the read_compacted ordering domain), and the second batch's
    # offsets all sort after the first's for the same key
    t1.produce(df, "k", "v", ordinal_col="o")
    per_key = {}
    for r in t1.read_log(spark).collect():
        per_key.setdefault(r.key, []).append(r.offset)
    for key, offs in per_key.items():
        assert len(offs) == len(set(offs)), key


def test_topic_counter_seeds_above_legacy_offsets(spark, tmp_state):
    """Upgrade path: a topic dir written under the old raw-timestamp
    offset scheme has offsets ~1.7e15; the first produce under the
    counter scheme must seed past them or last-writer-wins would
    resolve to the stale pre-upgrade records."""
    path = os.path.join(tmp_state, "legacy_topic")
    t = TopicTarget(path)
    legacy_off = 1_755_000_000_000_000  # microsecond-timestamp era
    spark.createDataFrame(
        [(legacy_off, "k1", '{"v":"old"}', False)],
        "offset LONG, key STRING, value STRING, tombstone BOOLEAN",
    ).write.mode("append").parquet(path)

    t.produce(spark.createDataFrame([("k1", "new")], "k STRING, v STRING"), "k", "v")
    state = {r.key: r.value for r in t.read_compacted(spark).collect()}
    assert "new" in state["k1"]  # the post-upgrade write wins


def test_object_store_listing_and_cheap_fp(spark, tmp_path):
    (tmp_path / "a.txt").write_text("hello")
    (tmp_path / "b.md").write_text("world")
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "c.txt").write_text("deep")

    df = list_objects(spark, f"file://{tmp_path}", glob="*.txt")
    paths = sorted(r.path.split("/")[-1] for r in df.collect())
    assert paths == ["a.txt", "c.txt"]  # glob filter + recursive lookup
    assert {r.size for r in df.collect()} == {5, 4}  # "hello", "deep"

    fp = cheap_fingerprint(df.drop("content"))
    fps = [r.cheap_fp for r in fp.collect()]
    assert len(set(fps)) == 2 and all(len(x) == 64 for x in fps)


def test_jdbc_partitioned_options():
    src = JdbcTableSource(
        url="jdbc:postgresql://db/x",
        table="public.items",
        key_cols=["id"],
        partition_col="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
    )
    opts = src.options_for()
    assert opts["partitionColumn"] == "id" and opts["numPartitions"] == "16"
    with pytest.raises(ValueError):
        JdbcTableSource(
            url="u", table="t", key_cols=["id"], partition_col="id"
        ).options_for()


def test_user_state_roundtrip(spark, tmp_state):
    app = App("stateapp", tmp_state, spark)
    assert app.get_state("comp/1", "cursor", default=0) == 0
    app.set_state("comp/1", "cursor", {"offset": 42})
    app.set_state("comp/2", "cursor", {"offset": 7})
    assert app.get_state("comp/1", "cursor")["offset"] == 42
    # overwrite on same key
    app.set_state("comp/1", "cursor", {"offset": 43})
    assert app.get_state("comp/1", "cursor")["offset"] == 43

    bulk = spark.createDataFrame(
        [("comp/3", '{"offset": 1}')], "component_path string, value_json string"
    )
    app.set_states(bulk, "cursor")
    assert app.get_states("cursor").count() == 3
    app.drop()


def test_dir_target_file_reconcile(spark, tmp_path):
    """DirTarget: declare_file semantics — upsert writes real files,
    delete removes them, re-application is idempotent."""
    from cocoindex_spark.sinks.files import DirTarget

    root = str(tmp_path / "site")
    t = DirTarget(root)
    rows = spark.createDataFrame(
        [("a.txt", "alpha"), ("sub/b.txt", "beta")], "filename STRING, content STRING"
    )
    t.upsert(rows)
    got = {r.filename: bytes(r.content).decode() for r in t.read_files(spark).collect()}
    assert got == {"a.txt": "alpha", "sub/b.txt": "beta"}

    # overwrite + idempotent re-apply
    rows2 = spark.createDataFrame([("a.txt", "ALPHA")], "filename STRING, content STRING")
    t.upsert(rows2)
    t.upsert(rows2)
    got = {r.filename: bytes(r.content).decode() for r in t.read_files(spark).collect()}
    assert got["a.txt"] == "ALPHA" and got["sub/b.txt"] == "beta"

    # delete (idempotent, missing files ignored)
    dead = spark.createDataFrame([("sub/b.txt",), ("ghost.txt",)], "filename STRING")
    t.delete(dead)
    t.delete(dead)
    assert {r.filename for r in t.list_files(spark).collect()} == {"a.txt"}


def test_table_target_index_metadata(spark, tmp_path):
    """declare_vector_index analog: index declarations persist as table
    metadata and dedupe on re-declaration."""
    from pyspark.sql.types import StructType

    from cocoindex_spark.sinks.table import TableTarget

    t = TableTarget(
        str(tmp_path / "vecs"), ["id"], StructType.fromDDL("id STRING, emb ARRAY<FLOAT>")
    )
    t.declare_index("ivf", "emb", metric="cosine", nlist=64)
    t.declare_index("ivf", "emb", metric="cosine", nlist=64)  # idempotent
    t.declare_index("lsh", "emb", metric="cosine", bits=8)
    kinds = [(i["kind"], i["column"]) for i in t.indexes()]
    assert kinds == [("ivf", "emb"), ("lsh", "emb")]


# --- PartitionedSqlSource: the JDBC partition plan, EXECUTED against a
#     real database (sqlite3) — per-partition range WHERE, NULL-key and
#     out-of-bounds coverage, column pruning and filter pushdown all in
#     the SQL each executor task runs on its own connection.


class TestPartitionedSqlSource:
    @staticmethod
    def _mk_db(path, n=200):
        import sqlite3

        con = sqlite3.connect(path)
        con.execute("CREATE TABLE items (id INTEGER, name TEXT, score INTEGER)")
        rows = [(i, f"n{i}", i * 3 % 97) for i in range(n)]
        rows.append((None, "null_key", 7))   # NULL partition key
        rows.append((10_000, "beyond", 1))   # above upperBound
        rows.append((-5, "below", 2))        # below lowerBound
        con.executemany("INSERT INTO items VALUES (?,?,?)", rows)
        con.commit()
        con.close()

    def test_predicates_cover_everything(self):
        from cocoindex_spark.sources.jdbc import partition_predicates

        preds = partition_predicates("id", 0, 100, 4)
        assert preds[0] == "id < 25 OR id IS NULL"
        assert preds[-1] == "id >= 75"
        assert len(preds) == 4
        # degenerate ranges collapse to a full scan, never an error
        assert partition_predicates("id", 5, 6, 8) == ["1=1"]
        assert partition_predicates("id", 0, 0, 4) == ["1=1"]

    def test_executed_read_matches_table(self, spark, tmp_path):
        from cocoindex_spark.sources.jdbc import PartitionedSqlSource

        db = str(tmp_path / "items.db")
        self._mk_db(db)
        src = PartitionedSqlSource(
            db_path=db, table="items", key_cols=["id"],
            schema="id BIGINT, name STRING, score BIGINT",
            partition_col="id", lower_bound=0, upper_bound=200,
            num_partitions=4,
        )
        df = src.read(spark)
        assert df.rdd.getNumPartitions() == 4
        got = df.collect()
        # bounds split, they do not filter: NULL key, below- and
        # above-range rows are all present exactly once
        assert len(got) == 203
        names = [r["name"] for r in got]
        assert names.count("null_key") == 1
        assert names.count("beyond") == 1
        assert names.count("below") == 1

    def test_pruning_and_pushdown_in_sql(self, spark, tmp_path):
        from cocoindex_spark.sources.jdbc import PartitionedSqlSource

        db = str(tmp_path / "items.db")
        self._mk_db(db)
        src = PartitionedSqlSource(
            db_path=db, table="items", key_cols=["id"],
            schema="id BIGINT, score BIGINT",
            partition_col="id", lower_bound=0, upper_bound=200,
            num_partitions=3, columns=["id", "score"], where="score > 50",
        )
        stmts = src.partition_sql()
        assert all("SELECT id, score FROM items" in s for s in stmts)
        assert all("score > 50" in s for s in stmts)
        got = src.read(spark).collect()
        import sqlite3

        con = sqlite3.connect(db)
        expect = con.execute(
            "SELECT COUNT(*) FROM items WHERE score > 50"
        ).fetchone()[0]
        con.close()
        assert len(got) == expect
        assert all(set(r.asDict().keys()) == {"id", "score"} for r in got[:1])
