"""Connector specs: Kafka reader options + decode/tombstone semantics,
Google Drive listing/load with an injected fake client, GPU runner
resource profile (reference test strategy: deterministic injected
fakes for external services)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cocoindex_spark.sources.google_drive import (
    FOLDER_MIME,
    FakeDriveClient,
    GoogleDriveSource,
)
from cocoindex_spark.sources.kafka import KafkaTopicSource


def test_kafka_options_spec():
    src = KafkaTopicSource(
        bootstrap_servers="broker1:9092,broker2:9092",
        topic="events",
        starting_offsets="latest",
        max_offsets_per_trigger=50_000,
    )
    opts = src.options_for()
    assert opts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert opts["subscribe"] == "events"
    assert opts["startingOffsets"] == "latest"
    assert opts["maxOffsetsPerTrigger"] == "50000"
    assert opts["failOnDataLoss"] == "true"


def test_kafka_decode_and_map_semantics(spark):
    """decode/as_map_batch on a kafka-shaped frame: binary key/value to
    strings, null payload = tombstone, offset kept for last-wins."""
    raw = spark.createDataFrame(
        [
            (b"k1", b"v1", "t", 0, 10, None),
            (b"k1", b"v2", "t", 0, 11, None),
            (b"k2", None, "t", 1, 5, None),
        ],
        "key BINARY, value BINARY, topic STRING, partition INT, offset LONG, timestamp TIMESTAMP",
    )
    decoded = KafkaTopicSource.decode(raw)
    assert decoded.columns == ["key", "value", "topic", "partition", "offset", "timestamp"]
    m = {(r.key, r.offset): (r.value, r.tombstone) for r in KafkaTopicSource.as_map_batch(raw).collect()}
    assert m[("k1", 11)] == ("v2", False)
    assert m[("k2", 5)] == (None, True)

    # feed through the live-mode coalescing: newest offset wins per key
    from cocoindex_spark.streaming.live import last_wins

    latest = last_wins(KafkaTopicSource.as_map_batch(raw), ["key"], ["offset"])
    got = {r.key: r.value for r in latest.collect()}
    assert got == {"k1": "v2", "k2": None}


def test_kafka_real_reader_integration(spark):
    """INTEGRATION: build the real ``format("kafka")`` streaming reader
    end-to-end. The build container has no spark-sql-kafka jar and no
    network to fetch one (checked: 287 bundled PySpark jars, none
    kafka; DNS resolution fails), so this skips there with the probe's
    reason — on any deployment that adds the connector
    (``spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13``)
    it runs and validates the full reader construction path."""
    import pytest

    from cocoindex_spark.sources.kafka import kafka_connector_available

    if not kafka_connector_available(spark):
        pytest.skip(
            "spark-sql-kafka connector jar not on the classpath "
            "(container has no network to resolve spark.jars.packages); "
            "KafkaTopicSource.read_stream cannot execute here"
        )
    src = KafkaTopicSource(
        bootstrap_servers="localhost:9092",
        topic="events",
        max_offsets_per_trigger=500,
    )
    stream = src.read_stream(spark)
    assert stream.isStreaming
    assert set(stream.columns) == {
        "key", "value", "topic", "partition", "offset", "timestamp",
    }


def test_kafka_wire_schema_round_trip(spark):
    """The recorded wire schema (KAFKA_WIRE_SCHEMA — including
    timestampType, which the simpler shaped-frame test omits) feeds the
    whole decode → map → coalesce path; non-UTF-8-decodable keys must
    not crash the cast."""
    from cocoindex_spark.sources.kafka import KAFKA_WIRE_SCHEMA
    from cocoindex_spark.streaming.live import last_wins

    raw = spark.createDataFrame(
        [
            (b"k1", b"v-old", "t", 0, 1, None, 0),
            (b"k1", b"v-new", "t", 0, 2, None, 0),
            (b"\xff\xfe", b"bin-key", "t", 1, 3, None, 0),  # invalid UTF-8 key
            (b"gone", None, "t", 1, 4, None, 0),  # tombstone
        ],
        KAFKA_WIRE_SCHEMA,
    )
    latest = last_wins(KafkaTopicSource.as_map_batch(raw), ["key"], ["offset"])
    got = {r.key: (r.value, r.tombstone) for r in latest.collect()}
    assert got["k1"] == ("v-new", False)
    assert got["gone"] == (None, True)
    assert len(got) == 3  # binary key decoded (replacement chars), kept


def test_google_drive_listing_and_load(spark):
    src = GoogleDriveSource(FakeDriveClient, ["root"])
    listing = src.listing(spark)
    rows = {r.path: (r.mime_type, r.md5) for r in listing.collect()}
    assert set(rows) == {"a.txt", "Doc", "sub/b.md"}  # folders excluded, BFS nested
    assert rows["sub/b.md"] == ("text/markdown", "m2")

    loaded = {r.path: r.content for r in src.load(listing).collect()}
    assert loaded["a.txt"] == b"hello"
    assert loaded["sub/b.md"] == b"deep"
    assert loaded["Doc"] == b"exported:g1:text/plain"  # Docs type exported


def test_google_drive_two_level_sync(spark, tmp_state):
    """The drive source plugged into sync_table's two-level path: warm
    run lists but downloads nothing (md5 is the cheap version)."""
    from cocoindex_spark.engine.app import App
    from cocoindex_spark.engine.function import fn

    @fn(memo=True)
    def sizes(df):
        return df.select(
            "__args_fp",
            "__component_path",
            F.col("path"),
            F.length(F.col("content")).cast("long").alias("n_bytes"),
        )

    src = GoogleDriveSource(FakeDriveClient, ["root"])
    app = App("drive", state_dir=tmp_state, spark=spark)
    target = app.target(f"{tmp_state}/out", ["path"], "path STRING, n_bytes LONG")
    kw = dict(cheap_fp_cols=["md5", "mtime"], load=src.load, error_col=None)

    s1 = app.sync_table(src.listing(spark), ["path"], sizes, target, **kw)
    assert s1.inserts == 3 and s1.extra["loaded"] == 3

    s2 = app.sync_table(src.listing(spark), ["path"], sizes, target, **kw)
    assert s2.extra["loaded"] == 0 and s2.memo_misses == 0 and s2.noops == 3
    app.drop()


def test_gpu_runner_profile():
    from cocoindex_spark.operators.embed import GpuRunner

    prof = GpuRunner(gpus_per_task=0.5, cpus_per_task=2).resource_profile()
    reqs = prof.taskResources
    assert reqs["cpus"].amount == 2.0
    assert reqs["gpu"].amount == 0.5
