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
