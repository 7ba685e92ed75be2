"""Kafka topic source: the real ``format("kafka")`` integration path
(reference: python/cocoindex/connectors/kafka/_source.py —
``topic_as_stream`` at :459 (append log of records) and
``topic_as_map`` at :482 (message key = upsert key, null payload =
delete); offset commit after durable apply at :50-146).

Spark-first: ``readStream.format("kafka")`` IS the reference's
consumer loop — Structured Streaming tracks offsets in the checkpoint
and commits them only after ``foreachBatch`` returns (the same
commit-after-apply contract), and ``maxOffsetsPerTrigger`` is the
reference's ingest throttle. The kafka connector package is not baked
into this container, so tests exercise ``options_for`` (the reader
spec) and ``decode``/``as_map_batch`` (the projection + tombstone
semantics) on synthetically-shaped frames — the same strategy as the
JDBC source; the file-backed ``TopicTarget`` analog stays the
container-testable stand-in end to end.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class KafkaTopicSource:
    """Declarative Kafka scan spec; ``read_stream``/``read_batch``
    materialize it."""

    bootstrap_servers: str
    topic: str
    starting_offsets: str = "earliest"
    max_offsets_per_trigger: int | None = None
    fail_on_data_loss: bool = True
    options: dict = field(default_factory=dict)

    def options_for(self) -> dict:
        opts = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "subscribe": self.topic,
            "startingOffsets": self.starting_offsets,
            "failOnDataLoss": str(self.fail_on_data_loss).lower(),
        }
        if self.max_offsets_per_trigger is not None:
            opts["maxOffsetsPerTrigger"] = str(self.max_offsets_per_trigger)
        opts.update(self.options)
        return opts

    @staticmethod
    def decode(df: DataFrame) -> DataFrame:
        """topic_as_stream projection (kafka/_source.py:459): the raw
        kafka frame's binary key/value decoded to strings, with the
        (topic, partition, offset, timestamp) provenance kept. A null
        payload stays null — it is the tombstone marker."""
        return df.select(
            F.col("key").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
            "topic",
            "partition",
            "offset",
            "timestamp",
        )

    @staticmethod
    def as_map_batch(df: DataFrame) -> DataFrame:
        """topic_as_map per-batch shape (kafka/_source.py:482): message
        key is the upsert key, null payload declares deletion. Feed the
        result to LiveSync with ``order_cols=["offset"]`` (per-key
        last-wins coalescing) and ``tombstone_col="tombstone"``."""
        return KafkaTopicSource.decode(df).select(
            "key",
            "value",
            "offset",
            F.col("value").isNull().alias("tombstone"),
        )

    def read_stream(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream.format("kafka")
        for k, v in self.options_for().items():
            reader = reader.option(k, v)
        return self.decode(reader.load())

    def read_batch(self, spark: SparkSession) -> DataFrame:
        """Bounded catch-up read (update() without live mode)."""
        reader = spark.read.format("kafka")
        for k, v in self.options_for().items():
            if k != "maxOffsetsPerTrigger":
                reader = reader.option(k, v)
        return self.decode(reader.load())


# The exact schema ``format("kafka")`` yields (Spark's
# KafkaSourceProvider contract) — recorded here so wire-frame tests
# and downstream code share one truth.
KAFKA_WIRE_SCHEMA = (
    "key BINARY, value BINARY, topic STRING, partition INT, offset BIGINT, "
    "timestamp TIMESTAMP, timestampType INT"
)


def kafka_connector_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector jar is on the session
    classpath. The container this repo builds in has no network and no
    bundled connector jar (287 jars ship with PySpark, none of them
    kafka), so the real ``format("kafka")`` path cannot execute here —
    this probe is what integration tests skip on, and what production
    deployments (which add the jar via ``spark.jars.packages``) pass.
    """
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False
