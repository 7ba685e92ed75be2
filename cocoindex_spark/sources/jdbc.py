"""JDBC table source: keyed rows from a relational table (reference:
`python/cocoindex/connectors/postgres/_source.py:155-240`
``PgTableSource.fetch_rows`` — typed rows via row factory, keys = PK
columns; keyed ``items()`` at `:143-153`).

Spark-first: `spark.read.jdbc` with **partitioned parallel reads** —
the reference fetches rows on one connection; at 100 TB the scan must
fan out, so the wrapper requires a numeric partition column and splits
the key range into `num_partitions` concurrent range queries (each
executor opens its own connection; predicate pushdown ships the range
WHERE clause to the database).

No JDBC driver is baked into this container, so tests exercise the
plan construction via `options_for` (pure) rather than a live DB.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcTableSource:
    """Declarative JDBC scan spec; `read()` materializes it."""

    url: str
    table: str
    key_cols: list[str]
    partition_col: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int = 8
    fetch_size: int = 10_000
    properties: dict | None = None

    def options_for(self) -> dict:
        """The reader option dict (testable without a driver)."""
        opts = {
            "url": self.url,
            "dbtable": self.table,
            "fetchsize": str(self.fetch_size),
        }
        if self.partition_col is not None:
            if self.lower_bound is None or self.upper_bound is None:
                raise ValueError("partitioned JDBC read needs lower/upper bounds")
            opts.update(
                partitionColumn=self.partition_col,
                lowerBound=str(self.lower_bound),
                upperBound=str(self.upper_bound),
                numPartitions=str(self.num_partitions),
            )
        if self.properties:
            opts.update(self.properties)
        return opts

    def read(self, spark: SparkSession) -> DataFrame:
        """items() analog: a DataFrame whose key columns are the PK."""
        reader = spark.read.format("jdbc")
        for k, v in self.options_for().items():
            reader = reader.option(k, v)
        return reader.load()
