"""Query registry: every operator from SURVEY.md §2 exposed as a named
(spark, sf_dir) -> DataFrame callable plus (where SQL-expressible) a
DuckDB oracle string over the same parquet tables.

Import side effects populate the registry; `all_queries()` /
`all_oracles()` are consumed by `__spark_entry__.py`.
"""

from __future__ import annotations

from cocoindex_spark.queries.registry import all_oracles, all_queries

# Populate the registry.
from cocoindex_spark.queries import relational  # noqa: F401,E402
from cocoindex_spark.queries import vector  # noqa: F401,E402
from cocoindex_spark.queries import dedup  # noqa: F401,E402
from cocoindex_spark.queries import textq  # noqa: F401,E402
from cocoindex_spark.queries import dataflow  # noqa: F401,E402
from cocoindex_spark.queries import streamingq  # noqa: F401,E402
from cocoindex_spark.queries import multimodalq  # noqa: F401,E402
from cocoindex_spark.queries import codeq  # noqa: F401,E402
from cocoindex_spark.queries import pipelineq  # noqa: F401,E402
from cocoindex_spark.queries import graphq  # noqa: F401,E402
from cocoindex_spark.queries import ftsq  # noqa: F401,E402
from cocoindex_spark.queries import sketchq  # noqa: F401,E402
from cocoindex_spark.queries import quickstart  # noqa: F401,E402

__all__ = ["all_queries", "all_oracles"]
