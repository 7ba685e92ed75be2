"""cocoindex_spark: a PySpark-native incremental dataflow + query
engine with the capabilities of the reference system (see SURVEY.md).

Public API:

    from cocoindex_spark import App, fn
    app = App("demo", state_dir="/tmp/state")

    @fn(memo=True)
    def enrich(df): ...

    stats = app.sync_table(source_df, ["path"], enrich, target)
"""

from cocoindex_spark.engine.app import App, SyncStats
from cocoindex_spark.engine.context import ContextKey, ContextProvider, use_context
from cocoindex_spark.engine.function import TrackedFn, fn
from cocoindex_spark.engine.reconcile import reconcile
from cocoindex_spark.fingerprint import (
    NON_EXISTENCE,
    MemoStateOutcome,
    NonExistenceType,
    NotMemoKeyable,
    is_non_existence,
    fp_col,
    fp_logic,
    fp_value,
    register_memo_key,
)
from cocoindex_spark.sinks.table import TableTarget
from cocoindex_spark.state.store import ManagedTable, StateStore

__all__ = [
    "App",
    "SyncStats",
    "fn",
    "TrackedFn",
    "ContextKey",
    "ContextProvider",
    "use_context",
    "reconcile",
    "fp_col",
    "fp_logic",
    "fp_value",
    "NotMemoKeyable",
    "NON_EXISTENCE",
    "NonExistenceType",
    "MemoStateOutcome",
    "is_non_existence",
    "register_memo_key",
    "TableTarget",
    "ManagedTable",
    "StateStore",
]
