"""Live mode: Structured Streaming realization of the reference's
LiveComponent machinery (SURVEY.md §2.11; docs live_mode.mdx).

Design parity:

- *Write once, choose at run time* (live_mode.mdx:92,120): the SAME
  transform runs in catch-up (`Trigger.AvailableNow`) and live
  (continuous micro-batch) — both drive `App.sync_table` inside
  ``foreachBatch``.
- *Per-key coalescing* (live_component.rs:592-702): within each
  micro-batch only the newest op per key runs (``last_wins``).
- *Delete on key disappearance* (live_mode.mdx:62-64): tombstone rows
  (e.g. Kafka null payloads) reconcile to target deletes via
  ``tombstone_col``.
- *Offset commit after durable apply* (kafka/_source.py:50-146):
  foreachBatch checkpoints commit only after the batch function —
  sink MERGE + tracking commit — returns.
- *Readiness* (live_mode.mdx:60-62): ``process_all_available`` is the
  `handle.ready()` barrier; AvailableNow completion is catch-up parity.
- *auto_refresh* (live_component.py:603-657): poll-mode re-scan on an
  interval; full reconcile handles deletes implicitly.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cocoindex_spark.engine.app import App, SyncStats
from cocoindex_spark.sinks.table import TableTarget


def last_wins(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """Per-key coalescing: keep only the newest row per key by arrival
    order (offset/ts) — NOT event-time; the reference has no watermarks
    by design (SURVEY §2.11)."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


class LiveSync:
    """A mounted live component: stream → dedup → incremental sync."""

    def __init__(
        self,
        app: App,
        key_cols: list[str],
        transform: Callable[[DataFrame], DataFrame],
        target: TableTarget,
        order_cols: list[str] | None = None,
        tombstone_col: str | None = None,
    ):
        self.app = app
        self.key_cols = key_cols
        self.transform = transform
        self.target = target
        self.order_cols = order_cols
        self.tombstone_col = tombstone_col
        self.batch_stats: list[SyncStats] = []

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.order_cols:
            batch_df = last_wins(batch_df, self.key_cols, self.order_cols)
            batch_df = batch_df.drop(*[c for c in self.order_cols if c in batch_df.columns])
        stats = self.app.sync_table(
            batch_df,
            self.key_cols,
            self.transform,
            self.target,
            partial=True,
            tombstone_col=self.tombstone_col,
        )
        self.batch_stats.append(stats)

    def start(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str,
        available_now: bool = True,
        processing_time: str | None = None,
    ):
        """available_now=True ⇒ catch-up run that drains and stops
        (update() semantics); otherwise continuous micro-batches
        (update(live=True))."""
        writer = stream_df.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif processing_time:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()

    @staticmethod
    def process_all_available(query) -> None:
        """`handle.ready()` barrier: block until every pending item's
        target states are applied (api.py:148-177)."""
        query.processAllAvailable()


def auto_refresh(
    app: App,
    build_source: Callable[[], DataFrame],
    key_cols: list[str],
    transform: Callable[[DataFrame], DataFrame],
    target: TableTarget,
    interval_sec: float = 5.0,
    max_rounds: int | None = None,
    stop_when: Callable[[], bool] | None = None,
) -> list[SyncStats]:
    """Poll-mode liveness: re-scan the full snapshot on an interval;
    every round is a full reconcile, so source deletions propagate
    without change tracking (live_mode.mdx:68-95)."""
    all_stats: list[SyncStats] = []
    rounds = 0
    while True:
        stats = app.sync_table(build_source(), key_cols, transform, target)
        all_stats.append(stats)
        rounds += 1
        if max_rounds is not None and rounds >= max_rounds:
            break
        if stop_when is not None and stop_when():
            break
        time.sleep(interval_sec)
    return all_stats
