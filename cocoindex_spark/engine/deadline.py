"""Cooperative deadlines for Spark actions (reference:
python/cocoindex/_internal/deadline.py — deadline propagation with
check_cancellation; rust/sdk/cocoindex/tests/deadline.rs).

The reference propagates a deadline through the component tree and
user code polls ``check_cancellation``. On Spark the unit of
cancellation is the job group: ``with_deadline`` runs a driver-side
action (anything that triggers jobs — collect, write, count) inside a
dedicated job group and cancels the whole group when the budget
expires, which interrupts every task of every job the action spawned.
That is the engine-level analog — cooperative within Spark's task
interruption model, no reaper thread per task.
"""

from __future__ import annotations

import threading
import uuid
from collections.abc import Callable
from typing import TypeVar

from pyspark.sql import SparkSession

T = TypeVar("T")


class DeadlineExceeded(TimeoutError):
    """Raised when the action's job group was cancelled at deadline."""


def with_deadline(
    spark: SparkSession,
    action: Callable[[], T],
    timeout_sec: float,
    description: str = "deadline-scoped action",
) -> T:
    """Run ``action`` under a deadline; cancel its Spark jobs on expiry.

    The action runs on the calling thread (job-group tags are
    thread-local, so the jobs it spawns are tagged); a timer thread
    cancels the group at the deadline. Raises :class:`DeadlineExceeded`
    if the deadline fired — whether or not the cancellation surfaced as
    a Spark exception first.
    """
    sc = spark.sparkContext
    group = f"deadline-{uuid.uuid4().hex[:12]}"
    fired = threading.Event()

    def cancel() -> None:
        fired.set()
        sc.cancelJobGroup(group)

    timer = threading.Timer(timeout_sec, cancel)
    sc.setJobGroup(group, description, interruptOnCancel=True)
    timer.start()
    try:
        result = action()
        if fired.is_set():
            raise DeadlineExceeded(
                f"{description!r} exceeded {timeout_sec}s deadline"
            )
        return result
    except DeadlineExceeded:
        raise
    except Exception as exc:
        if fired.is_set():
            raise DeadlineExceeded(
                f"{description!r} exceeded {timeout_sec}s deadline"
            ) from exc
        raise
    finally:
        timer.cancel()
        # Clear the thread-local group so later jobs aren't tagged.
        sc.setJobGroup("", "", interruptOnCancel=False)
