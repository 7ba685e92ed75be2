"""Reconcile classification semantics (execution.rs:917-1141):
insert/update/delete/noop, multi-possible-previous-states, forced
reprocess, may_be_missing."""

from __future__ import annotations

from cocoindex_spark.engine.reconcile import reconcile
from cocoindex_spark.state.store import TRACKING_SCHEMA


def _desired(spark, rows):
    return spark.createDataFrame(
        rows, "component_path STRING, target_path STRING, fp STRING, payload STRING"
    )


def _tracked(spark, rows):
    # rows: (component_path, target_path, fp, possible_fps, may_be_missing, version, pending)
    return spark.createDataFrame(rows, TRACKING_SCHEMA)


def _actions(plan):
    return {r["target_path"]: r["action"] for r in plan.actions.collect()}


def test_classification(spark):
    desired = _desired(
        spark,
        [
            ("c/1", "t/1", "fpA", "v1"),  # tracked same fp -> noop
            ("c/2", "t/2", "fpB2", "v2"),  # tracked different fp -> update
            ("c/3", "t/3", "fpC", "v3"),  # untracked -> insert
        ],
    )
    tracked = _tracked(
        spark,
        [
            ("c/1", "t/1", "fpA", ["fpA"], False, 1, None),
            ("c/2", "t/2", "fpB", ["fpB"], False, 1, None),
            ("c/4", "t/4", "fpD", ["fpD"], False, 1, None),  # not declared -> delete
        ],
    )
    acts = _actions(reconcile(desired, tracked))
    assert acts == {"t/1": "noop", "t/2": "update", "t/3": "insert", "t/4": "delete"}


def test_multi_possible_states_forces_update(spark):
    """After an interrupted run, tracking may hold several candidate
    fingerprints; noop only if ALL match (custom_target_connector.mdx:211)."""
    desired = _desired(spark, [("c/1", "t/1", "fpA", "v")])
    tracked = _tracked(spark, [("c/1", "t/1", "fpA", ["fpA", "fpOLD"], False, 1, None)])
    assert _actions(reconcile(desired, tracked)) == {"t/1": "update"}


def test_may_be_missing_forces_update(spark):
    desired = _desired(spark, [("c/1", "t/1", "fpA", "v")])
    tracked = _tracked(spark, [("c/1", "t/1", "fpA", ["fpA"], True, 1, None)])
    assert _actions(reconcile(desired, tracked)) == {"t/1": "update"}


def test_pending_token_forces_update(spark):
    """A stage marker left by a crashed precommit voids the noop."""
    desired = _desired(spark, [("c/1", "t/1", "fpA", "v")])
    tracked = _tracked(spark, [("c/1", "t/1", "fpA", ["fpA"], False, 1, "tok")])
    assert _actions(reconcile(desired, tracked)) == {"t/1": "update"}


def test_full_reprocess(spark):
    desired = _desired(spark, [("c/1", "t/1", "fpA", "v")])
    tracked = _tracked(spark, [("c/1", "t/1", "fpA", ["fpA"], False, 1, None)])
    assert _actions(reconcile(desired, tracked, full_reprocess=True)) == {"t/1": "update"}


def test_counts(spark):
    desired = _desired(spark, [("c/1", "t/1", "fpA", "v"), ("c/2", "t/2", "fpN", "v")])
    tracked = _tracked(spark, [("c/1", "t/1", "fpA", ["fpA"], False, 1, None)])
    counts = reconcile(desired, tracked).counts()
    assert counts == {"insert": 1, "update": 0, "delete": 0, "noop": 1}
