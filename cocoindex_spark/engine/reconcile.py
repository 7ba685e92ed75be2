"""THE core operator: diff/reconcile of declared target states against
tracked states (rust/core/src/engine/execution.rs:917-1141;
docs custom_target_connector.mdx:29-68).

Spark realization (SURVEY.md §2.5): one full-outer join of the desired
DataFrame against the tracking table on (component_path, target_path),
classified into insert/update/delete/noop action rows, then applied as
idempotent MERGEs to the sink and the tracking table.

Convergence contract (the reference's roll-forward semantics,
processing_component.mdx:248-253):

- ``possible_fps`` may hold several candidate previous fingerprints
  after an interrupted run; a no-op is only declared when ALL of them
  equal the desired fingerprint and ``may_be_missing`` is false
  (postgres/_target.py:870-875's suppression rule).
- ``may_be_missing=True`` forces a (re)write even when fingerprints
  match — used by full_reprocess and lossy child invalidation.
- Re-running any phase is safe: sink apply is an idempotent MERGE and
  tracking commit happens after sink apply, so a crash between them
  re-applies the same actions next run.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ACTION_INSERT = "insert"
ACTION_UPDATE = "update"
ACTION_DELETE = "delete"
ACTION_NOOP = "noop"


@dataclass
class ReconcilePlan:
    """Classified action rows plus the op-count metrics the reference's
    test strategy asserts on (tests/common/target_states.py Metrics)."""

    actions: DataFrame  # component_path, target_path, action, fp, payload cols...

    def counts(self) -> dict[str, int]:
        """Per-action row counts; when the desired frame carried an
        ``__is_replay`` passthrough flag, also ``__replay_upserts`` —
        the number of insert/update rows belonging to REPLAYED (memo
        hit) components, folded into this same aggregate so callers can
        gate the sink's payload fetch on it without an extra job
        (normally 0: replays reconcile to noops)."""
        agg = [F.count(F.lit(1)).alias("count")]
        has_flag = "__is_replay" in self.actions.columns
        if has_flag:
            agg.append(
                F.sum(F.when(F.col("__is_replay"), 1).otherwise(0)).alias("n_replay")
            )
        rows = self.actions.groupBy("action").agg(*agg).collect()
        out = {ACTION_INSERT: 0, ACTION_UPDATE: 0, ACTION_DELETE: 0, ACTION_NOOP: 0}
        replay_upserts = 0
        for r in rows:
            out[r["action"]] = r["count"]
            if has_flag and r["action"] in (ACTION_INSERT, ACTION_UPDATE):
                replay_upserts += int(r["n_replay"] or 0)
        if has_flag:
            out["__replay_upserts"] = replay_upserts
        return out

    def changes(self) -> DataFrame:
        return self.actions.filter(F.col("action") != ACTION_NOOP)


def reconcile(
    desired: DataFrame,
    tracked: DataFrame,
    full_reprocess: bool = False,
) -> ReconcilePlan:
    """Classify desired vs tracked target states.

    desired: component_path, target_path, fp, + payload columns.
    tracked: the tracking-table schema (possible_fps, may_be_missing).
    """
    payload_cols = [
        c for c in desired.columns if c not in ("component_path", "target_path", "fp")
    ]
    d = desired.alias("d")
    t = tracked.alias("t")
    joined = d.join(
        t,
        (F.col("d.component_path") == F.col("t.component_path"))
        & (F.col("d.target_path") == F.col("t.target_path")),
        "full_outer",
    )

    d_exists = F.col("d.target_path").isNotNull() | F.col("d.component_path").isNotNull()
    t_exists = F.col("t.target_path").isNotNull() | F.col("t.component_path").isNotNull()

    # No-op only when every possible previous fingerprint equals the
    # desired one and the state can't be missing from the sink.
    all_fps_match = (
        F.size(F.col("t.possible_fps")) > 0
    ) & F.forall(F.col("t.possible_fps"), lambda p: p == F.col("d.fp"))
    clean_noop = (
        all_fps_match
        & ~F.coalesce(F.col("t.may_be_missing"), F.lit(True))
        & F.col("t.pending_token").isNull()
    )
    if full_reprocess:
        clean_noop = F.lit(False)

    action = (
        F.when(d_exists & ~t_exists, ACTION_INSERT)
        .when(~d_exists & t_exists, ACTION_DELETE)
        .when(clean_noop, ACTION_NOOP)
        .otherwise(ACTION_UPDATE)
    )

    actions = joined.select(
        F.coalesce(F.col("d.component_path"), F.col("t.component_path")).alias("component_path"),
        F.coalesce(F.col("d.target_path"), F.col("t.target_path")).alias("target_path"),
        action.alias("action"),
        F.col("d.fp").alias("fp"),
        *[F.col(f"d.{c}").alias(c) for c in payload_cols],
    )
    return ReconcilePlan(actions=actions)


def tracking_updates(plan: ReconcilePlan, version: int) -> tuple[DataFrame, DataFrame]:
    """(upserts, delete_keys) for the tracking table after sink apply.

    Applied states collapse ``possible_fps`` to the single desired
    fingerprint and clear ``may_be_missing``/``pending_token``.
    """
    applied = plan.actions.filter(
        F.col("action").isin(ACTION_INSERT, ACTION_UPDATE)
    ).select(
        "component_path",
        "target_path",
        F.col("fp"),
        F.array(F.col("fp")).alias("possible_fps"),
        F.lit(False).alias("may_be_missing"),
        F.lit(version).cast("long").alias("version"),
        F.lit(None).cast("string").alias("pending_token"),
    )
    deletes = plan.actions.filter(F.col("action") == ACTION_DELETE).select(
        "component_path", "target_path"
    )
    return applied, deletes


def mark_pending(tracked: DataFrame, plan: ReconcilePlan, token: str) -> DataFrame:
    """Precommit stage marker (submit_session.rs:30-66 Phase 2): record
    the intent to change states so an interrupted run widens
    ``possible_fps`` instead of trusting a single fingerprint.

    Returns ONLY the changing rows (tracking-table schema) — callers
    MERGE them; untouched states never get rewritten (the bucket-scoped
    state-store path)."""
    changing = plan.changes().filter(F.col("action") != ACTION_DELETE)
    pend = changing.select(
        "component_path",
        "target_path",
        F.col("fp"),
        F.array(F.col("fp")).alias("new_fp_arr"),
    )
    prior = tracked.select(
        "component_path",
        "target_path",
        F.col("possible_fps").alias("prior_fps"),
        F.col("may_be_missing").alias("prior_missing"),
        F.col("version").alias("prior_version"),
    )
    j = pend.join(prior, ["component_path", "target_path"], "left")
    return j.select(
        "component_path",
        "target_path",
        "fp",
        F.array_union(F.coalesce(F.col("prior_fps"), F.array()), F.col("new_fp_arr")).alias(
            "possible_fps"
        ),
        F.coalesce(F.col("prior_missing"), F.lit(False)).alias("may_be_missing"),
        F.coalesce(F.col("prior_version"), F.lit(0)).cast("long").alias("version"),
        F.lit(token).alias("pending_token"),
    )
