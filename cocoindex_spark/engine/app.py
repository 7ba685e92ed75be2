"""App: the engine's top-level pipeline runner (reference:
python/cocoindex/_internal/app.py:184 `class App`,
rust/core/src/engine/app.rs:87).

`sync_table` is the Spark-first restatement of the reference's
canonical pipeline — mount_each over keyed source items, memoized
transform, declare target states, reconcile, apply — as ONE DataFrame
program (SURVEY.md §3.1 "Spark restatement"):

    keyed source DF
      → row fingerprints (change detection)
      → memo anti-join on (logic_fp, args_fp)        [skip unchanged]
      → transform() only over misses                  [the user fn]
      → union memo hits (replayed results)
      → reconcile full-outer join vs tracking         [§2.5]
      → MERGE into sink + tracking commit + memo flush

Incremental contract (BASELINE.md): warm re-run ⇒ 0 transform
invocations and all-noop reconcile; single-item edit ⇒ exactly that
item recomputed; deleted item ⇒ its target rows deleted.

Every step is a distributed DataFrame op — no driver-side loop over
items — so the same program runs unchanged on a 1000-executor cluster;
state tables shard by key hash and the memo join is a plain shuffle
(or broadcast when small).
"""

from __future__ import annotations

import os
import threading
import time
import uuid
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cocoindex_spark.engine.context import (
    ContextKey,
    ContextProvider,
    _pop_active,
    _push_active,
)
from cocoindex_spark.engine.reconcile import reconcile, tracking_updates
from cocoindex_spark.fingerprint import fp_col, fp_logic, fp_value
from cocoindex_spark.sinks.table import TableTarget
from cocoindex_spark.state.store import StateStore


# pk types whose string cast round-trips exactly through the path
# encoding (concat_ws writes the cast, _keys_from_paths casts back).
# Floats/decimals/binary/timestamps are excluded: their string reprs
# are not guaranteed bit-exact back-casts — those targets keep the
# read-based delete mapping.
_SAFE_PK_PARSE_TYPES = {
    "string", "bigint", "int", "smallint", "tinyint", "boolean", "date",
}


def _keys_from_paths(
    paths: DataFrame, target_name: str, pk: list[str], pk_types: list[str]
) -> DataFrame:
    """Recover pk value columns from target_path strings (``__tp`` =
    ``{target_name}/{pk1}/{pk2}/...``) — the delete channel for
    apply-only wire sinks that cannot be read back. Splitting is exact
    whenever the path encoding itself is unambiguous (pk string values
    containing '/' would already collide in tracking)."""
    rest = F.expr(f"substring(__tp, {len(target_name) + 2})")
    parts = F.split(rest, "/", len(pk))
    # try_cast, not cast: a NULL pk component encodes as an EMPTY
    # segment (see App._path_col), and '' must parse back to NULL
    # rather than throw under ANSI mode.
    return paths.select(
        *[
            parts.getItem(i).try_cast(pk_types[i]).alias(col)
            for i, col in enumerate(pk)
        ]
    )


@dataclass
class SyncStats:
    """Per-sync op counts — the metrics the reference's scenario tests
    assert on (tests/common/target_states.py Metrics/AtMost)."""

    memo_hits: int = 0
    memo_misses: int = 0
    inserts: int = 0
    updates: int = 0
    deletes: int = 0
    noops: int = 0
    wall_sec: float = 0.0
    extra: dict = field(default_factory=dict)


class App:
    def __init__(self, name: str, state_dir: str, spark: SparkSession | None = None):
        self.name = name
        if spark is None:
            from cocoindex_spark.session import get_spark

            spark = get_spark(f"cocoindex-{name}")
        self.spark = spark
        self.state = StateStore(os.path.join(state_dir, name))
        self.context = ContextProvider()

    # -- context DI (reference context_keys.py; docs context.mdx) ---------
    def provide(self, key: ContextKey, value):
        """Bind a context value for this app's lifetime. With
        ``detect_change=True`` on the key, the value's fingerprint
        joins the live set and memos recorded under a DIFFERENT value
        of this key stop hitting (context.mdx "Change detection").

        Provide-time memo-state validation (reference
        context_keys.py:180-200: ``state_methods`` run per provided
        value, persisted as ``context_memo_states``): a value carrying
        state methods (``__coco_memo_state__`` / registered
        ``state_fn``) runs them here against the states stored by the
        PREVIOUS provide (persisted in the engine's user-state table).
        All-valid outcomes keep the previous effective fingerprint —
        memos keep hitting even when the cheap state (an mtime, an
        ETag) refreshed; any invalid outcome mints a new fingerprint,
        so memos that consumed the key re-run even though the value's
        identity fp (e.g. a FileLike's path) never changed."""
        if not key.detect_change:
            return self.context.provide(key, value)
        import json as _json

        from cocoindex_spark.fingerprint import (
            NON_EXISTENCE,
            fp_value_with_states,
            resolve_outcomes,
        )

        base_fp, state_fns = fp_value_with_states(["context_key", key.key, value])
        if not state_fns:
            return self.context.provide(key, value, fp=base_fp)
        stored = self.get_state("__context__", key.key)
        prev = (
            stored.get("states")
            if stored is not None and stored.get("fp") == base_fp
            else None
        )
        outcomes = resolve_outcomes(
            [
                fn_(
                    prev[i]
                    if prev is not None and i < len(prev)
                    else NON_EXISTENCE
                )
                for i, fn_ in enumerate(state_fns)
            ]
        )
        new_states = _json.loads(_json.dumps([o.state for o in outcomes]))
        valid = (
            prev is not None
            and all(o.memo_valid for o in outcomes)
        )
        if valid:
            eff = stored["eff"]
            if new_states != stored.get("states"):
                self.set_state(
                    "__context__",
                    key.key,
                    {**stored, "states": new_states},
                )
        else:
            gen = (stored.get("gen", 0) + 1) if stored is not None else 0
            eff = fp_value(["context_key_state", key.key, base_fp, gen])
            self.set_state(
                "__context__",
                key.key,
                {"fp": base_fp, "states": new_states, "eff": eff, "gen": gen},
            )
        return self.context.provide(key, value, fp=eff)

    def provide_with(self, key: ContextKey, cm):
        """provide() via a context manager, closed at app.drop()."""
        return self.context.provide_with(key, cm)

    def use_context(self, key: ContextKey | str, t: type | None = None):
        return self.context.get(key, t)

    def _transform_context_fps(self, transform, source: DataFrame) -> set[str]:
        """The context fingerprints a transform's execution reads.

        Transforms are plan builders: their ``use_context()`` calls
        depend only on code, never on row values, so ONE
        plan-construction probe over an empty slice observes exactly
        the reads the real invocation makes (including reads inside
        helpers — transitive, like the reference's call-site tracking).
        Skipped entirely when no change-detected key is provided
        (zero probe cost for context-free apps). A probe that raises
        falls back to folding EVERY live fingerprint — conservative
        over-invalidation, never staleness."""
        if not self.context.has_change_detected():
            return set()
        probe = (
            source.limit(0)
            .withColumn("__args_fp", F.lit(""))
            .withColumn("__component_path", F.lit(""))
        )
        _push_active(self.context)
        try:
            with self.context.record() as rec:
                try:
                    transform(probe)
                except Exception:
                    return set(self.context.live_fps())
            return set(rec.fps)
        finally:
            _pop_active()

    # -- helpers ----------------------------------------------------------
    @staticmethod
    def _path_col(prefix: str, cols: list[str]) -> F.Column:
        # NULL pk components encode as an EMPTY segment (concat_ws
        # would silently DROP them, shifting every later segment so
        # _keys_from_paths would parse — and delete — the wrong key).
        # With the explicit encoding a NULL non-final component still
        # round-trips for non-string safe types ('' casts back to
        # NULL); NULL strings collide with '' exactly as they already
        # do in tracking.
        parts: list[F.Column] = [F.lit(prefix)]
        for c in cols:
            parts.append(F.lit("/"))
            parts.append(F.coalesce(F.col(c).cast("string"), F.lit("")))
        return F.concat(*parts)

    def target(self, path: str, pk: list[str], schema) -> TableTarget:
        from pyspark.sql.types import StructType

        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        return TableTarget(path, pk, schema)

    # -- the core sync ----------------------------------------------------
    def sync_table(
        self,
        source: DataFrame,
        key_cols: list[str],
        transform: Callable[[DataFrame], DataFrame],
        target: TableTarget,
        memo: bool = True,
        full_reprocess: bool = False,
        partial: bool = False,
        tombstone_col: str | None = None,
        validate_unique: bool = False,
        cheap_fp_cols: list[str] | None = None,
        load: Callable[[DataFrame], DataFrame] | None = None,
        error_col: str | None = None,
    ) -> SyncStats:
        """One catch-up update (app.update_blocking analog, §3.1).

        ``transform`` maps a keyed source DataFrame to target rows; it
        must carry the target's pk columns in its output and must be
        deterministic per input row (the memo contract).

        ``partial=True`` is the live/foreachBatch mode: only components
        present in this batch are reconciled (absent keys untouched —
        live_mode.mdx:56-64); a row whose ``tombstone_col`` is true
        declares key deletion (kafka topic_as_map null-payload
        semantics, live_mode.mdx:124-144).

        ``validate_unique=True`` rejects two components declaring the
        same target state in one run (the reference always errors on
        duplicate declarations, execution.rs:264-303; here it costs one
        extra aggregation job, so it's opt-in — without it the upsert
        MERGE picks an arbitrary winner among duplicates).

        ``cheap_fp_cols`` enables **two-level change detection**
        (reference: the cheap version — mtime/size/etag — is validated
        before the content fingerprint is ever computed,
        rust/core/src/engine/component.rs:86-101; data_types.mdx:37-39).
        A per-component (cheap_fp → args_fp) mapping persists in the
        state store; components whose cheap fp matches replay their
        memoized result WITHOUT touching content columns, so a warm run
        is O(listing), not O(data). With ``load`` given, ``source`` is a
        metadata-only listing and ``load`` attaches content columns to
        exactly the rows whose cheap fp missed (it must preserve its
        input columns) — at 100 TB the warm path then reads zero content
        bytes. Without ``load``, content columns may sit in ``source``
        itself; column pruning keeps them out of the cheap-hit branch's
        scan. Requires ``memo=True`` (without memoized results there is
        nothing to replay); ignored under ``full_reprocess``.

        ``error_col`` opts into **failure isolation** (the reference's
        rule: a failed component is logged and skipped, siblings
        continue — processing_component.mdx "What happens when a
        component fails"). The transform reports per-row failures by
        emitting that column (null = ok, else the error message; the
        embedder's split-retry shape). Any component with a failed row
        writes nothing — its previous target rows stay untouched, it is
        NOT memoized (so the next run retries it), and one row per
        failing component lands in the ``errors`` side table (cleared
        on recovery). ``stats.extra['errors']`` carries the count (the
        reference's UpdateStats error counts).
        """
        t0 = time.perf_counter()
        spark = self.spark
        stats = SyncStats()
        # Per-phase wall clock (ms), reported in stats.extra["phase_ms"]
        # — the reference's update-stats timing breakdown. Phases are
        # action boundaries: lazy plan construction costs nothing, so
        # each bucket attributes the jobs that ran since the previous.
        phase_ms: dict[str, int] = {}
        _last = [t0]

        def _phase(name: str) -> None:
            now = time.perf_counter()
            phase_ms[name] = phase_ms.get(name, 0) + int((now - _last[0]) * 1000)
            _last[0] = now
        version = int(time.time() * 1000)
        logic_fp = getattr(transform, "logic_fp", None) or fp_logic(transform)

        component_prefix = f"{self.name}/{target.name}"
        stats.extra["schema_evolution"] = self._ensure_target_contract(
            target, component_prefix
        )
        scope_paths = None
        if tombstone_col is not None:
            scope_paths = source.select(
                self._path_col(component_prefix, key_cols).alias("component_path")
            ).distinct()
            source = source.filter(
                ~F.coalesce(F.col(tombstone_col), F.lit(False))
            ).drop(tombstone_col)
        elif partial:
            scope_paths = source.select(
                self._path_col(component_prefix, key_cols).alias("component_path")
            ).distinct()
        # Fold change-detected context reads into the memo identity:
        # memo rows written under a context snapshot carry its combined
        # fingerprint in logic_fp, so re-providing a different value
        # makes every lookup miss (and the rows GC as dead keys) while
        # an unchanged context keeps hitting — the reference's
        # "context fps match" hit condition (execution.rs memo reuse;
        # logic_registry.rs:35) expressed as one key instead of a
        # per-row fp-set check, valid because one sync shares one
        # context snapshot across all rows.
        ctx_fps = self._transform_context_fps(transform, source)
        if ctx_fps:
            base_logic_fp = logic_fp
            logic_fp = fp_value(["ctx", logic_fp, sorted(ctx_fps)])
            # Record the folded fp in the per-transform context history
            # (one tiny idempotent upsert, context users only): gc_memo
            # reads this to sweep rows written under PREVIOUS context
            # values, whose folded fp no current lookup can address.
            self._record_ctx_history(base_logic_fp, logic_fp)
        src_cols = [c for c in source.columns]
        # NOT cached: each consumer needs a different column subset —
        # key-only joins (probe, hit/miss split) must keep parquet
        # column pruning and never read the json payload columns, which
        # a whole-frame cache would force into memory. Rows without
        # decl metadata (written before the column existed) are
        # invisible here — they recompute once and converge.
        memo_df = (
            self.state.memo.read(spark)
            .filter(F.col("logic_fp") == logic_fp)
            .filter(F.col("decl_json").isNotNull())
        )
        memo_keys = memo_df.select(F.col("args_fp").alias("__args_fp"))

        use_cheap = bool(cheap_fp_cols) and memo and not full_reprocess
        cheap_listing = None
        cheap_probe = None
        cheap_replay = None
        if use_cheap:
            if load is None:
                # Content columns live in `source` itself: derive a
                # pruned listing (keys + cheap cols only — the cache
                # below materializes every column it is given, so the
                # content must not be among them) and re-attach the
                # remaining columns by key for exactly the cheap-miss
                # rows. The content side scans once, on the miss branch
                # only.
                content_side = source.drop(
                    *[c for c in cheap_fp_cols if c not in key_cols]
                )
                listing_cols = list(
                    dict.fromkeys([*key_cols, *cheap_fp_cols])
                )
                source = source.select(*listing_cols)

                def load(df, _cs=content_side, _k=key_cols):
                    return df.join(_cs, _k, "left")

            # ---- level 1: cheap fp vs the stored source_fp map ----
            cheap_listing = (
                source.withColumn(
                    "__cheap_fp",
                    fp_col(F.lit(logic_fp), *[F.col(c) for c in cheap_fp_cols]),
                )
                .withColumn(
                    "__component_path", self._path_col(component_prefix, key_cols)
                )
                .dropDuplicates(["__component_path", "__cheap_fp"])
            )
            sfp = (
                self.state.source_fp.read(spark)
                .filter(F.col("component_path").startswith(component_prefix + "/"))
                .select(
                    F.col("component_path").alias("__component_path"),
                    F.col("cheap_fp").alias("__cheap_fp"),
                    F.col("args_fp").alias("__args_fp"),
                )
            )
            # ---- level 2: load content for cheap misses only ----
            # ONE metadata-only frame (listing ⋈ fp-map ⋈ memo keys — no
            # content column anywhere) is computed ONCE and cached; the
            # hit/miss split, the replay branch, and both cheap-path
            # counts (n_need: rows that must load content; n_cheap:
            # replays that skip content I/O entirely) all derive from it
            # as cache-backed filters. The r2/r3a shape re-executed the
            # listing ⋈ fp-map join in every downstream job (probe agg,
            # keyed materialization via need_load, desired via
            # cheap_replay) — three metadata joins per sync — which is
            # exactly why pipe_edit_cheap lost to pipe_edit on constant
            # overhead. When nothing needs loading we substitute a
            # LITERAL empty frame below: merely executing load()'s plan
            # over an empty input would still scan its right side (a
            # content join scans the content table even when the probe
            # side is empty), which is the O(data) warm cost this path
            # exists to eliminate.
            cheap_probe = (
                cheap_listing.join(sfp, ["__component_path", "__cheap_fp"], "left")
                .join(
                    memo_keys.withColumn("__in_memo", F.lit(True)), "__args_fp", "left"
                )
                .cache()
            )
            # A cheap hit only skips loading if its memoized result still
            # exists (__in_memo); a GC'd memo entry falls back to the
            # load path.
            _replayable = F.col("__args_fp").isNotNull() & F.col(
                "__in_memo"
            ).isNotNull()
            need_load = cheap_probe.filter(~_replayable).drop(
                "__args_fp", "__in_memo"
            )
            # Replays carry METADATA only (decl_json) — the fat
            # result_json column stays out of every main-path memo scan;
            # the sink phase fetches payloads bucket-scoped for exactly
            # the replayed rows that must rewrite (normally zero).
            cheap_replay = (
                cheap_probe.filter(_replayable)
                .select("__args_fp", "__component_path")
                .join(
                    memo_df.select(
                        F.col("args_fp").alias("__args_fp"), "decl_json"
                    ),
                    "__args_fp",
                    "inner",
                )
                .select("__args_fp", "__component_path", "decl_json")
            )
            n_total, n_cheap = cheap_probe.agg(
                F.count(F.lit(1)),
                F.sum(
                    F.when(
                        F.col("__args_fp").isNotNull() & F.col("__in_memo").isNotNull(),
                        1,
                    ).otherwise(0)
                ),
            ).first()
            n_cheap = int(n_cheap or 0)
            stats.extra["loaded"] = n_need = int(n_total) - n_cheap
            _phase("cheap_level")
            loaded = load(need_load) if load is not None else need_load
            if n_need == 0:
                loaded = spark.createDataFrame([], loaded.schema)
            # The content fingerprint (and the transform's view) excludes
            # the volatile cheap columns: a touched mtime with identical
            # content must memo-hit, not recompute (component.rs:97-101 —
            # the content fp is over content, the cheap version is only a
            # validation hint). Key columns are never stripped.
            volatile = set(cheap_fp_cols) - set(key_cols)
            src_cols = [
                c
                for c in loaded.columns
                if c not in ("__cheap_fp", "__component_path") and c not in volatile
            ]
            keyed = loaded.withColumn(
                "__args_fp", fp_col(F.lit(logic_fp), *[F.col(c) for c in src_cols])
            )
        else:
            keyed = source.withColumn(
                "__args_fp", fp_col(F.lit(logic_fp), *[F.col(c) for c in src_cols])
            ).withColumn("__component_path", self._path_col(component_prefix, key_cols))
        # __args_fp covers every source column (keys included), so equal
        # fingerprints ⇒ fully-identical rows ⇒ the same component.
        # Collapse them here: otherwise the memo flush would collect both
        # copies' outputs under one fingerprint and each later hit would
        # replay the doubled array (duplicate target declarations). The
        # dedup partitions by __args_fp — the same key the memo join
        # shuffles on — so the exchange is reused, not added.
        keyed = keyed.dropDuplicates(["__args_fp"])
        # Row counts ride as observations INSIDE the cached plans: the
        # metrics fire during the caches' first (full) materialization —
        # the reconcile-phase jobs that run anyway — so the stats phase
        # reads driver-side values instead of launching two more
        # cache-scan jobs per sync (keyed.count / miss_src.count). The
        # first materializing actions (duplicate-declaration check,
        # plan.counts) are full scans — group-bys over the whole frame —
        # never limit-style partial reads, so the observed counts are
        # exact.
        from pyspark.sql import Observation

        obs_keyed = Observation()
        keyed = keyed.observe(obs_keyed, F.count(F.lit(1)).alias("n"))
        keyed = keyed.cache()

        # ---- cold-start detection (r10 verdict item #3) ----
        # A freshly-created state store (first sync of a served index,
        # pipe_cold, any new App) provably holds nothing: the pointer
        # files are empty — a driver-side read, no job. Everything is
        # then a memo miss and every desired row an insert, so the memo
        # lookup joins AND the reconcile full-outer join are pure plan
        # overhead (two shuffles + their job latency) and are skipped
        # outright. Guarded on BOTH tables: a non-empty memo with empty
        # tracking (e.g. a prior run crashed after the memo flush) still
        # takes the full path, whose replay/reconcile semantics that
        # recovery depends on.
        cold_start = (
            not full_reprocess
            and self.state.tracking.is_empty()
            and self.state.memo.is_empty()
        )

        # ---- memo lookup join (§3.2: anti-join against _state/memo) ----
        if memo and not full_reprocess and not cold_start:
            hits_keys = keyed.join(
                memo_df.select(
                    F.col("args_fp").alias("__args_fp"), "decl_json"
                ),
                "__args_fp",
                "inner",
            )
            miss_src = keyed.join(memo_keys, "__args_fp", "left_anti")
        else:
            hits_keys = keyed.limit(0).withColumn(
                "decl_json", F.lit(None).cast("string")
            )
            miss_src = keyed

        obs_miss = Observation()
        miss_src = miss_src.observe(obs_miss, F.count(F.lit(1)).alias("n"))
        miss_src = miss_src.cache()
        # Run the transform ONLY over misses (always run it so we learn
        # the output schema even when everything hit). The app is the
        # active context provider for the duration: use_context() works
        # inside the transform and its helpers.
        _push_active(self.context)
        try:
            miss_out = transform(
                miss_src.select(*src_cols, "__args_fp", "__component_path")
            )
        finally:
            _pop_active()
        out_cols = [
            c for c in miss_out.columns if c not in ("__args_fp", "__component_path")
        ]
        if "__args_fp" not in miss_out.columns:
            raise ValueError("transform must preserve the __args_fp column")
        miss_out = miss_out.cache()

        # ---- failure isolation (error_col contract) ----
        failed_paths = None
        miss_out_raw = miss_out
        if error_col is not None:
            if error_col not in miss_out.columns:
                raise ValueError(
                    f"error_col {error_col!r} not in transform output columns"
                )
            out_cols = [c for c in out_cols if c != error_col]
            failed_paths = (
                miss_out.filter(F.col(error_col).isNotNull())
                .groupBy("__component_path")
                .agg(F.min(error_col).alias("error"))
                .cache()
            )
            stats.extra["errors"] = failed_paths.count()
            # Component granularity: one failed row fails the whole
            # component — none of its rows are declared or memoized.
            # (The pre-filter frame stays cached; this derives from it.)
            miss_out = miss_out.join(
                failed_paths.select("__component_path"), "__component_path", "left_anti"
            ).drop(error_col)
            miss_out = miss_out.cache()

        # ---- replay memo hits (METADATA only — payloads stay serialized)
        # Replayed components feed reconcile from the decl metadata
        # recorded at flush time: two short strings parsed per component
        # instead of the full payload array. On a warm run over 100 TB
        # that is O(components), not O(data); result_json is
        # deserialized only for the rare replayed rows the reconcile
        # marks insert/update (recovery/divergence), below in the sink
        # phase.
        from pyspark.sql.types import ArrayType, StringType
        from pyspark.sql.types import StructField as _SF
        from pyspark.sql.types import StructType as _ST

        replay_src = hits_keys.select(
            "__args_fp", "__component_path", "decl_json"
        )
        if cheap_replay is not None:
            # Cheap-fp hits never loaded content; their memoized result
            # was fetched by the replay join above.
            replay_src = replay_src.unionByName(cheap_replay)
        row_schema = miss_out.select(*out_cols).schema
        decl_schema = ArrayType(
            _ST([_SF("target_path", StringType()), _SF("fp", StringType())])
        )

        # ---- declare target states ----
        # __args_fp rides through reconcile as a passthrough column so
        # the sink phase can fetch a replayed component's payload by
        # memo key without re-deriving it.
        miss_decl = miss_out.select(
            F.col("__component_path").alias("component_path"),
            self._path_col(target.name, target.pk).alias("target_path"),
            fp_col(*[F.col(c) for c in out_cols]).alias("fp"),
            "__args_fp",
            F.lit(False).alias("__is_replay"),
        )
        hit_decl = replay_src.select(
            F.col("__component_path").alias("component_path"),
            F.explode(F.from_json(F.col("decl_json"), decl_schema)).alias("__d"),
            "__args_fp",
        ).select(
            "component_path",
            F.col("__d.target_path").alias("target_path"),
            F.col("__d.fp").alias("fp"),
            "__args_fp",
            F.lit(True).alias("__is_replay"),
        )
        desired = miss_decl.unionByName(hit_decl)

        if validate_unique:
            dup = (
                desired.groupBy("target_path")
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    f"duplicate target state declared: {dup[0]['target_path']!r} "
                    "(two components produced the same target pk this run)"
                )

        # ---- reconcile (§2.5) ----
        if cold_start:
            # Empty tracking ⇒ every desired state is an INSERT; the
            # full-outer join (a shuffle of the whole desired frame
            # against an empty scan) classifies nothing the literal
            # can't. Failed components are simply absent from desired
            # (masked above) and have no prior state to protect.
            from cocoindex_spark.engine.reconcile import (
                ACTION_INSERT,
                ReconcilePlan,
            )

            plan = ReconcilePlan(
                actions=desired.select(
                    "component_path",
                    "target_path",
                    F.lit(ACTION_INSERT).alias("action"),
                    "fp",
                    "__args_fp",
                    "__is_replay",
                )
            )
        else:
            tracked = self.state.tracking.read(spark).filter(
                F.col("component_path").startswith(component_prefix + "/")
            )
            if partial or tombstone_col is not None:
                # Live mode: reconcile only this batch's components; keys
                # not in the batch keep their tracked state untouched.
                tracked = tracked.join(F.broadcast(scope_paths), "component_path", "left_semi")
            if failed_paths is not None and stats.extra.get("errors"):
                # Failed components leave the reconcile scope entirely:
                # absent from desired AND masked from tracked, so their
                # previous target rows are neither deleted nor rewritten
                # (the reference keeps a failed child's prior state).
                tracked = tracked.join(
                    F.broadcast(
                        failed_paths.select(
                            F.col("__component_path").alias("component_path")
                        )
                    ),
                    "component_path",
                    "left_anti",
                )
            plan = reconcile(desired, tracked, full_reprocess=full_reprocess)
        plan.actions = plan.actions.cache()
        counts = plan.counts()
        _phase("transform_reconcile")
        stats.inserts = counts["insert"]
        stats.updates = counts["update"]
        stats.deletes = counts["delete"]
        stats.noops = counts["noop"]

        # memo flush: record results for every miss (even all-noop runs
        # converge their memo) — one JSON array of rows per args_fp.
        # Runs on a helper thread overlapping the sink/tracking phases
        # below (Spark schedules both job sets concurrently): the memo
        # table is independent of them, and a crash that persists memo
        # without tracking just replays the memoized result into a
        # reconcile that still sees the mismatch — convergent either
        # way (same relaxation as cross-table non-atomicity, §2.5).
        def _observed_n(obs, df) -> int:
            # plan.counts() above fully materialized the keyed/miss
            # caches, so the observations are set — a driver-side dict
            # read, not a job. Fallback: when the optimizer erased the
            # observed subtree entirely (empty-relation propagation
            # through a limit(0)/empty source drops the CollectMetrics
            # node), the metrics row is absent — count the cached frame
            # instead (trivial: it is empty or tiny in exactly those
            # cases). The absent-row probe is the NON-BLOCKING JVM
            # `getRowOrEmpty` (r5 advisor: `Observation.get` raises on
            # the installed PySpark 4.1 but BLOCKS forever on 3.x —
            # probing first makes the fallback version-independent;
            # pyproject.toml also pins pyspark>=4).
            try:
                jo = getattr(obs, "_jo", None)
                if jo is None or jo.getRowOrEmpty().isEmpty():
                    return df.count()
                return int(obs.get["n"])
            except Exception:
                return df.count()

        memo_thread = None
        memo_err: list[BaseException] = []
        if memo:
            stats.memo_misses = _observed_n(obs_miss, miss_src)
            stats.memo_hits = _observed_n(obs_keyed, keyed) - stats.memo_misses
            if use_cheap:
                # Cheap-fp replays never reached the loaded set: they are
                # memo hits that skipped content I/O entirely. n_cheap
                # came out of the same metadata job as n_need above — no
                # extra count() here.
                stats.memo_hits += n_cheap
                stats.extra["cheap_hits"] = n_cheap
            if stats.memo_misses:
                # decl_json records the declared (target_path, fp) pairs
                # so future replays feed reconcile without touching the
                # payload array (see the replay section above).
                miss_memo = (
                    miss_out.withColumn(
                        "__tp", self._path_col(target.name, target.pk)
                    )
                    .withColumn("__fp", fp_col(*[F.col(c) for c in out_cols]))
                    .groupBy("__args_fp")
                    .agg(
                        F.to_json(F.collect_list(F.struct(*out_cols))).alias(
                            "result_json"
                        ),
                        F.to_json(
                            F.collect_list(
                                F.struct(
                                    F.col("__tp").alias("target_path"),
                                    F.col("__fp").alias("fp"),
                                )
                            )
                        ).alias("decl_json"),
                    )
                    .select(
                        F.lit(logic_fp).alias("logic_fp"),
                        F.col("__args_fp").alias("args_fp"),
                        "result_json",
                        "decl_json",
                        F.lit(version).cast("long").alias("version"),
                    )
                )

                # The source_fp map rides the same helper thread: its
                # own contract says write order vs memo/tracking does
                # not matter (a missing side just falls back to
                # load+recompute next run), so serializing it after the
                # sink phases only added latency. keyed's cache was
                # materialized by the reconcile-phase jobs (plan.counts
                # runs before this point), so the thread never races
                # the content scan.
                new_sfp_bg = None
                if use_cheap and stats.extra["loaded"]:
                    new_sfp_bg = keyed.select(
                        F.col("__component_path").alias("component_path"),
                        F.col("__cheap_fp").alias("cheap_fp"),
                        F.col("__args_fp").alias("args_fp"),
                        F.lit(version).cast("long").alias("version"),
                    )

                def _flush_memo(sfp_df=new_sfp_bg) -> None:
                    try:
                        self.state.memo.merge_upsert(miss_memo)
                        if sfp_df is not None:
                            self.state.source_fp.merge_upsert(sfp_df)
                    except BaseException as e:  # re-raised on join below
                        memo_err.append(e)

                memo_thread = threading.Thread(target=_flush_memo, name="memo-flush")
                memo_thread.start()
            _phase("stats_counts")
        else:
            stats.memo_misses = _observed_n(obs_keyed, keyed)
            _phase("stats_counts")

        # ---- Phase 2 precommit: stage marker (pending_token) ----
        token = uuid.uuid4().hex
        if stats.inserts or stats.updates or stats.deletes:
            from cocoindex_spark.engine.reconcile import mark_pending

            # Only the changing rows are merged; the bucket-scoped state
            # store rewrites just the buckets those keys hash into. The
            # pending (Phase 2) and applied (Phase 4) merges share one
            # key set, so the bucket ids are discovered once, and the
            # prior-state join inside mark_pending reads only those
            # buckets — on a 100 TB run the precommit cost is ∝ delta,
            # not ∝ tracked-state size.
            if cold_start:
                # Tracking is empty and stays empty until Phase 4 (the
                # pending merge below is update-only and cold syncs have
                # none), so the Phase-4 merge takes the empty-table
                # overwrite path and never consults bucket ids — the
                # discovery job would be pure overhead.
                bks = None
            else:
                upsert_keys = (
                    plan.changes()
                    .filter(F.col("action") != "delete")
                    .select("component_path", "target_path")
                )
                bks = self.state.tracking.touched_buckets(upsert_keys)
            _phase("precommit_buckets")
            if stats.updates:
                pending = mark_pending(
                    self.state.tracking.read(spark, bks), plan, token
                )
                self.state.tracking.merge_upsert(pending, touched=bks)
                _phase("precommit_merge")
            # Pure-insert (or insert+delete) syncs skip the pending
            # merge entirely: the marker exists to widen possible_fps
            # when an UPDATE may or may not have reached the sink, but
            # an insert has no prior state to mis-trust — a crash
            # anywhere re-classifies it as insert next run and the
            # idempotent sink MERGE converges (phase order guarantees
            # tracking rows are only written AFTER sink apply). On a
            # cold 100 TB load this removes one full state-table merge.

            # ---- Phase 3 sink apply (idempotent MERGE) ----
            # Label-deduplicating sinks (stream-load shape) need the run
            # version folded into their load labels: retries within this
            # sync stay idempotent, later syncs re-sending identical
            # bytes aren't silently dropped by the server's label dedup.
            if hasattr(target, "set_sync_version"):
                target.set_sync_version(version)
            upserts = plan.actions.filter(F.col("action").isin("insert", "update"))
            if stats.inserts or stats.updates:
                # Attach payloads to the action rows: miss components
                # carry theirs in miss_out; replayed components that must
                # (re)write — recovery or divergence, never the warm
                # path — have ONLY their payload arrays deserialized
                # (semi-join on the memo key first, so the parse volume
                # is ∝ changes, not corpus).
                payload_miss = miss_out.withColumn(
                    "target_path", self._path_col(target.name, target.pk)
                ).select("__args_fp", "target_path", *out_cols)
                if memo and not full_reprocess and counts.get("__replay_upserts"):
                    # Replayed components needing a (re)write are the
                    # upsert fps that are NOT misses — normally zero
                    # (recovery/divergence only). Their payloads come
                    # from a BUCKET-SCOPED memo read: on the common path
                    # touched_buckets([]) = [] and the fat result_json
                    # column is never scanned at all; when rows do need
                    # it, I/O is ∝ the handful of touched buckets, never
                    # the memo table (the pre-r3c shape full-scanned
                    # result_json inside every sink job).
                    needed = (
                        upserts.select("__args_fp")
                        .distinct()
                        .join(
                            miss_out.select("__args_fp").distinct(),
                            "__args_fp",
                            "left_anti",
                        )
                    )
                    nb = self.state.memo.touched_buckets(
                        needed.select(
                            F.lit(logic_fp).alias("logic_fp"),
                            F.col("__args_fp").alias("args_fp"),
                        )
                    )
                    payload_rows = (
                        self.state.memo.read(spark, nb)
                        .filter(F.col("logic_fp") == logic_fp)
                        .select(F.col("args_fp").alias("__args_fp"), "result_json")
                        .join(needed, "__args_fp", "left_semi")
                    )
                else:
                    payload_rows = spark.createDataFrame(
                        [], "__args_fp STRING, result_json STRING"
                    )
                replay_payload = (
                    payload_rows.select(
                        "__args_fp",
                        F.explode(
                            F.from_json(F.col("result_json"), ArrayType(row_schema))
                        ).alias("__row"),
                    )
                    .select("__args_fp", F.col("__row.*"))
                    .withColumn("target_path", self._path_col(target.name, target.pk))
                    .select("__args_fp", "target_path", *out_cols)
                )
                # Join on BOTH (__args_fp, target_path): two components
                # declaring the same target_path (validate_unique=False)
                # must each pick up only their OWN payload rows — a
                # path-only join would cross-join their payloads and
                # could commit A's tracked fp over B's sink row.
                upsert_rows = upserts.select("__args_fp", "target_path").join(
                    payload_miss.unionByName(replay_payload),
                    ["__args_fp", "target_path"],
                    "inner",
                ).select(*out_cols)
            else:
                upsert_rows = None
            dead_keys = None
            if stats.deletes:
                # Map deleted target_paths back to pk values via the sink.
                # Ownership preemption (execution.rs:948-995): a path
                # whose old owner disappeared but that a NEW component
                # re-declared this run is claimed, not dead — the
                # upsert above already wrote the new owner's row, and
                # deleting by target_path would destroy it. Only paths
                # no component declared get swept.
                claimed = plan.actions.filter(
                    F.col("action").isin("insert", "update")
                ).select(F.col("target_path").alias("__tp"))
                dead = (
                    plan.actions.filter(F.col("action") == "delete")
                    .select(F.col("target_path").alias("__tp"))
                    .join(claimed, "__tp", "left_anti")
                )
                # Recover pk values from the dead target paths whenever
                # the parse round-trips exactly (the path encoding IS
                # name/pk1/pk2/... — any value that would make the parse
                # ambiguous would already collide in tracking, so this
                # adds no new constraint). No sink scan at all: the
                # pre-r9 shape read back the WHOLE target table to map
                # one dead path to its pk — a full corpus-sized scan per
                # delete-bearing sync at 100 TB. The read-based mapping
                # survives only as the fallback for pk types whose
                # string cast is not an exact round-trip.
                pk_types = (
                    [target.schema[c].dataType.simpleString() for c in target.pk]
                    if hasattr(target, "schema")
                    else None
                )
                # Exactness condition: every pk type round-trips its
                # string cast, AND no column BEFORE the last is a
                # string (a '/' inside a non-final string value would
                # shift the split; the final column absorbs the
                # remainder, so a trailing string pk is always exact).
                parse_ok = (
                    pk_types is not None
                    and all(t in _SAFE_PK_PARSE_TYPES for t in pk_types)
                    and all(t != "string" for t in pk_types[:-1])
                )
                if pk_types is None and not hasattr(target, "read"):
                    raise TypeError(
                        f"target {target.name!r} bears deletes but exposes "
                        "neither `schema` (to parse pk values from the "
                        "path encoding) nor `read` (to map them back from "
                        "the sink) — apply-only sinks must declare a schema"
                    )
                if parse_ok or not hasattr(target, "read"):
                    dead_keys = _keys_from_paths(dead, target.name, target.pk, pk_types)
                else:
                    current = target.read(spark).withColumn(
                        "__tp", self._path_col(target.name, target.pk)
                    )
                    dead_keys = current.join(dead, "__tp").select(*target.pk)
            # Mixed syncs (a rename is add + cascade delete) apply both
            # channels in ONE bucket-scoped rewrite when the sink
            # supports it — buckets touched by both would otherwise be
            # version-written and pointer-swapped twice.
            # COCO_FUSE_MERGE_APPLY=0 restores the two-pass
            # upsert-then-delete shape — the A/B lever for measuring
            # the fusion (r9 verdict finding #1), not a user knob.
            fuse = os.environ.get("COCO_FUSE_MERGE_APPLY", "1") != "0"
            if (
                fuse
                and upsert_rows is not None
                and dead_keys is not None
                and hasattr(target, "merge_apply")
            ):
                target.merge_apply(upsert_rows, dead_keys)
            else:
                if upsert_rows is not None:
                    target.upsert(upsert_rows)
                if dead_keys is not None:
                    target.delete(dead_keys)
            _phase("sink_apply")

            # ---- Phase 4 commit: tracking + memo flush ----
            applied, deleted = tracking_updates(plan, version)
            if stats.deletes and fuse:
                # one combined rewrite: upserted AND deleted tracking
                # rows land in a single version write + pointer swap
                self.state.tracking.merge_apply(applied, deleted, touched=bks)
            elif stats.deletes:
                self.state.tracking.merge_upsert(applied, touched=bks)
                self.state.tracking.delete_keys(deleted)
            else:  # skip the delete merge job on pure upsert runs
                self.state.tracking.merge_upsert(applied, touched=bks)
            _phase("tracking_commit")

        # ---- source_fp map maintenance (two-level change detection) ----
        # The (cheap_fp → args_fp) upsert for loaded rows runs on the
        # memo-flush thread above (order-independent); when no memo
        # flush happened but rows loaded (all loads memo-hit), write it
        # here.
        if use_cheap:
            if stats.extra["loaded"] and not (memo and stats.memo_misses):
                new_sfp = keyed.select(
                    F.col("__component_path").alias("component_path"),
                    F.col("__cheap_fp").alias("cheap_fp"),
                    F.col("__args_fp").alias("args_fp"),
                    F.lit(version).cast("long").alias("version"),
                )
                self.state.source_fp.merge_upsert(new_sfp)
            if not partial and tombstone_col is None and stats.deletes:
                # Full syncs enumerate the whole source: sweep map rows
                # of vanished components (one metadata-sized anti-join).
                # Gated on reconcile deletes — without any, no component
                # vanished (a stale row would anyway only cost space: a
                # returning component with an unchanged cheap fp replays
                # the same memoized result, which is correct).
                dead_sfp = (
                    self.state.source_fp.read(spark)
                    .filter(F.col("component_path").startswith(component_prefix + "/"))
                    .join(
                        cheap_probe.select(
                            F.col("__component_path").alias("component_path")
                        ),
                        "component_path",
                        "left_anti",
                    )
                    .select("component_path")
                )
                self.state.source_fp.delete_keys(dead_sfp)

        # ---- error side table maintenance (opt-in) ----
        if error_col is not None:
            if stats.extra.get("errors"):
                self.state.errors.merge_upsert(
                    failed_paths.select(
                        F.col("__component_path").alias("component_path"),
                        "error",
                        F.lit(version).cast("long").alias("version"),
                    )
                )
            # Clearing: a component stops being "currently failing" when
            # it recomputes cleanly, replays a memoized result, or
            # vanishes from the source. A full sync enumerates the whole
            # world, so everything under the prefix that is NOT in this
            # run's failed set is clear; a partial batch only vouches
            # for its own scope. Gated on the errors table actually
            # having rows for the prefix — the common all-healthy sync
            # pays one tiny metadata read, not a delete cycle.
            old_errors = self.state.errors.read(spark).filter(
                F.col("component_path").startswith(component_prefix + "/")
            )
            if old_errors.limit(1).count():
                failed_now = (
                    failed_paths.select(
                        F.col("__component_path").alias("component_path")
                    )
                    if failed_paths is not None
                    else old_errors.select("component_path").limit(0)
                )
                if partial or tombstone_col is not None:
                    in_scope = old_errors.join(
                        F.broadcast(scope_paths), "component_path", "left_semi"
                    )
                    cleared = in_scope.join(failed_now, "component_path", "left_anti")
                else:
                    cleared = old_errors.join(failed_now, "component_path", "left_anti")
                self.state.errors.delete_keys(cleared.select("component_path"))

        if memo_thread is not None:
            memo_thread.join()
            if memo_err:
                raise memo_err[0]
            _phase("memo_flush_wait")

        # Release this sync's caches: every count/flush above has
        # materialized, and leaked cache blocks across many syncs in one
        # session evict each other (a bench run is 35+ plans) — the
        # recompute storms cost far more than the caching saved.
        for cached in (
            plan.actions,
            miss_out,
            miss_out_raw,
            miss_src,
            keyed,
            cheap_probe,
            failed_paths,
        ):
            if cached is not None:
                cached.unpersist()

        # Adaptive state maintenance: safe here — the sync's scoped
        # bucket ids are all consumed; growth rehashes before the next
        # sync. A grown table is already one fresh version, so
        # compaction (fragment-count / dead-bytes OPTIMIZE,
        # store.py maybe_compact) only runs when growth didn't fire.
        for t in (self.state.tracking, self.state.memo, self.state.source_fp):
            if not t.maybe_grow(spark):
                t.maybe_compact(spark)
        tgt_tbl = getattr(target, "_table", None)
        if tgt_tbl is not None:
            tgt_tbl.maybe_compact(spark)
        _phase("cleanup")
        stats.extra["phase_ms"] = phase_ms
        stats.wall_sec = time.perf_counter() - t0
        return stats

    # -- memo GC (§7.4.8; reference: version retention execution.rs:447-452,
    #    tombstone GC Phase 5 app_store.rs:316) --------------------------
    def call_fn(self, f: Callable, *args, **kwargs):
        """Driver-side memoized invocation of an ``@fn``-decorated plain
        Python function — the call-site path of SURVEY §3.2
        (``await embed(chunk)``: function.py:440-522 memo-key pipeline →
        memo_fingerprint.py:412 fingerprint_call → LMDB
        FunctionMemoization lookup, db_schema.rs:67-70).

        The memo key is (logic_fp, canonical-args fp) — args run the
        full memo-key canonicalization (dataclasses, pydantic,
        ``__coco_memo_key__`` overrides, registered key fns,
        NotMemoKeyable poison), after the function's per-parameter
        ``memo_key=`` overrides when declared (docs
        memoization_keys.mdx "Override at the call site": callable →
        transformed value, None → excluded). A dependency edit changes
        logic_fp and so transitively invalidates callers, the
        reference's rule. The lookup is a BUCKET-SCOPED single-key read
        of the memo table (one bucket's parquet, never a table scan);
        results round-trip as JSON. Rows written here carry decl_json
        NULL, which makes them invisible to sync_table's replay path
        (it filters ``decl_json IS NOT NULL``) — the two memo
        populations share the table but never cross.

        Context change detection (context.mdx): the call runs with this
        app as the active provider and records every change-detected
        ``use_context`` read; the observed fingerprints are stored in
        an envelope next to the result (the reference's per-entry
        ``context_memo_states``, execution.rs:124-137). A hit is valid
        only while every stored fingerprint is still live — a
        re-provided value drops its old fp from the live set, so the
        entry re-executes exactly when the context it consumed changed.
        """
        import json as _json

        from cocoindex_spark.fingerprint import (
            NON_EXISTENCE,
            fp_value_with_states,
            resolve_outcomes,
        )

        logic_fp = getattr(f, "logic_fp", None) or fp_logic(f)
        bound = getattr(f, "bound_memo_args", None)
        if bound is not None and getattr(f, "memo_key", None):
            key_tree = bound(args, kwargs)
        else:
            key_tree = [list(args), kwargs]
        args_fp, state_fns = fp_value_with_states(key_tree)
        key = self.spark.createDataFrame(
            [(logic_fp, args_fp)], "logic_fp STRING, args_fp STRING"
        )
        bks = self.state.memo.touched_buckets(key)
        hit = (
            self.state.memo.read(self.spark, bks)
            .filter(
                (F.col("logic_fp") == logic_fp) & (F.col("args_fp") == args_fp)
            )
            .select("result_json")
            .limit(1)
            .collect()  # single-row state read
        )
        stored = _json.loads(hit[0]["result_json"]) if hit else None
        # Every row _persist writes is an envelope (the few bytes buy a
        # marker that can never be confused with user data — a user
        # value that IS a dict with these keys gets wrapped like any
        # other value). The shape check below only matters for rows
        # written by pre-envelope versions, which stored bare values:
        # it requires the EXACT envelope key set (marker + v + only the
        # optional ctx/states), so a legacy bare user dict that happens
        # to carry the marker alongside other keys is returned intact
        # rather than unwrapped (r7 advisor finding).
        envelope = (
            isinstance(stored, dict)
            and stored.get("__coco_memo__") == 1
            and "v" in stored
            and set(stored) <= {"__coco_memo__", "v", "ctx", "states"}
        )

        # memo STATE validation (memoization_keys.mdx "Memo state
        # validation", reference function.py _call_state_methods):
        # after a fingerprint match, every argument-borne state method
        # runs against its stored previous state (NON_EXISTENCE on
        # first sight); the hit survives only if ALL say memo_valid.
        # States persist for the next run either way — including the
        # "state changed but result still valid" refresh (new mtime,
        # same content hash).
        new_states: list | None = None
        states_valid = True
        if state_fns:
            prev_states = (
                stored.get("states") if envelope and stored.get("states") else None
            )
            outcomes = resolve_outcomes(
                [
                    fn_(
                        prev_states[i]
                        if prev_states is not None and i < len(prev_states)
                        else NON_EXISTENCE
                    )
                    for i, fn_ in enumerate(state_fns)
                ]
            )
            new_states = [o.state for o in outcomes]
            states_valid = all(o.memo_valid for o in outcomes)

        def _persist(value, ctx_fps: list) -> None:
            if not getattr(f, "memo", True):
                return
            payload = {"__coco_memo__": 1, "v": value}
            if ctx_fps:
                payload["ctx"] = ctx_fps
            if new_states is not None:
                payload["states"] = new_states
            row = self.spark.createDataFrame(
                [(logic_fp, args_fp, _json.dumps(payload), None, 0)],
                self.state.memo.schema,
            )
            self.state.memo.merge_upsert(row)

        if stored is not None:
            value = stored["v"] if envelope else stored
            ctx_ok = (not envelope) or self.context.all_live(stored.get("ctx", []))
            if ctx_ok and states_valid:
                # Compare through a JSON round-trip: state fns may
                # return tuples or other non-JSON-canonical shapes that
                # would never equal their stored (list-ified) form and
                # force a redundant upsert on every hit.
                if state_fns and _json.loads(_json.dumps(new_states)) != (
                    stored.get("states") if envelope else None
                ):
                    # valid hit with refreshed state: persist the new
                    # state so the next run takes the cheap path
                    _persist(value, stored.get("ctx", []) if envelope else [])
                return value
            # stale context or failed state validation: re-run below
        _push_active(self.context)
        try:
            with self.context.record() as rec:
                out = f(*args, **kwargs)
        finally:
            _pop_active()
        _persist(out, sorted(rec.fps))
        return out

    # Reserved logic_fp namespace for per-transform context-fold
    # history rows living inside the memo table. Real logic fps are
    # hex digests, so the prefix cannot collide with user rows; the
    # rows carry decl_json NULL and are invisible to sync replay.
    _CTX_HIST_PREFIX = "__ctxhist__:"

    def _record_ctx_history(self, base_fp: str, folded_fp: str) -> None:
        """Remember that ``base_fp`` has synced under context snapshot
        ``folded_fp`` — the breadcrumb gc_memo needs to find (and
        sweep) the memo generations stranded by context rotation."""
        row = self.spark.createDataFrame(
            [(self._CTX_HIST_PREFIX + base_fp, folded_fp, None, None, 0)],
            self.state.memo.schema,
        )
        self.state.memo.merge_upsert(row)

    def gc_memo(self, source: DataFrame, transform: Callable) -> int:
        """Sweep memo rows of ``transform`` whose args fingerprint no
        longer occurs in ``source`` — the rows only dead keys leave
        behind (hits of live keys are never rewritten, so age-based
        pruning would evict live entries; liveness against the current
        source is the correct criterion, and it's one anti-join).

        Context rotation: memo rows written under a PREVIOUS value of a
        ``detect_change`` context key carry a different folded
        logic_fp, which no current lookup addresses — an entire dead
        generation per rotation. sync_table records every folded fp it
        writes under (``_record_ctx_history``), and the sweep removes
        every generation other than the current snapshot's, plus the
        spent history breadcrumbs. (Rotating BACK to an old value
        re-runs cold — correct, never stale.)

        Returns the number of rows swept. Distributed end-to-end; at
        100 TB the sweep shuffles only the memo table's key columns.
        """
        base_fp = getattr(transform, "logic_fp", None) or fp_logic(transform)
        logic_fp = base_fp
        ctx_fps = self._transform_context_fps(transform, source)
        if ctx_fps:
            # the same context fold sync_table applies — the sweep must
            # address the rows the CURRENT context snapshot would read
            logic_fp = fp_value(["ctx", base_fp, sorted(ctx_fps)])
        live = source.select(
            fp_col(F.lit(logic_fp), *[F.col(c) for c in source.columns]).alias("args_fp")
        ).distinct()
        memo = self.state.memo.read(self.spark)
        rows = memo.filter(F.col("logic_fp") == logic_fp)
        dead = rows.join(live, "args_fp", "left_anti").select("logic_fp", "args_fp")
        hist_key = self._CTX_HIST_PREFIX + base_fp
        stale_gen_fps = [
            r["args_fp"]
            for r in memo.filter(F.col("logic_fp") == hist_key)
            .select("args_fp")
            .collect()  # bounded: one fp per historical context snapshot
            if r["args_fp"] != logic_fp
        ]
        if stale_gen_fps:
            stale_rows = memo.filter(F.col("logic_fp").isin(stale_gen_fps)).select(
                "logic_fp", "args_fp"
            )
            stale_hist = memo.filter(
                (F.col("logic_fp") == hist_key)
                & F.col("args_fp").isin(stale_gen_fps)
            ).select("logic_fp", "args_fp")
            dead = dead.unionByName(stale_rows)
            n = dead.count()
            if n:
                self.state.memo.delete_keys(dead.unionByName(stale_hist))
            return n
        n = dead.count()
        if n:
            self.state.memo.delete_keys(dead)
        return n

    def errors(self, target: TableTarget | None = None) -> DataFrame:
        """Currently-failing components (the exception-handler /
        progress-monitoring surface: UpdateStats error counts +
        per-component messages). Scoped to one target's prefix when
        given."""
        df = self.state.errors.read(self.spark)
        if target is not None:
            df = df.filter(
                F.col("component_path").startswith(f"{self.name}/{target.name}/")
            )
        return df.select("component_path", "error")

    def children(self, target: TableTarget) -> DataFrame:
        """Current child components of a target's sync prefix (the
        ChildExistence keyspace, db_schema.rs:0xa0). In this engine's
        flat component model the child set IS the tracked component
        set, so it's derived from tracking — the reconcile deletes
        above keep it exact with zero extra write cost per sync (the
        reference needs a separate keyspace because its components can
        declare target states elsewhere in the tree)."""
        return (
            self.state.tracking.read(self.spark)
            .filter(F.col("component_path").startswith(f"{self.name}/{target.name}/"))
            .select(F.col("component_path").alias("child_key"))
            .distinct()
        )

    # -- schema evolution (target_state.mdx:140-144; SURVEY §7.4.5) -------
    def _ensure_target_contract(self, target: TableTarget, component_prefix: str) -> str:
        """Reconcile the target's declared (pk, schema) against the
        stored contract from previous runs.

        - pk change ⇒ **destructive**: drop rows + tracking; children
          fully re-created (child_invalidation destructive).
        - column add/remove/retype ⇒ **lossy**: keep rows, force
          ``may_be_missing=True`` on this target's tracking so every
          state is written through on the next reconcile even when its
          fingerprint matches (lossy backfill).
        """
        if not hasattr(target, "schema"):
            raise TypeError(
                f"target {target.name!r} declares no `schema` — every sink "
                "needs one for the stored (pk, columns) contract, and "
                "apply-only sinks (no `read`) additionally need it to parse "
                "pk values back from the path encoding on deletes"
            )
        declared = {
            "pk": target.pk,
            "columns": [[f.name, f.dataType.simpleString()] for f in target.schema.fields],
        }
        # APPLY-ONLY wire sinks (stream-load, qdrant, turbopuffer,
        # valkey) cannot persist metadata server-side; their contract
        # lives in the engine's own user-state table instead, so schema
        # evolution still detects pk/column changes for them.
        introspectable = hasattr(target, "stored_contract")
        _ckey = f"__contract/{component_prefix}"
        if introspectable:
            stored = target.stored_contract()
            store = target.store_contract
        else:
            stored = self.get_state(_ckey, "contract")

            def store() -> None:
                self.set_state(_ckey, "contract", declared)

        if stored is None:
            store()
            return "initial"
        if stored == declared:
            return "none"
        if stored["pk"] != declared["pk"]:
            tracked_keys = (
                self.state.tracking.read(self.spark)
                .filter(F.col("component_path").startswith(component_prefix + "/"))
                .select("component_path", "target_path")
            )
            if introspectable:
                target.truncate()
            else:
                # no truncate on an apply-only sink: sweep the tracked
                # target paths through its delete channel instead —
                # parsed with the OLD contract's pk (the paths encode
                # the previous key structure)
                old_types = dict(stored["columns"])
                dead_keys = _keys_from_paths(
                    tracked_keys.select(F.col("target_path").alias("__tp")),
                    target.name,
                    stored["pk"],
                    [old_types[c] for c in stored["pk"]],
                )
                target.delete(dead_keys)
            self.state.tracking.delete_keys(tracked_keys)
            store()
            return "destructive"
        # lossy: widen may_be_missing on every tracked state of this target
        tracked = self.state.tracking.read(self.spark).filter(
            F.col("component_path").startswith(component_prefix + "/")
        )
        self.state.tracking.merge_upsert(
            tracked.withColumn("may_be_missing", F.lit(True))
        )
        store()
        return "lossy"

    # -- user state (coco.use_state, api.py:791-885) ----------------------
    def set_state(self, component_path: str, state_key: str, value) -> None:
        """Persist a per-component scratch value (survives runs; the
        reference's UserState keyspace, db_schema.rs:0x34). Values are
        JSON-serialized — the Spark analog of the reference's msgspec
        serde for persisted values (serde.py)."""
        import json

        row = self.spark.createDataFrame(
            [(component_path, state_key, json.dumps(value), int(time.time() * 1000))],
            self.state.user_state.schema,
        )
        self.state.user_state.merge_upsert(row)

    def get_state(self, component_path: str, state_key: str, default=None):
        import json

        rows = (
            self.state.user_state.read(self.spark)
            .filter(
                (F.col("component_path") == component_path)
                & (F.col("state_key") == state_key)
            )
            .select("value_json")
            .collect()
        )
        return json.loads(rows[0][0]) if rows else default

    def set_states(self, df: DataFrame, state_key: str) -> None:
        """Bulk variant: one state value per component — DF(component_path,
        value_json). Distributed MERGE, no driver loop (the per-key
        states of a 100 TB run never pass through the driver)."""
        version = int(time.time() * 1000)
        rows = df.select(
            "component_path",
            F.lit(state_key).alias("state_key"),
            F.col("value_json"),
            F.lit(version).cast("long").alias("version"),
        )
        self.state.user_state.merge_upsert(rows)

    def get_states(self, state_key: str) -> DataFrame:
        return (
            self.state.user_state.read(self.spark)
            .filter(F.col("state_key") == state_key)
            .select("component_path", "value_json")
        )

    def drop(self) -> None:
        """App drop: remove all engine state (tombstone GC analog,
        app_store.rs:316)."""
        self.context.close()
        self.state.drop()
