from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator registering a query and (optionally) its DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# The driver's correctness gate checks only the first ~50 registry rows
# (in dict order). With >50 registered queries, order matters: queries
# that have never received a driver verdict — or failed their last one —
# must come first. This list is refreshed each round from the previous
# CORRECTNESS_r{N}.json: never-checked first, then stalest-checked.
_PRIORITY: list[str] = [
    # r6 rotation. CORRECTNESS_r05 was 50/50 green, so the window
    # rotates to: (a) queries NEW this round, (b) queries whose code
    # was touched since their last driver verdict (q126/q31 took the
    # shared prefix-filter refactor; q142's oracle moved to a shared
    # constant), then (c) the stalest set — everything whose last
    # driver check was round 3: q01-q04, q28, q39, q50-q55, q57-q59,
    # q66-q68, q70-q75, q77-q79, q81-q88, q90-q96. Everything else
    # stays registered and locally value-verified; it rotates back in
    # next round.
    "q144_session_search_indexed",  # NEW in r6
    "q145_context_memo_invalidation",  # NEW in r6
    "q146_shingle_containment",  # NEW in r6
    "q147_cdc_chunk_dedup",  # NEW in r6
    "q148_bigram_surprisal",  # NEW in r6
    "q149_hamming_topk",  # NEW in r6
    "q150_oov_rate",  # NEW in r6
    "q151_import_indegree",  # NEW in r6
    "q152_element_kinds",  # NEW in r6
    "q126_detector_eval",  # touched: prefix-filtered truth join
    "q31_ngram_jaccard_pairs",  # touched: shared helper extraction
    "q142_session_search",  # touched: oracle constant refactor
    # stalest: last driver-checked in round 3
    "q01_pricing_summary",
    "q02_topk_orders",
    "q03_revenue_by_nation",
    "q04_priority_semijoin",
    "q28_pq_topk",
    "q39_filter_pipeline",
    "q50_tumbling_daily",
    "q51_sessionization",
    "q52_hourly_uniques",
    "q53_event_transitions",
    "q54_asof_attribution",
    "q55_range_click_burst",
    "q57_source_quantiles",
    "q58_deterministic_sample",
    "q59_split_assignment",
    "q66_graph_degree",
    "q67_motif_cosupplier",
    "q68_supplier_triangles",
    "q70_multimodal_decode",
    "q71_multimodal_stats",
    "q72_multimodal_frames",
    "q73_transcribe",
    "q74_frame_near_dup",
    "q75_fts_bm25",
    "q77_token_packing",
    "q78_contamination",
    "q79_ast_definitions",
    "q81_mixture_weights",
    "q82_pagerank",
    "q83_multiprobe_topk",
    "q84_event_dedup_windowed",
    "q85_funnel",
    "q86_retention_weekly",
    "q87_outlier_trim",
    "q88_length_bucketed_batches",
    "q90_phrase_search",
    "q91_sliding_revenue",
    "q92_decayed_user_value",
    "q93_region_share",
    "q94_weekday_type_pivot",
    "q95_cube_revenue",
    "q96_shared_sql_topspenders",
]


def _ordered(d: dict) -> dict:
    front = {k: d[k] for k in _PRIORITY if k in d}
    rest = {k: v for k, v in d.items() if k not in front}
    return {**front, **rest}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(_QUERIES)


def all_oracles() -> dict[str, str]:
    return _ordered(_ORACLES)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # UTC session zone unconditionally: every NTZ→TIMESTAMP cast in the
    # query pack (events normalization below, orders epoch extraction)
    # must be the identity on the epoch value so unix_micros matches
    # DuckDB's tz-free epoch_us. Runtime-settable, so this works on
    # driver-provided sessions too.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS). Depending on the Spark
        # version this reads as a nanos LONG (legacy conf) or as
        # TIMESTAMP_NTZ (Spark 4.1+ reads nanos natively, truncated to
        # micros). Normalize both to a plain TIMESTAMP.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if name == "events":
        dt = df.schema["ts"].dataType
        if isinstance(dt, LongType):
            # nanos long → micros timestamp (floor = DuckDB truncation)
            df = df.withColumn(
                "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
            )
        elif isinstance(dt, TimestampNTZType):
            # NTZ→TIMESTAMP cast interprets wall time in the session zone;
            # with UTC set above this is the identity on the epoch value.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
