from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator registering a query and (optionally) its DuckDB oracle.

    Import-time name guard (r8 judge finding #2): a decorator separated
    from its `def` by an interposed helper silently registers the WRONG
    function — this happened twice (r7, and r8's q156/_q156_docs, which
    contaminated a bench estimate). Requiring the decorated function's
    __name__ to equal the registered name turns that silent
    wrong-registration into an import-time error."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if fn.__name__ != name:
            raise AssertionError(
                f"register({name!r}) attached to function {fn.__name__!r} — "
                "a helper was probably interposed between the decorator "
                "and its def"
            )
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
    # r9 rotation (the driver checks ~the first 50 rows). Window:
    # (a) NEW this round: q161 (the corpus code-views index — q159
    # generalized to five languages incl. python dotted chains),
    # (b) the stalest set: the whole r5-checked batch (q29, q46-q49,
    # q76, q80, q89, q133-q143 remainder), then the r6-checked block
    # in numeric order up to the ~50-row window. The 13 remaining
    # r6-checked queries (q85-q92 tail, q126, q142, q146-q151 tail)
    # roll to r10. Everything else stays registered and locally
    # value-verified.
    "q161_code_views_index_probe",  # NEW in r9
    "q29_ast_chunks",
    "q46_code_language",
    "q47_code_pattern",
    "q48_structural_captures",
    "q49_definition_views",
    "q76_simhash_wide_pairs",
    "q80_dup_retention",
    "q89_source_overlap",
    "q133_markdown_chunks",
    "q134_rust_captures",
    "q135_hll_sketch_read",
    "q138_containment_match",
    "q139_gopher_rules",
    "q140_unigram_surprisal",
    "q141_copurchase_recs",
    "q143_balanced_epoch_sample",
    "q01_pricing_summary",
    "q02_topk_orders",
    "q03_revenue_by_nation",
    "q04_priority_semijoin",
    "q28_pq_topk",
    "q31_ngram_jaccard_pairs",
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
