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
    # r5 rotation: the 32 round-4 queries (q102-q133) have NEVER received
    # a driver verdict — they lead. Then queries whose code was touched
    # since their last driver check: q76/q80/q89 (pair-relation rework),
    # q29/q46-q49/q79 (lexer changes), q66-q68/q82 (graph family), and
    # q119 (this round's window fix). Remaining window slots go to the
    # stalest r3-checked queries. Everything else stays registered and
    # locally value-verified; it rotates back in next round.
    "q134_rust_captures",  # NEW in r5
    "q135_hll_sketch_read",  # NEW in r5
    "q136_cm_sketch_read",  # NEW in r5
    "q137_quickstart_topk",  # NEW in r5
    "q138_containment_match",  # NEW in r5
    "q139_gopher_rules",  # NEW in r5
    "q140_unigram_surprisal",  # NEW in r5
    "q141_copurchase_recs",  # NEW in r5
    "q142_session_search",  # NEW in r5
    "q143_balanced_epoch_sample",  # NEW in r5
    "q102_hll_distinct",
    "q103_countmin_heavy_hitters",
    "q104_bfs_reachability",
    "q105_bloom_prefilter_join",
    "q106_hll_overlap_matrix",
    "q107_hist_quantiles",
    "q108_template_literal_chunks",
    "q109_int8_quantized_topk",
    "q110_c_preproc_definitions",
    "q111_ruby_definitions",
    "q112_lua_definitions",
    "q113_kmeans_clusters",
    "q114_semdedup",
    "q115_dup_spans",
    "q116_leakage_safe_split",
    "q117_mmr_rerank",
    "q118_ivf_kmeans_topk",
    "q119_importance_weights",
    "q120_decontaminated_corpus",
    "q121_rate_anomaly",
    "q122_julia_definitions",
    "q123_r_definitions",
    "q124_sql_definitions",
    "q125_markdown_sections",
    "q126_detector_eval",
    "q127_quantization_recall",
    "q128_html_regions",
    "q129_config_sections",
    "q130_css_regions",
    "q131_fortran_json_regions",
    "q132_pascal_definitions",
    "q133_markdown_chunks",
    # touched since last driver check
    "q76_simhash_wide_pairs",
    "q80_dup_retention",
    "q89_source_overlap",
    "q29_ast_chunks",
    "q46_code_language",
    "q47_code_pattern",
    "q48_structural_captures",
    "q49_definition_views",
    "q79_ast_definitions",
    "q66_graph_degree",
    "q67_motif_cosupplier",
    "q68_supplier_triangles",
    "q82_pagerank",
    # stalest r3-checked fillers
    "q50_tumbling_daily",
    "q51_sessionization",
    "q52_hourly_uniques",
    "q53_event_transitions",
    "q54_asof_attribution",
    "q55_range_click_burst",
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
