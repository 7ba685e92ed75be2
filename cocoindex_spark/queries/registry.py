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
    # last driver-checked in r2 (stalest-first: the r4 gate must refresh
    # ≥45 of these); several had code touched since r2 (q65 CC
    # node-scope fix, q33 shared simhash operators). The round's new
    # queries follow — the first ~5 also land in a 50-row window; the
    # rest are locally value-verified and rotate in next round.
    "q65_entity_resolution",
    "q33_simhash_pairs",
    "q62_connected_components",
    "q05_top3_orders_per_customer",
    "q06_groupby_scoring",
    "q07_customers_without_orders",
    "q08_unreferenced_parts",
    "q09_last_wins_per_key",
    "q10_ownership_latest_supplier",
    "q11_stats_rollup",
    "q12_selective_scan",
    "q13_json_props",
    "q14_rollup_revenue",
    "q15_top_supplier",
    "q16_part_supplier_diversity",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_banded_revenue",
    "q20_vector_topk",
    "q21_knn_batch",
    "q22_similarity_join_blocked",
    "q23_lsh_bucket_join",
    "q24_label_centroids",
    "q25_ivf_topk",
    "q26_hash_embed_knn",
    "q27_multivector_maxsim",
    "q30_exact_dedup",
    "q31_ngram_jaccard_pairs",
    "q32_minhash_lsh_pairs",
    "q34_embedding_neardup",
    "q35_repetition_ngrams",
    "q36_pii_scrub",
    "q37_normalized_dedup",
    "q38_bpe_token_estimate",
    "q40_token_stats",
    "q41_quality_score",
    "q42_langid_confusion",
    "q43_doc_fingerprint",
    "q44_chunk_documents",
    "q45_deterministic_ids",
    "q56_stemmed_vocab",
    "q60_reconcile_actions",
    "q61_memo_miss_join",
    "q63_rrf_hybrid",
    "q64_child_existence_diff",
    # new this round (no driver verdict yet; all green in the local
    # value gate)
    "q97_shared_sql_doc_quality",
    "q98_brace_definitions",
    "q99_pair_relation_read",
    "q100_brace_chunks",
    "q101_tfidf_top_terms",
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
