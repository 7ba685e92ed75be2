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
    # r7 rotation (the driver checks ~the first 50 rows). Window:
    # (a) queries NEW this round (q153/q154 — element namespaces,
    # call-site indegree), (b) queries whose CODE changed since their
    # r6 verdict (q147 chunker extracted to operators/cdc.py; q137/q144
    # probe plans now partition-pruned via the __probe storage layout;
    # q145 gained the provide-time state phases p6-p8), then (c) the
    # stalest set — the r3-checked q93-q96 and the r4-checked batch
    # q05-q27/q30-q49/q56/q60-q65/q97-q101. Everything else stays
    # registered and locally value-verified; it rotates back next round.
    "q153_element_namespaces",  # NEW in r7
    "q154_callsite_indegree",  # NEW in r7
    "q155_fts_synced_bm25",  # NEW in r7 (seek-shaped synced FTS)
    "q156_qualified_usage_search",  # NEW in r7 (cross-doc refs)
    "q147_cdc_chunk_dedup",  # touched: shared CDC operator + 1-word fix
    "q137_quickstart_topk",  # touched: probe-pruned index scan
    "q144_session_search_indexed",  # touched: probe-pruned index scan
    "q145_context_memo_invalidation",  # touched: provide-time states
    # stalest: last driver-checked in round 3
    "q93_region_share",
    "q94_weekday_type_pivot",
    "q95_cube_revenue",
    "q96_shared_sql_topspenders",
    # stalest: last driver-checked in round 4
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
    "q32_minhash_lsh_pairs",
    "q33_simhash_pairs",
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
    "q62_connected_components",
    "q63_rrf_hybrid",
    "q64_child_existence_diff",
    "q65_entity_resolution",
    "q97_shared_sql_doc_quality",
    "q98_brace_definitions",
    "q99_pair_relation_read",
    "q100_brace_chunks",
    "q101_tfidf_top_terms",
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
