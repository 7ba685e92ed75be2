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
    # r10 rotation (the driver checks ~the first 50 rows). Window:
    # (a) CODE-TOUCHED this round: q154/q156/q158, re-pointed to serve
    # from the engine-synced code-views index (extract-once-serve-many
    # — same oracles, new read path), (b) the whole r6-stale cohort
    # (14 queries, the oldest driver verdicts left), (c) the r7-checked
    # block in numeric order up to the ~50-row window. The 14 remaining
    # r7-checked queries (q42-q45, q56, q93-q96, q137, q144, q145,
    # q147, q155) roll to r11. Everything else stays registered and
    # locally value-verified.
    "q154_callsite_indegree",  # re-pointed at the code-views index
    "q156_qualified_usage_search",  # re-pointed at the code-views index
    "q162_usage_probe_served",  # NEW: seek probe SERVED from q156's index
    "q158_multilang_usage_resolution",  # re-pointed at the code-views index
    "q126_detector_eval",
    "q142_session_search",
    "q146_shingle_containment",
    "q148_bigram_surprisal",
    "q149_hamming_topk",
    "q150_oov_rate",
    "q151_import_indegree",
    "q85_funnel",
    "q86_retention_weekly",
    "q87_outlier_trim",
    "q88_length_bucketed_batches",
    "q90_phrase_search",
    "q91_sliding_revenue",
    "q92_decayed_user_value",
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
