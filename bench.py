"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with the noop sink (full computation, no driver
collect). The set covers every operator family: scan/agg, join, window,
vector top-k + similarity join, minhash/simhash dedup, text analysis,
sessionization, reconcile, connected components, multimodal decode.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cocoindex_spark.queries import all_queries
from cocoindex_spark.session import CPUS, DEFAULT_SF_DIR, get_spark

HEADLINE = [
    "q01_pricing_summary",
    "q03_revenue_by_nation",
    "q05_top3_orders_per_customer",
    "q06_groupby_scoring",
    "q09_last_wins_per_key",
    "q10_ownership_latest_supplier",
    "q12_selective_scan",
    "q20_vector_topk",
    "q22_similarity_join_blocked",
    "q23_lsh_bucket_join",
    "q31_ngram_jaccard_pairs",
    "q32_minhash_lsh_pairs",
    "q33_simhash_pairs",
    "q40_token_stats",
    "q42_langid_confusion",
    "q43_doc_fingerprint",
    "q44_chunk_documents",
    "q50_tumbling_daily",
    "q51_sessionization",
    "q60_reconcile_actions",
    "q61_memo_miss_join",
    "q62_connected_components",
    "q63_rrf_hybrid",
    "q70_multimodal_decode",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("cocoindex-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # Warm the JVM/readers with a trivial action so q1 isn't charged
    # session startup.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
