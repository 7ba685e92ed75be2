"""Context-DI session-index app — the Spark-first restatement of the
reference's context pattern (docs programming_guide/context.mdx:
ContextKey + provide in the lifespan, use_context in processing
components, detect_change=True for values that affect results):

    events → per-user bundles → gap sessionization → feature-hash
    session embeddings → LSH-bucketed session table maintained
    incrementally, with the SESSION GAP injected through a
    change-detected ContextKey.

The sync pipeline lives in `cocoindex_spark.queries.streamingq`
(q144's engine-synced index); this app wraps it with a config context:
changing SESSION_GAP re-sessionizes (every consumer of the key misses
— context.mdx "Change detection"), while re-providing the same value
replays the memoized bundles.

Run with the CLI (re-running is incremental):

    python -m cocoindex_spark.cli update examples/context_session_app.py
    python -m cocoindex_spark.cli show   examples/context_session_app.py
    python -m cocoindex_spark.cli drop   examples/context_session_app.py
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cocoindex_spark import ContextKey, fn, use_context
from cocoindex_spark.operators.vector_ops import sign_bucket
from cocoindex_spark.queries.registry import table
from cocoindex_spark.queries.streamingq import SS_BITS, _SS_DIM, _session_embed_cols

APP_NAME = "context_session_example"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# The gap is CONFIG that changes results → detect_change=True: a new
# value invalidates exactly the bundles that consumed it. A connection
# string or client handle would use the default (detect_change=False).
SESSION_GAP = ContextKey("context_session_example/gap_us", detect_change=True)


@fn(memo=True)
def sessionize_with_context(df):
    """q144's transform with the gap read from context instead of a
    module constant — the reference's use_context-inside-@coco.fn
    shape (context.mdx "Retrieving values")."""
    from pyspark.sql.window import Window

    gap = use_context(SESSION_GAP)
    ev = df.select(
        "__args_fp", "__component_path", "user_id",
        F.posexplode("evs").alias("pos", "ev"),
    )
    w = Window.partitionBy("user_id").orderBy("pos")
    us = F.col("ev.us")
    new_session = F.when(
        (us - F.lag(us).over(w) > gap) | F.lag(us).over(w).isNull(), 1
    ).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    b, s = _session_embed_cols()
    emb = (
        sess.select("__args_fp", "__component_path", "user_id", "session_id", b, s)
        .groupBy("__args_fp", "__component_path", "user_id", "session_id")
        .agg(
            *[
                F.sum(F.when(F.col("b") == i, F.col("s")).otherwise(F.lit(0.0)))
                .cast("float")
                .alias(f"c{i}")
                for i in range(_SS_DIM)
            ]
        )
        .select(
            "__args_fp",
            "__component_path",
            "user_id",
            F.col("session_id").cast("long").alias("session_id"),
            F.array(*[F.col(f"c{i}") for i in range(_SS_DIM)]).alias("embedding"),
        )
    )
    return emb.withColumn(
        "bucket", sign_bucket(F.col("embedding"), SS_BITS).cast("int")
    )


def app_main(app):
    spark = app.spark
    # lifespan: provide config once (context.mdx "Providing values")
    app.provide(SESSION_GAP, 30 * 60 * 1_000_000)

    events = table(spark, SF_DIR, "events")
    bundles = events.select(
        "user_id",
        F.struct(
            F.unix_micros("ts").alias("us"),
            "event_id",
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        ).alias("ev"),
    ).groupBy("user_id").agg(F.sort_array(F.collect_list("ev")).alias("evs"))

    target = app.target(
        os.path.join(app.state.root, "targets", "sessions"),
        ["user_id", "session_id"],
        "user_id LONG, session_id LONG, embedding ARRAY<FLOAT>, bucket INT",
    )
    target.declare_index("lsh", "embedding", bits=SS_BITS)
    stats = app.sync_table(bundles, ["user_id"], sessionize_with_context, target)

    idx = target.read(spark)
    return {
        "sessions_tracked": int(idx.count()),
        "gap_us": app.use_context(SESSION_GAP),
        "memo_hits": stats.memo_hits,
        "memo_misses": stats.memo_misses,
        "inserts": stats.inserts,
        "noops": stats.noops,
    }
