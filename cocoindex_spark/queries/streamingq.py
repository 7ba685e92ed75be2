"""Streaming-shaped operators computed over the `events` table
(SURVEY.md §2.11). These are the batch ("catch-up",
Trigger.AvailableNow) renditions of the streaming ops — identical
DataFrame code runs under readStream/foreachBatch in
cocoindex_spark.streaming; here they're batch so the DuckDB oracle
can verify semantics.

Time arithmetic uses integer epoch-microsecond buckets (exact in both
engines) rather than engine-formatted timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cocoindex_spark.queries.registry import register, table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


# --- q50: tumbling daily window aggregation
@register(
    "q50_tumbling_daily",
    oracle="""
SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
  COUNT(DISTINCT user_id) AS unique_users
FROM events
GROUP BY 1, 2
""",
)
def q50_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.col("ts").cast("date").alias("day"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("unique_users"),
        )
    )


# --- q51: sessionization (gap > 30 min starts a new session) —
#     lag + running-sum window, the classic stateful-streaming shape
#     (applyInPandasWithState equivalent is in streaming/live.py)
@register(
    "q51_sessionization",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US}
           OR LAG(epoch_us(ts)) OVER w IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_id, us,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM seq
)
SELECT user_id, COUNT(DISTINCT session_id) AS n_sessions, COUNT(*) AS n_events,
  CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT session_id) AS events_per_session
FROM sess GROUP BY user_id
""",
)
def q51_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    new_session = F.when(
        (F.col("us") - F.lag("us").over(w) > SESSION_GAP_US)
        | F.lag("us").over(w).isNull(),
        1,
    ).otherwise(0)
    sess = e.withColumn("new_session", new_session).withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
        (F.count("*").cast("double") / F.countDistinct("session_id")).alias(
            "events_per_session"
        ),
    )


# --- q52: hourly unique users (windowed distinct aggregation)
@register(
    "q52_hourly_uniques",
    oracle="""
SELECT epoch_us(ts) // 3600000000 AS hour_bucket,
       COUNT(DISTINCT user_id) AS unique_users, COUNT(*) AS n_events
FROM events
GROUP BY 1
""",
)
def q52_hourly_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    bucket = F.expr("unix_micros(ts) div 3600000000")
    return (
        e.groupBy(bucket.alias("hour_bucket"))
        .agg(F.countDistinct("user_id").alias("unique_users"), F.count("*").alias("n_events"))
    )


# --- q53: event-type transition counts (lag over per-key ordered stream;
#     the per-key coalescing order semantics of live mode, arrival order
#     = (ts, event_id), never event-time windows — SURVEY §2.11)
@register(
    "q53_event_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS curr_type, COUNT(*) AS n
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, curr_type
""",
)
def q53_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("curr_type"))
        .agg(F.count("*").alias("n"))
    )
