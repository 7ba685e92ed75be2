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


# --- q54: as-of join (attribution: for each purchase, the most recent
#     strictly-earlier click by the same user). Spark side is the
#     union-and-scan distributed as-of join (operators/asof.py); the
#     oracle is DuckDB's native ASOF JOIN — two independent
#     implementations of the same operator.
@register(
    "q54_asof_attribution",
    oracle="""
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'click'
)
SELECT p.event_id AS purchase_id, p.user_id, p.us AS purchase_us,
       c.event_id AS click_id, c.us AS click_us,
       p.us - c.us AS lag_us
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.us > c.us
""",
)
def q54_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cocoindex_spark.operators.asof import asof_join

    e = table(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    p = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "us")
    c = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "us")
    j = asof_join(p, c, on=["user_id"], left_ts="us", right_ts="us", strict=True)
    return j.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("us").alias("purchase_us"),
        F.col("r_event_id").alias("click_id"),
        F.col("r_us").alias("click_us"),
        (F.col("us") - F.col("r_us")).alias("lag_us"),
    )


# --- q55: bucketed range join (for each error, clicks by the same user
#     in the preceding 5 minutes). Spark side probes exactly two
#     width-sized time buckets per row (pure equi-join, no range
#     explosion — operators/asof.py:range_count_join); oracle is the
#     naive range-predicate join.
@register(
    "q55_range_click_burst",
    oracle="""
WITH err AS (
  SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'error'
), c AS (
  SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'click'
)
SELECT e.event_id, e.user_id, e.us,
  CAST(COUNT(c.us) AS BIGINT) AS n_recent_clicks
FROM err e LEFT JOIN c
  ON c.user_id = e.user_id AND c.us >= e.us - 300000000 AND c.us < e.us
GROUP BY e.event_id, e.user_id, e.us
""",
)
def q55_range_click_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cocoindex_spark.operators.asof import range_count_join

    e = table(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    c = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    counted = range_count_join(
        err, c, on=["user_id"], left_ts="ts", right_ts="ts",
        lower_us=-300_000_000, upper_us=0, count_col="n_recent_clicks",
    )
    return counted.select(
        "event_id", "user_id", F.unix_micros("ts").alias("us"), "n_recent_clicks"
    )
