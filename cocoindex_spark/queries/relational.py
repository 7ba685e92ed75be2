"""Relational operator coverage (SURVEY.md §2.6–2.9, §2.12).

Each query is the Spark-first realization of an operator shape the
reference computes (group-by scoring, ranked windows, set diffs,
keep-latest coalescing, FK joins), expressed over the TPC-H-ish
testdata so the DuckDB oracle can hash-match.

Numeric policy: sums over DOUBLE columns are computed over
DECIMAL-cast values (exact, order-independent) and cast back to
DOUBLE at the end, so Spark's parallel aggregation and DuckDB's
sequential aggregation produce bit-identical results. Averages are
derived as exact-sum / count in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cocoindex_spark.queries.registry import register, table


def _dec(col, scale=4):
    return F.col(col).cast(f"decimal(18,{scale})")


# --- q01: pricing summary (scan → filter → partial-agg groupBy; TPC-H Q1 shape)
# Reference shape: group-by scoring, examples/hn_trending_topics/main.py:326-333.
@register(
    "q01_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,8)) * (1 + CAST(l_tax AS DECIMAL(18,4)))), 4) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    # Pin the intermediate to scale 8 (values have ≤8 decimals, so this is
    # exact) to keep the triple product inside decimal(38) in both engines.
    charge = disc_price.cast("decimal(18,8)") * (F.lit(1) + _dec("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            # Round the exact decimal sum to scale 4 before the double cast:
            # a ≤14-significant-digit decimal converts to double identically
            # in every engine, while a scale-12 sum may differ by 1 ulp.
            F.sum(disc_price).cast("decimal(28,4)").cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(28,4)").cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --- q02: recency/top-k ordering (§2.7; hn_trending main.py:357-361)
@register(
    "q02_topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(o_orderdate AS DATE) AS o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
""",
)
def q02_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


# --- q03: multi-way FK join + agg (graph endpoint refs §2.12.5; broadcast dims)
@register(
    "q03_revenue_by_nation",
    oracle="""
SELECT r_name AS region_name, n_name AS nation_name,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
  COUNT(*) AS order_count
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def q03_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        # customer scales with SF (150k × SF rows) — no broadcast hint;
        # AQE broadcasts at runtime iff the build side fits. nation (25)
        # and region (5) are fixed-cardinality: hinting them is safe at
        # any scale.
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("total_revenue"),
            F.count("*").alias("order_count"),
        )
    )


# --- q04: EXISTS semi-join + count (TPC-H Q4 shape; memo-lookup join §2.12.2)
@register(
    "q04_priority_semijoin",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)
def q04_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    joined = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return joined.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# --- q05: ranked lists per partition (§2.7 row_number; sec_edgar search.py:47-55)
@register(
    "q05_top3_orders_per_customer",
    oracle="""
SELECT c_custkey, c_name, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, rk
FROM (
  SELECT c_custkey, c_name, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rk <= 3
""",
)
def q05_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)  # SF-scaling side: AQE decides
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "rk",
        )
    )


# --- q06: weighted group-by scoring (hn_trending_topics/main.py:326-333:
#     thread=5 / comment=1 → here purchase=5 / other=1)
@register(
    "q06_groupby_scoring",
    oracle="""
SELECT user_id,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 5 ELSE 1 END) AS BIGINT) AS score,
  COUNT(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY score DESC, user_id ASC
LIMIT 50
""",
)
def q06_groupby_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    weight = F.when(F.col("event_type") == "purchase", F.lit(5)).otherwise(F.lit(1))
    return (
        e.groupBy("user_id")
        .agg(F.sum(weight).alias("score"), F.count("*").alias("n_events"))
        .orderBy(F.desc("score"), F.asc("user_id"))
        .limit(50)
    )


# --- q07: anti-join (declared-minus-tracked set diff, §2.5 Phase 2 / §2.9)
@register(
    "q07_customers_without_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def q07_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# --- q08: tracked-minus-declared (parts never shipped → delete actions)
@register(
    "q08_unreferenced_parts",
    oracle="""
SELECT p_partkey, p_name, p_brand
FROM part
WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
""",
)
def q08_unreferenced_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    l = table(spark, sf_dir, "lineitem")
    return p.join(l, p.p_partkey == l.l_partkey, "left_anti").select(
        "p_partkey", "p_name", "p_brand"
    )


# --- q09: per-key last-wins coalescing (live_component.rs:592-702 —
#     newest op per key supersedes queued ones)
@register(
    "q09_last_wins_per_key",
    oracle="""
SELECT user_id, event_id, event_type, CAST(value AS DOUBLE) AS value
FROM (
  SELECT user_id, event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def q09_last_wins_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", F.col("value").cast("double").alias("value"))
    )


# --- q10: ownership preemption — keep latest claim per target path
#     (execution.rs:948-995: new component steals tracking from old owner)
@register(
    "q10_ownership_latest_supplier",
    oracle="""
SELECT l_partkey, l_suppkey AS owner_suppkey, CAST(l_shipdate AS DATE) AS claimed_at
FROM (
  SELECT l_partkey, l_suppkey, l_shipdate,
         ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn
  FROM lineitem
) WHERE rn = 1
""",
)
def q10_ownership_latest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey").orderBy(
        F.desc("l_shipdate"), F.desc("l_orderkey"), F.desc("l_linenumber")
    )
    return (
        l.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_partkey",
            F.col("l_suppkey").alias("owner_suppkey"),
            F.col("l_shipdate").cast("date").alias("claimed_at"),
        )
    )


# --- q11: stats rollup (update-stats tree aggregation, engine/stats.rs)
@register(
    "q11_stats_rollup",
    oracle="""
SELECT COALESCE(event_type, '__total__') AS event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY ROLLUP (event_type)
""",
)
def q11_stats_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.rollup("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(_dec("value", 6)).cast("double").alias("total_value"),
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("__total__")).alias("event_type"),
            "n",
            "total_value",
        )
    )


# --- q12: filter + projection pushdown showcase (selective scan)
@register(
    "q12_selective_scan",
    oracle="""
SELECT l_orderkey, l_linenumber, CAST(l_extendedprice AS DOUBLE) AS l_extendedprice
FROM lineitem
WHERE l_returnflag = 'R' AND l_quantity >= 45
  AND l_shipdate >= TIMESTAMP '1999-01-01'
""",
)
def q12_selective_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_returnflag") == "R")
            & (F.col("l_quantity") >= 45)
            & (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
        )
    )


# --- q13: JSON property extraction + exact integer aggregation
#     (events.props is a JSON string column — the reference's structured
#     row decode of connector payloads, e.g. kafka JSON values;
#     get_json_object runs JVM-side, avg computed as exact-int sum/count)
@register(
    "q13_json_props",
    oracle="""
SELECT event_type,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_k
FROM events
GROUP BY event_type
""",
)
def q13_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.groupBy("event_type")
        .agg(F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n_events"))
        .select(
            "event_type",
            "sum_k",
            "n_events",
            (F.col("sum_k").cast("double") / F.col("n_events")).alias("avg_k"),
        )
    )


# --- q14: ROLLUP aggregation (multi-grain stats in one pass — the
#     reference's stats_group rollups across nesting levels, computed
#     with Spark's native rollup operator; grouping levels are tagged
#     with GROUPING() flags so NULL group values stay unambiguous)
@register(
    "q14_rollup_revenue",
    oracle="""
SELECT
  COALESCE(n_name, '<ALL>') AS nation,
  COALESCE(CAST(EXTRACT(year FROM o_orderdate) AS BIGINT), -1) AS order_year,
  CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
  CAST(GROUPING(EXTRACT(year FROM o_orderdate)) AS BIGINT) AS g_year,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP(n_name, EXTRACT(year FROM o_orderdate))
""",
)
def q14_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)  # SF-scaling side: AQE decides
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_name", F.year("o_orderdate").cast("long").alias("yr"), "o_totalprice")
    )
    return (
        joined.rollup("n_name", "yr")
        .agg(
            F.grouping("n_name").cast("long").alias("g_nation"),
            F.grouping("yr").cast("long").alias("g_year"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("n_name", F.lit("<ALL>")).alias("nation"),
            F.coalesce("yr", F.lit(-1)).alias("order_year"),
            "g_nation",
            "g_year",
            "revenue",
            "n_orders",
        )
    )


# --- q15: top supplier(s) by revenue (max-of-aggregate: an aggregate
#     joined against its own maximum — TPC-H Q15 shape; ties kept, so
#     no arbitrary-winner nondeterminism)
@register(
    "q15_top_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey AS suppkey,
    CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                   * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS total_revenue
  FROM lineitem GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    disc = F.col("l_extendedprice").cast("decimal(18,4)") * (
        1 - F.col("l_discount").cast("decimal(18,4)")
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.round(F.sum(disc), 4).cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        s.join(rev, s.s_suppkey == rev.suppkey)
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --- q16: supplier-diversity count with an exclusion subquery (TPC-H
#     Q16 shape: count-distinct over a join, minus suppliers flagged by
#     an anti-condition — here the bottom-decile account balances)
@register(
    "q16_part_supplier_diversity",
    oracle="""
WITH excluded AS (
  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
)
SELECT p_brand, p_type,
  COUNT(DISTINCT l_suppkey) AS supplier_cnt,
  COUNT(*) AS n_lineitems
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM excluded)
GROUP BY p_brand, p_type
""",
)
def q16_part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    excluded = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        # excluded (⊂ supplier) and part both scale with SF — no hints;
        # AQE broadcasts when the runtime size allows
        li.join(excluded, li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# --- q17: small-order revenue (TPC-H Q17 shape: rows filtered against
#     a correlated per-group average — the scalar subquery becomes one
#     aggregate joined back on the group key, never a per-row subquery)
@register(
    "q17_small_quantity_revenue",
    oracle="""
WITH avg_qty AS (
  SELECT l_partkey AS pk, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
           / COUNT(*) AS aq
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 4) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_small
FROM lineitem JOIN avg_qty ON l_partkey = pk
WHERE CAST(l_quantity AS DOUBLE) < 0.5 * aq
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double") / F.count(F.lit(1))
        ).alias("aq")
    )
    return (
        li.join(avg_qty, li.l_partkey == avg_qty.pk)
        .filter(F.col("l_quantity").cast("double") < 0.5 * F.col("aq"))
        .agg(
            (
                F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 4).cast("double")
                / 7.0
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


# --- q18: large-volume customers (TPC-H Q18 shape: HAVING over a
#     grouped sum, joined back to the dimension rows)
@register(
    "q18_large_volume_customers",
    oracle="""
WITH big AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
  FROM orders
  WHERE o_totalprice > 400000
)
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       epoch_us(o_orderdate) AS order_us,
       n_big_orders
FROM big
JOIN customer ON o_custkey = c_custkey
JOIN (SELECT o_custkey AS ck, COUNT(*) AS n_big_orders FROM big GROUP BY o_custkey) g
  ON g.ck = o_custkey
""",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = o.filter(F.col("o_totalprice") > 400000).select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    counts = big.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.count(F.lit(1)).alias("n_big_orders")
    )
    return (
        # customer and the per-customer counts both scale with SF — AQE
        # decides (counts is post-filter tiny at this selectivity, and
        # AQE will broadcast it from its runtime size)
        big.join(c, big.o_custkey == c.c_custkey)
        .join(counts, big.o_custkey == counts.ck)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            # NTZ→TIMESTAMP is the identity on the epoch under the UTC
            # session zone (same normalization as registry.table's events)
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("order_us"),
            "n_big_orders",
        )
    )


# --- q19: banded-predicate revenue (TPC-H Q19 shape: a disjunction of
#     predicate bands — brand × size × quantity ranges — evaluated in
#     one scan; Catalyst pushes the common conjuncts into the parquet
#     filter)
@register(
    "q19_banded_revenue",
    oracle="""
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 5 AND l_quantity <= 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 10 AND l_quantity <= 50)
""",
)
def q19_banded_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)  # part scales with SF: AQE decides
    band = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(5, 35))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(10, 50))
    )
    disc = F.col("l_extendedprice").cast("decimal(18,4)") * (
        1 - F.col("l_discount").cast("decimal(18,4)")
    )
    return j.filter(band).agg(
        F.round(F.sum(disc), 4).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# --- q93: share-of-parent analytics — each nation's revenue as a
#     fraction of its region's total, with the nation's rank inside
#     the region. The percent-of-parent window shape: revenue rolls up
#     per nation first (map-side combinable), the region total is a
#     window SUM over the tiny per-nation rollup (O(nations) rows —
#     never a window over raw lineitem), and the share is ONE double
#     division of two exact DECIMAL sums.
@register(
    "q93_region_share",
    oracle="""
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS revenue
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
)
SELECT region, nation,
  CAST(revenue AS DOUBLE) AS revenue,
  CAST(CAST(revenue AS DOUBLE) / CAST(SUM(revenue) OVER (PARTITION BY region) AS DOUBLE) AS DOUBLE) AS share,
  CAST(ROW_NUMBER() OVER (PARTITION BY region ORDER BY revenue DESC, nation) AS BIGINT) AS rk
FROM rev
""",
)
def q93_region_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    amt = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    rev = (
        l.join(s, l["l_suppkey"] == s["s_suppkey"])  # supplier scales with SF
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(amt).alias("revenue"))
    )
    w = Window.partitionBy("region")
    return rev.select(
        "region",
        "nation",
        F.col("revenue").cast("double").alias("revenue"),
        (
            F.col("revenue").cast("double")
            / F.sum("revenue").over(w).cast("double")
        ).alias("share"),
        F.row_number()
        .over(w.orderBy(F.desc("revenue"), F.asc("nation")))
        .cast("long")
        .alias("rk"),
    )


# --- q95: CUBE aggregation — the full grouping-sets lattice (the
#     ROLLUP complement of q14): revenue across (segment, priority),
#     every subtotal combination plus the grand total, GROUPING()
#     flags distinguishing real NULL-like labels from subtotal rows.
#     Spark cube() == SQL GROUP BY CUBE; DECIMAL sums keep every cell
#     order-independent and exact.
@register(
    "q95_cube_revenue",
    oracle="""
SELECT
  COALESCE(c_mktsegment, '<ALL>') AS segment,
  COALESCE(o_orderpriority, '<ALL>') AS priority,
  CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE(c_mktsegment, o_orderpriority)
""",
)
def q95_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    j = o.join(c, o["o_custkey"] == c["c_custkey"])  # customer scales with SF
    return (
        j.cube("c_mktsegment", "o_orderpriority")
        .agg(
            F.grouping("c_mktsegment").cast("long").alias("g_seg"),
            F.grouping("o_orderpriority").cast("long").alias("g_pri"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce(F.col("c_mktsegment"), F.lit("<ALL>")).alias("segment"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<ALL>")).alias("priority"),
            "g_seg",
            "g_pri",
            "revenue",
            "n_orders",
        )
    )


# --- q96: the shared-SQL surface — ONE ANSI string executed verbatim
#     by BOTH engines: Spark runs it via spark.sql() over registered
#     temp views, DuckDB runs the byte-identical text as the oracle.
#     The strongest parity statement the gate can make: not
#     "equivalent semantics", literally the same query text. The
#     dialect-neutral subset: JOIN/GROUP BY/ORDER BY/LIMIT, DECIMAL
#     casts (exact, order-independent), a single final DOUBLE cast,
#     unique-key tiebreak.
_SHARED_SQL = """
SELECT c_custkey,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey
ORDER BY total_spend DESC, c_custkey
LIMIT 10
""".strip()


@register("q96_shared_sql_topspenders", oracle=_SHARED_SQL)
def q96_shared_sql_topspenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "customer"):
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SHARED_SQL)
