"""Graph-shaped query pack (SURVEY.md §2.2 neo4j/falkordb graph
targets; §2.12.5 graph endpoint reference joins). The graph is the
GraphFrames-convention projection of lineitem: supplier --supplies-->
part edges; all algorithms are plain DataFrame joins/aggs that run on
the `GraphTarget` tables unchanged (sinks/graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cocoindex_spark.queries.registry import register, table


def _edges(spark: SparkSession, sf_dir: str, materialize: bool = False) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    e = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    ).distinct()
    # Materialize only when the caller's plan scans the edge list from
    # several branches (the motif self-joins); a single-pass consumer
    # like the degree query must NOT pay an eager checkpoint per call.
    return e.localCheckpoint(eager=True) if materialize else e


_SQL_EDGES = (
    "SELECT DISTINCT ('s' || l_suppkey) AS src, ('p' || l_partkey) AS dst FROM lineitem"
)


# --- q66: per-node degrees over the projected property graph (the
#     GraphTarget.degrees operator as a registered query). Single
#     shuffle: each distinct edge emits one (src, 1, 0) and one
#     (dst, 0, 1) row; one groupBy sums both directions. No node-set
#     distinct, no joins — every endpoint appears in the union, so the
#     aggregation output IS the node table with both degrees.
@register(
    "q66_graph_degree",
    oracle=f"""
WITH e AS ({_SQL_EDGES}),
nodes AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
outd AS (SELECT src AS id, COUNT(*) AS out_degree FROM e GROUP BY src),
ind  AS (SELECT dst AS id, COUNT(*) AS in_degree FROM e GROUP BY dst)
SELECT n.id, COALESCE(o.out_degree, 0) AS out_degree, COALESCE(i.in_degree, 0) AS in_degree
FROM nodes n LEFT JOIN outd o ON n.id = o.id LEFT JOIN ind i ON n.id = i.id
""",
)
def q66_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir)
    return (
        e.select(F.col("src").alias("id"), F.lit(1).alias("o"), F.lit(0).alias("i"))
        .unionAll(e.select(F.col("dst").alias("id"), F.lit(0).alias("o"), F.lit(1).alias("i")))
        .groupBy("id")
        .agg(F.sum("o").alias("out_degree"), F.sum("i").alias("in_degree"))
    )


# --- q67: two-hop motif join (a)-[:supplies]->(p)<-[:supplies]-(b) —
#     co-supplier pairs by shared part count. The Cypher motif restated
#     as a self-equi-join on the shared endpoint (shuffle on dst only;
#     no cross product). Skew remedy WIRED IN (not just noted): a
#     degree probe finds parts with >= _HOT_DEG suppliers and routes
#     only those through `selective_salted_join` — each hot part's
#     quadratic fan-out spreads over n_salts tasks while the cold
#     majority takes the plain single-shuffle join. Result-identical to
#     the unsalted join (operators/skew.py contract), so the oracle is
#     unchanged.
_HOT_DEG = 64


@register(
    "q67_motif_cosupplier",
    oracle=f"""
WITH e AS ({_SQL_EDGES})
SELECT a.src AS a_id, b.src AS b_id, COUNT(*) AS shared_parts
FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
GROUP BY a.src, b.src
HAVING COUNT(*) >= 2
""",
)
def q67_motif_cosupplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cocoindex_spark.operators.skew import selective_salted_join, top_keys

    # (A/B-measured: joining on raw integer keys with the node-id
    # strings built at projection time is net slower — the per-pair
    # concat in the a<b filter outweighs the narrower shuffle. The
    # string-edge join below reuses the checkpointed edge list, one
    # scan+distinct for both sides AND for the hot-key probe.)
    e = _edges(spark, sf_dir, materialize=True)
    # The probe materializes (one column-pruned shuffle); when it finds
    # no hot keys the plain single-shuffle join runs with zero salting
    # machinery — selective_salted_join is result-identical for ANY hot
    # set, so branching on the probe is free of semantic risk and the
    # probe cost amortizes against the quadratic blowup it prevents.
    hot = top_keys(e, ["dst"], _HOT_DEG).localCheckpoint(eager=True)
    a = e.select(F.col("src").alias("a_id"), "dst")
    b = e.select(F.col("src").alias("b_id"), "dst")
    joined = (
        a.join(b, "dst")
        if hot.isEmpty()
        else selective_salted_join(a, b, ["dst"], hot_keys=hot, n_salts=8)
    )
    return (
        joined.filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("shared_parts"))
        .filter(F.col("shared_parts") >= 2)
    )


# --- q68: supplier triangles (3-hop motif (a)-->(p)<--(b), (p)<--(c))
#     with the DEGREE-CAP technique real triangle counters use: only
#     parts with ≤ MAX_DEG suppliers participate, so per-part fan-out
#     is bounded by C(MAX_DEG,3) and the hot-part quadratic blowup the
#     q67 skew note warns about cannot occur — the 100 TB-safe shape
#     for higher-order motifs (cap or salt, never raw fan-out).
_MAX_DEG = 20


@register(
    "q68_supplier_triangles",
    oracle=f"""
WITH e AS ({_SQL_EDGES}),
deg AS (SELECT dst, COUNT(*) AS d FROM e GROUP BY dst),
e8 AS (SELECT e.src, e.dst FROM e JOIN deg ON e.dst = deg.dst WHERE deg.d <= {_MAX_DEG})
SELECT a.src AS a_id, b.src AS b_id, c.src AS c_id, COUNT(*) AS shared_parts
FROM e8 a
JOIN e8 b ON a.dst = b.dst AND a.src < b.src
JOIN e8 c ON b.dst = c.dst AND b.src < c.src
GROUP BY a.src, b.src, c.src
HAVING COUNT(*) >= 2
""",
)
def q68_supplier_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir, materialize=True)
    deg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
    e8 = e.join(deg.filter(F.col("d") <= _MAX_DEG).select("dst"), "dst", "left_semi")
    a = e8.select(F.col("src").alias("a_id"), "dst")
    b = e8.select(F.col("src").alias("b_id"), "dst")
    c = e8.select(F.col("src").alias("c_id"), "dst")
    return (
        a.join(b, "dst")
        .filter(F.col("a_id") < F.col("b_id"))
        .join(c, "dst")
        .filter(F.col("b_id") < F.col("c_id"))
        .groupBy("a_id", "b_id", "c_id")
        .agg(F.count(F.lit(1)).alias("shared_parts"))
        .filter(F.col("shared_parts") >= 2)
    )


# --- q82: PageRank — the iterative-algorithm representative, fully
#     value-oracled. The usual escape hatch for iterative algorithms is
#     a rows-only check; instead the whole computation is INTEGER
#     fixed-point (rank mass scaled by 10^12, truncating division) so
#     three unrolled iterations are bit-identical in Spark and DuckDB
#     (positive operands: Spark's `div` truncation == DuckDB's `//`
#     floor). Graph = the bidirected supplier<->part edge set (the
#     directed projection is bipartite with all-sink parts — rank mass
#     would die in one hop); bidirecting also guarantees every node has
#     an out-edge, so there are no dangling nodes and no mass-leak
#     correction term. Scale shape: each iteration is ONE equi-join of
#     the rank vector with the (pre-aggregated) out-degree table plus
#     one groupBy over edge endpoints — the canonical distributed
#     PageRank plan; the iteration count is fixed, the driver holds no
#     per-node state, and the node-count scalar rides in as a broadcast
#     1-row frame. Reference analog: graph targets feeding downstream
#     graph analytics (docs examples build neo4j graphs for exactly
#     this kind of traversal scoring).
_PR_SCALE = 10**12
_PR_ITERS = 3


def _sql_pagerank() -> str:
    cte = [
        f"e AS ({_SQL_EDGES})",
        "bi AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e)",
        "deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS od FROM bi GROUP BY src)",
        "nodes AS (SELECT DISTINCT src AS id FROM bi)",
        "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        f"r0 AS (SELECT id, {_PR_SCALE} // t.n AS r FROM nodes, tot t)",
    ]
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        cte.append(
            f"s{i} AS (SELECT bi.dst AS id, CAST(SUM({prev}.r // deg.od) AS BIGINT) AS s "
            f"FROM {prev} JOIN deg ON {prev}.id = deg.src JOIN bi ON bi.src = deg.src "
            f"GROUP BY bi.dst)"
        )
        cte.append(
            f"r{i} AS (SELECT nodes.id, "
            f"CAST((3 * {_PR_SCALE}) // (20 * (SELECT n FROM tot)) + (85 * COALESCE(s{i}.s, 0)) // 100 AS BIGINT) AS r "
            f"FROM nodes LEFT JOIN s{i} ON nodes.id = s{i}.id)"
        )
        prev = f"r{i}"
    return "WITH " + ",\n".join(cte) + f"\nSELECT id, r AS rank FROM {prev}"


@register("q82_pagerank", oracle=_sql_pagerank())
def q82_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir, materialize=True)
    bi = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # deg/nodes are consumed by every iteration — materialize once, or
    # each unrolled iteration re-runs their shuffles from scratch
    deg = (
        bi.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("od"))
        .localCheckpoint(eager=True)
    )
    nodes = deg.select(F.col("src").alias("id"))  # every node has out-edges
    tot = nodes.agg(F.count(F.lit(1)).cast("long").alias("n"))
    # rank frames stay (id, r, n): n rides along so the per-iteration
    # base term needs no repeated cross join
    r = nodes.crossJoin(F.broadcast(tot)).select(
        "id", F.expr(f"{_PR_SCALE} div n").alias("r"), "n"
    )
    # No per-iteration materialization: the rank vector feeds two
    # branches per round, but AQE's exchange reuse already evaluates
    # the shared prefix once (checkpointing each round was measured
    # SLOWER — 7.9 s vs 5.4 s at sf0.1 — pure barrier overhead).
    for _ in range(_PR_ITERS):
        contrib = (
            r.join(deg, r["id"] == deg["src"])
            .select(F.col("src"), F.expr("r div od").alias("share"))
            .join(bi, "src")
            .groupBy("dst")
            .agg(F.sum("share").alias("s"))
        )
        r = (
            r.select("id", "n")
            .join(contrib, r["id"] == contrib["dst"], "left")
            .select(
                "id",
                F.expr(
                    f"CAST((3 * {_PR_SCALE}) div (20 * n) + (85 * COALESCE(s, 0)) div 100 AS BIGINT)"
                ).alias("r"),
                "n",
            )
        )
    return r.select("id", F.col("r").alias("rank"))


# --- q104: multi-hop BFS reachability — the iterative frontier shape
#     (complement to q82's fixed-point iteration): min-hop distance
#     from seed suppliers over the undirected supplier–part graph,
#     3 unrolled rounds, full value oracle. Canonical distributed BFS:
#     each round is ONE frontier⋈adjacency equi-join + distinct + an
#     anti-join against the visited set — frontier-sized work, never a
#     whole-graph pass, no driver state. At 100× the rounds shuffle on
#     the node id and the visited anti-join stays keyed; this is the
#     plan GraphX/Pregel would produce, expressed in DataFrames.
@register(
    "q104_bfs_reachability",
    oracle=f"""
WITH e AS ({_SQL_EDGES}),
adj AS (SELECT src AS a, dst AS b FROM e UNION ALL SELECT dst AS a, src AS b FROM e),
d0 AS (SELECT DISTINCT ('s' || l_suppkey) AS id FROM lineitem WHERE l_suppkey % 50 = 0),
d1 AS (
  SELECT DISTINCT adj.b AS id FROM adj JOIN d0 ON adj.a = d0.id
  WHERE adj.b NOT IN (SELECT id FROM d0)
),
d2 AS (
  SELECT DISTINCT adj.b AS id FROM adj JOIN d1 ON adj.a = d1.id
  WHERE adj.b NOT IN (SELECT id FROM d0)
    AND adj.b NOT IN (SELECT id FROM d1)
),
d3 AS (
  SELECT DISTINCT adj.b AS id FROM adj JOIN d2 ON adj.a = d2.id
  WHERE adj.b NOT IN (SELECT id FROM d0)
    AND adj.b NOT IN (SELECT id FROM d1)
    AND adj.b NOT IN (SELECT id FROM d2)
)
SELECT id, CAST(0 AS BIGINT) AS dist FROM d0
UNION ALL SELECT id, CAST(1 AS BIGINT) FROM d1
UNION ALL SELECT id, CAST(2 AS BIGINT) FROM d2
UNION ALL SELECT id, CAST(3 AS BIGINT) FROM d3
""",
)
def q104_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _edges(spark, sf_dir, materialize=True)
    adj = e.select(F.col("src").alias("a"), F.col("dst").alias("b")).unionAll(
        e.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    )
    li = table(spark, sf_dir, "lineitem")
    seeds = (
        li.filter(F.col("l_suppkey") % 50 == 0)
        .select(F.concat(F.lit("s"), F.col("l_suppkey")).alias("id"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
    )
    visited = seeds
    frontier = seeds.select("id")
    for d in (1, 2, 3):
        nxt = (
            frontier.join(adj, frontier["id"] == adj["a"])
            .select(F.col("b").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("dist", F.lit(d).cast("long"))
        )
        visited = visited.unionByName(nxt)
        frontier = nxt.select("id")
    return visited


# --- q141: co-purchase recommendations — the reference's
#     product_recommendation example (examples/product_recommendation)
#     as a Spark-first query: items bought together in one order form a
#     co-occurrence pair; rank each item's partners by integer lift
#     (1000·N·c_ab div (c_a·c_b), milli-lift — pure integer, so the
#     scores value-match cross-engine) and keep the top 3 per item.
#     Scale shape: the pair generation is a SELF EQUI-JOIN on the order
#     key (orders are bounded-width, so the per-order fanout is
#     bounded — never a cross product), pair counts partial-aggregate
#     before their shuffle, and the final cut is a per-item KEYED
#     window, never a global one. Only parts with ≥ 2 co-purchases
#     rank, keeping the lift denominator meaningful.
@register(
    "q141_copurchase_recs",
    oracle="""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n_orders AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM li),
item_cnt AS (
  SELECT l_partkey AS pk, CAST(COUNT(*) AS BIGINT) AS c FROM li GROUP BY l_partkey
),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
),
scored AS (
  SELECT p.pa, p.pb, p.c_ab,
    (1000 * n.n * p.c_ab) // (ca.c * cb.c) AS lift_milli
  FROM pairs p
  JOIN item_cnt ca ON p.pa = ca.pk
  JOIN item_cnt cb ON p.pb = cb.pk, n_orders n
  WHERE p.c_ab >= 2
)
SELECT pa AS part, pb AS rec, c_ab AS n_together, lift_milli, rk
FROM (
  SELECT pa, pb, c_ab, lift_milli,
    row_number() OVER (PARTITION BY pa ORDER BY lift_milli DESC, pb ASC) AS rk
  FROM scored
) WHERE rk <= 3
""",
)
def q141_copurchase_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = li.agg(
        F.countDistinct("l_orderkey").cast("long").alias("n")
    )
    item_cnt = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("pa") != F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= 2)
    )
    scored = (
        pairs.join(item_cnt.select(F.col("pk").alias("pa"), F.col("c").alias("ca")), "pa")
        .join(item_cnt.select(F.col("pk").alias("pb"), F.col("c").alias("cb")), "pb")
        .crossJoin(F.broadcast(n_orders))  # 1-row scalar, intentional
        .select(
            "pa", "pb", "c_ab",
            F.expr("(1000 * n * c_ab) div (ca * cb)").alias("lift_milli"),
        )
    )
    w = Window.partitionBy("pa").orderBy(F.desc("lift_milli"), F.asc("pb"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("pa").alias("part"),
            F.col("pb").alias("rec"),
            F.col("c_ab").alias("n_together"),
            "lift_milli",
            "rk",
        )
    )
