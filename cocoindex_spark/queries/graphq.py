"""Graph-shaped query pack (SURVEY.md §2.2 neo4j/falkordb graph
targets; §2.12.5 graph endpoint reference joins). The graph is the
GraphFrames-convention projection of lineitem: supplier --supplies-->
part edges; all algorithms are plain DataFrame joins/aggs that run on
the `GraphTarget` tables unchanged (sinks/graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
