"""Connected components: both physical strategies (driver union-find
under the edge cap, distributed min-label propagation above it) must
produce the identical (id, component_id = min member) labeling.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cocoindex_spark.operators.entity_resolution import connected_components


def _labels(df):
    return {(r["id"], r["component_id"]) for r in df.collect()}


def _reference_components(n_nodes, pairs):
    comp = {i: {i} for i in range(n_nodes)}
    where = {i: i for i in range(n_nodes)}
    for a, b in pairs:
        ra, rb = where[a], where[b]
        if ra == rb:
            continue
        if len(comp[ra]) < len(comp[rb]):
            ra, rb = rb, ra
        for x in comp[rb]:
            where[x] = ra
        comp[ra] |= comp.pop(rb)
    return {(i, min(comp[where[i]])) for i in range(n_nodes)}


def test_both_strategies_match_reference(spark):
    rng = random.Random(7)
    n = 120
    pairs = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(90)})
    expected = _reference_components(n, pairs)

    nodes = spark.createDataFrame([(i,) for i in range(n)], "id LONG")
    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs], "a_id LONG, b_id LONG"
    )
    fast = connected_components(nodes, edges)  # under the cap → union-find
    assert _labels(fast) == expected
    dist = connected_components(nodes, edges, driver_cap=0)  # force the loop
    assert _labels(dist) == expected


def test_chain_and_singletons(spark):
    # chain 0-1-2-...-9 plus isolated nodes 100..104
    nodes = spark.createDataFrame(
        [(i,) for i in list(range(10)) + list(range(100, 105))], "id LONG"
    )
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "a_id LONG, b_id LONG"
    )
    expected = {(i, 0) for i in range(10)} | {(i, i) for i in range(100, 105)}
    assert _labels(connected_components(nodes, edges)) == expected
    assert _labels(connected_components(nodes, edges, driver_cap=0)) == expected


def test_edges_outside_node_set_do_not_invent_nodes(spark):
    nodes = spark.createDataFrame([(1,), (2,)], "id LONG")
    edges = spark.createDataFrame([(1, 2), (2, 99)], "a_id LONG, b_id LONG")
    for cap in (10**6, 0):
        got = _labels(connected_components(nodes, edges, driver_cap=cap))
        assert {i for i, _ in got} == {1, 2}
        # 1 and 2 still merge; 99 is simply absent
        assert got == {(1, 1), (2, 1)}


def test_string_ids(spark):
    nodes = spark.createDataFrame([("b",), ("a",), ("c",), ("z",)], "id STRING")
    edges = spark.createDataFrame([("b", "c")], "a_id STRING, b_id STRING")
    expected = {("a", "a"), ("b", "b"), ("c", "b"), ("z", "z")}
    assert _labels(connected_components(nodes, edges)) == expected
    assert _labels(connected_components(nodes, edges, driver_cap=0)) == expected


def test_empty_edges(spark):
    nodes = spark.createDataFrame([(1,), (2,)], "id LONG")
    edges = spark.createDataFrame([], "a_id LONG, b_id LONG")
    for cap in (10**6, 0):
        assert _labels(connected_components(nodes, edges, driver_cap=cap)) == {
            (1, 1),
            (2, 2),
        }


def test_star_contraction_long_chain(spark):
    """Worst case for label propagation (diameter = n): a 200-node
    chain must converge within the round budget under the distributed
    star-contraction path and label every node with the chain head."""
    n = 200
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id LONG")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a_id LONG, b_id LONG"
    )
    got = _labels(connected_components(nodes, edges, driver_cap=0))
    assert got == {(i, 0) for i in range(n)}
