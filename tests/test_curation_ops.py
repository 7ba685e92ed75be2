"""Semantic invariants of the round-4 curation operators (q113-q118).

The oracle gate proves cross-engine value equality; these tests pin the
*semantic contracts* the oracles cannot express — leak-freedom of the
split, span disjointness, greedy-selection determinism, argmin
assignment — so a refactor that changes both engines in lockstep still
trips a failure if it breaks the meaning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cocoindex_spark.queries.dedup import (
    _SPAN_W,
    q114_semdedup,
    q115_dup_spans,
    q116_leakage_safe_split,
    wide_pair_relation,
)
from cocoindex_spark.queries.vector import (
    _MMR_K,
    km_one_iter_model,
    km_quantized,
    q117_mmr_rerank,
    q118_ivf_kmeans_topk,
)
from cocoindex_spark.queries.registry import table
from tests.conftest import SF_SMOKE


def test_leakage_safe_split_never_crosses_near_dup_pairs(spark):
    """THE invariant q116 exists for: no near-dup pair straddles splits."""
    splits = q116_leakage_safe_split(spark, SF_SMOKE).select("doc_id", "split")
    pairs = wide_pair_relation(spark, SF_SMOKE).select("a_id", "b_id")
    assert pairs.count() > 0  # vacuous otherwise
    sa = splits.select(F.col("doc_id").alias("a_id"), F.col("split").alias("split_a"))
    sb = splits.select(F.col("doc_id").alias("b_id"), F.col("split").alias("split_b"))
    crossing = (
        pairs.join(sa, "a_id").join(sb, "b_id")
        .filter(F.col("split_a") != F.col("split_b"))
    )
    assert crossing.count() == 0


def test_leakage_safe_split_covers_every_doc_once(spark):
    n_docs = table(spark, SF_SMOKE, "documents").count()
    out = q116_leakage_safe_split(spark, SF_SMOKE)
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs
    bad = out.filter(~F.col("split").isin("train", "val", "test"))
    assert bad.count() == 0


def test_dup_spans_are_maximal_and_disjoint(spark):
    """Spans within a doc are ≥ one window long, disjoint, and separated
    by more than the merge gap (else they would have been one island)."""
    rows = (
        q115_dup_spans(spark, SF_SMOKE)
        .orderBy("doc_id", "span_start")
        .collect()
    )
    assert rows  # the corpus has cross-doc duplication
    by_doc: dict = {}
    for r in rows:
        assert r.span_end - r.span_start + 1 == r.span_words
        assert r.span_words >= _SPAN_W
        assert r.n_windows >= 1
        by_doc.setdefault(r.doc_id, []).append(r)
    for spans in by_doc.values():
        for prev, cur in zip(spans, spans[1:]):
            # disjoint AND non-mergeable: the next island's first window
            # starts more than W past the previous island's last window
            assert cur.span_start > prev.span_end + 1


def test_semdedup_drops_only_within_cluster_toward_lower_id(spark):
    out = q114_semdedup(spark, SF_SMOKE)
    assign, _ = km_one_iter_model(spark, SF_SMOKE)
    joined = out.join(
        assign.withColumnRenamed("cluster", "true_cluster"), "vec_id"
    )
    # reported cluster is the real assignment; keeper precedes the drop
    assert joined.filter(F.col("cluster") != F.col("true_cluster")).count() == 0
    assert out.filter(F.col("kept_by") >= F.col("vec_id")).count() == 0


def test_mmr_picks_are_distinct_and_lead_with_top_relevance(spark):
    rows = q117_mmr_rerank(spark, SF_SMOKE).orderBy("sel_rank").collect()
    assert len(rows) == _MMR_K
    assert len({r.vec_id for r in rows}) == _MMR_K
    # rank 1 is pure argmax relevance; later picks trade relevance for
    # diversity, so rank-1 relevance bounds the rest
    assert all(rows[0].rel >= r.rel for r in rows[1:])


def test_kmeans_assignment_is_argmin_over_centroids(spark):
    assign, cents = km_one_iter_model(spark, SF_SMOKE)
    v = km_quantized(table(spark, SF_SMOKE, "embeddings"))
    cent_rows = {r.cid: r.cv for r in cents.collect()}
    sample = (
        assign.join(v, "vec_id").orderBy("vec_id").limit(25).collect()
    )
    for r in sample:
        dists = {
            cid: sum((a - b) * (a - b) for a, b in zip(r.qv, cv))
            for cid, cv in cent_rows.items()
        }
        best = min(dists.items(), key=lambda kv: (kv[1], kv[0]))[0]
        assert r.cluster == best


def test_ivf_probe_results_are_subset_of_probed_cells(spark):
    out = q118_ivf_kmeans_topk(spark, SF_SMOKE)
    assign, _ = km_one_iter_model(spark, SF_SMOKE)
    hits = out.join(assign, "vec_id")
    qcells = out.select(F.col("qid")).distinct().join(
        assign.withColumnRenamed("vec_id", "qid").withColumnRenamed(
            "cluster", "qcluster"
        ),
        "qid",
    )
    # per query, at most NPROBE distinct result cells, and the query
    # never returns itself
    per_q = hits.groupBy("qid").agg(
        F.countDistinct("cluster").alias("ncells")
    )
    assert per_q.filter(F.col("ncells") > 2).count() == 0
    assert out.filter(F.col("vec_id") == F.col("qid")).count() == 0
    assert qcells.count() == out.select("qid").distinct().count()
