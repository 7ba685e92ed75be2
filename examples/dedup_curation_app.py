"""Corpus-curation app: the training-data pipeline end to end —
quality filtering, incremental near-dup detection, and leakage-safe
train/val/test splits.

    documents → keep/drop verdict (length, uniqueness, repetition,
    language) → MinHash band table maintained incrementally →
    band-collision candidate pairs → near-dup connected components →
    split assignment keyed on the COMPONENT (stage 2 mount), so a
    whole dup-group always lands in one split and a doc re-syncs its
    split row iff its group membership changed.

    python -m cocoindex_spark.cli update examples/dedup_curation_app.py
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cocoindex_spark.engine.function import fn
from cocoindex_spark.operators.text_ops import hex_to_int, kgrams, md5_hex

APP_NAME = "dedup_curation_example"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

_P = (1 << 61) - 1
MINHASH_K = 8
MIN_TOKENS = 20
MIN_UNIQ = 0.3
MAX_REP = 0.2


@fn(memo=True)
def curate(df):
    """Per-document verdict + minhash band keys in one pass."""
    w = F.split(F.trim(F.col("text")), " ")
    n = F.size(w)
    tri = kgrams(w, 3)
    n_tri = F.size(tri)
    uniq = F.size(F.array_distinct(w)).cast("double") / n
    rep = F.when(n_tri > 0, (n_tri - F.size(F.array_distinct(tri))).cast("double") / n_tri).otherwise(0.0)
    keep = (n >= MIN_TOKENS) & (uniq >= MIN_UNIQ) & (rep <= MAX_REP) & (F.col("lang") == "en")

    sh = df.select(
        "__args_fp", "__component_path", "doc_id", "lang",
        n.alias("n_tokens"), uniq.alias("uniq_ratio"), rep.alias("rep_ratio"),
        keep.alias("keep"),
        F.explode_outer(kgrams(w, 2)).alias("g"),
    )
    base = hex_to_int(md5_hex(F.col("g")), 12)
    mh = [
        F.min((F.lit(37 + 8 * s) * base + F.lit(1013904223 * (s + 1))) % F.lit(_P)).alias(f"h{s}")
        for s in range(MINHASH_K)
    ]
    sig = sh.groupBy(
        "__args_fp", "__component_path", "doc_id", "lang",
        "n_tokens", "uniq_ratio", "rep_ratio", "keep",
    ).agg(*mh)
    band = lambda cols: F.concat_ws("#", *[F.col(c).cast("string") for c in cols])  # noqa: E731
    return sig.select(
        "__args_fp", "__component_path", "doc_id",
        "n_tokens", "uniq_ratio", "rep_ratio", "keep",
        band(["h0", "h1", "h2", "h3"]).alias("band0"),
        band(["h4", "h5", "h6", "h7"]).alias("band1"),
    )


@fn(memo=True)
def assign_split(df):
    """Stage 2: (doc_id, component_id) → leakage-safe split (hash the
    GROUP's canonical id, like queries q59/q116)."""
    key = md5_hex(F.concat(F.lit("split:"), F.col("component_id").cast("string")))
    b = hex_to_int(key, 8) % 100
    split = F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    return df.select(
        "__args_fp", "__component_path", "doc_id", "component_id",
        split.alias("split"),
    )


def app_main(app):
    spark = app.spark
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text", "lang"
    )
    target = app.target(
        os.path.join(app.state.root, "targets", "curated"),
        ["doc_id"],
        "doc_id LONG, n_tokens INT, uniq_ratio DOUBLE, rep_ratio DOUBLE, "
        "keep BOOLEAN, band0 STRING, band1 STRING",
    )
    stats = app.sync_table(docs, ["doc_id"], curate, target)

    cur = target.read(spark)
    kept = cur.filter(F.col("keep"))
    bands = kept.select("doc_id", F.col("band0").alias("bk")).unionByName(
        kept.select("doc_id", F.col("band1").alias("bk"))
    )
    a = bands.select(F.col("doc_id").alias("a_id"), "bk")
    b = bands.select(F.col("doc_id").alias("b_id"), "bk")
    n_pairs = (
        a.join(b, "bk").filter(F.col("a_id") < F.col("b_id")).select("a_id", "b_id")
        .distinct().count()
    )
    # stage 2: leakage-safe splits — CC over the candidate pairs, then
    # a second mount keyed on (doc_id, component_id)
    from cocoindex_spark.operators.entity_resolution import connected_components

    pairs = (
        a.join(b, "bk").filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id").distinct()
    )
    comps = connected_components(
        kept.select("doc_id"), pairs, id_col="doc_id"
    ).select(F.col("id").alias("doc_id"), "component_id")
    split_t = app.target(
        os.path.join(app.state.root, "targets", "splits"),
        ["doc_id"],
        "doc_id LONG, component_id LONG, split STRING",
    )
    split_stats = app.sync_table(comps, ["doc_id"], assign_split, split_t)
    split_counts = {
        r["split"]: r["n"]
        for r in split_t.read(spark).groupBy("split").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    return {
        "docs": int(cur.count()),
        "kept": int(kept.count()),
        "near_dup_candidate_pairs": int(n_pairs),
        "splits": split_counts,
        "memo_misses": stats.memo_misses,
        "noops": stats.noops,
        "split_memo_misses": split_stats.memo_misses,
    }
