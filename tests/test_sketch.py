"""Mergeable sketches (operators/sketch.py): the property that makes
them the 100 TB primitives — registers/cells computed on disjoint
partitions of the data merge (MAX / SUM) into exactly the sketch of
the whole — plus estimator sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from cocoindex_spark.operators.sketch import (
    CM_DEPTH,
    CM_WIDTH,
    HLL_M,
    cm_cells,
    cm_cells_from_counts,
    cm_lookup,
    hll_estimate,
    hll_registers,
)


def _toks(spark, n, salt=""):
    return spark.range(n).select(
        F.lit("g").alias("g"),
        F.concat(F.lit(f"tok{salt}"), F.col("id").cast("string")).alias("tok"),
    )


def test_hll_registers_merge_with_max(spark):
    whole = _toks(spark, 2000)
    half_a = whole.filter(F.col("tok").substr(-1, 1).isin("0", "1", "2", "3", "4"))
    half_b = whole.subtract(half_a)
    ra = hll_registers(half_a, ["g"], "tok")
    rb = hll_registers(half_b, ["g"], "tok")
    merged = (
        ra.unionByName(rb).groupBy("g", "j").agg(F.max("M").alias("M"))
    )
    direct = hll_registers(whole, ["g"], "tok")
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in direct.collect()
    }
    # and therefore identical estimates
    em = hll_estimate(merged, ["g"]).collect()[0]["hll_estimate"]
    ed = hll_estimate(direct, ["g"]).collect()[0]["hll_estimate"]
    assert em == ed


def test_hll_estimate_accuracy(spark):
    """Raw HLL with m=256: standard error ~6.5%; assert within 20%."""
    for n in (500, 5000):
        toks = _toks(spark, n)
        est = hll_estimate(hll_registers(toks, ["g"], "tok"), ["g"]).collect()[0][
            "hll_estimate"
        ]
        assert abs(est - n) / n < 0.20, (n, est)


def test_hll_registers_bounded(spark):
    regs = hll_registers(_toks(spark, 10_000), ["g"], "tok")
    assert regs.count() <= HLL_M  # sketch state bounded regardless of n


def test_cm_cells_merge_with_sum(spark):
    whole = _toks(spark, 1000).unionByName(_toks(spark, 300))  # dup mass
    half_a = _toks(spark, 1000)
    half_b = _toks(spark, 300)
    merged = (
        cm_cells(half_a, "tok")
        .unionByName(cm_cells(half_b, "tok"))
        .groupBy("row", "cell")
        .agg(F.sum("n").alias("n"))
    )
    direct = cm_cells(whole, "tok")
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in direct.collect()
    }
    assert direct.count() <= CM_DEPTH * CM_WIDTH  # bounded state


def test_cm_cells_from_counts_identical(spark):
    """The pre-aggregated-counts construction (hash distinct tokens,
    SUM counts) yields exactly the occurrence-stream sketch."""
    toks = _toks(spark, 400).unionByName(_toks(spark, 150))  # skewed dup mass
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    via_counts = cm_cells_from_counts(counts, "tok", "cnt")
    direct = cm_cells(toks, "tok")
    assert {tuple(r) for r in via_counts.collect()} == {
        tuple(r) for r in direct.collect()
    }


def test_cm_estimate_upper_bounds_exact(spark):
    """Count-Min never underestimates; with light load it is near-exact."""
    toks = _toks(spark, 200).unionByName(_toks(spark, 200)).unionByName(
        _toks(spark, 50)
    )  # tok0..49 ×3, tok50..199 ×2
    probes = spark.createDataFrame([("tok7",), ("tok100",)], "tok STRING")
    est = {
        r["tok"]: r["cm_estimate"]
        for r in cm_lookup(cm_cells(toks, "tok"), probes, "tok").collect()
    }
    assert est["tok7"] >= 3 and est["tok100"] >= 2
    assert est["tok7"] <= 10 and est["tok100"] <= 10  # light load: few collisions


def test_hll_inclusion_exclusion_overlap(spark):
    """|A∩B| ≈ |A|+|B|−|A∪B| from MAX-merged registers: two 2000-token
    sources sharing 1000 tokens. Three compounded ~6.5%-σ estimates —
    assert the recovered overlap within 40%."""
    a = _toks(spark, 2000).select(F.lit("A").alias("source"), "tok")
    b = (
        _toks(spark, 1000)
        .unionByName(_toks(spark, 1000, salt="x"))
        .select(F.lit("B").alias("source"), "tok")
    )
    regs = hll_registers(a.unionByName(b), ["source"], "tok")
    union_regs = regs.groupBy("j").agg(F.max("M").alias("M")).select(
        F.lit("U").alias("source"), "j", "M"
    )
    est = {
        r["source"]: r["hll_estimate"]
        for r in hll_estimate(regs.unionByName(union_regs), ["source"]).collect()
    }
    inter = est["A"] + est["B"] - est["U"]
    assert abs(inter - 1000) / 1000 < 0.40, est


def _vals(spark, n, mult=1):
    # skewed: v = (id*id*mult) % 100000 — heavy small-value mass
    return spark.range(n).select(
        F.expr(f"CAST((id * id * {mult}) % 100000 AS BIGINT)").alias("v"),
        F.lit("g").alias("g"),
        F.col("id"),
    )


def test_hist_cells_merge_with_sum(spark):
    from cocoindex_spark.operators.sketch import hist_cells

    whole = _vals(spark, 3000)
    half_a = whole.filter(F.col("id") % 2 == 0)
    half_b = whole.filter(F.col("id") % 2 == 1)
    merged = (
        hist_cells(half_a, ["g"], "v")
        .unionByName(hist_cells(half_b, ["g"], "v"))
        .groupBy("g", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    direct = hist_cells(whole, ["g"], "v")
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in direct.collect()
    }


def test_hist_quantile_sandwich(spark):
    """est is the bucket lower bound: est ≤ exact < est·(1 + 2^-5) + 1
    — the histogram's deterministic error contract."""
    from pyspark.sql.window import Window

    from cocoindex_spark.operators.sketch import hist_cells, hist_quantiles

    d = _vals(spark, 5000)
    cells = hist_cells(d, ["g"], "v")
    est = {
        r["p"]: r["est"]
        for r in hist_quantiles(cells, ["g"], [50, 90, 99]).collect()
    }
    wr = Window.partitionBy("g").orderBy("v", "id")
    ranked = d.withColumn("rn", F.row_number().over(wr)).withColumn(
        "tot", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    for p in (50, 90, 99):
        exact = (
            ranked.filter(F.col("rn") == F.expr(f"(tot * {p} + 99) div 100"))
            .collect()[0]["v"]
        )
        assert est[p] <= exact <= est[p] + (est[p] >> 5) + 1, (p, est[p], exact)
