"""Similarity-search operator coverage (SURVEY.md §2.7, §2.12.3).

Brute-force cosine top-k is the correctness baseline
(examples/text_embedding/main.py:149-156 `ORDER BY embedding <=> $1
LIMIT k`); the blocked/LSH variants are the 100 TB scale path
(entity_resolution/__init__.py:453-465 range_search → here an
equi-join on a blocking key, no cross product).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cocoindex_spark.operators.vector_ops import (
    cosine_fixed,
    cosine_from_fixed,
    dot_fixed,
    dot_fixed_arrow,
    sign_bucket_arrow,
    sqnorm_fixed,
    sql_cosine_fixed,
    sql_dot_fixed,
    sql_sign_bucket,
)
from cocoindex_spark.queries.registry import register, table

_COS_AB = sql_cosine_fixed("a.embedding", "b.embedding")


# --- q20: brute-force cosine top-k against one query vector
@register(
    "q20_vector_topk",
    oracle=f"""
SELECT a.vec_id, a.label, {_COS_AB} AS sim
FROM embeddings a, embeddings b
WHERE b.vec_id = 0 AND a.vec_id <> 0
ORDER BY sim DESC, a.vec_id ASC
LIMIT 10
""",
)
def q20_vector_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            cosine_fixed(F.col("embedding"), F.col("q_emb")).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    )


# --- q21: k-NN for a batch of query vectors (broadcast queries × corpus,
#     per-query window top-k — the re-rank stage of any ANN pipeline)
@register(
    "q21_knn_batch",
    oracle=f"""
SELECT qid, vec_id, rk FROM (
  SELECT b.vec_id AS qid, a.vec_id AS vec_id,
         ROW_NUMBER() OVER (PARTITION BY b.vec_id ORDER BY {_COS_AB} DESC, a.vec_id ASC) AS rk
  FROM embeddings a, embeddings b
  WHERE b.vec_id < 10 AND a.vec_id <> b.vec_id
) WHERE rk <= 5
""",
)
def q21_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    sim = cosine_fixed(F.col("embedding"), F.col("q_emb"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", sim.alias("sim"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("qid", "vec_id", "rk")
    )


# --- q22: blocked similarity join (candidate generation by blocking key
#     = label, then exact cosine threshold — entity_resolution's
#     range_search restated as an equi-join + filter). Squared norms are
#     precomputed per row (O(n·d)) so the pair stage is O(pairs·d) for
#     the dot only — the shape that survives a 100× scale-up.
@register(
    "q22_similarity_join_blocked",
    oracle=f"""
WITH en AS (
  SELECT vec_id, label, embedding, {sql_dot_fixed("embedding", "embedding")} AS sqn
  FROM embeddings
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label AS label,
       CAST({sql_dot_fixed("a.embedding", "b.embedding")} AS DOUBLE)
         / sqrt(CAST(a.sqn AS DOUBLE) * CAST(b.sqn AS DOUBLE)) AS sim
FROM en a JOIN en b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE CAST({sql_dot_fixed("a.embedding", "b.embedding")} AS DOUBLE)
        / sqrt(CAST(a.sqn AS DOUBLE) * CAST(b.sqn AS DOUBLE)) >= 0.30
""",
)
def q22_similarity_join_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arrow spelling on the pair stage: one fixed-point dot per
    # CANDIDATE pair is the hot path; the numpy batch is ~3x the
    # interpreted higher-order expression, bit-identical (tested).
    e = table(spark, sf_dir, "embeddings").withColumn(
        "sqn", dot_fixed_arrow(F.col("embedding"), F.col("embedding"))
    ).localCheckpoint(eager=True)
    a = e.select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("label"),
        F.col("embedding").alias("a_emb"),
        F.col("sqn").alias("a_sqn"),
    )
    b = e.select(
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("b_label"),
        F.col("embedding").alias("b_emb"),
        F.col("sqn").alias("b_sqn"),
    )
    sim = cosine_from_fixed(
        dot_fixed_arrow(F.col("a_emb"), F.col("b_emb")), F.col("a_sqn"), F.col("b_sqn")
    )
    return (
        a.join(b, (F.col("label") == F.col("b_label")) & (F.col("a_id") < F.col("b_id")))
        .withColumn("sim", sim)
        .filter(F.col("sim") >= 0.30)
        .select("a_id", "b_id", "label", "sim")
    )


# --- q23: sign-LSH bucketed ANN join (the scale path: equi-join on an
#     8-bit orthant bucket, exact re-rank inside buckets)
_BUCKET_A = sql_sign_bucket("a.embedding", 8)
_BUCKET_B = sql_sign_bucket("b.embedding", 8)


@register(
    "q23_lsh_bucket_join",
    oracle=f"""
WITH eb AS (
  SELECT vec_id, embedding, {sql_sign_bucket("embedding", 8)} AS bucket,
         {sql_dot_fixed("embedding", "embedding")} AS sqn
  FROM embeddings
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.bucket AS bucket,
       CAST({sql_dot_fixed("a.embedding", "b.embedding")} AS DOUBLE)
         / sqrt(CAST(a.sqn AS DOUBLE) * CAST(b.sqn AS DOUBLE)) AS sim
FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE CAST({sql_dot_fixed("a.embedding", "b.embedding")} AS DOUBLE)
        / sqrt(CAST(a.sqn AS DOUBLE) * CAST(b.sqn AS DOUBLE)) >= 0.32
""",
)
def q23_lsh_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # localCheckpoint: bucket + sqnorm are computed once, not once per
    # join side; Arrow spellings (bit-equal to the expressions) since
    # this is the per-candidate hot path.
    e = (
        table(spark, sf_dir, "embeddings")
        .withColumn("bucket", sign_bucket_arrow(F.col("embedding"), 8))
        .withColumn("sqn", dot_fixed_arrow(F.col("embedding"), F.col("embedding")))
        .localCheckpoint(eager=True)
    )
    a = e.select(
        F.col("vec_id").alias("a_id"),
        F.col("bucket").alias("bucket"),
        F.col("embedding").alias("a_emb"),
        F.col("sqn").alias("a_sqn"),
    )
    b = e.select(
        F.col("vec_id").alias("b_id"),
        F.col("bucket").alias("b_bucket"),
        F.col("embedding").alias("b_emb"),
        F.col("sqn").alias("b_sqn"),
    )
    sim = cosine_from_fixed(
        dot_fixed_arrow(F.col("a_emb"), F.col("b_emb")), F.col("a_sqn"), F.col("b_sqn")
    )
    return (
        a.join(b, (F.col("bucket") == F.col("b_bucket")) & (F.col("a_id") < F.col("b_id")))
        .withColumn("sim", sim)
        .filter(F.col("sim") >= 0.32)
        .select("a_id", "b_id", "bucket", "sim")
    )


# --- q26: text → feature-hash embed → cosine top-k: the reference's
#     canonical quickstart pipeline (walk_dir → split → embed → vector
#     search, README quickstart; embedder SURVEY §2.10) with the
#     embedding computed by the JVM-side expression embedder
#     (operators/embed.py hash_embed_expr — no Python in the hot path).
from cocoindex_spark.operators.embed import sql_hash_embed  # noqa: E402

_EMB_DIM = 16
_SQL_TOKS = "string_split(trim(text), ' ')"


@register(
    "q26_hash_embed_knn",
    oracle=f"""
WITH emb AS (
  SELECT doc_id, {sql_hash_embed(_SQL_TOKS, _EMB_DIM)} AS embedding
  FROM documents
),
en AS (
  SELECT doc_id, embedding, {sql_dot_fixed("embedding", "embedding")} AS sqn FROM emb
)
SELECT a.doc_id, CAST({sql_dot_fixed("a.embedding", "q.embedding")} AS DOUBLE)
         / sqrt(CAST(a.sqn AS DOUBLE) * CAST(q.sqn AS DOUBLE)) AS sim
FROM en a, en q
WHERE q.doc_id = 0 AND a.doc_id <> 0 AND a.sqn > 0 AND q.sqn > 0
ORDER BY sim DESC, a.doc_id ASC
LIMIT 10
""",
)
def q26_hash_embed_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    # Scalable spelling of hash_embed_expr: explode tokens, hash each
    # token ONCE (the array-expression form would recompute md5 per
    # output dimension), then one groupBy with `dim` conditional sums.
    # Sums of ±1.0 are exact in double, so any accumulation order gives
    # the oracle's bit-identical result.
    toks = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("t")
    ).select(
        "doc_id",
        (F.conv(F.substring(F.md5(F.encode("t", "UTF-8")), 1, 8), 16, 10).cast("long") % _EMB_DIM)
        .alias("bucket"),
        F.when(
            F.conv(F.substring(F.md5(F.encode("t", "UTF-8")), 9, 1), 16, 10).cast("long") % 2 == 0,
            F.lit(1.0),
        )
        .otherwise(F.lit(-1.0))
        .alias("s"),
    )
    emb = (
        toks.groupBy("doc_id")
        .agg(
            *[
                F.sum(F.when(F.col("bucket") == i, F.col("s")).otherwise(F.lit(0.0)))
                .cast("float")
                .alias(f"c{i}")
                for i in range(_EMB_DIM)
            ]
        )
        .select(
            "doc_id", F.array(*[F.col(f"c{i}") for i in range(_EMB_DIM)]).alias("embedding")
        )
        .withColumn("sqn", sqnorm_fixed(F.col("embedding")))
    )
    q = emb.filter(F.col("doc_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("sqn").alias("q_sqn")
    )
    return (
        emb.filter((F.col("doc_id") != 0) & (F.col("sqn") > 0))
        .crossJoin(F.broadcast(q.filter(F.col("q_sqn") > 0)))
        .select(
            "doc_id",
            cosine_from_fixed(
                dot_fixed(F.col("embedding"), F.col("q_emb")), F.col("sqn"), F.col("q_sqn")
            ).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(10)
    )


# --- q25: IVF top-k — the ANN scale path beyond LSH. Cells = the
#     precomputed coarse assignment (`label`); centroids are computed
#     distributed (posexplode → groupBy, never collected); the query
#     probes the nprobe=2 nearest cells and exact-reranks only inside
#     them. At 100 TB the corpus is hash-partitioned by cell id, so a
#     probe touches 2/k of the data — partition pruning for vectors.
_IVF_SCALE = 67108864.0  # 2^26 — power-of-two quantizer, exact in double


@register(
    "q25_ivf_topk",
    oracle=f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
cent AS (
  SELECT label, i AS dim,
    CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * {_IVF_SCALE!r}) AS BIGINT)) AS DOUBLE)
      / COUNT(*) / {_IVF_SCALE!r} AS cval
  FROM embeddings CROSS JOIN UNNEST(range(1, 65)) AS t(i)
  GROUP BY label, i
),
cellrank AS (
  SELECT c.label,
         SUM(CAST(floor(c.cval * CAST(q.qe[c.dim] AS DOUBLE) * 1099511627776.0) AS BIGINT)) AS cdot
  FROM cent c, q
  GROUP BY c.label
  ORDER BY cdot DESC, label ASC
  LIMIT 2
)
SELECT a.vec_id, a.label, {sql_cosine_fixed("a.embedding", "qe")} AS sim
FROM embeddings a JOIN cellrank cr ON a.label = cr.label, q
WHERE a.vec_id <> 0
ORDER BY sim DESC, a.vec_id ASC
LIMIT 10
""",
)
def q25_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    # Distributed centroid build (no driver collect): cell × dim grid.
    cent = (
        e.select("label", F.posexplode("embedding").alias("dim0", "val"))
        .withColumn("dim", F.col("dim0") + 1)
        .withColumn("vf", F.floor(F.col("val").cast("double") * F.lit(_IVF_SCALE)).cast("long"))
        .groupBy("label", "dim")
        .agg((F.sum("vf").cast("double") / F.count("*") / F.lit(_IVF_SCALE)).alias("cval"))
    )
    # Rank cells by centroid·query (fixed-point, order-independent sum).
    cellrank = (
        cent.crossJoin(F.broadcast(q))
        .withColumn(
            "term",
            F.floor(
                F.col("cval") * F.element_at("q_emb", F.col("dim").cast("int")).cast("double")
                * F.lit(1099511627776.0)
            ).cast("long"),
        )
        .groupBy("label")
        .agg(F.sum("term").alias("cdot"))
        .orderBy(F.desc("cdot"), F.asc("label"))
        .limit(2)
        .select("label")
    )
    # Exact re-rank restricted to the probed cells (broadcast semi-join).
    return (
        e.join(F.broadcast(cellrank), "label", "left_semi")
        .filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            cosine_fixed(F.col("embedding"), F.col("q_emb")).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    )


# --- q27: multi-vector MaxSim late interaction (ColPali-style;
#     reference MultiVectorSchema, resources/schema.py:49-58 →
#     ArrayType(ArrayType(Float))). Docs = groups of 4 vectors; score =
#     Σ_q max_d cos(q, d). The query side (4 vectors) broadcasts; the
#     corpus shuffles once on (doc, query-vector) then once on doc —
#     the late-interaction shape that scales. Per-doc sums are
#     quantized to BIGINT so accumulation order can't change the hash.
@register(
    "q27_multivector_maxsim",
    oracle=f"""
WITH en AS (
  SELECT vec_id, vec_id // 4 AS mv_id, embedding,
         {sql_dot_fixed("embedding", "embedding")} AS sqn
  FROM embeddings
),
q AS (SELECT vec_id AS q_vid, embedding AS q_emb, sqn AS q_sqn FROM en WHERE mv_id = 0),
pair AS (
  SELECT a.mv_id, q.q_vid,
         MAX(CAST({sql_dot_fixed("a.embedding", "q.q_emb")} AS DOUBLE)
               / sqrt(CAST(a.sqn AS DOUBLE) * CAST(q.q_sqn AS DOUBLE))) AS m
  FROM en a, q
  WHERE a.mv_id <> 0
  GROUP BY a.mv_id, q.q_vid
)
SELECT mv_id,
       CAST(SUM(CAST(floor(m * 1099511627776.0) AS BIGINT)) AS DOUBLE) / 1099511627776.0
         AS maxsim
FROM pair
GROUP BY mv_id
ORDER BY maxsim DESC, mv_id ASC
LIMIT 10
""",
)
def q27_multivector_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        table(spark, sf_dir, "embeddings")
        .withColumn("mv_id", F.expr("vec_id div 4"))
        .withColumn("sqn", sqnorm_fixed(F.col("embedding")))
    )
    q = e.filter(F.col("mv_id") == 0).select(
        F.col("vec_id").alias("q_vid"),
        F.col("embedding").alias("q_emb"),
        F.col("sqn").alias("q_sqn"),
    )
    cos = cosine_from_fixed(
        dot_fixed(F.col("embedding"), F.col("q_emb")), F.col("sqn"), F.col("q_sqn")
    )
    pair = (
        e.filter(F.col("mv_id") != 0)
        .crossJoin(F.broadcast(q))
        .groupBy("mv_id", "q_vid")
        .agg(F.max(cos).alias("m"))
    )
    return (
        pair.groupBy("mv_id")
        .agg(
            (
                F.sum(F.floor(F.col("m") * F.lit(1099511627776.0)).cast("long")).cast("double")
                / F.lit(1099511627776.0)
            ).alias("maxsim")
        )
        .orderBy(F.desc("maxsim"), F.asc("mv_id"))
        .limit(10)
    )


# --- q24: per-label centroids via fixed-point elementwise aggregation
#     (posexplode → groupBy(label, dim) — fully distributed, no collect)
@register(
    "q24_label_centroids",
    oracle="""
SELECT label, i - 1 AS dim,
  CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 67108864.0) AS BIGINT)) AS DOUBLE)
    / COUNT(*) / 67108864.0 AS centroid,
  COUNT(*) AS n
FROM embeddings CROSS JOIN UNNEST(range(1, 65)) AS t(i)
GROUP BY label, i
""",
)
def q24_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label", F.posexplode("embedding").alias("dim", "val")
    ).withColumn(
        "val_fixed", F.floor(F.col("val").cast("double") * F.lit(67108864.0)).cast("long")
    )
    return exploded.groupBy("label", "dim").agg(
        (F.sum("val_fixed").cast("double") / F.count("*") / F.lit(67108864.0)).alias("centroid"),
        F.count("*").alias("n"),
    )


# --- q28: product-quantization (PQ) top-k — the compressed-domain ANN
#     scale path beyond IVF (q25): 64 dims split into 8 subspaces of 8;
#     each subvector is replaced by the id of its nearest codeword, so
#     at 100 TB the scan side carries 8 small ints per vector (codes)
#     instead of 256 bytes of floats, and candidate scoring is 8 lookup
#     joins into a per-query distance table. Codewords are sampled from
#     the data (the min-vec_id member of each coarse `label` cell — a
#     deterministic, division-free codebook; PQ with sampled codebooks
#     is standard practice), so every quantity stays an exact int64:
#     elements quantize at 2^20, squared distances < 2^49, partial dots
#     < 2^47. Approx top-50 then exact fixed-point re-rank to top-10.
_PQ_SCALE = 1048576.0  # 2^20 — power-of-two quantizer, exact in double
_PQ_NSUB = 8
_PQ_DSUB = 8  # 64 dims / 8 subspaces


@register(
    "q28_pq_topk",
    oracle=f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
rep AS (SELECT label, MIN(vec_id) AS rep_id FROM embeddings GROUP BY label),
cwd AS (
  SELECT r.label, i - 1 AS dim0, (i - 1) // {_PQ_DSUB} AS s,
         CAST(floor(CAST(e.embedding[i] AS DOUBLE) * {_PQ_SCALE!r}) AS BIGINT) AS cq
  FROM rep r JOIN embeddings e ON e.vec_id = r.rep_id
  CROSS JOIN UNNEST(range(1, 65)) AS t(i)
),
vd AS (
  SELECT e.vec_id, i - 1 AS dim0, (i - 1) // {_PQ_DSUB} AS s,
         CAST(floor(CAST(e.embedding[i] AS DOUBLE) * {_PQ_SCALE!r}) AS BIGINT) AS vq
  FROM embeddings e CROSS JOIN UNNEST(range(1, 65)) AS t(i)
  WHERE e.vec_id <> 0
),
dist AS (
  SELECT vd.vec_id, vd.s, c.label, SUM((vd.vq - c.cq) * (vd.vq - c.cq)) AS d2
  FROM vd JOIN cwd c ON vd.dim0 = c.dim0
  GROUP BY vd.vec_id, vd.s, c.label
),
code AS (
  SELECT vec_id, s, label AS code FROM (
    SELECT vec_id, s, label,
           ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2 ASC, label ASC) AS rk
    FROM dist) WHERE rk = 1
),
qd AS (
  SELECT i - 1 AS dim0,
         CAST(floor(CAST(qe[i] AS DOUBLE) * {_PQ_SCALE!r}) AS BIGINT) AS qq
  FROM q CROSS JOIN UNNEST(range(1, 65)) AS t(i)
),
qt AS (
  SELECT c.s, c.label, SUM(c.cq * qd.qq) AS pdot
  FROM cwd c JOIN qd ON c.dim0 = qd.dim0 GROUP BY c.s, c.label
),
approx AS (
  SELECT code.vec_id, CAST(SUM(qt.pdot) AS BIGINT) AS adot
  FROM code JOIN qt ON code.s = qt.s AND code.code = qt.label
  GROUP BY code.vec_id
),
top AS (SELECT vec_id, adot FROM approx ORDER BY adot DESC, vec_id ASC LIMIT 50)
SELECT e.vec_id, top.adot, {sql_cosine_fixed("e.embedding", "qe")} AS sim
FROM embeddings e JOIN top USING (vec_id), q
ORDER BY sim DESC, e.vec_id ASC
LIMIT 10
""",
)
def q28_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    quant = lambda c: F.floor(c.cast("double") * F.lit(_PQ_SCALE)).cast("long")  # noqa: E731
    sub = lambda dim0: F.floor(dim0 / F.lit(_PQ_DSUB)).cast("long")  # noqa: E731

    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    # Codebook: the min-vec_id member of each coarse cell, exploded to
    # (subspace, dim, quantized value). Tiny (n_labels × 64 rows).
    rep = e.groupBy("label").agg(F.min("vec_id").alias("rep_id"))
    cwd = (
        rep.join(
            e.select(F.col("vec_id").alias("rep_id"), F.col("embedding").alias("cw_emb")),
            "rep_id",
        )
        .select("label", F.posexplode("cw_emb").alias("dim0", "cval"))
        .select("label", "dim0", sub(F.col("dim0")).alias("s"), quant(F.col("cval")).alias("cq"))
        .localCheckpoint(eager=True)  # feeds both assignment and the query table
    )
    vd = (
        e.filter(F.col("vec_id") != 0)
        .select("vec_id", F.posexplode("embedding").alias("dim0", "val"))
        .select("vec_id", "dim0", sub(F.col("dim0")).alias("s"), quant(F.col("val")).alias("vq"))
    )
    # Assignment: nearest codeword per (vector, subspace), exact-integer
    # L2, ties to the smaller codeword id (same ORDER BY in the oracle).
    diff = F.col("vq") - F.col("cq")
    dist = (
        vd.join(F.broadcast(cwd.select("label", "dim0", "cq")), "dim0")
        .groupBy("vec_id", "s", "label")
        .agg(F.sum(diff * diff).alias("d2"))
    )
    code = (
        dist.groupBy("vec_id", "s")
        .agg(F.min(F.struct("d2", "label")).alias("m"))
        .select("vec_id", "s", F.col("m.label").alias("code"))
    )
    # Per-query distance table: one partial dot per (subspace, codeword).
    qd = q.select(F.posexplode("q_emb").alias("dim0", "qval")).select(
        "dim0", quant(F.col("qval")).alias("qq")
    )
    qt = (
        cwd.join(F.broadcast(qd), "dim0")
        .groupBy("s", "label")
        .agg(F.sum(F.col("cq") * F.col("qq")).alias("pdot"))
    )
    approx = (
        code.join(F.broadcast(qt), (code.s == qt.s) & (code.code == qt.label))
        .groupBy("vec_id")
        .agg(F.sum("pdot").alias("adot"))
        .orderBy(F.desc("adot"), F.asc("vec_id"))
        .limit(50)
    )
    # Exact fixed-point re-rank of the compressed-domain candidates.
    qx = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), sqnorm_fixed(F.col("embedding")).alias("q_sqn")
    )
    return (
        approx.join(e.select("vec_id", "embedding"), "vec_id")
        .crossJoin(F.broadcast(qx))
        .select(
            "vec_id",
            "adot",
            cosine_from_fixed(
                dot_fixed(F.col("embedding"), F.col("q_emb")),
                sqnorm_fixed(F.col("embedding")),
                F.col("q_sqn"),
            ).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    )


# --- q83: multi-probe LSH top-k — the recall lever that does NOT grow
#     the index. Single-bucket LSH (q23) misses neighbors that land one
#     sign-flip away; multi-probe additionally scans the query bucket's
#     Hamming-1 neighborhood (9 buckets of 2^8) — the classic
#     multi-probe trade (Lv et al.: probe sequence instead of more
#     tables), here as a broadcast 9-row probe list equi-joined to the
#     bucketed corpus, so the scan stays index-backed at any scale.
#     Ranking uses the RAW fixed-point dot product (BIGINT) as the sort
#     key — integer-exact in both engines, no float-ordering hazard —
#     with vec_id as the unique tiebreak.
_PROBE_MASKS = [0] + [1 << j for j in range(8)]
_SQL_MASKS = ", ".join(f"({m})" for m in _PROBE_MASKS)


@register(
    "q83_multiprobe_topk",
    oracle=f"""
WITH eb AS (
  SELECT vec_id, embedding, {sql_sign_bucket("embedding", 8)} AS bucket,
         {sql_dot_fixed("embedding", "embedding")} AS sqn
  FROM embeddings
),
q AS (SELECT bucket, embedding AS q_emb, sqn AS q_sqn FROM eb WHERE vec_id = 0),
probes AS (
  SELECT xor(q.bucket, m.m) AS bucket, q.q_emb, q.q_sqn
  FROM q, (VALUES {_SQL_MASKS}) AS m(m)
),
cand AS (
  SELECT e.vec_id,
         CAST({sql_dot_fixed("p.q_emb", "e.embedding")} AS BIGINT) AS dq,
         e.sqn, p.q_sqn
  FROM probes p JOIN eb e ON e.bucket = p.bucket
  WHERE e.vec_id <> 0
)
SELECT vec_id, dq,
       CAST(dq AS DOUBLE) / sqrt(CAST(sqn AS DOUBLE) * CAST(q_sqn AS DOUBLE)) AS sim
FROM cand ORDER BY dq DESC, vec_id ASC LIMIT 25
""",
)
def q83_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        table(spark, sf_dir, "embeddings")
        .withColumn("bucket", sign_bucket_arrow(F.col("embedding"), 8))
        .withColumn("sqn", dot_fixed_arrow(F.col("embedding"), F.col("embedding")))
        .localCheckpoint(eager=True)
    )
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("bucket").alias("qb"),
        F.col("embedding").alias("q_emb"),
        F.col("sqn").alias("q_sqn"),
    )
    probes = q.select(
        F.explode(
            F.array(*[F.col("qb").bitwiseXOR(F.lit(m)) for m in _PROBE_MASKS])
        ).alias("bucket"),
        "q_emb",
        "q_sqn",
    )
    cand = F.broadcast(probes).join(e, "bucket").filter(F.col("vec_id") != 0)
    return (
        cand.withColumn(
            "dq", dot_fixed_arrow(F.col("embedding"), F.col("q_emb"))
        )
        .select(
            "vec_id",
            "dq",
            cosine_from_fixed(F.col("dq"), F.col("sqn"), F.col("q_sqn")).alias("sim"),
        )
        .orderBy(F.desc("dq"), F.asc("vec_id"))
        .limit(25)
    )


# --- q109: int8-quantized top-k — the memory-scale path. Each vector is
#     L2-normalized and symmetric-quantized to an int8 code
#     (q_i = round(127·x_i/||x||), |q_i| ≤ 127 by construction — the
#     codec the zvec embedded dialect stores,
#     reference zvec/_target.py:525-536 QuantizeType.INT8); ranking is a
#     PURE-INTEGER dot product of codes, so the ORDER BY never compares
#     floats. At 100 TB the code table is 4× smaller than fp32 and the
#     integer dot is SIMD-friendly; candidate generation still comes
#     from the LSH/IVF paths — this is the re-rank representation.
#     Cross-engine exactness: ||x|| is derived from the order-independent
#     fixed-point sqnorm, and every later op is scalar IEEE double or
#     integer, spelled identically in both engines.
_SQL_NRM = f"sqrt(CAST({sql_dot_fixed('embedding', 'embedding')} AS DOUBLE)/1099511627776.0)"


@register(
    "q109_int8_quantized_topk",
    oracle=f"""
WITH coded AS (
  SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / {_SQL_NRM}) AS BIGINT)) AS code
  FROM embeddings
)
SELECT a.vec_id, a.label,
       CAST(list_sum(list_transform(range(1, len(a.code)+1),
                                    i -> a.code[i]*b.code[i])) AS BIGINT) AS qdot
FROM coded a, coded b
WHERE b.vec_id = 0 AND a.vec_id <> 0
ORDER BY qdot DESC, a.vec_id ASC
LIMIT 10
""",
)
def q109_int8_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cocoindex_spark.operators.vector_ops import FIXED_SCALE

    e = table(spark, sf_dir, "embeddings")
    nrm = F.sqrt(sqnorm_fixed(F.col("embedding")).cast("double") / F.lit(FIXED_SCALE))
    code = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * F.lit(127.0) / nrm).cast("long"),
    )
    coded = e.select("vec_id", "label", code.alias("code"))
    q = coded.filter(F.col("vec_id") == 0).select(F.col("code").alias("q_code"))
    qdot = F.aggregate(
        F.zip_with(F.col("code"), F.col("q_code"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    return (
        coded.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", qdot.alias("qdot"))
        .orderBy(F.desc("qdot"), F.asc("vec_id"))
        .limit(10)
    )


# --- q113: distributed k-means over the embedding corpus — the
#     clustering primitive LLM curation builds on (SemDeDup-style
#     semantic dedup, stratified sampling, domain discovery). K seed
#     centroids (the K smallest vec_ids), two Lloyd iterations, then
#     the final assignment — all integer fixed-point (components
#     quantized to BIGINT at 2^20; distances are exact BIGINT sums of
#     squared diffs; centroid means use `div`, truncation-identical in
#     both engines), so every assignment is value-exact, tie-broken by
#     centroid id. Plan shape at 100 TB: assignment = broadcast join
#     (K rows) + JVM expression per row; update = posexplode to
#     (cluster, dim) and ONE partial-aggregated groupBy shuffle of
#     64·N rows — the canonical distributed k-means; no driver state,
#     iterations unrolled like q82's PageRank. Reference analog:
#     entity_resolution/__init__.py:200-262 builds FAISS indexes for
#     candidate scoping; clustering is the same scoping primitive
#     engine-side.
_KM_K = 8
_KM_Q = 1048576.0  # 2^20: fp32 component → exact BIGINT


def _km_qv_sql(col: str) -> str:
    return (
        f"list_transform({col}, x -> CAST(floor(CAST(x AS DOUBLE)*{_KM_Q!r}) AS BIGINT))"
    )


_KM_D2 = (
    "CAST(list_sum(list_transform(range(1, len(v.qv)+1),"
    " i -> (v.qv[i]-c.cv[i])*(v.qv[i]-c.cv[i]))) AS BIGINT)"
)


@register(
    "q113_kmeans_clusters",
    oracle=f"""
WITH v AS (
  SELECT vec_id, {_km_qv_sql('embedding')} AS qv FROM embeddings
),
c0 AS (SELECT vec_id AS cid, qv AS cv FROM v WHERE vec_id < {_KM_K}),
a1 AS (
  SELECT v.vec_id, v.qv, c.cid, {_KM_D2} AS d2
  FROM v, c0 c
),
b1 AS (
  SELECT vec_id, qv, cid AS c1 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) rn
    FROM a1
  ) WHERE rn = 1
),
cd AS (
  SELECT c1, t.i AS d, SUM(qv[t.i]) AS s, COUNT(*) AS n
  FROM b1, range(1, 65) t(i)
  GROUP BY c1, t.i
),
c1v AS (SELECT c1 AS cid, list(s // n ORDER BY d) AS cv FROM cd GROUP BY c1),
a2 AS (
  SELECT v.vec_id, v.qv, c.cid, {_KM_D2} AS d2
  FROM v, c1v c
),
b2 AS (
  SELECT vec_id, qv, cid AS c2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) rn
    FROM a2
  ) WHERE rn = 1
),
cd2 AS (
  SELECT c2, t.i AS d, SUM(qv[t.i]) AS s, COUNT(*) AS n
  FROM b2, range(1, 65) t(i)
  GROUP BY c2, t.i
),
c2v AS (SELECT c2 AS cid, list(s // n ORDER BY d) AS cv FROM cd2 GROUP BY c2),
a3 AS (
  SELECT v.vec_id, c.cid, {_KM_D2} AS d2
  FROM v, c2v c
)
SELECT vec_id, cid AS cluster, d2 AS dist2 FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) rn
  FROM a3
) WHERE rn = 1
""",
)
def q113_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = km_quantized(table(spark, sf_dir, "embeddings"))
    c0 = km_seeds(v)
    b1 = km_assign(v, c0, "c1")
    c1 = km_update(b1, "c1")
    b2 = km_assign(v, c1, "c2")
    c2 = km_update(b2, "c2")
    b3 = km_assign(v, c2, "c3")
    return b3.select(
        "vec_id",
        F.col("c3").alias("cluster"),
        F.col("d2").alias("dist2"),
    )


def km_quantized(e: DataFrame) -> DataFrame:
    """(vec_id, qv) with fp32 components quantized to exact BIGINT."""
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(_KM_Q)).cast("long"),
    )
    return e.select("vec_id", qv.alias("qv"))


def _km_d2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )


def km_assign(vecs: DataFrame, cents: DataFrame, out: str) -> DataFrame:
    """argmin-distance assignment: broadcast K centroid rows, JVM
    expression distance, min on (d2, cid) struct — deterministic
    tie-break on centroid id."""
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id", "qv", "cid", _km_d2(F.col("qv"), F.col("cv")).alias("d2")
    )
    m = scored.groupBy("vec_id", "qv").agg(
        F.min(F.struct("d2", "cid")).alias("m")
    )
    return m.select("vec_id", "qv", F.col("m.cid").alias(out),
                    F.col("m.d2").alias("d2"))


def km_update(assigned: DataFrame, cl: str) -> DataFrame:
    """Centroid recompute: ONE groupBy shuffle over (cluster, dim)
    rows with map-side partial sums; integer mean via div."""
    dims = assigned.select(cl, F.posexplode("qv").alias("d", "val"))
    cd = dims.groupBy(cl, "d").agg(
        F.sum("val").alias("s"), F.count(F.lit(1)).alias("n")
    )
    cdv = cd.select(cl, "d", F.expr("s div n").alias("cd"))
    return cdv.groupBy(cl).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "cd"))),
            lambda s: s.getField("cd"),
        ).alias("cv")
    ).select(F.col(cl).alias("cid"), "cv")


def km_seeds(v: DataFrame) -> DataFrame:
    return v.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("cv")
    )


# Oracle CTE chain for a one-Lloyd-iteration assignment (seed → update →
# assign), reused by consumers of the clustering primitive (q114
# SemDeDup). Produces a relation `kma(vec_id, cluster)`.
KM_ONE_ITER_CTE = f"""
kmv AS (
  SELECT vec_id, {_km_qv_sql('embedding')} AS qv FROM embeddings
),
kmc0 AS (SELECT vec_id AS cid, qv AS cv FROM kmv WHERE vec_id < {_KM_K}),
kma1 AS (
  SELECT v.vec_id, v.qv, c.cid, {_KM_D2} AS d2
  FROM kmv v, kmc0 c
),
kmb1 AS (
  SELECT vec_id, qv, cid AS c1 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) rn
    FROM kma1
  ) WHERE rn = 1
),
kmcd AS (
  SELECT c1, t.i AS d, SUM(qv[t.i]) AS s, COUNT(*) AS n
  FROM kmb1, range(1, 65) t(i)
  GROUP BY c1, t.i
),
kmc1v AS (SELECT c1 AS cid, list(s // n ORDER BY d) AS cv FROM kmcd GROUP BY c1),
kma2 AS (
  SELECT v.vec_id, c.cid, {_KM_D2} AS d2
  FROM kmv v, kmc1v c
),
kma AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) rn
    FROM kma2
  ) WHERE rn = 1
)
"""


def km_one_iter_model(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Spark twin of KM_ONE_ITER_CTE: the trained coarse quantizer —
    ((vec_id, cluster) assignments, (cid, cv) centroids) after one
    Lloyd iteration from the deterministic seeds."""
    v = km_quantized(table(spark, sf_dir, "embeddings"))
    c0 = km_seeds(v)
    b1 = km_assign(v, c0, "c1")
    c1 = km_update(b1, "c1")
    b2 = km_assign(v, c1, "c2")
    return b2.select("vec_id", F.col("c2").alias("cluster")), c1


def km_one_iter_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return km_one_iter_model(spark, sf_dir)[0]


# --- q117: MMR diversity re-rank (Carbonell & Goldstein 1998 —
#     maximal marginal relevance). The retrieval stage returns a
#     bounded candidate set (top-20 by cosine here, the q20 shape);
#     MMR then greedily picks k=5 items maximizing
#     λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s), killing redundant
#     near-duplicate hits in RAG result lists. The greedy loop is
#     inherently sequential in k but k is a UI constant: each round is
#     a broadcast join of the (≤k-row) selected set against the
#     (bounded) candidate set — at 100 TB the corpus only feeds the
#     candidate stage; MMR never touches it. All similarities are the
#     fixed-point-integer cosine (bit-identical across engines);
#     deterministic (score DESC, vec_id ASC) tie-break per round.
_MMR_LAMBDA_N = 0.7
_MMR_TOPC = 20
_MMR_K = 5


def _mmr_oracle() -> str:
    dq = sql_dot_fixed("a.embedding", "q.embedding")
    dcs = sql_dot_fixed("c.embedding", "s.embedding")
    ctes = [
        f"""eb AS (
  SELECT vec_id, embedding, {sql_dot_fixed('embedding', 'embedding')} AS sqn
  FROM embeddings
)""",
        "qv AS (SELECT * FROM eb WHERE vec_id = 0)",
        f"""c0 AS (
  SELECT a.vec_id, a.embedding, a.sqn,
    CAST({dq} AS DOUBLE) / sqrt(CAST(a.sqn AS DOUBLE) * CAST(q.sqn AS DOUBLE)) AS rel
  FROM eb a, qv q WHERE a.vec_id <> 0
)""",
        f"""cand AS (
  SELECT * FROM c0
  QUALIFY row_number() OVER (ORDER BY rel DESC, vec_id ASC) <= {_MMR_TOPC}
)""",
        """s1 AS (
  SELECT vec_id, embedding, sqn, rel FROM cand
  QUALIFY row_number() OVER (ORDER BY rel DESC, vec_id ASC) = 1
)""",
    ]
    sel_union = "SELECT * FROM s1"
    for r in range(2, _MMR_K + 1):
        ctes.append(f"""sel{r - 1} AS ({sel_union})""")
        ctes.append(f"""p{r} AS (
  SELECT c.vec_id,
    MAX(CAST({dcs} AS DOUBLE) / sqrt(CAST(c.sqn AS DOUBLE) * CAST(s.sqn AS DOUBLE))) AS pen
  FROM cand c, sel{r - 1} s
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{r - 1})
  GROUP BY c.vec_id
)""")
        ctes.append(f"""s{r} AS (
  SELECT cand.vec_id, cand.embedding, cand.sqn, cand.rel
  FROM cand JOIN p{r} USING (vec_id)
  QUALIFY row_number() OVER (
    ORDER BY {_MMR_LAMBDA_N}*cand.rel - {1 - _MMR_LAMBDA_N:.1f}*p{r}.pen DESC,
             cand.vec_id ASC) = 1
)""")
        sel_union += f" UNION ALL SELECT * FROM s{r}"
    picks = " UNION ALL ".join(
        f"SELECT {r} AS sel_rank, vec_id, rel FROM s{r}" for r in range(1, _MMR_K + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + picks


@register("q117_mmr_rerank", oracle=_mmr_oracle())
def q117_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", sqnorm_fixed(F.col("embedding")).alias("sqn")
    )
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("sqn").alias("q_sqn")
    )
    rel = cosine_from_fixed(
        dot_fixed(F.col("embedding"), F.col("q_emb")), F.col("sqn"), F.col("q_sqn")
    )
    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "embedding", "sqn", rel.alias("rel"))
    )
    w = Window.orderBy(F.desc("rel"), F.asc("vec_id"))
    # The unpartitioned window ranks only to cut the top candidate set;
    # at scale this stage is the q20 top-k (rank via a per-partition
    # top-k + merge), never a full sort of the corpus.
    cand = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MMR_TOPC)
        .drop("rn")
        .localCheckpoint(eager=True)
    )
    sel = cand.orderBy(F.desc("rel"), F.asc("vec_id")).limit(1)
    picks = [sel.select(F.lit(1).alias("sel_rank"), "vec_id", "rel")]
    lam, mu = _MMR_LAMBDA_N, round(1 - _MMR_LAMBDA_N, 1)
    for r in range(2, _MMR_K + 1):
        s = sel.select(
            F.col("vec_id").alias("s_id"),
            F.col("embedding").alias("s_emb"),
            F.col("sqn").alias("s_sqn"),
        )
        rem = cand.join(sel.select("vec_id"), "vec_id", "left_anti")
        sim = cosine_from_fixed(
            dot_fixed(F.col("embedding"), F.col("s_emb")),
            F.col("sqn"),
            F.col("s_sqn"),
        )
        pen = (
            rem.crossJoin(F.broadcast(s))
            .select("vec_id", sim.alias("sim"))
            .groupBy("vec_id")
            .agg(F.max("sim").alias("pen"))
        )
        nxt = (
            cand.join(pen, "vec_id")
            .withColumn("score", F.lit(lam) * F.col("rel") - F.lit(mu) * F.col("pen"))
            .orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(1)
            .select("vec_id", "embedding", "sqn", "rel")
        )
        picks.append(nxt.select(F.lit(r).alias("sel_rank"), "vec_id", "rel"))
        sel = sel.select("vec_id", "embedding", "sqn", "rel").unionAll(nxt)
    out = picks[0]
    for p in picks[1:]:
        out = out.unionAll(p)
    return out


# --- q118: IVF-Flat top-k with a TRAINED coarse quantizer. q25's IVF
#     uses supervised label cells; real IVF (FAISS IndexIVFFlat — the
#     index the reference builds per entity group,
#     entity_resolution/__init__.py:200-262) trains unsupervised
#     centroids. Cells here are the k-means primitive's one-Lloyd-
#     iteration clusters (integer fixed-point, value-exact); each query
#     probes its nprobe=2 nearest cells by the same integer distance,
#     then re-ranks exactly inside the probed cells only. Scale shape:
#     probe = K-row broadcast, candidates = equi-join on cell id
#     (shuffle on cluster), re-rank candidate-scoped — recall grows via
#     nprobe, never a corpus scan.
_IVFK_NPROBE = 2
_IVFK_TOPK = 10
_IVFK_NQ = 5


@register(
    "q118_ivf_kmeans_topk",
    oracle=f"""
WITH {KM_ONE_ITER_CTE},
qs AS (
  SELECT vec_id AS qid, qv, embedding AS q_emb FROM (
    SELECT e.vec_id, v.qv, e.embedding FROM embeddings e JOIN kmv v USING (vec_id)
  ) WHERE vec_id < {_IVFK_NQ}
),
probe AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
      row_number() OVER (PARTITION BY q.qid ORDER BY
        CAST(list_sum(list_transform(range(1, len(q.qv)+1),
          i -> (q.qv[i]-c.cv[i])*(q.qv[i]-c.cv[i]))) AS BIGINT) ASC, c.cid ASC) AS rn
    FROM qs q, kmc1v c
  ) WHERE rn <= {_IVFK_NPROBE}
),
cand AS (
  SELECT p.qid, a.vec_id
  FROM probe p JOIN kma a ON a.cluster = p.cid
  WHERE a.vec_id <> p.qid
)
SELECT qid, vec_id, rk FROM (
  SELECT c.qid, c.vec_id,
    row_number() OVER (PARTITION BY c.qid ORDER BY
      {sql_cosine_fixed("e.embedding", "q.q_emb")} DESC, c.vec_id ASC) AS rk
  FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN qs q ON q.qid = c.qid
) WHERE rk <= {_IVFK_TOPK}
""",
)
def q118_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    assign, cents = km_one_iter_model(spark, sf_dir)
    v = km_quantized(e)
    qs = (
        v.filter(F.col("vec_id") < _IVFK_NQ)
        .join(e.select("vec_id", "embedding"), "vec_id")
        .select(
            F.col("vec_id").alias("qid"),
            F.col("qv").alias("q_qv"),
            F.col("embedding").alias("q_emb"),
        )
    )
    # nprobe nearest cells per query: K-row centroid broadcast, same
    # integer distance as training — the assignment function IS the
    # probe function.
    d2 = _km_d2(F.col("q_qv"), F.col("cv"))
    wq = Window.partitionBy("qid").orderBy(F.asc("d2"), F.asc("cid"))
    probe = (
        qs.crossJoin(F.broadcast(cents))
        .select("qid", "q_emb", "cid", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _IVFK_NPROBE)
        .select("qid", "q_emb", F.col("cid").alias("cluster"))
    )
    cand = probe.join(assign, "cluster").filter(F.col("vec_id") != F.col("qid"))
    withv = cand.join(
        e.select("vec_id", F.col("embedding").alias("c_emb")), "vec_id"
    )
    sim = cosine_fixed(F.col("c_emb"), F.col("q_emb"))
    wr = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        withv.select("qid", "vec_id", sim.alias("sim"))
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= _IVFK_TOPK)
        .select("qid", "vec_id", "rk")
    )


# --- q127: quantization recall evaluation — overlap@k between the
#     exact fixed-point-cosine top-10 (q20's ranking) and the
#     int8-code integer-dot top-10 (q109's ranking), per query, for a
#     10-query panel. The measurement that justifies shipping the
#     4×-smaller representation at 100 TB: recall@k of the compressed
#     ranking against the exact one, as integer overlap counts — the
#     evaluation itself is value-exact cross-engine because both
#     rankings are (deterministic scalar expression, unique-id
#     tie-break) and the overlap is a COUNT over an equi-join.
_QR_K = 10
_QR_NQ = 10


@register(
    "q127_quantization_recall",
    oracle=f"""
WITH en AS (
  SELECT vec_id, embedding, {sql_dot_fixed("embedding", "embedding")} AS sqn,
    list_transform(embedding,
      x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / {_SQL_NRM}) AS BIGINT)) AS code
  FROM embeddings
),
qs AS (SELECT * FROM en WHERE vec_id < {_QR_NQ}),
exact AS (
  SELECT qid, vec_id FROM (
    SELECT q.vec_id AS qid, a.vec_id,
      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        CAST({sql_dot_fixed("a.embedding", "q.embedding")} AS DOUBLE)
          / sqrt(CAST(a.sqn AS DOUBLE) * CAST(q.sqn AS DOUBLE)) DESC,
        a.vec_id ASC) AS rk
    FROM en a, qs q WHERE a.vec_id <> q.vec_id
  ) WHERE rk <= {_QR_K}
),
quant AS (
  SELECT qid, vec_id FROM (
    SELECT q.vec_id AS qid, a.vec_id,
      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        CAST(list_sum(list_transform(range(1, len(a.code)+1),
                                     i -> a.code[i]*q.code[i])) AS BIGINT) DESC,
        a.vec_id ASC) AS rk
    FROM en a, qs q WHERE a.vec_id <> q.vec_id
  ) WHERE rk <= {_QR_K}
)
SELECT e.qid,
  CAST(COUNT(qu.vec_id) AS BIGINT) AS n_overlap,
  CAST({_QR_K} AS BIGINT) AS k,
  (CAST(COUNT(qu.vec_id) AS BIGINT) * 1000) // {_QR_K} AS recall_milli
FROM exact e LEFT JOIN quant qu ON e.qid = qu.qid AND e.vec_id = qu.vec_id
GROUP BY e.qid
""",
)
def q127_quantization_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cocoindex_spark.operators.vector_ops import FIXED_SCALE

    e = table(spark, sf_dir, "embeddings")
    nrm = F.sqrt(sqnorm_fixed(F.col("embedding")).cast("double") / F.lit(FIXED_SCALE))
    code = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * F.lit(127.0) / nrm).cast("long"),
    )
    en = e.select(
        "vec_id",
        "embedding",
        sqnorm_fixed(F.col("embedding")).alias("sqn"),
        code.alias("code"),
    ).localCheckpoint(eager=True)
    qs = en.filter(F.col("vec_id") < _QR_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("sqn").alias("q_sqn"),
        F.col("code").alias("q_code"),
    )
    base = en.crossJoin(F.broadcast(qs)).filter(F.col("vec_id") != F.col("qid"))
    # Arrow twins on the pair stage (bit-equal to the interpreted
    # spellings): the giant dot-product expression trees otherwise pay
    # a multi-second whole-stage-codegen compile per fresh plan.
    from cocoindex_spark.operators.vector_ops import int_dot_arrow

    sim = cosine_from_fixed(
        dot_fixed_arrow(F.col("embedding"), F.col("q_emb")),
        F.col("sqn"),
        F.col("q_sqn"),
    )
    qdot = int_dot_arrow(F.col("code"), F.col("q_code"))
    # Materialize BOTH scores into one narrow frame before ranking:
    # embedding the scoring inside two window plans evaluates it twice.
    scored = base.select(
        "qid", "vec_id", sim.alias("sim"), qdot.alias("qdot")
    ).localCheckpoint(eager=True)
    we = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    wq = Window.partitionBy("qid").orderBy(F.desc("qdot"), F.asc("vec_id"))
    exact = (
        scored.withColumn("rk", F.row_number().over(we))
        .filter(F.col("rk") <= _QR_K)
        .select("qid", "vec_id")
    )
    quant = (
        scored.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= _QR_K)
        .select(F.col("qid").alias("q_qid"), F.col("vec_id").alias("q_vid"))
    )
    return (
        exact.join(
            quant,
            (F.col("qid") == F.col("q_qid")) & (F.col("vec_id") == F.col("q_vid")),
            "left",
        )
        .groupBy("qid")
        .agg(F.count("q_vid").cast("long").alias("n_overlap"))
        .select(
            "qid",
            "n_overlap",
            F.lit(_QR_K).cast("long").alias("k"),
            F.expr(f"(n_overlap * 1000) div {_QR_K}").alias("recall_milli"),
        )
    )


# --- q149: binary-sign Hamming top-k — the 1-bit-per-dimension
#     compressed ANN baseline (Charikar's sign random projections /
#     "binary hashing": dot-product rank preserved in expectation by
#     Hamming distance over sign bits). Every embedding packs to ONE
#     BIGINT (bit j set ⟺ e_j >= 0), the probe code broadcasts as a
#     1-row side, distance is xor+bit_count — integer-exact in both
#     engines — and the cut is TakeOrdered. At 100 TB this is the scan
#     you CAN afford (8 bytes/vector, SIMD popcount) before any float
#     re-rank; the float re-rank path is q109/q28.
_HAM_DIM = 16
_HAM_K = 10


def _sql_sign_code(a: str) -> str:
    return "(" + " + ".join(
        f"(CASE WHEN {a}[{j + 1}] >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(_HAM_DIM)
    ) + ")"


@register(
    "q149_hamming_topk",
    oracle=f"""
WITH coded AS (
  SELECT vec_id, {_sql_sign_code("embedding")} AS code FROM embeddings
),
probe AS (SELECT code AS qc FROM coded WHERE vec_id = 0)
SELECT c.vec_id, bit_count(xor(c.code, p.qc)) AS hamming
FROM coded c, probe p
WHERE c.vec_id <> 0
ORDER BY hamming ASC, c.vec_id ASC
LIMIT {_HAM_K}
""",
)
def q149_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    code = sum(
        (
            F.when(F.element_at("embedding", j + 1) >= 0, F.lit(1 << j)).otherwise(
                F.lit(0)
            )
            for j in range(_HAM_DIM)
        ),
        F.lit(0),
    ).cast("long")
    coded = e.select("vec_id", code.alias("code"))
    probe = coded.filter(F.col("vec_id") == 0).select(F.col("code").alias("qc"))
    return (
        coded.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            F.bit_count(F.col("code").bitwiseXOR(F.col("qc"))).alias("hamming"),
        )
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(_HAM_K)
    )
