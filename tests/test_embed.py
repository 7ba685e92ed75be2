"""Embedder + rate-limiter tests (reference test strategy: deterministic
fake embedder, python/tests/ops/test_entity_resolution.py; batching
split-retry, test_function_batching.py)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from cocoindex_spark.operators.embed import (
    FakeModel,
    PandasEmbedder,
    VectorSchema,
    _encode_with_split_retry,
    hash_embed_expr,
)
from cocoindex_spark.operators.rate_limit import TokenBucket, executor_bucket


def test_pandas_embedder_schema_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(50)], "id long, text string"
    )
    emb = PandasEmbedder(lambda: FakeModel(dim=8), VectorSchema(8), max_batch_size=16)
    out = emb.embed_column(df, "text")
    assert out.schema["embedding"].dataType.simpleString() == "array<float>"
    rows = {r.id: r.embedding for r in out.collect()}
    assert len(rows) == 50 and all(len(v) == 8 for v in rows.values())
    # deterministic across runs (stable hashing, not RNG)
    rows2 = {r.id: r.embedding for r in emb.embed_column(df, "text").collect()}
    assert rows == rows2


def test_split_retry_isolates_poison_item():
    model = FakeModel(dim=4, fail_on="POISON")
    texts = ["ok1", "ok2", "POISON here", "ok3", "ok4", "ok5"]
    out = _encode_with_split_retry(model, texts)
    assert len(out) == 6
    assert out[2] is None  # only the poison item failed
    assert all(v is not None for i, v in enumerate(out) if i != 2)


def test_pandas_embedder_with_poison_row(spark):
    df = spark.createDataFrame(
        [(0, "fine"), (1, "POISON pill"), (2, "also fine")], "id long, text string"
    )
    emb = PandasEmbedder(lambda: FakeModel(dim=4, fail_on="POISON"), VectorSchema(4))
    rows = {r.id: r.embedding for r in emb.embed_column(df, "text").collect()}
    assert rows[1] is None and rows[0] is not None and rows[2] is not None


def test_hash_embed_expr_properties(spark):
    df = spark.createDataFrame([("a b c",), ("a b c",), ("x y",)], "text string")
    out = df.select(hash_embed_expr(F.split(F.col("text"), " "), 8).alias("e")).collect()
    assert [len(r.e) for r in out] == [8, 8, 8]
    assert out[0].e == out[1].e  # deterministic
    assert out[0].e != out[2].e


def test_token_bucket_rates():
    b = TokenBucket(rate_per_sec=1000, burst=10)
    # burst drains immediately
    assert all(b.try_acquire() for _ in range(10))
    assert not b.try_acquire()
    # refill: ~1000/s ⇒ 5 tokens in ~5ms
    t0 = time.monotonic()
    assert b.acquire(5, timeout=1.0)
    assert time.monotonic() - t0 < 0.5
    # timeout path
    slow = TokenBucket(rate_per_sec=0.5, burst=1)
    assert slow.acquire(1)
    assert not slow.acquire(1, timeout=0.05)


def test_token_bucket_unsatisfiable_raises():
    """acquire(n) with n above capacity can never be satisfied — it must
    raise instead of blocking the Spark task forever."""
    import pytest

    b = TokenBucket(rate_per_sec=100, burst=4)
    with pytest.raises(ValueError, match="never be satisfied"):
        b.acquire(5)
    with pytest.raises(ValueError, match="never be satisfied"):
        b.try_acquire(5)


def test_embedder_caps_batch_at_limiter_capacity(spark):
    """A limiter whose burst is below max_batch_size must not hang: the
    embedder shrinks its chunk size to the bucket capacity."""
    emb = PandasEmbedder(
        lambda: FakeModel(dim=2),
        VectorSchema(2),
        max_batch_size=256,
        rate_limiter=TokenBucket(rate_per_sec=1000, burst=8),
    )
    df = spark.createDataFrame([(f"t{i}",) for i in range(20)], "text STRING")
    out = emb.embed_column(df, "text")
    assert out.count() == 20


def test_executor_bucket_shared():
    b1 = executor_bucket("api-x", 100)
    b2 = executor_bucket("api-x", 999)  # same name → same bucket, rate kept
    assert b1 is b2 and b1.rate == 100


def test_cluster_rate_limit_divides_by_executors(spark):
    from cocoindex_spark.operators.rate_limit import ClusterRateLimit

    lim = ClusterRateLimit("api-y", cluster_rate_per_sec=120.0, burst=12.0, spark=spark)
    assert lim.n_executors >= 1  # local mode: 1
    assert lim.share_rate * lim.n_executors == 120.0
    assert lim.share_burst * lim.n_executors == 12.0


def test_cluster_rate_limit_global_bound_across_simulated_executors():
    """N executor processes each run a bucket at rate/N: their joint
    admission over a window must stay under the CLUSTER rate (+ burst
    headroom), i.e. the aggregate does not multiply with N."""
    import threading
    import time

    from cocoindex_spark.operators.rate_limit import ClusterRateLimit, TokenBucket

    n_exec = 4
    cluster_rate, burst = 200.0, 20.0
    lim = ClusterRateLimit("api-z", cluster_rate, burst=burst)
    lim.n_executors = n_exec  # simulate the driver having seen 4 executors
    # each "process" builds its own bucket from the shipped share
    buckets = [TokenBucket(lim.share_rate, lim.share_burst) for _ in range(n_exec)]
    assert buckets[0].rate == cluster_rate / n_exec

    admitted = [0] * n_exec
    stop = time.monotonic() + 0.5

    def worker(i: int) -> None:
        while time.monotonic() < stop:
            if buckets[i].try_acquire(1.0):
                admitted[i] += 1
            else:
                time.sleep(0.002)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_exec)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    total = sum(admitted)
    # 0.5 s at 200/s sustained + 20 burst = 120 max; the unbounded
    # per-executor mistake would admit ~4× that. Generous margin for
    # scheduler jitter.
    assert total <= cluster_rate * 0.5 + burst + 10
    assert total >= 20  # sanity: the buckets actually admitted work


def test_embedder_threads_cluster_limiter(spark):
    """The embed path accepts ClusterRateLimit directly: chunks cap at
    the per-executor SHARE capacity (not the cluster burst), and the
    Arrow batches flow through its shared executor bucket."""
    from cocoindex_spark.operators.rate_limit import (
        _EXECUTOR_BUCKETS,
        ClusterRateLimit,
    )

    lim = ClusterRateLimit(
        "api-embed-e2e", cluster_rate_per_sec=10_000.0, burst=6.0, spark=spark
    )
    assert lim.capacity == 6.0 / lim.n_executors
    emb = PandasEmbedder(
        lambda: FakeModel(dim=2),
        VectorSchema(2),
        max_batch_size=256,  # far above capacity: must shrink, not hang
        rate_limiter=lim,
    )
    df = spark.createDataFrame([(f"t{i}",) for i in range(25)], "text STRING")
    out = emb.embed_column(df, "text").collect()
    assert len(out) == 25 and all(len(r["embedding"]) == 2 for r in out)
    # the limiter's bucket is the NAMED process-shared bucket at the
    # divided share rate (each Python worker process builds its own —
    # they run in separate processes, so probe the construction here)
    b = lim.bucket()
    assert b.rate == lim.share_rate and b is _EXECUTOR_BUCKETS["api-embed-e2e"]
