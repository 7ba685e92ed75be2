"""Embedding operators (reference: `python/cocoindex/ops/
sentence_transformers.py:53-94` ``SentenceTransformerEmbedder.embed`` —
local model, OOM-aware, thread-safe, vector-schema provider;
`python/cocoindex/ops/litellm.py:170-322` ``LiteLLMEmbedder.embed`` —
API embedding with transient-vs-credential retry classification;
`ops/litellm.py:325-380` ``LiteLLMTranscriber.transcribe``).

Two execution paths, both 100 TB-shaped:

1. **Expression path** (`hash_embed_expr`): a feature-hashing embedder
   written entirely in built-in SQL functions — tokens are hashed to
   buckets with signed counts. Stays JVM-side in whole-stage codegen;
   used as the deterministic test/oracle embedder and as a cheap
   lexical-vector baseline.
2. **Pandas-UDF path** (`PandasEmbedder.embed_column`): Arrow-batched
   ``mapInPandas`` with a per-executor model singleton (broadcast-once,
   load-once — the reference's thread-safe lazy model at
   sentence_transformers.py:53), adaptive batch splitting on failure
   (RetryWithSmallerBatch, `_internal/batching.py:31` — binary-split
   down to size 1), and an optional token-bucket rate limiter for API
   models (rate_limit.py analog).

The actual sentence-transformers / API clients are not installed in
this container; `SentenceTransformerModel` import-gates them and tests
inject `FakeModel` — the Spark plumbing (schema, batching, retry,
partitioning) is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, StringType, StructField, StructType


# ---------------------------------------------------------------------------
# Vector schema (resources/schema.py:23-40 VectorSchema)
@dataclass(frozen=True)
class VectorSchema:
    dim: int
    dtype: str = "float32"

    @property
    def spark_type(self) -> ArrayType:
        return ArrayType(FloatType(), containsNull=False)


# ---------------------------------------------------------------------------
# Path 1: expression-based feature-hashing embedder (JVM-side)
def _bucket_of(tok: Column, dim: int) -> Column:
    # First 8 hex chars of md5 → integer; reproducible in any engine.
    return F.conv(F.substring(F.md5(F.encode(tok, "UTF-8")), 1, 8), 16, 10).cast("long")


def hash_embed_expr(tokens: Column, dim: int = 16) -> Column:
    """Signed feature-hashing embedding of a token array → float array.

    vec[i] = Σ_tok sign(tok) · 1[h(tok) mod dim == i]; sign from the
    9th hex digit's parity. Pure built-in functions — no Python.
    """
    h = lambda t: _bucket_of(t, dim)  # noqa: E731
    sign = lambda t: F.when(  # noqa: E731
        F.conv(F.substring(F.md5(F.encode(t, "UTF-8")), 9, 1), 16, 10).cast("long") % 2 == 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    def bucket_sum(i: int) -> Column:
        return F.aggregate(
            tokens,
            F.lit(0.0),
            lambda acc, t: acc + F.when(h(t) % dim == i, sign(t)).otherwise(F.lit(0.0)),
        ).cast("float")

    return F.array(*[bucket_sum(i) for i in range(dim)])


def sql_hash_embed(tokens: str, dim: int = 16) -> str:
    """DuckDB spelling of hash_embed_expr (oracle parity)."""
    comps = []
    h = "CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)"
    sign = (
        "(CASE WHEN CAST(concat('0x', substr(md5(t), 9, 1)) AS BIGINT) % 2 = 0 "
        "THEN 1.0 ELSE -1.0 END)"
    )
    for i in range(dim):
        comps.append(
            f"CAST(list_sum(list_transform({tokens}, "
            f"t -> CASE WHEN {h} % {dim} = {i} THEN {sign} ELSE 0.0 END)) AS FLOAT)"
        )
    return "[" + ", ".join(comps) + "]"


# ---------------------------------------------------------------------------
# Path 2: pandas-UDF embedder with per-executor model singleton
class FakeModel:
    """Deterministic stand-in for a real encoder (the reference's test
    strategy: deterministic fake embedder, test_entity_resolution.py).
    Encodes |texts| → (n, dim) lists via stable hashing."""

    def __init__(self, dim: int = 8, fail_on: str | None = None):
        self.dim = dim
        self.fail_on = fail_on  # simulate a poison item for split-retry

    def encode(self, texts: list[str]) -> list[list[float]]:
        import hashlib

        out = []
        for t in texts:
            if self.fail_on is not None and self.fail_on in t:
                raise RuntimeError(f"poison item: {t[:30]}")
            d = hashlib.md5(t.encode()).digest()
            out.append([((d[i % 16] / 255.0) * 2 - 1) for i in range(self.dim)])
        return out


class SentenceTransformerModel:
    """Import-gated real model (sentence_transformers.py:53-94). Loads
    lazily once per executor process; raises a clear error when the
    library is absent (this container)."""

    def __init__(self, model_name: str, dim: int):
        self.model_name = model_name
        self.dim = dim
        self._model = None

    def encode(self, texts: list[str]) -> list[list[float]]:
        if self._model is None:
            try:
                from sentence_transformers import SentenceTransformer  # type: ignore
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "sentence-transformers is not installed in this environment; "
                    "inject FakeModel or install the library"
                ) from e
            self._model = SentenceTransformer(self.model_name)
        return [list(map(float, v)) for v in self._model.encode(texts)]


def _encode_with_split_retry(model, texts: list[str]) -> list[list[float] | None]:
    """RetryWithSmallerBatch (_internal/batching.py:31; docs
    function.mdx:313-328): on batch failure, binary-split and retry
    down to single items; a failing single item yields None instead of
    poisoning its whole Arrow batch."""
    if not texts:
        return []
    try:
        return model.encode(texts)
    except Exception:
        if len(texts) == 1:
            return [None]
        mid = len(texts) // 2
        return _encode_with_split_retry(model, texts[:mid]) + _encode_with_split_retry(
            model, texts[mid:]
        )


class GpuRunner:
    """The ``runner=coco.GPU`` analog (reference
    python/cocoindex/_internal/runner.py:38-485: route a function's
    execution onto GPU capacity). Spark-first realization: **stage-level
    scheduling** — a ResourceProfile attached to the embedding stage
    requests GPU task slots for just that stage, so the scan/shuffle
    stages around it keep CPU-sized parallelism. Requires a cluster
    with GPU resource discovery configured
    (``spark.executor.resource.gpu.*``); profile construction is pure
    and testable anywhere."""

    def __init__(self, gpus_per_task: float = 1.0, cpus_per_task: int = 1):
        self.gpus_per_task = gpus_per_task
        self.cpus_per_task = cpus_per_task

    def resource_profile(self):
        from pyspark.resource import ResourceProfileBuilder, TaskResourceRequests

        reqs = TaskResourceRequests().cpus(self.cpus_per_task).resource(
            "gpu", self.gpus_per_task
        )
        return ResourceProfileBuilder().require(reqs).build


class PandasEmbedder:
    """Arrow-batched embedding over a text column.

    ``model_factory`` runs once per executor process (module-level
    memo) — the broadcast-model pattern. Pass ``runner=GpuRunner(...)``
    to pin the embedding stage onto GPU task slots via stage-level
    scheduling (runner.py:38-485 analog).

    ``rate_limiter`` takes either a plain ``TokenBucket`` (per-executor
    rate — each executor process gets the full rate) or a
    ``ClusterRateLimit`` (rate_limit.py:117), which bounds AGGREGATE
    QPS across the cluster: it divides the cluster rate by the live
    executor count at plan-build time and each executor's shared bucket
    runs at that share, so N executors jointly stay under the global
    rate (the reference's process-global bucket, resources/
    rate_limit.py:11, restated for a multi-process cluster). Chunk
    sizes are capped at the limiter's per-acquire capacity so a single
    acquire can never exceed the bucket and hang the task.
    """

    def __init__(
        self,
        model_factory: Callable[[], object],
        schema: VectorSchema,
        max_batch_size: int = 256,
        rate_limiter=None,
        runner: GpuRunner | None = None,
    ):
        self.model_factory = model_factory
        self.schema = schema
        self.max_batch_size = max_batch_size
        self.rate_limiter = rate_limiter
        self.runner = runner

    def embed_column(self, df: DataFrame, text_col: str, out_col: str = "embedding") -> DataFrame:
        out_schema = StructType(
            df.schema.fields + [StructField(out_col, self.schema.spark_type, True)]
        )
        factory = self.model_factory
        max_bs = self.max_batch_size
        limiter = self.rate_limiter
        if limiter is not None:
            # A chunk larger than the bucket's capacity could never
            # acquire() and would hang the task forever — cap at
            # capacity (for ClusterRateLimit: the per-executor SHARE
            # capacity, which is what its bucket can ever admit).
            cap = int(getattr(limiter, "capacity", max_bs))
            max_bs = max(1, min(max_bs, cap))

        def run(batches: Iterator) -> Iterator:
            model = factory()  # one per task; process-level caches inside
            for pdf in batches:
                texts = pdf[text_col].tolist()
                vecs: list[list[float] | None] = []
                for i in range(0, len(texts), max_bs):
                    chunk = texts[i : i + max_bs]
                    if limiter is not None:
                        limiter.acquire(len(chunk))
                    vecs.extend(_encode_with_split_retry(model, chunk))
                pdf = pdf.copy()
                pdf[out_col] = vecs
                yield pdf

        if self.runner is not None:
            return df.mapInPandas(
                run, schema=out_schema, profile=self.runner.resource_profile()
            )
        return df.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# Transcriber stub (litellm.py:325-380): binary audio → text. The
# decode itself needs an external model/API — stubbed; the Spark
# plumbing (binary in, text out, Arrow batches) is the same shape as
# PandasEmbedder and is exercised via `transcribe_fn` injection.
def transcribe_column(
    df: DataFrame,
    audio_col: str,
    transcribe_fn: Callable[[bytes], str] | None = None,
    out_col: str = "transcript",
) -> DataFrame:
    out_schema = StructType(df.schema.fields + [StructField(out_col, StringType(), True)])

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            if transcribe_fn is None:
                raise NotImplementedError(
                    "no transcription backend in this environment; inject transcribe_fn"
                )
            pdf = pdf.copy()
            pdf[out_col] = [transcribe_fn(b) for b in pdf[audio_col]]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
