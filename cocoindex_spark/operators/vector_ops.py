"""Vector similarity primitives (SURVEY.md §2.7 vector top-k, §2.12.3
similarity join; reference: entity_resolution/__init__.py:200-262 FAISS
inner-product search, examples/text_embedding/main.py:149-156 pgvector
cosine top-k).

Two bit-identical spellings of every primitive: JVM higher-order array
expressions (``zip_with`` + ``aggregate``; self-contained plans, no
Python) and Arrow/numpy pandas UDFs (``*_arrow``). Spark interprets
higher-order lambdas per element (CodegenFallback), so stages that run
one dot per *candidate pair* use the Arrow spelling (~3× on measured
pair joins); per-row projections and oracle examples keep the
expression spelling. Equality of the two is pinned by test on random
vectors (tests/test_cross_engine.py).

Cross-engine determinism: float reductions are order-sensitive, so we
quantize per-term products to fixed-point BIGINTs (scale 2^40; the
float32×float32 product is exact in double, and a power-of-two multiply
never rounds) and sum integers — exact and order-independent. Scalar
IEEE double ops on those integers (divide, sqrt) are bit-identical in
every engine, which is what lets the DuckDB oracle hash-match.

At 100 TB the same expressions run unchanged: the brute-force variants
are for small query sets / re-rank stages, and candidate generation is
pushed through blocking keys or sign-LSH buckets so the join is an
equi-join on bucket id (shuffle on bucket, no cross product).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FIXED_BITS = 40
FIXED_SCALE = float(2**FIXED_BITS)  # 1099511627776.0


def dot_fixed(a: Column, b: Column) -> Column:
    """Fixed-point dot product of two float arrays → BIGINT column."""
    terms = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(x.cast("double") * y.cast("double") * F.lit(FIXED_SCALE)).cast(
            "long"
        ),
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, t: acc + t)


def sqnorm_fixed(a: Column) -> Column:
    return dot_fixed(a, a)


def cosine_from_fixed(dot: Column, sqnorm_a: Column, sqnorm_b: Column) -> Column:
    """Cosine similarity as IEEE double ops over fixed-point integers."""
    return dot.cast("double") / F.sqrt(sqnorm_a.cast("double") * sqnorm_b.cast("double"))


def cosine_fixed(a: Column, b: Column) -> Column:
    return cosine_from_fixed(dot_fixed(a, b), sqnorm_fixed(a), sqnorm_fixed(b))


# Pseudo-random ±1 hyperplane matrix for sign-LSH, derived by integer
# bit-mixing of (dimension, plane) — multiplicative-hash mix, take bit
# 16. Same formula spelled in both engines, all-integer, so buckets
# hash-match the oracle exactly. Real random hyperplanes (not
# axis-aligned first-k dims) keep recall on correlated embeddings —
# the axis-aligned variant wasted bits on correlated leading dims.
_MIX_A = 2654435761  # Knuth multiplicative constant
_MIX_B = 40503


def _plane_sign_spark(x: Column, i: Column, j: int) -> Column:
    mix = i.cast("long") * F.lit(_MIX_A) + F.lit(j * _MIX_B)
    positive = F.shiftright(mix, 16).bitwiseAND(F.lit(1)) == 0
    q = F.floor(x.cast("double") * F.lit(FIXED_SCALE)).cast("long")
    return F.when(positive, q).otherwise(-q)


def sign_bucket(a: Column, n_bits: int) -> Column:
    """Sign-random-projection LSH bucket: bit j = (h_j · a >= 0) for
    ``n_bits`` pseudo-random ±1 hyperplanes. Partitions the sphere into
    2^n regions — an equi-joinable candidate-blocking key (the 100 TB
    path: shuffle on bucket instead of a cross join). Projections are
    fixed-point integer sums (order-independent, exact), so the bucket
    id is bit-identical across engines.
    """
    def term_fn(j: int):
        # two-arg lambda (PySpark counts lambda parameters; a default
        # arg would make it look ternary)
        return lambda x, i: _plane_sign_spark(x, i, j)

    bucket = F.lit(0)
    for j in range(n_bits):
        proj = F.aggregate(
            F.transform(a, term_fn(j)),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


# --- DuckDB oracle fragments (identical formulas, SQL spelling) ---------


def sql_dot_fixed(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a})+1), "
        f"i -> CAST(floor(CAST({a}[i] AS DOUBLE)*CAST({b}[i] AS DOUBLE)*{FIXED_SCALE!r}) AS BIGINT)))"
    )


def sql_cosine_fixed(a: str, b: str) -> str:
    return (
        f"(CAST({sql_dot_fixed(a, b)} AS DOUBLE) / "
        f"sqrt(CAST({sql_dot_fixed(a, a)} AS DOUBLE) * CAST({sql_dot_fixed(b, b)} AS DOUBLE)))"
    )


def sql_sign_bucket(a: str, n_bits: int) -> str:
    """DuckDB spelling of sign_bucket — identical integer formula
    (1-based range index shifted to the 0-based mix)."""

    def proj(j: int) -> str:
        return (
            f"list_sum(list_transform(range(1, len({a})+1), i -> "
            f"(CASE WHEN ((((i-1)*{_MIX_A} + {j * _MIX_B}) >> 16) & 1) = 0 THEN 1 ELSE -1 END) * "
            f"CAST(floor(CAST({a}[i] AS DOUBLE)*{FIXED_SCALE!r}) AS BIGINT)))"
        )

    terms = " + ".join(
        f"(CASE WHEN {proj(j)} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(n_bits)
    )
    return f"({terms})"


# --- Arrow-vectorized spellings (bit-identical to the expressions) -----
#
# The zip_with/aggregate expressions above are CodegenFallback in Spark
# (higher-order functions interpret their lambda per element). That is
# fine where the expression runs once per row (bucket, sqnorm), but the
# pair-verify stages run one dot per CANDIDATE — at 100 TB that is the
# hot path. These pandas_udf variants compute the identical fixed-point
# integers with numpy (float64 product of two float32s is exact, the
# 2^40 multiply never rounds, floor→int64 matches the JVM), verified
# bit-equal in tests; Arrow batching amortizes the Python hop.


def dot_fixed_arrow(a, b):
    """Drop-in for ``dot_fixed`` on wide candidate sets (pandas UDF)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    def _dot(x, y):
        X = np.stack(x.to_numpy()).astype(np.float64)
        Y = np.stack(y.to_numpy()).astype(np.float64)
        return pd.Series(np.floor(X * Y * FIXED_SCALE).astype(np.int64).sum(axis=1))

    # real (non-string) annotations: this module uses `from __future__
    # import annotations`, which would turn inline hints into strings
    # pyspark's eval-type inference cannot resolve here
    _dot.__annotations__ = {"x": pd.Series, "y": pd.Series, "return": pd.Series}
    return pandas_udf(LongType())(_dot)(a, b)


def int_dot_arrow(a, b):
    """Plain integer dot of two BIGINT-array columns (pandas UDF) —
    the Arrow twin of the interpreted ``aggregate(zip_with(a*b))``
    spelling; int64 multiply-sum is exact for the |q| ≤ 127 code
    vectors it serves (q109/q127), and the giant expression tree's
    whole-stage-codegen cost disappears."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    def _dot(x, y):
        X = np.stack(x.to_numpy()).astype(np.int64)
        Y = np.stack(y.to_numpy()).astype(np.int64)
        return pd.Series((X * Y).sum(axis=1))

    _dot.__annotations__ = {"x": pd.Series, "y": pd.Series, "return": pd.Series}
    return pandas_udf(LongType())(_dot)(a, b)


def sign_bucket_arrow(a, n_bits: int):
    """Drop-in for ``sign_bucket`` (pandas UDF; one matmul per batch)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    def _bucket(col):
        X = np.stack(col.to_numpy())
        Q = np.floor(X.astype(np.float64) * FIXED_SCALE).astype(np.int64)
        i = np.arange(X.shape[1], dtype=np.int64)[:, None]
        j = np.arange(n_bits, dtype=np.int64)[None, :]
        signs = np.where((((i * _MIX_A + j * _MIX_B) >> 16) & 1) == 0, 1, -1).astype(
            np.int64
        )
        proj = Q @ signs
        bits = (proj >= 0).astype(np.int64) << np.arange(n_bits, dtype=np.int64)[None, :]
        return pd.Series(bits.sum(axis=1))

    _bucket.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf(LongType())(_bucket)(a)
