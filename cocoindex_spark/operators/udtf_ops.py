"""Native Python UDTF spellings of the one→many operators (SURVEY
§2.13 UDTF surface).

The engine's default fan-outs are pure expressions (``posexplode`` of a
built array — queries/textq.py q44) or Arrow ``mapInPandas``
(operators/multimodal.py): both stay off the row-at-a-time Python path.
Spark 4 adds first-class Python UDTFs (``@udtf``), which is the right
tool when per-row expansion logic is genuinely imperative — stateful
tokenizers, external parsers — and this module provides the chunker in
that form, pinned row-identical to the expression spelling by test
(tests/test_udtf_ops.py). Reference analog: splitter ``split`` methods
yielding chunk streams (rust/ops_text/src/split/recursive.rs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def make_chunk_udtf(chunk_size: int, stride: int):
    """UDTF class yielding q44-semantics word chunks of one text:
    windows of ``chunk_size`` words every ``stride`` words, short tail
    kept, 1-based ``start_word``."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="chunk_idx: bigint, chunk_text: string, "
        "n_words: bigint, start_word: bigint"
    )
    class ChunkWords:
        def eval(self, text: str):
            words = (text or "").strip().split(" ")
            n = len(words)
            idx = 0
            start = 0
            while start < n:
                piece = words[start : start + chunk_size]
                yield idx, " ".join(piece), len(piece), start + 1
                if start + chunk_size >= n:
                    break
                idx += 1
                start += stride

    return ChunkWords


def chunk_documents_udtf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Lateral-join the chunk UDTF against every row of ``df`` —
    returns (id, chunk_idx, chunk_text, n_words, start_word)."""
    spark = df.sparkSession
    name = f"__chunk_udtf_{chunk_size}_{stride}"
    spark.udtf.register(name, make_chunk_udtf(chunk_size, stride))
    df.createOrReplaceTempView("__chunk_udtf_in")
    return spark.sql(
        f"SELECT t.{id_col}, c.chunk_idx, c.chunk_text, c.n_words, c.start_word "
        f"FROM __chunk_udtf_in t, LATERAL {name}(t.{text_col}) c"
    )
