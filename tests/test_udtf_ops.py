"""Native Python UDTF chunker — row-identical to the expression
spelling (q44's posexplode pipeline)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_udtf_chunker_matches_expression_chunker(spark):
    from cocoindex_spark.operators.udtf_ops import chunk_documents_udtf
    from cocoindex_spark.queries import all_queries

    expr_rows = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_words"], r["start_word"])
        for r in all_queries()["q44_chunk_documents"](spark, SF).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    udtf_rows = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_words"], r["start_word"])
        for r in chunk_documents_udtf(docs, "doc_id", "text", 32, 24).collect()
    }
    assert udtf_rows == expr_rows


def test_udtf_chunker_edge_cases(spark):
    from cocoindex_spark.operators.udtf_ops import chunk_documents_udtf

    df = spark.createDataFrame(
        [(1, "one two three"), (2, " ".join(f"w{i}" for i in range(70))), (3, "")],
        "doc_id LONG, text STRING",
    )
    rows = chunk_documents_udtf(df, "doc_id", "text", 8, 5).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    # short doc: one chunk, all words
    assert len(by_doc[1]) == 1 and by_doc[1][0]["chunk_text"] == "one two three"
    # 70 words, size 8 stride 5: starts 0,5,...; last chunk is the one
    # whose window first reaches the end
    starts = [r["start_word"] for r in by_doc[2]]
    assert starts == list(range(1, 67, 5))
    assert by_doc[2][-1]["n_words"] == 5  # words 66..70
    assert all(r["n_words"] == 8 for r in by_doc[2][:-1])
    # empty text → single empty-token chunk (split(' ') semantics)
    assert len(by_doc[3]) == 1 and by_doc[3][0]["n_words"] == 1
