"""localfs scan + pattern matcher + splitters (reference:
tests/connectors/test_localfs_source.py style; ops tests
test_text.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cocoindex_spark.operators.split import (
    explode_chunks,
    split_by_separator,
    split_recursive,
)
from cocoindex_spark.sources.localfs import PatternFilePathMatcher, scan_dir


def test_pattern_matcher_negation():
    m = PatternFilePathMatcher(
        included_patterns=["**/*.md", "**/*.py"],
        excluded_patterns=["**/vendor/**", "!**/vendor/keep.py"],
    )
    assert m.matches("a/b.md")
    assert m.matches("x.py")
    assert not m.matches("x.rs")
    assert not m.matches("src/vendor/lib.py")
    assert m.matches("src/vendor/keep.py")  # '!' re-include wins


def test_pattern_matcher_single_star_no_dirs():
    m = PatternFilePathMatcher(included_patterns=["*.md"])
    assert m.matches("top.md")
    assert not m.matches("nested/deep.md")


def test_pattern_match_col_parity(spark):
    """The JVM-compiled glob filter (match_col) must agree with the
    Python matcher on every path — they share the glob→regex
    translation, this pins the CASE-chain ordering (last match wins)."""
    from pyspark.sql import functions as F

    m = PatternFilePathMatcher(
        included_patterns=["**/*.md", "**/*.py", "docs/?.txt"],
        excluded_patterns=["**/vendor/**", "!**/vendor/keep.py", "**/tmp/**"],
    )
    paths = [
        "a/b.md", "x.py", "x.rs", "src/vendor/lib.py", "src/vendor/keep.py",
        "docs/a.txt", "docs/ab.txt", "tmp/x.md", "deep/tmp/y.py",
        "src/vendor/tmp/keep.py", "weird*name.md", "dot.file.py",
    ]
    df = spark.createDataFrame([(p,) for p in paths], "relpath STRING")
    got = {
        r["relpath"]: r["ok"]
        for r in df.select("relpath", m.match_col(F.col("relpath")).alias("ok")).collect()
    }
    assert got == {p: m.matches(p) for p in paths}


def test_decode_text_any_column_name(spark):
    """decode_text must work on derived/renamed binary columns (the BOM
    branches used to hard-code the name 'content')."""
    from pyspark.sql import functions as F

    from cocoindex_spark.sources.localfs import decode_text

    df = spark.createDataFrame(
        [(b"\xef\xbb\xbfutf8 bom",), (b"\xff\xfeh\x00i\x00",), (b"plain",)],
        "blob BINARY",
    )
    out = [r["t"] for r in df.select(decode_text(F.col("blob")).alias("t")).collect()]
    assert out == ["utf8 bom", "hi", "plain"]


def test_scan_dir(spark, tmp_state):
    root = os.path.join(tmp_state, "corpus")
    os.makedirs(os.path.join(root, "sub"))
    with open(os.path.join(root, "a.md"), "w") as f:
        f.write("hello")
    with open(os.path.join(root, "sub", "b.md"), "w") as f:
        f.write("world!")
    with open(os.path.join(root, "sub", "c.txt"), "w") as f:
        f.write("skip me")

    df = scan_dir(spark, root, included_patterns=["**/*.md"], binary=False)
    rows = {r["relpath"]: (r["size"], r["text"]) for r in df.collect()}
    assert rows == {"a.md": (5, "hello"), "sub/b.md": (6, "world!")}


def test_scan_dir_bom_decode(spark, tmp_state):
    root = os.path.join(tmp_state, "bom")
    os.makedirs(root)
    with open(os.path.join(root, "bom.txt"), "wb") as f:
        f.write(b"\xef\xbb\xbfbom text")
    df = scan_dir(spark, root, binary=False)
    assert df.collect()[0]["text"] == "bom text"


def test_split_by_separator_positions():
    text = "aaa\n\nbbb\n\nccc"
    chunks = split_by_separator(text, separator=r"\n\n", chunk_size=4)
    assert [c.text for c in chunks] == ["aaa", "bbb", "ccc"]
    assert chunks[0].start_char == 0 and chunks[0].end_char == 3
    assert chunks[1].start_line == 3  # 1-based line after two \n
    assert chunks[1].start_col == 1


def test_split_by_separator_packing_and_overlap():
    text = "ab cd ef gh"
    chunks = split_by_separator(text, separator=r"\s", chunk_size=5, chunk_overlap=0)
    assert [c.text for c in chunks] == ["ab cd", "ef gh"]
    over = split_by_separator(text, separator=r"\s", chunk_size=8, chunk_overlap=3)
    # overlap makes chunk 2 start inside chunk 1
    assert over[0].end_char > over[1].start_char or len(over) == 1


def test_split_recursive_hierarchy():
    text = ("para one sentence a. sentence b.\n\n" + "x" * 600 + "\n\nshort tail")
    chunks = split_recursive(text, chunk_size=100)
    # every chunk respects the size cap
    assert all(len(c.text) <= 100 for c in chunks)
    # the 600-char run was hard-cut, surroundings kept whole
    assert chunks[0].text.startswith("para one")
    assert any(c.text == "x" * 100 for c in chunks)
    assert chunks[-1].text.endswith("short tail")
    # spans are faithful to the original text
    for c in chunks:
        assert text[c.start_char : c.end_char] == c.text


def test_split_recursive_min_chunk_merge():
    text = "a. b. c. d. e. f."
    merged = split_recursive(text, chunk_size=10, min_chunk_size=6)
    assert all(len(c.text) >= 5 for c in merged[:-1])


def test_explode_chunks_spark(spark):
    df = spark.createDataFrame(
        [("d1", "one two three four five six seven eight")], "id STRING, body STRING"
    )
    out = explode_chunks(df, "body", mode="separator", separator=r"\s", chunk_size=10)
    rows = out.orderBy("chunk_idx").collect()
    assert rows[0]["chunk_idx"] == 0
    assert all(len(r["chunk_text"]) <= 10 for r in rows)
    # reconstructable coverage: chunks span the whole body
    assert rows[0]["start_char"] == 0
    assert rows[-1]["end_char"] == len("one two three four five six seven eight")
    assert out.columns[:2] == ["id", "body"]
