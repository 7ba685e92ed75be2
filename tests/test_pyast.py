"""AST-exact Python chunking/definitions (operators/pyast.py) — the
cases the regex/token paths get wrong: keywords inside strings and
comments, decorators, nesting depth, non-parsing fallback.

Reference semantics: rust/ops_text/src/split/recursive.rs (tree-sitter
recursive chunking), rust/code_ast/src/view/lang.rs (region views).
"""

from __future__ import annotations

from cocoindex_spark.operators.code_match import definitions
from cocoindex_spark.operators.pyast import py_boundaries, py_definitions
from cocoindex_spark.operators.split import split_recursive

TRICKY = '''def real():
    s = """
def fake_in_string():
    pass
"""
    # def fake_in_comment(): pass
    return s


def second():
    return 2
'''


def test_definitions_ignore_strings_and_comments():
    defs = py_definitions(TRICKY)
    assert [d["name"] for d in defs] == ["real", "second"]
    # the public definitions() entrypoint routes python through the AST
    assert [d["name"] for d in definitions(TRICKY, "python")] == ["real", "second"]


def test_split_never_cuts_inside_string():
    chunks = split_recursive(TRICKY, chunk_size=110, language="python")
    # exactly one boundary: the start of `def second` — never the fake def
    assert len(chunks) == 2
    assert chunks[0].text.startswith("def real")
    assert "fake_in_string" in chunks[0].text  # string body stays intact
    assert chunks[1].text.startswith("def second")
    # the AST boundary level never offers the fake def as a split point
    # (below line granularity the generic line fallback may start a
    # chunk anywhere, so the guarantee is about the boundary set)
    levels = py_boundaries(TRICKY)
    assert [TRICKY[b : b + 10] for lvl in levels for b in lvl] == ["def second"]


def test_decorator_stays_with_definition():
    src = "x = 1\n\n\n@wraps(f)\n@other\ndef g():\n    return x\n" + "pad = 2\n" * 6
    defs = py_definitions(src)
    g = next(d for d in defs if d["name"] == "g")
    assert src[g["start"]:].startswith("@wraps")  # span starts at first decorator
    chunks = split_recursive(src, chunk_size=30, language="python")
    deco_chunk = next(c for c in chunks if "def g" in c.text)
    assert "@wraps(f)" in deco_chunk.text  # never split between decorator and def


def test_nested_depths_and_guarded_defs():
    src = (
        "class C:\n"
        "    def m1(self):\n"
        "        def inner():\n"
        "            pass\n"
        "        return inner\n"
        "\n"
        "if True:\n"
        "    def guarded():\n"
        "        pass\n"
    )
    defs = {d["name"]: d["depth"] for d in py_definitions(src)}
    assert defs == {"C": 0, "m1": 1, "inner": 2, "guarded": 0}
    levels = py_boundaries(src)
    # depth-0 boundaries: `if True:` block's guarded def line start only
    # (class C starts at offset 0 — never a boundary)
    assert len(levels) == 3


def test_syntax_error_falls_back_to_regex():
    bad = "def broken(:\n    pass\n\ndef alsofine():\n    pass\n"
    assert py_definitions(bad) is None
    # split still works via the regex hierarchy
    chunks = split_recursive(bad, chunk_size=20, language="python")
    assert chunks and "".join(c.text for c in chunks).replace("", "")
    # definitions() degrades to the token matcher (finds both defs)
    names = [d["name"] for d in definitions(bad, "python")]
    assert "alsofine" in names
