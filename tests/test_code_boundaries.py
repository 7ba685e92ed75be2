"""Token-stream chunk boundaries for brace languages
(operators/code_boundaries.py): construct keywords inside strings or
comments are never split points, headers with modifiers anchor at
their line start, and unsupported languages fall back to regex."""

from __future__ import annotations

from cocoindex_spark.operators.code_boundaries import brace_boundaries, supports
from cocoindex_spark.operators.split import split_recursive

GO = '''package main

// func fake_in_comment() {}
var s = "func fake_in_string() {}"

func real() int {
\treturn 1
}

type T struct {
\tx int
}
'''


def test_go_boundaries_skip_strings_and_comments():
    levels = brace_boundaries(GO, "go")
    starts = [GO[b:].split("\n")[0] for b in levels[0]]
    assert 'var s = "func fake_in_string() {}"' in starts
    assert "func real() int {" in starts
    assert "type T struct {" in starts
    # the comment and the string body contributed nothing
    assert not any("fake_in_comment" in s for s in starts)
    # split never begins a chunk at the fake definitions
    for c in split_recursive(GO, chunk_size=60, language="go"):
        assert not c.text.startswith("func fake")


def test_java_methods_found_at_depth_1():
    java = (
        "public class Foo {\n"
        "    // class fake {}\n"
        '    String s = "class fake2 {}";\n'
        "\n"
        "    public int m1() {\n"
        "        return 1;\n"
        "    }\n"
        "\n"
        "    private void m2() {}\n"
        "}\n"
    )
    levels = brace_boundaries(java, "java")
    assert len(levels) == 2
    members = [java[b:].split("\n")[0].strip() for b in levels[1]]
    assert "public int m1() {" in members and "private void m2() {}" in members
    assert not any("fake" in m for m in members)


def test_c_keywordless_functions_detected():
    c = (
        "#include <stdio.h>\n\n"
        "struct point { int x; };\n\n"
        "int add(int a, int b) {\n"
        "    return a + b; /* struct fake */\n"
        "}\n\n"
        "static int sub(int a, int b) {\n"
        "    return a - b;\n"
        "}\n"
    )
    levels = brace_boundaries(c, "c")
    tops = [c[b:].split("\n")[0] for b in levels[0]]
    assert "struct point { int x; };" in tops
    assert "int add(int a, int b) {" in tops
    assert "static int sub(int a, int b) {" in tops  # modifier-anchored
    assert len(tops) == 3  # the commented struct contributed nothing


def test_unsupported_language_falls_back():
    assert not supports("haskell")
    assert brace_boundaries("f :: Int -> Int\nf x = x", "haskell") is None
    # prose in a supported language: no constructs → regex fallback
    assert brace_boundaries("no constructs here at all", "go") is None
    # split still works end to end either way
    assert split_recursive("a\n\nb\n\nc", chunk_size=2, language="haskell")


def test_rust_keywords_not_in_string():
    rs = 'static S: &str = "fn fake() {}";\n\npub fn real() -> i32 {\n    1\n}\n'
    levels = brace_boundaries(rs, "rust")
    tops = [rs[b:].split("\n")[0] for b in levels[0]]
    assert tops == ["pub fn real() -> i32 {"]
