"""Lexer-exact definitions for brace languages
(operators/code_boundaries.py brace_definitions): keywords inside
string literals and comments are never definitions — the q29/q79
guarantee (Python, stdlib ast) extended to the C-family via the
comment/string-stripping token stream.

Reference analog: tree-sitter region classification,
rust/code_ast/src/view/lang.rs."""

from __future__ import annotations

import pytest

from cocoindex_spark.operators.code_boundaries import (
    brace_definitions,
    supports_definitions,
)
from cocoindex_spark.operators.code_match import definitions

RUST = '''pub fn real(x: i64) -> i64 {
    let s = "fn fake_str() {}";
    // fn fake_line() {}
    /* struct FakeBlock; */
    x + 1
}
struct Point;
trait Greet {
    fn hello(&self);
}
'''

JAVA = '''public class Outer {
    String s = "class FakeInString {}";
    // class FakeInComment {}
}
interface Shape {
}
'''

GO = '''func g() int {
\ts := "func fakeStr() {}"
\t// func fakeLine() {}
\treturn 1
}

type T struct {}
'''

KOTLIN = '''fun top(): Int {
    val s = "fun fakeStr() {}"
    // fun fakeLine() {}
    return 1
}
class Box {
}
'''


@pytest.mark.parametrize(
    "language,source,expected",
    [
        (
            "rust",
            RUST,
            [("function", "real"), ("struct", "Point"), ("trait", "Greet"), ("function", "hello")],
        ),
        ("java", JAVA, [("class", "Outer"), ("interface", "Shape")]),
        ("go", GO, [("function", "g"), ("type", "T")]),
        ("kotlin", KOTLIN, [("function", "top"), ("class", "Box")]),
    ],
)
def test_fake_defs_in_strings_and_comments_ignored(language, source, expected):
    assert supports_definitions(language)
    defs = brace_definitions(source, language)
    assert {(d["kind"], d["name"]) for d in defs} == set(expected)
    fake_names = {d["name"] for d in defs} & {
        "fake_str", "fake_line", "FakeBlock", "FakeInString",
        "FakeInComment", "fakeStr", "fakeLine",
    }
    assert fake_names == set()


def test_rust_spans_are_full_regions():
    defs = {d["name"]: d for d in brace_definitions(RUST, "rust")}
    fn = defs["real"]
    assert RUST[fn["start"] : fn["end"]].startswith("pub fn real")
    assert RUST[fn["start"] : fn["end"]].endswith("}")  # matching brace
    st = defs["Point"]
    assert RUST[st["start"] : st["end"]] == "struct Point;"  # bodyless → ';'
    tr = defs["Greet"]
    assert RUST[tr["start"] : tr["end"]].endswith("}")
    hello = defs["hello"]
    assert hello["depth"] == 1  # trait member
    assert RUST[hello["start"] : hello["end"]] == "fn hello(&self);"


def test_modifiers_start_the_region():
    src = "pub static unsafe fn f() { 1 }\n"
    (d,) = brace_definitions(src, "rust")
    assert src[d["start"] :].startswith("pub static unsafe fn f")


def test_mid_expression_keyword_is_not_a_definition():
    # `impl` as a generic bound mid-line must not open a region
    src = "fn takes(x: impl Greet) -> i64 { 1 }\n"
    defs = brace_definitions(src, "rust")
    assert [(d["kind"], d["name"]) for d in defs] == [("function", "takes")]


def test_generic_params_skipped_for_name():
    src = "impl<T> Display for Wrapper<T> {\n    fn fmt(&self) {}\n}\n"
    defs = brace_definitions(src, "rust")
    assert ("impl", "Display") in {(d["kind"], d["name"]) for d in defs}


def test_definitions_dispatches_to_lexer_for_brace_langs():
    out = definitions(RUST, "rust")
    assert {(d["kind"], d["name"]) for d in out} == {
        ("function", "real"), ("struct", "Point"),
        ("trait", "Greet"), ("function", "hello"),
    }
    # regex fallback still serves languages without a kind table
    js = "function f() { return 1 }\n"
    assert [(d["kind"], d["name"]) for d in definitions(js, "javascript")] == [
        ("function", "f")
    ]
