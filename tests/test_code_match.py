"""Structural pattern matcher tests — the metavar surface of the
reference's CodePattern (ops/code.py docstring examples; lexer.rs
metavar table semantics: runs are same-level, repeated names enforce
equality, regexes anchor to the whole captured node)."""

from __future__ import annotations

import pytest

from cocoindex_spark.operators.code_match import (
    StructuralPattern,
    tokenize,
)


def test_tokenize_basics():
    toks = [t.text for t in tokenize('def f(a, b="x y"): # comment\n  return a', "python")]
    assert toks == ["def", "f", "(", "a", ",", "b", "=", '"x y"', ")", ":", "return", "a"]
    # c-family comments
    toks = [t.text for t in tokenize("a /* mid */ -> b // tail\nc", "rust")]
    assert toks == ["a", "->", "b", "c"]


def test_single_metavar_and_run():
    p = StructuralPattern(r"def \NAME(\(A*\)): return \R", "python")
    src = "x = 1\ndef foo(a, b=2): return a\nclass C: pass\ndef bar(): return 7\n"
    ms = p.match(src)
    assert [(m.captures["NAME"], m.captures["A"], m.captures["R"]) for m in ms] == [
        ("foo", "a, b=2", "a"),
        ("bar", "", "7"),
    ]
    # match text is the exact source span
    assert ms[0].text == "def foo(a, b=2): return a"
    assert src[ms[0].start : ms[0].end] == ms[0].text


def test_prefilter():
    p = StructuralPattern(r"def \NAME(\(A*\)): return \R", "python")
    assert p.literals == ["def", "return"]
    assert not p.might_match("x = 1")
    assert p.might_match("def f(): return 1")


def test_node_snap_balanced_group():
    """A single metavar binds one token OR one balanced group — the
    matcher's node-boundary snap (matcher.rs)."""
    p = StructuralPattern(r"f(\X)", "python")
    ms = p.match("f((a + b)) ; f(c)")
    assert [m.captures["X"] for m in ms] == ["(a + b)", "c"]


def test_repeated_name_equality():
    p = StructuralPattern(r"\X = \X + 1", "python")
    ms = p.match("a = a + 1\nb = c + 1\n")
    assert [m.captures for m in ms] == [{"X": "a"}]


def test_one_or_more_vs_many():
    many = StructuralPattern(r"g(\(A*\))", "python")
    plus = StructuralPattern(r"g(\(A+\))", "python")
    assert len(many.match("g()")) == 1
    assert len(plus.match("g()")) == 0
    assert plus.match("g(x)")[0].captures["A"] == "x"


def test_regex_constrained_and_anonymous():
    p = StructuralPattern(r"\(F:/get_.*/\)(\(_*\))", "python")
    ms = p.match("get_x(1); set_y(2); get_z(a,b)")
    assert [m.captures["F"] for m in ms] == ["get_x", "get_z"]
    # anonymous `\_` run captured nothing
    assert all("_" not in m.captures for m in ms)


def test_run_stays_same_level():
    """A run never crosses an unmatched closing delimiter."""
    p = StructuralPattern(r"[\(A*\)]", "python")
    ms = p.match("[1, 2, f(3, 4)] + [5]")
    assert [m.captures["A"] for m in ms] == ["1, 2, f(3, 4)", "5"]


def test_literal_sigil():
    p = StructuralPattern(r"\\\NAME", "text")
    ms = p.match(r"use \alpha and \beta")
    assert [m.captures["NAME"] for m in ms] == ["alpha", "beta"]


def test_bad_pattern_raises():
    with pytest.raises(ValueError, match="bad metavariable"):
        StructuralPattern(r"def \(unclosed", "python")
    # unparseable embedded regex is the same clean client error, not a
    # raw re.error (fuzz-found)
    with pytest.raises(ValueError, match="bad metavariable regex"):
        StructuralPattern(r"\/)/", "python")
    with pytest.raises(ValueError, match="bad metavariable regex"):
        StructuralPattern(r"\/+/", "python")


def test_code_source_parse_once():
    """CodeSource lexes once and is shared across patterns (the
    reference's parse-at-most-once contract)."""
    from cocoindex_spark.operators.code_match import CodeSource

    src = CodeSource("def f(): return g(1)", "python")
    t1 = src.tokens
    t2 = src.tokens
    assert t1 is t2  # cached, not re-lexed

    p1 = StructuralPattern(r"def \NAME(\(A*\)):", "python")
    p2 = StructuralPattern(r"g(\X)", "python")
    assert p1.match_source(src)[0].captures["NAME"] == "f"
    assert p2.match_source(src)[0].captures["X"] == "1"
    # same results as the plain-string path
    assert [m.text for m in p2.match_source(src)] == [m.text for m in p2.match(src.text)]


def test_lang_by_ext_covers_reference_table():
    """Every language in the reference's extension table resolves, and
    the names match the splitter's language keys."""
    from cocoindex_spark.operators.code_ops import LANG_BY_EXT
    from cocoindex_spark.operators.split import LANGUAGE_SEPARATORS, resolve_language

    for ext, lang in LANG_BY_EXT.items():
        assert resolve_language(lang) in LANGUAGE_SEPARATORS, (ext, lang)
    # spot-check reference rows (docs ops/text.mdx extension column)
    assert LANG_BY_EXT["cs"] == "c_sharp"
    assert LANG_BY_EXT["f90"] == "fortran"
    assert LANG_BY_EXT["tsx"] == "tsx"
    assert LANG_BY_EXT["vue"] == "vue"
    assert LANG_BY_EXT["sol"] == "solidity"


def test_definitions_view():
    """Region classification analog: named definitions with spans,
    sorted by position; unknown languages yield nothing."""
    from cocoindex_spark.operators.code_match import CodeSource, definitions

    src = "def alpha(x):\n    return x\n\nclass Beta:\n    def meth(self): pass\n"
    defs = definitions(src, "python")
    assert [(d["kind"], d["name"]) for d in defs] == [
        ("function", "alpha"),
        ("class", "Beta"),
        ("function", "meth"),
    ]
    assert all(0 <= d["start"] < d["end"] <= len(src) for d in defs)

    rust = "pub fn go(a: i32) {}\nstruct S;\nimpl S { fn m(&self) {} }"
    kinds = {(d["kind"], d["name"]) for d in definitions(rust, "rust")}
    assert ("function", "go") in kinds and ("struct", "S") in kinds

    # CodeSource reuse path + unknown language
    assert definitions(CodeSource(src, "python"), "python")
    assert definitions("anything", "no-such-lang") == []


def test_match_code_df_spark(spark):
    from pyspark.sql import functions as F

    from cocoindex_spark.operators.code_match import match_code_df

    df = spark.createDataFrame(
        [(0, "def a(): return 1"), (1, "no code here"), (2, "def b(x): return x")],
        "id LONG, code STRING",
    )
    out = match_code_df(df, "code", r"def \NAME(\(A*\)): return \R", "python")
    rows = {r["id"]: r["captures"] for r in out.collect()}
    assert set(rows) == {0, 2}
    assert rows[2]["NAME"] == "b" and rows[2]["A"] == "x" and rows[2]["R"] == "x"


# --- language-specific string forms (the generic regex can't see
#     them): contents must never leak into the token stream ---------

import pytest as _pytest

_SPECIAL_STRING_CASES = [
    ("go", "var s = `func fake() {}`\nfunc real() int { return 1 }\n"),
    (
        "javascript",
        "const t = `class Fake { ${ {a: `${nested}`} } }`;\nclass Real {}\n",
    ),
    ("rust", 'let s = r#"fn fake() { "quoted" }"#;\nfn real() {}\n'),
    ("rust", 'let s = br##"fn fake()"# still"##;\nfn real() {}\n'),
    ("java", 'String s = """\nclass Fake {}\n""";\nclass Real {}\n'),
    ("c_sharp", 'var s = @"class Fake "" still string";\nclass Real {}\n'),
    ("kotlin", 'val s = """fun fake() {}"""\nfun real() {}\n'),
]


@_pytest.mark.parametrize("lang,src", _SPECIAL_STRING_CASES)
def test_special_strings_do_not_leak(lang, src):
    toks = [t.text for t in tokenize(src, lang)]
    assert "Fake" not in toks and "fake" not in toks, toks
    assert "Real" in toks or "real" in toks


def test_template_interpolation_brace_balance():
    # a `}` inside ${…} must not desync brace depth: the class after
    # the template is still at depth 0
    from cocoindex_spark.operators.code_boundaries import brace_definitions

    src = (
        "function a() {\n"
        "  const s = `x ${ {k: '}'} } y`;\n"
        "  return 1;\n"
        "}\n"
        "class Real {}\n"
    )
    defs = brace_definitions(src, "javascript")
    assert [(d["kind"], d["name"], d["depth"]) for d in defs] == [
        ("function", "a", 0),
        ("class", "Real", 0),
    ]


def test_js_expression_function_not_a_definition():
    from cocoindex_spark.operators.code_boundaries import brace_definitions

    src = "const f = function inner() { return 1; };\nfunction outer() {}\n"
    names = [d["name"] for d in brace_definitions(src, "javascript")]
    assert names == ["outer"]  # `= function` is mid-expression


# --- AST-capture parity for generic-typed languages: `\NAME` and
#     `\(A*\)` metavariables snap whole generic types / scoped paths
#     into one unit on the lexer-exact token stream (reference:
#     rust/code_match/src/matcher.rs node-snap semantics; feature
#     corpus code_match/tests/features.rs) -----------------------------

import pytest as _pytest

from cocoindex_spark.operators.code_match import StructuralPattern


@_pytest.mark.parametrize(
    "language,pattern,source,expected",
    [
        (
            "rust",
            r"fn \NAME(\(ARGS*\)) -> \RET",
            "fn real(x: Vec<Vec<u8>>, n: usize) -> Result<u64, String> { x }",
            {"NAME": "real", "ARGS": "x: Vec<Vec<u8>>, n: usize",
             "RET": "Result<u64, String>"},
        ),
        (
            "rust",
            r"let \N: \T = \V;",
            "let m: std::collections::HashMap<String, Vec<u8>> = build();",
            {"N": "m", "T": "std::collections::HashMap<String, Vec<u8>>",
             "V": "build()"},
        ),
        (
            "java",
            r"Map<\K, \V> \NAME = new HashMap<>();",
            "Map<String, List<Integer>> idx = new HashMap<>();",
            {"K": "String", "V": "List<Integer>", "NAME": "idx"},
        ),
        (
            "kotlin",
            r"fun \F(): \T",
            "fun mk(): Pair<Int, List<String>> = TODO()",
            {"F": "mk", "T": "Pair<Int, List<String>>"},
        ),
    ],
)
def test_generic_type_node_snap(language, pattern, source, expected):
    p = StructuralPattern(pattern, language)
    matches = p.match(source)
    assert len(matches) == 1
    assert matches[0].captures == expected


def test_rust_decoys_in_strings_comments_never_match():
    src = (
        '// fn decoy_line(a: u8) -> u8 { 0 }\n'
        'const S: &str = "fn decoy_str(y: u8) -> u8 { 1 }";\n'
        'const R: &str = r#"fn decoy_raw() -> u8 { 2 }"#;\n'
        "/* fn decoy_block() -> u8 { 3 } */\n"
        "fn real() -> u64 { 7 }\n"
    )
    p = StructuralPattern(r"fn \NAME(\(A*\)) -> \RET", "rust")
    assert [m.captures["NAME"] for m in p.match(src)] == ["real"]


def test_rust_capture_equality_spans_generics():
    p = StructuralPattern(r"fn \F(a: \T, b: \T) -> \T", "rust")
    ok = p.match("fn add(a: Wrapper<i64>, b: Wrapper<i64>) -> Wrapper<i64> {}")
    assert len(ok) == 1 and ok[0].captures["T"] == "Wrapper<i64>"
    # repeated name with a DIFFERENT generic arg must not bind
    assert p.match("fn bad(a: Wrapper<i64>, b: Wrapper<i32>) -> Wrapper<i64> {}") == []


def test_shift_operators_still_match_after_angle_split():
    # `>>`/`<<` lex as two `>` / `<` tokens in generic languages, on
    # BOTH the pattern and source side — shifts still align literally
    assert StructuralPattern(r"\A >> \B", "rust").match("let y = x >> 2;")
    assert StructuralPattern(r"cout << \X", "cpp").match("cout << v;")
    # spaced comparison never groups as a generic
    m = StructuralPattern(r"if (\A < \B)", "java").match("if (a < b) {}")
    assert m and m[0].captures == {"A": "a", "B": "b"}


# --- containment `\{{ ... \}}` (reference: lexer.rs `S{{ INNER S}}`,
#     matcher.rs match_contains; feature corpus
#     code_match/tests/features.rs "containment" block) ----------------


def test_contains_basic_and_any_depth():
    p = StructuralPattern(r"fn \NAME() \{{ return \(X+\); \}}", "rust")
    # the return is nested inside an `if` — the search descends
    src = "fn foo() { let x = 1; if c { return a + b; } }\nfn bar() { let y = 2; }"
    ms = p.match(src)
    assert len(ms) == 1
    assert ms[0].captures == {"NAME": "foo", "X": "a + b"}
    # the whole function span is reported, not just the return
    assert ms[0].text.startswith("fn foo()")


def test_contains_negative_when_absent():
    p = StructuralPattern(r"fn \NAME() \{{ return \(X+\); \}}", "rust")
    assert p.match("fn foo() { let x = 1; }") == []


def test_contains_binding_threads_across_the_group():
    # a name bound BEFORE the group constrains a use INSIDE it
    p = StructuralPattern(r"fn \F(\P: i64) \{{ return \P; \}}", "rust")
    yes = p.match("fn id(a: i64) { return a; }")
    assert yes and yes[0].captures == {"F": "id", "P": "a"}
    assert p.match("fn id(b: i64) { return a; }") == []


def test_contains_nested():
    p = StructuralPattern(
        r"fn \F() \{{ if \C \{{ return \(X+\); \}} \}}", "rust"
    )
    m = p.match("fn foo() { if cond { return a + b; } }")
    assert m and m[0].captures == {"F": "foo", "C": "cond", "X": "a + b"}


def test_contains_python_suite_region():
    # braceless suite: the containment region is the same-level run
    p = StructuralPattern(r"def \F(\(P*\)): \{{ return \(X+\) \}}", "python")
    m = p.match("def foo(a, b):\n    x = 1\n    if c:\n        return a + b\n")
    assert m and m[0].captures == {"F": "foo", "P": "a, b", "X": "a + b"}
    assert p.match("def foo(a):\n    x = 1\n") == []


def test_contains_unbalanced_markers_error():
    import pytest as _pt

    with _pt.raises(ValueError):
        StructuralPattern(r"fn \F() \{{ return \X", "rust")
    with _pt.raises(ValueError):
        StructuralPattern(r"return \X \}}", "rust")


def test_contains_literals_feed_the_prefilter():
    p = StructuralPattern(r"fn \NAME() \{{ unwrap \}}", "rust")
    assert "unwrap" in p.literals
    assert p.might_match("fn a() { x.unwrap() }")
    assert not p.might_match("fn a() { x }")


# --- anonymous long-form regex + configurable sigil (features.rs
#     regex_on_a_run / configurable_dollar_sigil / escaped_sigil) ------


def test_anonymous_long_form_regex_run():
    src = "const x = [1, 2, 3];"
    # separator folded into the regex matches the whole list
    ms = StructuralPattern(r"[\(N:/[0-9]+|,/*\)]", "typescript").match(src)
    assert ms and ms[0].captures["N"] == "1, 2, 3"
    # without the separator the comma ends the run → `]` can't close
    assert StructuralPattern(r"[\(/[0-9]+/*\)]", "typescript").match(src) == []
    # `*` admits the empty list, `+` does not
    empty = "const y = [];"
    assert StructuralPattern(r"[\(/[0-9]+/*\)]", "typescript").match(empty)
    assert StructuralPattern(r"[\(/[0-9]+/+\)]", "typescript").match(empty) == []


def test_configurable_dollar_sigil():
    ms = StructuralPattern(r"foo($(ARGS*$))", "typescript", sigil="$").match(
        "foo(a, b);"
    )
    assert ms and ms[0].captures["ARGS"] == "a, b"
    ms = StructuralPattern(r"foo($A, $B)", "typescript", sigil="$").match(
        "foo(a, b);"
    )
    assert ms and ms[0].captures == {"A": "a", "B": "b"}


def test_escaped_sigil_is_literal():
    # doubled sigil = one literal sigil, sigil-agnostic
    assert StructuralPattern(r"\X = 1", "typescript").match("a = 1;")
    assert StructuralPattern(r"\\X = 1", "typescript").match("a = 1;") == []
    # with `$` as sigil, `$$` is a literal `$` — jQuery-style call
    assert StructuralPattern(r"$$(a)", "typescript", sigil="$").match("$(a);")


# --- non-ASCII / UTF-8 (features.rs cjk_identifier /
#     emoji_in_string_and_as_arg / non_ascii_sigil / never-panics) -----


def test_cjk_identifier_is_one_token():
    ms = StructuralPattern(r"变量 = \V", "python").match("变量 = 1")
    assert ms and ms[0].captures == {"V": "1"}
    ms = StructuralPattern(r"def \N(\(A*\)):", "python").match(
        "def 计数器(x): return x"
    )
    assert ms and ms[0].captures == {"N": "计数器", "A": "x"}


def test_cjk_in_string_literal_atomic():
    ms = StructuralPattern(r"print(\S)", "python").match('print("你好")')
    assert ms and ms[0].captures == {"S": '"你好"'}


def test_emoji_in_string_and_as_arg():
    ms = StructuralPattern(r"f(\(ARGS*\))", "typescript").match('f("😀", 你好)')
    assert ms and ms[0].captures == {"ARGS": '"😀", 你好'}


def test_non_ascii_sigil():
    ms = StructuralPattern("§A = §B", "typescript", sigil="§").match("a = b;")
    assert ms and ms[0].captures == {"A": "a", "B": "b"}


def test_non_ascii_never_crashes():
    for pat in ["😀", "a😀b", "λ + 你好 * \\X", "变量.😀()"]:
        try:
            StructuralPattern(pat, "typescript").match("x;")
        except ValueError:
            pass  # compile may reject; matching must never crash


def test_regex_optional_constrains_only_when_present():
    # features.rs regex_optional_constrains_when_present: an absent
    # optional binds empty WITHOUT a regex test; a present one must
    # still pass it
    p = StructuralPattern(r"f(\(A:/[0-9]+/?\))", "typescript")
    assert p.match("f();") and p.match("f();")[0].captures["A"] == ""
    assert p.match("f(7);")[0].captures["A"] == "7"
    # non-matching present value: the optional skips, the literal takes over
    p2 = StructuralPattern(r"f(\(A:/[0-9]+/?\) x)", "typescript")
    assert p2.match("f(x);") and p2.match("f(x);")[0].captures["A"] == ""
    # mandatory single still enforces the regex
    assert StructuralPattern(r"f(\(A:/[0-9]+/\))", "typescript").match("f(x);") == []


def test_cpp_apostrophe_digit_separator_is_one_number():
    # features.rs cpp_apostrophe_separator_literal /
    # cpp_separated_number_metavar_ok
    from cocoindex_spark.operators.code_match import tokenize

    toks = [t.text for t in tokenize("int v = 1'000'000;", "cpp")]
    assert "1'000'000" in toks
    m = StructuralPattern(r"int v = \N;", "cpp").match("int v = 1'000'000;")
    assert m and m[0].captures["N"] == "1'000'000"
    # a real char literal after a number still lexes apart
    toks2 = [t.text for t in tokenize("char c = 'x'; int n = 1;", "cpp")]
    assert "'x'" in toks2 and "1" in toks2


def test_remaining_reference_feature_block():
    """Consolidated pins for the last features.rs behaviors: multiple
    match sites, no false match, distinct metavars unconstrained,
    string atomicity under unbalanced contents."""
    ms = StructuralPattern(r"f(\N)", "typescript").match("f(1); g(2); f(3);")
    assert [m.captures["N"] for m in ms] == ["1", "3"]
    assert StructuralPattern(r"foo(\A)", "typescript").match("bar(1);") == []
    d = StructuralPattern(r"\A = \B", "typescript").match("a = b;")[0].captures
    assert d == {"A": "a", "B": "b"}
    a = StructuralPattern(r"f(\S, \N)", "typescript").match('f("x)y", 3);')[0].captures
    assert a == {"S": '"x)y"', "N": "3"}


def test_contains_python_suite_bounded_by_dedent():
    """r5 advisor: the braceless containment region must end at the
    DEDENT (the reference's suite node boundary), not bleed into the
    next top-level definition and match its returns under the wrong
    header."""
    p = StructuralPattern(r"def \F(): \{{ return \(X+\) \}}", "python")
    src = "def foo():\n    x = 1\n\ndef bar():\n    return a + b\n"
    ms = p.match(src)
    assert len(ms) == 1
    assert ms[0].captures == {"F": "bar", "X": "a + b"}
    assert ms[0].text.startswith("def bar")
    # multi-statement suites at ONE level still span the whole suite
    p2 = StructuralPattern(r"def \F(): \{{ return \(X+\) \}}", "python")
    src2 = "def foo():\n    x = 1\n    return x + 1\n"
    m2 = p2.match(src2)
    assert m2 and m2[0].captures == {"F": "foo", "X": "x + 1"}
    # nested deeper-indent statements stay inside the region
    src3 = "def foo():\n    if c:\n        return a + b\n\ndef baz():\n    pass\n"
    m3 = p2.match(src3)
    assert m3 and m3[0].captures == {"F": "foo", "X": "a + b"}
    assert m3[0].text.rstrip().endswith("return a + b")


def test_generic_walk_comparison_guards():
    """r5 advisor: unspaced comparisons must not group into one
    pseudo-generic unit when the walk crosses an enclosing `)` or, in
    languages without reference/default-type tokens, `&&`/`=`."""
    from cocoindex_spark.operators.code_match import StructuralPattern as SP

    # java: `&&` can never sit in a type-argument list → \X stays `a`
    p = SP(r"if (\X < \Y && \(Z+\)) { }", "java")
    m = p.match("if (a<b && c>d) { }")
    assert m and m[0].captures["X"] == "a" and m[0].captures["Y"] == "b"
    # java generics still snap as one unit
    p2 = SP(r"\T \N = new \(I+\);", "java")
    m2 = p2.match("Map<String, List<Integer>> m = new HashMap<>();")
    assert m2 and m2[0].captures["T"] == "Map<String, List<Integer>>"
    # enclosing-paren underflow aborts the walk in EVERY language
    p3 = SP(r"assert(\X < \(Y+\));", "rust")
    m3 = p3.match("assert(a<b && c);")
    assert m3 and m3[0].captures["X"] == "a" and m3[0].captures["Y"] == "b && c"
    # rust type args keep `&&` and `=` (double ref, associated binding)
    p4 = SP(r"fn f(v: \(T+\)) { }", "rust")
    m4 = p4.match("fn f(v: Vec<&&str>) { }")
    assert m4 and m4[0].captures["T"] == "Vec<&&str>"
    p5 = SP(r"fn g(it: \(T+\)) { }", "rust")
    m5 = p5.match("fn g(it: Iterator<Item = u32>) { }")
    assert m5 and m5[0].captures["T"] == "Iterator<Item = u32>"


# --- AST-precedence behaviors (reference features.rs:22
#     `precedence_from_ast`, :48 `function_signature_ignores_body`) —
#     pinned as DOCUMENTED DELTAS: a token-stream matcher has no
#     grammar, so it cannot see operator associativity or enclosing
#     node kinds. What it guarantees instead (and these tests freeze):
#     deterministic leftmost-innermost matching, and signature patterns
#     still FINDING their declarations. The delimiter-atomicity half of
#     "precedence" (strings/groups are one node) is full parity and is
#     pinned in test_string_atomic / test_contains_* above. -----------


def test_precedence_from_ast_documented_delta():
    """reference: `\\A = \\B` on `a = b = c;` yields TWO matches (outer
    binds B = `b = c` via right-associativity, inner binds B = `c`).
    Token-level delta: ONE leftmost match with B = the immediate unit
    `b` — associativity needs a grammar, and the scan is
    non-overlapping. Both halves of the delta are deterministic and
    frozen here; a user wanting the full RHS writes the run form
    `\\(B+\\)` explicitly."""
    p = StructuralPattern(r"\A = \B", "typescript")
    ms = p.match("a = b = c;")
    assert len(ms) == 1
    assert ms[0].captures == {"A": "a", "B": "b"}
    # the run form recovers the reference's outer binding on demand
    p2 = StructuralPattern(r"\A = \(B+\);", "typescript")
    m2 = p2.match("a = b = c;")
    assert m2 and m2[0].captures == {"A": "a", "B": "b = c"}


def test_function_signature_ignores_body_documented_delta():
    """reference: the signature pattern `function f()` matches the
    whole function_declaration node (span includes the body). Token
    parity: the declaration IS found — same positive/negative
    behavior — but the reported span is the matched token range (the
    signature), because without a grammar there is no enclosing node
    to widen to. The containment form reproduces the full-span report
    when the body matters."""
    p = StructuralPattern(r"function f()", "typescript")
    ms = p.match("function f() { return 1; }")
    assert len(ms) == 1
    assert ms[0].text == "function f()"
    assert p.match("function g() { return 1; }") == []
    # full-span report via containment, when the caller wants the body
    p2 = StructuralPattern(r"function f() \{{ return \X; \}}", "typescript")
    m2 = p2.match("function f() { return 1; }")
    assert m2 and m2[0].text == "function f() { return 1; }"
