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


# --- C / C++ lexer-exactness ------------------------------------------

C_SRC = '''#define MK(x) struct FakeMacro##x { int v; } \\
    extra(y) {
struct Point { int x; };
static int add(int a, int b) {
    const char *s = "struct FakeStr { int z; };";
    /* union FakeCmt; */
    return a + b;
}
typedef struct { int q; } handle_t;
typedef int (*cb)(void);
'''


def test_c_preprocessor_is_one_token():
    from cocoindex_spark.operators.code_match import tokenize

    toks = tokenize(C_SRC, "c")
    # the directive (including its continuation line) is a single token
    assert toks[0].text.startswith("#define")
    assert "extra(y) {" in toks[0].text
    # nothing from the macro body leaks into the stream
    assert all("FakeMacro" not in t.text for t in toks[1:])


def test_c_definitions():
    defs = brace_definitions(C_SRC, "c")
    assert [(d["kind"], d["name"]) for d in defs] == [
        ("struct", "Point"),
        ("function", "add"),
        ("type", "handle_t"),
        ("type", "cb"),  # function-pointer typedef: name inside parens
    ]
    # the unbalanced `{` inside the #define did not corrupt depth
    assert all(d["depth"] == 0 for d in defs)


def test_c_control_flow_not_functions():
    src = "int main(void) {\n  if (x) { }\n  for (;;) { }\n  while (x) { }\n}\n"
    assert [(d["kind"], d["name"]) for d in brace_definitions(src, "c")] == [
        ("function", "main")
    ]


def test_cpp_ctor_initializer_and_labels():
    src = (
        "class Foo {\n  public:\n    Foo() : x_(1), y_(2) {\n    }\n"
        "    int get() const noexcept {\n        return x_;\n    }\n};\n"
    )
    defs = brace_definitions(src, "cpp")
    assert [(d["kind"], d["name"], d["depth"]) for d in defs] == [
        ("class", "Foo", 0),
        ("function", "Foo", 1),  # ctor found through the initializer list
        ("function", "get", 1),
    ]


def test_cpp_raw_string_hides_fakes():
    from cocoindex_spark.operators.code_match import tokenize

    src = 'const char* r = R"ab(struct NotReal { };)ab";\nnamespace ns {\n}\n'
    toks = tokenize(src, "cpp")
    assert any(t.text.startswith('R"ab(') for t in toks)
    assert all("NotReal" not in t.text or t.text.startswith('R"') for t in toks)
    assert [(d["kind"], d["name"]) for d in brace_definitions(src, "cpp")] == [
        ("namespace", "ns")
    ]


def test_java_methods_from_header_pass():
    src = (
        "public class Svc {\n"
        '    String s = "void fake() {}";\n'
        "    public int size() {\n        return 1;\n    }\n"
        "}\n"
    )
    defs = brace_definitions(src, "java")
    assert [(d["kind"], d["name"]) for d in defs] == [
        ("class", "Svc"),
        ("function", "size"),
    ]


@pytest.mark.parametrize(
    "language,source,expected",
    [
        (
            "scala",
            'object Main {\n  def run(x: Int): Int = {\n'
            '    val s = "def fake() {}"\n    x\n  }\n}\ntrait T {}\n',
            [("object", "Main"), ("function", "run"), ("trait", "T")],
        ),
        (
            "swift",
            "struct Pt {\n    func mag() -> Int {\n"
            "        return x  // func fake() {}\n    }\n}\nprotocol P {}\n",
            [("struct", "Pt"), ("function", "mag"), ("protocol", "P")],
        ),
        (
            "php",
            '<?php\nclass A {\n    public function go() {\n'
            '        $s = "function fake() {}";\n    }\n}\ninterface I {}\n',
            [("class", "A"), ("function", "go"), ("interface", "I")],
        ),
        (
            "dart",
            "class Widget {\n  int n = 0;\n}\nmixin M {}\n",
            [("class", "Widget"), ("mixin", "M")],
        ),
    ],
)
def test_more_languages_lexer_exact(language, source, expected):
    assert supports_definitions(language)
    defs = brace_definitions(source, language)
    assert [(d["kind"], d["name"]) for d in defs] == expected
    assert not any("fake" in d["name"].lower() for d in defs)


def test_php_heredoc_hides_fakes():
    from cocoindex_spark.operators.code_match import tokenize

    src = (
        "<?php\n$s = <<<EOT\nfunction fake() {}\nclass FakeHd {}\nEOT;\n"
        "function real() {\n}\n"
    )
    toks = tokenize(src, "php")
    assert any(t.text.startswith("<<<EOT") for t in toks)
    defs = brace_definitions(src, "php")
    assert [(d["kind"], d["name"]) for d in defs] == [("function", "real")]


# --- keyword-block languages: Ruby and Lua (def…end / function…end) -----
# Blocks close with `end`, so depth comes from a stack of opener
# keywords instead of a brace counter; heredocs, %-literals, =begin
# blocks, and Lua long brackets lex as single tokens
# (code_match._scan_special_string), so a `def`/`function` inside them
# can never define a region or shift the depth.

RUBY = '''module Outer
  class Greeter
    DOC = <<~EOT
      def fake_heredoc
      end
    EOT
    WORDS = %w[def end class]

    def initialize(name)
      @name = name
      return if name.nil?
      x = 1 if name
    end

    private def hidden
      [1, 2].each do |i|
        puts i while false
      end
    end

    def self.version = "1.0"

    def name=(v)
      @name = v
    end
  end
end

=begin
def fake_block_comment
=end

s = "def fake_str"
# def fake_line

def top_level(a)
  begin
    a
  rescue
    nil
  end
end
'''

LUA = '''--[[ function fake_longcomment() end ]]
local s = [[ function fake_longstring() end ]]
-- function fake_line() end

local function helper(x)
  if x > 1 then
    return x
  elseif x < 0 then
    return -x
  else
    return 0
  end
end

function M.process(items)
  for i = 1, #items do
    while items[i] > 0 do
      items[i] = items[i] - 1
    end
  end
  local cb = function(a) return a end
  repeat
    x = 1
  until true
  return items
end

function M:method(y)
  return y
end
'''


def test_ruby_definitions_lexer_exact():
    defs = brace_definitions(RUBY, "ruby")
    byname = {d["name"]: d for d in defs}
    assert set(byname) == {
        "Outer", "Greeter", "initialize", "hidden",
        "self.version", "name=", "top_level",
    }
    # no fake from heredoc / %w / =begin / string / comment
    assert not any("fake" in n for n in byname)
    # depth: module 0 → class 1 → methods 2; top_level back at 0 proves
    # the modifier if/while guards never desynced the block stack
    assert byname["Outer"]["depth"] == 0
    assert byname["Greeter"]["depth"] == 1
    assert byname["initialize"]["depth"] == 2
    assert byname["top_level"]["depth"] == 0
    # spans: full region to the matching `end`
    assert RUBY[byname["Greeter"]["start"]:byname["Greeter"]["end"]].startswith(
        "class Greeter"
    )
    assert RUBY[byname["Greeter"]["start"]:byname["Greeter"]["end"]].endswith("end")
    # `private def` starts at the modifier
    assert RUBY[byname["hidden"]["start"]:byname["hidden"]["end"]].startswith(
        "private def hidden"
    )
    # endless def: region is its own line, no `end` consumed
    assert RUBY[
        byname["self.version"]["start"]:byname["self.version"]["end"]
    ] == 'def self.version = "1.0"'


def test_ruby_expression_position_blocks_balance():
    src = (
        "x = if flag\n  1\nelse\n  2\nend\n\n"
        "y = case n\nwhen 1 then 'a'\nelse 'b'\nend\n\n"
        "def after\n  1\nend\n"
    )
    defs = brace_definitions(src, "ruby")
    assert [(d["name"], d["depth"]) for d in defs] == [("after", 0)]
    assert src[defs[0]["start"]:defs[0]["end"]] == "def after\n  1\nend"


def test_lua_definitions_lexer_exact():
    defs = brace_definitions(LUA, "lua")
    names = [d["name"] for d in defs]
    assert names == ["helper", "M.process", "M:method"]
    assert all(d["depth"] == 0 for d in defs)
    # nested if/elseif/for/while/repeat and the anonymous callback all
    # balanced: every span ends exactly at its own `end`
    for d in defs:
        assert LUA[d["start"]:d["end"]].endswith("end")
    assert LUA[defs[0]["start"]:defs[0]["end"]].startswith("local function helper")


@pytest.mark.parametrize(
    "language,source",
    [
        ("ruby", "x = <<~SQL\n  def fake\nSQL\ndef real\nend\n"),
        ("ruby", "w = %w[def fake]\ndef real\nend\n"),
        ("ruby", "=begin\ndef fake\n=end\ndef real\nend\n"),
        ("lua", "s = [==[ function fake() ]==]\nfunction real()\nend\n"),
        ("lua", "--[[ function fake()\n]]\nfunction real()\nend\n"),
    ],
)
def test_keyword_block_string_forms_never_define(language, source):
    defs = brace_definitions(source, language)
    assert [d["name"] for d in defs] == ["real"]


def test_keyword_block_split_boundary():
    from cocoindex_spark.operators.split import split_recursive

    rb = 'def a\n  x = "def fake"\n  1\nend\n\ndef b\n  2\nend\n'
    chunks = split_recursive(rb, chunk_size=20, language="ruby")
    # the boundary between a and b comes from the token stream; the
    # fake `def` inside the string is never a split point
    starts = [c.text.split("\n")[0] for c in chunks]
    assert "def b" in starts
    assert not any(c.text.startswith('"def fake') for c in chunks)


def test_definitions_dispatches_for_keyword_block_langs():
    assert supports_definitions("ruby") and supports_definitions("lua")
    rb = 'def real\nend\n'
    assert [d["name"] for d in definitions(rb, "ruby")] == ["real"]


JULIA = """module Api
DOC = \"\"\"
function fake_triple
\"\"\"
# function fake_line
#= function fake_block #= nested =# =#
function get(x)
    s = "function fake_str"
    y = x[end]
    t = [i for i in 1:x]
    if x > 1
        s = `function fake_cmd`
    end
    return s
end
mutable struct Point
    x::Int
end
abstract type Shape end
end
short(x) = x + 1
"""


def test_julia_definitions_lexer_exact():
    defs = brace_definitions(JULIA, "julia")
    by = {d["name"]: d for d in defs}
    assert set(by) == {"Api", "get", "Point", "Shape", "short"}
    assert by["Api"]["kind"] == "module" and by["Api"]["depth"] == 0
    assert by["get"]["kind"] == "function" and by["get"]["depth"] == 1
    assert by["Point"]["kind"] == "struct"
    assert JULIA[by["Point"]["start"]:by["Point"]["end"]].startswith(
        "mutable struct Point"
    )
    assert by["Shape"]["kind"] == "type"
    # `x[end]` indexing and the bracket comprehension `for` must not
    # desync the block stack: get's region closes at ITS `end`
    assert JULIA[by["get"]["start"]:by["get"]["end"]].endswith("return s\nend")
    # short-form def spans exactly its line
    assert JULIA[by["short"]["start"]:by["short"]["end"]] == "short(x) = x + 1"


@pytest.mark.parametrize(
    "source",
    [
        's = """\nfunction fake\n"""\nfunction real(x)\nend\n',
        "#= function fake =#\nfunction real(x)\nend\n",
        "#= outer #= function fake =# still =#\nfunction real(x)\nend\n",
        "c = `function fake`\nfunction real(x)\nend\n",
        "# function fake\nfunction real(x)\nend\n",
    ],
)
def test_julia_string_forms_never_define(source):
    defs = brace_definitions(source, "julia")
    assert [d["name"] for d in defs] == ["real"]


R_SRC = """# fake <- function(x) in a comment
s <- "fake <- function(y) in a string"
helper <- function(a, b = c(1, 2)) {
  inner <- function(z) {
    z + 1
  }
  inner(a) + b
}
g = function(z) z * 2
h <<- function() NULL
x < - 3
"""


def test_r_definitions_assignment_forms():
    defs = brace_definitions(R_SRC, "r")
    by = {d["name"]: d for d in defs}
    # comment/string fakes never define; `x < - 3` (spaced) is a
    # comparison, not an arrow
    assert set(by) == {"helper", "inner", "g", "h"}
    assert by["helper"]["depth"] == 0 and by["inner"]["depth"] == 1
    assert R_SRC[by["helper"]["start"]:by["helper"]["end"]].endswith(
        "inner(a) + b\n}"
    )
    # single-expression bodies span exactly their line
    assert R_SRC[by["g"]["start"]:by["g"]["end"]] == "g = function(z) z * 2"
    assert R_SRC[by["h"]["start"]:by["h"]["end"]] == "h <<- function() NULL"


SQL_SRC = """-- create table fake_line (x int);
CREATE TABLE users (
  id BIGINT,
  note VARCHAR DEFAULT 'create view fake_str'
);
/* create index fake_block; */
CREATE OR REPLACE VIEW api.v1 AS SELECT * FROM users;
CREATE FUNCTION f() RETURNS BIGINT AS $body$
  SELECT 1; -- create sequence fake_inside
$body$ LANGUAGE sql;
create unique index if not exists idx_users on users (id);
"""


def test_sql_create_statement_regions():
    defs = brace_definitions(SQL_SRC, "sql")
    by = {d["name"]: d for d in defs}
    assert set(by) == {"users", "api.v1", "f", "idx_users"}
    assert by["users"]["kind"] == "table"
    assert by["api.v1"]["kind"] == "view"
    assert by["idx_users"]["kind"] == "index"  # case-insensitive + skips
    # the `;` inside the dollar-quoted body must not cut the region
    assert SQL_SRC[by["f"]["start"]:by["f"]["end"]].endswith("LANGUAGE sql;")
    # every region ends at its own terminator
    assert SQL_SRC[by["users"]["start"]:by["users"]["end"]].endswith(");")


MD_SRC = """# Title
intro
```python
# fake heading in fence
x = 1
```
## Sub A
body a
## Sub B
body b
# Next
tail
"""


def test_markdown_sections_fence_aware():
    defs = brace_definitions(MD_SRC, "markdown")
    by = {d["name"]: d for d in defs}
    assert set(by) == {"Title", "Sub A", "Sub B", "Next"}
    # the fenced `# fake heading` neither defines nor ends Title early:
    # Title runs through both subsections
    assert MD_SRC[by["Title"]["start"]:by["Title"]["end"]].endswith("body b")
    assert by["Sub A"]["kind"] == "h2" and by["Sub A"]["depth"] == 1
    assert MD_SRC[by["Next"]["start"]:by["Next"]["end"]] == "# Next\ntail"


HTML_SRC = """<html>
<head>
<script type="text/javascript">
  var s = "</div><div id='fake'>";
</script>
</head>
<body>
<!-- <div id="fake2"> -->
<div id="main">
  <section id="a"><p>hi</p></section>
  <img src="x>y.png">
</div>
</body>
</html>
"""


def test_html_element_regions_opaque_spans():
    defs = brace_definitions(HTML_SRC, "html")
    by = {d["name"]: d for d in defs}
    # the </div> inside the script and the commented <div> never desync
    assert "div#fake" not in by and "div#fake2" not in by
    assert set(by) == {"html", "head", "script", "body", "div#main"}
    assert HTML_SRC[by["div#main"]["start"]:by["div#main"]["end"]].endswith("</div>")
    # the `>` inside img's quoted attribute doesn't truncate the tag;
    # void elements never push (body closes cleanly)
    assert HTML_SRC[by["body"]["start"]:by["body"]["end"]].endswith("</body>")
    assert by["script"]["kind"] == "script" and by["script"]["depth"] == 2


def test_toml_table_sections_multiline_string_opaque():
    toml = (
        'title = "x"\n[server]\nhost = "a"\ndoc = """\n[fake]\n"""\n'
        "[[jobs]]\nname = \"j1\"\n[db.primary]\nurl = \"u\"\n"
    )
    defs = brace_definitions(toml, "toml")
    assert [(d["kind"], d["name"]) for d in defs] == [
        ("table", "server"),
        ("array_table", "jobs"),
        ("table", "db.primary"),
    ]
    server = defs[0]
    assert toml[server["start"]:server["end"]].endswith('"""')  # spans the fake


def test_yaml_key_sections_block_scalar_opaque():
    yml = (
        "top: 1\nscript: |\n  fake: inside block\n  more: lines\n"
        "jobs:\n  build:\n    steps: 3\n# comment: no\nlast: x\n"
    )
    defs = brace_definitions(yml, "yaml")
    assert [d["name"] for d in defs] == ["top", "script", "jobs", "last"]
    script = defs[1]
    assert yml[script["start"]:script["end"]].endswith("more: lines")


CSS_SRC = """/* .fake { } */
@import url("x.css");
.btn, .btn:hover {
  content: "} .fake2 {";
  color: red;
}
@media (max-width: 600px) {
  .nav { display: none; }
}
"""


def test_css_rule_regions_opaque_spans():
    defs = brace_definitions(CSS_SRC, "css")
    names = [(d["kind"], d["name"]) for d in defs]
    # the commented rule never opens; the braces inside the string
    # value never open/close; @import (no block) emits nothing
    assert names == [
        ("rule", ".btn, .btn:hover"),
        ("media", "@media (max-width: 600px)"),
        ("rule", ".nav"),
    ]
    btn = defs[0]
    assert CSS_SRC[btn["start"]:btn["end"]].endswith("color: red;\n}")
    assert defs[2]["depth"] == 1


FORTRAN_SRC = """! subroutine fake_comment
module geo
contains
  pure function area(r) result(a)
    character(len=20) :: s = "subroutine fake_str"
    a = r * r
  end function area
  subroutine grow(x)
    x = x + 1
  end subroutine grow
end module geo
program main
end program main
"""


def test_fortran_program_unit_regions():
    defs = brace_definitions(FORTRAN_SRC, "fortran")
    by = {d["name"]: d for d in defs}
    # comment/string fakes never open; `end function area` pops ONE
    assert set(by) == {"geo", "area", "grow", "main"}
    assert by["geo"]["kind"] == "module" and by["geo"]["depth"] == 0
    assert by["area"]["kind"] == "function" and by["area"]["depth"] == 1
    assert FORTRAN_SRC[by["grow"]["start"]:by["grow"]["end"]].endswith(
        "end subroutine grow"
    )
    assert by["main"]["kind"] == "program"


def test_json_top_level_key_regions():
    j = '{\n  "name": "x}y",\n  "deps": {"a": 1, "fake": "}"},\n  "arr": [1, 2]\n}\n'
    defs = brace_definitions(j, "json")
    assert [d["name"] for d in defs] == ["name", "deps", "arr"]
    by = {d["name"]: d for d in defs}
    # braces inside strings never move the scanner; nested keys are
    # not top-level regions
    assert j[by["deps"]["start"]:by["deps"]["end"]] == '"deps": {"a": 1, "fake": "}"}'
    assert "fake" not in {d["name"] for d in defs}


def test_solidity_definitions_lexer_exact():
    src = (
        "// contract Fake1 {}\n"
        "contract Token {\n"
        '    string s = "contract Fake2 {";\n'
        "    function transfer(address to) public { }\n"
        "    event Sent(address from);\n"
        "}\n"
    )
    defs = brace_definitions(src, "solidity")
    by = {d["name"]: d for d in defs}
    assert set(by) == {"Token", "transfer", "Sent"}
    assert by["Token"]["kind"] == "contract"
    assert by["Sent"]["kind"] == "event"  # bodyless: ends at its `;`
    assert src[by["Sent"]["start"]:by["Sent"]["end"]].endswith(");")


PASCAL_SRC = """{ procedure Fake1; }
(* procedure Fake2; *)
procedure Outer(x: Integer);
  function Inner(y: Integer): Integer;
  begin
    Inner := y + 1;
  end;
var s: string;
begin
  s := 'procedure Fake3;';
  case x of
    1: s := 'a';
  end;
end;
procedure Fwd(z: Integer); forward;
procedure Last;
begin
end;
"""


def test_pascal_routine_regions():
    defs = brace_definitions(PASCAL_SRC, "pascal")
    by = {d["name"]: d for d in defs}
    # comment/string fakes never open; forward declarations don't emit;
    # the case…end inside Outer's body balances
    assert set(by) == {"Outer", "Inner", "Last"}
    assert by["Inner"]["kind"] == "function" and by["Inner"]["depth"] == 1
    assert PASCAL_SRC[by["Outer"]["start"]:by["Outer"]["end"]].endswith("end")
    assert by["Outer"]["end"] > by["Inner"]["end"]


def test_walker_boundaries_drive_chunking():
    """split_recursive consumes the region walkers for markup/config
    languages: section-level splits come only from REAL structure."""
    from cocoindex_spark.operators.split import split_recursive

    md = (
        "# A\nintro text here\n```\n# fake heading\ncode code\n```\n"
        "more body here\n# B\ntail words\n"
    )
    # generous chunk_size: only section-level boundaries fire — the
    # fenced fake heading must NOT start a chunk
    chunks = split_recursive(md, chunk_size=60, language="markdown")
    starts = [c.text.split("\n")[0] for c in chunks]
    assert "# B" in starts
    assert not any(s.startswith("# fake") for s in starts)

    h = (
        '<body>\n<script>var s = "</div>";</script>\n'
        '<div id="a">\n<p>one two three</p>\n</div>\n'
        '<div id="b">\n<p>four</p>\n</div>\n</body>\n'
    )
    hchunks = split_recursive(h, chunk_size=60, language="html")
    hstarts = [c.text.split("\n")[0] for c in hchunks]
    assert any(s.startswith('<div id="b"') for s in hstarts)


def test_scala_expression_body_defs_end_at_expression():
    """A braceless Scala `def f = expr` region ends at the expression,
    not at EOF (reference: tree-sitter scala ends function_definition
    at the body expression; line-granular fallback is the reference's
    own granularity). This closes the r4 'known limit'."""
    src = (
        "object A {\n"
        "  def double(x: Int): Int = x * 2\n"
        "  def g(x: Int = 3) =\n"
        "    x * 3\n"
        "  def chain = xs\n"
        "    .map(_ + 1)\n"
        "    .sum\n"
        "  def cond(x: Int) =\n"
        "    if (x > 0) x\n"
        "    else -x\n"
        "  def matcher(x: Int) = x match {\n"
        "    case 0 => 1\n"
        "    case _ => 2\n"
        "  }\n"
        "}\n"
    )
    by = {d["name"]: d for d in brace_definitions(src, "scala")}
    assert src[by["double"]["start"]:by["double"]["end"]] == (
        "def double(x: Int): Int = x * 2"
    )
    # `=` inside the default-arg parens must not start the body
    assert src[by["g"]["start"]:by["g"]["end"]] == "def g(x: Int = 3) =\n    x * 3"
    # leading-dot chains and else-branches continue the expression
    assert src[by["chain"]["start"]:by["chain"]["end"]].endswith(".sum")
    assert src[by["cond"]["start"]:by["cond"]["end"]].endswith("else -x")
    # a match block after `=` brace-matches to its `}`
    assert src[by["matcher"]["start"]:by["matcher"]["end"]].endswith("}")
    # no region may run past its successor's start
    ordered = sorted(by.values(), key=lambda d: d["start"])
    for a, b in zip(ordered, ordered[1:]):
        if a["depth"] == b["depth"]:
            assert a["end"] <= b["start"], (a["name"], b["name"])


def test_scala_bodyless_headers_and_case_class():
    src = (
        "trait T\n"
        "class C(x: Int)\n"
        "case class D(y: Int) extends T\n"
        "object End\n"
    )
    defs = brace_definitions(src, "scala")
    spans = {d["name"]: src[d["start"]:d["end"]] for d in defs}
    assert spans["T"] == "trait T"
    assert spans["C"] == "class C(x: Int)"
    assert spans["D"] == "case class D(y: Int) extends T"
    assert spans["End"] == "object End"


def test_kotlin_expression_body_funs():
    src = (
        "fun top(): Int = 1 + 2\n"
        "fun multi(x: Int) =\n"
        "    x * 2\n"
        "class Box {\n"
        "    fun inner() = 7\n"
        "}\n"
    )
    by = {d["name"]: d for d in brace_definitions(src, "kotlin")}
    assert src[by["top"]["start"]:by["top"]["end"]] == "fun top(): Int = 1 + 2"
    assert src[by["multi"]["start"]:by["multi"]["end"]] == (
        "fun multi(x: Int) =\n    x * 2"
    )
    assert src[by["inner"]["start"]:by["inner"]["end"]] == "fun inner() = 7"
    assert by["Box"]["end"] == src.rindex("}") + 1
