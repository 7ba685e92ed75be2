"""Element views: kind classification (Field / Constant / Constructor /
Extension / Property / Method), namespace attribution, and usage
References — parametrized per language, mirroring the reference's
per-language configs (rust/code_ast/src/elements/lang/rust.rs,
java.rs, csharp.rs, kotlin.rs; kinds types.rs:25-45; namespace +
Reference types.rs:119-142)."""

from __future__ import annotations

import pytest

from cocoindex_spark.operators.code_elements import element_views, references

RUST = """
pub const MAX: usize = 10;
mod geo {
    pub struct Point { pub x: f64, y: f64 }
    impl Point {
        const ORIGIN_X: f64 = 0.0;
        pub fn new(x: f64, y: f64) -> Point { Point { x, y } }
        fn norm(&self) -> f64 { (self.x * self.x).sqrt() }
    }
}
fn free() -> u64 { helper(1) + 2 }
// const FAKE: u32 = 1;
static GREETING: &str = "const NOPE: u8 = 0;";
"""

JAVA = """
package com.ex.app;
public class Account {
    private long balance;
    public static final int MAX_RETRIES = 3;
    public Account(long b) { balance = b; }
    public long getBalance() { return balance; }
}
interface Limits { int CAP = 100; }
// class Fake { int x; }
"""

CSHARP = """
namespace Ex.App;
public class Cart {
    private int count;
    public const string Tag = "const Fake = 1;";
    public int Count { get; set; }
    public Cart(int c) { count = c; }
    public int Total() { return count; }
}
public static class Exts {
    public static int Doubled(this int x) { return x + x; }
}
"""

KOTLIN = """
class Wallet(val owner: String) {
    var cents: Long = 0
    constructor(o: String, c: Long) : this(o) { cents = c }
    fun add(n: Long) { cents += n }
}
fun Long.asEuros(): String = "E" + this
const val LIMIT = 99
val greeting = "hi"
// val fake = 1
"""

# (language, source, expected {(kind, name, namespace)})
CASES = [
    (
        "rust",
        RUST,
        {
            ("constant", "MAX", ""),
            ("module", "geo", ""),
            ("struct", "Point", "geo"),
            ("field", "x", "geo.Point"),
            ("field", "y", "geo.Point"),
            ("impl", "Point", "geo"),
            ("constant", "ORIGIN_X", "geo.Point"),
            ("method", "new", "geo.Point"),
            ("method", "norm", "geo.Point"),
            ("function", "free", ""),
            ("constant", "GREETING", ""),
        },
    ),
    (
        "java",
        JAVA,
        {
            ("class", "Account", "com.ex.app"),
            ("field", "balance", "com.ex.app.Account"),
            ("constant", "MAX_RETRIES", "com.ex.app.Account"),
            ("constructor", "Account", "com.ex.app.Account"),
            ("method", "getBalance", "com.ex.app.Account"),
            ("interface", "Limits", "com.ex.app"),
            ("constant", "CAP", "com.ex.app.Limits"),  # interface member
        },
    ),
    (
        "c_sharp",
        CSHARP,
        {
            ("class", "Cart", "Ex.App"),
            ("field", "count", "Ex.App.Cart"),
            ("constant", "Tag", "Ex.App.Cart"),
            ("property", "Count", "Ex.App.Cart"),
            ("constructor", "Cart", "Ex.App.Cart"),
            ("method", "Total", "Ex.App.Cart"),
            ("class", "Exts", "Ex.App"),
            ("extension", "Doubled", "Ex.App.Exts"),
        },
    ),
    (
        "kotlin",
        KOTLIN,
        {
            ("class", "Wallet", ""),
            ("field", "owner", "Wallet"),  # primary-ctor property
            ("field", "cents", "Wallet"),
            ("constructor", "Wallet", "Wallet"),
            ("method", "add", "Wallet"),
            ("extension", "asEuros", ""),
            ("constant", "LIMIT", ""),
            ("field", "greeting", ""),
        },
    ),
]


@pytest.mark.parametrize("language,source,expected", CASES, ids=[c[0] for c in CASES])
def test_element_views_kinds_and_namespaces(language, source, expected):
    got = {(r["kind"], r["name"], r["namespace"]) for r in element_views(source, language)}
    assert got == expected


def test_block_namespace_csharp():
    src = """
namespace Ex.Deep {
    public class Cart {
        private int count;
        public Cart(int c) { count = c; }
        public int Total() { return count; }
    }
}
"""
    got = {(r["kind"], r["name"], r["namespace"]) for r in element_views(src, "c_sharp")}
    assert got == {
        ("class", "Cart", "Ex.Deep"),
        ("field", "count", "Ex.Deep.Cart"),
        ("constructor", "Cart", "Ex.Deep.Cart"),
        ("method", "Total", "Ex.Deep.Cart"),
    }


def test_decoys_in_strings_and_comments_invisible():
    src = 'fn real() -> u64 { 1 }\n// fn fake() {}\nconst S: &str = "fn fake2() {} const F: u8 = 1;";\n'
    got = {(r["kind"], r["name"]) for r in element_views(src, "rust")}
    assert got == {("function", "real"), ("constant", "S")}


def test_references_call_sites():
    refs = references(RUST, "rust")
    by_name = {}
    for r in refs:
        by_name.setdefault(r["name"], []).append(r["namespace"])
    # sqrt called inside impl Point (namespace geo.Point); helper at top
    assert by_name["sqrt"] == ["geo.Point"]
    assert by_name["helper"] == [""]
    # definition header names are never references
    assert "new" not in by_name and "norm" not in by_name and "free" not in by_name


def test_references_exclude_decoys():
    src = 'fn a() -> u64 { go(1) }\n// call fake()\nconst S: &str = "decoy()";\n'
    assert [r["name"] for r in references(src, "rust")] == ["go"]


GO = """
package geo

type Point struct {
    X, Y float64
    name string
}

func (p *Point) Norm() float64 { return p.X }

func Free(a int) int { return a + 1 }

const MaxIter = 10
const (
    A = 1
    B = 2
)
var debug = false
// var fake = 1
"""

CPP = """
namespace geo {
class Point {
public:
    Point(double x) : x_(x) {}
    double norm() const { return x_; }
    static constexpr int kMax = 3;
private:
    double x_;
};
double free_fn(int a) { return a + 1.0; }
}
"""


def test_go_elements():
    got = {(r["kind"], r["name"], r["namespace"]) for r in element_views(GO, "go")}
    assert got == {
        ("type", "Point", "geo"),
        ("field", "X", "geo.Point"),
        ("field", "Y", "geo.Point"),
        ("field", "name", "geo.Point"),
        ("method", "Norm", "geo.Point"),  # receiver method → owner type
        ("function", "Free", "geo"),
        ("constant", "MaxIter", "geo"),
        ("constant", "A", "geo"),
        ("constant", "B", "geo"),
        ("variable", "debug", "geo"),  # package-level var
    }


def test_cpp_elements():
    got = {(r["kind"], r["name"], r["namespace"]) for r in element_views(CPP, "cpp")}
    assert got == {
        ("namespace", "geo", ""),
        ("class", "Point", "geo"),
        ("constructor", "Point", "geo.Point"),
        ("method", "norm", "geo.Point"),
        ("constant", "kMax", "geo.Point"),
        ("field", "x_", "geo.Point"),
        # namespaces scope names but do not own methods
        ("function", "free_fn", "geo"),
    }


JS = """
const MAX_ITEMS = 10;
let counter = 0;
class Cart {
    items = [];
    static TAG = "cart";
    constructor(owner) { this.owner = owner; }
    total() { return this.items.length; }
    get size() { return this.items.length; }
}
function free(a) { return a + 1; }
// const fake = 1;
const s = "let decoy = 2;";
"""

TS = """
export const LIMIT = 5;
interface Point { x: number; y: number; }
class Store {
    private count: number = 0;
    readonly name: string;
    constructor(n: string) { this.name = n; }
    increment(by: number): void { this.count += by; }
}
"""


def test_javascript_elements():
    got = {(r["kind"], r["name"], r["namespace"]) for r in element_views(JS, "javascript")}
    assert got == {
        ("constant", "MAX_ITEMS", ""),
        ("variable", "counter", ""),
        ("class", "Cart", ""),
        ("field", "items", "Cart"),
        ("field", "TAG", "Cart"),
        ("constructor", "Cart", "Cart"),
        ("method", "total", "Cart"),
        ("method", "size", "Cart"),  # accessor
        ("function", "free", ""),
        ("constant", "s", ""),
    }


def test_typescript_elements():
    got = {(r["kind"], r["name"], r["namespace"]) for r in element_views(TS, "typescript")}
    assert got == {
        ("constant", "LIMIT", ""),
        ("interface", "Point", ""),
        ("field", "x", "Point"),
        ("field", "y", "Point"),
        ("class", "Store", ""),
        ("field", "count", "Store"),
        ("field", "name", "Store"),
        ("constructor", "Store", "Store"),
        ("method", "increment", "Store"),
    }


def test_references_qualifier_chain():
    src = (
        "mod srv { pub fn api() -> u64 { 1 } }\n"
        "fn use_it() -> u64 { srv::api() + helper() + deep::mod2::f(1) }\n"
    )
    refs = {r["name"]: r["qualifier"] for r in references(src, "rust")}
    assert refs == {"api": "srv", "helper": "", "f": "deep.mod2"}


# --- single-pass extraction (code_views): elements + references from
#     ONE lex + ONE definition walk (reference elements/mod.rs extracts
#     both views in a single parse-tree walk)


SINGLE_PASS_SAMPLES = [
    ("rust", (
        "mod srv0 { pub fn api1() -> u64 { 1 } }\n"
        "fn main2() -> u64 { srv0::api1() + local() }\n"
        '// srv9::api9()\nstatic S: &str = "srv8::api8()";\n'
    )),
    ("java", (
        "package com.ex;\npublic class K {\n"
        "    private long v;\n    public static final int MAX = 1;\n"
        "    public K(long v) { helper(v); }\n"
        "    public long get() { return util.calc(v); }\n}\n"
    )),
    ("go", (
        "package main\n\ntype P struct { X, Y float64 }\n"
        "func (p *P) Norm() float64 { return math.Sqrt(dot(p, p)) }\n"
        "func dot(a, b *P) float64 { return a.X*b.X }\n"
    )),
    ("typescript", (
        "const LIMIT = 10\nclass Store {\n  count = 0\n"
        "  increment(): void { this.count += util.step() }\n}\n"
    )),
]


@pytest.mark.parametrize("language,src", SINGLE_PASS_SAMPLES)
def test_code_views_parity(language, src):
    """code_views == element_views ∪ references, row for row."""
    from cocoindex_spark.operators.code_elements import code_views

    cv = code_views(src, language)
    els = [r for r in cv if r["row_kind"] == "element"]
    refs = [r for r in cv if r["row_kind"] == "reference"]
    want_els = element_views(src, language)
    want_refs = references(src, language)
    assert [
        {k: r[k] for k in ("kind", "name", "namespace", "start", "end")}
        for r in els
    ] == want_els
    assert [
        {k: r[k] for k in ("name", "qualifier", "namespace", "start")}
        for r in refs
    ] == want_refs
    # reference rows carry the union-schema placeholders
    assert all(r["qualifier"] == "" for r in els)
    assert all(r["kind"] == "" and r["end"] == r["start"] for r in refs)


def test_code_views_single_lex(monkeypatch):
    """THE perf contract: code_views lexes the full document exactly
    once (element_views + references separately lex it twice). The
    probe counts tokenize calls that receive the full text, across
    both modules that can lex (code_elements._prep and
    code_boundaries.brace_definitions)."""
    from cocoindex_spark.operators import code_boundaries as cb
    from cocoindex_spark.operators import code_elements as ce
    from cocoindex_spark.operators.code_match import tokenize as real_tokenize

    src = SINGLE_PASS_SAMPLES[0][1]
    calls = {"full": 0}

    def counting(text, language="text"):
        if text == src:
            calls["full"] += 1
        return real_tokenize(text, language)

    monkeypatch.setattr(ce, "tokenize", counting)
    monkeypatch.setattr(cb, "tokenize", counting)

    ce.code_views(src, "rust")
    assert calls["full"] == 1, f"single pass must lex once, got {calls['full']}"

    calls["full"] = 0
    ce.element_views(src, "rust")
    ce.references(src, "rust")
    assert calls["full"] == 2  # the two-pass shape code_views replaces


# --- Python element views (reference elements/lang/python.rs: class /
#     function declarations, method promotion directly inside a class
#     body, call + typed-parameter references, builtin-type exclusion)


PY = '''import os

class Outer:
    """class Fake: pass"""

    class Inner:
        def m(self) -> DataRow:
            return helper.calc(self)

    def run(self, x: int, row: custom.Row = None):
        if True:
            def guarded():
                pass
        return srv.api(x) + free(x)

def free(x: Optional[Config]):
    # def fake2(): pass
    return Outer()
'''


def test_python_elements():
    got = {(r["kind"], r["name"], r["namespace"]) for r in element_views(PY, "python")}
    assert got == {
        ("class", "Outer", ""),
        ("class", "Inner", "Outer"),
        ("method", "m", "Outer.Inner"),
        ("method", "run", "Outer"),
        # if-wrapped def is NOT a direct class member (tree-sitter
        # sees block>if>block>function) but keeps the namespace
        ("function", "guarded", "Outer"),
        ("function", "free", ""),
    }


def test_python_references():
    refs = {(r["name"], r["qualifier"], r["namespace"]) for r in references(PY, "python")}
    assert refs == {
        ("calc", "helper", "Outer.Inner"),
        ("api", "srv", "Outer"),
        ("free", "", "Outer"),
        ("Outer", "", ""),
        # typed parameters are references (python.rs typed_parameter /
        # typed_default_parameter); subscripts strip to the BASE type
        # (`Optional[Config]` → Optional); `x: int` is excluded
        # (builtin); return annotations are NOT reference nodes
        ("Row", "custom", "Outer"),
        ("Optional", "", ""),
    }


def test_python_unparsable_source_degrades():
    assert element_views("def broken(:", "python") == []
    assert references("def broken(:", "python") == []


# --- Swift element views (reference elements/lang/swift.rs:
#     class/struct/enum/extension via declaration_kind, protocol →
#     interface-like, property declarations → Property, method
#     promotion inside type scopes)


SWIFT = '''import Foundation

let MAX = 10

struct Point {
    var x: Double
    let y: Double
    func norm() -> Double { let t = x * x; return t }
}

protocol Shape {
    func area() -> Double
    var name: String { get }
}

extension Point {
    func dbl() -> Double { return 2 * x }
}

func free(p: Point) -> Double {
    if let q = maybe() { return q }
    return p.norm() + helper()
}
// var fake = 1
let s = "let fake2 = 1"
'''


def test_swift_elements():
    got = {(r["kind"], r["name"], r["namespace"]) for r in element_views(SWIFT, "swift")}
    assert got == {
        ("property", "MAX", ""),
        ("struct", "Point", ""),
        ("property", "x", "Point"),
        ("property", "y", "Point"),
        ("method", "norm", "Point"),
        ("protocol", "Shape", ""),
        ("method", "area", "Shape"),
        ("property", "name", "Shape"),
        # extension members attribute to the extended type
        ("extension", "Point", ""),
        ("method", "dbl", "Point"),
        ("function", "free", ""),
        ("property", "s", ""),
        # NOT here: `let t` (function-body local), `let q` (conditional
        # binding), the decoys in comment/string
    }


def test_swift_references():
    refs = {(r["name"], r["qualifier"]) for r in references(SWIFT, "swift")}
    assert refs == {("maybe", ""), ("norm", "p"), ("helper", "")}
