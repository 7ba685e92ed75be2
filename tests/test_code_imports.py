"""Import/include element views (reference: the base_namespace import
slice of the AST element views, rust/code_ast/src/elements/lang/
go.rs:24) — per-language extraction is comment/string-exact and
line-scoped where the grammar is."""

from __future__ import annotations

from cocoindex_spark.operators.code_imports import imports_of


def _mods(text, lang):
    return [(d["module"], d["kind"]) for d in imports_of(text, lang)]


def test_python_imports():
    code = (
        "import os, sys as s\n"
        "from a.b import c, d\n"
        "import mod0\n"
        "from pkg0 import thing\n"
        'x = "import fake"\n'
        "# import fake2\n"
        "import json\n"
    )
    assert _mods(code, "python") == [
        ("os", "import"),
        ("sys", "import"),
        ("a.b", "from"),
        ("mod0", "import"),
        ("pkg0", "from"),
        ("json", "import"),
    ]


def test_python_import_is_line_scoped():
    # a statement on the next line is a NEW statement, and a non-line-
    # leading `import` (an expression identifier) is not one at all
    assert _mods("import a\nimport b\n", "python") == [
        ("a", "import"),
        ("b", "import"),
    ]
    assert _mods("x = importlib\n", "python") == []


def test_javascript_imports():
    code = (
        'import React from "react";\n'
        'import "./style.css";\n'
        'const fs = require("fs");\n'
        'export { x } from "./util";\n'
        '// import fake from "nope"\n'
        "let s = 'import f2 from \"nah\"';\n"
        "const tpl = `import t from \"tpl\"`;\n"
    )
    assert _mods(code, "javascript") == [
        ("react", "import"),
        ("./style.css", "import"),
        ("fs", "require"),
        ("./util", "import"),
    ]


def test_java_imports():
    code = (
        "import java.util.List;\n"
        "import static org.junit.Assert.*;\n"
        "// import fake.Thing;\n"
        'class A { String s = "import x.Y;"; }\n'
    )
    assert _mods(code, "java") == [
        ("java.util.List", "import"),
        ("org.junit.Assert.*", "import"),
    ]


def test_go_imports():
    code = (
        'import "fmt"\n'
        'import (\n  "os"\n  alias "net/http"\n)\n'
        '// import "fake"\n'
        's := `import "raw"`\n'
    )
    assert _mods(code, "go") == [
        ("fmt", "import"),
        ("os", "import"),
        ("net/http", "import"),
    ]


def test_rust_uses():
    code = (
        "use std::collections::{HashMap, HashSet};\n"
        "use serde::Serialize as Ser;\n"
        "// use fake::a;\n"
        'let s = "use fake2::b;";\n'
    )
    assert _mods(code, "rust") == [
        ("std::collections", "use"),
        ("serde::Serialize", "use"),
    ]


def test_c_includes():
    code = (
        "#include <stdio.h>\n"
        '#include "local.h"\n'
        "// #include <fake.h>\n"
        'char* s = "#include <str.h>";\n'
        "int main() { return 0; }\n"
    )
    assert _mods(code, "c") == [("stdio.h", "include"), ("local.h", "include")]


def test_unsupported_language_empty():
    assert imports_of("import x", "fortran") == []
