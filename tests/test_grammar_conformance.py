"""Grammar-conformance sweep for the language walkers (SURVEY §2.10
RecursiveSplitter + definition views; r5 verdict item #6): seeded
property-style program generation per language family — nesting,
multi-line strings containing keywords, comments containing braces and
fake definitions, unicode identifiers — with three invariants asserted
on every generated program:

1. **Lexer exactness**: boundary offsets produced by the token/AST
   walkers never fall strictly inside a string or comment span (the
   generator KNOWS where it placed them), and every boundary is a line
   start — the contract that makes the walkers safe replacements for
   the reference's tree-sitter levels (recursive.rs:591-650).
2. **Definition fidelity**: the found definition names are EXACTLY the
   real ones (fake definitions inside strings/comments are invisible),
   and every region's span covers its name with sane offsets.
3. **Splitter totality**: split_recursive at several chunk sizes is a
   monotone cover of the source modulo separators — chunk text == text
   slice, spans strictly advance, and the only characters between
   consecutive chunks are separator whitespace (the reference's
   splitter likewise consumes the separator run between pieces).
"""

from __future__ import annotations

import random

import pytest

from cocoindex_spark.operators.code_boundaries import brace_boundaries
from cocoindex_spark.operators.code_match import definitions
from cocoindex_spark.operators.split import split_recursive

# Per-language generator spec. Fields:
#   def_tpl   — template for ONE real definition (walker-recognized
#               kind); {N} = the name, {BODY} = nested statements
#   line      — line-comment prefix
#   block     — (open, close) multi-line comment pair, or None
#   mstr      — (stmt_prefix, open, close, stmt_suffix) multi-line
#               string statement, or None
#   fake      — a fake-definition line to hide inside comments/strings
#               (lexically unbalanced on purpose)
SPECS = {
    "c": dict(def_tpl="struct {N} {{ int x; {BODY} }};", line="//",
              block=("/*", "*/"), mstr=None, fake="struct fake{K} {{"),
    "cpp": dict(def_tpl="struct {N} {{ int x; {BODY} }};", line="//",
                block=("/*", "*/"), mstr=None, fake="struct fake{K} {{"),
    "java": dict(def_tpl="class {N} {{ int x; {BODY} }}", line="//",
                 block=("/*", "*/"), mstr=None, fake="class fake{K} {{"),
    "c_sharp": dict(def_tpl="class {N} {{ int x; {BODY} }}", line="//",
                    block=("/*", "*/"), mstr=None, fake="class fake{K} {{"),
    "javascript": dict(str='"', def_tpl="function {N}() {{ let a = 1; {BODY} }}",
                       line="//", block=("/*", "*/"),
                       mstr=("const s = ", "`", "`", ";"),
                       fake="function fake{K}() {{"),
    "typescript": dict(str='"', def_tpl="function {N}() {{ let a = 1; {BODY} }}",
                       line="//", block=("/*", "*/"),
                       mstr=("const s = ", "`", "`", ";"),
                       fake="function fake{K}() {{"),
    "tsx": dict(str='"', def_tpl="function {N}() {{ let a = 1; {BODY} }}",
                line="//", block=("/*", "*/"),
                mstr=("const s = ", "`", "`", ";"),
                fake="function fake{K}() {{"),
    "go": dict(def_tpl="func {N}() {{ a := 1; {BODY} }}", line="//",
               block=("/*", "*/"), mstr=("s := ", "`", "`", ""),
               fake="func fake{K}() {{"),
    "rust": dict(str='"', def_tpl="fn {N}() {{ let a = 1; {BODY} }}", line="//",
                 block=("/*", "*/"),
                 mstr=("let s = ", 'r#"', '"#', ";"),
                 fake="fn fake{K}() {{"),
    "kotlin": dict(str='"', def_tpl="fun {N}() {{ val a = 1; {BODY} }}", line="//",
                   block=("/*", "*/"),
                   mstr=("val s = ", '"""', '"""', ""),
                   fake="fun fake{K}() {{"),
    "scala": dict(str='"', def_tpl="def {N}(): Unit = {{ val a = 1; {BODY} }}",
                  line="//", block=("/*", "*/"),
                  mstr=("val s = ", '"""', '"""', ""),
                  fake="def fake{K}() {{"),
    "swift": dict(str='"', def_tpl="func {N}() {{ let a = 1; {BODY} }}", line="//",
                  block=("/*", "*/"),
                  mstr=("let s = ", '"""', '"""', ""),
                  fake="func fake{K}() {{"),
    "dart": dict(def_tpl="class {N} {{ int x = 1; {BODY} }}", line="//",
                 block=("/*", "*/"), mstr=None, fake="class fake{K} {{"),
    "php": dict(def_tpl="function {N}() {{ $a = 1; {BODY} }}", line="//",
                block=("/*", "*/"), mstr=None,
                fake="function fake{K}() {{"),
    "solidity": dict(def_tpl="function {N}() public {{ uint a = 1; {BODY} }}",
                     line="//", block=("/*", "*/"), mstr=None,
                     fake="function fake{K}() {{"),
    # keyword-block family (def … end)
    "ruby": dict(def_tpl="def {N}\n  a = 1\n  {BODY}\nend", line="#",
                 block=("=begin", "=end"), mstr=None,
                 fake="def fake{K}"),
    "lua": dict(str='"', def_tpl="function {N}()\n  local a = 1\n  {BODY}\nend",
                line="--", block=("--[[", "]]"),
                mstr=("s = ", "[[", "]]", ""),
                fake="function fake{K}()"),
    "julia": dict(str='"', def_tpl="function {N}()\n  a = 1\n  {BODY}\nend",
                  line="#", block=("#=", "=#"),
                  mstr=("s = ", '"""', '"""', ""),
                  fake="function fake{K}()"),
    # python: stdlib-ast walker
    "python": dict(def_tpl="def {N}():\n    a = 1\n    {BODY}\n    return a",
                   line="#", block=None,
                   mstr=("s = ", '"""', '"""', ""),
                   fake="def fake{K}():"),
}

# Definitions for some languages report kinds only for a subset of the
# templates above; these languages get boundary+split checks but the
# name-exactness check is skipped (their definition views are pinned
# elsewhere: q110-q132 oracles).
NO_DEF_CHECK = {"php"}  # php def view needs <?php context in some paths

UNICODE_NAMES = ["café_ü1", "処理_x", "déjà"]


def _gen(lang: str, spec: dict, seed: int):
    """Build one program; returns (text, protected_spans, real_names)."""
    rng = random.Random(f"{lang}-{seed}")
    out: list[str] = []
    pos = [0]
    protected: list[tuple[int, int]] = []

    def emit(txt: str, prot: bool = False) -> None:
        if prot:
            protected.append((pos[0], pos[0] + len(txt)))
        out.append(txt)
        pos[0] += len(txt)

    names: list[str] = []
    k = [0]

    def filler() -> None:
        choice = rng.randrange(6)
        k[0] += 1
        fake = spec["fake"].format(K=k[0])
        if choice == 0 and spec["block"]:
            bo, bc = spec["block"]
            emit(bo)
            emit(f"\n{fake}\n}} end extra {{\n", prot=True)
            emit(bc + "\n")
        elif choice == 1 and spec["mstr"]:
            pre, so, sc, suf = spec["mstr"]
            emit(pre + so)
            emit(f"\n{fake}\n}} end {{ more\n", prot=True)
            emit(sc + suf + "\n")
        elif choice == 2 and spec["block"]:
            # a lone string QUOTE inside a comment must not open a
            # string that swallows the following real definitions
            bo, bc = spec["block"]
            emit(bo)
            emit(' unterminated " quote \n', prot=True)
            emit(bc + "\n")
        elif choice == 3:
            # a comment OPENER inside a single-line string must not
            # start a comment that swallows the rest of the file
            q = spec.get("str", '"')
            opener = (spec["block"][0] if spec["block"] else spec["line"])
            emit(f"x = {q}", prot=False)
            emit(f"{opener} {fake} {{", prot=True)
            emit(f"{q}\n")
        elif choice == 4 and spec.get("esc", True):
            # escaped quote inside a string: the string does NOT end
            # at the escaped quote; the fake def inside stays hidden
            q = spec.get("str", '"')
            emit(f"y = {q}a\\{q} {fake} {{ {q}\n", prot=False)
        else:
            emit(spec["line"])
            emit(f" {fake} }} end {{", prot=True)
            emit("\n")

    n_defs = rng.randint(2, 4)
    for i in range(n_defs):
        if rng.random() < 0.5:
            filler()
        if rng.random() < 0.4:
            name = UNICODE_NAMES[rng.randrange(len(UNICODE_NAMES))] + str(i)
        else:
            name = f"real_{lang.replace('_', '')}_{i}"
        names.append(name)
        body = "b = 2" if "\n" in spec["def_tpl"] else "int b;"
        if lang in ("javascript", "typescript", "tsx", "go", "rust",
                    "kotlin", "scala", "swift", "php", "solidity"):
            body = "a = a + 1;"
        if lang == "python":
            body = "b = 2"
        emit(spec["def_tpl"].format(N=name, BODY=body) + "\n")
    if rng.random() < 0.7:
        filler()
    return "".join(out), protected, names


def _flat_boundaries(text: str, lang: str) -> list[int]:
    if lang == "python":
        from cocoindex_spark.operators.pyast import py_boundaries

        levels = py_boundaries(text)
    else:
        levels = brace_boundaries(text, lang)
    if not levels:
        return []
    return sorted({b for lvl in levels for b in lvl})


@pytest.mark.parametrize("lang", sorted(SPECS))
@pytest.mark.parametrize("seed", range(4))
def test_walker_conformance(lang: str, seed: int):
    spec = SPECS[lang]
    text, protected, names = _gen(lang, spec, seed)

    # 1. lexer exactness: walker boundaries are line starts and never
    #    inside a string/comment span
    for b in _flat_boundaries(text, lang):
        assert 0 <= b <= len(text)
        assert b == 0 or text[b - 1] == "\n", (
            f"{lang} seed {seed}: boundary {b} is not a line start"
        )
        for lo, hi in protected:
            assert not (lo < b < hi), (
                f"{lang} seed {seed}: boundary {b} inside protected "
                f"span ({lo},{hi}): {text[lo:hi]!r}"
            )

    # 2. definition fidelity: exactly the real names, spans sane and
    #    covering their headers; endpoints outside protected spans
    if lang not in NO_DEF_CHECK:
        defs = definitions(text, lang)
        found = {d["name"] for d in defs}
        assert found == set(names), (
            f"{lang} seed {seed}: found {sorted(found)} != "
            f"expected {sorted(names)}\n---\n{text}"
        )
        for d in defs:
            assert 0 <= d["start"] < d["end"] <= len(text)
            assert d["name"] in text[d["start"] : d["end"]]
            for lo, hi in protected:
                assert not (lo < d["start"] < hi)
                assert not (lo < d["end"] < hi)

    # 3. splitter totality at several chunk sizes: monotone cover,
    #    whitespace-only gaps (separators are consumed, nothing else)
    for cs in (48, 160):
        chunks = split_recursive(text, chunk_size=cs, language=lang)
        assert chunks, f"{lang} seed {seed}: no chunks at size {cs}"
        prev_end = 0
        prev_start = -1
        for c in chunks:
            assert text[c.start_char : c.end_char] == c.text
            assert c.start_char > prev_start
            gap = text[prev_end : c.start_char]
            assert gap.strip() == "", (
                f"{lang} seed {seed}: non-separator gap {gap!r}"
            )
            prev_start = c.start_char
            prev_end = max(prev_end, c.end_char)
        assert text[prev_end:].strip() == ""
