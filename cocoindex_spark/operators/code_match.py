"""Structural code pattern matching with captures.

Reference surface: ``CodePattern`` — by-example patterns with a ``\\``
sigil for metavariables, compiled once and matched against many
sources (python/cocoindex/ops/code.py:115-160; semantics
rust/code_match/src/lexer.rs metavar table and matcher.rs "metavars
snap to node boundaries").

The reference matches a flattened tree-sitter leaf frontier; without
tree-sitter in this container, this module matches a **token stream
with balanced-delimiter grouping** — a single metavariable binds one
token or one balanced ``(...)``/``[...]``/``{...}`` group (the
poor-man's node snap), and sibling runs never cross an unmatched
closing delimiter (the same "same-level contiguous run" restriction
the reference enforces for ``\\(X*\\)``). Supported metavar syntax
(lexer.rs table):

    ``\\NAME``          single, named
    ``\\(NAME\\)``      single, named
    ``\\(NAME*\\)``     zero or more same-level sibling units
    ``\\(NAME+\\)``     one or more
    ``\\(NAME?\\)``     zero or one
    ``\\_  \\*  \\+  \\?``  anonymous forms
    ``\\(NAME:/re/\\)`` regex-constrained (anchored ``^(?:re)$``)
    ``\\(/re/*\\)``     anonymous regex, long form (quantified)
    ``\\/re/``          anonymous regex-constrained single
    ``\\{{ … \\}}``     containment: inner pattern must match anywhere
                        inside one unit here (descendant search)
    ``\\\\``            literal sigil (doubled sigil, sigil-agnostic)

The sigil is configurable per pattern (``sigil="$"``), matching the
reference's ``with_meta_char``. Repeated metavar names enforce capture
equality (matcher.rs bindings threaded forward).

Known token-vs-AST deltas (inherent to the no-tree-sitter analog,
checked against the reference's features.rs this round): (1) a single
metavar binds one token/balanced-unit, so ``=> \\B`` over ``=> x + 1``
binds ``x`` where the reference binds the whole expression node — use
``\\(B+\\)`` for multi-token expressions; (2) ``\\(X*\\)`` runs step
over same-depth TOKENS, so a run may absorb several ``;``-separated
statements where the reference's node-level run steps whole sibling
nodes — a trailing ``\\*`` inside a C++ class body can absorb later
members the reference would reject. Generic-typed languages get a
node-snap upgrade (see ``_generic_end``): whole generic types,
``::`` paths, and touching call groups bind as one unit.

Spark surface: ``match_code_df`` wraps matching in an Arrow-batched
pandas UDF (per-row, embarrassingly parallel, no shuffle) behind the
same cheap ``contains``-prefilter plan as ``code_ops.match_pattern``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd

# Unicode-aware identifier head ([^\W\d] = any word char that isn't a
# digit: ASCII letters, underscore, CJK, accented letters …) so `变量`
# lexes as ONE identifier — the reference's UTF-8-aware tokenizer
# (code_match features.rs cjk_identifier). Number tokens keep their
# ASCII-digit head.
_WORD = re.compile(r"[^\W\d]\w*|\d[\w.]*")
# C/C++ number with C++14 apostrophe digit separators (1'000'000)
_CPP_NUM = re.compile(r"\d(?:[\w.]|'(?=\d))*")
_STRING = re.compile(r"\"(?:[^\"\\\n]|\\.)*\"|'(?:[^'\\\n]|\\.)*'")
# longest-match first for multi-char operators
_OPS = [
    "<<=", ">>=", "===", "!==", "...", "->", "=>", "::", "==", "!=", "<=",
    ">=", "&&", "||", "+=", "-=", "*=", "/=", "**", "//", "<<", ">>", "??",
]
_OPENERS = {"(": ")", "[": "]", "{": "}"}
_CLOSERS = {v: k for k, v in _OPENERS.items()}

# Comment syntax by language family (skipped during tokenization).
_LINE_COMMENT = {
    "python": "#", "ruby": "#", "bash": "#", "yaml": "#", "toml": "#",
    "elixir": "#", "perl": "#", "r": "#", "julia": "#",
    "sql": "--", "haskell": "--", "elm": "--", "lua": "--",
}
_C_FAMILY = {
    "c", "cpp", "c_sharp", "java", "javascript", "typescript", "tsx", "go",
    "rust", "kotlin", "scala", "swift", "php", "dart", "solidity", "css",
}

# Language-specific string forms the generic single-line regex cannot
# see. Each would otherwise leak its CONTENTS into the token stream —
# a `func` inside a Go backtick raw string, a `class` inside a JS
# template literal, a `"fn"` inside a Rust r#"…"# — exactly the fake
# keywords and stray braces the lexer exists to drop (tree-sitter
# reference: rust/code_ast scans these as single string nodes).
_TEMPLATE_LANGS = {"javascript", "typescript", "tsx"}
_TRIPLE_QUOTE_LANGS = {"java", "kotlin", "scala", "swift", "dart", "c_sharp", "julia"}
_RUST_RAW = re.compile(r'(?:b?r)(#*)"')
_CPP_RAW = re.compile(r'(?:u8|[uUL])?R"([^()\\\s]{0,16})\(')

# Preprocessor languages: a `#` opening a line starts a directive that
# runs to end-of-line. The whole directive becomes ONE token — a
# `#define LOOP(x) for (…) {` can never leak a fake keyword or an
# unbalanced brace into the token stream (tree-sitter's C grammar
# likewise parses directives as single preproc nodes; it does NOT
# evaluate them, so `#if 0` bodies still lex as code — same here).
_PREPROC_LANGS = {"c", "cpp", "c_sharp"}
_PREPROC_CONT = {"c", "cpp"}  # backslash-newline continuation

# Languages whose metavariables snap generic argument lists
# (`Vec<Vec<u8>>`, `Map<K, List<V>>`) into one unit, and — for the
# `::`-path family — whole scoped paths (`std::vec::Vec<u8>`): the
# token-stream analog of the reference matching one tree-sitter
# generic_type/scoped_identifier node (rust/code_match/src/matcher.rs).
_GENERIC_LANGS = {"rust", "java", "kotlin", "scala", "c_sharp", "typescript", "tsx", "cpp", "dart", "swift"}
_PATH_LANGS = {"rust", "cpp"}

# Keyword-block languages (def…end / function…end) get the same
# string/comment-exact lexing: Lua long brackets and Ruby
# heredocs/percent-literals/=begin blocks each lex as ONE token, so a
# `def` or `function` inside them can never define a region or shift
# the keyword-block depth (tree-sitter parses these as single
# string/comment nodes; reference region classification:
# rust/code_ast/src/view/lang.rs).
_LUA_LONG_OPEN = re.compile(r"\[(=*)\[")
# Heredoc openers: uppercase-identifier convention only, which is how
# real Ruby heredocs are written — it keeps `a << b` shifts and
# `arr << item` appends out of the string scanner. Documented limit:
# a lowercase heredoc tag lexes as a shift.
_RUBY_HEREDOC = re.compile(r"<<([~-]?)(['\"]?)([A-Z][A-Z0-9_]*)\2")
_RUBY_PCT_PAIRED = {"(": ")", "[": "]", "{": "}", "<": ">"}
_RUBY_PCT = re.compile(r"%[qQwWiIrs]?([^\w\s])")


def _scan_lua_long(text: str, i: int) -> int | None:
    """End offset of a Lua long bracket ``[[…]]`` / ``[=[…]=]``
    starting at i, or None. Nothing escapes inside; the close must
    carry the same number of ``=``s."""
    m = _LUA_LONG_OPEN.match(text, i)
    if not m:
        return None
    close = "]" + m.group(1) + "]"
    j = text.find(close, m.end())
    return len(text) if j < 0 else j + len(close)


def _scan_ruby_percent(text: str, i: int) -> int | None:
    """End offset of a Ruby percent literal (``%w[…]``, ``%q{…}``,
    ``%(…)``) starting at the ``%``, or None. Paired delimiters nest;
    a backslash escapes the next char."""
    m = _RUBY_PCT.match(text, i)
    if not m:
        return None
    op = m.group(1)
    cl = _RUBY_PCT_PAIRED.get(op, op)
    n = len(text)
    j = m.end()
    depth = 1
    while j < n:
        c = text[j]
        if c == "\\":
            j += 2
            continue
        if c == op and cl != op:
            depth += 1
        elif c == cl:
            depth -= 1
            if depth == 0:
                return j + 1
        j += 1
    return n


def _scan_preproc(text: str, i: int, continuation: bool) -> int:
    """End offset (exclusive of the newline) of the directive starting
    at ``#``. Honors ``\\``-newline continuation (C/C++) and block
    comments, whose embedded newlines do not end the directive."""
    n = len(text)
    j = i
    while j < n:
        ch = text[j]
        if ch == "\n":
            return j
        if text.startswith("/*", j):
            k = text.find("*/", j + 2)
            j = n if k < 0 else k + 2
            continue
        if continuation and ch == "\\":
            k = j + 1
            if k < n and text[k] == "\r":
                k += 1
            if k < n and text[k] == "\n":
                j = k + 1
                continue
        j += 1
    return n


def _scan_template(text: str, i: int) -> int:
    """End offset of the template literal opening at text[i] == '`'.
    Handles escapes, nested `${expr}` interpolations (brace-balanced,
    string- and nested-template-aware). The whole template, including
    interpolations, becomes ONE string token: conservative — code
    inside an interpolation can never produce a chunk boundary or a
    definition, which is the safe direction for both consumers."""
    n = len(text)
    j = i + 1
    while j < n:
        c = text[j]
        if c == "\\":
            j += 2
            continue
        if c == "`":
            return j + 1
        if c == "$" and j + 1 < n and text[j + 1] == "{":
            j = _scan_template_expr(text, j + 2)
            continue
        j += 1
    return n


def _scan_template_expr(text: str, j: int) -> int:
    """Offset just past the `}` matching an interpolation opened at
    `${` (j points past the `{`). Nested braces, quoted strings, and
    nested template literals all balance."""
    n = len(text)
    depth = 1
    while j < n:
        c = text[j]
        if c == "\\":
            j += 2
            continue
        if c == "`":
            j = _scan_template(text, j)
            continue
        if c in "\"'":
            q = c
            j += 1
            while j < n and text[j] != q:
                if text[j] == "\\":
                    j += 1
                j += 1
            j += 1
            continue
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return j + 1
        j += 1
    return n


def _scan_special_string(text: str, i: int, language: str) -> int | None:
    """End offset of a language-specific string form starting at i, or
    None. Checked BEFORE the generic regex (``\"\"\"`` would otherwise
    lex as an empty string + a dangling quote)."""
    n = len(text)
    ch = text[i]
    if language in ("go", "julia") and ch == "`":
        # go raw string / julia command literal: multiline, no escapes
        j = text.find("`", i + 1)
        return n if j < 0 else j + 1
    if language in _TEMPLATE_LANGS and ch == "`":
        return _scan_template(text, i)
    if language == "rust" and ch in "rb":
        m = _RUST_RAW.match(text, i)
        if m:  # r#"…"# — unescaped quotes inside; closes at "# (same #s)
            close = '"' + m.group(1)
            j = text.find(close, m.end())
            return n if j < 0 else j + len(close)
        return None
    if language in _TRIPLE_QUOTE_LANGS and text.startswith('"""', i):
        j = text.find('"""', i + 3)  # text block: multiline, no escapes seen
        return n if j < 0 else j + 3
    if language == "cpp" and ch in "uULR":
        m = _CPP_RAW.match(text, i)
        if m:  # R"delim(…)delim" — nothing escapes; closes at )delim"
            close = ")" + m.group(1) + '"'
            j = text.find(close, m.end())
            return n if j < 0 else j + len(close)
        return None
    if language == "php" and text.startswith("<<<", i):
        # heredoc/nowdoc: <<<ID … \nID  (nowdoc quotes the ID)
        m = re.match(r"<<<['\"]?(\w+)['\"]?\r?\n", text[i:])
        if m:
            close = "\n" + m.group(1)
            j = text.find(close, i + m.end() - 1)
            return n if j < 0 else j + len(close)
        return None
    if language == "lua" and ch == "[":
        return _scan_lua_long(text, i)
    if language == "ruby" and ch == "<":
        m = _RUBY_HEREDOC.match(text, i)
        if m:
            # swallow through the terminator line: `<<~`/`<<-` allow
            # indentation before the tag, plain heredocs do not
            pat = (
                r"\n[ \t]*" + m.group(3) + r"\b"
                if m.group(1)
                else "\n" + m.group(3) + r"\b"
            )
            t = re.search(pat, text[m.end():])
            return n if t is None else m.end() + t.end()
        return None
    if language == "ruby" and ch == "%":
        return _scan_ruby_percent(text, i)
    if language == "sql" and ch == "$":
        # dollar-quoted body: $tag$ … $tag$ — a `;` inside never
        # terminates the statement, because the body is ONE token
        m = re.match(r"\$(\w*)\$", text[i:])
        if m:
            close = m.group(0)
            j = text.find(close, i + m.end())
            return n if j < 0 else j + len(close)
        return None
    if language == "c_sharp" and text.startswith('@"', i):
        j = i + 2  # verbatim: "" is an escaped quote, backslash literal
        while j < n:
            if text[j] == '"':
                if j + 1 < n and text[j + 1] == '"':
                    j += 2
                    continue
                return j + 1
            j += 1
        return n
    return None


@dataclass
class Tok:
    text: str
    start: int
    end: int


def tokenize(text: str, language: str = "text") -> list[Tok]:
    """Lex source into (word | string | operator | punctuation) tokens,
    skipping whitespace and comments. The same lexer tokenizes pattern
    literals, so pattern and source can never disagree on token
    boundaries (the reference shares its op-token table the same way,
    code_match/src/config.rs)."""
    line_c = _LINE_COMMENT.get(language)
    c_family = language in _C_FAMILY
    toks: list[Tok] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch.isspace():
            i += 1
            continue
        if language == "lua" and text.startswith("--", i):
            # long comment --[[…]] / --[=[…]=] before the line form
            end = _scan_lua_long(text, i + 2)
            if end is None:
                j = text.find("\n", i)
                end = n if j < 0 else j + 1
            i = end
            continue
        if language == "sql" and text.startswith("/*", i):
            j = text.find("*/", i + 2)
            i = n if j < 0 else j + 2
            continue
        if language == "julia" and text.startswith("#=", i):
            # #= … =# block comment, NESTED (the tree-sitter grammar
            # nests these; a `=#` inside an inner comment must not
            # close the outer one)
            depth, j = 1, i + 2
            while j < n and depth:
                if text.startswith("#=", j):
                    depth += 1
                    j += 2
                elif text.startswith("=#", j):
                    depth -= 1
                    j += 2
                else:
                    j += 1
            i = j
            continue
        if (
            language == "ruby"
            and text.startswith("=begin", i)
            and not text[text.rfind("\n", 0, i) + 1 : i].strip()
        ):
            # =begin/=end block comment (both at column 0)
            m_end = re.search(r"\n=end\b[^\n]*", text[i:])
            i = n if m_end is None else i + m_end.end()
            continue
        if line_c and text.startswith(line_c, i):
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c_family and text.startswith("//", i):
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c_family and text.startswith("/*", i):
            j = text.find("*/", i + 2)
            i = n if j < 0 else j + 2
            continue
        if (
            ch == "#"
            and language in _PREPROC_LANGS
            and not text[text.rfind("\n", 0, i) + 1 : i].strip()
        ):
            end = _scan_preproc(text, i, language in _PREPROC_CONT)
            toks.append(Tok(text[i:end], i, end))
            i = end
            continue
        end = _scan_special_string(text, i, language)
        if end is not None:
            toks.append(Tok(text[i:end], i, end))
            i = end
            continue
        m = _STRING.match(text, i)
        if m:
            toks.append(Tok(m.group(), i, m.end()))
            i = m.end()
            continue
        if language in ("c", "cpp") and ch.isdigit():
            # C++14 digit separators: 1'000'000 is ONE number token —
            # the apostrophe joins only when a digit follows, so a real
            # char literal after a number ( 1'x' ) still lexes apart
            m = _CPP_NUM.match(text, i)
            if m:
                toks.append(Tok(m.group(), i, m.end()))
                i = m.end()
                continue
        m = _WORD.match(text, i)
        if m:
            toks.append(Tok(m.group(), i, m.end()))
            i = m.end()
            continue
        op = next((o for o in _OPS if text.startswith(o, i)), None)
        if op:
            if op in ("<<", ">>") and language in _GENERIC_LANGS:
                # generic-capable languages lex shifts as two angle
                # tokens: a nested-generic close (`Vec<Vec<u8>>`) must
                # end one `>` at a time — the same shift-vs-generics
                # clash every real parser special-cases. Pattern and
                # source share this lexer, so a literal `>>` in a
                # pattern still aligns (both sides become `>` `>`).
                op = op[0]
            toks.append(Tok(op, i, i + len(op)))
            i += len(op)
            continue
        toks.append(Tok(ch, i, i + 1))
        i += 1
    return toks


class CodeSource:
    """Parse-once wrapper (reference ops/code.py ``CodeSource`` —
    "wrap it in a CodeSource so it is parsed at most once"). Here the
    cached artifact is the token stream: several pattern matches over
    the same source lex exactly once. Carries its own language."""

    def __init__(self, text: str, language: str = "text"):
        self.text = text
        self.language = language
        self._tokens: list[Tok] | None = None

    @property
    def tokens(self) -> list[Tok]:
        if self._tokens is None:
            self._tokens = tokenize(self.text, self.language)
        return self._tokens


@dataclass
class _Meta:
    name: str | None  # None = anonymous
    card: str  # "one" | "many" | "one_or_more" | "optional"
    regex: re.Pattern | None = None


@dataclass
class _Lit:
    text: str


@dataclass
class _Contain:
    """``\\{{ INNER \\}}`` — matches ONE unit here whose token span
    CONTAINS a match of INNER at any position inside it (the reference's
    descendant-containment, lexer.rs `S{{ INNER S}}` / DESIGN §12).
    Bindings thread across the group boundary and nested groups work —
    matcher.rs `match_contains`."""

    items: list


_META_LONG = re.compile(
    r"\\\(\s*(?:(?P<name>[A-Za-z0-9_]+)|(?P<anon>[_*+?]))?"
    r"(?:\s*:\s*/(?P<re1>(?:[^/\\]|\\.)*)/)?"
    r"\s*(?P<card>[*+?])?"
    r"(?:\s*:\s*/(?P<re2>(?:[^/\\]|\\.)*)/)?"
    r"\s*\\\)"
)
_META_SHORT = re.compile(r"\\(?:(?P<name>[A-Za-z0-9_]+)|(?P<anon>[_*+?])|/(?P<re>(?:[^/\\]|\\.)*)/)")
# anonymous regex, long form: `\(/re/\)` / `\(/re/*\)` (lexer.rs: "anonymous
# is `S(/re/ S)` or the short form `S/re/`")
_META_ANON_RE = re.compile(
    r"\\\(\s*/(?P<re>(?:[^/\\]|\\.)*)/\s*(?P<card>[*+?])?\s*\\\)"
)

from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=8)
def _meta_regexes(sigil: str):
    """The metavariable regexes for a configurable sigil (the
    reference's `with_meta_char`, lexer.rs: "sigil `S` is configurable,
    default `\\`"). Delimiters are symmetric: `S( … S)`."""
    s = re.escape(sigil)
    long_form = re.compile(
        s + r"\(\s*(?:(?P<name>[A-Za-z0-9_]+)|(?P<anon>[_*+?]))?"
        r"(?:\s*:\s*/(?P<re1>(?:[^/\\]|\\.)*)/)?"
        r"\s*(?P<card>[*+?])?"
        r"(?:\s*:\s*/(?P<re2>(?:[^/\\]|\\.)*)/)?"
        r"\s*" + s + r"\)"
    )
    short_form = re.compile(
        s + r"(?:(?P<name>[A-Za-z0-9_]+)|(?P<anon>[_*+?])|/(?P<re>(?:[^/\\]|\\.)*)/)"
    )
    anon_re = re.compile(
        s + r"\(\s*/(?P<re>(?:[^/\\]|\\.)*)/\s*(?P<card>[*+?])?\s*" + s + r"\)"
    )
    return long_form, short_form, anon_re
_CARD = {"*": "many", "+": "one_or_more", "?": "optional", "_": "one", None: "one"}


@dataclass
class StructMatch:
    text: str
    start: int
    end: int
    captures: dict[str, str] = field(default_factory=dict)


class StructuralPattern:
    """Compile once, match many sources (the reference's CodePattern
    contract — compilation is not free, reuse it)."""

    def __init__(
        self,
        pattern: str,
        language: str = "text",
        min_len: int = 3,
        sigil: str = "\\",
    ):
        if len(sigil) != 1:
            raise ValueError("sigil must be a single character")
        self.language = language
        self.min_len = min_len
        self.sigil = sigil
        self.items = self._lex_pattern(pattern)

        def _lits(items) -> list:
            out = []
            for it in items:
                if isinstance(it, _Lit) and len(it.text) >= min_len:
                    out.append(it.text)
                elif isinstance(it, _Contain):
                    out.extend(_lits(it.items))
            return out

        self.literals = _lits(self.items)

    def _lex_pattern(self, pattern: str) -> list:
        # `stack[-1]` is the item list currently being filled; a `\{{`
        # pushes a fresh inner list, `\}}` pops it into a _Contain.
        sig = self.sigil
        meta_long, meta_short, meta_anon_re = _meta_regexes(sig)
        stack: list[list] = [[]]
        i, n = 0, len(pattern)
        plain_start = i

        def flush(upto: int) -> None:
            seg = pattern[plain_start:upto]
            stack[-1].extend(_Lit(t.text) for t in tokenize(seg, self.language))

        while i < n:
            if pattern[i] != sig:
                i += 1
                continue
            if pattern.startswith(sig + sig, i):  # doubled sigil = literal
                flush(i)
                stack[-1].append(_Lit(sig))
                i += 2
                plain_start = i
                continue
            if pattern.startswith(sig + "{{", i):
                flush(i)
                stack.append([])
                i += 3
                plain_start = i
                continue
            if pattern.startswith(sig + "}}", i):
                flush(i)
                if len(stack) < 2:
                    raise ValueError(
                        f"unbalanced containment close {sig}}}}} at offset {i}"
                    )
                inner = stack.pop()
                stack[-1].append(_Contain(inner))
                i += 3
                plain_start = i
                continue
            m = (
                meta_anon_re.match(pattern, i)
                or meta_long.match(pattern, i)
                or meta_short.match(pattern, i)
            )
            if not m:
                raise ValueError(f"bad metavariable at offset {i}: {pattern[i:i+12]!r}")
            flush(i)
            gd = m.groupdict()
            anon = gd.get("anon")
            card = _CARD[gd.get("card") or (anon if anon and anon in "*+?" else None)]
            rx = gd.get("re") or gd.get("re1") or gd.get("re2")
            name = gd.get("name")
            if name == "_":  # `\_` / `\(_\)` are anonymous (lexer.rs)
                name = None
            if rx is not None:
                try:
                    compiled_rx = re.compile(f"^(?:{rx})$")
                except re.error as e:
                    # unparseable embedded regex is a client error, like
                    # the reference's lex/Pattern::compile (lexer.rs)
                    raise ValueError(
                        f"bad metavariable regex /{rx}/ at offset {i}: {e}"
                    ) from e
            else:
                compiled_rx = None
            stack[-1].append(_Meta(name=name, card=card, regex=compiled_rx))
            i = m.end()
            plain_start = i
        flush(n)
        if len(stack) != 1:
            raise ValueError(
                "unbalanced containment: \\{{ without a matching \\}}"
            )
        return stack[0]

    # -- prefilter ---------------------------------------------------------
    def might_match(self, source: str) -> bool:
        """Parse-free lexical prefilter: every literal pattern token of
        length >= min_len must occur in the source (ops/code.py:143)."""
        return all(t in source for t in self.literals)

    # -- matching ----------------------------------------------------------
    @staticmethod
    def _unit_end(toks: list[Tok], i: int) -> int:
        """End index (exclusive) of the balanced unit starting at i —
        one token, or a whole delimiter group (the node-snap analog)."""
        opener = toks[i].text
        if opener not in _OPENERS:
            return i + 1
        depth, j = 0, i
        while j < len(toks):
            if toks[j].text in _OPENERS:
                depth += 1
            elif toks[j].text in _CLOSERS:
                depth -= 1
                if depth == 0:
                    return j + 1
            j += 1
        return i + 1  # unbalanced: degrade to one token

    def _generic_end(self, toks: list[Tok], i: int) -> int | None:
        """End index (exclusive) of a type-path unit starting at the
        identifier at i: path segments (rust ``::``) and a balanced
        angle-bracket argument list — ``std::vec::Vec<Vec<u8>>`` is ONE
        unit, the node-snap the reference gets from tree-sitter's
        scoped_identifier/generic_type nodes (rust/code_match/src/
        matcher.rs: metavars snap to node boundaries). Ambiguity guard
        without a grammar: ``<`` opens a generic list only when it
        TOUCHES the preceding identifier (``Vec<u8>`` yes, ``a < b``
        no — idiomatic comparisons are spaced). ``>>``/``<<`` count as
        two closes/opens (the shift-vs-nested-generic lexer clash every
        real parser special-cases). Returns None when nothing extends."""
        j = i + 1
        n = len(toks)
        ext = False
        while j < n:
            t = toks[j]
            if (
                self.language in _PATH_LANGS
                and t.text == "::"
                and j + 1 < n
                and _WORD.match(toks[j + 1].text)
            ):
                j += 2
                ext = True
                continue
            if t.text == "(" and t.start == toks[j - 1].end and _WORD.match(
                toks[j - 1].text
            ):
                # a call argument list touching the identifier is part
                # of the same node (call_expression): `build()`,
                # `HashMap::new()` snap as one unit
                j = self._unit_end(toks, j)
                ext = True
                continue
            if t.text == "<" and t.start == toks[j - 1].end and _WORD.match(
                toks[j - 1].text
            ):
                depth = 1
                # A real type-argument list balances its OWN parens and
                # brackets: a `)`/`]` that closes an ENCLOSING delimiter
                # (underflow) means the `<` was a comparison —
                # `f(a<b && c)` stays a comparison instead of a
                # pseudo-generic swallow (r5 advisor). `||` never
                # occurs in a type-argument list in any generic-snap
                # language; `&&` only where rvalue/double references
                # are types (cpp `T&&`, rust `&&str`) and `=` only
                # where type args bind defaults/associations (rust
                # `Item = u32`, cpp `= int`, ts `<T = string>`) — in
                # the other languages both abort the walk, so unspaced
                # comparisons like `a<b && c>d` stay two comparisons.
                # The cpp/rust `&&` ambiguity is token-level
                # irreducible; it is resolved by the longest-first
                # candidate order (the plain unit is still tried when
                # the generic grouping fails the rest of the pattern).
                no_amp = self.language not in ("cpp", "rust")
                no_eq = self.language not in ("cpp", "rust", "typescript", "tsx")
                pdepth = 0
                j += 1
                while j < n and depth > 0:
                    tt = toks[j].text
                    if tt == "<":
                        depth += 1
                    elif tt == "<<":
                        depth += 2
                    elif tt == ">":
                        depth -= 1
                    elif tt == ">>":
                        depth -= 2
                    elif tt in ("(", "["):
                        pdepth += 1
                    elif tt in (")", "]"):
                        pdepth -= 1
                        if pdepth < 0:
                            return None  # closes an enclosing delimiter
                    elif (
                        tt in (";", "{", "}", "||")
                        or (tt == "&&" and no_amp)
                        or (tt == "=" and no_eq)
                        or _STRING.match(tt)
                    ):
                        return None  # not a generic list after all
                    j += 1
                if depth > 0:
                    return None
                ext = True
                continue
            break
        return j if ext else None

    def _unit_ends(self, toks: list[Tok], i: int) -> list[int]:
        """Candidate unit ends at i, longest first (the reference's
        descending extension order): the generic/path extension when the
        language has one, then the plain balanced unit."""
        base = self._unit_end(toks, i)
        if self.language in _GENERIC_LANGS and _WORD.match(toks[i].text):
            g = self._generic_end(toks, i)
            if g is not None and g > base:
                return [g, base]
        return [base]

    def match(self, source: "str | CodeSource") -> list[StructMatch]:
        if isinstance(source, CodeSource):
            toks, source = source.tokens, source.text
        else:
            toks = tokenize(source, self.language)
        out: list[StructMatch] = []
        i = 0
        while i < len(toks):
            res = self._try_at(source, toks, i)
            if res is not None:
                out.append(res)
                # advance past the match (non-overlapping, like finditer)
                i = next(
                    (k for k in range(i + 1, len(toks)) if toks[k].start >= res.end),
                    len(toks),
                )
            else:
                i += 1
        return out

    # reference API name (CodePattern.match_source, ops/code.py:115-160)
    match_source = match

    def _try_at(self, source: str, toks: list[Tok], start: int) -> StructMatch | None:
        bind: dict[str, tuple[int, int]] = {}  # name -> (tok_lo, tok_hi)

        def capture_ok(meta: _Meta, lo: int, hi: int) -> bool:
            if meta.regex is not None:
                if meta.card in ("many", "one_or_more"):
                    # regex constrains EVERY node of a run (lexer.rs)
                    for k in range(lo, hi):
                        if not meta.regex.match(toks[k].text):
                            return False
                elif hi > lo:
                    # the regex constrains the value only when PRESENT:
                    # an absent optional binds empty without a regex
                    # test (features.rs regex_optional_constrains_when
                    # _present — `f()` matches `f(\(A:/[0-9]+/?\))`)
                    span = source[toks[lo].start : toks[hi - 1].end]
                    if not meta.regex.match(span):
                        return False
            if meta.name is not None:
                if meta.name in bind:
                    plo, phi = bind[meta.name]
                    prev = source[toks[plo].start : toks[phi - 1].end] if phi > plo else ""
                    cur = source[toks[lo].start : toks[hi - 1].end] if hi > lo else ""
                    return prev == cur
                bind[meta.name] = (lo, hi)
            return True

        def unbind(meta: _Meta, had: bool) -> None:
            if meta.name is not None and not had:
                bind.pop(meta.name, None)

        def rec(items: list, pi: int, ti: int, limit: int) -> int | None:
            """Match items[pi:] at token ti within toks[:limit]; return
            the end token index."""
            if pi == len(items):
                return ti
            it = items[pi]
            if isinstance(it, _Lit):
                if ti < limit and toks[ti].text == it.text:
                    return rec(items, pi + 1, ti + 1, limit)
                return None
            if isinstance(it, _Contain):
                # one unit here whose span CONTAINS a match of the inner
                # pattern anywhere inside it (any depth: the search
                # scans every start position within the unit, so nested
                # delimiters are transparent). For a delimiter group the
                # searched region is the group's interior; the outer
                # match resumes after the group. Bindings thread both
                # ways; each candidate inner match backtracks cleanly.
                if ti >= limit or toks[ti].text in _CLOSERS:
                    return None
                if toks[ti].text in _OPENERS:
                    # delimiter group: search its interior, resume after
                    hi = min(self._unit_ends(toks, ti)[0], limit)
                    region_lo, region_hi = ti + 1, max(hi - 1, ti + 1)
                else:
                    # braceless suite (python/ruby …): no closing token
                    # exists, so the "one node" region is the same-level
                    # sibling run bounded by INDENTATION — the run stops
                    # at the first unit that begins its own line at a
                    # column BELOW the suite's first token, the
                    # token-stream dedent, which is where the
                    # reference's tree-sitter suite node ends (the r5
                    # advisor's false positive: without the bound the
                    # region bled into the NEXT top-level definition
                    # and matched its returns under the wrong header).
                    a_ls = source.rfind("\n", 0, toks[ti].start) + 1
                    anchor_col = toks[ti].start - a_ls

                    def _dedented(tok: Tok) -> bool:
                        ls = source.rfind("\n", 0, tok.start) + 1
                        return (
                            tok.start - ls < anchor_col
                            and not source[ls : tok.start].strip()
                        )

                    j = ti
                    while j < limit and toks[j].text not in _CLOSERS:
                        if j > ti and _dedented(toks[j]):
                            break
                        j = min(self._unit_ends(toks, j)[0], limit)
                    hi = j
                    region_lo, region_hi = ti, hi
                for s in range(region_lo, region_hi):
                    before = set(bind)
                    inner_end = rec(it.items, 0, s, region_hi)
                    if inner_end is not None:
                        r = rec(items, pi + 1, hi, limit)
                        if r is not None:
                            return r
                    for name in set(bind) - before:
                        bind.pop(name, None)
                return None
            # metavariable
            had = it.name in bind if it.name else False
            if it.card == "one":
                if ti >= limit or toks[ti].text in _CLOSERS:
                    return None
                for hi in self._unit_ends(toks, ti):
                    if hi > limit:
                        continue
                    if capture_ok(it, ti, hi):
                        r = rec(items, pi + 1, hi, limit)
                        if r is not None:
                            return r
                    unbind(it, had)
                return None
            if it.card == "optional":
                if ti < limit and toks[ti].text not in _CLOSERS:
                    for hi in self._unit_ends(toks, ti):
                        if hi > limit:
                            continue
                        if capture_ok(it, ti, hi):
                            r = rec(items, pi + 1, hi, limit)
                            if r is not None:
                                return r
                        unbind(it, had)
                if capture_ok(it, ti, ti):
                    r = rec(items, pi + 1, ti, limit)
                    if r is not None:
                        return r
                unbind(it, had)
                return None
            # runs: collect same-level unit boundaries, try longest first
            # (greedy, like the reference's descending extension order);
            # each step takes the widest unit (generic lists included)
            bounds = [ti]
            j = ti
            while j < limit and toks[j].text not in _CLOSERS:
                j = min(self._unit_ends(toks, j)[0], limit)
                bounds.append(j)
            lo_units = 1 if it.card == "one_or_more" else 0
            for hi in reversed(bounds[lo_units:]):
                if capture_ok(it, ti, hi):
                    r = rec(items, pi + 1, hi, limit)
                    if r is not None:
                        return r
                unbind(it, had)
            return None

        end_ti = rec(self.items, 0, start, len(toks))
        if end_ti is None or end_ti == start:
            return None
        s, e = toks[start].start, toks[end_ti - 1].end
        caps = {
            name: (source[toks[lo].start : toks[hi - 1].end] if hi > lo else "")
            for name, (lo, hi) in bind.items()
        }
        return StructMatch(source[s:e], s, e, caps)


# --- definition views (reference: code_ast region classification,
#     rust/code_ast/src/view/lang.rs `classify`/`is_region` — functions,
#     classes, types as named regions with spans) ---------------------------

# Per-language definition-shape patterns, expressed in the matcher's own
# metavariable syntax — one compile per (language, kind), reused across
# sources via CodeSource.
DEF_PATTERNS: dict[str, list[tuple[str, str]]] = {
    "python": [
        ("function", r"def \NAME(\(_*\))"),
        ("class", r"class \NAME"),
    ],
    "go": [
        ("function", r"func \NAME(\(_*\))"),
        ("type", r"type \NAME"),
    ],
    "rust": [
        ("function", r"fn \NAME(\(_*\))"),
        ("struct", r"struct \NAME"),
        ("trait", r"trait \NAME"),
        ("impl", r"impl \NAME"),
    ],
    "javascript": [
        ("function", r"function \NAME(\(_*\))"),
        ("class", r"class \NAME"),
    ],
    "typescript": [
        ("function", r"function \NAME(\(_*\))"),
        ("class", r"class \NAME"),
        ("interface", r"interface \NAME"),
    ],
    "java": [
        ("class", r"class \NAME"),
        ("interface", r"interface \NAME"),
    ],
    "c": [("function", r"\TYPE \NAME(\(_*\)) {")],
    "ruby": [
        ("function", r"def \NAME"),
        ("class", r"class \NAME"),
    ],
}

_DEF_CACHE: dict[tuple[str, str, str], StructuralPattern] = {}


def definitions(source: "str | CodeSource", language: str = "python") -> list[dict]:
    """Named definition regions of a source: [{kind, name, start, end}]
    sorted by position — the Spark-friendly projection of the
    reference's AST region views (rust/code_ast/src/view/lang.rs
    classify/is_region). For Python the regions come from the stdlib
    ``ast`` parse tree — exact spans, no false hits on ``def`` inside
    strings/comments; non-parsing sources and every other language use
    the token matcher (one shared token stream per source —
    CodeSource parse-once)."""
    if language == "python":
        from cocoindex_spark.operators.pyast import py_definitions

        text = source.text if isinstance(source, CodeSource) else source
        ast_defs = py_definitions(text)
        if ast_defs is not None:
            return sorted(
                (
                    {"kind": d["kind"], "name": d["name"], "start": d["start"], "end": d["end"]}
                    for d in ast_defs
                ),
                key=lambda d: (d["start"], d["kind"]),
            )
    else:
        # Brace languages with a lexer-exact kind table get definitions
        # from the comment/string-stripping token stream — a `fn` inside
        # a string literal or comment can never become a region
        # (operators/code_boundaries.py; reference: tree-sitter region
        # classification, rust/code_ast/src/view/lang.rs).
        from cocoindex_spark.operators.code_boundaries import (
            brace_definitions,
            supports_definitions,
        )

        if supports_definitions(language):
            text = source.text if isinstance(source, CodeSource) else source
            lex_defs = brace_definitions(text, language)
            if lex_defs is not None:
                return sorted(
                    (
                        {
                            "kind": d["kind"],
                            "name": d["name"],
                            "start": d["start"],
                            "end": d["end"],
                        }
                        for d in lex_defs
                    ),
                    key=lambda d: (d["start"], d["kind"]),
                )
    if not isinstance(source, CodeSource):
        source = CodeSource(source, language)
    out = []
    for kind, pat in DEF_PATTERNS.get(language, ()):
        key = (language, kind, pat)
        cp = _DEF_CACHE.get(key)
        if cp is None:
            cp = _DEF_CACHE[key] = StructuralPattern(pat, language)
        for m in cp.match_source(source):
            name = m.captures.get("NAME")
            if name:
                out.append(
                    {"kind": kind, "name": name, "start": m.start, "end": m.end}
                )
    return sorted(out, key=lambda d: (d["start"], d["kind"]))


def definitions_df(df, text_col: str, language: str = "python"):
    """One row per definition found in ``text_col`` — Arrow-batched,
    per-row, no shuffle; columns (def_kind, def_name, def_start)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = ArrayType(
        StructType(
            [
                StructField("kind", StringType()),
                StructField("name", StringType()),
                StructField("start", IntegerType()),
                StructField("end", IntegerType()),
            ]
        )
    )

    def run(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                []
                if t is None
                else [
                    {
                        "kind": d["kind"],
                        "name": d["name"],
                        "start": d["start"],
                        "end": d["end"],
                    }
                    for d in definitions(t, language)
                ]
                for t in texts
            ]
        )

    udf = F.pandas_udf(run, schema)
    return df.withColumn("__d", F.explode(udf(F.col(text_col)))).select(
        *df.columns,
        F.col("__d.kind").alias("def_kind"),
        F.col("__d.name").alias("def_name"),
        F.col("__d.start").alias("def_start"),
        F.col("__d.end").alias("def_end"),
    )


# --- Spark surface --------------------------------------------------------


def match_code_df(df, text_col: str, pattern: str, language: str = "text"):
    """Two-phase distributed plan: JVM contains-prefilter on the
    pattern's literal tokens (rows that can't match never reach
    Python), then an Arrow-batched pandas UDF running the structural
    matcher per row; one output row per match with a captures map."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        MapType,
        StringType,
        StructField,
        StructType,
    )

    from cocoindex_spark.operators.code_ops import might_match

    cp = StructuralPattern(pattern, language)
    schema = ArrayType(
        StructType(
            [
                StructField("match_text", StringType()),
                StructField("start", IntegerType()),
                StructField("end", IntegerType()),
                StructField("captures", MapType(StringType(), StringType())),
            ]
        )
    )

    def run(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                []
                if t is None
                else [
                    {
                        "match_text": m.text,
                        "start": m.start,
                        "end": m.end,
                        "captures": m.captures,
                    }
                    for m in cp.match(t)
                ]
                for t in texts
            ]
        )

    udf = F.pandas_udf(run, schema)
    if cp.literals:
        df = df.filter(might_match(F.col(text_col), cp.literals))
    return df.withColumn("__m", F.explode(udf(F.col(text_col)))).select(
        *df.columns,
        F.col("__m.match_text").alias("match_text"),
        F.col("__m.start").alias("match_start"),
        F.col("__m.end").alias("match_end"),
        F.col("__m.captures").alias("captures"),
    )
