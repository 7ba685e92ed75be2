"""Property-based invariants (hypothesis) for the pure-Python operator
cores: splitter span algebra, tokenizer offsets, structural matcher
span consistency, canonical fingerprints. These are the invariants the
reference's unit suites pin with examples; hypothesis sweeps the input
space instead."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cocoindex_spark.fingerprint import fp_value
from cocoindex_spark.operators.code_match import StructuralPattern, tokenize
from cocoindex_spark.operators.split import (
    LANGUAGE_SEPARATORS,
    split_by_separator,
    split_recursive,
)

TEXT = st.text(
    alphabet=st.sampled_from(list("ab c.\n\t()[]{}#\"'=+,:_0xyz!/")), max_size=400
)
LANG = st.sampled_from(sorted(LANGUAGE_SEPARATORS))


@settings(max_examples=60, deadline=None)
@given(TEXT, LANG, st.integers(8, 128), st.integers(0, 32))
def test_split_recursive_invariants(text, lang, chunk_size, overlap):
    chunks = split_recursive(
        text, chunk_size=chunk_size, language=lang, chunk_overlap=overlap
    )
    prev_start = -1
    for c in chunks:
        # spans are in-bounds, non-empty, ordered, sized, and faithful
        assert 0 <= c.start_char < c.end_char <= len(text)
        assert c.start_char > prev_start or prev_start == -1
        assert len(c.text) <= chunk_size
        assert text[c.start_char : c.end_char] == c.text
        assert 1 <= c.start_line <= c.end_line
        prev_start = c.start_char


@settings(max_examples=60, deadline=None)
@given(TEXT, st.integers(8, 128), st.integers(0, 32))
def test_split_separator_invariants(text, chunk_size, overlap):
    chunks = split_by_separator(
        text, chunk_size=chunk_size, chunk_overlap=overlap
    )
    ends = 0
    for c in chunks:
        assert 0 <= c.start_char < c.end_char <= len(text)
        assert text[c.start_char : c.end_char] == c.text
        # forward progress: every chunk ends strictly later
        assert c.end_char > ends or ends == 0
        ends = c.end_char


@settings(max_examples=80, deadline=None)
@given(TEXT, st.sampled_from(["python", "rust", "sql", "text"]))
def test_tokenizer_offsets_faithful(text, lang):
    toks = tokenize(text, lang)
    prev_end = 0
    for t in toks:
        assert text[t.start : t.end] == t.text
        assert t.start >= prev_end  # non-overlapping, ordered
        prev_end = t.end


@settings(max_examples=60, deadline=None)
@given(TEXT)
def test_matcher_span_consistency(text):
    """Matches are faithful source slices, ordered, non-overlapping;
    the prefilter never rejects a source that actually matches."""
    p = StructuralPattern(r"f(\(A*\))", "python")
    prev_end = -1
    ms = p.match(text)
    for m in ms:
        assert text[m.start : m.end] == m.text
        assert m.start >= prev_end
        prev_end = m.end
    if ms:
        assert p.might_match(text)


@settings(max_examples=100, deadline=None)
@given(
    st.dictionaries(
        st.text(max_size=8),
        st.recursive(
            st.none() | st.booleans() | st.integers() | st.text(max_size=8),
            lambda inner: st.lists(inner, max_size=3),
            max_leaves=6,
        ),
        max_size=5,
    )
)
def test_fp_value_key_order_invariant(d):
    """Canonical fingerprints ignore dict ordering but distinguish any
    value change (spot: flipping one leaf changes the digest)."""
    shuffled = dict(reversed(list(d.items())))
    assert fp_value(d) == fp_value(shuffled)
    changed = dict(d)
    changed["__extra__"] = 1
    assert fp_value(changed) != fp_value(d)


# --- new-operator invariants (round 4) ----------------------------------

_RESP_ARG = st.one_of(
    st.binary(max_size=64),
    st.text(alphabet=st.sampled_from(list("abc01 #\r\n$*:+-")), max_size=32),
)


@settings(max_examples=80, deadline=None)
@given(st.lists(_RESP_ARG, min_size=1, max_size=6))
def test_resp_encoding_roundtrip(args):
    """RESP2 framing is binary-safe and self-delimiting: parsing the
    encoded command recovers exactly the argument bytes."""
    from cocoindex_spark.sinks.valkey_resp import encode_command

    raw = encode_command(*args)
    # parse
    assert raw.startswith(b"*")
    body = raw
    n, body = body.split(b"\r\n", 1)
    count = int(n[1:])
    out = []
    for _ in range(count):
        hdr, body = body.split(b"\r\n", 1)
        assert hdr[:1] == b"$"
        ln = int(hdr[1:])
        out.append(body[:ln])
        assert body[ln : ln + 2] == b"\r\n"
        body = body[ln + 2 :]
    assert body == b""
    want = [a if isinstance(a, bytes) else str(a).encode() for a in args]
    assert out == want


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.sampled_from(["fn", "struct", "trait", "x", "y", "let", "1"]),
        min_size=0,
        max_size=12,
    )
)
def test_brace_definitions_never_fire_inside_strings(words):
    """Whatever keyword soup rides inside a string literal or comment,
    it can never become a definition — only the one real fn is found."""
    from cocoindex_spark.operators.code_boundaries import brace_definitions

    inner = " ".join(words).replace('"', "")
    src = f'fn real() {{\n    let s = "{inner}";\n    // {inner}\n    1\n}}\n'
    defs = brace_definitions(src, "rust")
    assert [(d["kind"], d["name"]) for d in defs] == [("function", "real")]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 2**48 - 1), min_size=1, max_size=200))
def test_hll_register_merge_is_max(hashes):
    """Pure-python restatement of the register pipeline: merging any
    partition split with MAX equals the whole-data registers."""
    M = 256
    W = 40

    def regs(hs):
        out = {}
        for h in hs:
            j, w = h % M, h // M
            rho = (W + 1) - w.bit_length() if w > 0 else W + 1
            out[j] = max(out.get(j, 0), rho)
        return out

    mid = len(hashes) // 2
    a, b = regs(hashes[:mid]), regs(hashes[mid:])
    merged = {j: max(a.get(j, 0), b.get(j, 0)) for j in set(a) | set(b)}
    assert merged == regs(hashes)


@settings(max_examples=60, deadline=None)
@given(
    st.recursive(
        st.sampled_from(["u8", "u64", "String", "T", "E"]),
        lambda inner: st.builds(
            lambda n, args: f"{n}<{', '.join(args)}>",
            st.sampled_from(["Vec", "Result", "HashMap", "Box"]),
            st.lists(inner, min_size=1, max_size=3),
        ),
        max_leaves=6,
    )
)
def test_generic_type_node_snap_roundtrip(ty):
    """Property: for ANY nested generic type T, a single metavariable
    in `let x: \\T = v;` binds exactly T — the angle-balance walk must
    close every nesting depth (shift-token splitting included)."""
    from cocoindex_spark.operators.code_match import StructuralPattern

    src = f"let x: {ty} = v;"
    ms = StructuralPattern(r"let x: \T = v;", "rust").match(src)
    assert len(ms) == 1, (ty, ms)
    assert ms[0].captures["T"] == ty
