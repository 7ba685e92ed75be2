"""Property-based checks for the document/config region walkers,
using Python's OWN parsers as oracles where the stdlib has one:
``json_sections`` vs ``json.loads`` and ``toml_sections`` vs
``tomllib`` on generated documents, plus structural invariants
(in-bounds, non-overlapping at a level) for markdown."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from cocoindex_spark.operators.code_boundaries import (
    json_sections,
    markdown_sections,
    toml_sections,
)

_key = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="_"),
    min_size=1,
    max_size=8,
).filter(lambda s: s[0].isalpha() or s[0] == "_")

_scalar = st.one_of(
    st.integers(-1000, 1000),
    st.booleans(),
    st.text(max_size=12),  # incl. braces/quotes/colons inside strings
)
_value = st.recursive(
    _scalar,
    lambda inner: st.one_of(
        st.lists(inner, max_size=3),
        st.dictionaries(_key, inner, max_size=3),
    ),
    max_leaves=8,
)


@settings(max_examples=60, deadline=None)
@given(st.dictionaries(_key, _value, min_size=0, max_size=6), st.integers(0, 2))
def test_json_sections_match_json_loads(obj, indent):
    # ensure_ascii=False: the walker reads raw text, so escaped
    # non-ASCII keys would trivially mismatch the dict's key string
    text = json.dumps(obj, indent=indent or None, ensure_ascii=False)
    secs = json_sections(text)
    assert [d["name"] for d in secs] == list(obj.keys())
    for d in secs:
        frag = text[d["start"] : d["end"]]
        assert frag.startswith(json.dumps(d["name"], ensure_ascii=False))
        # the region is the full `"key": value` slice — it must parse
        # back to the same value when wrapped as an object
        assert json.loads("{" + frag + "}") == {d["name"]: obj[d["name"]]}


_tname = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
    min_size=1,
    max_size=6,
).filter(lambda s: s[0].isalpha())


@settings(max_examples=60, deadline=None)
@given(
    st.lists(_tname, min_size=0, max_size=5, unique=True),
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=10),
)
def test_toml_sections_match_tomllib(tables, payload):
    import tomllib

    # one multiline-string decoy that LOOKS like a header, then the
    # generated tables (payload kept printable-ASCII — TOML forbids
    # control chars in strings; not a walker concern)
    safe = payload.replace('"""', "").replace("\\", "").replace('"', "")
    doc = 'decoy = """\n[notatable]\n' + safe.replace("\n", " ") + '\n"""\n'
    for t in tables:
        doc += f"[{t}]\nv = 1\n"
    parsed = tomllib.loads(doc)
    got = [d["name"] for d in toml_sections(doc)]
    assert got == tables
    assert set(got) == set(parsed.keys()) - {"decoy"}


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 3), st.text(max_size=8)), max_size=6))
def test_markdown_sections_structural_invariants(heads):
    text = ""
    for lvl, title in heads:
        clean = title.replace("\n", " ").replace("#", "")
        text += "#" * lvl + " " + clean + "\n" + "body\n"
    secs = markdown_sections(text)
    for d in secs:
        assert 0 <= d["start"] < d["end"] <= len(text)
        assert text[d["start"]] == "#"
    # same-level regions never overlap
    by_level: dict = {}
    for d in secs:
        by_level.setdefault(d["kind"], []).append(d)
    for ds in by_level.values():
        ds.sort(key=lambda d: d["start"])
        for a, b in zip(ds, ds[1:]):
            assert a["end"] <= b["start"]
