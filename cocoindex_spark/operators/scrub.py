"""Text scrubbing for training-data pipelines: PII redaction and
whitespace/case normalization.

All patterns are JVM-side ``regexp_replace`` / ``regexp_count``
expressions (whole-stage codegen, no Python UDFs), restricted to the
regex subset where Java's engine and RE2 (DuckDB) agree exactly, so
the oracle can replicate them 1:1.

Reference analog: the reference sanitizes NULs and normalizes text at
sink boundaries (python/cocoindex/connectors/postgres/_target.py) but
has no PII pass; this is one of the task brief's training-data
extensions (like dedup/quality scoring in queries/textq.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters: URL before email (URLs may embed '@' userinfo), email
# before phone (phones are digit runs; emails contain digits).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9][0-9()\- ]{6,}[0-9]", "<PHONE>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts (JVM ``regexp_count``)."""
    return {
        name: F.regexp_count(text, F.lit(pat)).cast("long") for name, pat, _ in PII_PATTERNS
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its placeholder, in PII_PATTERNS
    order (URL first so its embedded emails/digits are already gone)."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


# Spelled explicitly rather than \s: Java's \s includes vertical tab
# (\x0B) while RE2 (DuckDB) excludes it, so \s-based normalization
# diverges between engines on text containing \x0B. The explicit class
# (with \x0B included) means the same byte set on both sides.
WS_CLASS = "[ \\t\\n\\x0B\\f\\r]"


def normalize_text(text: Column) -> Column:
    """Canonical form for normalized dedup: lowercase, collapse all
    whitespace runs to one space, trim."""
    return F.trim(F.regexp_replace(F.lower(text), WS_CLASS + "+", " "))


def sql_pii_count(name: str, text_expr: str) -> str:
    """DuckDB expression mirroring ``pii_counts[name]`` exactly."""
    pat = next(p for n, p, _ in PII_PATTERNS if n == name)
    escaped = pat.replace("'", "''")
    return f"CAST(len(regexp_extract_all({text_expr}, '{escaped}')) AS BIGINT)"


def sql_redact(text_expr: str) -> str:
    """DuckDB expression mirroring ``redact_pii`` (global replace)."""
    out = text_expr
    for _, pat, repl in PII_PATTERNS:
        escaped = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{escaped}', '{repl}', 'g')"
    return out


def sql_normalize(text_expr: str) -> str:
    """DuckDB expression mirroring ``normalize_text`` (same explicit
    whitespace class — see WS_CLASS note on \\s divergence)."""
    return f"trim(regexp_replace(lower({text_expr}), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))"
