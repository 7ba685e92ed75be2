"""Local filesystem source: the walk_dir analog
(python/cocoindex/connectors/localfs/_source.py:352 `walk_dir`;
pattern matcher rust/ops_text/src/pattern_matcher.rs:136-244).

Batch scan uses Spark's built-in ``binaryFile`` format (distributed
listing + content read, splittable across executors); live mode is the
same directory through ``readStream`` (see streaming/live.py).

Keys are the relative POSIX path (the reference's StableKey), content
fingerprints come from file length+mtime with content hash on demand —
the reference's two-level memo validation (data_types.mdx:37-39).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class PatternFilePathMatcher:
    """Ordered include/exclude globs with ``!`` negation — the
    pattern_matcher.rs:176-244 semantics: a path matches if it matches
    any include pattern and no effective exclude; patterns starting
    with ``!`` inside the exclude list re-include (last match wins).
    """

    def __init__(
        self,
        included_patterns: list[str] | None = None,
        excluded_patterns: list[str] | None = None,
    ):
        self.included = included_patterns or ["**"]
        self.excluded = excluded_patterns or []

    @staticmethod
    def _glob_to_re(pattern: str) -> re.Pattern:
        # '**' crosses directory separators, '*' does not.
        out = []
        i = 0
        while i < len(pattern):
            c = pattern[i]
            if c == "*":
                if pattern[i : i + 2] == "**":
                    out.append(".*")
                    i += 2
                    if i < len(pattern) and pattern[i] == "/":
                        i += 1  # '**/' also matches zero dirs
                else:
                    out.append("[^/]*")
                    i += 1
            elif c == "?":
                out.append("[^/]")
                i += 1
            else:
                out.append(re.escape(c))
                i += 1
        return re.compile("^" + "".join(out) + "$")

    def matches(self, relpath: str) -> bool:
        if not any(self._glob_to_re(p).match(relpath) for p in self.included):
            return False
        verdict = True
        for p in self.excluded:
            if p.startswith("!"):
                if self._glob_to_re(p[1:]).match(relpath):
                    verdict = True
            elif self._glob_to_re(p).match(relpath):
                verdict = False
        return verdict

    def match_col(self, relpath: F.Column) -> F.Column:
        """The same ordered include/exclude semantics compiled to a JVM
        boolean expression (rlike + CASE chain) — the glob→regex
        translation is shared with ``matches``, so the two paths cannot
        diverge. Keeps directory scans inside whole-stage codegen with
        no Python UDF (the globs are static, so there is nothing a UDF
        could add). Python's ``re.escape`` only backslash-escapes
        punctuation, which Java regex also accepts literally.
        """
        from functools import reduce

        included = reduce(
            lambda a, b: a | b,
            [relpath.rlike(self._glob_to_re(p).pattern) for p in self.included],
        )
        # Last match wins: wrap later patterns OUTSIDE earlier ones so
        # they are consulted first.
        verdict = F.lit(True)
        for p in self.excluded:
            neg = p.startswith("!")
            pat = self._glob_to_re(p[1:] if neg else p).pattern
            verdict = F.when(relpath.rlike(pat), F.lit(neg)).otherwise(verdict)
        return included & verdict


def scan_dir(
    spark: SparkSession,
    path: str,
    included_patterns: list[str] | None = None,
    excluded_patterns: list[str] | None = None,
    binary: bool = True,
) -> DataFrame:
    """Recursive directory scan → DataFrame(path, relpath, mtime,
    size, content).

    The listing/content read is Spark's binaryFile source (executes
    distributed; partition count follows maxPartitionBytes). Pattern
    filtering compiles the globs to a JVM rlike/CASE chain
    (``match_col``) so the scan stays in whole-stage codegen; the plain
    single-include case additionally pushes ``pathGlobFilter`` into the
    source listing itself.
    """
    matcher = PatternFilePathMatcher(included_patterns, excluded_patterns)
    root = os.path.abspath(path)

    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    single_include = (
        included_patterns is not None
        and len(included_patterns) == 1
        and not excluded_patterns
        and "/" not in included_patterns[0]
    )
    if single_include:
        reader = reader.option("pathGlobFilter", included_patterns[0])
    df = reader.load(root)

    relpath = F.regexp_replace(
        F.regexp_replace(F.col("path"), "^file:", ""), re.escape(root) + "/?", ""
    )
    df = df.select(
        F.col("path").alias("uri"),
        relpath.alias("relpath"),
        F.col("modificationTime").alias("mtime"),
        F.col("length").alias("size"),
        F.col("content"),
    )
    if not single_include and (included_patterns or excluded_patterns):
        df = df.filter(matcher.match_col(F.col("relpath")))
    if not binary:
        df = df.withColumn("text", decode_text(F.col("content")))
    return df


def decode_text(content: F.Column) -> F.Column:
    """BOM-aware text decode (localfs/_source.py read_text semantics):
    UTF-8/UTF-16 BOM detection with UTF-8 fallback. Works on any binary
    column expression — the BOM-skip substrings are built from the
    passed column, never a hard-coded name."""
    # substring(col, pos, len): len > remaining returns the rest, so a
    # max-int length is "everything from pos".
    rest_from = lambda pos: F.substring(content, pos, 2147483647)  # noqa: E731
    head = F.substring(content, 1, 3)
    return (
        F.when(head == bytes([0xEF, 0xBB, 0xBF]), F.decode(rest_from(4), "UTF-8"))
        .when(
            F.substring(content, 1, 2) == bytes([0xFF, 0xFE]),
            F.decode(rest_from(3), "UTF-16LE"),
        )
        .when(
            F.substring(content, 1, 2) == bytes([0xFE, 0xFF]),
            F.decode(rest_from(3), "UTF-16BE"),
        )
        .otherwise(F.decode(content, "UTF-8"))
    )
