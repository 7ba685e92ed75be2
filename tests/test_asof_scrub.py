"""As-of join, bucketed range join, and PII scrub operators.

The oracle queries (q54/q55/q36) cover the cross-engine semantics on
the shipped tables; these tests exercise edge cases the word-salad
testdata cannot reach: equal-timestamp ties under strict/non-strict,
keys with no right rows, inner mode, bucket boundaries landing exactly
on the range edges, and PII strings that actually match the patterns.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_strict_excludes_equal_ts(spark):
    from cocoindex_spark.operators.asof import asof_join

    left = _df(spark, [(1, "k", 100), (2, "k", 200)], "lid INT, k STRING, ts INT")
    right = _df(spark, [(10, "k", 100), (11, "k", 150)], "rid INT, k STRING, ts INT")
    strict = asof_join(left, right, ["k"], "ts", "ts", strict=True)
    got = {r["lid"]: r["r_rid"] for r in strict.collect()}
    # lid=1 at ts=100: the only earlier-or-equal right row is ts=100,
    # excluded under strict < — no match.
    assert got == {1: None, 2: 11}

    loose = asof_join(left, right, ["k"], "ts", "ts", strict=False)
    got = {r["lid"]: r["r_rid"] for r in loose.collect()}
    assert got == {1: 10, 2: 11}


def test_asof_inner_and_missing_key(spark):
    from cocoindex_spark.operators.asof import asof_join

    left = _df(spark, [(1, "a", 100), (2, "b", 100)], "lid INT, k STRING, ts INT")
    right = _df(spark, [(10, "a", 50)], "rid INT, k STRING, ts INT")
    out = asof_join(left, right, ["k"], "ts", "ts", how="inner").collect()
    assert [(r["lid"], r["r_rid"]) for r in out] == [(1, 10)]
    out = asof_join(left, right, ["k"], "ts", "ts", how="left")
    assert {r["lid"]: r["r_rid"] for r in out.collect()} == {1: 10, 2: None}


def test_asof_picks_latest_not_any(spark):
    from cocoindex_spark.operators.asof import asof_join

    left = _df(spark, [(1, "k", 1000)], "lid INT, k STRING, ts INT")
    right = _df(
        spark,
        [(10, "k", 1), (11, "k", 500), (12, "k", 999), (13, "k", 1001)],
        "rid INT, k STRING, ts INT",
    )
    out = asof_join(left, right, ["k"], "ts", "ts").collect()
    assert out[0]["r_rid"] == 12  # largest ts < 1000, never the later one


def test_range_count_join_boundaries(spark):
    from cocoindex_spark.operators.asof import range_count_join

    # width = 100 us; left at t=1_000_000 us counts right in
    # [t-100, t): 999_900 inclusive … 999_999 inclusive, 1_000_000 out.
    left = _df(spark, [(1, "k", 1.0)], "lid INT, k STRING, sec DOUBLE").select(
        "lid", "k", F.timestamp_seconds("sec").alias("ts")
    )

    def right_at(us_list):
        return _df(
            spark, [("k", us / 1e6) for us in us_list], "k STRING, sec DOUBLE"
        ).select("k", F.timestamp_seconds("sec").alias("ts"))

    r = right_at([999_900, 999_999, 1_000_000, 999_899, 500])
    out = range_count_join(
        left, r, ["k"], "ts", "ts", lower_us=-100, upper_us=0
    ).collect()
    assert out[0]["n_in_range"] == 2  # 999_900 and 999_999 only

    # Left row with zero matches must survive with count 0.
    out = range_count_join(
        left, right_at([5]), ["k"], "ts", "ts", lower_us=-100, upper_us=0
    ).collect()
    assert out[0]["n_in_range"] == 0


def test_range_count_join_duplicates_and_nulls(spark):
    from cocoindex_spark.operators.asof import range_count_join

    # Two IDENTICAL left rows: each must get its own (uncombined) count;
    # a left row with a NULL non-key column must still be restored.
    left = _df(
        spark,
        [(1, "k", 1.0), (1, "k", 1.0), (None, "k", 9.0)],
        "lid INT, k STRING, sec DOUBLE",
    ).select("lid", "k", F.timestamp_seconds("sec").alias("ts"))
    right = _df(
        spark, [("k", 0.9999), ("k", 0.9998)], "k STRING, sec DOUBLE"
    ).select("k", F.timestamp_seconds("sec").alias("ts"))
    out = range_count_join(
        left, right, ["k"], "ts", "ts", lower_us=-1000, upper_us=0
    ).collect()
    assert sorted(((r["lid"] or -1), r["n_in_range"]) for r in out) == [
        (-1, 0),  # NULL-lid row restored with zero hits
        (1, 2),
        (1, 2),  # duplicate got the same per-row count, not 4
    ]


def test_asof_equal_ts_right_ties_deterministic(spark):
    from cocoindex_spark.operators.asof import asof_join

    left = _df(spark, [(1, "k", 100)], "lid INT, k STRING, ts INT")
    right = _df(
        spark,
        [(10, "k", 50), (11, "k", 50), (12, "k", 50)],
        "rid INT, k STRING, ts INT",
    )
    picks = set()
    for _ in range(3):
        for n in (1, 3, 7):
            out = asof_join(left, right.repartition(n), ["k"], "ts", "ts").collect()
            picks.add(out[0]["r_rid"])
    assert len(picks) == 1  # same winner under every partitioning


def test_pii_redaction_and_counts(spark):
    from cocoindex_spark.operators.scrub import pii_counts, redact_pii

    rows = [
        (1, "mail me at jane.doe+x@example.co.uk or visit https://ex.com/a?b=1 now"),
        (2, "call +1 (555) 123-4567 from 10.0.0.1 please"),
        (3, "nothing sensitive here"),
    ]
    df = _df(spark, rows, "id INT, text STRING")
    counts = pii_counts(F.col("text"))
    out = df.select(
        "id",
        *[c.alias(n) for n, c in counts.items()],
        redact_pii(F.col("text")).alias("red"),
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["email"] == 1 and by_id[1]["url"] == 1
    assert "jane" not in by_id[1]["red"] and "<EMAIL>" in by_id[1]["red"]
    assert "ex.com" not in by_id[1]["red"] and "<URL>" in by_id[1]["red"]
    assert by_id[2]["phone"] == 1 and by_id[2]["ipv4"] == 1
    assert "<PHONE>" in by_id[2]["red"] and "<IP>" in by_id[2]["red"]
    assert by_id[3]["red"] == "nothing sensitive here"
    assert all(by_id[3][n] == 0 for n in ("url", "email", "phone", "ipv4"))


def test_normalize_text(spark):
    from cocoindex_spark.operators.scrub import normalize_text

    df = _df(spark, [(1, "  Hello\t\tWORLD \n again  ")], "id INT, text STRING")
    out = df.select(normalize_text(F.col("text")).alias("n")).collect()
    assert out[0]["n"] == "hello world again"


def test_scrub_cross_engine_on_synthetic_pii(spark):
    """The shipped documents contain no PII, so q36's oracle check is
    trivially zero-count; replicate the cross-engine comparison on rows
    that actually match each pattern."""
    import duckdb

    from cocoindex_spark.operators.scrub import (
        pii_counts,
        redact_pii,
        sql_pii_count,
        sql_redact,
    )

    rows = [
        (1, "a@b.io and c.d@e-f.org wrote https://x.y/z?a=1#f"),
        (2, "+44 20 7946 0958 vs 192.168.0.255 vs 1.2.3.4"),
        (3, "email@@double.com http://plain.net trailing"),
        (4, "edge: a@b.c a@b.cd 999-999-9999"),
    ]
    df = _df(spark, rows, "id INT, text STRING")
    counts = pii_counts(F.col("text"))
    spark_rows = {
        r["id"]: r
        for r in df.select(
            "id",
            *[c.alias(n) for n, c in counts.items()],
            redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql = f"""
      SELECT id, {sql_pii_count('url', 'text')} AS url,
             {sql_pii_count('email', 'text')} AS email,
             {sql_pii_count('phone', 'text')} AS phone,
             {sql_pii_count('ipv4', 'text')} AS ipv4,
             {sql_redact('text')} AS red
      FROM t
    """
    for rid, url, email, phone, ipv4, red in con.execute(sql).fetchall():
        s = spark_rows[rid]
        assert (s["url"], s["email"], s["phone"], s["ipv4"]) == (
            url,
            email,
            phone,
            ipv4,
        ), rid
        assert s["red"] == red, rid
