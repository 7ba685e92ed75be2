"""Local replica of the driver's correctness gate.

Runs each registered query on Spark and its DuckDB oracle on the same
parquet tables, then compares row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cocoindex_spark.queries import all_oracles, all_queries
from cocoindex_spark.session import TABLES, get_spark


def norm_cell(v):
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(repr(x) for x in t))


def main():
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if a != "--vanilla"]
    vanilla = "--vanilla" in argv
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = [a for a in args if not os.path.isdir(a)]
    queries = all_queries()
    oracles = all_oracles()
    if names:
        queries = {k: v for k, v in queries.items() if k in names}

    if vanilla:
        # Driver-parity preflight: an untuned session (default shuffle
        # partitions, no AQE/broadcast/Arrow tweaks) — the environment
        # the external correctness runner uses. Only the nanos conf is
        # set (events.parquet is unreadable without it).
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("oracle-check-vanilla")
            .master("local[8]")
            .config("spark.sql.legacy.parquet.nanosAsLong", "true")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = n_rows_only = 0
    results: dict[str, dict] = {}
    for name, fn in sorted(queries.items()):
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            results[name] = {"status": "fail", "why": "spark error"}
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows")
            n_rows_only += 1
            results[name] = {"status": "rows_only", "rows": len(srows)}
            continue
        try:
            # HUGEINT preflight: DuckDB widens uncast SUM(BIGINT) to
            # HUGEINT, which hash-mismatches Spark's BIGINT in the
            # driver gate even when values are identical (the r1
            # q06/q43/q71 and r2 q28 bug class). Catch it by type,
            # permanently.
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            huge = [(c, t) for c, t, *_ in desc if "HUGEINT" in str(t).upper()]
            if huge:
                print(f"FAIL {name}: HUGEINT oracle columns {huge} — add CAST(... AS BIGINT)")
                n_fail += 1
                results[name] = {"status": "fail", "why": "hugeint"}
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            results[name] = {"status": "fail", "why": "duckdb error"}
            continue
        sc, sr = norm_rows(scols, [tuple(r) for r in srows])
        dc, dr = norm_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_fail += 1
            results[name] = {"status": "fail", "why": "columns"}
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            results[name] = {"status": "fail", "why": "rowcount",
                             "spark_rows": len(sr), "oracle_rows": len(dr)}
            continue
        bad = None
        for a, b in zip(sr, dr):
            if a != b:
                ok = len(a) == len(b)
                if ok:
                    for x, y in zip(a, b):
                        if isinstance(x, float) and isinstance(y, float):
                            if not (x == y or abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y))):
                                ok = False
                                break
                        elif x != y:
                            ok = False
                            break
                if not ok:
                    bad = (a, b)
                    break
        if bad:
            print(f"FAIL {name}: first diff\n  spark={bad[0]}\n  duck ={bad[1]}")
            n_fail += 1
            results[name] = {"status": "fail", "why": "value diff"}
        else:
            exact = sr == dr
            print(f"PASS {name}: {len(sr)} rows" + ("" if exact else " (float-tol)"))
            n_pass += 1
            results[name] = {"status": "pass", "rows": len(sr), "exact": exact}
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump(
                {"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                 "n_rows_only": n_rows_only, "results": results},
                f, indent=1, sort_keys=True,
            )
        print(f"wrote {json_out}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
