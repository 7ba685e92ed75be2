"""Capture `explain("formatted")` output for named queries.

Writes plans/<round>/<query>_<label>.txt for each query — the
before/after plan evidence an optimization round commits alongside the
code (the judge checks plan claims against these files).

Usage:
    python tools/capture_plans.py <label> <query> [query ...] \
        [--sf-dir DIR] [--out-dir plans/r10] [--repo DIR]

``--repo`` lets the "before" plans be captured from a second checkout
of an earlier commit (its cocoindex_spark/ is put on sys.path instead
of this one; output still lands in THIS repo's --out-dir).
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("label")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out-dir", default=os.path.join(here, "plans", "r10"))
    ap.add_argument("--repo", default=here)
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from cocoindex_spark.queries import all_queries
    from cocoindex_spark.session import get_spark

    os.makedirs(args.out_dir, exist_ok=True)
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name in args.queries:
        spark.sparkContext.setJobDescription(f"plan-capture {name}")
        df = queries[name](spark, args.sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        out = os.path.join(args.out_dir, f"{name}_{args.label}.txt")
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
