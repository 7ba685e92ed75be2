"""A/B the r9 merge_apply fusion on the pipe phases (r9 verdict #1).

Round 9 fused mixed-sync upserts + deletes into ONE bucket rewrite per
table (sink merge_apply + tracking merge_apply) and killed the
read-back delete mapping. All 15 r9 bench runs landed in a contended
window, so whether the fusion is performance-neutral on the
delete-bearing pipe phases was asserted, not shown. This tool settles
it: in ONE Spark session it interleaves full bench_incremental runs
with COCO_FUSE_MERGE_APPLY=1 (fused, the shipping path) and =0 (the
r8 two-pass upsert-then-delete shape), min-of-N per arm, and writes
the per-phase table to bench_results/ab_merge_apply.json.

Interleaving (A,B,A,B,...) makes the two arms share whatever noise the
window carries; per-phase MIN per arm is the contention-robust
estimator (see bench_results/r7_quiet_estimate.json methodology).

Usage:
    python tools/ab_merge_apply.py [N_per_arm] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_incremental, code_hash  # noqa: E402
from cocoindex_spark.session import get_spark  # noqa: E402

PHASES = [
    "pipe_cold", "pipe_warm", "pipe_edit", "pipe_shape", "pipe_delete",
    "pipe_warm_cheap", "pipe_edit_cheap",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("ab-merge-apply")
    spark.sparkContext.setLogLevel("ERROR")

    runs: dict[str, list[dict]] = {"fused": [], "two_pass": []}
    phase_ms: dict[str, list[dict]] = {"fused": [], "two_pass": []}
    for i in range(n):
        for arm, flag in (("fused", "1"), ("two_pass", "0")):
            os.environ["COCO_FUSE_MERGE_APPLY"] = flag
            timings: dict = {}
            phases: dict = {}
            bench_incremental(spark, sf_dir, timings, phases)
            runs[arm].append(timings)
            phase_ms[arm].append(phases)
            print(f"round {i + 1}/{n} {arm}: "
                  + " ".join(f"{p}={timings.get(p, float('nan')):.2f}" for p in PHASES),
                  flush=True)
    os.environ.pop("COCO_FUSE_MERGE_APPLY", None)

    mins = {
        arm: {p: min(t[p] for t in ts) for p in PHASES}
        for arm, ts in runs.items()
    }
    # engine-phase breakdown at each arm's best pipe_delete run: where
    # inside the sync the time went (sink_apply / tracking_commit are
    # the phases the fusion touches)
    detail = {}
    for arm in runs:
        best = min(range(n), key=lambda i: runs[arm][i]["pipe_delete"])
        detail[arm] = {
            p: phase_ms[arm][best].get(p, {}) for p in ("pipe_shape", "pipe_delete")
        }
    out = {
        "n_per_arm": n,
        "sf_dir": sf_dir,
        "code_hash": code_hash(),
        "interleaved": True,
        "mins": mins,
        "delta_fused_minus_two_pass": {
            p: round(mins["fused"][p] - mins["two_pass"][p], 3) for p in PHASES
        },
        "best_run_phase_ms": detail,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "ab_merge_apply.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["mins"], indent=1))
    print("delta (fused - two_pass):",
          json.dumps(out["delta_fused_minus_two_pass"]))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
