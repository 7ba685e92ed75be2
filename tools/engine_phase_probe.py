"""Scale-probe the ENGINE pipeline phases at sf1 (r9 verdict item 5).

The sf1 query probe (tools/sf1_probe.py) covers the heaviest QUERIES,
but the pipe_cold/warm/edit/shape/delete phases — the reconcile/memo
core itself — had only ever run at sf0.1. This tool runs the full
bench_incremental phase suite (same code path as bench.py, including
its incremental-contract asserts: warm ⇒ 0 memo misses AND 0 content
rows loaded, edit ⇒ blast radius 1) at sf0.1 and at the synthesized
sf1 (10× docs; build it first with tools/sf1_probe.py), min-of-N per
scale, and records growth ratios. The 100-TB design claims:

- warm stays O(listing): growth ≈ the listing scan, not the corpus;
- edit blast radius stays 1 doc: growth bounded by reconcile overhead;
- cold/shape grow ≤~linearly (10× data ⇒ ≤~10× + fixed overhead).

Usage: python tools/engine_phase_probe.py [N=3]
Writes bench_results/engine_phase_sf1.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_incremental, code_hash  # noqa: E402
from cocoindex_spark.session import get_spark  # noqa: E402

SMALL = "/root/testdata/sf0.1"
BIG = "/tmp/sf1_synth"

PHASES = [
    "pipe_cold", "pipe_warm", "pipe_edit", "pipe_shape", "pipe_delete",
    "pipe_warm_cheap", "pipe_edit_cheap",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    if not os.path.isdir(os.path.join(BIG, "documents.parquet")):
        sys.exit(f"{BIG} missing — run tools/sf1_probe.py first to synthesize it")
    spark = get_spark("engine-phase-probe")
    spark.sparkContext.setLogLevel("ERROR")

    runs: dict[str, list[dict]] = {"sf0.1": [], "sf1": []}
    phase_ms: dict[str, dict] = {}
    for i in range(n):
        # interleave scales so shared-host noise hits both arms alike
        for scale, sf_dir in (("sf0.1", SMALL), ("sf1", BIG)):
            timings: dict = {}
            phases: dict = {}
            bench_incremental(spark, sf_dir, timings, phases)
            runs[scale].append(timings)
            phase_ms[scale] = phases  # keep the latest; mins come from timings
            print(f"round {i + 1}/{n} {scale}: "
                  + " ".join(f"{p}={timings.get(p, float('nan')):.2f}" for p in PHASES),
                  flush=True)

    mins = {
        scale: {p: min(t[p] for t in ts) for p in PHASES}
        for scale, ts in runs.items()
    }
    ratios = {p: round(mins["sf1"][p] / mins["sf0.1"][p], 2) for p in PHASES}
    out = {
        "n_per_scale": n,
        "docs": {"sf0.1": 5_000, "sf1": 50_000},
        "scale_factor": 10,
        "code_hash": code_hash(),
        "mins": mins,
        "sf1_over_sf01_ratio": ratios,
        "contract": "bench_incremental's asserts ran at BOTH scales: "
                    "warm memo_misses == 0 and loaded == 0, edit blast "
                    "radius 1, shape recomputes exactly 2 + cascades 1",
        "phase_ms_last_run": phase_ms,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "engine_phase_sf1.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"mins": mins, "ratios": ratios}, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
