"""Pool per-query MINs across bench runs — refusing to mix code states.

Shared-host contention inflates single runs 13-65% with the inflated
queries rotating run-to-run, so round-over-round comparison uses the
per-query min across N runs (bench_results/r7..r9_quiet_estimate.json).
The r8 judge found one estimate had pooled a min from a mid-session
broken build; r9 added git-SHA stamps, but a dirty tree makes the SHA
ambiguous. bench.py now stamps every run with code_hash (a content
hash of the source tree); this script groups runs by that hash and
pools mins ONLY within one group.

Usage:
    python tools/bench_estimate.py bench_results/bench_2026*.json \
        [--baseline bench_results/r9_quiet_estimate.json] [--out FILE]

Picks the code_hash with the most runs (ties → the most recent run's
hash) and errors if any named run lacks a hash unless --allow-unhashed
is passed (then unhashed runs are dropped, loudly). With --baseline,
also prints the common-query-set totals vs the baseline's mins.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+")
    ap.add_argument("--baseline", help="prior estimate JSON with a 'mins' dict")
    ap.add_argument("--out", help="write the estimate JSON here")
    ap.add_argument("--allow-unhashed", action="store_true")
    args = ap.parse_args()

    runs = []
    for path in args.runs:
        with open(path) as f:
            payload = json.load(f)
        h = payload.get("code_hash")
        if h is None:
            if not args.allow_unhashed:
                sys.exit(
                    f"{path}: no code_hash stamp — re-run bench.py or pass "
                    "--allow-unhashed to drop it"
                )
            print(f"DROPPED (no code_hash): {path}", file=sys.stderr)
            continue
        runs.append((path, h, payload))
    if not runs:
        sys.exit("no usable runs")

    by_hash: dict[str, list] = {}
    for path, h, payload in runs:
        by_hash.setdefault(h, []).append((path, payload))
    # most runs wins; tie → the hash of the lexically-latest run file
    # (bench files are timestamp-named)
    best = max(by_hash, key=lambda h: (len(by_hash[h]), max(p for p, _ in by_hash[h])))
    pool = by_hash[best]
    dropped = [p for h, lst in by_hash.items() if h != best for p, _ in lst]
    for p in dropped:
        print(f"DROPPED (code_hash mismatch vs pooled {best}): {p}", file=sys.stderr)

    mins: dict[str, float] = {}
    for _, payload in pool:
        for q, sec in payload["queries"].items():
            mins[q] = min(mins.get(q, sec), sec)

    est = {
        "code_hash": best,
        "n_runs": len(pool),
        "runs": sorted(p for p, _ in pool),
        "dropped_runs": sorted(dropped),
        "mins": {q: mins[q] for q in sorted(mins)},
        "total_all": round(sum(mins.values()), 3),
    }
    if args.baseline:
        with open(args.baseline) as f:
            base = json.load(f)
        bmins = base.get("mins") or base.get("queries")
        common = sorted(set(mins) & set(bmins))
        ours = round(sum(mins[q] for q in common), 3)
        theirs = round(sum(bmins[q] for q in common), 3)
        est["baseline"] = {
            "path": args.baseline,
            "n_common": len(common),
            "common_total": ours,
            "baseline_common_total": theirs,
            "delta_pct": round(100.0 * (ours - theirs) / theirs, 2) if theirs else None,
            "only_here": sorted(set(mins) - set(bmins)),
            "only_baseline": sorted(set(bmins) - set(mins)),
        }
    text = json.dumps(est, indent=1, sort_keys=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
