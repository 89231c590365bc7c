#!/usr/bin/env python3
"""S5 persist-strategy A/B (VERDICT r4 next#3).

Runs the checkpointed pipeline (bench.py --phase-only) with each
refine_work_persist strategy (deser = current default, ser, off) at the
requested parallelism levels, interleaved so host-load phases hit every
cell, and prints a per-strategy table of the candidate_pairs stage wall
plus the 2->8 efficiency per strategy.

Usage: python scripts/ab_refine_persist.py [reps] [levels...]
Defaults: reps=2, levels=8 (screening). Pass "2 8" for the efficiency run.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
STRATS = tuple(
    os.environ.get("SPARK_GRAFT_AB_STRATS", "deser,ser,off").split(",")
)


def run_child(cpus: int, strat: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_REFINE_PERSIST=strat,
    )
    out = subprocess.run(
        [sys.executable, BENCH, "--phase-only"],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [
        ln for ln in out.stdout.splitlines() if ln.startswith("PHASE_RESULT ")
    ]
    if not line:
        sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
        raise SystemExit(f"child local[{cpus}] {strat} produced no result")
    return json.loads(line[0].removeprefix("PHASE_RESULT "))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    levels = [int(a) for a in sys.argv[2:]] or [8]
    samples: dict[tuple[int, str], list[dict]] = {
        (c, s): [] for c in levels for s in STRATS
    }
    for rep in range(reps):
        for cpus in levels:
            for strat in STRATS:
                res = run_child(cpus, strat)
                samples[(cpus, strat)].append(res)
                sys.stderr.write(
                    f"[ab] rep {rep + 1}/{reps} local[{cpus}] {strat}: "
                    f"total {res['wall_sec']}s "
                    f"S5 {res['stages'].get('candidate_pairs')}s\n"
                )
    med = {}
    for key, runs in samples.items():
        ordered = sorted(runs, key=lambda r: r["stages"]["candidate_pairs"])
        med[key] = ordered[len(ordered) // 2]
    result = {
        "metric": "s5_refine_persist_ab",
        "reps": reps,
        "levels": levels,
        "s5_wall_median": {
            f"local{c}_{s}": med[(c, s)]["stages"]["candidate_pairs"]
            for c in levels
            for s in STRATS
        },
        "s5_wall_all": {
            f"local{c}_{s}": [
                r["stages"]["candidate_pairs"] for r in samples[(c, s)]
            ]
            for c in levels
            for s in STRATS
        },
        "total_wall_median": {
            f"local{c}_{s}": med[(c, s)]["wall_sec"]
            for c in levels
            for s in STRATS
        },
        "n_clusters": {
            f"local{c}_{s}": med[(c, s)]["n_clusters"]
            for c in levels
            for s in STRATS
        },
    }
    if set(levels) >= {2, 8}:
        result["s5_efficiency_2_to_8"] = {
            s: round(
                med[(2, s)]["stages"]["candidate_pairs"]
                / (4.0 * med[(8, s)]["stages"]["candidate_pairs"]),
                3,
            )
            for s in STRATS
        }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
