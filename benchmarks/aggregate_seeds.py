"""Aggregate multi-seed flagship_e2e runs into mean +- spread tables.

VERDICT r3 item 2: few-step quality claims need error bars, not single-run
superlatives. Feed this the logs (or raw JSON) of >=2 `flagship_e2e.py
--seed k` runs; it extracts the final JSON object from each, groups the
sampler rows, and prints a markdown table of FD mean / min..max across
seeds plus the per-row median wall time (walls barely vary; FDs do).

Run: python benchmarks/aggregate_seeds.py /tmp/flagship_r4_seed*.log
"""
from __future__ import annotations

import json
import statistics
import sys


def load_results(path):
    """Return the LAST top-level JSON object in the file (the results dict
    flagship_e2e prints after all stderr training logs)."""
    text = open(path).read()
    start = text.rfind("\n{")
    if start < 0 and text.startswith("{"):
        start = 0
    if start < 0:
        raise ValueError(f"no JSON object found in {path}")
    return json.loads(text[start:])


def main(paths):
    runs = []
    for p in paths:
        r = load_results(p)
        runs.append(r)
        print(f"# {p}: seed {r.get('seed')}", file=sys.stderr)
    seeds = [r.get("seed") for r in runs]
    if len(set(seeds)) != len(seeds):
        print(f"WARNING: duplicate seeds {seeds}", file=sys.stderr)

    # Row keys = every dict-valued entry carrying an "fd" (sampler rows) in
    # the order they appear in the first run.
    keys = [k for k, v in runs[0].items()
            if isinstance(v, dict) and "fd" in v]
    print(f"\nSeeds: {seeds}  (train_steps="
          f"{runs[0].get('train_steps')})\n")
    print("| row | FD mean | FD min..max | spread | wall s (median) |")
    print("|---|---|---|---|---|")
    for k in keys:
        fds = [r[k]["fd"] for r in runs if k in r]
        walls = [r[k]["seconds"] for r in runs
                 if k in r and "seconds" in r[k]]
        if not fds:
            continue
        mean = statistics.mean(fds)
        lo, hi = min(fds), max(fds)
        wall = statistics.median(walls) if walls else float("nan")
        note = "" if len(fds) == len(runs) else f" ({len(fds)}/{len(runs)})"
        print(f"| {k}{note} | {mean:.1f} | {lo:.1f}..{hi:.1f} "
              f"| {hi - lo:.1f} | {wall:.2f} |")

    scalars = ("fd_random_baseline", "real_vs_real_fd",
               "infill_middle16_floor_real_vs_real")
    print()
    for k in scalars:
        vals = [r[k] for r in runs if k in r]
        if vals:
            print(f"{k}: " + ", ".join(f"{v:.2f}" for v in vals))
    gates = [r.get("mdn_gate") for r in runs if "mdn_gate" in r]
    if gates:
        print("mdn_gate: " + ", ".join(
            f"nll {g['heldout_nll']:.1f} vs gauss "
            f"{g['gauss_baseline_nll']:.1f} "
            f"({'pass' if g['passed'] else 'FAIL'}"
            f"{', +' + str(g['extensions']) + 'x ext' if g['extensions'] else ''}"
            f"{', +' + str(g.get('reinits', 0)) + 'x reinit' if g.get('reinits') else ''})"
            for g in gates))


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    main(sys.argv[1:])
