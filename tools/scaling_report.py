#!/usr/bin/env python3
"""Cross-scale growth-factor report over same-binary Bench runs.

Usage: python3 tools/scaling_report.py <sf0.001.json> <sf0.01.json> <sf0.1.json> [<sf1.json>]

Each input is a Bench BENCH_FULL-format JSON line ({"queries": {name: sec}}).
Prints a markdown table of per-query wall times and the growth factor
across the LAST decade given (sf0.01 -> sf0.1 for three inputs,
sf0.1 -> sf1 for four). Reading the factor honestly:

  - factor ~ 1    : overhead-bound at these scales (scheduling + JIT floor,
                    a few hundred ms, dominates the data term). Says nothing
                    yet about asymptotics; the plan audit does.
  - factor <= ~10 : at-most-linear in the data across this decade.
  - factor > 10   : super-linear across this decade -- either a genuinely
                    quadratic semantic (self-joins on 10x rows = 100x pairs,
                    bounded at real scale by their blocking/banding design)
                    or a plan problem. Anything here without a documented
                    quadratic semantic needs a plan-level explanation.
"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.loads(f.read())


def main():
    paths = sys.argv[1:]
    runs = [load(p) for p in paths]
    labels = ["sf0.001", "sf0.01", "sf0.1", "sf1"][: len(runs)]
    qs = [r["queries"] for r in runs]
    names = sorted(set.intersection(*(set(q) for q in qs)))
    rows = []
    for n in names:
        f_big = (qs[-1][n] / qs[-2][n]) if qs[-2][n] > 0 else float("inf")
        rows.append((n, [q[n] for q in qs], f_big))
    rows.sort(key=lambda r: -r[2])
    hdr_cols = " | ".join(f"{l} s" for l in labels)
    print(f"| query | {hdr_cols} | growth {labels[-2]}→{labels[-1]} "
          "(10× data) |")
    print("|---" * (len(labels) + 2) + "|")
    for n, ts, f in rows:
        cells = " | ".join(f"{t:.3f}" for t in ts)
        print(f"| {n} | {cells} | {f:.1f}× |")
    tots = [sum(q[n] for n in names) for q in qs]
    cells = " | ".join(f"{t:.1f}" for t in tots)
    print(f"| **total ({len(names)} queries)** | {cells} "
          f"| {tots[-1]/tots[-2]:.1f}× |")
    over = [n for n, _, f in rows if f > 10]
    print()
    print(f"Queries above 10× across the last decade: {over or 'none'}")


if __name__ == "__main__":
    main()
