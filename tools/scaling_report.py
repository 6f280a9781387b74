#!/usr/bin/env python3
"""Cross-scale growth-factor report over three same-binary Bench runs.

Usage: python3 tools/scaling_report.py <sf0.001.json> <sf0.01.json> <sf0.1.json>

Each input is a Bench BENCH_FULL-format JSON line ({"queries": {name: sec}}).
Prints a markdown table of per-query wall times and the sf0.01 -> sf0.1
growth factor (10x data). Reading the factor honestly:

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
    a, b, c = (load(p) for p in sys.argv[1:4])
    qa, qb, qc = a["queries"], b["queries"], c["queries"]
    names = sorted(set(qa) & set(qb) & set(qc))
    rows = []
    for n in names:
        f_big = qc[n] / qb[n] if qb[n] > 0 else float("inf")
        rows.append((n, qa[n], qb[n], qc[n], f_big))
    rows.sort(key=lambda r: -r[4])
    print("| query | sf0.001 s | sf0.01 s | sf0.1 s | growth sf0.01→sf0.1 (10× data) |")
    print("|---|---|---|---|---|")
    for n, t1, t2, t3, f in rows:
        print(f"| {n} | {t1:.3f} | {t2:.3f} | {t3:.3f} | {f:.1f}× |")
    tot = (sum(qa[n] for n in names), sum(qb[n] for n in names),
           sum(qc[n] for n in names))
    print(f"| **total ({len(names)} queries)** | {tot[0]:.1f} | {tot[1]:.1f} "
          f"| {tot[2]:.1f} | {tot[2]/tot[1]:.1f}× |")
    over = [n for n, _, _, _, f in rows if f > 10]
    print()
    print(f"Queries above 10× across the decade: {over or 'none'}")


if __name__ == "__main__":
    main()
