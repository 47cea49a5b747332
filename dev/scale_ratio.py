#!/usr/bin/env python3
"""Per-query scaling-ratio table from two graft.Bench JSON lines.

Usage: python3 dev/scale_ratio.py <bench_small.json> <bench_big.json> [sf_ratio]

Reads the one-line JSON each file's last line holds (graft.Bench format:
{"metric":..., "queries":{name:sec,...}, "loadavg":[...]}), prints a
markdown table of per-query wall ratios big/small sorted descending, and
flags rows whose ratio exceeds the data ratio (default 10 = sf0.1->sf1):
those are the super-linear candidates the next round should inspect.

Sub-second small-side rows are noise-prone (JVM/planner constant cost
dominates); the flag column marks ratios computed on small < 0.5 s as
"(const-dominated)" rather than super-linear.
"""
import json
import sys


def load(path):
    # graft.Bench (r8+) prints two JSON lines: the full named-dict record
    # first, then a compact tail-safe array line. Prefer the last line
    # that carries the named "queries" dict.
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip().startswith("{")]
    named = [l for l in lines if '"queries"' in l]
    return json.loads((named or lines)[-1])


def main():
    small, big = load(sys.argv[1]), load(sys.argv[2])
    sf_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs, qb = small["queries"], big["queries"]
    rows = []
    for name in sorted(qb):
        if name not in qs:
            continue
        s, b = qs[name], qb[name]
        r = b / s if s > 0 else float("inf")
        rows.append((r, name, s, b))
    rows.sort(reverse=True)
    print(f"| query | {sf_ratio:g}x-small s | big s | ratio | flag |")
    print("|---|---|---|---|---|")
    n_super = 0
    for r, name, s, b in rows:
        if r <= sf_ratio:
            flag = ""
        elif s < 0.5:
            flag = "const-dominated"
        else:
            flag = "**SUPER-LINEAR**"
            n_super += 1
        print(f"| {name} | {s:.2f} | {b:.2f} | {r:.1f}x | {flag} |")
    tot_s = sum(qs[n] for _, n, _, _ in rows)
    tot_b = sum(b for _, _, _, b in rows)
    print(f"\ntotal small {tot_s:.1f}s  big {tot_b:.1f}s  "
          f"ratio {tot_b / tot_s:.2f}x  super-linear rows: {n_super}")
    print(f"loadavg small {small.get('loadavg')}  big {big.get('loadavg')}")


if __name__ == "__main__":
    main()
