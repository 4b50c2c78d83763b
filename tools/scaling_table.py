#!/usr/bin/env python3
"""Emit the three-decade scaling table (markdown) from bench artifacts.

Usage: scaling_table.py SF1_JSON SF10_JSON [THRESH=15] [TOP=25]

Prints per-query sf1 and sf10 seconds and the 10x ratio, sorted by ratio
descending (top TOP rows), plus a flagged section of every query whose
sf10/sf1 ratio exceeds THRESH — the superlinear-suspect set the round-9
verdict asks to be empty or declared. Queries measured with a single run
(the artifact's "runs_once" list) are marked.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read().strip())


def main():
    sf1, sf10 = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    top = int(sys.argv[4]) if len(sys.argv) > 4 else 25
    q1, q10 = sf1["queries"], sf10["queries"]
    once = set(sf10.get("runs_once", []))
    rows, errs = [], []
    for k in sorted(set(q1) & set(q10)):
        a, b = q1[k], q10[k]
        if isinstance(a, dict) or isinstance(b, dict):
            errs.append((k, a, b))
            continue
        if a == 0:
            # a 0-second sf1 reading is a measurement artifact, not scaling
            # behavior — route it to ERRORS instead of an infinite ratio
            errs.append((k, a, b))
            continue
        rows.append((b / a, k, a, b))
    rows.sort(reverse=True)
    ratios = sorted(r for r, *_ in rows)
    med = ratios[len(ratios) // 2] if ratios else float("nan")
    print(f"| query (sf1 -> sf10) | sf1 s | sf10 s | 10x ratio |")
    print(f"|---|---|---|---|")
    for ratio, k, a, b in rows[:top]:
        mark = " (1 run)" if k in once else ""
        print(f"| {k}{mark} | {a:.2f} | {b:.2f} | {ratio:.1f}x |")
    print()
    print(f"n={len(rows)} shared queries; median 10x ratio = {med:.2f}x; "
          f"sf1 total {sf1['value']} s, sf10 total {sf10['value']} s")
    flagged = [(r, k, a, b) for r, k, a, b in rows if r > thresh]
    if flagged:
        print(f"\nFLAGGED (> {thresh:g}x):")
        for ratio, k, a, b in flagged:
            print(f"  {k}: {a:.2f} -> {b:.2f} s ({ratio:.1f}x)")
    else:
        print(f"\nNo query exceeds {thresh:g}x.")
    if errs:
        print("\nERRORS:")
        for k, a, b in errs:
            print(f"  {k}: sf1={a} sf10={b}")


if __name__ == "__main__":
    main()
