#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. sf0.1 medians vs sf1 single-run):
prints per-query seconds and the scale ratio, sorted by ratio desc, and
flags queries whose ratio exceeds a threshold (default 10x)."""
import json
import sys

def load(path):
    with open(path) as f:
        d = json.loads(f.read().strip())
    if "queries" not in d and "tail" in d:
        # driver BENCH_r{N}.json wraps the bench line in a "tail" field
        for line in d["tail"].splitlines():
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)
    return d

def main():
    a_path, b_path = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    a, b = load(a_path), load(b_path)
    qa, qb = a["queries"], b["queries"]
    rows = []
    for k in sorted(set(qa) & set(qb)):
        va, vb = qa[k], qb[k]
        if isinstance(va, dict) or isinstance(vb, dict):
            rows.append((float("inf"), k, va, vb))
            continue
        rows.append((vb / va if va > 0 else float("inf"), k, va, vb))
    rows.sort(reverse=True)
    flagged = 0
    print(f"{'query':28s} {'a(s)':>8s} {'b(s)':>8s} {'ratio':>7s}")
    for ratio, k, va, vb in rows:
        mark = " <-- FLAG" if ratio > thresh else ""
        if mark:
            flagged += 1
        if isinstance(va, dict) or isinstance(vb, dict):
            print(f"{k:28s} ERR a={va} b={vb}{mark}")
        else:
            print(f"{k:28s} {va:8.3f} {vb:8.3f} {ratio:6.1f}x{mark}")
    ta = a.get("value")
    tb = b.get("value")
    print(f"\ntotal: a={ta}s b={tb}s ratio={tb/ta:.1f}x  flagged(>{thresh}x): {flagged}")

if __name__ == "__main__":
    main()
