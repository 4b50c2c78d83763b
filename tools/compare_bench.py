#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. sf0.1 medians vs sf1 single-run):
prints per-query seconds and the scale ratio, sorted by ratio desc, and
flags queries whose ratio exceeds a threshold (default 10x)."""
import json
import os
import sys

def load(path):
    with open(path) as f:
        d = json.loads(f.read().strip())
    if "queries" not in d and "tail" in d:
        # driver BENCH_r{N}.json wraps the bench line in a "tail" field;
        # a truncated tail may hold partial lines, so parse defensively
        found = None
        for line in d["tail"].splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                cand = json.loads(line)
            except json.JSONDecodeError:
                continue  # line truncated mid-JSON by the tail window
            if "queries" in cand:
                found = cand
            elif "queries_file" in cand and found is None:
                found = cand
        if found is None:
            sys.exit(f"{path}: no bench line found in tail (truncated stdout?)")
        d = found
    if "queries" not in d and "queries_file" in d:
        # short summary line: per-query detail lives in the pointed-to file
        qf = d["queries_file"]
        if not os.path.isabs(qf):
            qf = os.path.join(os.path.dirname(os.path.abspath(path)), qf)
        try:
            with open(qf) as f:
                return json.loads(f.read().strip())
        except OSError:
            sys.exit(f"{path}: summary line points at missing {qf}")
    if "queries" not in d:
        sys.exit(f"{path}: no 'queries' field in bench JSON")
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
