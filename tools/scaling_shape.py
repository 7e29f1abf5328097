#!/usr/bin/env python3
"""Read BENCH_sf1 against the quiet sf0.1 bench: per-query scaling ratio.

At fixed parallelism a row-linear operator costs ~10x at 10x rows; a
constant-dominated one (dim builds, tiny outputs) much less. What this
hunts is SUPER-linear growth — the signature of a fan-out (candidate
pairs, window materialization, closure) that survived plan review.

Usage: scaling_shape.py BENCH_quiet_r9.json BENCH_sf1.json [threshold=10]
Prints queries sorted by ratio, flags > threshold.
"""
import json
import re
import sys

lo = json.loads(open(sys.argv[1]).read().strip().splitlines()[-1])
hi = json.loads(open(sys.argv[2]).read().strip().splitlines()[-1])
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

rows = []
for k, v in hi["queries"].items():
    base = lo["queries"].get(k)
    if base and base > 0:
        rows.append((v / base, k, base, v))
rows.sort(reverse=True)

flagged = [r for r in rows if r[0] > thr]
print(f"total {lo['value']}s -> {hi['value']}s "
      f"({hi['value']/lo['value']:.1f}x at 10x rows); "
      f"{len(flagged)} queries past {thr}x")
for ratio, k, base, v in rows[:25]:
    mark = " <-- SUPERLINEAR" if ratio > thr else ""
    print(f"  {ratio:6.1f}x  {k:8s} {base:7.2f}s -> {v:8.2f}s{mark}")
