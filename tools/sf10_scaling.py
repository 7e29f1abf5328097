#!/usr/bin/env python3
"""Per-query 10x scaling table: BENCH at sf10 vs linear-scaled sf1.

Usage: python3 tools/sf10_scaling.py <BENCH_sf10.json> <BENCH_sf1.json>
         [<BENCH_sf10_run2.json> ...]

Reads the bench artifacts (the one-line JSON the Bench main prints,
possibly with compressed short keys — decoded via BENCH_KEYS.md), takes
the per-query MIN across every sf10 run given, and prints a markdown
table of over-linear queries: over = t_sf10 / (10 * t_sf1). A query
~1.0 scales linearly with data; >2 is flagged (superlinear at one
decade). Queries missing from either artifact are listed separately —
silent truncation must never read as "covered everything".
"""
import json, re, sys

def legend():
    m = {}
    for line in open("BENCH_KEYS.md"):
        mm = re.match(r"\| (\S+) \| (\S+) \|", line)
        if mm:
            m[mm.group(1)] = mm.group(2)
    return m

def load(path, leg):
    txt = open(path).read().strip()
    # one-line artifacts: last stdout line; multi-line files: whole doc
    try:
        j = json.loads(txt)
    except json.JSONDecodeError:
        j = json.loads(txt.splitlines()[-1])
    qs = {leg.get(k, k): v for k, v in j.get("queries", {}).items()}
    return j, qs

def main():
    leg = legend()
    sf10_paths, sf1_path = sys.argv[1:2] + sys.argv[3:], sys.argv[2]
    _, sf1 = load(sf1_path, leg)
    merged = {}
    metas = []
    for p in sf10_paths:
        meta, qs = load(p, leg)
        metas.append((p, meta.get("value"), meta.get("contended", False)))
        for k, v in qs.items():
            merged[k] = min(v, merged.get(k, float("inf")))
    rows = []
    for k, t10 in sorted(merged.items()):
        t1 = sf1.get(k)
        if t1 and t1 > 0:
            rows.append((k, t10, t1, t10 / (10 * t1)))
    rows.sort(key=lambda r: -r[3])
    print("| query | sf10 s | sf1 s | over (t10/10*t1) |")
    print("|---|---|---|---|")
    for k, t10, t1, over in rows:
        flag = " **>2x**" if over > 2 else ""
        print(f"| {k} | {t10:.2f} | {t1:.2f} | {over:.2f}{flag} |")
    missing10 = sorted(set(sf1) - set(merged))
    missing1 = sorted(set(merged) - set(sf1))
    print(f"\nruns: {metas}")
    print(f"queries compared: {len(rows)}; >2x over-linear: "
          f"{sum(1 for r in rows if r[3] > 2)}")
    if missing10:
        print(f"in sf1 but MISSING from sf10 runs: {missing10}")
    if missing1:
        print(f"new at sf10 (no sf1 reading): {missing1}")

if __name__ == "__main__":
    main()
