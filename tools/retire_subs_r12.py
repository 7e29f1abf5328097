#!/usr/bin/env python3
"""Round-12 CORRECTNESS_sf10.json update: retire the round-10/11 numpy
substitute checks whose queries now pass a DIRECT DuckDB oracle at
sf10, sourcing each new verdict from its committed gate log.

- dedup_embedding / semdedup / knn_graph / label_noise: the sweep runs
  at dense sign-LSH width (EmbeddingScale, r=16) and now DUMPS the
  oracle SQL at that geometry (SparkEntry.embeddingOracleSqlAt), so
  tools/selfcheck.py compares them like any other oracle
  (GATE_r12_sf10_embedding.log).
- ann_ivf: oracle assignment re-expressed as a streaming aggregate
  (no windowed 800M-row materialization) — direct oracle passes
  (GATE_r12_sf10_ann_ivf.log).
- parts_skyline: oracle re-expressed as the O(n log n) closed form —
  direct oracle passes (GATE_r12_sf10_parts_skyline.log).
- basket_pairs: direct oracle attempted with 90GB/spill settings —
  verdict taken from GATE_r12_sf10_basket_pairs.log when present.

Run from the repo root after the gates; rewrites CORRECTNESS_sf10.json
in place (tmp+rename), preserving every other row.
"""
import json, os, re, sys

NOTES = {
    "dedup_embedding": "direct DuckDB oracle at the sweep's dense sign-LSH "
        "geometry (r=16; oracle SQL dumped by EmbeddingScale via "
        "SparkEntry.embeddingOracleSqlAt, hyperplane literals regenerated "
        "at that width). GATE_r12_sf10_embedding.log",
    "semdedup": "direct DuckDB oracle at r=16 (recursive-CTE component "
        "closure, 373s). GATE_r12_sf10_embedding.log",
    "knn_graph": "direct DuckDB oracle at r=16. GATE_r12_sf10_embedding.log",
    "label_noise": "direct DuckDB oracle at r=16. GATE_r12_sf10_embedding.log",
    "ann_ivf": "direct DuckDB oracle (assignment as streaming "
        "MIN((-cos,cell) struct) aggregate — no windowed 800M-row "
        "materialization; 279s). GATE_r12_sf10_ann_ivf.log",
    "parts_skyline": "direct DuckDB oracle (O(n log n) closed-form skyline "
        "SQL replaced the O(n^2) NOT EXISTS). GATE_r12_sf10_parts_skyline.log",
    "basket_pairs": "direct DuckDB oracle (90GB memory + spill; the r10 "
        "40-min abort was a budget, not a wall). "
        "GATE_r12_sf10_basket_pairs.log",
}
LOGS = {
    "dedup_embedding": "GATE_r12_sf10_embedding.log",
    "semdedup": "GATE_r12_sf10_embedding.log",
    "knn_graph": "GATE_r12_sf10_embedding.log",
    "label_noise": "GATE_r12_sf10_embedding.log",
    "ann_ivf": "GATE_r12_sf10_ann_ivf.log",
    "parts_skyline": "GATE_r12_sf10_parts_skyline.log",
    "basket_pairs": "GATE_r12_sf10_basket_pairs.log",
}

d = json.load(open("CORRECTNESS_sf10.json"))
upgraded, kept = [], []
for q, log in LOGS.items():
    row = None
    if os.path.exists(log):
        for line in open(log, errors="replace"):
            m = re.match(rf"OK\s+{q}\s*\((\d+) rows", line)
            if m:
                row = int(m.group(1))
    if row is None:
        kept.append(q)
        continue
    d["queries"][q] = {"ok": True, "rows": row,
                       "check": "duckdb-oracle", "note": NOTES[q]}
    upgraded.append(q)

# a direct check is one whose check field STARTS WITH a direct-compare
# method name; substring-matching "duckdb" anywhere would misclassify a
# substitute row whose free-text note merely mentions duckdb
d["substitute_checks"] = sum(
    1 for v in d["queries"].values()
    if not v.get("check", "duckdb-oracle")
          .startswith(("duckdb-oracle", "duckdb-multiset")))
d["round12_note"] = (
    "Round 12 retired the numpy substitute checks for "
    + ", ".join(upgraded) + " into direct DuckDB oracles regenerated on "
    "this host (see each row's gate log). Remaining substitutes are the "
    "pandas-free DuckDB-backed derivations (cc_check/replica0) plus any "
    "row still listing a non-duckdb check."
    + (f" Not upgraded this round: {', '.join(kept)}." if kept else ""))

tmp = "CORRECTNESS_sf10.json.tmp"
json.dump(d, open(tmp, "w"), indent=1)
os.replace(tmp, "CORRECTNESS_sf10.json")
print(f"upgraded: {upgraded}; kept as substitute: {kept}; "
      f"substitute_checks={d['substitute_checks']}")
