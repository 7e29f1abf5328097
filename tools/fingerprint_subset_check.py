#!/usr/bin/env python3
"""Substitute cross-check for doc_fingerprint at synthetic scale.

The DuckDB oracle for doc_fingerprint is a per-character recursive CTE
(recursion depth = max text length, each step re-joins the full
char-list table) — quadratic, and past host memory at sf1. The
ScaleUp data makes a cheaper exact check possible: replica 0 of
`documents` is byte-identical to the source scale factor (same
doc_ids, same text), so the engine's sf1syn fingerprints restricted
to replica-0 doc_ids must equal the already-oracle-verified source-SF
output row for row, and the full output must carry exactly factor×
the source rows (every replica fingerprints independently).

Usage: fingerprint_subset_check.py <src_out> <syn_out> [factor=10] [K=100000000]
"""
import sys, glob
import pandas as pd

src_out, syn_out = sys.argv[1], sys.argv[2]
factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
K = int(sys.argv[4]) if len(sys.argv) > 4 else 100000000

def load(d):
    return pd.concat([pd.read_parquet(f)
                      for f in sorted(glob.glob(f"{d}/doc_fingerprint/*.parquet"))])

src = load(src_out).sort_values("doc_id").reset_index(drop=True)
syn = load(syn_out)
rep0 = syn[syn.doc_id < K].sort_values("doc_id").reset_index(drop=True)

ok = True
if len(syn) != factor * len(src):
    print(f"FAIL rows: syn={len(syn)} != {factor}x src={len(src)}"); ok = False
if len(rep0) != len(src):
    print(f"FAIL replica0 rows: {len(rep0)} != {len(src)}"); ok = False
elif not rep0.equals(src):
    neq = (rep0 != src).any(axis=1)
    print(f"FAIL replica0 values: {int(neq.sum())} differing rows, first:\n"
          f"{rep0[neq].head(3)}\nvs\n{src[neq].head(3)}"); ok = False
if ok:
    print(f"OK   doc_fingerprint replica-0 subset: {len(src)} rows exact-equal "
          f"to oracle-verified source SF; total rows = {factor}x")
sys.exit(0 if ok else 1)
