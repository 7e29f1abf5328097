#!/usr/bin/env python3
"""Derivation check for `dedup_cluster` / `dedup_cluster_best` at
scales where the DuckDB oracle is infeasible: the oracle's recursive
transitive closure re-materializes its inlined edge pipeline per
iteration and spills to death at sf10, but its EDGE SET is exactly the
`ngram_jaccard` output — which the sweep verifies independently
against DuckDB (hash-equal) before this tool runs. Given verified
edges, the rest of both queries is a connected-components + keeper
derivation this tool replays with a union-find:

- dedup_cluster: (doc_id, component_id = min doc_id reachable),
  one row per doc APPEARING IN EDGES (the oracle seeds reach FROM
  edges, so isolated docs are absent).
- dedup_cluster_best: per component, keeper = member with max
  n_chars (doc_id tiebreak), member count — n_chars joined from the
  documents table.

Usage: cc_check.py <sfdir> <outdir>
Validate against a DuckDB-verified outdir at a small SF first.
"""
import glob
import sys

import pandas as pd


def read_any(path, columns=None):
    files = sorted(glob.glob(path) or glob.glob(f"{path}/*.parquet"))
    assert files, f"no parquet at {path}"
    return pd.concat([pd.read_parquet(f, columns=columns) for f in files])


sfdir, outdir = sys.argv[1], sys.argv[2]
edges = read_any(f"{outdir}/ngram_jaccard")[["doc_a", "doc_b"]]
print(f"[cc_check] {len(edges)} verified ngram_jaccard edges", flush=True)

parent = {}


def find(x):
    root = x
    while parent.get(root, root) != root:
        root = parent[root]
    while parent.get(x, x) != root:
        parent[x], x = root, parent[x]
    return root


for a, b in edges.itertuples(index=False, name=None):
    ra, rb = find(a), find(b)
    if ra != rb:
        parent[max(ra, rb)] = min(ra, rb)

docs_in_edges = sorted(set(edges.doc_a) | set(edges.doc_b))
comp = {d: find(d) for d in docs_in_edges}

fails = 0

# --- dedup_cluster ---------------------------------------------------
expected = sorted((int(d), int(c)) for d, c in comp.items())
got = read_any(f"{outdir}/dedup_cluster")
actual = sorted(map(tuple, got[["doc_id", "component_id"]]
                    .itertuples(index=False, name=None)))
if actual == expected:
    print(f"OK   dedup_cluster ({len(actual)} rows, union-find over "
          f"verified edges)")
else:
    fails += 1
    print(f"FAIL dedup_cluster: expected {len(expected)}, got {len(actual)}")

# --- dedup_cluster_best ----------------------------------------------
if docs_in_edges:
    nchars = read_any(f"{sfdir}/documents.parquet",
                      columns=["doc_id", "n_chars"]).set_index("doc_id")
    best = {}
    members = {}
    for d, c in comp.items():
        members[c] = members.get(c, 0) + 1
        key = (-int(nchars.loc[d, "n_chars"]), d)
        if c not in best or key < best[c][0]:
            best[c] = (key, d)
    expected = sorted((int(c), int(b[1]), int(nchars.loc[b[1], "n_chars"]),
                       int(members[c])) for c, b in best.items())
else:
    expected = []
got = read_any(f"{outdir}/dedup_cluster_best")
actual = sorted(map(tuple,
                    got[["component_id", "keeper_doc_id", "keeper_chars",
                         "n_members"]].itertuples(index=False, name=None)))
if actual == expected:
    print(f"OK   dedup_cluster_best ({len(actual)} rows, union-find over "
          f"verified edges)")
else:
    fails += 1
    print(f"FAIL dedup_cluster_best: expected {len(expected)}, got {len(actual)}")

sys.exit(1 if fails else 0)
