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

# pandas is unloadable on the incident host (HOST_INCIDENT.md) and a
# broken native stack dies with SIGBUS, which no try/except can catch
# — so, as in selfcheck.py, SELFCHECK_NO_PANDAS=1 skips the import
# entirely and every read goes through DuckDB. rows(path, cols)
# returns plain tuples either way; the union-find is backend-agnostic.
import os
if os.environ.get("SELFCHECK_NO_PANDAS"):
    pd = None
else:
    import pandas as pd
import duckdb


def _files(path):
    files = sorted(glob.glob(path) or glob.glob(f"{path}/*.parquet"))
    # a bare directory match (pandas reads those natively, DuckDB needs
    # the part files) expands to its parquet parts
    if len(files) == 1 and os.path.isdir(files[0]):
        files = sorted(glob.glob(f"{files[0]}/*.parquet"))
    assert files, f"no parquet at {path}"
    return files


def rows(path, cols):
    files = _files(path)
    if pd is not None:
        df = pd.concat([pd.read_parquet(f, columns=list(cols)) for f in files])
        return list(df[list(cols)].itertuples(index=False, name=None))
    con = duckdb.connect()
    collist = ", ".join('"%s"' % c for c in cols)
    return con.execute(
        f"SELECT {collist} FROM read_parquet({files!r})").fetchall()


sfdir, outdir = sys.argv[1], sys.argv[2]
edges = rows(f"{outdir}/ngram_jaccard", ("doc_a", "doc_b"))
print(f"[cc_check] {len(edges)} verified ngram_jaccard edges", flush=True)

parent = {}


def find(x):
    root = x
    while parent.get(root, root) != root:
        root = parent[root]
    while parent.get(x, x) != root:
        parent[x], x = root, parent[x]
    return root


for a, b in edges:
    ra, rb = find(a), find(b)
    if ra != rb:
        parent[max(ra, rb)] = min(ra, rb)

docs_in_edges = sorted({a for a, _ in edges} | {b for _, b in edges})
comp = {d: find(d) for d in docs_in_edges}

fails = 0

# --- dedup_cluster ---------------------------------------------------
expected = sorted((int(d), int(c)) for d, c in comp.items())
actual = sorted(rows(f"{outdir}/dedup_cluster", ("doc_id", "component_id")))
if actual == expected:
    print(f"OK   dedup_cluster ({len(actual)} rows, union-find over "
          f"verified edges)")
else:
    fails += 1
    print(f"FAIL dedup_cluster: expected {len(expected)}, got {len(actual)}")

# --- dedup_cluster_best ----------------------------------------------
if docs_in_edges:
    nchars = dict(rows(f"{sfdir}/documents.parquet", ("doc_id", "n_chars")))
    best = {}
    members = {}
    for d, c in comp.items():
        members[c] = members.get(c, 0) + 1
        key = (-int(nchars[d]), d)
        if c not in best or key < best[c][0]:
            best[c] = (key, d)
    expected = sorted((int(c), int(b[1]), int(nchars[b[1]]),
                       int(members[c])) for c, b in best.items())
else:
    expected = []
actual = sorted(rows(f"{outdir}/dedup_cluster_best",
                     ("component_id", "keeper_doc_id", "keeper_chars",
                      "n_members")))
if actual == expected:
    print(f"OK   dedup_cluster_best ({len(actual)} rows, union-find over "
          f"verified edges)")
else:
    fails += 1
    print(f"FAIL dedup_cluster_best: expected {len(expected)}, got {len(actual)}")

sys.exit(1 if fails else 0)
