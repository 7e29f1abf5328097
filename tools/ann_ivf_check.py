#!/usr/bin/env python3
"""Independent numpy replay of the `ann_ivf` query for scales where
the DuckDB oracle is infeasible: the oracle assigns every vector to
its nearest centroid via `c CROSS JOIN cent` — at sf10 that is
200k x 4000 rows each carrying two DOUBLE[64] lists (~800 GB of
intermediate), which DuckDB spills to death. The DEFINITION is
engine-checked at sf0.01/sf0.1/sf1 by the normal gate; this replays
it with a blocked GEMM:

- centroids = vectors with vec_id % 50 = 0 (cell_id = vec_id),
- assignment = argmax cosine, ties to the smallest cell_id; any
  cosine within 1e-9 of the winner is replayed with the exact
  index-ordered float64 MAC (graft.functions.VectorCosine) before
  the argmax is trusted,
- probes = vec_id < 10, top-2 cells each (same tie rule),
- scored pairs' cosines are ALL computed with the exact sequential
  MAC (few thousand pairs), ranked (cos DESC, neighbor_id), top-5,
  ROUND(cos, 4) half-up on the shortest repr.

Usage: ann_ivf_check.py <sfdir> <outdir>
Validate first against a DuckDB-oracle-verified outdir (sf0.01/sf0.1).
"""
import glob
import math
import sys
from decimal import Decimal, ROUND_HALF_UP

import numpy as np
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
GUARD = 1e-9


def round4(x):
    return float(Decimal(repr(float(x)))
                 .quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


def seq_cosine(a32, b32):
    dot = na = nb = 0.0
    for x, y in zip(a32.tolist(), b32.tolist()):
        dot += x * y
        na += x * x
        nb += y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def read_parquet_any(path, columns=None):
    files = sorted(glob.glob(path) or glob.glob(f"{path}/*.parquet"))
    assert files, f"no parquet at {path}"
    return pd.concat([pd.read_parquet(f, columns=columns) for f in files])


df = read_parquet_any(f"{sfdir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
df = df.sort_values("vec_id").reset_index(drop=True)
vec_ids = df["vec_id"].to_numpy()
E32 = np.stack(df["embedding"].to_numpy())
E = E32.astype(np.float64)
n = len(vec_ids)
norms = np.sqrt(np.einsum("ij,ij->i", E, E))

cent_mask = vec_ids % 50 == 0
cent_idx = np.flatnonzero(cent_mask)          # index into E, vec_id-sorted
cell_ids = vec_ids[cent_idx]
C, cnorms = E[cent_idx], norms[cent_idx]
print(f"[ann_ivf_check] {n} vectors, {len(cent_idx)} centroids", flush=True)


def top_cells(rows_idx, k):
    """Top-k cells per row by (cosine DESC, cell_id ASC), guard-exact."""
    out = []
    CHUNK = 8192
    for s in range(0, len(rows_idx), CHUNK):
        idx = rows_idx[s:s + CHUNK]
        sims = (E[idx] @ C.T) / np.outer(norms[idx], cnorms)
        for r, i in enumerate(idx):
            row = sims[r]
            # candidates within GUARD of the k-th best need exact replay
            kth = np.partition(row, -k)[-k] if len(row) >= k else -np.inf
            cand = np.flatnonzero(row >= kth - GUARD)
            exact = {c: (seq_cosine(E32[i], E32[cent_idx[c]])
                         if len(cand) > k else row[c]) for c in cand}
            ranked = sorted(cand,
                            key=lambda c: (-exact[c], cell_ids[c]))[:k]
            out.append([(int(cell_ids[c])) for c in ranked])
    return out


# assignment: every vector's single nearest cell
assign_cells = top_cells(np.arange(n), 1)
assign = np.array([c[0] for c in assign_cells])      # cell_id per vector

# probes: vec_id < 10, top-2 cells
probe_rows = np.flatnonzero(vec_ids < 10)
probe_cells = top_cells(probe_rows, 2)

# members per cell
from collections import defaultdict
members = defaultdict(list)
for i, cid in enumerate(assign):
    members[cid].append(i)

expected = []
for pr, cells in zip(probe_rows, probe_cells):
    pid = int(vec_ids[pr])
    cand = set()
    for cid in cells:
        cand.update(members[cid])
    cand.discard(pr)
    scored = [(seq_cosine(E32[pr], E32[m]), int(vec_ids[m])) for m in cand]
    scored.sort(key=lambda t: (-t[0], t[1]))
    for rank, (cs, nid) in enumerate(scored[:5], start=1):
        expected.append((pid, rank, nid, round4(cs)))
expected.sort()

got = read_parquet_any(f"{outdir}/ann_ivf")
actual = sorted(map(tuple, got[["probe_id", "rank", "neighbor_id",
                                "cos_sim"]].itertuples(index=False,
                                                       name=None)))
if actual == expected:
    print(f"OK   ann_ivf ({len(actual)} rows, numpy-replay)")
else:
    aset, eset = set(actual), set(expected)
    print(f"FAIL ann_ivf: expected {len(expected)} rows, got {len(actual)}; "
          f"missing {sorted(eset - aset)[:5]}, extra {sorted(aset - eset)[:5]}")
    sys.exit(1)
