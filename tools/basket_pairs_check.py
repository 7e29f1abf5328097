#!/usr/bin/env python3
"""Independent replay of `basket_pairs` for scales where the DuckDB
oracle exceeds the sweep timeout (the okey self-join + 90M-group
hash aggregate runs >40 min at sf10). Replays the same definition
vectorized: distinct (order, part), per-order part pairs (part_a <
part_b by part key), support counts, lift = support * n_orders /
(count_a * count_b) at support >= 2, ROUND(lift, 4) half-up on the
shortest repr (Spark/DuckDB parity).

Usage: basket_pairs_check.py <sfdir> <outdir>
Validate against a DuckDB-verified outdir at a small SF first.
"""
import glob
import sys
from decimal import Decimal, ROUND_HALF_UP

import numpy as np
import pandas as pd


def round4(x):
    return float(Decimal(repr(float(x)))
                 .quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


def read_any(path, columns=None):
    files = sorted(glob.glob(path) or glob.glob(f"{path}/*.parquet"))
    assert files, f"no parquet at {path}"
    return pd.concat([pd.read_parquet(f, columns=columns) for f in files])


sfdir, outdir = sys.argv[1], sys.argv[2]
li = read_any(f"{sfdir}/lineitem.parquet",
              columns=["l_orderkey", "l_partkey"])
ok = li["l_orderkey"].to_numpy()
pk = li["l_partkey"].to_numpy()

# distinct (order, part) via dense factorization (raw keys overflow a
# packed int64 at synthetic offsets)
ok_vals, ok_idx = np.unique(ok, return_inverse=True)
pk_vals, pk_idx = np.unique(pk, return_inverse=True)
assert len(pk_vals) < (1 << 21)
packed = ok_idx.astype(np.int64) * (1 << 21) + pk_idx
packed = np.unique(packed)
o_i = (packed >> 21).astype(np.int64)
p_i = (packed & ((1 << 21) - 1)).astype(np.int64)
n_orders = len(ok_vals)
part_count = np.bincount(p_i, minlength=len(pk_vals))
print(f"[basket_pairs_check] {len(packed)} distinct (order,part), "
      f"{n_orders} orders, {len(pk_vals)} parts", flush=True)

# per-order pairs, vectorized by basket size: sort by (order, part
# VALUE) so pairs come out part_a < part_b in original key space
order_sort = np.lexsort((pk_vals[p_i], o_i))
o_s, p_s = o_i[order_sort], p_i[order_sort]
starts = np.flatnonzero(np.r_[True, o_s[1:] != o_s[:-1]])
sizes = np.diff(np.r_[starts, len(o_s)])
pair_keys = []
for s in range(2, sizes.max() + 1):
    g = starts[sizes == s]
    if not len(g):
        continue
    block = p_s[g[:, None] + np.arange(s)]          # (groups, s) parts
    a, b = np.triu_indices(s, k=1)
    pair_keys.append((block[:, a].astype(np.int64) * (1 << 21)
                      + block[:, b]).ravel())
pairs = np.concatenate(pair_keys)
uniq, support = np.unique(pairs, return_counts=True)
keep = support >= 2
uniq, support = uniq[keep], support[keep]
pa = (uniq >> 21).astype(np.int64)
pb = (uniq & ((1 << 21) - 1)).astype(np.int64)
print(f"[basket_pairs_check] {len(uniq)} pairs at support >= 2", flush=True)

expected = sorted(
    (int(pk_vals[a]), int(pk_vals[b]), int(s),
     round4(float(s) * n_orders / (part_count[a] * part_count[b])))
    for a, b, s in zip(pa, pb, support))

got = read_any(f"{outdir}/basket_pairs")
actual = sorted(map(tuple, got[["part_a", "part_b", "support", "lift"]]
                    .itertuples(index=False, name=None)))
if actual == expected:
    print(f"OK   basket_pairs ({len(actual)} rows, numpy-replay)")
else:
    aset, eset = set(actual), set(expected)
    print(f"FAIL basket_pairs: expected {len(expected)}, got {len(actual)}; "
          f"missing {sorted(eset - aset)[:3]}, extra {sorted(aset - eset)[:3]}")
    sys.exit(1)
