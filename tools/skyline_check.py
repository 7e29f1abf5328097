#!/usr/bin/env python3
"""Independent replay of `parts_skyline` for scales where the DuckDB
oracle (a NOT EXISTS dominance self-join, O(n²) pairs over the part
table) exceeds the sweep timeout. Replays the same definition with
the classic sort-and-scan skyline: sort by (p_retailprice ASC,
p_size DESC); a part is on the skyline iff its p_size is strictly
greater than every size seen at a strictly lower price, and no
SAME-price part carries a strictly greater size — exactly the oracle's
"no q with q.price<=p.price, q.size>=p.size, and one strict". Ties
(equal price AND equal size) dominate nothing, matching the oracle.

Usage: skyline_check.py <sfdir> <outdir>
Validate against a DuckDB-verified outdir at a small SF first.
"""
import glob
import sys

import numpy as np
import pandas as pd


def read_any(path, columns=None):
    files = sorted(glob.glob(path) or glob.glob(f"{path}/*.parquet"))
    assert files, f"no parquet at {path}"
    return pd.concat([pd.read_parquet(f, columns=columns) for f in files])


sfdir, outdir = sys.argv[1], sys.argv[2]
part = read_any(f"{sfdir}/part.parquet",
                columns=["p_partkey", "p_retailprice", "p_size"])
part = part.dropna(subset=["p_retailprice", "p_size"])

price = part["p_retailprice"].to_numpy()
size = part["p_size"].to_numpy()
n = len(part)

# max size at strictly lower price, via price-sorted prefix scan
order = np.lexsort((size, price))
p_o, s_o = price[order], size[order]
# prefix max of size over all strictly-lower prices
starts = np.flatnonzero(np.r_[True, p_o[1:] != p_o[:-1]])  # price groups
group_max = np.maximum.reduceat(s_o, starts)               # max size per price
prev_max = np.r_[-np.inf, np.maximum.accumulate(group_max)[:-1]]  # strictly lower
group_id = np.cumsum(np.r_[0, np.diff(p_o) != 0])
dominated_lower = s_o <= prev_max[group_id]
# same-price strict-size dominance: size < group max
dominated_same = s_o < group_max[group_id]
keep_o = ~(dominated_lower | dominated_same)
keep = np.zeros(n, dtype=bool)
keep[order] = keep_o

exp = part[keep][["p_partkey", "p_retailprice", "p_size"]]
expected = sorted(map(tuple, exp.itertuples(index=False, name=None)))

got = read_any(f"{outdir}/parts_skyline")
actual = sorted(map(tuple, got[["p_partkey", "p_retailprice", "p_size"]]
                    .itertuples(index=False, name=None)))
if actual == expected:
    print(f"OK   parts_skyline ({len(actual)} rows, numpy-replay)")
else:
    aset, eset = set(actual), set(expected)
    print(f"FAIL parts_skyline: expected {len(expected)}, got {len(actual)}; "
          f"missing {sorted(eset-aset)[:5]}, extra {sorted(aset-eset)[:5]}")
    sys.exit(1)
