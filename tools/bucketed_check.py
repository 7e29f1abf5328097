#!/usr/bin/env python3
"""Bucketed replay of a per-key-independent DuckDB oracle, for scales
where the whole-table replay exhausts host memory/temp (60M-row window
sorts, string_agg chunk reassembly, rolling-hash replays).

Soundness: the oracle SQL is UNCHANGED — it is evaluated inside
`SELECT * FROM (<oracle>) WHERE <key> % N = k` for every k in 0..N-1,
and the Spark output is compared bucket-by-bucket with the same
out-of-core multiset compare selfcheck.py uses (EXCEPT ALL both
directions + counts). Because the buckets partition the output rows
(the key is a non-NULL output column), per-bucket multiset equality
for ALL k is exactly whole-output multiset equality. The only thing
bucketing changes is DuckDB's working set — valid for any oracle, and
FEASIBLE when the query is per-key independent (windows/aggregates
partitioned by the key), since the engine can push the key filter to
the scans. A query where the filter cannot push down simply runs the
full pipeline N times — slower, never wrong.

Usage: bucketed_check.py <sfdir> <outdir> <name> <key_col> <n_buckets>
         [--filter-source <table>]

--filter-source pushes the bucket predicate INTO the named source view
(e.g. documents) instead of around the oracle — for oracles whose
pipeline the optimizer cannot push an outer filter through (recursive
CTEs, string_agg reassembly). This variant is sound ONLY for queries
that are per-key independent over that source (each output row derives
from exactly the source rows sharing its key, e.g. per-document
chunking): then oracle(filtered source) == oracle(full source)
restricted to the bucket. The default (outer-filter) form is
unconditionally sound.
"""
import glob
import json
import os
import sys
import time

import duckdb

sfdir, outdir, name, key, nb = (sys.argv[1], sys.argv[2], sys.argv[3],
                                sys.argv[4], int(sys.argv[5]))
filter_source, source_key = None, None
argv = sys.argv[6:]
while argv:
    if argv[0] == "--filter-source":
        filter_source = argv[1]; argv = argv[2:]
    elif argv[0] == "--source-key":
        # the source table's column carrying the key (defaults to the
        # output key name), e.g. lineitem.l_suppkey -> output loc_ref
        source_key = argv[1]; argv = argv[2:]
    else:
        sys.exit(f"unknown arg {argv[0]}")

con = duckdb.connect()
con.execute(f"SET memory_limit='{os.environ.get('SELFCHECK_MEM', '48GB')}'")


def bind_views(bucket=None):
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        pat = f"{sfdir}/{t}.parquet"
        if os.path.isdir(pat):
            pat = f"{pat}/*.parquet"
        skey = source_key or key
        where = (f" WHERE COALESCE(\"{skey}\" % {nb}, {nb}) = {bucket}"
                 if bucket is not None and t == filter_source else "")
        con.execute(f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{pat}'){where}")


bind_views()

sql = json.load(open(f"{outdir}/oracle_sql.json"))[name]
spark_glob = f"{outdir}/{name}/*.parquet"
assert glob.glob(spark_glob), f"no spark output for {name}"

scols = sorted(r[0] for r in con.execute(
    f"DESCRIBE SELECT * FROM read_parquet('{spark_glob}')").fetchall())
ocols = sorted(r[0] for r in con.execute(f"DESCRIBE ({sql})").fetchall())
if scols != ocols:
    print(f"FAIL {name}: cols spark={scols} oracle={ocols}")
    sys.exit(1)
assert key in scols, f"bucket key {key} not in output columns {scols}"
collist = ", ".join('"%s"' % c for c in scols)

t0 = time.time()
total_s = total_o = 0
# COALESCE routes NULL keys to bucket nb (instead of escaping every
# bucket), so the nb+1 buckets partition BOTH outputs exhaustively
for k in range(nb + 1):
    tb = time.time()
    if filter_source is not None:
        bind_views(bucket=k)
    s_minus_o, o_minus_s, ns, no = con.execute(f"""
        WITH s AS (SELECT {collist} FROM read_parquet('{spark_glob}')
                   WHERE COALESCE("{key}" % {nb}, {nb}) = {k}),
             o AS (SELECT {collist} FROM ({sql}) oq
                   WHERE COALESCE("{key}" % {nb}, {nb}) = {k})
        SELECT (SELECT count(*) FROM (SELECT * FROM s EXCEPT ALL SELECT * FROM o) a),
               (SELECT count(*) FROM (SELECT * FROM o EXCEPT ALL SELECT * FROM s) b),
               (SELECT count(*) FROM s), (SELECT count(*) FROM o)""").fetchone()
    if ns != no or s_minus_o or o_minus_s:
        print(f"FAIL {name} bucket {k}/{nb}: rows spark={ns} oracle={no} "
              f"(spark-only={s_minus_o}, oracle-only={o_minus_s})")
        sys.exit(1)
    total_s += ns
    total_o += no
    print(f"  bucket {k}/{nb}: {ns} rows equal ({time.time()-tb:.0f}s)",
          flush=True)
print(f"OK   {name} ({total_s} rows, {time.time()-t0:.0f}s, "
      f"duckdb-multiset bucketed x{nb} on {key})")
