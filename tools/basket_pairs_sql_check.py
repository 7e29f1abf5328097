#!/usr/bin/env python3
"""Direct DuckDB oracle for basket_pairs, decomposed by a sound
algebraic identity so it runs at sf10 (60M lineitem) where the
monolithic oracle SQL crawls (its 90M-group pair aggregate ran >2.5 h
of mostly single-threaded CPU on this host before being cut off).

Identity: every co-occurrence pair lives inside exactly ONE order, so
per-order pair counts partitioned by `okey % N` SUM to the global
support — the same per-key-independence argument tools/
bucketed_check.py documents, applied to the JOIN KEY (okey) rather
than an output column (part_a is post-aggregation, so the generic
outer-filter form cannot push down and would re-run the full pipeline
N times). The lift factors (per-part basket counts, the global order
count) are computed ONCE over the full distinct frame, exactly as the
standing oracle does; every value expression is copied verbatim from
SparkEntry.oracleSql("basket_pairs").

Comparison is the same out-of-core multiset compare selfcheck.py's
compare_big uses: EXCEPT ALL in both directions + row counts, with
DOUBLE columns ROUND(4)-canonicalized (lift is already rounded).

Validation chain: run at sf0.01 and sf0.1 first — it must print OK
against verify dumps whose basket_pairs row is green under the
standing monolithic oracle before its sf10 verdict counts.

Usage: basket_pairs_sql_check.py <sfdir> <outdir> [n_buckets=16]
Exits 0 iff the multisets match.
"""
import glob
import os
import sys
import time

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
nb = int(sys.argv[3]) if len(sys.argv) > 3 else 16

con = duckdb.connect()
con.execute(f"SET memory_limit='{os.environ.get('SELFCHECK_MEM', '48GB')}'")
con.execute("SET preserve_insertion_order=false")
if os.environ.get("SELFCHECK_TMP"):
    con.execute(f"SET temp_directory='{os.environ['SELFCHECK_TMP']}'")

li = f"{sfdir}/lineitem.parquet"
if os.path.isdir(li):
    li = f"{li}/*.parquet"
t0 = time.time()
con.execute(f"""CREATE TEMP TABLE i AS
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk
  FROM read_parquet('{li}')""")
print(f"[basket_sql] distinct (okey, pk): "
      f"{con.execute('SELECT COUNT(*) FROM i').fetchone()[0]} rows "
      f"({time.time() - t0:.0f}s)", flush=True)

con.execute("""CREATE TEMP TABLE psum
  (part_a BIGINT, part_b BIGINT, support BIGINT)""")
for k in range(nb):
    t1 = time.time()
    con.execute(f"""INSERT INTO psum
      SELECT a.pk, b.pk, COUNT(*)
      FROM (SELECT * FROM i WHERE okey % {nb} = {k}) a
      JOIN (SELECT * FROM i WHERE okey % {nb} = {k}) b
        ON a.okey = b.okey AND a.pk < b.pk
      GROUP BY 1, 2""")
    print(f"[basket_sql] bucket {k}: +"
          f"{con.execute('SELECT COUNT(*) FROM psum').fetchone()[0]} "
          f"cumulative pair groups ({time.time() - t1:.0f}s)", flush=True)

# lift factors over the FULL frame + final fold — verbatim value
# expressions from the standing oracle
con.execute("""CREATE TEMP TABLE oracle AS
  WITH c AS (SELECT pk, COUNT(*) AS n FROM i GROUP BY pk),
  o AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM i),
  p AS (SELECT part_a, part_b, SUM(support) AS support
        FROM psum GROUP BY 1, 2)
  SELECT part_a, part_b, support,
    ROUND(CAST(support AS DOUBLE) * n_orders / (ca.n * cb.n), 4) AS lift
  FROM p JOIN c ca ON p.part_a = ca.pk
    JOIN c cb ON p.part_b = cb.pk, o
  WHERE support >= 2""")

spark_glob = f"{outdir}/basket_pairs/*.parquet"
assert glob.glob(spark_glob), f"no spark output at {spark_glob}"
con.execute(f"""CREATE TEMP VIEW spark AS
  SELECT part_a, part_b, support, ROUND(lift, 4) AS lift
  FROM read_parquet('{spark_glob}')""")

n_o = con.execute("SELECT COUNT(*) FROM oracle").fetchone()[0]
n_s = con.execute("SELECT COUNT(*) FROM spark").fetchone()[0]
d1 = con.execute(
    "SELECT COUNT(*) FROM (SELECT * FROM oracle EXCEPT ALL "
    "SELECT * FROM spark)").fetchone()[0]
d2 = con.execute(
    "SELECT COUNT(*) FROM (SELECT * FROM spark EXCEPT ALL "
    "SELECT * FROM oracle)").fetchone()[0]
if n_o == n_s and d1 == 0 and d2 == 0:
    print(f"OK   basket_pairs ({n_s} rows, {time.time() - t0:.0f}s, "
          f"duckdb-multiset bucketed x{nb} on okey)", flush=True)
    sys.exit(0)
print(f"FAIL basket_pairs: oracle {n_o} vs spark {n_s} rows, "
      f"except-all {d1}/{d2}", flush=True)
sys.exit(1)
