#!/usr/bin/env python3
"""Self-check: replicate the driver's DuckDB-oracle compare locally.

Usage: python3 tools/selfcheck.py <sfdir> <verify_out_dir>
         [--resume <prior_log>] [--skip name,...] [--only name,...]
         [--timeout SECS] [--big-rows N]
Reads each <out>/<name> parquet (Spark result) and runs the matching
oracle from <out>/oracle_sql.json in DuckDB over the raw tables.
--resume skips queries already OK in a prior run's log (crash
recovery for long sweeps); --skip marks named queries SKIP (an oracle
that cannot run at the current scale — e.g. doc_fingerprint's
per-character recursive CTE is quadratic in DuckDB at sf1 — must be
cross-checked some other way, never silently dropped).
--timeout interrupts an oracle that runs past SECS (watchdog thread →
con.interrupt()) and reports TIMEOUT — the long-sweep alternative to
hanging the whole run on one quadratic oracle; a TIMEOUT query needs a
substitute check exactly like a SKIP.
SELFCHECK_MEM caps DuckDB memory (default 48GB) so an oracle that
outgrows the host FAILS in-process instead of OOM-killing the sweep.
Compares schema (sorted column names) and values (rows sorted, columns
sorted by name, exact equality; floats compared exactly after both
sides' ROUND(4)).
--big-rows N (default 3,000,000): outputs larger than N rows compare
inside DuckDB (EXCEPT ALL both directions + row counts — multiset
equality, out-of-core) instead of pandas canon(), whose per-row string
tuples need ~1 GB per million rows and would OOM the 60M-row sf10
outputs. Native-value equality differs from canon() only on -0.0 vs
0.0 (native: equal) and NaN (native: equal; canon: both map to None —
also equal), so it is the same gate for every value class the queries
emit (ints, cents-exact money, ROUND(4) floats, ISO date strings).
"""
import sys, json, glob, math, os, time, threading
import duckdb
if os.environ.get("SELFCHECK_NO_PANDAS"):
    # pandas backs the small-output canon() path only; with
    # SELFCHECK_NO_PANDAS=1 (+ --big-rows 0) every compare runs inside
    # DuckDB and the sweep works on hosts where the numpy/pandas stack
    # is unloadable — import is skipped entirely because a broken
    # native stack dies with SIGBUS, which no try/except can catch
    # (the r10 disk-failure incident, HOST_INCIDENT.md)
    pd = None
else:
    import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
done, skip, only = set(), set(), None
timeout_s, big_rows, emit_json = None, 3_000_000, None
argv = sys.argv[3:]
while argv:
    if argv[0] == "--resume":
        for line in open(argv[1]):
            if line.startswith("OK   "):
                done.add(line.split()[1])
        argv = argv[2:]
    elif argv[0] == "--emit-json":
        emit_json = argv[1]
        argv = argv[2:]
    elif argv[0] == "--skip":
        skip |= set(argv[1].split(","))
        argv = argv[2:]
    elif argv[0] == "--only":
        only = set(argv[1].split(","))
        argv = argv[2:]
    elif argv[0] == "--timeout":
        timeout_s = float(argv[1])
        argv = argv[2:]
    elif argv[0] == "--big-rows":
        big_rows = int(argv[1])
        argv = argv[2:]
    else:
        sys.exit(f"unknown arg {argv[0]}")
def _connect():
    c = duckdb.connect()
    c.execute(f"SET memory_limit='{os.environ.get('SELFCHECK_MEM', '48GB')}'")
    # Every compare here is order-insensitive (multiset EXCEPT ALL, or
    # python-sorted canon rows), so DuckDB need not buffer pipelines to
    # preserve insertion order — without this the sf10 ngram oracles
    # buffer their 85M-row shingle DISTINCT through the spill path and
    # exhaust the disk; with it the same query runs in seconds in-memory.
    c.execute("SET preserve_insertion_order=false")
    if os.environ.get("SELFCHECK_TMP"):
        c.execute(f"SET temp_directory='{os.environ['SELFCHECK_TMP']}'")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        # driver testdata ships single files; Spark-written tables (the
        # ScaleUp sweep) are part-file directories — accept both
        pat = f"{sfdir}/{t}.parquet"
        if os.path.isdir(pat):
            pat = f"{pat}/*.parquet"
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    return c

con = _connect()

def reset_con():
    """A query that dies on OutOfMemory can leave the connection's
    allocator accounting poisoned — every later query then fails on
    kilobyte allocations (observed in the sf10 sweep: one true OOM
    cascaded into five false ones). Reconnect so one hard query's
    failure cannot invalidate the rest of the gate."""
    global con
    try:
        con.close()
    except Exception:
        pass
    con = _connect()

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)): return None
        if hasattr(v, "date") and not isinstance(v, str):  # Timestamp
            return str(pd.Timestamp(v))
        # floats canonicalize through ROUND(4) — identical to the
        # compare_big path (which applies DuckDB ROUND(col, 4) to
        # float columns), so the gate is scale-INdependent: a query
        # emitting unrounded doubles behaves the same whichever
        # compare path its output size selects. Idempotent for the
        # pre-rounded floats every current query emits.
        if isinstance(v, float): return repr(round(v, 4))
        return str(v)
    rows = [tuple(norm(v) for v in r) for r in df.itertuples(index=False, name=None)]
    return sorted(rows)

class _Watchdog:
    """Interrupts the in-flight DuckDB query after timeout_s; the
    raised InterruptException is classified as TIMEOUT, not FAIL."""
    def __init__(self):
        self.fired = False
        self.timer = None
    def __enter__(self):
        if timeout_s is not None:
            def _fire():
                self.fired = True
                con.interrupt()
            self.timer = threading.Timer(timeout_s, _fire)
            self.timer.daemon = True
            self.timer.start()
        return self
    def __exit__(self, *exc):
        if self.timer is not None:
            self.timer.cancel()
        return False

FLOATY = ("DOUBLE", "FLOAT", "REAL")

def compare_big(name, sql, spark_glob, t0, rec):
    """Multiset compare inside DuckDB (out-of-core) for outputs too
    large for pandas canon(). EXCEPT ALL both directions + counts ≡
    multiset equality; schema compared first via DESCRIBE (bind-only).
    Float columns pass through ROUND(col, 4) on BOTH sides — the same
    canonicalization canon() applies — so small- and big-output
    compares implement one gate.
    """
    stypes = {r[0]: r[1] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{spark_glob}')").fetchall()}
    otypes = {r[0]: r[1] for r in con.execute(
        f"DESCRIBE ({sql})").fetchall()}
    scols, ocols = sorted(stypes), sorted(otypes)
    if scols != ocols:
        print(f"FAIL {name}: cols spark={scols} oracle={ocols}", flush=True)
        rec["schema_match"] = False
        rec["err"] = f"cols spark={scols} oracle={ocols}"
        return False
    rec["schema_match"] = True
    def proj(types):
        return ", ".join(
            (f'ROUND("{c}", 4) AS "{c}"' if types[c].upper() in FLOATY
             else f'"{c}"') for c in scols)
    # The oracle is MATERIALIZED once into a temp table before the
    # two EXCEPT ALLs + count reference it: inlined as a CTE it is
    # re-executed per reference (three times), which at sf10 spilled a
    # 85M-row shingle pipeline past the free disk. The temp table is
    # only output-sized. The spark side stays inline — re-reading
    # parquet is cheap.
    con.execute(f"""CREATE OR REPLACE TEMP TABLE __oracle AS
        SELECT {proj(otypes)} FROM ({sql}) oq""")
    s_minus_o, o_minus_s, ns, no = con.execute(f"""
        WITH s AS (SELECT {proj(stypes)} FROM read_parquet('{spark_glob}'))
        SELECT (SELECT count(*) FROM (SELECT * FROM s EXCEPT ALL SELECT * FROM __oracle) a),
               (SELECT count(*) FROM (SELECT * FROM __oracle EXCEPT ALL SELECT * FROM s) b),
               (SELECT count(*) FROM s), (SELECT count(*) FROM __oracle)""").fetchone()
    con.execute("DROP TABLE IF EXISTS __oracle")
    rec["spark_rows"], rec["oracle_rows"] = ns, no
    rec["rows_match"] = ns == no
    if ns != no:
        print(f"FAIL {name}: rows spark={ns} oracle={no}", flush=True)
        rec["err"] = f"rows spark={ns} oracle={no}"
        return False
    if s_minus_o or o_minus_s:
        print(f"FAIL {name}: values differ (spark-only={s_minus_o}, "
              f"oracle-only={o_minus_s} rows)", flush=True)
        rec["hash_match"] = False
        rec["err"] = f"values differ (spark-only={s_minus_o}, oracle-only={o_minus_s})"
        return False
    rec["hash_match"] = True
    print(f"OK   {name} ({ns} rows, {time.time()-t0:.0f}s, duckdb-multiset)",
          flush=True)
    return True

fails = 0
report = {}
def blank_rec():
    return {"rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None}
for name, sql in sorted(oracles.items()):
    if only is not None and name not in only:
        continue
    rec = report[name] = blank_rec()
    if name in done:
        rec.update(rows_match=True, schema_match=True, hash_match=True)
        print(f"OK   {name} (resumed from prior log)", flush=True); continue
    if name in skip:
        rec["err"] = "skipped: oracle excluded at this scale"
        print(f"SKIP {name}: oracle excluded at this scale", flush=True); continue
    wd = _Watchdog()
    try:
        t0 = time.time()
        spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not spark_files:
            rec["err"] = "no spark output"
            print(f"FAIL {name}: no spark output", flush=True); fails += 1; continue
        spark_glob = f"{outdir}/{name}/*.parquet"
        n_spark = con.execute(
            f"SELECT count(*) FROM read_parquet('{spark_glob}')").fetchone()[0]
        with wd:
            if n_spark > big_rows or pd is None:
                if not compare_big(name, sql, spark_glob, t0, rec):
                    fails += 1
                continue
            sdf = pd.concat([pd.read_parquet(f) for f in sorted(spark_files)])
            odf = con.execute(sql).fetchdf()
        a, b = canon(sdf), canon(odf)
        rec["spark_rows"], rec["oracle_rows"] = len(a), len(b)
        rec["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
        rec["rows_match"] = len(a) == len(b)
        if not rec["schema_match"]:
            rec["err"] = f"cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
            print(f"FAIL {name}: cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}", flush=True); fails += 1
        elif len(a) != len(b):
            rec["err"] = f"rows spark={len(a)} oracle={len(b)}"
            print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}", flush=True); fails += 1
        elif a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            rec["err"] = f"values differ, first diffs: {diff}"
            print(f"FAIL {name}: values differ, first diffs: {diff}", flush=True); fails += 1
        else:
            rec["hash_match"] = True
            print(f"OK   {name} ({len(a)} rows, {time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        if wd.fired:
            rec["err"] = f"timeout after {timeout_s:.0f}s"
            print(f"TIMEOUT {name}: oracle exceeded {timeout_s:.0f}s — needs a substitute check", flush=True)
            fails += 1
        else:
            rec["err"] = f"{type(e).__name__}: {e}"
            print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True); fails += 1
        if "OutOfMemory" in type(e).__name__ or "Out of Memory" in str(e) \
                or wd.fired:
            reset_con()

# queries with no oracle: rows-only
import os
declared = (set() if only is not None
            else set(os.listdir(outdir)) - {"oracle_sql.json"})
for name in sorted(declared - set(oracles)):
    n = len(glob.glob(f"{outdir}/{name}/*.parquet"))
    print(f"ROWS {name}: output present ({n} files)")

if emit_json:
    # the driver's CORRECTNESS_r{N}.json shape (per-query rows_match /
    # schema_match / hash_match / spark_rows / oracle_rows / err),
    # stamped under "_meta" with provenance so a round artifact
    # produced by this gate is self-describing even when the driver's
    # own run could not complete (the r10 host incident)
    import subprocess
    try:
        rev = subprocess.run(["git", "rev-parse", "HEAD"],
                             capture_output=True, text=True,
                             cwd=os.path.dirname(os.path.dirname(
                                 os.path.abspath(__file__)))).stdout.strip()
    except Exception:
        rev = "unknown"
    out = {"_meta": {
        "git_rev": rev,
        "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "sf_dir": sfdir,
        "tool": "tools/selfcheck.py" +
                (" (pandas-free pure-DuckDB mode)" if pd is None else ""),
        "queries": len(report),
        "fails": fails,
    }}
    out.update(sorted(report.items()))
    # Clobber guard (VERDICT r11 #3): the r11 round artifact was replaced
    # with "{}" by a crashed run. Never overwrite an artifact with a
    # SMALLER query set — an empty result is the r11 incident, and a
    # partial run (--only / crash-shortened) is the same artifact-loss
    # class one query above the threshold. Write tmp+rename so a
    # mid-write crash cannot leave a truncated file in the slot.
    prior_names = set()
    try:
        with open(emit_json) as f:
            prior = json.load(f)
        prior_names = set(prior) - {"_meta"}
    except Exception:
        pass
    # Set difference, not count (ADVICE r12): a partial run over an
    # equal-or-larger but DIFFERENT query subset (e.g. --only with as
    # many queries as the committed artifact) would pass a count-only
    # guard while still dropping committed per-query results.
    dropped = prior_names - set(report)
    if dropped:
        print(f"REFUSED to clobber {emit_json}: {len(dropped)} committed "
              f"queries would be dropped ({', '.join(sorted(dropped)[:5])}"
              f"{', ...' if len(dropped) > 5 else ''}) — delete it first "
              f"if the drop is intentional", flush=True)
        sys.exit(3)
    tmp = emit_json + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1)
    os.replace(tmp, emit_json)
    print(f"WROTE {emit_json} ({len(report)} queries, {fails} fails)", flush=True)

sys.exit(1 if fails else 0)
