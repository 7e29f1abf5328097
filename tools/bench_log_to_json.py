#!/usr/bin/env python3
"""Reconstruct a bench artifact from a (possibly cut) Bench stderr log.

Usage: bench_log_to_json.py <bench_stderr_log> <out_json> <sf> [note...]

The Bench main prints its single JSON line only at the END of the run,
so a run cut by wall-clock leaves per-query evidence only in stderr
(`[bench] round N <name>: <sec>` lines). This rebuilds the same shape
(per-query min over rounds, failures listed) and stamps an explicit
`_meta` with coverage so a partial run can never masquerade as a full
one. Shuffle-byte attribution lives only in the in-process listener,
so a reconstructed artifact carries timings only.
"""
import json, re, sys

log, out, sf = sys.argv[1], sys.argv[2], sys.argv[3]
note = " ".join(sys.argv[4:])

times, failed = {}, set()
for line in open(log, errors="replace"):
    m = re.match(r"\[bench\] round (\d+) (\S+): ([0-9.]+)( FAILED)?", line)
    if not m or m.group(2) == "sentinel":
        continue
    name = m.group(2)
    if m.group(4):
        failed.add(name)
        continue
    t = float(m.group(3))
    times[name] = min(t, times.get(name, float("inf")))
failed -= set(times)

artifact = {
    "metric": "total",
    "value": round(sum(times.values()), 2),
    "unit": "sec",
    "sf": sf,
    "queries": {k: round(v, 2) for k, v in sorted(times.items())},
    "_meta": {
        "reconstructed_from": log,
        "queries_measured": len(times),
        "failed": sorted(failed),
        "note": note,
    },
}
with open(out, "w") as f:
    json.dump(artifact, f, indent=1)
print(f"wrote {out}: {len(times)} queries, total {artifact['value']}s, "
      f"failed={sorted(failed)}")
