#!/usr/bin/env python3
"""Mechanical bench gate (round 8; see BASELINE.md "Round-8 re-baseline").

The raw 2x-vs-r4 gate stopped being meaningful once (a) the query count
grew 56% past r4's surface and (b) the driver host settled into a
~1.4x-contended class vs the r4 run. This script states the replacement
gate as executable arithmetic over a BENCH json:

    H     = max(1.0, median(all calibration probes) / C_REF)
    s     = total / n_queries / H          # host-normalized sec/query
    PASS iff s <= GATE_FACTOR * S_REF

C_REF and S_REF come from the committed quiet-host full-suite artifact
(dev/bench_quiet_r8.json, protocol: sequential full-suite runs in their
own JVMs on an otherwise idle host, quietest-calibration run recorded).
GATE_FACTOR = 1.25 absorbs residual calibration nonlinearity; genuine
per-query regressions are adjudicated with dev/ab.py, not this gate.

Usage: python3 dev/gate.py BENCH_rN.json
"""
import json, statistics, sys

C_REF = None   # filled from the quiet artifact
S_REF = None
GATE_FACTOR = 1.25
QUIET = "dev/bench_quiet_r8.json"

def load_ref():
    global C_REF, S_REF
    with open(QUIET) as f:
        q = json.load(f)
    cal = q["calibration"]["start"] + q["calibration"]["end"]
    C_REF = statistics.median(cal)
    S_REF = q["value"] / len(q["queries"])

def main(path):
    load_ref()
    with open(path) as f:
        b = json.load(f)
    cal = b.get("calibration", {})
    probes = cal.get("start", []) + cal.get("end", [])
    h = max(1.0, statistics.median(probes) / C_REF) if probes else 1.0
    s = b["value"] / len(b["queries"]) / h
    limit = GATE_FACTOR * S_REF
    verdict = "PASS" if s <= limit else "FAIL"
    print(json.dumps({
        "total_s": b["value"], "n_queries": len(b["queries"]),
        "host_factor": round(h, 3),
        "normalized_sec_per_query": round(s, 4),
        "gate_limit": round(limit, 4),
        "ref_sec_per_query": round(S_REF, 4),
        "verdict": verdict}))
    return 0 if verdict == "PASS" else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
