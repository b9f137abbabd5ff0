#!/usr/bin/env python3
"""Mechanical bench gate (round 8+; see BASELINE.md "Round-10 re-baseline").

The raw 2x-vs-r4 gate stopped being meaningful once (a) the query count
grew 56% past r4's surface and (b) the driver host settled into a
~1.4x-contended class vs the r4 run. This script states the replacement
gate as executable arithmetic over a BENCH json:

    H     = max(1.0, median(all calibration probes) / C_REF)
    s     = total / n_queries / H          # host-normalized sec/query
    PASS iff s <= GATE_FACTOR * S_REF

C_REF and S_REF come from the committed quiet-host full-suite artifact
(default dev/bench_quiet_r16.json — a full `graft.Bench` run at sf0.1,
32 cpus, reps=2, recorded round 16 on a calibration-quiet host UNDER
THE PASS-SEPARATED-REPS PROTOCOL graft.Bench has used since round 15;
the r10 reference predates that protocol and is not comparable —
arithmetic in BASELINE.md "Round-16 re-baseline").
GATE_FACTOR = 1.25 absorbs residual calibration nonlinearity; genuine
per-query regressions are adjudicated with dev/ab.py, not this gate.

Usage: python3 dev/gate.py BENCH_rN.json [quiet_artifact.json]
"""
import json, os, statistics, sys

GATE_FACTOR = 1.25
DEFAULT_QUIET = os.path.join(os.path.dirname(__file__), "bench_quiet_r16.json")


def load_ref(quiet_path):
    if not os.path.exists(quiet_path):
        sys.exit(f"gate.py: quiet-host reference artifact not found: "
                 f"{quiet_path}\n(produce it with a full-suite "
                 f"`sbt 'runMain graft.Bench'` at sf0.1 on a quiet host, "
                 f"or pass its path as the second argument)")
    with open(quiet_path) as f:
        q = json.load(f)
    cal = q["calibration"]["start"] + q["calibration"]["end"]
    return statistics.median(cal), q["value"] / len(q["queries"])


def main(path, quiet_path=DEFAULT_QUIET):
    c_ref, s_ref = load_ref(quiet_path)
    with open(path) as f:
        b = json.load(f)
    cal = b.get("calibration", {})
    probes = cal.get("start", []) + cal.get("end", [])
    h = max(1.0, statistics.median(probes) / c_ref) if probes else 1.0
    s = b["value"] / len(b["queries"]) / h
    limit = GATE_FACTOR * s_ref
    verdict = "PASS" if s <= limit else "FAIL"
    print(json.dumps({
        "total_s": b["value"], "n_queries": len(b["queries"]),
        "host_factor": round(h, 3),
        "normalized_sec_per_query": round(s, 4),
        "gate_limit": round(limit, 4),
        "ref_sec_per_query": round(s_ref, 4),
        "verdict": verdict}))
    return 0 if verdict == "PASS" else 1


if __name__ == "__main__":
    if not 2 <= len(sys.argv) <= 3:
        sys.exit("usage: python3 dev/gate.py BENCH_rN.json [quiet_artifact.json]")
    sys.exit(main(*sys.argv[1:]))
