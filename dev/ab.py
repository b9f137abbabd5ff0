#!/usr/bin/env python3
"""Interleaved A/B bench protocol (round 7).

Per-query regression calls on this host class keep being confounded by
contention (identical code has swung 54->73 s full-suite). This script
makes the comparison mechanical instead of anecdotal:

  * each side is a query subset run through the REAL graft.Bench main
    (own JVM, own min-of-REPS, own start/end calibration kernel);
  * sides run STRICTLY INTERLEAVED (A B A B ...), so a contention
    window lands on both sides instead of biasing whichever ran last;
  * every rep of every invocation is kept; the verdict per query is
    min-over-invocations per side (min is the noise-robust statistic
    for wall time) next to the calibration medians that certify
    whether the host was quiet.

Usage:
  python3 dev/ab.py [--rounds 4] [--sf /root/testdata/sf0.1] \
      [--cpus 32] [--out dev/ab_last.json] \
      "labelA:q1,q2,..." "labelB:q3,..."

A query may appear in several sides; that is the point (e.g. t04 with
and without the s-block bench neighborhood in front of it).
"""
import argparse, json, re, statistics, subprocess, sys, time

def run_bench(queries, sf, cpus):
    cmd = ["sbt", "-batch", "runMain graft.Bench " + " ".join(queries)]
    env = dict(__import__("os").environ,
               SPARK_GRAFT_SF_DIR=sf, SPARK_GRAFT_CPUS=str(cpus))
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=__import__("os").path.dirname(
                           __import__("os").path.dirname(
                               __import__("os").path.abspath(__file__))))
    out = p.stdout + p.stderr
    for line in out.splitlines():
        m = re.search(r'(\{"metric".*\})\s*$', line)
        if m:
            return json.loads(m.group(1)), time.time() - t0
    sys.stderr.write(out[-4000:] + "\n")
    raise RuntimeError("no bench JSON line found")

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--out", default="dev/ab_last.json")
    ap.add_argument("sides", nargs="+", help="label:q1,q2,...")
    a = ap.parse_args()
    sides = []
    for s in a.sides:
        label, qs = s.split(":", 1)
        sides.append((label, qs.split(",")))
    runs = {label: [] for label, _ in sides}
    for rnd in range(a.rounds):
        for label, qs in sides:          # strict interleave
            j, wall = run_bench(qs, a.sf, a.cpus)
            runs[label].append(j)
            cal = j.get("calibration", {})
            print(f"[ab] round {rnd+1}/{a.rounds} side={label} "
                  f"wall={wall:.0f}s cal={cal}", flush=True)
    report = {"sf": a.sf, "rounds": a.rounds, "sides": {}}
    for label, qs in sides:
        per_q = {}
        for q in qs:
            reps = [t for j in runs[label] for t in j["reps"].get(q, [])
                    if t >= 0]
            if reps:
                per_q[q] = {"min": min(reps),
                            "median": statistics.median(reps),
                            "reps": reps}
        cals = [c for j in runs[label]
                for c in (j.get("calibration", {}).get("start", []) +
                          j.get("calibration", {}).get("end", []))]
        report["sides"][label] = {
            "queries": per_q,
            "calibration_median": statistics.median(cals) if cals else None}
    with open(a.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    # verdict table for queries present in >1 side
    shared = {}
    for label, side in report["sides"].items():
        for q, st in side["queries"].items():
            shared.setdefault(q, {})[label] = st["min"]
    print("\nquery          " + "  ".join(f"{l:>12}" for l, _ in sides))
    for q, by in sorted(shared.items()):
        print(f"{q:<14} " + "  ".join(
            f"{by.get(l, float('nan')):>12.3f}" for l, _ in sides))

if __name__ == "__main__":
    main()
