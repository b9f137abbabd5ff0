#!/usr/bin/env python3
"""Dev-only differential checker (mirrors the driver's t2 gate).

Usage: python3 dev/check.py <sfDir> <outDir> [query ...]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
Loads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB with views over the
same sfDir parquet tables, and compares:
  - column names (sorted)
  - pandas dtypes per column — the driver hashes pandas frames, so a
    DuckDB HUGEINT (-> float64/object) vs Spark BIGINT (-> int64)
    mismatch MUST fail here exactly like it fails there
  - row counts and values, EXACT. A float-tolerance-only match is
    reported as FAIL (the driver hashes bits, not tolerances); set
    GRAFT_CHECK_TOL=1 to downgrade it to a warning while debugging.
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

TOL_OK = os.environ.get("GRAFT_CHECK_TOL") == "1"

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return ("f", "nan")
        return ("f", v)
    if isinstance(v, list):
        return ("l", tuple(norm(x) for x in v))
    return (type(v).__name__, v)

def close(a, b):
    if a == b: return True
    if a[0] == "f" and b[0] == "f" and isinstance(a[1], float) and isinstance(b[1], float):
        x, y = a[1], b[1]
        return x == y or abs(x - y) <= 1e-12 * max(1.0, abs(x), abs(y))
    if a[0] == "l" and b[0] == "l" and len(a[1]) == len(b[1]):
        return all(close(x, y) for x, y in zip(a[1], b[1]))
    return False

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols, grows = got.columns, got.fetchall()
            gdt = {c: str(t) for c, t in zip(gcols, con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf().dtypes)}
            exp = con.sql(sql)
            ecols, erows = exp.columns, exp.fetchall()
            edt = {c: str(t) for c, t in zip(ecols, con.sql(sql).fetchdf().dtypes)}
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            fails += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: columns spark={sorted(gcols)} oracle={sorted(ecols)}")
            fails += 1
            continue
        # The driver's hash proved width-insensitive for integers
        # (int32 Spark outputs hash-matched int64 oracles all through
        # round 1) but kind-sensitive (HUGEINT -> float64/object broke
        # it). So: same-kind ints are equal; everything else is exact.
        def dt_eq(a, b):
            ints = {"int8", "int16", "int32", "int64"}
            return a == b or (a in ints and b in ints)
        dbad = {c: (gdt[c], edt[c]) for c in gcols if not dt_eq(gdt[c], edt[c])}
        if dbad:
            print(f"FAIL {name}: dtype mismatch (spark, oracle) = {dbad}")
            fails += 1
            continue
        gi = [gcols.index(c) for c in sorted(gcols)]
        ei = [ecols.index(c) for c in sorted(ecols)]
        g = sorted([tuple(norm(r[i]) for i in gi) for r in grows])
        e = sorted([tuple(norm(r[i]) for i in ei) for r in erows])
        if len(g) != len(e):
            print(f"FAIL {name}: rowcount spark={len(g)} oracle={len(e)}")
            fails += 1
            continue
        bad = [(a, b) for a, b in zip(g, e) if not all(close(x, y) for x, y in zip(a, b))]
        exact = g == e
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first: \n  spark={bad[0][0]}\n  duck ={bad[0][1]}")
            fails += 1
        elif not exact and not TOL_OK:
            first = next(((a, b) for a, b in zip(g, e) if a != b), None)
            print(f"FAIL {name}: float-tolerance-only match, NOT exact; first: \n  spark={first[0]}\n  duck ={first[1]}")
            fails += 1
        else:
            print(f"OK   {name}: {len(g)} rows" + ("" if exact else "  (float-tolerance only, NOT exact!)"))
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
