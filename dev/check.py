#!/usr/bin/env python3
"""Dev-only differential checker (mirrors the driver's t2 gate).

Usage: python3 dev/check.py <sfDir> <outDir> [query ...]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
Loads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB with views over the
same sfDir parquet tables, and compares: column names (sorted), row
counts, and values (sorted rows, exact for non-floats, 1e-12 relative
for floats — the driver may be stricter, so aim for exact).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

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
            exp = con.sql(sql)
            ecols, erows = exp.columns, exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            fails += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: columns spark={sorted(gcols)} oracle={sorted(ecols)}")
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
        else:
            print(f"OK   {name}: {len(g)} rows" + ("" if exact else "  (float-tolerance only, NOT exact!)"))
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
