#!/usr/bin/env python3
"""Local oracle-differential check, mimicking the driver's t2 gate.

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify]

Runs graft.Verify on sfdir -> outdir, then executes each oracle SQL in
DuckDB over the same parquet tables and compares: schema (column names,
sorted), row count, and a hash of the sorted row values.

Driver-side tooling only — NOT part of the shipped library.
"""
import json, os, subprocess, sys, glob

import duckdb
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
SKIP = "--skip-verify" in sys.argv

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def rows_of(table):
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    return cols, sorted(zip(*[[norm(v) for v in col] for col in data])) if data else (cols, [])


def main():
    if not SKIP:
        r = subprocess.run(
            ["sbt", f'runMain graft.Verify {SF} {OUT}'],
            capture_output=True, text=True, cwd="/root/repo")
        errs = [l for l in (r.stdout + r.stderr).splitlines() if "[verify]" in l or "error" in l.lower()]
        for l in errs[:30]:
            print("  !", l)
        if r.returncode != 0:
            print("VERIFY RUN FAILED"); sys.exit(1)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    names = sorted([os.path.basename(d) for d in glob.glob(f"{OUT}/*") if os.path.isdir(d)])
    fails = 0
    # per-query failure markers written by graft.Verify (round-6 postmortem:
    # stderr-only failures made dead queries vanish from the compare)
    errp = f"{OUT}/errors.json"
    if os.path.exists(errp):
        for name, msg in sorted(json.load(open(errp)).items()):
            print(f"FAIL {name}: verify error: {msg[:200]}"); fails += 1
    for name in names:
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        got = pq.read_table(files[0])
        if name not in oracle:
            print(f"ok?  {name}: rows={got.num_rows} (no oracle — rows-only)")
            continue
        try:
            exp = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue
        gc, gr = rows_of(got)
        ec, er = rows_of(exp)
        if gc != ec:
            print(f"FAIL {name}: cols spark={gc} duckdb={ec}"); fails += 1; continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows spark={len(gr)} duckdb={len(er)}"); fails += 1; continue
        if gr != er:
            bad = next(i for i, (a, b) in enumerate(zip(gr, er)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted-row {bad}:")
            print(f"  spark : {gr[bad]}")
            print(f"  duckdb: {er[bad]}")
            fails += 1; continue
        print(f"PASS {name}: rows={len(gr)} cols={gc}")
    extra = set(oracle) - set(names)
    for name in sorted(extra):
        print(f"FAIL {name}: oracle present but no spark output dir"); fails += 1
    print(f"== {len(names)} queries, {fails} failures ==")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
