#!/usr/bin/env python3
"""Local driver-mimic: compare Verify.scala parquet output against the
DuckDB oracle (same shape as the driver's t2 correctness gate).

Usage: python3 tools/check.py [sf_dir] [out_dir] [query ...]
Run Verify first:
  sbt "runMain graft.Verify /root/testdata/sf0.01 target/verify_out"
"""
import sys, json, glob, os, time
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    # driver testdata ships single files; ScaleGen's sf1 tables are
    # spark-written DIRECTORIES of part files — glob those
    path = f"{sf_dir}/{t}.parquet"
    pat = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.sql(f"CREATE VIEW {t} AS FROM '{pat}'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fail = 0
oracle_ms = {}  # per-query DuckDB wall — the machine-checkable 2x bar
for name in sorted(only - set(oracle)):
    print(f"[MISS] {name}: not in oracle_sql.json")
    fail += 1
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    pq = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not pq:
        print(f"[MISS] {name}: no spark output")
        fail += 1
        continue
    try:
        got = con.sql(f"FROM '{pq[0]}'").df()
        t0 = time.monotonic()
        exp = con.sql(sql).df()
        oracle_ms[name] = round((time.monotonic() - t0) * 1000, 1)
    except Exception as e:
        print(f"[ERR ] {name}: {e}")
        fail += 1
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"[COLS] {name}: spark={list(got.columns)} oracle={list(exp.columns)}")
        fail += 1
        continue
    if got.dtypes.to_dict() != exp.dtypes.to_dict():
        print(f"[TYPE] {name}: spark={got.dtypes.to_dict()} oracle={exp.dtypes.to_dict()}")
    if len(got) != len(exp):
        print(f"[ROWS] {name}: spark={len(got)} oracle={len(exp)}")
        fail += 1
        continue
    sgot = got.sort_values(list(got.columns)).reset_index(drop=True)
    sexp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(sgot, sexp, check_dtype=False,
                                      check_exact=True)
        print(f"[ OK ] {name}: {len(got)} rows")
    except AssertionError as e:
        print(f"[HASH] {name}: {str(e).splitlines()[-1] if str(e) else 'mismatch'}")
        diff = sgot.compare(sexp) if sgot.shape == sexp.shape else None
        if diff is not None and len(diff):
            print(diff.head(5))
        fail += 1
# per-query oracle millis beside the pass/fail lines: lets a round log
# compare each Spark timing against its DuckDB twin (the per-query 2x
# bar), not just the totals
out = {"failures": fail, "oracle_ms": oracle_ms,
       "oracle_total_ms": round(sum(oracle_ms.values()), 1)}
with open(os.path.join(out_dir, "oracle_timing.json"), "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print("ORACLE_TOTAL_MS:", out["oracle_total_ms"])
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
