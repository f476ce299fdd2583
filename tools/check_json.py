#!/usr/bin/env python3
"""check.py with a JSON artifact: same compare (DuckDB oracle vs the
Verify parquet dump, columns sorted by name, exact values), emitting
the CORRECTNESS_sf1_r{N}.json shape the round log commits.

Usage: python3 tools/check_json.py <sf_dir> <out_dir> <json_out> <note> [query ...]
With no query list, every oracle_sql.json entry is checked.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir, json_out, note = sys.argv[1:5]
only = set(sys.argv[5:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    path = f"{sf_dir}/{t}.parquet"
    pat = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.sql(f"CREATE VIEW {t} AS FROM '{pat}'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
results, fail = {}, 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    r = {"rows_match": None, "schema_match": None, "hash_match": None,
         "rows": None, "err": None}
    results[name] = r
    pq = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not pq:
        r["err"] = "no spark output"; fail += 1; continue
    try:
        got = con.sql(f"FROM '{pq[0]}'").df()
        exp = con.sql(sql).df()
    except Exception as e:
        r["err"] = str(e)[:200]; fail += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    r["rows"] = len(got)
    r["schema_match"] = list(got.columns) == list(exp.columns)
    r["rows_match"] = len(got) == len(exp)
    if not (r["schema_match"] and r["rows_match"]):
        r["hash_match"] = False; fail += 1; continue
    sgot = got.sort_values(list(got.columns)).reset_index(drop=True)
    sexp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(sgot, sexp, check_dtype=False,
                                      check_exact=True)
        r["hash_match"] = True
        print(f"[ OK ] {name}: {len(got)} rows")
    except AssertionError:
        r["hash_match"] = False; fail += 1
        print(f"[HASH] {name}")
json.dump({"note": note, "sf": sf_dir, "checked": len(results),
           "failures": fail, "results": results},
          open(json_out, "w"), indent=1)
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
