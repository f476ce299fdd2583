#!/usr/bin/env python3
"""Machine-checkable per-query 2x report: Spark wall (BENCH local blob)
vs the DuckDB oracle wall (check.py's oracle_timing.json), with a fixed
overhead floor so sub-second entries dominated by Spark's per-query
scheduling cost don't read as plan defects.

Usage: python3 tools/perf2x.py [bench_json] [timing_json] [out_json]
Defaults: BENCH_last_local.json target/verify_out/oracle_timing.json
          PERF2X_last.json
Exit 1 iff any query is flagged (> RATIO_BAR x oracle AND above the
floor) — the round log commits the artifact either way.
"""
import json, sys

RATIO_BAR = 2.0
FLOOR_SEC = 1.5  # Spark fixed per-query cost at small SF (driver+AQE+IO setup)

bench_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_last_local.json"
timing_path = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out/oracle_timing.json"
out_path = sys.argv[3] if len(sys.argv) > 3 else "PERF2X_last.json"

bench = json.load(open(bench_path))
oracle_ms = json.load(open(timing_path))["oracle_ms"]

entries = {}
flagged = []
for q, spark_s in sorted(bench["queries"].items()):
    o = oracle_ms.get(q)
    if o is None:
        entries[q] = {"spark_s": round(spark_s, 3), "oracle_s": None,
                      "ratio": None, "note": "rows-only (no SQL oracle)"}
        continue
    oracle_s = o / 1000.0
    ratio = round(spark_s / oracle_s, 2) if oracle_s > 0 else None
    e = {"spark_s": round(spark_s, 3), "oracle_s": round(oracle_s, 3),
         "ratio": ratio}
    if ratio is not None and ratio > RATIO_BAR and spark_s > FLOOR_SEC:
        e["flagged"] = True
        flagged.append(q)
    entries[q] = e

out = {
    "ratio_bar": RATIO_BAR,
    "floor_sec": FLOOR_SEC,
    "sf": bench.get("sf"),
    "spark_total_s": round(sum(bench["queries"].values()), 1),
    "oracle_total_s": round(sum(oracle_ms.values()) / 1000.0, 1),
    "flagged": flagged,
    "queries": entries,
}
with open(out_path, "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(f"PERF2X: {len(flagged)} flagged of {len(entries)} "
      f"(bar {RATIO_BAR}x above {FLOOR_SEC}s); "
      f"spark {out['spark_total_s']}s vs oracle {out['oracle_total_s']}s")
for q in flagged:
    print(f"  [2X] {q}: spark {entries[q]['spark_s']}s "
          f"vs oracle {entries[q]['oracle_s']}s ({entries[q]['ratio']}x)")
sys.exit(1 if flagged else 0)
