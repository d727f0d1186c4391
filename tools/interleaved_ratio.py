#!/usr/bin/env python3
"""Adjudicate the 2x proxy gate from ONE interleaved session — the r13
judge's window-proofing demand: three consecutive judge readings
disagreed with the builder's because the Spark and DuckDB sides were
priced in different VM windows (88.7-121.8 s same-tree Spark spread at
flat cpu_st). The fix is structural: `graft.Bench` now runs an
inter-pass command (env SPARK_GRAFT_INTERPASS_CMD) before the first and
after every rep-major pass, so a single session produces

    duck(0) spark-pass(0) duck(1) spark-pass(1) duck(2) spark-pass(2) duck(3)

— every Spark pass bracketed by DuckDB passes, both engines' min-of-N
drawn from the same window.

Usage:
  interleaved_ratio.py <bench_out.json> <duck_pass0.json> [duck_pass1.json ...]

Merges the single-rep DuckDB passes (per-query MIN across passes, same
discipline as the Spark side), writes the merged file next to the first
pass file as duck_merged.json, and prints the whole/core ratios via the
core_ratio recipe (same exclusion lists).

The full interleaved run (repo root):

  SPARK_GRAFT_VERIFY_ONLY=corpus_stats sbt "runMain graft.Verify \
      /root/testdata/sf0.001 /tmp/vout"     # refresh oracle_sql.json
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_INTERPASS_CMD='python3 tools/time_duckdb.py \
      /root/testdata/sf0.1 /tmp/vout/oracle_sql.json 1 \
      > /tmp/duck_pass$GRAFT_PASS.json' \
  sbt "runMain graft.Bench"
  python3 tools/interleaved_ratio.py bench_out.json /tmp/duck_pass*.json
"""
import json
import os
import sys

import core_ratio


def merge(paths):
    passes = [json.load(open(p)) for p in paths]
    queries = {}
    for p in passes:
        for q, t in p["queries"].items():
            queries[q] = t if q not in queries else min(queries[q], t)
    cal = {}
    for p in passes:
        for k, v in p.get("calibration", {}).items():
            cal[k] = v if k not in cal else min(cal[k], v)
    return {
        "total": round(sum(queries.values()), 3),
        "queries": queries,
        "n": len(queries),
        "reps": len(passes),
        "calibration": cal,
        "calibration_per_pass": [p.get("calibration") for p in passes],
        "merged_from": [os.path.basename(p) for p in paths],
        "sf": passes[0].get("sf"),
    }


def main() -> None:
    bench_path, duck_paths = sys.argv[1], sys.argv[2:]
    if not duck_paths:
        sys.exit("need at least one duck_pass json")
    merged = merge(duck_paths)
    out = os.path.join(os.path.dirname(os.path.abspath(duck_paths[0])),
                       "duck_merged.json")
    with open(out, "w") as f:
        json.dump(merged, f)
    print(f"merged {len(duck_paths)} DuckDB passes -> {out} "
          f"(per-query min, n={merged['n']})")
    bench = json.load(open(bench_path))
    inter = bench.get("calibration", {}).get("interpass_sec")
    if not inter:
        print("WARNING: bench has no interpass_sec — this bench was NOT "
              "an interleaved session; the ratio below is cross-window")
    else:
        print(f"interleaved: {len(inter)} DuckDB passes ran inside the "
              f"bench session (walls: {inter})")
    sys.argv = ["core_ratio.py", bench_path, out]
    core_ratio.main()


if __name__ == "__main__":
    main()
