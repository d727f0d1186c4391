#!/usr/bin/env python3
"""Time the declared oracle SQL in DuckDB over an sf dir — the judge's
vs-baseline proxy recipe, persisted so it stops being re-derived each
round.

Usage: time_duckdb.py <sfDir> <oracle_sql.json> [reps]

Registers each parquet table as a plain view (exactly as
check_oracle.py does — oracle SQL handles the events nanos column
itself), then times every oracle query `reps` times (default 3) and
reports the per-query MIN and the total — the same min-of-N discipline
graft.Bench uses. Output: one JSON line
{"total": s, "queries": {...}, "n": k}.

Compare against the SAME subset of a graft.Bench run:
  python3 - <<'EOF'
  import json
  bench = json.load(open("/tmp/bench_sf01.json"))
  duck  = json.load(open("/tmp/duck_sf01.json"))
  spark = sum(bench["queries"][q] for q in duck["queries"])
  print(f'spark {spark:.2f}s vs duckdb {duck["total"]:.2f}s '
        f'= {spark/duck["total"]:.2f}x over {duck["n"]} oracle queries')
  EOF
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def calibrate(con) -> dict:
    """Fixed-workload VM-speed sentinels, the DuckDB-side mirror of
    graft.Bench's cpu_st/spark_job calibration: cross-session totals are
    only comparable through a same-file denominator (the r12 audit's 2.08x
    vs 1.61x disagreement was ENTIRELY an uncalibrated DuckDB run). Two
    readings: a pure-Python single-thread loop (the VM's scalar speed,
    engine-independent) and a fixed DuckDB aggregate (the engine actually
    being timed). Not folded into any query time."""
    t0 = time.perf_counter()
    x, acc = 0x9E3779B97F4A7C15, 0
    for _ in range(4_000_000):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        acc = (acc + x) & 0xFFFFFFFFFFFFFFFF
    cpu = time.perf_counter() - t0
    t0 = time.perf_counter()
    con.execute("SELECT sum(range % 1000003) FROM range(50000000)").fetchall()
    duck = time.perf_counter() - t0
    return {"cpu_st_py": round(cpu, 3), "duck_fixed": round(duck, 3)}


def main() -> None:
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    oracles = json.load(open(oracle_path))
    # untimed as always (BASELINE.md since round 10): this oracle is the
    # DELIBERATELY quadratic all-pairs replay — at sf0.1 it grinds 12.5M
    # list intersections per rep, and the proxy never compares it anyway
    oracles.pop("exact_jaccard_join", None)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    cal_open = calibrate(con)
    times = {}
    for name, sql in sorted(oracles.items()):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 4)
    # closing reading, min with the opening one (same discipline as
    # Bench): a sustained slowdown shows as a HIGH min, a transient
    # throttle window as open != close
    cal_close = calibrate(con)
    cal = {k: min(cal_open[k], cal_close[k]) for k in cal_open}
    print(json.dumps({"total": round(sum(times.values()), 3),
                      "queries": times, "n": len(times), "reps": reps,
                      "calibration": cal, "sf": sf_dir}))


if __name__ == "__main__":
    main()
