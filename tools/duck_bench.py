#!/usr/bin/env python3
"""DuckDB baseline timings for BASELINE.md: run every oracle SQL from a
graft.Verify dump against the same parquet tables, warm + 3 timed passes,
report per-query medians as one JSON line (mirrors graft.Bench's method).

Usage: duck_bench.py [verify_out_dir] [sf_dir] [threads]
"""
import duckdb, glob, json, os, statistics, sys, time

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf01"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
threads = sys.argv[3] if len(sys.argv) > 3 else "32"

con = duckdb.connect()
con.execute(f"SET threads = {threads}")
for t in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
results, failed = {}, []
for name in sorted(oracle):
    sql = oracle[name]
    try:
        con.execute(sql).fetchall()  # warm-up (also JIT/caches the scan)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        results[name] = round(statistics.median(times), 4)
    except Exception as e:
        failed.append(name)
        sys.stderr.write(f"duck_bench: {name} failed: {e}\n")
total = round(sum(results.values()), 3)
print(json.dumps({"metric": "duckdb_total", "value": total, "unit": "sec",
                  "queries": results, "failed": failed, "sf": sf}))
