#!/usr/bin/env python3
"""Dev-time comparison point: run every recorded oracle SQL in DuckDB
(single-node columnar engine, all cores) over the same parquet tables and
time it — the closest available surrogate for 'reference single-node
throughput' since the reference repo publishes no numbers (BASELINE.md).
Usage: bench_duckdb.py <sfDir> <verifyOutDirWithOracleJson> [runs]"""
import json, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, runs=2):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name, sql in sorted(oracles.items()):
        best = None
        for _ in range(runs):
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
                dt = time.time() - t0
            except Exception as e:
                dt = -1.0
                print(f"ERR {name}: {e}", file=sys.stderr)
                break
            best = dt if best is None else min(best, dt)
        times[name] = best
    total = sum(v for v in times.values() if v and v > 0)
    print(json.dumps({"metric": "duckdb_total", "value": total, "unit": "sec",
                      "queries": times, "sf": sf_dir}))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 2)
