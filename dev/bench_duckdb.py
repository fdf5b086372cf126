#!/usr/bin/env python3
"""Dev-time comparison point: run every recorded oracle SQL in DuckDB
(single-node columnar engine, all cores) over the same parquet tables and
time it — the closest available surrogate for 'reference single-node
throughput' since the reference repo publishes no numbers (BASELINE.md).

Usage: bench_duckdb.py <sfDir> [oracleSource] [runs]

oracleSource may be a graft.Verify output dir (containing oracle_sql.json),
a path to an oracle_sql.json itself, or omitted — in which case the NEWEST
checked-in dev/oracle_sql_r*.json is used, so the DuckDB side of the bench
ratio reproduces in one command with no Verify run first:

    python3 dev/bench_duckdb.py /root/testdata/sf0.1
"""
import glob, json, os, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def resolve_oracles(arg):
    if arg is None:
        here = os.path.dirname(os.path.abspath(__file__))
        # numeric round sort: lexicographic would rank r10 below r5
        import re
        cands = sorted(glob.glob(os.path.join(here, "oracle_sql_r*.json")),
                       key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))
        if not cands:
            sys.exit("no checked-in dev/oracle_sql_r*.json — run graft.Verify "
                     "and pass its output dir, or check one in")
        return cands[-1]
    if os.path.isdir(arg):
        return os.path.join(arg, "oracle_sql.json")
    return arg

def main(sf_dir, oracle_arg=None, runs=2):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    path = resolve_oracles(oracle_arg)
    print(f"oracles: {path}", file=sys.stderr)
    oracles = json.load(open(path))
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
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None,
         int(sys.argv[3]) if len(sys.argv) > 3 else 2)
