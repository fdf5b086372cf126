#!/usr/bin/env python3
"""Dev-time mirror of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the recorded DuckDB oracle SQL over the
same testdata tables and compare (a) sorted multisets of Python values
(columns sorted by name) AND (b) the physical Arrow column types of both
results. The driver's hash is representation-sensitive — round 7 proved that
numerically-equal HUGEINT/DECIMAL(38,0) vs BIGINT outputs fail it — so value
equality alone does NOT predict the driver gate; the type check does."""
import json, math, os, re, sys, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # wrap so None sorts (tuples compare element-wise; None gets rank 0)
    if v is None:
        return (0, "")
    if isinstance(v, float) and math.isnan(v):
        return (1, "NaN")
    return (1, v)


def norm_type(t):
    """Canonical string form of an Arrow type: large_* collapses to the
    plain variant and timezone metadata is dropped (Spark stamps UTC on
    instants, DuckDB doesn't; the driver's hash is over values read back
    through pandas where both render identically)."""
    s = str(t)
    s = s.replace("large_string", "string").replace("large_binary", "binary")
    s = re.sub(r", tz=[^)>]*", "", s)
    # timestamp unit (us vs ns) is provably driver-invisible: the 7 window
    # queries where Spark writes timestamp[ns] and DuckDB emits timestamp[us]
    # were all hash-green in CORRECTNESS_r07
    s = re.sub(r"timestamp\[[a-z]+\]", "timestamp", s)
    return s


def type_mismatches(got_schema, exp_schema):
    """Compare physical Arrow types by (lower-cased) column name."""
    gt = {f.name.lower(): norm_type(f.type) for f in got_schema}
    et = {f.name.lower(): norm_type(f.type) for f in exp_schema}
    return [(c, gt[c], et[c]) for c in sorted(set(gt) & set(et)) if gt[c] != et[c]]


def main(sf_dir, out_dir, only=None):
    # optional cap so a long replay (sf1) can share the host with timing
    # work; unset = all cores, the bench-replay default
    threads = os.environ.get("DUCKDB_THREADS")
    con = duckdb.connect(config={"threads": int(threads)} if threads else {})
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    checked = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        checked += 1
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            failures.append((name, "NO SPARK OUTPUT"))
            print(f"FAIL {name}: no spark output"); continue
        try:
            got_rel = f"read_parquet('{res_dir}/*.parquet')"
            # unified schema across ALL part files: the SQL comparison
            # reads the whole glob, so the column/type gate must too — a
            # multi-file output with divergent per-file schemas would
            # otherwise pass on file #1 alone
            part_files = sorted(glob.glob(f"{res_dir}/*.parquet"))
            part_schemas = [pq.read_schema(p) for p in part_files]
            got_schema = part_schemas[0]
            bad = [part_files[i] for i, s in enumerate(part_schemas)
                   if not s.equals(got_schema)]
            if bad:
                raise ValueError(f"part-file schema drift vs {part_files[0]}: {bad}")
            got_cols = [f.name.lower() for f in got_schema]
            exp_arrow = con.execute(sql).arrow()
            exp_cols = [f.name.lower() for f in exp_arrow.schema]
        except Exception as e:
            failures.append((name, f"ERROR {e}"))
            print(f"FAIL {name}: {e}"); continue
        if sorted(got_cols) != sorted(exp_cols):
            failures.append((name, f"cols {sorted(got_cols)} vs {sorted(exp_cols)}"))
            print(f"FAIL {name}: columns {sorted(got_cols)} vs {sorted(exp_cols)}"); continue
        tm = type_mismatches(got_schema, exp_arrow.schema)
        if tm:
            failures.append((name, f"types {tm}"))
            print(f"FAIL {name}: physical type mismatch (spark vs oracle):")
            for c, g, e in tm:
                print(f"  {c}: {g} vs {e}")
            continue
        # Multiset equality ENGINE-SIDE (both-direction EXCEPT ALL + row
        # counts) — columnar and parallel, where fetching every row into
        # Python tuples and sorting took minutes per multi-million-row
        # query at sf1. SQL set ops use IS-NOT-DISTINCT matching, which is
        # STRICTER than the old Python == on one edge (0.0 vs -0.0), so a
        # SQL-path mismatch falls back to the original Python comparator
        # before being declared a failure — slow only when something
        # actually differs.
        try:
            gmap = {f.name.lower(): f.name for f in got_schema}
            emap = {f.name.lower(): f.name for f in exp_arrow.schema}
            cols = sorted(got_cols)
            gsel = ", ".join(f'"{gmap[c]}" AS "{c}"' for c in cols)
            esel = ", ".join(f'"{emap[c]}" AS "{c}"' for c in cols)
            n_got = con.execute(f"SELECT count(*) FROM {got_rel}").fetchone()[0]
            n_exp = exp_arrow.num_rows
            sql_ok = n_got == n_exp and all(
                con.execute(
                    f"SELECT count(*) FROM (SELECT {a} FROM {ra} "
                    f"EXCEPT ALL SELECT {b} FROM {rb})").fetchone()[0] == 0
                for a, ra, b, rb in [(gsel, got_rel, esel, "exp_arrow"),
                                     (esel, "exp_arrow", gsel, got_rel)])
        except Exception:
            sql_ok = False  # nested-type or dialect edge: decide in Python
        if sql_ok:
            print(f"OK   {name} ({n_got} rows)"); continue
        got_rows = con.execute(f"SELECT * FROM {got_rel}").fetchall()
        exp = con.execute("SELECT * FROM exp_arrow")
        exp_rows = exp.fetchall()
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = sorted(tuple(norm(r[i]) for i in gi) for r in got_rows)
        e = sorted(tuple(norm(r[i]) for i in ei) for r in exp_rows)
        if g != e:
            diff = next((i for i, (a, b) in enumerate(zip(g, e)) if a != b), min(len(g), len(e)))
            failures.append((name, f"rows {len(g)} vs {len(e)}"))
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}; first diff at {diff}:")
            print("  got:", g[diff] if diff < len(g) else "<none>")
            print("  exp:", e[diff] if diff < len(e) else "<none>")
        else:
            print(f"OK   {name} ({len(g)} rows)")
    print(f"\n{checked - len(failures)}/{checked} oracle-checked queries match"
          + (f" ({len(oracles) - checked} filtered out)" if checked < len(oracles) else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    # accept space- AND comma-separated query filters; refuse names that
    # match no oracle (a typo'd filter must not silently check nothing)
    only = {n for a in sys.argv[3:] for n in a.split(",") if n} or None
    if only:
        oracle_names = set(json.load(open(f"{sys.argv[2]}/oracle_sql.json")))
        unknown = only - oracle_names
        if unknown:
            sys.exit(f"unknown query names in filter: {sorted(unknown)}")
    main(sys.argv[1], sys.argv[2], only)
