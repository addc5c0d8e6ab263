#!/usr/bin/env python3
"""DuckDB denominator for the derived-SF crossover table (SCALE.md).

Runs each Layer-A bench query's committed oracle SQL (from a Verify
dump's oracle_sql.json) against a derived SF dir, CTAS sink, 32
threads, best-of-3 after one warm-up, per-query wall cap via fresh
process. Usage: duck_sf100.py <sfdir> [oracle_sql.json] [cap_s]
"""
import json, os, subprocess, sys, time

QUERIES = ["a01_parquet_scan", "a04_filter", "a06_join_agg", "a08_self_join",
           "a11_groupby_agg", "a16_window_count", "a19_rank_frame"]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_one(sfdir, sql, runs):
    import duckdb
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}/*.parquet')"
                if os.path.isdir(p) else
                f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
    best = None
    for i in range(runs + 1):
        con.execute("DROP TABLE IF EXISTS _sink")
        t0 = time.time()
        con.execute(f"CREATE TEMP TABLE _sink AS {sql}")
        dt = time.time() - t0
        if i > 0:  # first run is warm-up
            best = dt if best is None else min(best, dt)
    return best


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[3] == "--child":
        print(json.dumps(run_one(sys.argv[1], sys.stdin.read(), 3)))
        sys.exit(0)
    sfdir = sys.argv[1]
    oracle = json.load(open(sys.argv[2] if len(sys.argv) > 2
                            else "/tmp/graft_verify/oracle_sql.json"))
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 600
    out = {}
    for q in QUERIES:
        sql = oracle[q]
        try:
            r = subprocess.run(
                [sys.executable, __file__, sfdir, "x", "--child"],
                input=sql, capture_output=True, text=True, timeout=cap)
            out[q] = json.loads(r.stdout.strip()) if r.returncode == 0 \
                else f"error: {r.stderr.strip()[-200:]}"
        except subprocess.TimeoutExpired:
            out[q] = f"timeout>{cap}s"
        print(q, out[q], flush=True)
    print(json.dumps(out))
