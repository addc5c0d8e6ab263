#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only; the
library itself is pure Scala). Usage:
    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"
    python3 tools/check.py /tmp/graft_verify /root/testdata/sf0.01
Compares each <name>.parquet against DuckDB running oracle_sql.json on
the same tables: row count, column-name set, and an order-insensitive
value hash (columns sorted by name, rows sorted, values canonicalized).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame):
    """Returns (canonical_df, dtypes) — values canonicalized for an
    order/width-insensitive compare; dtypes kept for a strictness warning."""
    import datetime, decimal
    df = df.reindex(sorted(df.columns), axis=1)
    dtypes = {c: str(df[c].dtype) for c in df.columns}
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            s = s.astype("bool") if not s.isna().any() else s
        elif s.dtype == object:
            def cv(v):
                if isinstance(v, dict):
                    return str(sorted(v.items()))
                if isinstance(v, (list, tuple)) or type(v).__name__ == 'ndarray':
                    return str([cv(x) for x in list(v)])
                if isinstance(v, (datetime.date, datetime.datetime)):
                    return str(v)
                if isinstance(v, decimal.Decimal):
                    return round(float(v), 6)
                if isinstance(v, float):
                    return round(v, 6)
                return v
            s = s.apply(cv)
        out[c] = s
    df = pd.DataFrame(out)
    # all-null columns: canonicalize to object-None regardless of dtype
    for c in df.columns:
        if df[c].isna().all():
            df[c] = pd.Series([None] * len(df), dtype=object)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True), dtypes


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            # derived-SF tables are DIRECTORIES of part files
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    # Verify.scala emits each oracle under both bare and '<name>.parquet'
    # keys (driver-compat, ADVICE r2); locally use the bare ones only.
    oracles = {k: v for k, v in oracles.items()
               if not (k.endswith(".parquet") and k[:-8] in oracles)}
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        files = glob.glob(f"{outdir}/{name}.parquet/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        (a, ta), (b, tb) = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: cols spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}"); n_fail += 1; continue
        if not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(a)} rows differ; first:")
            idx = bad[bad].index[:3]
            for i in idx:
                print("  spark:", dict(a.loc[i]))
                print("  duck :", dict(b.loc[i]))
            n_fail += 1; continue
        warn = "" if ta == tb else f"  [dtype drift spark={ta} duck={tb}]"
        print(f"PASS {name} ({len(a)} rows){warn}"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
