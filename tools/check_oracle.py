#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against DuckDB oracles on the same parquet tables and diff rigorously.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes to comparable strings
    out = df.copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.round(9)
        elif s.dtype == object:
            out[c] = s.apply(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    out = out.sort_values(by=list(out.columns), kind="mergesort", na_position="last")
    return out.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table dir (e.g. target/sf1.0)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noora = 0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        got = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{d}/*.parquet")],
                        ignore_index=True) if glob.glob(f"{d}/*.parquet") else pd.DataFrame()
        if name not in oracles:
            n_noora += 1
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"  [FAIL-ORACLE-SQL] {name}: {e}")
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            n_fail += 1
            print(f"  [FAIL-SCHEMA] {name}: got {list(g.columns)} vs oracle {list(e.columns)}")
            continue
        if len(g) != len(e):
            n_fail += 1
            print(f"  [FAIL-ROWS] {name}: got {len(g)} vs oracle {len(e)}")
            continue
        try:
            # exact, like the driver's hash compare (floats pre-rounded in canon)
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            n_pass += 1
            print(f"  [PASS] {name} ({len(g)} rows)")
        except AssertionError as ex:
            n_fail += 1
            msg = str(ex).split("\n")[0:6]
            print(f"  [FAIL-VALUES] {name}: " + " | ".join(msg))
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
