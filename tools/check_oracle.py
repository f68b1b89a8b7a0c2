#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against DuckDB oracles on the same parquet tables and diff rigorously.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [timesJsonOut]

With a third argument, per-query DuckDB oracle wall time is recorded to
that JSON file as {query: {"oracle_s": sec, "status": ..., "rows": n}} —
the mechanical baseline side of bench-vs-oracle: engine seconds come from
target/bench.json, oracle seconds from here, both at the same sf.
"""
import sys, json, glob, os, time
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
    times_out = sys.argv[3] if len(sys.argv) > 3 else None
    times = {}
    n_pass = n_fail = n_noora = 0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        got = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{d}/*.parquet")],
                        ignore_index=True) if glob.glob(f"{d}/*.parquet") else pd.DataFrame()
        if name not in oracles:
            n_noora += 1
            times[name] = {"oracle_s": None, "status": "rows-only", "rows": len(got)}
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        try:
            t0 = time.time()
            exp = con.execute(oracles[name]).df()
            times[name] = {"oracle_s": round(time.time() - t0, 3),
                           "status": "ran", "rows": len(exp)}
        except Exception as e:
            n_fail += 1
            times[name] = {"oracle_s": None, "status": "oracle-error", "rows": 0}
            print(f"  [FAIL-ORACLE-SQL] {name}: {e}")
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            n_fail += 1
            times[name]["status"] = "fail-schema"
            print(f"  [FAIL-SCHEMA] {name}: got {list(g.columns)} vs oracle {list(e.columns)}")
            continue
        if len(g) != len(e):
            n_fail += 1
            times[name]["status"] = "fail-rows"
            print(f"  [FAIL-ROWS] {name}: got {len(g)} vs oracle {len(e)}")
            continue
        try:
            # exact, like the driver's hash compare (floats pre-rounded in canon)
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            n_pass += 1
            times[name]["status"] = "pass"
            print(f"  [PASS] {name} ({len(g)} rows)")
        except AssertionError as ex:
            n_fail += 1
            times[name]["status"] = "fail-values"
            print(f"  [FAIL-VALUES] {name}: " + " | ".join(str(ex).split("\n")[0:6]))
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} rows-only")
    if times_out:
        with open(times_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "times": times}, f, indent=1, sort_keys=True)
        print(f"oracle times -> {times_out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
