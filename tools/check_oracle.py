#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against DuckDB oracles on the same parquet tables and diff rigorously.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [timesJsonOut]
           [--timeout SEC] [--declare FILE]

With a third argument, per-query DuckDB oracle wall time is recorded to
that JSON file as {query: {"oracle_s": sec, "status": ..., "rows": n}} —
the mechanical baseline side of bench-vs-oracle: engine seconds come from
target/bench.json, oracle seconds from here, both at the same sf. The
file is rewritten after EVERY query, so a killed sweep still leaves a
complete record of what ran.

--timeout SEC interrupts any oracle that exceeds the budget (status
"DNF-timeout" — the mechanical form of the oracle-infeasible-at-scale
class). --declare FILE skips queries listed in a JSON
{query: {"status": ..., "reason": ...}} without running them, recording
the declared status — the known-infeasible classes (full-corpus
recursive-CTE CC, k-means-assignment ENOSPC, census-guard refusals) stay
machine-readable without re-burning hours proving them each round.
Declared queries do NOT count as failures.
"""
import sys, json, glob, os, time, threading
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = sys.argv[1:]
    sf_dir, out_dir = args[0], args[1]
    timeout_s = None
    declared = {}
    if "--timeout" in opts:
        timeout_s = float(opts[opts.index("--timeout") + 1])
    if "--declare" in opts:
        declared = json.load(open(opts[opts.index("--declare") + 1]))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table dir (e.g. target/sf1.0)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    times_out = args[2] if len(args) > 2 else None

    def flush_times(times):
        if times_out:
            with open(times_out, "w") as f:
                json.dump({"sf_dir": sf_dir, "times": times}, f, indent=1,
                          sort_keys=True)

    times = {}
    n_pass = n_fail = n_noora = n_declared = 0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        got = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{d}/*.parquet")],
                        ignore_index=True) if glob.glob(f"{d}/*.parquet") else pd.DataFrame()
        if name in declared:
            n_declared += 1
            times[name] = {"oracle_s": None,
                           "status": declared[name].get("status", "declared"),
                           "reason": declared[name].get("reason"), "rows": None}
            print(f"  [DECLARED {times[name]['status']}] {name}")
            flush_times(times)
            continue
        if name not in oracles:
            n_noora += 1
            times[name] = {"oracle_s": None, "status": "rows-only", "rows": len(got)}
            print(f"  [rows-only] {name}: {len(got)} rows")
            flush_times(times)
            continue
        timer = None
        timed_out = [False]
        if timeout_s:
            def interrupt():
                timed_out[0] = True
                con.interrupt()
            timer = threading.Timer(timeout_s, interrupt)
            timer.start()
        try:
            t0 = time.time()
            exp = con.execute(oracles[name]).df()
            times[name] = {"oracle_s": round(time.time() - t0, 3),
                           "status": "ran", "rows": len(exp)}
        except Exception as e:
            n_fail += 1
            msg = str(e)
            if timed_out[0] or "INTERRUPT" in msg.upper():
                status, n_fail = "DNF-timeout", n_fail - 1  # declared class, not a diff failure
            elif "No space left" in msg or "disk" in msg.lower():
                status = "ENOSPC"
            else:
                status = "oracle-error"
            times[name] = {"oracle_s": round(time.time() - t0, 3),
                           "status": status, "rows": None}
            print(f"  [{status.upper()}] {name}: {msg.splitlines()[0][:200]}")
            flush_times(times)
            continue
        finally:
            if timer:
                timer.cancel()
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            n_fail += 1
            times[name]["status"] = "fail-schema"
            print(f"  [FAIL-SCHEMA] {name}: got {list(g.columns)} vs oracle {list(e.columns)}")
            flush_times(times)
            continue
        if len(g) != len(e):
            n_fail += 1
            times[name]["status"] = "fail-rows"
            print(f"  [FAIL-ROWS] {name}: got {len(g)} vs oracle {len(e)}")
            flush_times(times)
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
        flush_times(times)
    # declared queries with no engine output dir: only a declared class that
    # BY CONTRACT produces no engine parquet (a census-guard refusal throws
    # before any write) is backfilled with its declared status — everything
    # else absent from the output dir was simply not run this sweep (e.g. a
    # narrow SPARK_GRAFT_ONLY subset) and must not read as adjudicated, so
    # it records the distinct status "declared-not-run"
    NO_OUTPUT_BY_CONTRACT = ("REFUSED",)
    for name, d in declared.items():
        if name not in times:
            n_declared += 1
            st = d.get("status", "declared")
            if not st.startswith(NO_OUTPUT_BY_CONTRACT):
                st = "declared-not-run"
            times[name] = {"oracle_s": None, "status": st,
                           "reason": d.get("reason"), "rows": None}
            print(f"  [DECLARED {st}] {name} (no engine output)")
            flush_times(times)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} rows-only, "
          f"{n_declared} declared")
    if times_out:
        flush_times(times)
        print(f"oracle times -> {times_out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
