#!/usr/bin/env python3
"""Local pre-check mirroring the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
           [--timeout SECS] [--json OUT.json]

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the same
parquet tables, canonicalizes both (sort columns by name, sort rows),
and reports row/schema/value matches. Dev tooling only — the shipped
Scala library has no Python dependency.

--timeout interrupts a DuckDB oracle query after SECS wall-clock
seconds; the query is reported as TIME (counted separately, NOT a
fail — used by the sf0.5 probe gate where a handful of all-pairs
oracle mirrors are quadratically slower than the engines under test,
and the correctness evidence for those rows is the sf0.01 hash-exact
pass). --json writes a CORRECTNESS-shaped per-query record.
"""
import json, sys, glob, threading, time
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir: str, out_dir: str, timeout: float = 0.0,
         json_out: str = "", only: str = "") -> int:
    import os
    con = duckdb.connect()
    # per-process spill dir: concurrent check_oracle runs sharing one
    # cwd otherwise race on ./.tmp/duckdb_temp_storage-*.tmp and abort
    # with an IOException mid-query (observed r12)
    _tmp = f"/tmp/duckdb_tmp_{os.getpid()}"
    os.makedirs(_tmp, exist_ok=True)
    con.execute(f"PRAGMA temp_directory='{_tmp}'")
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        # driver testdata are single parquet files; Spark-written probe
        # tables (graft.ProbeData) are directories of part files
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        if t == "events":
            # probe events carry ts as raw BIGINT nanos (ProbeData writes
            # the nanosAsLong representation); mirror Tables.events'
            # DIV-1000 nanos -> microsecond-timestamp conversion so the
            # oracle SQL sees the same TIMESTAMP it sees on driver data
            ts_type = [r for r in con.execute("DESCRIBE events").fetchall()
                       if r[0] == "ts"][0][1]
            if ts_type == "BIGINT":
                con.execute("DROP VIEW events")
                con.execute(
                    f"CREATE VIEW events AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*")
                   if not d.endswith(".json"))
    if only:
        pref = only.split(",")
        names = [n for n in names if any(n.startswith(p) for p in pref)]
    n_pass = n_fail = n_time = 0
    record = {}
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1
            record[name] = {"err": "no_output"}
            continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            ok = len(got) > 0
            print(f"{'ok  ' if ok else 'FAIL'} {name}: rows-only ({len(got)} rows)")
            n_pass += ok; n_fail += (not ok)
            record[name] = {"err": "no_oracle" if ok else "empty",
                            "spark_rows": int(len(got))}
            continue
        t0 = time.monotonic()
        timer = None
        if timeout > 0:
            timer = threading.Timer(timeout, con.interrupt)
            timer.start()
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            el = time.monotonic() - t0
            if timeout > 0 and el >= timeout - 0.5:
                print(f"TIME {name}: oracle exceeded {timeout:.0f}s "
                      f"(sf0.01 hash-exact pass is the correctness evidence)")
                n_time += 1
                record[name] = {"err": "oracle_timeout",
                                "spark_rows": int(len(got))}
            else:
                print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1
                record[name] = {"err": f"oracle_error: {e}"[:200]}
            continue
        finally:
            if timer is not None:
                timer.cancel()
        el = time.monotonic() - t0
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            record[name] = {"err": "schema_mismatch"}
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1
            record[name] = {"err": "row_count",
                            "spark_rows": int(len(g)),
                            "oracle_rows": int(len(e))}
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
            print(f"ok   {name}: {len(g)} rows exact ({el:.1f}s oracle)")
            n_pass += 1
            record[name] = {"err": None, "rows": int(len(g)),
                            "oracle_sec": round(el, 1)}
        except AssertionError as ex:
            # retry with tolerance to show whether it's a float-ulp issue
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                              rtol=1e-9, atol=1e-9)
                print(f"WARN {name}: {len(g)} rows match only within 1e-9 "
                      f"(round-boundary risk)"); n_pass += 1
                record[name] = {"err": "within_1e-9", "rows": int(len(g))}
            except AssertionError:
                print(f"FAIL {name}: value mismatch\n"
                      f"{str(ex)[:500]}")
                n_fail += 1
                record[name] = {"err": "value_mismatch"}
    print(f"\n{n_pass} pass, {n_fail} fail"
          + (f", {n_time} oracle-timeout" if n_time else ""))
    if json_out:
        json.dump(record, open(json_out, "w"), indent=1)
    return 1 if n_fail else 0

if __name__ == "__main__":
    opts = sys.argv[1:]
    flagvals = set()
    for f in ("--timeout", "--json", "--only"):
        if f in opts:
            flagvals.add(opts.index(f) + 1)
    args = [a for i, a in enumerate(opts)
            if not a.startswith("--") and i not in flagvals]
    to = float(opts[opts.index("--timeout") + 1]) if "--timeout" in opts else 0.0
    jo = opts[opts.index("--json") + 1] if "--json" in opts else ""
    on = opts[opts.index("--only") + 1] if "--only" in opts else ""
    sys.exit(main(args[0], args[1], to, jo, on))
