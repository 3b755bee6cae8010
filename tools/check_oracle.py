#!/usr/bin/env python3
"""Local pre-check mirroring the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the same
parquet tables, canonicalizes both (sort columns by name, sort rows),
and reports row/schema/value matches. Dev tooling only — the shipped
Scala library has no Python dependency.
"""
import json, sys, glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*")
                   if not d.endswith(".json"))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            ok = len(got) > 0
            print(f"{'ok  ' if ok else 'FAIL'} {name}: rows-only ({len(got)} rows)")
            n_pass += ok; n_fail += (not ok); continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
            print(f"ok   {name}: {len(g)} rows exact"); n_pass += 1
        except AssertionError as ex:
            # retry with tolerance to show whether it's a float-ulp issue
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                              rtol=1e-9, atol=1e-9)
                print(f"WARN {name}: {len(g)} rows match only within 1e-9 "
                      f"(round-boundary risk)"); n_pass += 1
            except AssertionError:
                print(f"FAIL {name}: value mismatch\n"
                      f"{str(ex)[:500]}")
                n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
