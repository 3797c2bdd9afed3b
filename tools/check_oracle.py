#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each <name> dir in verifyOutDir: load the Spark result parquet, run the
matching oracle SQL from oracle_sql.json in DuckDB (tables = parquet views),
sort columns by name + rows by all columns, and compare values exactly.
"""
import json, os, sys
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        # driver corpora are single files; DataGen-scaled corpora are
        # directories of part files — glob the parts in that case
        p = os.path.join(sf_dir, f"{t}.parquet")
        src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = [d for d in sorted(os.listdir(out_dir))
             if os.path.isdir(os.path.join(out_dir, d))]
    fails = 0
    for name in names:
        got = pd.read_parquet(os.path.join(out_dir, name))
        if name not in oracles:
            status = f"rows-only ({len(got)} rows)" if len(got) else "rows-only EMPTY <-- FAIL"
            fails += 0 if len(got) else 1
            print(f"{name}: {status}")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}")
            fails += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"{name}: SCHEMA MISMATCH spark={list(g.columns)} duckdb={list(w.columns)}")
            fails += 1
            continue
        if len(g) != len(w):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(g)} duckdb={len(w)}")
            fails += 1
            continue
        # The driver hashes rendered values, so a dtype drift (e.g. DuckDB
        # HUGEINT from SUM(int) -> pandas float/object vs Spark int64) fails
        # its hash even when values are numerically equal. Fail it here too.
        dt_bad = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns
                  if str(g[c].dtype) != str(w[c].dtype)]
        if dt_bad:
            print(f"{name}: DTYPE MISMATCH {dt_bad} (cast the oracle column)")
            fails += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            print(f"{name}: OK ({len(g)} rows)")
        except AssertionError as e:
            print(f"{name}: VALUE MISMATCH: {str(e).splitlines()[-1] if str(e) else e}")
            # show a small diff sample
            for c in g.columns:
                neq = (g[c] != w[c]) & ~(g[c].isna() & w[c].isna())
                if neq.any():
                    i = neq.idxmax()
                    print(f"   col {c} first diff at row {i}: spark={g[c][i]!r} duckdb={w[c][i]!r}")
            fails += 1
    print(f"\n{len(names)-fails}/{len(names)} pass")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
