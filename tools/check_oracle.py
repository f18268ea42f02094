#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run graft.Verify's
parquet dumps against the DuckDB oracle SQL and compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64") if df[c].isna().any() else df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pq = os.path.join(out_dir, name)
        if not glob.glob(pq + "/*.parquet"):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = pd.read_parquet(pq)
            want = con.execute(sql).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: {str(ex).splitlines()[0][:160]}"); n_fail += 1; continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}"); n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        # exact compare, order-sensitive (queries are totally ordered)
        bad_cols = []
        for c in g.columns:
            if g[c].dtype.kind == 'f' and w[c].dtype.kind == 'f':
                eq = (g[c].values == w[c].values) | (pd.isna(g[c].values) & pd.isna(w[c].values))
            else:
                eq = (g[c].values == w[c].values) | (pd.isna(g[c]).values & pd.isna(w[c]).values)
            if not eq.all():
                i = int(np.argmin(eq))
                bad_cols.append((c, i, g[c].iloc[i], w[c].iloc[i]))
        if bad_cols:
            c, i, gv, wv = bad_cols[0]
            print(f"FAIL {name}: {len(bad_cols)} col(s) differ; first {c}[{i}]: spark={gv!r} oracle={wv!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
