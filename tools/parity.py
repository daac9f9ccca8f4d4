#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify output
parquet against DuckDB running SparkEntry.oracleSql on the same tables.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            got = pd.read_parquet(spark_dir)
            want = con.sql(sql).df()
        except Exception as e:
            results[name] = f"ERROR: {str(e)[:200]}"
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            results[name] = f"COLS_MISMATCH spark={list(g.columns)} duck={list(w.columns)}"
            continue
        if len(g) != len(w):
            results[name] = f"ROWS_MISMATCH spark={len(g)} duck={len(w)}"
            continue
        # dtype-aware exact compare
        diffs = []
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                eq = (a.isna() & b.isna()) | (a == b)
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                diffs.append(f"{c}[row {i}]: spark={a[i]!r} duck={b[i]!r}")
        if diffs:
            results[name] = "VALUES_MISMATCH " + "; ".join(diffs[:3])
        else:
            # dtype drift FAILS: the driver's hasher renders e.g. DuckDB
            # HUGEINT (from arithmetic on a bare SUM) differently from the
            # engine's int64 even when every value matches (q103, round 7).
            dt = [f"{c}:{g[c].dtype}!={w[c].dtype}" for c in g.columns
                  if str(g[c].dtype) != str(w[c].dtype)]
            if dt:
                results[name] = f"DTYPE_MISMATCH {';'.join(dt)}"
            else:
                results[name] = f"OK (rows={len(g)})"
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in sorted(results.items()):
        print(f"{k:28s} {v}")
    print(f"\n{n_ok}/{len(results)} parity")
    # rows-only entries
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle:
            try:
                n = len(pd.read_parquet(d))
                print(f"rows-only {name:24s} rows={n}")
            except Exception as e:
                print(f"rows-only {name:24s} ERROR {str(e)[:120]}")

if __name__ == "__main__":
    main()
