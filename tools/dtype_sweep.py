#!/usr/bin/env python3
"""Static dtype sweep: DESCRIBE every oracleSql query in DuckDB and flag
output columns whose type would hash differently from Spark's output
(HUGEINT/INT128 from arithmetic on bare SUM(), DECIMAL residue, INT32
narrowing). Run against any oracle_sql.json dumped by graft.Verify.

Usage: python3 tools/dtype_sweep.py <sfDir> <oracle_sql.json>
"""
import sys, os, json, glob
import duckdb

SUSPECT = ("HUGEINT", "INT128", "UHUGEINT", "DECIMAL")

def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(oracle_path))
    bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.sql(f"DESCRIBE ({sql})").fetchall()
        except Exception as e:
            print(f"{name:28s} DESCRIBE_ERROR {str(e)[:140]}")
            bad += 1
            continue
        hits = [f"{c}:{t}" for c, t, *_ in desc if any(s in t.upper() for s in SUSPECT)]
        if hits:
            print(f"{name:28s} SUSPECT {'; '.join(hits)}")
            bad += 1
    print(f"\n{bad} suspect / {len(oracle)} oracles")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
