#!/usr/bin/env python3
"""Dev tool: run every oracle SQL in DuckDB at a small SF and record a
result digest per query. Used as the guard while converting oracle texts
to the portable (Spark+DuckDB) SQL subset: dump digests before the edit,
dump after, diff — a conversion must leave DuckDB's answer bit-identical.

Usage:
  python3 tools/oracle_parity.py /tmp/oracles.json /root/testdata/sf0.001 /tmp/digests.json
  python3 tools/oracle_parity.py --diff /tmp/old.json /tmp/new.json
"""
import sys, json, hashlib

def digests(oracles_path, sf, out_path):
    import duckdb
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracles = json.load(open(oracles_path))
    out = {}
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            cols = rel.columns
            rows = rel.fetchall()
            # driver-style: sort columns by name, hash stringified values
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            h = hashlib.sha256()
            h.update(("|".join(cols[i] for i in order)).encode())
            for r in sorted(repr(tuple(r[i] for i in order)) for r in rows):
                h.update(r.encode())
            out[name] = {"rows": len(rows), "digest": h.hexdigest()}
        except Exception as e:
            out[name] = {"err": str(e).split("\n")[0][:200]}
    json.dump(out, open(out_path, "w"), indent=0, sort_keys=True)
    errs = {k: v for k, v in out.items() if "err" in v}
    print(f"{len(out)} oracles, {len(errs)} errors -> {out_path}")
    for k, v in errs.items():
        print(" ERR", k, v["err"])

def diff(a_path, b_path):
    a, b = json.load(open(a_path)), json.load(open(b_path))
    bad = 0
    for k in sorted(set(a) | set(b)):
        va, vb = a.get(k), b.get(k)
        if va != vb:
            bad += 1
            print(f"DIFF {k}: {va} -> {vb}")
    print(f"{bad} differing queries" if bad else "IDENTICAL")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    if sys.argv[1] == "--diff":
        diff(sys.argv[2], sys.argv[3])
    else:
        digests(sys.argv[1], sys.argv[2], sys.argv[3])
