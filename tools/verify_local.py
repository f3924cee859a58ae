#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <outDir>
Reads each <outDir>/<name> parquet produced by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
source tables, and compares (columns sorted by name, rows sorted, values
stringified with float rounding).
"""
import json, sys, glob, os
import duckdb

def canon(rows, cols):
    # sort columns by name, stringify values, sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.6g}"
            vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/q*"))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        rel = con.query(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        scols, srows = [d[0] for d in rel.description], rel.fetchall()
        if name not in oracle:
            print(f"ROWS {name}: {len(srows)} rows (no oracle)"); continue
        try:
            orel = con.query(oracle[name])
            ocols, orows = [d[0] for d in orel.description], orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1; continue
        a, b = canon(srows, scols), canon(orows, ocols)
        if a == b:
            print(f"PASS {name}: {len(a)} rows"); n_pass += 1
        else:
            diff = [x for x in a if x not in set(b)][:3]
            diffo = [x for x in b if x not in set(a)][:3]
            print(f"FAIL {name}: {len(a)} vs {len(b)} rows; spark-only={diff} oracle-only={diffo}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
