#!/usr/bin/env python3
"""Driver-format correctness artifact from a graft.Verify dump.

Like tools/verify_local.py but emits the driver's CORRECTNESS JSON
shape ({name: {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err}}) so at-scale replays (sf1/sf3) land as first-class
artifacts. Hash = md5 over the canonicalized (columns sorted by name,
float-rounded, row-sorted) value matrix - the same compare contract.

Usage: python3 tools/verify_json.py <sfDir> <outDir> <artifact.json>
       [--sparse-q138] [--only name1,name2]
"""
import hashlib, json, sys, glob, os, time
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from verify_local import canon, apply_sparse

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def digest(lines):
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()


def main(argv):
    sf_dir, out_dir, artifact = argv[1], argv[2], argv[3]
    sparse = "--sparse-q138" in argv
    only = None
    if "--only" in argv:
        only = set(argv[argv.index("--only") + 1].split(","))
    # Parallel shard replays MUST cap per-process threads: six DuckDB
    # processes each defaulting to all 32 cores put ~190 runnable
    # threads on the box (loadavg 111 measured, r18) and the heavy
    # oracles stopped making progress. 5 threads x 6 shards ~= the
    # machine, no thrash.
    threads = os.environ.get("GRAFT_DUCKDB_THREADS")
    con = duckdb.connect(
        config={"threads": int(threads)} if threads else {})
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    errors = {}
    epath = f"{out_dir}/errors.json"
    if os.path.exists(epath):
        errors = json.load(open(epath))
    if sparse:
        oracle = apply_sparse(oracle)
    if "--materialize-clusters" in argv and "q45_dedup_clusters" in oracle:
        # Seven oracles embed the identical recursive dedup-clustering
        # text (q45's whole oracle). At big SFs that clustering is the
        # dominant DuckDB cost (~25 min at sf1); compute it ONCE into a
        # temp table and substitute. Still a consistency replay: DuckDB
        # computes the clustering itself, exactly once, and every
        # consumer is hash-checked against that one computation.
        cl = oracle["q45_dedup_clusters"]
        print("materializing shared dedup clustering ...", flush=True)
        t0 = time.time()
        con.execute(f"CREATE TABLE cl_mat AS {cl}")
        print(f"  done in {time.time()-t0:.0f}s", flush=True)
        sub = "SELECT doc_id, cluster FROM cl_mat"
        for name in list(oracle):
            if cl in oracle[name]:
                oracle[name] = oracle[name].replace(cl, sub)
    names = sorted(set(os.path.basename(p) for p in glob.glob(f"{out_dir}/q*"))
                   | set(errors))
    result = {}
    for name in names:
        if only and name not in only:
            continue
        t0 = time.time()
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "spark_rows": None,
                 "oracle_rows": None, "err": None}
        result[name] = entry
        if name in errors:
            entry["err"] = f"spark: {errors[name]}"
            print(f"ERR  {name}: spark-side failure", flush=True)
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            entry["err"] = "no spark output"
            print(f"ERR  {name}: no spark output", flush=True)
            continue
        rel = con.query(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        scols, srows = [d[0] for d in rel.description], rel.fetchall()
        entry["spark_rows"] = len(srows)
        if name not in oracle:
            entry["err"] = "no_oracle"
            print(f"ROWS {name}: {len(srows)} rows (no oracle)", flush=True)
            continue
        try:
            orel = con.query(oracle[name])
            ocols, orows = [d[0] for d in orel.description], orel.fetchall()
        except Exception as e:
            entry["err"] = f"oracle error: {e}"
            print(f"ERR  {name}: oracle {e}", flush=True)
            continue
        entry["oracle_rows"] = len(orows)
        entry["rows_match"] = len(srows) == len(orows)
        entry["schema_match"] = sorted(scols) == sorted(ocols)
        if entry["schema_match"]:
            entry["hash_match"] = digest(canon(srows, scols)) == \
                digest(canon(orows, ocols))
        ok = entry["rows_match"] and entry["schema_match"] and entry["hash_match"]
        print(f"{'PASS' if ok else 'FAIL'} {name}: spark={len(srows)} "
              f"oracle={len(orows)} ({time.time()-t0:.1f}s)", flush=True)
    with open(artifact, "w") as f:
        json.dump(result, f, indent=1)
    n_pass = sum(1 for e in result.values()
                 if e["rows_match"] and e["schema_match"] and e["hash_match"])
    print(f"== {n_pass}/{len(result)} green -> {artifact} ==")
    return 0 if n_pass == len(result) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
