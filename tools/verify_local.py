#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <outDir>
Reads each <outDir>/<name> parquet produced by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
source tables, and compares (columns sorted by name, rows sorted, values
stringified with float rounding).
"""
import json, sys, glob, os, re
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
                if v == 0.0:
                    v = 0.0  # -0.0 == 0.0 but formats as "-0": normalize
                v = f"{v:.6g}"
            vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return out

def sparse_q138(sql):
    """Sparse-equivalent rewrite of the q138 oracle for big SFs.

    The shipped oracle enumerates all C(|S|,2) sampled pairs with a
    per-pair list_intersect — fine at sf0.01/sf0.1 (|S| ~ 1e2..1e3),
    hopeless at sf1+ (|S| ~ 1e4 → ~1e8 pairs). This rewrite mirrors the
    operator's OWN sparse design (equi-join on shingle hashes, disjoint
    remainder by arithmetic), so at scale it is a consistency replay,
    not a fully independent oracle — the independent gate stays the
    shipped |S|^2 form at the driver's sf0.01. Same output contract.
    """
    pre, _, rest = sql.partition("pairs AS")
    caught_start = rest.index("caught AS")
    caught_end = rest.index("SELECT CAST(jx // 1000 AS INT)")
    caught = rest[caught_start:caught_end].rstrip().rstrip(",").rstrip()
    return (pre +
        "ex AS (SELECT doc_id, unnest(ss) AS x FROM shs), "
        "sizes AS (SELECT doc_id, len(ss) AS sz FROM shs), "
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i "
        "FROM ex a JOIN ex b ON a.x = b.x AND a.doc_id < b.doc_id GROUP BY 1, 2), "
        "co AS (SELECT i.doc_a, i.doc_b, "
        "(i.i * 10000 + (sa.sz + sb.sz - i.i) // 2) // greatest(sa.sz + sb.sz - i.i, 1) AS jx "
        "FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a "
        "JOIN sizes sb ON sb.doc_id = i.doc_b), "
        + caught + ", "
        "cobins AS (SELECT CAST(jx // 1000 AS INT) AS jx_bin, count(*) AS n_pairs, "
        "count(c.doc_a) AS n_caught FROM co p LEFT JOIN caught c "
        "ON p.doc_a = c.doc_a AND p.doc_b = c.doc_b GROUP BY 1), "
        "tot AS (SELECT (SELECT count(*) FROM sizes) AS n_s, "
        "(SELECT count(*) FROM co) AS n_co, "
        "(SELECT count(*) FROM caught c LEFT JOIN co p "
        "ON p.doc_a = c.doc_a AND p.doc_b = c.doc_b WHERE p.doc_a IS NULL) AS cd FROM (SELECT 1)), "
        "allbins AS (SELECT jx_bin, n_pairs, n_caught FROM cobins "
        "UNION ALL SELECT 0, n_s * (n_s - 1) // 2 - n_co, cd FROM tot) "
        "SELECT jx_bin, CAST(sum(n_pairs) AS BIGINT) AS n_pairs, "
        "CAST(sum(n_caught) AS BIGINT) AS n_caught, "
        "CAST(sum(n_caught) * 10000 // sum(n_pairs) AS BIGINT) AS recall_x10k "
        "FROM allbins GROUP BY 1 HAVING sum(n_pairs) > 0")

def sparse_q166(sql):
    """Sparse-equivalent rewrite of the q166 oracle for big SFs.

    The shipped oracle scores ALL C(N,2) pairs with a per-pair
    list_intersect — the honest complete-recall check at the driver's
    sf0.01, hopeless at sf1 (1.25e9 pairs). Every OUTPUT pair has
    intersection >= 1 (the J >= 0.5 filter requires it), so an
    exploded equi-join on shingle hashes + size arithmetic computes
    the identical output. Like sparse_q138 this makes the big-SF run
    a consistency replay; the independent all-pairs gate stays the
    shipped form at sf0.01. Same output contract.
    """
    pre, _, rest = sql.partition("p AS")
    final_at = rest.rindex("SELECT doc_a, doc_b,")
    final = rest[final_at:]
    return (pre +
        "ex AS (SELECT doc_id, unnest(ss) AS x FROM shs), "
        "sizes AS (SELECT doc_id, len(ss) AS sz FROM shs), "
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "CAST(count(*) AS BIGINT) AS i FROM ex a JOIN ex b "
        "ON a.x = b.x AND a.doc_id < b.doc_id GROUP BY 1, 2), "
        "p AS (SELECT it.doc_a, it.doc_b, it.i, "
        "CAST(sa.sz + sb.sz - it.i AS BIGINT) AS u "
        "FROM inter it JOIN sizes sa ON sa.doc_id = it.doc_a "
        "JOIN sizes sb ON sb.doc_id = it.doc_b) "
        + final)


def apply_sparse(oracle):
    """All registered big-SF sparse-equivalent oracle rewrites."""
    if "q138_banding_recall" in oracle:
        oracle["q138_banding_recall"] = sparse_q138(oracle["q138_banding_recall"])
    if "q166_prefix_filter_pairs" in oracle:
        oracle["q166_prefix_filter_pairs"] = \
            sparse_q166(oracle["q166_prefix_filter_pairs"])
    if "q143_mmr_rerank" in oracle:
        # PURE EVALUATION HINT, zero semantic delta: DuckDB re-inlines
        # a CTE at every reference, and q143's MMR rounds reference the
        # |Q|x|N| `scored` cross join (transitively) dozens of times —
        # measured 60+ min at sf1 vs 8.1 s with the CTEs materialized
        # once. The query TEXT semantics are identical.
        # word-boundary anchors so only the intended CTE names match
        # (a future 'rescored AS (' must not be rewritten)
        q = oracle["q143_mmr_rerank"]
        for cte in ("scored", "cand", "sim"):
            q = re.sub(r"\b" + cte + r" AS \(", cte + " AS MATERIALIZED (", q)
        oracle["q143_mmr_rerank"] = q
    return oracle


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if os.environ.get("VERIFY_SPARSE_Q138") and "q138_banding_recall" in oracle:
        oracle["q138_banding_recall"] = sparse_q138(oracle["q138_banding_recall"])
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
