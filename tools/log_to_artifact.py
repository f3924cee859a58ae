#!/usr/bin/env python3
"""Reconstruct a partial CORRECTNESS artifact from a verify_json log.

verify_json.py prints one line per query as it goes but writes its JSON
only at the end; if a long at-scale replay is interrupted, this recovers
the completed entries (PASS lines carry rows; FAIL/ERR carry the state).

Usage: python3 tools/log_to_artifact.py <log> <artifact.json>
"""
import json, re, sys


def main(log, artifact):
    out = {}
    pat = re.compile(r"^(PASS|FAIL|ERR|ROWS)\s+(\S+?):\s+(.*)$")
    rows = re.compile(r"spark=(\d+) oracle=(\d+)")
    for ln in open(log):
        m = pat.match(ln.strip())
        if not m:
            continue
        st, name, rest = m.groups()
        e = {"rows_match": False, "schema_match": False, "hash_match": False,
             "spark_rows": None, "oracle_rows": None, "err": None}
        rm = rows.search(rest)
        if rm:
            e["spark_rows"], e["oracle_rows"] = int(rm.group(1)), int(rm.group(2))
        if st == "PASS":
            e["rows_match"] = e["schema_match"] = e["hash_match"] = True
        elif st == "ERR":
            e["err"] = rest
        out[name] = e
    with open(artifact, "w") as f:
        json.dump(out, f, indent=1)
    n = sum(1 for e in out.values() if e["hash_match"])
    print(f"{n}/{len(out)} green -> {artifact}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
