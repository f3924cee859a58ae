#!/usr/bin/env python3
"""Merge sharded verify_json artifacts into one CORRECTNESS file.

Usage: python3 tools/merge_artifacts.py <out.json> <part1.json> [part2.json ...]

Later parts win on key collision ONLY if the earlier entry errored —
a green result is never overwritten. Prints the green count.
"""
import json, sys


def ok(e):
    return bool(e.get("rows_match") and e.get("schema_match")
                and e.get("hash_match") and not e.get("err"))


def main(argv):
    out, parts = argv[1], argv[2:]
    merged = {}
    for p in parts:
        for k, v in json.load(open(p)).items():
            if k not in merged or (not ok(merged[k]) and ok(v)):
                merged[k] = v
    merged = dict(sorted(merged.items()))
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    n = sum(1 for e in merged.values() if ok(e))
    print(f"{n}/{len(merged)} green -> {out}")
    bad = [k for k, e in merged.items() if not ok(e)]
    if bad:
        print("not green:", bad)
    return 0 if n == len(merged) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
