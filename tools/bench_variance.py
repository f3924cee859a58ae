#!/usr/bin/env python3
"""Merge two back-to-back full Bench records into a BENCH_VARIANCE
artifact: per-query B/A ratio distribution plus totals and loadavg —
the evidence that separates machine-state skew from real plan drift
(VERDICT r17 item 4: a 1.65x driver-vs-builder gap was unattributable
because no same-code variance record existed).

Usage: python3 tools/bench_variance.py runA.json runB.json out.json
"""
import json, sys


def main(argv):
    a = json.load(open(argv[1]))
    b = json.load(open(argv[2]))
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    ratios = {q: round(qb[q] / qa[q], 3) for q in shared if qa[q] > 0.05}
    rs = sorted(ratios.values())
    n = len(rs)
    # n == 0 (no query clears the 50 ms floor) would make pct() index
    # rs[-1] of an empty list; emit nulls rather than crash (r18 advice)
    pct = (lambda p: rs[min(n - 1, int(p * n))]) if n else (lambda p: None)
    total_ratio = (round(b["value"] / a["value"], 3)
                   if a["value"] else None)
    out = {
        "metric": "bench_variance",
        "n_queries_shared": len(shared),
        "n_ratio_eligible": n,  # queries >= 50ms in run A
        "total_a": a["value"], "total_b": b["value"],
        "total_ratio": total_ratio,
        "ratio_p10": pct(0.10), "ratio_p25": pct(0.25),
        "ratio_median": pct(0.50), "ratio_p75": pct(0.75),
        "ratio_p90": pct(0.90),
        "n_over_2x": sum(1 for r in rs if r > 2.0),
        "n_under_half": sum(1 for r in rs if r < 0.5),
        "over_2x": {q: r for q, r in ratios.items() if r > 2.0},
        "under_half": {q: r for q, r in ratios.items() if r < 0.5},
        "loadavg_a": [a["loadavg_start"], a["loadavg_end"]],
        "loadavg_b": [b["loadavg_start"], b["loadavg_end"]],
        "index_build_a": a.get("index_build"),
        "index_build_b": b.get("index_build"),
        "sf": a["sf"],
    }
    json.dump(out, open(argv[3], "w"), indent=1)
    print(json.dumps({k: out[k] for k in (
        "total_a", "total_b", "total_ratio", "ratio_p10", "ratio_median",
        "ratio_p90", "n_over_2x", "n_under_half")}, indent=1))


if __name__ == "__main__":
    main(sys.argv)
