#!/usr/bin/env python3
"""Plan a sharded verify_json replay of a big-SF Verify dump.

Usage: python3 tools/shard_replay.py <sfDir> <outDir> <artifactPrefix> [nShards]

Prints one shell command per shard. Shard 0 carries the dedup-
clustering consumers and gets --materialize-clusters (the shared
recursive clustering is computed once per process, so all its
consumers must sit in ONE shard); known-slow oracles are spread
across the remaining shards, everything else round-robins by a
cost-balancing greedy. All shards get --sparse-q138 (applies the
documented sparse-equivalent rewrites; no-op for unaffected queries).
Merge with tools/merge_artifacts.py afterwards.
"""
import json, sys

# measured sf1 DuckDB costs (r16 PERF_NOTES) — seconds; default 5.
# Keys MUST be registered query names (oracle_sql.json); main() warns
# on any key that doesn't resolve, so a rename can't silently demote a
# known-slow oracle back to the 5 s default (r17 advice: four stale
# keys skewed shard balance for a round).
SLOW = {"q181_nfd_pack": 1020, "q116_pagerank": 793,
        "q115_dedup_crosscheck": 429, "q67_ngram_jaccard": 480,
        "q64_cc_largestar": 300, "q199_lpa_communities": 300,
        "q179_bfs_depth": 200, "q180_kcore": 200, "q187_hits_scores": 200,
        "q121_triangles": 120, "q166_prefix_filter_pairs": 120,
        "q138_banding_recall": 90, "q143_mmr_rerank": 60}


def main(argv):
    sf_dir, out_dir, prefix = argv[1], argv[2], argv[3]
    n = int(argv[4]) if len(argv) > 4 else 6
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    unknown = sorted(set(SLOW) - set(oracle))
    if unknown:
        print(f"# WARNING: SLOW keys not in oracle_sql.json: {unknown}",
              file=sys.stderr)
    cl = oracle.get("q45_dedup_clusters")
    cluster_consumers = sorted(
        name for name, sql in oracle.items() if cl and cl in sql)
    rest = [name for name in sorted(oracle) if name not in cluster_consumers]
    shards = [list(cluster_consumers)] + [[] for _ in range(n - 1)]
    costs = [600.0] + [0.0] * (n - 1)  # clustering shard pre-charged
    for name in sorted(rest, key=lambda q: -SLOW.get(q, 5)):
        i = min(range(1, n), key=lambda j: costs[j])
        shards[i].append(name)
        costs[i] += SLOW.get(name, 5)
    for i, names in enumerate(shards):
        if not names:
            continue
        flags = "--sparse-q138"
        if i == 0:
            flags += " --materialize-clusters"
        print(f"python3 tools/verify_json.py {sf_dir} {out_dir} "
              f"{prefix}.part{i}.json {flags} --only "
              + ",".join(names))


if __name__ == "__main__":
    main(sys.argv)
