package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QueryPack

/** The graft.dedup registration unit: each entry pairs a
  * registered query with its DuckDB oracle AT THE DECLARATION
  * SITE, so the two can never drift apart (VERDICT r16 item 8;
  * SparkEntry is the union of packs, OracleSqlSpec pins it). */
object DedupPack extends QueryPack {
  val entries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    // training-data pipeline: dedup
    ("q16_dedup_exact",
      (graft.dedup.DedupQueries.exactDedup _),
      graft.dedup.DedupQueries.exactDedupSql),
    ("q17_minhash_bands",
      (graft.dedup.DedupQueries.minHashBands _),
      graft.dedup.DedupQueries.minHashBandsSql),
    ("q18_simhash",
      (graft.dedup.DedupQueries.simHash _),
      graft.dedup.DedupQueries.simHashSql),
    ("q19_minhash_jaccard",
      ((s: SparkSession, d: String) => graft.dedup.DedupQueries.minHashJaccardPairs(s, d)),
      graft.dedup.DedupQueries.minHashJaccardPairsSql),
    // training-data pipeline: keep-lists, stats, sampling, ANN dedup
    ("q28_neardup_keep",
      ((s: SparkSession, d: String) => graft.dedup.DedupQueries.nearDupKeep(s, d)),
      graft.dedup.DedupQueries.nearDupKeepSql),
    // training-data pipeline: transitive-closure dedup clusters
    ("q45_dedup_clusters",
      ((s: SparkSession, d: String) => graft.dedup.DedupQueries.dedupClusters(s, d)),
      graft.dedup.DedupQueries.dedupClustersSql),
    // round-4 registrations: record linkage, rolling features, profiling,
    // JL compression, chunk-level dedup
    ("q49_fuzzy_name_match",
      ((s: SparkSession, d: String) => graft.dedup.DedupQueries.fuzzyNameMatch(s, d)),
      graft.dedup.DedupQueries.fuzzyNameMatchSql),
    // round-5: the SimHash pair consumer (q18's downstream) and the
    // bounded-partition sequence packer (q55's deployed layout)
    ("q62_simhash_pairs",
      ((s: SparkSession, d: String) => graft.dedup.DedupQueries.simHashPairs(s, d)),
      graft.dedup.DedupQueries.simHashPairsSql),
    // round-6: connected components by large-star/small-star contraction
    // (the adversarial-diameter path), same output contract as q45
    ("q64_cc_largestar",
      ((s: SparkSession, d: String) => graft.dedup.DedupQueries.dedupClustersLargeStar(s, d)),
      graft.dedup.DedupQueries.dedupClustersSql),
    ("q67_ngram_jaccard",
      ((s: SparkSession, d: String) => graft.dedup.DedupQueries.charNgramJaccardPairs(s, d)),
      graft.dedup.DedupQueries.charNgramJaccardPairsSql),
    // round-6: incremental batch-vs-corpus dedup (the nightly-crawl shape)
    ("q71_incremental_dedup",
      ((s: SparkSession, d: String) => graft.dedup.DedupQueries.incrementalDedup(s, d)),
      graft.dedup.DedupQueries.incrementalDedupSql),
    // round-7: incremental dedup against the PERSISTED bucketed corpus
    // index — q71's output, the nightly-crawl plan (no corpus exchange)
    ("q75_incremental_dedup_indexed",
      ((s: SparkSession, d: String) => graft.dedup.DedupQueries.incrementalDedupIndexed(s, d)),
      graft.dedup.DedupQueries.incrementalDedupSql),
    // round-8: quality-aware exact-dedup survivor policy
    ("q103_dedup_keep_best",
      (graft.dedup.DedupQueries.dedupKeepBest _),
      graft.dedup.DedupQueries.dedupKeepBestSql),
    // round-8: canonical doc per near-dup cluster (q45 ∘ q103 policy)
    ("q105_cluster_reps",
      ((s: SparkSession, d: String) => graft.dedup.DedupQueries.clusterRepresentatives(s, d)),
      graft.dedup.DedupQueries.clusterRepresentativesSql),
    // round-9: surface-vs-embedding dedup disagreement audit
    ("q115_dedup_crosscheck",
      ((s: SparkSession, d: String) => graft.dedup.DedupQueries.dedupCrossCheck(s, d)),
      graft.dedup.DedupQueries.dedupCrossCheckSql),
    // round-9: integer fixed-point PageRank over the near-dup graph
    ("q116_pagerank",
      ((s: SparkSession, d: String) => graft.dedup.DedupQueries.pageRank(s, d)),
      graft.dedup.DedupQueries.pageRankSql),
    // round-9: degree-oriented triangle counting on the near-dup graph
    ("q121_triangles",
      ((s: SparkSession, d: String) => graft.dedup.DedupQueries.triangleCounts(s, d)),
      graft.dedup.DedupQueries.triangleCountsSql),
    // round-10: near-dup cluster × train/val/test leakage audit
    ("q129_split_leakage",
      ((s: SparkSession, d: String) => graft.dedup.DedupQueries.splitLeakage(s, d)),
      graft.dedup.DedupQueries.splitLeakageSql),
    // round-12: measured LSH banding catch-rate per Jaccard decile —
    // the surface-dedup twin of q112's ANN recall eval
    ("q138_banding_recall",
      (graft.dedup.DedupQueries.bandingRecall _),
      graft.dedup.DedupQueries.bandingRecallSql),
    // round-14: exact prefix-filter set-similarity join — complete
    // recall at J ≥ 1/2, the deterministic twin of q19's banding
    ("q166_prefix_filter_pairs",
      (graft.dedup.DedupQueries.prefixFilterPairs _),
      graft.dedup.DedupQueries.prefixFilterPairsSql),
    // round-15: multi-source BFS min-hop over the customer↔supplier
    // bipartite graph — frontier-only expansion, checkpointed rounds
    ("q179_bfs_depth",
      (graft.dedup.DedupQueries.bfsDepth _),
      graft.dedup.DedupQueries.bfsDepthSql),
    // round-15: k-core peeling — dense-subgraph mining on the same
    // bipartite graph; erosion rounds, each O(surviving edges)
    ("q180_kcore",
      (graft.dedup.DedupQueries.kcoreBipartite _),
      graft.dedup.DedupQueries.kcoreBipartiteSql),
    // round-15: personalized PageRank from the q179 seed cohort —
    // integer fixed-point, seed-neighborhood-sized output
    ("q183_ppr_seeds",
      (graft.dedup.DedupQueries.pprSeeds _),
      graft.dedup.DedupQueries.pprSeedsSql),
    // round-15: deterministic random-walk corpus (DeepWalk sentences) —
    // md5-argmin next-hop, frontier-sized state, |seeds|·(L+1) output
    ("q184_random_walks",
      (graft.dedup.DedupQueries.randomWalks _),
      graft.dedup.DedupQueries.randomWalksSql),
    // round-15: HITS hubs/authorities — mutual-reinforcement dual of the
    // random-walk scores, integer quotient-renorm fixed point
    ("q187_hits_scores",
      (graft.dedup.DedupQueries.hitsScores _),
      graft.dedup.DedupQueries.hitsScoresSql),
    // round-15: exact-recall containment join (quote/excerpt dedup) —
    // rare-first prefix probe vs full gram index, integer verify
    ("q188_containment_pairs",
      (graft.dedup.DedupQueries.containmentPairs _),
      graft.dedup.DedupQueries.containmentPairsSql),
    // round-15: plurality label-propagation communities (fixed rounds)
    ("q199_lpa_communities",
      (graft.dedup.DedupQueries.lpaCommunities _),
      graft.dedup.DedupQueries.lpaCommunitiesSql),
    // round-17: (b,r) banding retune from the measured pair histogram
    ("q258_banding_planner",
      (graft.dedup.DedupQueries.bandingPlanner _),
      graft.dedup.DedupQueries.bandingPlannerSql),
    // round-17: dedup-cluster size telemetry (mega-cluster vs long tail)
    ("q271_cluster_sizes",
      (graft.dedup.DedupQueries.clusterSizeHistogram _),
      graft.dedup.DedupQueries.clusterSizeHistogramSql),
    // round-16: multi-pass sorted-neighborhood blocking (verified pairs)
    ("q275_sorted_neighborhood",
      (graft.dedup.Linkage.sortedNeighborhood _),
      graft.dedup.Linkage.sortedNeighborhoodSql),
    // round-16: Fellegi–Sunter agreement-pattern scoring over SN candidates
    ("q276_fellegi_sunter",
      (graft.dedup.Linkage.fellegiSunter _),
      graft.dedup.Linkage.fellegiSunterSql),
    // round-16: weighted MinHash (replication) + exact weighted-Jaccard audit
    ("q277_weighted_minhash",
      (graft.dedup.Linkage.weightedMinhash _),
      graft.dedup.Linkage.weightedMinhashSql),
  )
}
