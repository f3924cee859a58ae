package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dedup.DedupQueries
import graft.ml.MLQueries
import graft.ops.RelationalQueries
import graft.sim.SimilarityQueries
import graft.text.{Scrub, TextQueries}

/** Driver contract — one named query per implemented operator from
  * SURVEY.md §2 (+ the training-data-pipeline extensions), each with a
  * DuckDB oracle where ANSI-SQL-expressible.
  */
object SparkEntry {

  /** Flagship: the reference's full rule-tag composition (P8/P9/P10 +
    * A1/A4/W2) on sf0.001 orders. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.ruleTags(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1-2.5: scans, aggregates, windows, joins
    "q01_scan_filter_project" -> (RelationalQueries.scanFilterProject _),
    "q02_group_agg"           -> (RelationalQueries.groupAgg _),
    "q03_having_filter"       -> (RelationalQueries.havingFilter _),
    "q04_window_flag"         -> (RelationalQueries.windowFlag _),
    "q05_quantile_p99"        -> (RelationalQueries.quantileP99 _),
    "q06_lag_datediff"        -> (RelationalQueries.lagDatediff _),
    "q07_anomaly_threshold"   -> (RelationalQueries.anomalyThreshold _),
    "q08_rule_tags"           -> (RelationalQueries.ruleTags _),
    "q09_value_counts_top"    -> (RelationalQueries.valueCountsTop _),
    "q12_date_format"         -> (RelationalQueries.dateFormat _),
    "q13_join_revenue"        -> (RelationalQueries.joinRevenue _),
    "q14_window_topn"         -> (RelationalQueries.windowTopN _),
    "q15_anti_join"           -> (RelationalQueries.antiJoin _),
    "q27_sessionize"          -> (RelationalQueries.sessionize _),
    "q32_asof_join"           -> (RelationalQueries.asofJoin _),
    "q33_tumbling_window"     -> (RelationalQueries.tumblingWindow _),
    "q34_rollup"              -> (RelationalQueries.rollupStats _),
    "q35_pivot"               -> (RelationalQueries.pivotLangCounts _),
    "q36_json_extract"        -> (RelationalQueries.jsonExtract _),
    "q41_window_ranks"        -> (RelationalQueries.windowRanks _),
    "q37_topk_agg"            -> ((s: SparkSession, d: String) => graft.ops.TopKAggregator.topBalancePerNation(s, d)),
    "q38_set_ops"             -> (RelationalQueries.setOps _),
    // §2.6: feature encoding + autoencoder
    "q10_feature_encode"      -> (MLQueries.featureEncode _),
    "q11_autoencoder_score"   -> (MLQueries.autoencoderScore _),
    // training-data pipeline: dedup
    "q16_dedup_exact"         -> (DedupQueries.exactDedup _),
    "q17_minhash_bands"       -> (DedupQueries.minHashBands _),
    "q18_simhash"             -> (DedupQueries.simHash _),
    "q19_minhash_jaccard"     -> ((s: SparkSession, d: String) => DedupQueries.minHashJaccardPairs(s, d)),
    // training-data pipeline: similarity search
    "q20_cosine_topk"         -> ((s: SparkSession, d: String) => SimilarityQueries.cosineTopK(s, d)),
    "q21_cosine_lsh"          -> ((s: SparkSession, d: String) => SimilarityQueries.cosineLshPairs(s, d)),
    // training-data pipeline: text analysis + multimodal plumbing
    "q22_langid"              -> (TextQueries.langId _),
    "q23_text_quality"        -> (TextQueries.quality _),
    "q24_token_count"         -> (TextQueries.tokenCount _),
    "q25_fingerprint"         -> (TextQueries.fingerprint _),
    "q26_multimodal_meta"     -> (TextQueries.multimodalMeta _),
    // training-data pipeline: keep-lists, stats, sampling, ANN dedup
    "q28_neardup_keep"        -> ((s: SparkSession, d: String) => DedupQueries.nearDupKeep(s, d)),
    "q29_corpus_stats"        -> (TextQueries.corpusStats _),
    "q30_stratified_sample"   -> (TextQueries.stratifiedSample _),
    "q31_embedding_neardup"   -> ((s: SparkSession, d: String) => SimilarityQueries.embeddingNearDup(s, d)),
    "q39_chunking"            -> (TextQueries.chunkDocs _),
    "q40_vocab"               -> (TextQueries.vocab _),
    // training-data pipeline: corpus cleaning
    "q42_pii_redact"          -> (Scrub.piiRedact _),
    "q43_repetition"          -> (Scrub.repetition _),
    // training-data pipeline: IVF similarity-search scale path
    "q44_ivf_topk"            -> ((s: SparkSession, d: String) => SimilarityQueries.ivfTopK(s, d)),
    // training-data pipeline: transitive-closure dedup clusters
    "q45_dedup_clusters"      -> ((s: SparkSession, d: String) => DedupQueries.dedupClusters(s, d)),
    // training-data pipeline: benchmark decontamination
    "q46_decontaminate"       -> (Scrub.decontaminate _),
    // custom-plan showcase: native as-of join (LogicalPlan+Strategy+SparkPlan)
    "q47_asof_native"         -> (RelationalQueries.asofJoinNative _),
    // training-data pipeline: end-to-end curation keep-list
    "q48_curated_corpus"      -> (Scrub.curatedCorpus _),
    // round-4 registrations: record linkage, rolling features, profiling,
    // JL compression, chunk-level dedup
    "q49_fuzzy_name_match"    -> ((s: SparkSession, d: String) => DedupQueries.fuzzyNameMatch(s, d)),
    "q50_moving_avg"          -> (RelationalQueries.movingAvg _),
    "q51_group_quantiles"     -> (RelationalQueries.groupQuantiles _),
    "q52_histogram"           -> (RelationalQueries.histogram _),
    "q53_random_projection"   -> ((s: SparkSession, d: String) => SimilarityQueries.randomProjection(s, d)),
    "q54_chunk_dedup"         -> (Scrub.chunkDedup _),
    // round-4 additions: sequence packing, banded range join, TF-IDF,
    // bloom runtime-filter decontamination, inverted index, weighted
    // deterministic sampling
    "q55_sequence_pack"       -> (graft.text.CorpusOps.sequencePack _),
    "q56_range_join"          -> (RelationalQueries.rangeJoin _),
    "q57_tfidf"               -> (graft.text.CorpusOps.tfIdf _),
    "q58_bloom_decontaminate" -> (Scrub.bloomDecontaminate _),
    "q59_inverted_index"      -> (graft.text.CorpusOps.invertedIndex _),
    "q60_weighted_sample"     -> (graft.text.CorpusOps.weightedSample _),
    // round-5: the quantile scale path (approx-bracket exact percentiles)
    // as its own oracle-checked query
    "q61_quantile_approx"     -> (graft.ops.Quantiles.quantileApprox _),
    // round-5: the SimHash pair consumer (q18's downstream) and the
    // bounded-partition sequence packer (q55's deployed layout)
    "q62_simhash_pairs"       -> ((s: SparkSession, d: String) => DedupQueries.simHashPairs(s, d)),
    "q63_sequence_pack_bucketed" -> (graft.text.CorpusOps.sequencePackBucketed _),
    // round-6: connected components by large-star/small-star contraction
    // (the adversarial-diameter path), same output contract as q45
    "q64_cc_largestar"        -> ((s: SparkSession, d: String) => DedupQueries.dedupClustersLargeStar(s, d)),
    // round-6: deterministic sketches (KMV distinct, count-min), the
    // hash-free third dedup family, and three classic warehouse shapes
    // (cube, salted join, ordered funnel)
    "q65_kmv_distinct"        -> (graft.ops.Sketches.kmvDistinct _),
    "q66_countmin_freq"       -> (graft.ops.Sketches.countMinFreq _),
    "q67_ngram_jaccard"       -> ((s: SparkSession, d: String) => DedupQueries.charNgramJaccardPairs(s, d)),
    "q68_cube_agg"            -> (RelationalQueries.cubeAgg _),
    "q69_salted_join"         -> (RelationalQueries.saltedJoinRevenue _),
    "q70_event_funnel"        -> (RelationalQueries.eventFunnel _),
    // round-6: incremental batch-vs-corpus dedup (the nightly-crawl shape)
    "q71_incremental_dedup"   -> ((s: SparkSession, d: String) => DedupQueries.incrementalDedup(s, d)),
    // round-6: k-NN majority-label propagation (embedding-space eval op)
    "q72_knn_label"           -> ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.knnLabel(s, d)),
    // round-6: mixture resampling to target language proportions
    "q73_mixture_sample"      -> (graft.text.CorpusOps.mixtureSample _),
    // round-6: frame-sampling plumbing (the video-pipeline grain)
    "q74_frame_sample"        -> (graft.text.TextQueries.frameSample _),
    // round-7: incremental dedup against the PERSISTED bucketed corpus
    // index — q71's output, the nightly-crawl plan (no corpus exchange)
    "q75_incremental_dedup_indexed" -> ((s: SparkSession, d: String) => DedupQueries.incrementalDedupIndexed(s, d)),
    // round-7: label propagation composed over the IVF ANN stage
    // (probe-all ≡ exact ⇒ same oracle as q72)
    "q76_knn_label_ivf"       -> ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.knnLabelIvf(s, d)),
    // round-7: exact-quota mixture sampling as a threshold FILTER
    // (order-statistic per lang) — q73's beyond-buffer scale path
    "q77_quota_sample_threshold" -> (graft.text.CorpusOps.quotaSampleThreshold _),
    // round-8: IVF top-k against the PERSISTED codebook + list tables
    // (same search semantics ⇒ same oracle as q44)
    "q78_ivf_topk_indexed"    -> ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.ivfTopKIndexed(s, d)),
    // round-8: product-quantized ADC search over the compressed store
    "q79_pq_topk"             -> ((s: SparkSession, d: String) => graft.sim.ProductQuantization.pqTopK(s, d)),
    // round-8: IVF-PQ two-level composition (probe-all ≡ q79 ⇒ same oracle)
    "q80_ivfpq_topk"          -> ((s: SparkSession, d: String) => graft.sim.ProductQuantization.ivfPqTopK(s, d)),
    // round-8: IVF-PQ against the PERSISTED bucketed code table
    "q81_ivfpq_indexed"       -> ((s: SparkSession, d: String) => graft.sim.ProductQuantization.ivfPqTopKIndexed(s, d)),
    // round-8: BM25 retrieval scoring (the ranking complement of q59)
    "q82_bm25_search"         -> ((s: SparkSession, d: String) => graft.text.CorpusOps.bm25Search(s, d)),
    // round-8: end-to-end corpus build (curate ∘ near-dup collapse ∘ pack)
    "q83_corpus_build"        -> ((s: SparkSession, d: String) => graft.text.CorpusOps.corpusBuild(s, d)),
    // round-8: bigram-LM cross-entropy quality scoring (CCNet-style filter)
    "q84_lm_score"            -> ((s: SparkSession, d: String) => graft.text.TextQueries.lmScore(s, d)),
    // round-8: deterministic content-hash train/val/test split (pure map)
    "q85_deterministic_split" -> (graft.text.CorpusOps.deterministicSplit _),
    // round-8: cross-doc boilerplate n-gram fraction (C4-style template filter)
    "q86_boilerplate"         -> ((s: SparkSession, d: String) => graft.text.Scrub.boilerplate(s, d)),
    // round-8: BPE merge-candidate pair statistics (the SQL-expressible
    // face of the tokenizer trainer; the merge loop itself is BpeSpec)
    "q87_bpe_pairs"           -> ((s: SparkSession, d: String) => graft.text.Bpe.pairStats(s, d)),
    // round-8: SemDeDup-style embedding-space near-dup drop list
    "q88_semantic_dedup"      -> ((s: SparkSession, d: String) => SimilarityQueries.semanticDedup(s, d)),
    // round-8: temperature-scaled (α=1/2) mixture resampling, integer-exact
    "q89_temperature_mixture" -> (graft.text.CorpusOps.temperatureMixture _),
    // round-8: PMI collocation mining over adjacent token pairs
    "q90_pmi_collocations"    -> ((s: SparkSession, d: String) => graft.text.TextQueries.collocations(s, d)),
    // round-8: Misra–Gries heavy hitters — bounded sketch finds the
    // candidates, an exact recount answers (no estimate in the output)
    "q91_heavy_hitters"       -> (graft.ops.Sketches.heavyHitters _),
    // round-8: exponentially time-decayed per-user activity score
    "q92_decayed_activity"    -> (RelationalQueries.decayedActivity _),
    // round-8: median/MAD robust outliers (grouped bracket quantiles ×2)
    "q93_robust_outliers"     -> (RelationalQueries.robustOutliers _),
    // round-8: Naive Bayes lang classifier, trained AND scored in-plan
    "q94_naive_bayes"         -> ((s: SparkSession, d: String) => graft.text.TextQueries.naiveBayesLang(s, d)),
    // round-8: cross-source 8-gram contamination matrix
    "q95_source_overlap"      -> ((s: SparkSession, d: String) => graft.text.Scrub.sourceOverlap(s, d)),
    // round-8: centroid-based label-noise audit over the embeddings
    "q96_label_audit"         -> ((s: SparkSession, d: String) => SimilarityQueries.labelAudit(s, d)),
    // round-8: unigram entropy + type-token ratio quality signals
    "q97_lexical_diversity"   -> ((s: SparkSession, d: String) => graft.text.TextQueries.lexicalDiversity(s, d)),
    // round-8: equi-depth decile binning from exact bracket percentiles
    "q98_equidepth_bins"      -> (RelationalQueries.equiDepthBins _),
    // round-8: grouped Pearson corr / covariance co-moments
    "q99_comoment_stats"      -> (RelationalQueries.comomentStats _),
    // round-8: MOSS winnowing fingerprints + excerpt-sharing pairs
    "q100_winnow_pairs"       -> ((s: SparkSession, d: String) => graft.text.Scrub.winnowPairs(s, d)),
    // round-8: deterministic contrastive negative sampling
    "q101_negative_pairs"     -> ((s: SparkSession, d: String) => SimilarityQueries.negativePairs(s, d)),
    // round-8: per-language heavy hitters (grouped MG + exact recount)
    "q102_grouped_heavy_hitters" -> (graft.ops.Sketches.groupedHeavyHitters _),
    // round-8: quality-aware exact-dedup survivor policy
    "q103_dedup_keep_best"    -> (DedupQueries.dedupKeepBest _),
    // round-8: hard-negative mining (nearest wrong-class vectors)
    "q104_hard_negatives"     -> ((s: SparkSession, d: String) => SimilarityQueries.hardNegatives(s, d)),
    // round-8: canonical doc per near-dup cluster (q45 ∘ q103 policy)
    "q105_cluster_reps"       -> ((s: SparkSession, d: String) => DedupQueries.clusterRepresentatives(s, d)),
    // round-8: epoch-repeated UPsampled mixture (the q73 gap), capped
    "q106_upsampled_mixture"  -> (graft.text.CorpusOps.upsampledMixture _),
    // round-8: per-source low-quality rate + lift (feed monitoring)
    "q107_source_quality_lift" -> ((s: SparkSession, d: String) => graft.text.TextQueries.sourceQualityLift(s, d)),
    // round-8: token-budget accounting over the split × lang grid
    "q108_token_budget"       -> (graft.text.CorpusOps.tokenBudget _),
    // round-9: hard-negative mining over the PERSISTED IVF index
    // (probe-all ≡ q104 ⇒ same oracle; class filter map-side on the
    // label-carrying bucketed lists)
    "q109_hard_negatives_ivf" -> ((s: SparkSession, d: String) => SimilarityQueries.hardNegativesIvf(s, d)),
    // round-9: distributed Lloyd's k-means codebook refinement — the
    // real trainer behind the IVF stride-seed stand-in
    "q110_kmeans_assign"      -> ((s: SparkSession, d: String) => graft.sim.KMeans.kmeansAssign(s, d)),
    // round-9: curriculum-ordered sequence packing (q84 LM order ∘ q55)
    "q111_curriculum_pack"    -> (graft.text.CorpusOps.curriculumPack _),
    // round-9: ANN recall eval — production-nProbe IVF vs exact top-k
    "q112_ann_recall"         -> ((s: SparkSession, d: String) => SimilarityQueries.annRecall(s, d)),
    // round-9: search over the TRAINED codebook (probe-all ≡ exact ⇒
    // q20's oracle; restricted-probe recall measured in KMeansSpec)
    "q113_ivf_trained"        -> ((s: SparkSession, d: String) => graft.sim.KMeans.ivfTopKTrained(s, d)),
    // round-9: per-shard manifest over the packed layout (the loader's
    // index artifact)
    "q114_shard_manifest"     -> (graft.text.CorpusOps.shardManifest _),
    // round-9: surface-vs-embedding dedup disagreement audit
    "q115_dedup_crosscheck"   -> ((s: SparkSession, d: String) => DedupQueries.dedupCrossCheck(s, d)),
    // round-9: integer fixed-point PageRank over the near-dup graph
    "q116_pagerank"           -> ((s: SparkSession, d: String) => DedupQueries.pageRank(s, d)),
    // round-9: HLL-style register sketches (fixed-size mergeable distinct)
    "q117_hll_distinct"       -> ((s: SparkSession, d: String) => graft.ops.Sketches.hllDistinct(s, d)),
    "q118_hll_source_union"   -> ((s: SparkSession, d: String) => graft.ops.Sketches.hllSourceUnion(s, d)),
    // round-9: DSIR-shaped importance scoring (integer fixed-point ratios)
    "q119_importance_score"   -> (graft.text.CorpusOps.importanceScore _),
    "q120_dsir_select"        -> (graft.text.CorpusOps.dsirSelect _),
    // round-9: degree-oriented triangle counting on the near-dup graph
    "q121_triangles"          -> ((s: SparkSession, d: String) => DedupQueries.triangleCounts(s, d)),
    "q122_video_frames"       -> ((s: SparkSession, d: String) => graft.multimodal.Multimodal.videoFrames(s, d)),
    // round-10: exact substring-SPAN dedup (Lee et al. 2022 grain —
    // arbitrary-alignment repeats via duplicated-8-gram islands)
    "q123_substring_spans"    -> (Scrub.substringSpans _),
    // round-10: the Gopher rule suite (document-shape quality gates)
    "q124_gopher_rules"       -> (TextQueries.gopherRules _),
    // round-10: MERGEABLE grouped quantile sketch (bottom-k hash
    // sample) — the shard-merge complement of q61's exact brackets
    "q125_sample_quantiles"   -> (graft.ops.Quantiles.sampleQuantiles _),
    // round-10: z-order layout manifest (write-side 2-D clustering;
    // file min/max boxes a rect scan prunes on)
    "q126_zorder_layout"      -> ((s: SparkSession, d: String) => graft.ops.Layout.zorderLayout(s, d)),
    // round-10: sample-based range-partition planning (the
    // RangePartitioner/distributed-sort split-point computation as a
    // first-class op, on the q125 mergeable bottom-k sample)
    "q127_range_partition_plan" -> ((s: SparkSession, d: String) => graft.ops.Layout.rangePartitionPlan(s, d)),
    // round-10: incremental span decontamination (q123's islands, new
    // batch vs corpus — the nightly-crawl admission cut)
    "q128_incremental_spans"  -> (Scrub.incrementalSpans _),
    // round-10: near-dup cluster × train/val/test leakage audit
    "q129_split_leakage"      -> ((s: SparkSession, d: String) => DedupQueries.splitLeakage(s, d)),
    // round-10: q128 against the PERSISTED distinct-gram index
    // (membership ≡ n_corp >= 1 ⇒ same oracle; probe-side-only cost)
    "q130_incremental_spans_indexed" -> (Scrub.incrementalSpansIndexedQuery _),
    // round-10: cohort retention (activation analytics over events)
    "q131_cohort_retention"   -> (RelationalQueries.cohortRetention _),
    // round-10: order-insensitive bucketed table checksum (the
    // anti-entropy / replication-verification primitive)
    "q132_table_checksum"     -> (graft.ops.Sketches.tableChecksum _),
    // round-10: CMS inner-product join-size estimate vs exact (the
    // CBO statistics primitive, measured on a many-to-many join)
    "q133_join_cardinality"   -> (graft.ops.Sketches.joinCardinality _),
    // round-10: cluster-safe split — q129's fix (split by near-dup
    // cluster representative; leakage zero by construction)
    "q134_cluster_safe_split" -> (graft.text.CorpusOps.clusterSafeSplit _),
    // round-12: join-key skew profile — the measurement that decides
    // between plain shuffle, AQE skew split, and the q69 salted join
    "q135_key_skew_profile"   -> (graft.ops.Skew.keySkewProfile _),
    // round-12: small-file compaction planning (distributable first-fit
    // rebinning — the write-side OPTIMIZE manifest)
    "q136_compaction_plan"    -> ((s: SparkSession, d: String) => graft.ops.Layout.compactionPlan(s, d)),
    // round-12: snapshot diff — q132's checksum says WHETHER snapshots
    // drifted, this says WHICH keys and HOW (added/removed/changed)
    "q137_snapshot_diff"      -> (graft.ops.Sketches.snapshotDiff _),
    // round-12: measured LSH banding catch-rate per Jaccard decile —
    // the surface-dedup twin of q112's ANN recall eval
    "q138_banding_recall"     -> (DedupQueries.bandingRecall _),
    // round-12: forward as-of (earliest strictly-later purchase + wait)
    "q139_asof_forward"       -> (RelationalQueries.asofForward _),
    // round-12: forward direction through the native AsOfJoin plan
    "q140_asof_forward_native" -> (RelationalQueries.asofForwardNative _),
    // round-12: per-event-type time-to-purchase quantiles (the funnel
    // deliverable q139 feeds)
    "q141_conversion_latency" -> (RelationalQueries.conversionLatency _),
    // round-12: session conversion rate by depth (q27's rollup)
    "q142_session_conversion" -> (RelationalQueries.sessionConversion _),
    // round-13: MMR diversified re-ranking over the q20 candidates
    "q143_mmr_rerank"         -> ((s: SparkSession, d: String) =>
      graft.sim.SimilarityQueries.mmrRerank(s, d)),
    // round-13: overlapping 2h/1h hopping windows (q33's sliding twin)
    "q144_hopping_window"     -> (RelationalQueries.hoppingWindow _),
    // round-13: Deequ-style declarative constraint suite over orders
    "q145_quality_checks"     -> (graft.ops.Quality.qualityChecks _),
    // round-13: zone-map file-skipping audit — the read-side measurement
    // behind the q126 z-order write
    "q146_zone_map_skipping"  -> (graft.ops.Layout.zoneMapSkipping _),
    // round-13: general GROUPING SETS (the rollup/cube trio completed)
    "q147_grouping_sets"      -> (RelationalQueries.groupingSetsAgg _),
    // round-13: PSI distribution drift between the q137 snapshots
    "q148_psi_drift"          -> (graft.ops.Quality.psiDrift _),
    // round-13: SQ8 scalar-quantized asymmetric ANN (the int8 leg of
    // the compression family next to PQ/IVF-PQ)
    "q149_sq8_topk"           -> ((s: SparkSession, d: String) =>
      graft.sim.ScalarQuantization.sqTopK(s, d)),
    // round-13: SQ8 recall graded by the shared q112 eval contract
    "q150_sq8_recall"         -> ((s: SparkSession, d: String) =>
      graft.sim.ScalarQuantization.sqRecall(s, d)),
    // round-13: UNPIVOT/melt — q35's reshape inverse
    "q151_unpivot"            -> (RelationalQueries.unpivotLangCounts _),
    // round-13: CDC MERGE/upsert — the copy-on-write merge kernel
    "q152_merge_upsert"       -> (graft.ops.Maintenance.mergeUpsert _),
    // round-13: SCD-2 validity-window history build (gaps-and-islands)
    "q153_scd2_history"       -> (graft.ops.Maintenance.scd2History _),
    // round-13: GDPR purge audit — broadcast request list, one fact scan
    "q154_gdpr_delete_audit"  -> (graft.ops.Maintenance.gdprDeleteAudit _),
    // round-14: interval attribution join (view → purchase within 1 h);
    // batch twin of the native watermarked stream-stream join
    "q155_interval_attribution" -> (RelationalQueries.intervalAttribution _),
    // round-14: q152's MERGE against the persisted doc_id-bucketed base
    // — only the change-set shuffles (same oracle as q152)
    "q156_merge_upsert_bucketed" -> (graft.ops.Maintenance.mergeUpsertBucketed _),
    // round-14: q13's revenue join planned by the sketch-join advisor
    // (un-hinted dims broadcast from catalog sketches; same oracle)
    "q157_sketch_join_revenue" -> (RelationalQueries.sketchJoinRevenue _),
    // round-14: strict ordered funnel via cascaded running-min windows
    "q158_funnel_steps"        -> (RelationalQueries.funnelSteps _),
    // round-14: trailing-7-day per-user activity (RANGE frame on µs)
    "q159_rolling_activity"    -> (RelationalQueries.rollingUserActivity _),
    // round-14: first-order event-transition matrix (Markov counts)
    "q160_event_transitions"   -> (RelationalQueries.eventTransitions _),
    // round-14: merge-on-read scan — union + latest-version-wins, the
    // no-join read dual of q152 (same oracle)
    "q161_merge_on_read"       -> (graft.ops.Maintenance.mergeOnReadScan _),
    // round-14: exact p25/p50/p75 per group from ONE sorted buffer
    "q162_quantile_bands"      -> (RelationalQueries.quantileBands _),
    // round-14: correlated-subquery decorrelation (above own-user mean)
    // in x100 integer fixed point
    "q163_above_user_mean"     -> (RelationalQueries.aboveUserMean _),
    // round-14: per-user-capped item co-occurrence + lift (×10⁴ fixed
    // point) — pair fan-out bounded by C(cap,2) per user BY CONSTRUCTION
    "q164_item_cooccurrence"   -> (graft.ops.Affinity.itemCooccurrence _),
    // round-14: per-file Bloom skipping audit — the point-predicate
    // dual of q146's zone maps (md5 double hashing, manifest-grain)
    "q165_bloom_skipping"      -> (graft.ops.Layout.bloomSkipping _),
    // round-14: exact prefix-filter set-similarity join — complete
    // recall at J ≥ 1/2, the deterministic twin of q19's banding
    "q166_prefix_filter_pairs" -> (graft.dedup.DedupQueries.prefixFilterPairs _),
    // round-14: EXACT global concat-and-chunk packing via the two-phase
    // prefix sum — the scale-correct form of q55/q63's windows
    "q167_pack_chunk_spans"    -> (graft.text.CorpusOps.packChunkSpans _),
    // round-14: overlapping sliding-window RAG chunk spans (pure map +
    // bounded explode, no shuffle)
    "q168_rag_chunk_spans"     -> (graft.text.CorpusOps.ragChunkSpans _),
    // round-14: exact integer Gram/covariance stats of the embedding
    // corpus (PCA/whitening prep) — ONE flat 17 KB buffer per task,
    // never the oracle's N·d² exploded join
    "q169_gram_matrix"         -> (graft.sim.GramMatrix.gramMatrix _),
    // round-14: corpus-wide exact rank/percentile via the shared
    // two-phase prefix sum (no single-task global window, no float)
    "q170_global_rank"         -> (graft.text.CorpusOps.globalRank _),
    // round-14: deterministic token-weighted (PPS systematic) sample
    // on the q167 stream — no floats, no RNG, hits ∝ size
    "q171_pps_sample"          -> (graft.text.CorpusOps.ppsSample _),
    // round-15: snake-balanced training shards — LPT-style greedy on
    // the two-phase global rank, one exchange, no RNG
    "q172_snake_shards"        -> (graft.text.CorpusOps.snakeShards _),
    // round-15: lakehouse metadata-only aggregate — footer stats, not
    // rows; O(files) executor-side reads vs the oracle's full scan
    "q173_metadata_agg"        -> (graft.ops.Metadata.metadataAgg _),
    // round-15: the IVF append discipline registered end-to-end —
    // persisted base index + frozen-codebook delta append, probe-all
    // search ≡ brute force so the q20 oracle checks the whole arc
    "q174_ivf_append"          -> ((s: SparkSession, d: String) =>
      graft.sim.SimilarityQueries.ivfAppendTopK(s, d)),
    // round-15: q169's apply step — top principal direction by exact
    // integer power iteration, projection per vector, zero floats
    "q175_top_pc_proj"         -> (graft.sim.PowerIteration.topPcProjection _),
    // round-15: daily time-spine densification with LOCF — the
    // spine JOIN rewritten as a bounded per-user map fold, 2 exchanges
    "q176_daily_gap_fill"      -> (RelationalQueries.dailyGapFill _),
    // round-15: per-doc count of word 3-grams first introduced by that
    // doc — ONE gram-grain window + ONE doc-grain aggregate
    "q177_gram_novelty"        -> (Scrub.gramNovelty _),
    // round-15: skyline over (length, diversity, repetition) — scan+
    // local-prune once, broadcast nested-loop anti-join on survivors
    "q178_pareto_frontier"     -> (graft.text.CorpusOps.paretoFrontier _),
    // round-15: multi-source BFS min-hop over the customer↔supplier
    // bipartite graph — frontier-only expansion, checkpointed rounds
    "q179_bfs_depth"           -> (graft.dedup.DedupQueries.bfsDepth _),
    // round-15: k-core peeling — dense-subgraph mining on the same
    // bipartite graph; erosion rounds, each O(surviving edges)
    "q180_kcore"               -> (graft.dedup.DedupQueries.kcoreBipartite _),
    // round-15: no-straddle next-fit-decreasing packing — one exchange,
    // in-partition sort, streaming per-group fold
    "q181_nfd_pack"            -> (graft.text.CorpusOps.nfdPack _),
    // round-15: theta-sketch union/intersection estimates per source
    // pair — one gram-grain aggregate, sketch-sized pair algebra
    "q182_kmv_set_ops"         -> (graft.ops.Sketches.kmvSetOps _),
    // round-15: personalized PageRank from the q179 seed cohort —
    // integer fixed-point, seed-neighborhood-sized output
    "q183_ppr_seeds"           -> (graft.dedup.DedupQueries.pprSeeds _),
    // round-15: deterministic random-walk corpus (DeepWalk sentences) —
    // md5-argmin next-hop, frontier-sized state, |seeds|·(L+1) output
    "q184_random_walks"        -> (graft.dedup.DedupQueries.randomWalks _),
    // round-15: K-pattern blocklist screen in ONE corpus pass — broadcast
    // Aho-Corasick DFA, in-partition partials, |sources|×K-bounded exchange
    "q185_blocklist_screen"    -> (graft.text.Scrub.blocklistScreen _),
    // round-15: AS-OF point-in-time read over the q153 SCD2 intervals —
    // the read half of the history contract, zero added exchanges
    "q186_time_travel"         -> (graft.ops.Maintenance.timeTravelSnapshot _),
    // round-15: HITS hubs/authorities — mutual-reinforcement dual of the
    // random-walk scores, integer quotient-renorm fixed point
    "q187_hits_scores"         -> (graft.dedup.DedupQueries.hitsScores _),
    // round-15: exact-recall containment join (quote/excerpt dedup) —
    // rare-first prefix probe vs full gram index, integer verify
    "q188_containment_pairs"   -> (graft.dedup.DedupQueries.containmentPairs _),
    // round-15: embedding-space split-leakage audit — the paraphrase
    // contamination q85/q134 can't see, on q88's cell machinery
    "q189_semantic_leakage"    -> (graft.sim.SimilarityQueries.semanticSplitLeakage _),
    // round-15: curation attrition waterfall — first-failing-stage
    // funnel report over q48's own gates, |sources|×5 output
    "q190_curation_waterfall"  -> (graft.text.Scrub.curationWaterfall _),
    // round-15: Hamilton-apportioned reproducible eval set — integer
    // largest-remainder quotas, budget-sized MinKByStr selection
    "q191_hamilton_eval"       -> (graft.text.CorpusOps.hamiltonEvalSample _),
    // round-15: rendezvous-hash shard stability — moves only into the
    // new shard, (S+1)²-bounded audit of a pure map
    "q192_hrw_stability"       -> (graft.text.CorpusOps.rendezvousStability _),
    // round-15: k-anonymity release audit — quasi-identifier classes
    // below k, per-source exposure rollup, one class-grain aggregate
    "q193_k_anonymity"         -> (graft.ops.Maintenance.kAnonymityAudit _),
    // round-15: matryoshka prefix-dim search graded by the shared
    // integer recall contract (q112/q150 family)
    "q194_matryoshka_recall"   -> (graft.sim.SimilarityQueries.matryoshkaRecall _),
    // round-15: perceptual-hash image dedup — real PNG encode→JDK
    // decode→exact block-average aHash; cluster structure oracle-checked
    "q195_image_phash"         -> (graft.multimodal.Multimodal.imagePhashDedup _),
    // round-15: audio fingerprint dedup — real WAV decode, exact
    // window-mean fingerprint, time-stretch invariance
    "q196_audio_fingerprint"   -> (graft.multimodal.Multimodal.audioFingerprintDedup _),
    // round-15: shot-boundary detection over real-decoded video frames
    "q197_shot_boundaries"     -> (graft.multimodal.Multimodal.shotBoundaries _),
    // round-15: exact-integer two-sample KS statistic per source pair
    "q198_ks_drift"            -> (graft.ops.Quality.ksDrift _),
    // round-15: plurality label-propagation communities (fixed rounds)
    "q199_lpa_communities"     -> (graft.dedup.DedupQueries.lpaCommunities _),
    // round-15: l-diversity release audit (q193's homogeneity dual)
    "q200_l_diversity"         -> (graft.ops.Maintenance.lDiversityAudit _),
    // round-15: deterministic per-epoch shuffle → batch manifest
    "q201_epoch_shuffle"       -> (graft.text.CorpusOps.epochShuffleManifest _),
    // round-15: VAD segmentation over real-decoded WAV energies
    "q202_vad_segments"        -> (graft.multimodal.Multimodal.vadSegmentation _),
    // round-15: 1-bit binary quantization — Hamming shortlist + rescore
    "q203_bq_topk"             -> ((s: SparkSession, d: String) =>
      graft.sim.BinaryQuantization.bqTopK(s, d)),
    "q204_bq_recall"           -> ((s: SparkSession, d: String) =>
      graft.sim.BinaryQuantization.bqRecall(s, d)),
    // round-15: Hilbert-curve layout manifest (q126's Morton upgraded)
    "q205_hilbert_layout"      -> (graft.ops.Layout.hilbertLayout _),
    // round-15: Kneser–Ney bigram LM table (continuation counts)
    "q206_kn_bigram_lm"        -> (graft.text.TextQueries.knBigramLm _),
    // round-15: leave-one-source-out curation ablation (rep promotion exact)
    "q207_source_ablation"     -> (graft.text.Scrub.sourceAblation _),
    // round-15: tie-corrected Spearman rank correlation per language
    "q208_spearman_quality"    -> (graft.ops.Quality.spearmanQuality _),
    // round-15: exact Gini decision-stump search over labeled embeddings
    "q209_gini_stump"          -> (graft.ml.Stump.giniStump _),
    // round-15: chi-square independence test over the lang × source grid
    "q210_chi_square"          -> (graft.ops.Quality.chiSquareLangSource _),
    // round-15: max-min fair water-filling token-budget allocation
    "q211_waterfill_budget"    -> (graft.text.CorpusOps.waterfillBudget _),
    // round-15: Benford first-digit audit over order amounts
    "q212_benford_audit"       -> (graft.ops.Quality.benfordAudit _),
    // round-15: reciprocal-rank fusion of the three approximate searchers
    "q213_rrf_fusion"          -> (graft.sim.RankFusion.rrfFusion _),
    "q214_rrf_recall"          -> (graft.sim.RankFusion.rrfRecall _),
    // round-16: Cohen's kappa between the cheap and content screens
    "q215_kappa_labelers"      -> (graft.ops.Quality.kappaLabelers _),
    // round-16: Mann–Whitney U location test per source pair
    "q216_mwu_drift"           -> (graft.ops.Quality.mannWhitneyDrift _),
    // round-16: CUSUM change-point monitor over daily event volume
    "q217_cusum_drift"         -> (graft.ops.Quality.cusumDrift _),
    // round-16: tokenizer fertility / byte-cost accounting grid
    "q218_tokenizer_stats"     -> (graft.text.CorpusOps.tokenizerStats _),
    // round-16: reliability bins / expected-calibration-error audit
    "q219_ece_calibration"     -> (graft.ops.Quality.eceCalibration _),
    // round-16: graded nDCG@5 eval of the IVF searcher
    "q220_ndcg_eval"           -> ((s: SparkSession, d: String) =>
      graft.sim.SimilarityQueries.ndcgEval(s, d)),
    // round-16: ORC sink+source round-trip proven by the q132 checksum
    "q221_orc_roundtrip"       -> (graft.ops.Formats.orcRoundTrip _),
    // round-16: common-neighbor/resource-allocation link prediction
    "q222_link_prediction"     -> (graft.ops.Affinity.linkPrediction _),
    // round-16: zlib compression-ratio quality screen — the first op
    // with NO DuckDB oracle (deflate is not SQL-expressible): the
    // driver records the rows-only check; CompressibilitySpec pins
    // exact values, determinism, and the screen semantics instead
    "q223_compression_probe"   -> (graft.text.Compressibility.compressionProbe _),
    // round-16: per-source Gini concentration of document length
    "q224_length_gini"         -> (graft.ops.Quality.lengthGini _),
    // round-16: jackknife source influence on the corpus mean length
    "q225_jackknife_sources"   -> (graft.ops.Quality.jackknifeSources _),
    // round-16: OLS trend (slope/intercept) over daily event volume
    "q226_ols_trend"           -> (graft.ops.Quality.olsDailyTrend _),
    // round-16: two-term proximity search (min token gap, top-N)
    "q227_proximity_search"    -> (graft.text.TextQueries.proximitySearch _),
    // round-16: functional-dependency audit (g3 violation counts)
    "q228_fd_audit"            -> (graft.ops.Quality.fdAudit _),
    // round-16: one-way ANOVA F over source length means (omnibus)
    "q229_anova_length"        -> (graft.ops.Quality.anovaLength _),
    // round-16: trimmed mean per source (robust center)
    "q230_trimmed_mean"        -> (graft.ops.Quality.trimmedMeanLength _),
    // round-16: t-closeness — the release-privacy trio completed
    "q231_t_closeness"         -> (graft.ops.Maintenance.tClosenessAudit _),
    // round-16: first/last/linear multi-touch attribution, one table
    "q232_attribution"         -> (RelationalQueries.multiTouchAttribution _),
    // round-16: discrete survival table with censoring (churn hazard)
    "q233_survival_table"      -> (RelationalQueries.survivalTable _),
    // round-16: Markov removal-effect attribution (fixed-point chain)
    "q234_markov_removal"      -> (graft.ops.Markov.markovRemoval _),
    // round-16: k-center coreset (farthest-first, O(k) jobs)
    "q235_kcenter_coreset"     -> (graft.sim.KCenter.kCenterCoreset _),
    // round-16: OOV rate per language vs the q40 vocabulary
    "q236_oov_rate"            -> (graft.text.TextQueries.oovRate _),
    // round-16: exact DAU/WAU/MAU stickiness table
    "q237_active_users"        -> (RelationalQueries.activeUserStickiness _),
    // round-16: delta+varint posting-list compression accounting
    "q238_postings_compression" -> (graft.text.CorpusOps.postingsCompression _),
    // round-16: column-encoding advisor (plain vs dict vs RLE, exact)
    "q239_encoding_advisor"    -> (graft.ops.Layout.encodingAdvisor _),
    // round-16: seasonal-naive vs naive forecast backtest
    "q240_seasonal_backtest"   -> (graft.ops.Quality.seasonalBacktest _),
    // round-17: directional association rules off q164's capped pairs
    "q241_association_rules"   -> (graft.ops.Affinity.associationRules _),
    // round-17: two-proportion z-test per source pair (good-doc rate)
    "q242_two_prop_z"          -> (graft.ops.Inference.twoPropZ _),
    // round-17: Benjamini–Hochberg FDR step-up over the q242 grid
    "q243_bh_fdr"              -> (graft.ops.Inference.bhFdr _),
    // round-17: exact Shapley attribution of the q48 curation gates
    "q244_gate_shapley"        -> (graft.text.Scrub.gateShapley _),
    // round-17: frequent contiguous event-type triples (+user support)
    "q246_seq3_patterns"       -> (RelationalQueries.seq3Patterns _),
    // round-17: Simpson's-paradox screen, per-type vs pooled OLS sign
    "q248_simpson_slopes"      -> (graft.ops.Quality.simpsonSlopes _),
    // round-17: rank-biased overlap between SQ8 and exact top-5
    "q245_rbo_eval"            -> (graft.sim.RankFusion.rboEval _),
    // round-17: isotonic (PAVA-by-minimax) recalibration of q219 bins
    "q250_isotonic_calibration" -> (graft.ops.Quality.isotonicCalibration _),
    // round-17: CMS-priced 3-table join-order decision, accuracy in-band
    "q247_join_order_advisor"  -> (graft.ops.Sketches.joinOrderAdvisor _),
    // round-17: bitemporal as-of (valid time × system time, stale rows)
    "q249_bitemporal_asof"     -> (graft.ops.Maintenance.bitemporalAsOf _),
    // round-17: Theil–Sen robust slope vs OLS per event type
    "q251_theil_sen"           -> (graft.ops.Quality.theilSenTrend _),
    // round-17: split-conformal prediction sets + empirical coverage
    "q252_conformal_coverage"  -> (graft.ops.Quality.conformalCoverage _),
    // round-17: k-anonymity repair — equi-depth ≥k generalization bins
    "q253_kanon_repair"        -> (graft.ops.Maintenance.kAnonymityRepair _),
    // round-17: hilbert vs zorder zone-map skipping, measured head-to-head
    "q254_hilbert_skipping"    -> (graft.ops.Layout.hilbertSkipping _),
    // round-17: one-scan per-source datasheet (volume/quality/dup/diversity)
    "q255_source_datacard"     -> (graft.ops.Quality.sourceDatacard _),
    // round-17: deterministic Poisson-bootstrap CI for mean length
    "q256_bootstrap_ci"        -> (graft.ops.Quality.bootstrapCi _),
    // round-17: Wilson score interval per source (rank by lower bound)
    "q257_wilson_bounds"       -> (graft.ops.Inference.wilsonBounds _),
    // round-17: (b,r) banding retune from the measured pair histogram
    "q258_banding_planner"     -> (graft.dedup.DedupQueries.bandingPlanner _),
    // round-17: RFM quintile segmentation (5=best on every axis)
    "q259_rfm_segments"        -> (RelationalQueries.rfmSegments _),
    // round-17: budgeted compaction scheduler (ROI-greedy over q136)
    "q260_compaction_scheduler" -> (graft.ops.Layout.compactionScheduler _),
    // round-17: pairwise cosine between label centroids (integer grid)
    "q261_label_affinity"      -> (graft.sim.SimilarityQueries.labelCentroidAffinity _),
    // round-17: HLL-sketched DAU grid (q237's production counterpart)
    "q262_hll_dau"             -> (graft.ops.Sketches.hllDau _),
    // round-17: token-mass vs count median per source (admission unit)
    "q263_token_mass_median"   -> (graft.ops.Quality.tokenMassMedian _),
    // round-17: weekday-seasonal residual outliers (median + MAD gate)
    "q264_seasonal_outliers"   -> (graft.ops.Quality.seasonalOutliers _),
    // round-17: corpus coverage of the eval set (best-neighbor histogram)
    "q265_eval_coverage"       -> (graft.sim.SimilarityQueries.evalCoverage _),
    // round-17: JSONL round-trip proven lossless (the q221 discipline)
    "q266_json_roundtrip"      -> (graft.ops.Formats.jsonRoundTrip _),
    // round-17: A/A null calibration of the drift gate (pseudo-arms)
    "q267_aa_calibration"      -> (graft.ops.Inference.aaCalibration _),
    // round-17: Calinski–Harabasz scatter ratio over embedding labels
    "q268_scatter_ratio"       -> (graft.sim.SimilarityQueries.scatterRatio _),
    // round-17: inter-event burstiness screen (Goh–Barabási B)
    "q269_burstiness"          -> (graft.ops.Quality.burstiness _),
    // round-17: growth accounting (new/retained/resurrected/churned)
    "q270_growth_accounting"   -> (RelationalQueries.growthAccounting _),
    // round-17: dedup-cluster size telemetry (mega-cluster vs long tail)
    "q271_cluster_sizes"       -> (graft.dedup.DedupQueries.clusterSizeHistogram _),
    // round-16 (driver counter): unigram-LM tokenizer seed statistics
    "q272_unigram_seed"        -> (graft.text.Unigram.seedStats _),
    // round-16: declarative data-contract suite (one row per expectation)
    "q273_data_contracts"      -> (graft.ops.Contracts.dataContracts _),
    // round-16: mergeable histogram quantiles + exact-error audit
    "q274_hist_quantiles"      -> (graft.ops.Sketches.histogramQuantiles _),
    // round-16: multi-pass sorted-neighborhood blocking (verified pairs)
    "q275_sorted_neighborhood" -> (graft.dedup.Linkage.sortedNeighborhood _),
    // round-16: Fellegi–Sunter agreement-pattern scoring over SN candidates
    "q276_fellegi_sunter"      -> (graft.dedup.Linkage.fellegiSunter _),
    // round-16: weighted MinHash (replication) + exact weighted-Jaccard audit
    "q277_weighted_minhash"    -> (graft.dedup.Linkage.weightedMinhash _),
    // round-16: Zipf rank-frequency + Heaps vocab-growth law fits (log-log OLS)
    "q278_corpus_laws"         -> (graft.text.CorpusLaws.corpusLaws _),
    // round-16: ε-DP count release via the derandomized geometric mechanism
    "q279_dp_counts"           -> (graft.ops.Privacy.dpCounts _),
    // round-16: depth-2 binary-segmentation changepoints on the daily grid
    "q280_changepoints"        -> (graft.ops.Changepoint.changepoints _),
    // round-16: source leave-one-out influence on the corpus token mean
    "q281_source_influence"    -> ((s: SparkSession, d: String) => graft.text.TextQueries.sourceInfluence(s, d)),
    // round-16: JL sign-projection recall vs full-dim exact (q194's dual)
    "q282_jl_recall"           -> ((s: SparkSession, d: String) => graft.sim.SimilarityQueries.jlRecall(s, d)),
    // round-16: Mann–Kendall trend significance on the (type, day) grid
    "q283_mann_kendall"        -> (graft.ops.Changepoint.mannKendall _),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_scan_filter_project" -> RelationalQueries.scanFilterProjectSql,
    "q02_group_agg"           -> RelationalQueries.groupAggSql,
    "q03_having_filter"       -> RelationalQueries.havingFilterSql,
    "q04_window_flag"         -> RelationalQueries.windowFlagSql,
    "q05_quantile_p99"        -> RelationalQueries.quantileP99Sql,
    "q06_lag_datediff"        -> RelationalQueries.lagDatediffSql,
    "q07_anomaly_threshold"   -> RelationalQueries.anomalyThresholdSql,
    "q08_rule_tags"           -> RelationalQueries.ruleTagsSql,
    "q09_value_counts_top"    -> RelationalQueries.valueCountsTopSql,
    "q12_date_format"         -> RelationalQueries.dateFormatSql,
    "q13_join_revenue"        -> RelationalQueries.joinRevenueSql,
    "q14_window_topn"         -> RelationalQueries.windowTopNSql,
    "q15_anti_join"           -> RelationalQueries.antiJoinSql,
    "q27_sessionize"          -> RelationalQueries.sessionizeSql,
    "q32_asof_join"           -> RelationalQueries.asofJoinSql,
    "q33_tumbling_window"     -> RelationalQueries.tumblingWindowSql,
    "q34_rollup"              -> RelationalQueries.rollupStatsSql,
    "q35_pivot"               -> RelationalQueries.pivotLangCountsSql,
    "q36_json_extract"        -> RelationalQueries.jsonExtractSql,
    "q41_window_ranks"        -> RelationalQueries.windowRanksSql,
    "q37_topk_agg"            -> graft.ops.TopKAggregator.topBalancePerNationSql,
    "q38_set_ops"             -> RelationalQueries.setOpsSql,
    "q10_feature_encode"      -> MLQueries.featureEncodeSql,
    "q11_autoencoder_score"   -> MLQueries.autoencoderScoreSql,
    "q16_dedup_exact"         -> DedupQueries.exactDedupSql,
    "q17_minhash_bands"       -> DedupQueries.minHashBandsSql,
    "q18_simhash"             -> DedupQueries.simHashSql,
    "q19_minhash_jaccard"     -> DedupQueries.minHashJaccardPairsSql,
    "q20_cosine_topk"         -> SimilarityQueries.cosineTopKSql,
    "q21_cosine_lsh"          -> SimilarityQueries.cosineLshPairsSql,
    "q22_langid"              -> TextQueries.langIdSql,
    "q23_text_quality"        -> TextQueries.qualitySql,
    "q24_token_count"         -> TextQueries.tokenCountSql,
    "q25_fingerprint"         -> TextQueries.fingerprintSql,
    "q26_multimodal_meta"     -> TextQueries.multimodalMetaSql,
    "q28_neardup_keep"        -> DedupQueries.nearDupKeepSql,
    "q29_corpus_stats"        -> TextQueries.corpusStatsSql,
    "q30_stratified_sample"   -> TextQueries.stratifiedSampleSql,
    "q31_embedding_neardup"   -> SimilarityQueries.embeddingNearDupSql,
    "q39_chunking"            -> TextQueries.chunkDocsSql,
    "q40_vocab"               -> TextQueries.vocabSql,
    "q42_pii_redact"          -> Scrub.piiRedactSql,
    "q43_repetition"          -> Scrub.repetitionSql,
    "q44_ivf_topk"            -> SimilarityQueries.ivfTopKSql,
    "q45_dedup_clusters"      -> DedupQueries.dedupClustersSql,
    "q46_decontaminate"       -> Scrub.decontaminateSql,
    "q47_asof_native"         -> RelationalQueries.asofJoinNativeSql,
    "q48_curated_corpus"      -> Scrub.curatedCorpusSql,
    "q49_fuzzy_name_match"    -> DedupQueries.fuzzyNameMatchSql,
    "q50_moving_avg"          -> RelationalQueries.movingAvgSql,
    "q51_group_quantiles"     -> RelationalQueries.groupQuantilesSql,
    "q52_histogram"           -> RelationalQueries.histogramSql,
    "q53_random_projection"   -> SimilarityQueries.randomProjectionSql,
    "q54_chunk_dedup"         -> Scrub.chunkDedupSql,
    "q55_sequence_pack"       -> graft.text.CorpusOps.sequencePackSql,
    "q56_range_join"          -> RelationalQueries.rangeJoinSql,
    "q57_tfidf"               -> graft.text.CorpusOps.tfIdfSql,
    "q58_bloom_decontaminate" -> Scrub.bloomDecontaminateSql,
    "q59_inverted_index"      -> graft.text.CorpusOps.invertedIndexSql,
    "q60_weighted_sample"     -> graft.text.CorpusOps.weightedSampleSql,
    "q61_quantile_approx"     -> graft.ops.Quantiles.quantileApproxSql,
    "q62_simhash_pairs"       -> DedupQueries.simHashPairsSql,
    "q63_sequence_pack_bucketed" -> graft.text.CorpusOps.sequencePackBucketedSql,
    "q64_cc_largestar"        -> DedupQueries.dedupClustersSql,
    "q65_kmv_distinct"        -> graft.ops.Sketches.kmvDistinctSql,
    "q66_countmin_freq"       -> graft.ops.Sketches.countMinFreqSql,
    "q67_ngram_jaccard"       -> DedupQueries.charNgramJaccardPairsSql,
    "q68_cube_agg"            -> RelationalQueries.cubeAggSql,
    "q69_salted_join"         -> RelationalQueries.saltedJoinRevenueSql,
    "q70_event_funnel"        -> RelationalQueries.eventFunnelSql,
    "q71_incremental_dedup"   -> DedupQueries.incrementalDedupSql,
    "q72_knn_label"           -> graft.sim.SimilarityQueries.knnLabelSql,
    "q73_mixture_sample"      -> graft.text.CorpusOps.mixtureSampleSql,
    "q74_frame_sample"        -> graft.text.TextQueries.frameSampleSql,
    // identical output contract to q71 — same oracle
    "q75_incremental_dedup_indexed" -> DedupQueries.incrementalDedupSql,
    "q76_knn_label_ivf"       -> graft.sim.SimilarityQueries.knnLabelSql,
    "q77_quota_sample_threshold" -> graft.text.CorpusOps.quotaSampleThresholdSql,
    // identical output contract to q44 — same oracle
    "q78_ivf_topk_indexed"    -> graft.sim.SimilarityQueries.ivfTopKSql,
    "q79_pq_topk"             -> graft.sim.ProductQuantization.pqTopKSql,
    // probe-all IVF-PQ ≡ flat PQ — same oracle
    "q80_ivfpq_topk"          -> graft.sim.ProductQuantization.pqTopKSql,
    "q81_ivfpq_indexed"       -> graft.sim.ProductQuantization.pqTopKSql,
    "q82_bm25_search"         -> graft.text.CorpusOps.bm25SearchSql,
    "q83_corpus_build"        -> graft.text.CorpusOps.corpusBuildSql,
    "q84_lm_score"            -> graft.text.TextQueries.lmScoreSql,
    "q85_deterministic_split" -> graft.text.CorpusOps.deterministicSplitSql,
    "q86_boilerplate"         -> graft.text.Scrub.boilerplateSql,
    "q87_bpe_pairs"           -> graft.text.Bpe.pairStatsSql,
    "q88_semantic_dedup"      -> SimilarityQueries.semanticDedupSql,
    "q89_temperature_mixture" -> graft.text.CorpusOps.temperatureMixtureSql,
    "q90_pmi_collocations"    -> graft.text.TextQueries.collocationsSql,
    "q91_heavy_hitters"       -> graft.ops.Sketches.heavyHittersSql,
    "q92_decayed_activity"    -> RelationalQueries.decayedActivitySql,
    "q93_robust_outliers"     -> RelationalQueries.robustOutliersSql,
    "q94_naive_bayes"         -> graft.text.TextQueries.naiveBayesLangSql,
    "q95_source_overlap"      -> graft.text.Scrub.sourceOverlapSql,
    "q96_label_audit"         -> SimilarityQueries.labelAuditSql,
    "q97_lexical_diversity"   -> graft.text.TextQueries.lexicalDiversitySql,
    "q98_equidepth_bins"      -> RelationalQueries.equiDepthBinsSql,
    "q99_comoment_stats"      -> RelationalQueries.comomentStatsSql,
    "q100_winnow_pairs"       -> graft.text.Scrub.winnowPairsSql,
    "q101_negative_pairs"     -> SimilarityQueries.negativePairsSql,
    "q102_grouped_heavy_hitters" -> graft.ops.Sketches.groupedHeavyHittersSql,
    "q103_dedup_keep_best"    -> DedupQueries.dedupKeepBestSql,
    "q104_hard_negatives"     -> SimilarityQueries.hardNegativesSql,
    "q105_cluster_reps"       -> DedupQueries.clusterRepresentativesSql,
    "q106_upsampled_mixture"  -> graft.text.CorpusOps.upsampledMixtureSql,
    "q107_source_quality_lift" -> graft.text.TextQueries.sourceQualityLiftSql,
    "q108_token_budget"       -> graft.text.CorpusOps.tokenBudgetSql,
    // probe-all IVF hard negatives ≡ brute force — same oracle as q104
    "q109_hard_negatives_ivf" -> SimilarityQueries.hardNegativesSql,
    "q110_kmeans_assign"      -> graft.sim.KMeans.kmeansAssignSql,
    "q111_curriculum_pack"    -> graft.text.CorpusOps.curriculumPackSql,
    "q112_ann_recall"         -> SimilarityQueries.annRecallSql,
    // probe-all over any codebook scans every list — exact ⇒ q20 oracle
    "q113_ivf_trained"        -> SimilarityQueries.cosineTopKSql,
    "q114_shard_manifest"     -> graft.text.CorpusOps.shardManifestSql,
    "q115_dedup_crosscheck"   -> DedupQueries.dedupCrossCheckSql,
    "q116_pagerank"           -> DedupQueries.pageRankSql,
    "q117_hll_distinct"       -> graft.ops.Sketches.hllDistinctSql,
    "q118_hll_source_union"   -> graft.ops.Sketches.hllSourceUnionSql,
    "q119_importance_score"   -> graft.text.CorpusOps.importanceScoreSql,
    "q120_dsir_select"        -> graft.text.CorpusOps.dsirSelectSql,
    "q121_triangles"          -> DedupQueries.triangleCountsSql,
    "q122_video_frames"       -> graft.multimodal.Multimodal.videoFramesSql,
    "q123_substring_spans"    -> Scrub.substringSpansSql,
    "q124_gopher_rules"       -> TextQueries.gopherRulesSql,
    "q125_sample_quantiles"   -> graft.ops.Quantiles.sampleQuantilesSql,
    "q126_zorder_layout"      -> graft.ops.Layout.zorderLayoutSql,
    "q127_range_partition_plan" -> graft.ops.Layout.rangePartitionPlanSql,
    "q128_incremental_spans"  -> Scrub.incrementalSpansSql,
    "q129_split_leakage"      -> DedupQueries.splitLeakageSql,
    // identical output contract to q128 — same oracle
    "q130_incremental_spans_indexed" -> Scrub.incrementalSpansSql,
    "q131_cohort_retention"   -> RelationalQueries.cohortRetentionSql,
    "q132_table_checksum"     -> graft.ops.Sketches.tableChecksumSql,
    "q133_join_cardinality"   -> graft.ops.Sketches.joinCardinalitySql,
    "q134_cluster_safe_split" -> graft.text.CorpusOps.clusterSafeSplitSql,
    "q135_key_skew_profile"   -> graft.ops.Skew.keySkewProfileSql,
    "q136_compaction_plan"    -> graft.ops.Layout.compactionPlanSql,
    "q137_snapshot_diff"      -> graft.ops.Sketches.snapshotDiffSql,
    "q138_banding_recall"     -> DedupQueries.bandingRecallSql,
    "q139_asof_forward"       -> RelationalQueries.asofForwardSql,
    "q140_asof_forward_native" -> RelationalQueries.asofForwardNativeSql,
    "q141_conversion_latency" -> RelationalQueries.conversionLatencySql,
    "q142_session_conversion" -> RelationalQueries.sessionConversionSql,
    "q143_mmr_rerank"         -> graft.sim.SimilarityQueries.mmrRerankSql,
    "q144_hopping_window"     -> RelationalQueries.hoppingWindowSql,
    "q145_quality_checks"     -> graft.ops.Quality.qualityChecksSql,
    "q146_zone_map_skipping"  -> graft.ops.Layout.zoneMapSkippingSql,
    "q147_grouping_sets"      -> RelationalQueries.groupingSetsAggSql,
    "q148_psi_drift"          -> graft.ops.Quality.psiDriftSql,
    "q149_sq8_topk"           -> graft.sim.ScalarQuantization.sqTopKSql,
    "q150_sq8_recall"         -> graft.sim.ScalarQuantization.sqRecallSql,
    "q151_unpivot"            -> RelationalQueries.unpivotLangCountsSql,
    "q152_merge_upsert"       -> graft.ops.Maintenance.mergeUpsertSql,
    "q153_scd2_history"       -> graft.ops.Maintenance.scd2HistorySql,
    "q154_gdpr_delete_audit"  -> graft.ops.Maintenance.gdprDeleteAuditSql,
    "q155_interval_attribution" -> RelationalQueries.intervalAttributionSql,
    "q156_merge_upsert_bucketed" -> graft.ops.Maintenance.mergeUpsertSql,
    "q157_sketch_join_revenue" -> RelationalQueries.joinRevenueSql,
    "q158_funnel_steps"        -> RelationalQueries.funnelStepsSql,
    "q159_rolling_activity"    -> RelationalQueries.rollingUserActivitySql,
    "q160_event_transitions"   -> RelationalQueries.eventTransitionsSql,
    "q161_merge_on_read"       -> graft.ops.Maintenance.mergeUpsertSql,
    "q162_quantile_bands"      -> RelationalQueries.quantileBandsSql,
    "q163_above_user_mean"     -> RelationalQueries.aboveUserMeanSql,
    "q164_item_cooccurrence"   -> graft.ops.Affinity.itemCooccurrenceSql,
    "q165_bloom_skipping"      -> graft.ops.Layout.bloomSkippingSql,
    "q166_prefix_filter_pairs" -> graft.dedup.DedupQueries.prefixFilterPairsSql,
    "q167_pack_chunk_spans"    -> graft.text.CorpusOps.packChunkSpansSql,
    "q168_rag_chunk_spans"     -> graft.text.CorpusOps.ragChunkSpansSql,
    "q169_gram_matrix"         -> graft.sim.GramMatrix.gramMatrixSql,
    "q170_global_rank"         -> graft.text.CorpusOps.globalRankSql,
    "q171_pps_sample"          -> graft.text.CorpusOps.ppsSampleSql,
    "q172_snake_shards"        -> graft.text.CorpusOps.snakeShardsSql,
    "q173_metadata_agg"        -> graft.ops.Metadata.metadataAggSql,
    "q174_ivf_append"          -> SimilarityQueries.cosineTopKSql,
    "q175_top_pc_proj"         -> graft.sim.PowerIteration.topPcProjectionSql,
    "q176_daily_gap_fill"      -> RelationalQueries.dailyGapFillSql,
    "q177_gram_novelty"        -> Scrub.gramNoveltySql,
    "q178_pareto_frontier"     -> graft.text.CorpusOps.paretoFrontierSql,
    "q179_bfs_depth"           -> graft.dedup.DedupQueries.bfsDepthSql,
    "q180_kcore"               -> graft.dedup.DedupQueries.kcoreBipartiteSql,
    "q181_nfd_pack"            -> graft.text.CorpusOps.nfdPackSql,
    "q182_kmv_set_ops"         -> graft.ops.Sketches.kmvSetOpsSql,
    "q183_ppr_seeds"           -> graft.dedup.DedupQueries.pprSeedsSql,
    "q184_random_walks"        -> graft.dedup.DedupQueries.randomWalksSql,
    "q185_blocklist_screen"    -> graft.text.Scrub.blocklistScreenSql,
    "q186_time_travel"         -> graft.ops.Maintenance.timeTravelSnapshotSql,
    "q187_hits_scores"         -> graft.dedup.DedupQueries.hitsScoresSql,
    "q188_containment_pairs"   -> graft.dedup.DedupQueries.containmentPairsSql,
    "q189_semantic_leakage"    -> graft.sim.SimilarityQueries.semanticSplitLeakageSql,
    "q190_curation_waterfall"  -> graft.text.Scrub.curationWaterfallSql,
    "q191_hamilton_eval"       -> graft.text.CorpusOps.hamiltonEvalSampleSql,
    "q192_hrw_stability"       -> graft.text.CorpusOps.rendezvousStabilitySql,
    "q193_k_anonymity"         -> graft.ops.Maintenance.kAnonymityAuditSql,
    "q194_matryoshka_recall"   -> graft.sim.SimilarityQueries.matryoshkaRecallSql,
    "q195_image_phash"         -> graft.multimodal.Multimodal.imagePhashDedupSql,
    "q196_audio_fingerprint"   -> graft.multimodal.Multimodal.audioFingerprintDedupSql,
    "q197_shot_boundaries"     -> graft.multimodal.Multimodal.shotBoundariesSql,
    "q198_ks_drift"            -> graft.ops.Quality.ksDriftSql,
    "q199_lpa_communities"     -> graft.dedup.DedupQueries.lpaCommunitiesSql,
    "q200_l_diversity"         -> graft.ops.Maintenance.lDiversityAuditSql,
    "q201_epoch_shuffle"       -> graft.text.CorpusOps.epochShuffleManifestSql,
    "q202_vad_segments"        -> graft.multimodal.Multimodal.vadSegmentationSql,
    "q203_bq_topk"             -> graft.sim.BinaryQuantization.bqTopKSql,
    "q204_bq_recall"           -> graft.sim.BinaryQuantization.bqRecallSql,
    "q205_hilbert_layout"      -> graft.ops.Layout.hilbertLayoutSql,
    "q206_kn_bigram_lm"        -> graft.text.TextQueries.knBigramLmSql,
    "q207_source_ablation"     -> graft.text.Scrub.sourceAblationSql,
    "q208_spearman_quality"    -> graft.ops.Quality.spearmanQualitySql,
    "q209_gini_stump"          -> graft.ml.Stump.giniStumpSql,
    "q210_chi_square"          -> graft.ops.Quality.chiSquareLangSourceSql,
    "q211_waterfill_budget"    -> graft.text.CorpusOps.waterfillBudgetSql,
    "q212_benford_audit"       -> graft.ops.Quality.benfordAuditSql,
    "q213_rrf_fusion"          -> graft.sim.RankFusion.rrfFusionSql,
    "q214_rrf_recall"          -> graft.sim.RankFusion.rrfRecallSql,
    "q215_kappa_labelers"      -> graft.ops.Quality.kappaLabelersSql,
    "q216_mwu_drift"           -> graft.ops.Quality.mannWhitneyDriftSql,
    "q217_cusum_drift"         -> graft.ops.Quality.cusumDriftSql,
    "q218_tokenizer_stats"     -> graft.text.CorpusOps.tokenizerStatsSql,
    "q219_ece_calibration"     -> graft.ops.Quality.eceCalibrationSql,
    "q220_ndcg_eval"           -> graft.sim.SimilarityQueries.ndcgEvalSql,
    "q221_orc_roundtrip"       -> graft.ops.Formats.orcRoundTripSql,
    "q222_link_prediction"     -> graft.ops.Affinity.linkPredictionSql,
    "q223_compression_probe"   -> graft.text.Compressibility.compressionProbeSql,
    "q224_length_gini"         -> graft.ops.Quality.lengthGiniSql,
    "q225_jackknife_sources"   -> graft.ops.Quality.jackknifeSourcesSql,
    "q226_ols_trend"           -> graft.ops.Quality.olsDailyTrendSql,
    "q227_proximity_search"    -> graft.text.TextQueries.proximitySearchSql,
    "q228_fd_audit"            -> graft.ops.Quality.fdAuditSql,
    "q229_anova_length"        -> graft.ops.Quality.anovaLengthSql,
    "q230_trimmed_mean"        -> graft.ops.Quality.trimmedMeanLengthSql,
    "q231_t_closeness"         -> graft.ops.Maintenance.tClosenessAuditSql,
    "q232_attribution"         -> RelationalQueries.multiTouchAttributionSql,
    "q233_survival_table"      -> RelationalQueries.survivalTableSql,
    "q234_markov_removal"      -> graft.ops.Markov.markovRemovalSql,
    "q235_kcenter_coreset"     -> graft.sim.KCenter.kCenterCoresetSql,
    "q236_oov_rate"            -> graft.text.TextQueries.oovRateSql,
    "q237_active_users"        -> RelationalQueries.activeUserStickinessSql,
    "q238_postings_compression" -> graft.text.CorpusOps.postingsCompressionSql,
    "q239_encoding_advisor"    -> graft.ops.Layout.encodingAdvisorSql,
    "q240_seasonal_backtest"   -> graft.ops.Quality.seasonalBacktestSql,
    "q241_association_rules"   -> graft.ops.Affinity.associationRulesSql,
    "q242_two_prop_z"          -> graft.ops.Inference.twoPropZSql,
    "q243_bh_fdr"              -> graft.ops.Inference.bhFdrSql,
    "q244_gate_shapley"        -> graft.text.Scrub.gateShapleySql,
    "q246_seq3_patterns"       -> RelationalQueries.seq3PatternsSql,
    "q248_simpson_slopes"      -> graft.ops.Quality.simpsonSlopesSql,
    "q245_rbo_eval"            -> graft.sim.RankFusion.rboEvalSql,
    "q250_isotonic_calibration" -> graft.ops.Quality.isotonicCalibrationSql,
    "q247_join_order_advisor"  -> graft.ops.Sketches.joinOrderAdvisorSql,
    "q249_bitemporal_asof"     -> graft.ops.Maintenance.bitemporalAsOfSql,
    "q251_theil_sen"           -> graft.ops.Quality.theilSenTrendSql,
    "q252_conformal_coverage"  -> graft.ops.Quality.conformalCoverageSql,
    "q253_kanon_repair"        -> graft.ops.Maintenance.kAnonymityRepairSql,
    "q254_hilbert_skipping"    -> graft.ops.Layout.hilbertSkippingSql,
    "q255_source_datacard"     -> graft.ops.Quality.sourceDatacardSql,
    "q256_bootstrap_ci"        -> graft.ops.Quality.bootstrapCiSql,
    "q257_wilson_bounds"       -> graft.ops.Inference.wilsonBoundsSql,
    "q258_banding_planner"     -> graft.dedup.DedupQueries.bandingPlannerSql,
    "q259_rfm_segments"        -> RelationalQueries.rfmSegmentsSql,
    "q260_compaction_scheduler" -> graft.ops.Layout.compactionSchedulerSql,
    "q261_label_affinity"      -> graft.sim.SimilarityQueries.labelCentroidAffinitySql,
    "q262_hll_dau"             -> graft.ops.Sketches.hllDauSql,
    "q263_token_mass_median"   -> graft.ops.Quality.tokenMassMedianSql,
    "q264_seasonal_outliers"   -> graft.ops.Quality.seasonalOutliersSql,
    "q265_eval_coverage"       -> graft.sim.SimilarityQueries.evalCoverageSql,
    "q266_json_roundtrip"      -> graft.ops.Formats.jsonRoundTripSql,
    "q267_aa_calibration"      -> graft.ops.Inference.aaCalibrationSql,
    "q268_scatter_ratio"       -> graft.sim.SimilarityQueries.scatterRatioSql,
    "q269_burstiness"          -> graft.ops.Quality.burstinessSql,
    "q270_growth_accounting"   -> RelationalQueries.growthAccountingSql,
    "q271_cluster_sizes"       -> graft.dedup.DedupQueries.clusterSizeHistogramSql,
    "q272_unigram_seed"        -> graft.text.Unigram.seedStatsSql,
    "q273_data_contracts"      -> graft.ops.Contracts.dataContractsSql,
    "q274_hist_quantiles"      -> graft.ops.Sketches.histogramQuantilesSql,
    "q275_sorted_neighborhood" -> graft.dedup.Linkage.sortedNeighborhoodSql,
    "q276_fellegi_sunter"      -> graft.dedup.Linkage.fellegiSunterSql,
    "q277_weighted_minhash"    -> graft.dedup.Linkage.weightedMinhashSql,
    "q278_corpus_laws"         -> graft.text.CorpusLaws.corpusLawsSql,
    "q279_dp_counts"           -> graft.ops.Privacy.dpCountsSql,
    "q280_changepoints"        -> graft.ops.Changepoint.changepointsSql,
    "q281_source_influence"    -> graft.text.TextQueries.sourceInfluenceSql,
    "q282_jl_recall"           -> graft.sim.SimilarityQueries.jlRecallSql,
    "q283_mann_kendall"        -> graft.ops.Changepoint.mannKendallSql,
  )
}
