package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QueryPack

/** The graft.text registration unit: each entry pairs a
  * registered query with its DuckDB oracle AT THE DECLARATION
  * SITE, so the two can never drift apart (VERDICT r16 item 8;
  * SparkEntry is the union of packs, OracleSqlSpec pins it). */
object TextPack extends QueryPack {
  val entries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    // training-data pipeline: text analysis + multimodal plumbing
    ("q22_langid",
      (graft.text.TextQueries.langId _),
      graft.text.TextQueries.langIdSql),
    ("q23_text_quality",
      (graft.text.TextQueries.quality _),
      graft.text.TextQueries.qualitySql),
    ("q24_token_count",
      (graft.text.TextQueries.tokenCount _),
      graft.text.TextQueries.tokenCountSql),
    ("q25_fingerprint",
      (graft.text.TextQueries.fingerprint _),
      graft.text.TextQueries.fingerprintSql),
    ("q26_multimodal_meta",
      (graft.text.TextQueries.multimodalMeta _),
      graft.text.TextQueries.multimodalMetaSql),
    ("q29_corpus_stats",
      (graft.text.TextQueries.corpusStats _),
      graft.text.TextQueries.corpusStatsSql),
    ("q30_stratified_sample",
      (graft.text.TextQueries.stratifiedSample _),
      graft.text.TextQueries.stratifiedSampleSql),
    ("q39_chunking",
      (graft.text.TextQueries.chunkDocs _),
      graft.text.TextQueries.chunkDocsSql),
    ("q40_vocab",
      (graft.text.TextQueries.vocab _),
      graft.text.TextQueries.vocabSql),
    // training-data pipeline: corpus cleaning
    ("q42_pii_redact",
      (graft.text.Scrub.piiRedact _),
      graft.text.Scrub.piiRedactSql),
    ("q43_repetition",
      (graft.text.Scrub.repetition _),
      graft.text.Scrub.repetitionSql),
    // training-data pipeline: benchmark decontamination
    ("q46_decontaminate",
      (graft.text.Scrub.decontaminate _),
      graft.text.Scrub.decontaminateSql),
    // training-data pipeline: end-to-end curation keep-list
    ("q48_curated_corpus",
      (graft.text.Scrub.curatedCorpus _),
      graft.text.Scrub.curatedCorpusSql),
    ("q54_chunk_dedup",
      (graft.text.Scrub.chunkDedup _),
      graft.text.Scrub.chunkDedupSql),
    // round-4 additions: sequence packing, banded range join, TF-IDF,
    // bloom runtime-filter decontamination, inverted index, weighted
    // deterministic sampling
    ("q55_sequence_pack",
      (graft.text.CorpusOps.sequencePack _),
      graft.text.CorpusOps.sequencePackSql),
    ("q57_tfidf",
      (graft.text.CorpusOps.tfIdf _),
      graft.text.CorpusOps.tfIdfSql),
    ("q58_bloom_decontaminate",
      (graft.text.Scrub.bloomDecontaminate _),
      graft.text.Scrub.bloomDecontaminateSql),
    ("q59_inverted_index",
      (graft.text.CorpusOps.invertedIndex _),
      graft.text.CorpusOps.invertedIndexSql),
    ("q60_weighted_sample",
      (graft.text.CorpusOps.weightedSample _),
      graft.text.CorpusOps.weightedSampleSql),
    ("q63_sequence_pack_bucketed",
      (graft.text.CorpusOps.sequencePackBucketed _),
      graft.text.CorpusOps.sequencePackBucketedSql),
    // round-6: mixture resampling to target language proportions
    ("q73_mixture_sample",
      (graft.text.CorpusOps.mixtureSample _),
      graft.text.CorpusOps.mixtureSampleSql),
    // round-6: frame-sampling plumbing (the video-pipeline grain)
    ("q74_frame_sample",
      (graft.text.TextQueries.frameSample _),
      graft.text.TextQueries.frameSampleSql),
    // round-7: exact-quota mixture sampling as a threshold FILTER
    // (order-statistic per lang) — q73's beyond-buffer scale path
    ("q77_quota_sample_threshold",
      (graft.text.CorpusOps.quotaSampleThreshold _),
      graft.text.CorpusOps.quotaSampleThresholdSql),
    // round-8: BM25 retrieval scoring (the ranking complement of q59)
    ("q82_bm25_search",
      ((s: SparkSession, d: String) => graft.text.CorpusOps.bm25Search(s, d)),
      graft.text.CorpusOps.bm25SearchSql),
    // round-8: end-to-end corpus build (curate ∘ near-dup collapse ∘ pack)
    ("q83_corpus_build",
      ((s: SparkSession, d: String) => graft.text.CorpusOps.corpusBuild(s, d)),
      graft.text.CorpusOps.corpusBuildSql),
    // round-8: bigram-LM cross-entropy quality scoring (CCNet-style filter)
    ("q84_lm_score",
      ((s: SparkSession, d: String) => graft.text.TextQueries.lmScore(s, d)),
      graft.text.TextQueries.lmScoreSql),
    // round-8: deterministic content-hash train/val/test split (pure map)
    ("q85_deterministic_split",
      (graft.text.CorpusOps.deterministicSplit _),
      graft.text.CorpusOps.deterministicSplitSql),
    // round-8: cross-doc boilerplate n-gram fraction (C4-style template filter)
    ("q86_boilerplate",
      ((s: SparkSession, d: String) => graft.text.Scrub.boilerplate(s, d)),
      graft.text.Scrub.boilerplateSql),
    // round-8: BPE merge-candidate pair statistics (the SQL-expressible
    // face of the tokenizer trainer; the merge loop itself is BpeSpec)
    ("q87_bpe_pairs",
      ((s: SparkSession, d: String) => graft.text.Bpe.pairStats(s, d)),
      graft.text.Bpe.pairStatsSql),
    // round-8: temperature-scaled (α=1/2) mixture resampling, integer-exact
    ("q89_temperature_mixture",
      (graft.text.CorpusOps.temperatureMixture _),
      graft.text.CorpusOps.temperatureMixtureSql),
    // round-8: PMI collocation mining over adjacent token pairs
    ("q90_pmi_collocations",
      ((s: SparkSession, d: String) => graft.text.TextQueries.collocations(s, d)),
      graft.text.TextQueries.collocationsSql),
    // round-8: Naive Bayes lang classifier, trained AND scored in-plan
    ("q94_naive_bayes",
      ((s: SparkSession, d: String) => graft.text.TextQueries.naiveBayesLang(s, d)),
      graft.text.TextQueries.naiveBayesLangSql),
    // round-8: cross-source 8-gram contamination matrix
    ("q95_source_overlap",
      ((s: SparkSession, d: String) => graft.text.Scrub.sourceOverlap(s, d)),
      graft.text.Scrub.sourceOverlapSql),
    // round-8: unigram entropy + type-token ratio quality signals
    ("q97_lexical_diversity",
      ((s: SparkSession, d: String) => graft.text.TextQueries.lexicalDiversity(s, d)),
      graft.text.TextQueries.lexicalDiversitySql),
    // round-8: MOSS winnowing fingerprints + excerpt-sharing pairs
    ("q100_winnow_pairs",
      ((s: SparkSession, d: String) => graft.text.Scrub.winnowPairs(s, d)),
      graft.text.Scrub.winnowPairsSql),
    // round-8: epoch-repeated UPsampled mixture (the q73 gap), capped
    ("q106_upsampled_mixture",
      (graft.text.CorpusOps.upsampledMixture _),
      graft.text.CorpusOps.upsampledMixtureSql),
    // round-8: per-source low-quality rate + lift (feed monitoring)
    ("q107_source_quality_lift",
      ((s: SparkSession, d: String) => graft.text.TextQueries.sourceQualityLift(s, d)),
      graft.text.TextQueries.sourceQualityLiftSql),
    // round-8: token-budget accounting over the split × lang grid
    ("q108_token_budget",
      (graft.text.CorpusOps.tokenBudget _),
      graft.text.CorpusOps.tokenBudgetSql),
    // round-9: curriculum-ordered sequence packing (q84 LM order ∘ q55)
    ("q111_curriculum_pack",
      (graft.text.CorpusOps.curriculumPack _),
      graft.text.CorpusOps.curriculumPackSql),
    // round-9: per-shard manifest over the packed layout (the loader's
    // index artifact)
    ("q114_shard_manifest",
      (graft.text.CorpusOps.shardManifest _),
      graft.text.CorpusOps.shardManifestSql),
    // round-9: DSIR-shaped importance scoring (integer fixed-point ratios)
    ("q119_importance_score",
      (graft.text.CorpusOps.importanceScore _),
      graft.text.CorpusOps.importanceScoreSql),
    ("q120_dsir_select",
      (graft.text.CorpusOps.dsirSelect _),
      graft.text.CorpusOps.dsirSelectSql),
    // round-10: exact substring-SPAN dedup (Lee et al. 2022 grain —
    // arbitrary-alignment repeats via duplicated-8-gram islands)
    ("q123_substring_spans",
      (graft.text.Scrub.substringSpans _),
      graft.text.Scrub.substringSpansSql),
    // round-10: the Gopher rule suite (document-shape quality gates)
    ("q124_gopher_rules",
      (graft.text.TextQueries.gopherRules _),
      graft.text.TextQueries.gopherRulesSql),
    // round-10: incremental span decontamination (q123's islands, new
    // batch vs corpus — the nightly-crawl admission cut)
    ("q128_incremental_spans",
      (graft.text.Scrub.incrementalSpans _),
      graft.text.Scrub.incrementalSpansSql),
    // round-10: q128 against the PERSISTED distinct-gram index
    // (membership ≡ n_corp >= 1 ⇒ same oracle; probe-side-only cost)
    ("q130_incremental_spans_indexed",
      (graft.text.Scrub.incrementalSpansIndexedQuery _),
      graft.text.Scrub.incrementalSpansSql),
    // round-10: cluster-safe split — q129's fix (split by near-dup
    // cluster representative; leakage zero by construction)
    ("q134_cluster_safe_split",
      (graft.text.CorpusOps.clusterSafeSplit _),
      graft.text.CorpusOps.clusterSafeSplitSql),
    // round-14: EXACT global concat-and-chunk packing via the two-phase
    // prefix sum — the scale-correct form of q55/q63's windows
    ("q167_pack_chunk_spans",
      (graft.text.CorpusOps.packChunkSpans _),
      graft.text.CorpusOps.packChunkSpansSql),
    // round-14: overlapping sliding-window RAG chunk spans (pure map +
    // bounded explode, no shuffle)
    ("q168_rag_chunk_spans",
      (graft.text.CorpusOps.ragChunkSpans _),
      graft.text.CorpusOps.ragChunkSpansSql),
    // round-14: corpus-wide exact rank/percentile via the shared
    // two-phase prefix sum (no single-task global window, no float)
    ("q170_global_rank",
      (graft.text.CorpusOps.globalRank _),
      graft.text.CorpusOps.globalRankSql),
    // round-14: deterministic token-weighted (PPS systematic) sample
    // on the q167 stream — no floats, no RNG, hits ∝ size
    ("q171_pps_sample",
      (graft.text.CorpusOps.ppsSample _),
      graft.text.CorpusOps.ppsSampleSql),
    // round-15: snake-balanced training shards — LPT-style greedy on
    // the two-phase global rank, one exchange, no RNG
    ("q172_snake_shards",
      (graft.text.CorpusOps.snakeShards _),
      graft.text.CorpusOps.snakeShardsSql),
    // round-15: per-doc count of word 3-grams first introduced by that
    // doc — ONE gram-grain window + ONE doc-grain aggregate
    ("q177_gram_novelty",
      (graft.text.Scrub.gramNovelty _),
      graft.text.Scrub.gramNoveltySql),
    // round-15: skyline over (length, diversity, repetition) — scan+
    // local-prune once, broadcast nested-loop anti-join on survivors
    ("q178_pareto_frontier",
      (graft.text.CorpusOps.paretoFrontier _),
      graft.text.CorpusOps.paretoFrontierSql),
    // round-15: no-straddle next-fit-decreasing packing — one exchange,
    // in-partition sort, streaming per-group fold
    ("q181_nfd_pack",
      (graft.text.CorpusOps.nfdPack _),
      graft.text.CorpusOps.nfdPackSql),
    // round-15: K-pattern blocklist screen in ONE corpus pass — broadcast
    // Aho-Corasick DFA, in-partition partials, |sources|×K-bounded exchange
    ("q185_blocklist_screen",
      (graft.text.Scrub.blocklistScreen _),
      graft.text.Scrub.blocklistScreenSql),
    // round-15: curation attrition waterfall — first-failing-stage
    // funnel report over q48's own gates, |sources|×5 output
    ("q190_curation_waterfall",
      (graft.text.Scrub.curationWaterfall _),
      graft.text.Scrub.curationWaterfallSql),
    // round-15: Hamilton-apportioned reproducible eval set — integer
    // largest-remainder quotas, budget-sized MinKByStr selection
    ("q191_hamilton_eval",
      (graft.text.CorpusOps.hamiltonEvalSample _),
      graft.text.CorpusOps.hamiltonEvalSampleSql),
    // round-15: rendezvous-hash shard stability — moves only into the
    // new shard, (S+1)²-bounded audit of a pure map
    ("q192_hrw_stability",
      (graft.text.CorpusOps.rendezvousStability _),
      graft.text.CorpusOps.rendezvousStabilitySql),
    // round-15: deterministic per-epoch shuffle → batch manifest
    ("q201_epoch_shuffle",
      (graft.text.CorpusOps.epochShuffleManifest _),
      graft.text.CorpusOps.epochShuffleManifestSql),
    // round-15: Kneser–Ney bigram LM table (continuation counts)
    ("q206_kn_bigram_lm",
      (graft.text.TextQueries.knBigramLm _),
      graft.text.TextQueries.knBigramLmSql),
    // round-15: leave-one-source-out curation ablation (rep promotion exact)
    ("q207_source_ablation",
      (graft.text.Scrub.sourceAblation _),
      graft.text.Scrub.sourceAblationSql),
    // round-15: max-min fair water-filling token-budget allocation
    ("q211_waterfill_budget",
      (graft.text.CorpusOps.waterfillBudget _),
      graft.text.CorpusOps.waterfillBudgetSql),
    // round-16: tokenizer fertility / byte-cost accounting grid
    ("q218_tokenizer_stats",
      (graft.text.CorpusOps.tokenizerStats _),
      graft.text.CorpusOps.tokenizerStatsSql),
    // round-16: zlib compression-ratio quality screen — the first op
    // with NO DuckDB oracle (deflate is not SQL-expressible): the
    // driver records the rows-only check; CompressibilitySpec pins
    // exact values, determinism, and the screen semantics instead
    ("q223_compression_probe",
      (graft.text.Compressibility.compressionProbe _),
      graft.text.Compressibility.compressionProbeSql),
    // round-16: two-term proximity search (min token gap, top-N)
    ("q227_proximity_search",
      (graft.text.TextQueries.proximitySearch _),
      graft.text.TextQueries.proximitySearchSql),
    // round-16: OOV rate per language vs the q40 vocabulary
    ("q236_oov_rate",
      (graft.text.TextQueries.oovRate _),
      graft.text.TextQueries.oovRateSql),
    // round-16: delta+varint posting-list compression accounting
    ("q238_postings_compression",
      (graft.text.CorpusOps.postingsCompression _),
      graft.text.CorpusOps.postingsCompressionSql),
    // round-17: exact Shapley attribution of the q48 curation gates
    ("q244_gate_shapley",
      (graft.text.Scrub.gateShapley _),
      graft.text.Scrub.gateShapleySql),
    // round-16 (driver counter): unigram-LM tokenizer seed statistics
    ("q272_unigram_seed",
      (graft.text.Unigram.seedStats _),
      graft.text.Unigram.seedStatsSql),
    // round-16: Zipf rank-frequency + Heaps vocab-growth law fits (log-log OLS)
    ("q278_corpus_laws",
      (graft.text.CorpusLaws.corpusLaws _),
      graft.text.CorpusLaws.corpusLawsSql),
    // round-16: source leave-one-out influence on the corpus token mean
    ("q281_source_influence",
      ((s: SparkSession, d: String) => graft.text.TextQueries.sourceInfluence(s, d)),
      graft.text.TextQueries.sourceInfluenceSql),
    // round-17: WordPiece position-marked piece statistics (BERT lineage)
    ("q286_wordpiece_seed",
      ((s: SparkSession, d: String) => graft.text.WordPiece.seedStats(s, d)),
      graft.text.WordPiece.seedStatsSql),
  )
}
