package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QueryPack

/** The graft.ops registration unit: each entry pairs a
  * registered query with its DuckDB oracle AT THE DECLARATION
  * SITE, so the two can never drift apart (VERDICT r16 item 8;
  * SparkEntry is the union of packs, OracleSqlSpec pins it). */
object OpsPack extends QueryPack {
  val entries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("q37_topk_agg",
      ((s: SparkSession, d: String) => graft.ops.TopKAggregator.topBalancePerNation(s, d)),
      graft.ops.TopKAggregator.topBalancePerNationSql),
    // round-5: the quantile scale path (approx-bracket exact percentiles)
    // as its own oracle-checked query
    ("q61_quantile_approx",
      (graft.ops.Quantiles.quantileApprox _),
      graft.ops.Quantiles.quantileApproxSql),
    // round-6: deterministic sketches (KMV distinct, count-min), the
    // hash-free third dedup family, and three classic warehouse shapes
    // (cube, salted join, ordered funnel)
    ("q65_kmv_distinct",
      (graft.ops.Sketches.kmvDistinct _),
      graft.ops.Sketches.kmvDistinctSql),
    ("q66_countmin_freq",
      (graft.ops.Sketches.countMinFreq _),
      graft.ops.Sketches.countMinFreqSql),
    // round-8: Misra–Gries heavy hitters — bounded sketch finds the
    // candidates, an exact recount answers (no estimate in the output)
    ("q91_heavy_hitters",
      (graft.ops.Sketches.heavyHitters _),
      graft.ops.Sketches.heavyHittersSql),
    // round-8: per-language heavy hitters (grouped MG + exact recount)
    ("q102_grouped_heavy_hitters",
      (graft.ops.Sketches.groupedHeavyHitters _),
      graft.ops.Sketches.groupedHeavyHittersSql),
    // round-9: HLL-style register sketches (fixed-size mergeable distinct)
    ("q117_hll_distinct",
      ((s: SparkSession, d: String) => graft.ops.Sketches.hllDistinct(s, d)),
      graft.ops.Sketches.hllDistinctSql),
    ("q118_hll_source_union",
      ((s: SparkSession, d: String) => graft.ops.Sketches.hllSourceUnion(s, d)),
      graft.ops.Sketches.hllSourceUnionSql),
    // round-10: MERGEABLE grouped quantile sketch (bottom-k hash
    // sample) — the shard-merge complement of q61's exact brackets
    ("q125_sample_quantiles",
      (graft.ops.Quantiles.sampleQuantiles _),
      graft.ops.Quantiles.sampleQuantilesSql),
    // round-10: z-order layout manifest (write-side 2-D clustering;
    // file min/max boxes a rect scan prunes on)
    ("q126_zorder_layout",
      ((s: SparkSession, d: String) => graft.ops.Layout.zorderLayout(s, d)),
      graft.ops.Layout.zorderLayoutSql),
    // round-10: sample-based range-partition planning (the
    // RangePartitioner/distributed-sort split-point computation as a
    // first-class op, on the q125 mergeable bottom-k sample)
    ("q127_range_partition_plan",
      ((s: SparkSession, d: String) => graft.ops.Layout.rangePartitionPlan(s, d)),
      graft.ops.Layout.rangePartitionPlanSql),
    // round-10: order-insensitive bucketed table checksum (the
    // anti-entropy / replication-verification primitive)
    ("q132_table_checksum",
      (graft.ops.Sketches.tableChecksum _),
      graft.ops.Sketches.tableChecksumSql),
    // round-10: CMS inner-product join-size estimate vs exact (the
    // CBO statistics primitive, measured on a many-to-many join)
    ("q133_join_cardinality",
      (graft.ops.Sketches.joinCardinality _),
      graft.ops.Sketches.joinCardinalitySql),
    // round-12: join-key skew profile — the measurement that decides
    // between plain shuffle, AQE skew split, and the q69 salted join
    ("q135_key_skew_profile",
      (graft.ops.Skew.keySkewProfile _),
      graft.ops.Skew.keySkewProfileSql),
    // round-12: small-file compaction planning (distributable first-fit
    // rebinning — the write-side OPTIMIZE manifest)
    ("q136_compaction_plan",
      ((s: SparkSession, d: String) => graft.ops.Layout.compactionPlan(s, d)),
      graft.ops.Layout.compactionPlanSql),
    // round-12: snapshot diff — q132's checksum says WHETHER snapshots
    // drifted, this says WHICH keys and HOW (added/removed/changed)
    ("q137_snapshot_diff",
      (graft.ops.Sketches.snapshotDiff _),
      graft.ops.Sketches.snapshotDiffSql),
    // round-13: Deequ-style declarative constraint suite over orders
    ("q145_quality_checks",
      (graft.ops.Quality.qualityChecks _),
      graft.ops.Quality.qualityChecksSql),
    // round-13: zone-map file-skipping audit — the read-side measurement
    // behind the q126 z-order write
    ("q146_zone_map_skipping",
      (graft.ops.Layout.zoneMapSkipping _),
      graft.ops.Layout.zoneMapSkippingSql),
    // round-13: PSI distribution drift between the q137 snapshots
    ("q148_psi_drift",
      (graft.ops.Quality.psiDrift _),
      graft.ops.Quality.psiDriftSql),
    // round-13: CDC MERGE/upsert — the copy-on-write merge kernel
    ("q152_merge_upsert",
      (graft.ops.Maintenance.mergeUpsert _),
      graft.ops.Maintenance.mergeUpsertSql),
    // round-13: SCD-2 validity-window history build (gaps-and-islands)
    ("q153_scd2_history",
      (graft.ops.Maintenance.scd2History _),
      graft.ops.Maintenance.scd2HistorySql),
    // round-13: GDPR purge audit — broadcast request list, one fact scan
    ("q154_gdpr_delete_audit",
      (graft.ops.Maintenance.gdprDeleteAudit _),
      graft.ops.Maintenance.gdprDeleteAuditSql),
    // round-14: q152's MERGE against the persisted doc_id-bucketed base
    // — only the change-set shuffles (same oracle as q152)
    ("q156_merge_upsert_bucketed",
      (graft.ops.Maintenance.mergeUpsertBucketed _),
      graft.ops.Maintenance.mergeUpsertSql),
    // round-14: merge-on-read scan — union + latest-version-wins, the
    // no-join read dual of q152 (same oracle)
    ("q161_merge_on_read",
      (graft.ops.Maintenance.mergeOnReadScan _),
      graft.ops.Maintenance.mergeUpsertSql),
    // round-14: per-user-capped item co-occurrence + lift (×10⁴ fixed
    // point) — pair fan-out bounded by C(cap,2) per user BY CONSTRUCTION
    ("q164_item_cooccurrence",
      (graft.ops.Affinity.itemCooccurrence _),
      graft.ops.Affinity.itemCooccurrenceSql),
    // round-14: per-file Bloom skipping audit — the point-predicate
    // dual of q146's zone maps (md5 double hashing, manifest-grain)
    ("q165_bloom_skipping",
      (graft.ops.Layout.bloomSkipping _),
      graft.ops.Layout.bloomSkippingSql),
    // round-15: lakehouse metadata-only aggregate — footer stats, not
    // rows; O(files) executor-side reads vs the oracle's full scan
    ("q173_metadata_agg",
      (graft.ops.Metadata.metadataAgg _),
      graft.ops.Metadata.metadataAggSql),
    // round-15: theta-sketch union/intersection estimates per source
    // pair — one gram-grain aggregate, sketch-sized pair algebra
    ("q182_kmv_set_ops",
      (graft.ops.Sketches.kmvSetOps _),
      graft.ops.Sketches.kmvSetOpsSql),
    // round-15: AS-OF point-in-time read over the q153 SCD2 intervals —
    // the read half of the history contract, zero added exchanges
    ("q186_time_travel",
      (graft.ops.Maintenance.timeTravelSnapshot _),
      graft.ops.Maintenance.timeTravelSnapshotSql),
    // round-15: k-anonymity release audit — quasi-identifier classes
    // below k, per-source exposure rollup, one class-grain aggregate
    ("q193_k_anonymity",
      (graft.ops.Maintenance.kAnonymityAudit _),
      graft.ops.Maintenance.kAnonymityAuditSql),
    // round-15: exact-integer two-sample KS statistic per source pair
    ("q198_ks_drift",
      (graft.ops.Quality.ksDrift _),
      graft.ops.Quality.ksDriftSql),
    // round-15: l-diversity release audit (q193's homogeneity dual)
    ("q200_l_diversity",
      (graft.ops.Maintenance.lDiversityAudit _),
      graft.ops.Maintenance.lDiversityAuditSql),
    // round-15: Hilbert-curve layout manifest (q126's Morton upgraded)
    ("q205_hilbert_layout",
      (graft.ops.Layout.hilbertLayout _),
      graft.ops.Layout.hilbertLayoutSql),
    // round-15: tie-corrected Spearman rank correlation per language
    ("q208_spearman_quality",
      (graft.ops.Quality.spearmanQuality _),
      graft.ops.Quality.spearmanQualitySql),
    // round-15: chi-square independence test over the lang × source grid
    ("q210_chi_square",
      (graft.ops.Quality.chiSquareLangSource _),
      graft.ops.Quality.chiSquareLangSourceSql),
    // round-15: Benford first-digit audit over order amounts
    ("q212_benford_audit",
      (graft.ops.Quality.benfordAudit _),
      graft.ops.Quality.benfordAuditSql),
    // round-16: Cohen's kappa between the cheap and content screens
    ("q215_kappa_labelers",
      (graft.ops.Quality.kappaLabelers _),
      graft.ops.Quality.kappaLabelersSql),
    // round-16: Mann–Whitney U location test per source pair
    ("q216_mwu_drift",
      (graft.ops.Quality.mannWhitneyDrift _),
      graft.ops.Quality.mannWhitneyDriftSql),
    // round-16: CUSUM change-point monitor over daily event volume
    ("q217_cusum_drift",
      (graft.ops.Quality.cusumDrift _),
      graft.ops.Quality.cusumDriftSql),
    // round-16: reliability bins / expected-calibration-error audit
    ("q219_ece_calibration",
      (graft.ops.Quality.eceCalibration _),
      graft.ops.Quality.eceCalibrationSql),
    // round-16: ORC sink+source round-trip proven by the q132 checksum
    ("q221_orc_roundtrip",
      (graft.ops.Formats.orcRoundTrip _),
      graft.ops.Formats.orcRoundTripSql),
    // round-16: common-neighbor/resource-allocation link prediction
    ("q222_link_prediction",
      (graft.ops.Affinity.linkPrediction _),
      graft.ops.Affinity.linkPredictionSql),
    // round-16: per-source Gini concentration of document length
    ("q224_length_gini",
      (graft.ops.Quality.lengthGini _),
      graft.ops.Quality.lengthGiniSql),
    // round-16: jackknife source influence on the corpus mean length
    ("q225_jackknife_sources",
      (graft.ops.Quality.jackknifeSources _),
      graft.ops.Quality.jackknifeSourcesSql),
    // round-16: OLS trend (slope/intercept) over daily event volume
    ("q226_ols_trend",
      (graft.ops.Quality.olsDailyTrend _),
      graft.ops.Quality.olsDailyTrendSql),
    // round-16: functional-dependency audit (g3 violation counts)
    ("q228_fd_audit",
      (graft.ops.Quality.fdAudit _),
      graft.ops.Quality.fdAuditSql),
    // round-16: one-way ANOVA F over source length means (omnibus)
    ("q229_anova_length",
      (graft.ops.Quality.anovaLength _),
      graft.ops.Quality.anovaLengthSql),
    // round-16: trimmed mean per source (robust center)
    ("q230_trimmed_mean",
      (graft.ops.Quality.trimmedMeanLength _),
      graft.ops.Quality.trimmedMeanLengthSql),
    // round-16: t-closeness — the release-privacy trio completed
    ("q231_t_closeness",
      (graft.ops.Maintenance.tClosenessAudit _),
      graft.ops.Maintenance.tClosenessAuditSql),
    // round-16: Markov removal-effect attribution (fixed-point chain)
    ("q234_markov_removal",
      (graft.ops.Markov.markovRemoval _),
      graft.ops.Markov.markovRemovalSql),
    // round-16: column-encoding advisor (plain vs dict vs RLE, exact)
    ("q239_encoding_advisor",
      (graft.ops.Layout.encodingAdvisor _),
      graft.ops.Layout.encodingAdvisorSql),
    // round-16: seasonal-naive vs naive forecast backtest
    ("q240_seasonal_backtest",
      (graft.ops.Quality.seasonalBacktest _),
      graft.ops.Quality.seasonalBacktestSql),
    // round-17: directional association rules off q164's capped pairs
    ("q241_association_rules",
      (graft.ops.Affinity.associationRules _),
      graft.ops.Affinity.associationRulesSql),
    // round-17: two-proportion z-test per source pair (good-doc rate)
    ("q242_two_prop_z",
      (graft.ops.Inference.twoPropZ _),
      graft.ops.Inference.twoPropZSql),
    // round-17: Benjamini–Hochberg FDR step-up over the q242 grid
    ("q243_bh_fdr",
      (graft.ops.Inference.bhFdr _),
      graft.ops.Inference.bhFdrSql),
    // round-17: Simpson's-paradox screen, per-type vs pooled OLS sign
    ("q248_simpson_slopes",
      (graft.ops.Quality.simpsonSlopes _),
      graft.ops.Quality.simpsonSlopesSql),
    // round-17: isotonic (PAVA-by-minimax) recalibration of q219 bins
    ("q250_isotonic_calibration",
      (graft.ops.Quality.isotonicCalibration _),
      graft.ops.Quality.isotonicCalibrationSql),
    // round-17: CMS-priced 3-table join-order decision, accuracy in-band
    ("q247_join_order_advisor",
      (graft.ops.Sketches.joinOrderAdvisor _),
      graft.ops.Sketches.joinOrderAdvisorSql),
    // round-17: bitemporal as-of (valid time × system time, stale rows)
    ("q249_bitemporal_asof",
      (graft.ops.Maintenance.bitemporalAsOf _),
      graft.ops.Maintenance.bitemporalAsOfSql),
    // round-17: Theil–Sen robust slope vs OLS per event type
    ("q251_theil_sen",
      (graft.ops.Quality.theilSenTrend _),
      graft.ops.Quality.theilSenTrendSql),
    // round-17: split-conformal prediction sets + empirical coverage
    ("q252_conformal_coverage",
      (graft.ops.Quality.conformalCoverage _),
      graft.ops.Quality.conformalCoverageSql),
    // round-17: k-anonymity repair — equi-depth ≥k generalization bins
    ("q253_kanon_repair",
      (graft.ops.Maintenance.kAnonymityRepair _),
      graft.ops.Maintenance.kAnonymityRepairSql),
    // round-17: hilbert vs zorder zone-map skipping, measured head-to-head
    ("q254_hilbert_skipping",
      (graft.ops.Layout.hilbertSkipping _),
      graft.ops.Layout.hilbertSkippingSql),
    // round-17: one-scan per-source datasheet (volume/quality/dup/diversity)
    ("q255_source_datacard",
      (graft.ops.Quality.sourceDatacard _),
      graft.ops.Quality.sourceDatacardSql),
    // round-17: deterministic Poisson-bootstrap CI for mean length
    ("q256_bootstrap_ci",
      (graft.ops.Quality.bootstrapCi _),
      graft.ops.Quality.bootstrapCiSql),
    // round-17: Wilson score interval per source (rank by lower bound)
    ("q257_wilson_bounds",
      (graft.ops.Inference.wilsonBounds _),
      graft.ops.Inference.wilsonBoundsSql),
    // round-17: budgeted compaction scheduler (ROI-greedy over q136)
    ("q260_compaction_scheduler",
      (graft.ops.Layout.compactionScheduler _),
      graft.ops.Layout.compactionSchedulerSql),
    // round-17: HLL-sketched DAU grid (q237's production counterpart)
    ("q262_hll_dau",
      (graft.ops.Sketches.hllDau _),
      graft.ops.Sketches.hllDauSql),
    // round-17: token-mass vs count median per source (admission unit)
    ("q263_token_mass_median",
      (graft.ops.Quality.tokenMassMedian _),
      graft.ops.Quality.tokenMassMedianSql),
    // round-17: weekday-seasonal residual outliers (median + MAD gate)
    ("q264_seasonal_outliers",
      (graft.ops.Quality.seasonalOutliers _),
      graft.ops.Quality.seasonalOutliersSql),
    // round-17: JSONL round-trip proven lossless (the q221 discipline)
    ("q266_json_roundtrip",
      (graft.ops.Formats.jsonRoundTrip _),
      graft.ops.Formats.jsonRoundTripSql),
    // round-17: A/A null calibration of the drift gate (pseudo-arms)
    ("q267_aa_calibration",
      (graft.ops.Inference.aaCalibration _),
      graft.ops.Inference.aaCalibrationSql),
    // round-17: inter-event burstiness screen (Goh–Barabási B)
    ("q269_burstiness",
      (graft.ops.Quality.burstiness _),
      graft.ops.Quality.burstinessSql),
    // round-16: declarative data-contract suite (one row per expectation)
    ("q273_data_contracts",
      (graft.ops.Contracts.dataContracts _),
      graft.ops.Contracts.dataContractsSql),
    // round-16: mergeable histogram quantiles + exact-error audit
    ("q274_hist_quantiles",
      (graft.ops.Sketches.histogramQuantiles _),
      graft.ops.Sketches.histogramQuantilesSql),
    // round-16: ε-DP count release via the derandomized geometric mechanism
    ("q279_dp_counts",
      (graft.ops.Privacy.dpCounts _),
      graft.ops.Privacy.dpCountsSql),
    // round-16: depth-2 binary-segmentation changepoints on the daily grid
    ("q280_changepoints",
      (graft.ops.Changepoint.changepoints _),
      graft.ops.Changepoint.changepointsSql),
    // round-16: Mann–Kendall trend significance on the (type, day) grid
    ("q283_mann_kendall",
      (graft.ops.Changepoint.mannKendall _),
      graft.ops.Changepoint.mannKendallSql),
  )
}
