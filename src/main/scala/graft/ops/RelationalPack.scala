package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QueryPack

/** The graft.ops registration unit: each entry pairs a
  * registered query with its DuckDB oracle AT THE DECLARATION
  * SITE, so the two can never drift apart (VERDICT r16 item 8;
  * SparkEntry is the union of packs, OracleSqlSpec pins it). */
object RelationalPack extends QueryPack {
  val entries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    // §2.1-2.5: scans, aggregates, windows, joins
    ("q01_scan_filter_project",
      (graft.ops.RelationalQueries.scanFilterProject _),
      graft.ops.RelationalQueries.scanFilterProjectSql),
    ("q02_group_agg",
      (graft.ops.RelationalQueries.groupAgg _),
      graft.ops.RelationalQueries.groupAggSql),
    ("q03_having_filter",
      (graft.ops.RelationalQueries.havingFilter _),
      graft.ops.RelationalQueries.havingFilterSql),
    ("q04_window_flag",
      (graft.ops.RelationalQueries.windowFlag _),
      graft.ops.RelationalQueries.windowFlagSql),
    ("q05_quantile_p99",
      (graft.ops.RelationalQueries.quantileP99 _),
      graft.ops.RelationalQueries.quantileP99Sql),
    ("q06_lag_datediff",
      (graft.ops.RelationalQueries.lagDatediff _),
      graft.ops.RelationalQueries.lagDatediffSql),
    ("q07_anomaly_threshold",
      (graft.ops.RelationalQueries.anomalyThreshold _),
      graft.ops.RelationalQueries.anomalyThresholdSql),
    ("q08_rule_tags",
      (graft.ops.RelationalQueries.ruleTags _),
      graft.ops.RelationalQueries.ruleTagsSql),
    ("q09_value_counts_top",
      (graft.ops.RelationalQueries.valueCountsTop _),
      graft.ops.RelationalQueries.valueCountsTopSql),
    ("q12_date_format",
      (graft.ops.RelationalQueries.dateFormat _),
      graft.ops.RelationalQueries.dateFormatSql),
    ("q13_join_revenue",
      (graft.ops.RelationalQueries.joinRevenue _),
      graft.ops.RelationalQueries.joinRevenueSql),
    ("q14_window_topn",
      (graft.ops.RelationalQueries.windowTopN _),
      graft.ops.RelationalQueries.windowTopNSql),
    ("q15_anti_join",
      (graft.ops.RelationalQueries.antiJoin _),
      graft.ops.RelationalQueries.antiJoinSql),
    ("q27_sessionize",
      (graft.ops.RelationalQueries.sessionize _),
      graft.ops.RelationalQueries.sessionizeSql),
    ("q32_asof_join",
      (graft.ops.RelationalQueries.asofJoin _),
      graft.ops.RelationalQueries.asofJoinSql),
    ("q33_tumbling_window",
      (graft.ops.RelationalQueries.tumblingWindow _),
      graft.ops.RelationalQueries.tumblingWindowSql),
    ("q34_rollup",
      (graft.ops.RelationalQueries.rollupStats _),
      graft.ops.RelationalQueries.rollupStatsSql),
    ("q35_pivot",
      (graft.ops.RelationalQueries.pivotLangCounts _),
      graft.ops.RelationalQueries.pivotLangCountsSql),
    ("q36_json_extract",
      (graft.ops.RelationalQueries.jsonExtract _),
      graft.ops.RelationalQueries.jsonExtractSql),
    ("q41_window_ranks",
      (graft.ops.RelationalQueries.windowRanks _),
      graft.ops.RelationalQueries.windowRanksSql),
    ("q38_set_ops",
      (graft.ops.RelationalQueries.setOps _),
      graft.ops.RelationalQueries.setOpsSql),
    // custom-plan showcase: native as-of join (LogicalPlan+Strategy+SparkPlan)
    ("q47_asof_native",
      (graft.ops.RelationalQueries.asofJoinNative _),
      graft.ops.RelationalQueries.asofJoinNativeSql),
    ("q50_moving_avg",
      (graft.ops.RelationalQueries.movingAvg _),
      graft.ops.RelationalQueries.movingAvgSql),
    ("q51_group_quantiles",
      (graft.ops.RelationalQueries.groupQuantiles _),
      graft.ops.RelationalQueries.groupQuantilesSql),
    ("q52_histogram",
      (graft.ops.RelationalQueries.histogram _),
      graft.ops.RelationalQueries.histogramSql),
    ("q56_range_join",
      (graft.ops.RelationalQueries.rangeJoin _),
      graft.ops.RelationalQueries.rangeJoinSql),
    ("q68_cube_agg",
      (graft.ops.RelationalQueries.cubeAgg _),
      graft.ops.RelationalQueries.cubeAggSql),
    ("q69_salted_join",
      (graft.ops.RelationalQueries.saltedJoinRevenue _),
      graft.ops.RelationalQueries.saltedJoinRevenueSql),
    ("q70_event_funnel",
      (graft.ops.RelationalQueries.eventFunnel _),
      graft.ops.RelationalQueries.eventFunnelSql),
    // round-8: exponentially time-decayed per-user activity score
    ("q92_decayed_activity",
      (graft.ops.RelationalQueries.decayedActivity _),
      graft.ops.RelationalQueries.decayedActivitySql),
    // round-8: median/MAD robust outliers (grouped bracket quantiles ×2)
    ("q93_robust_outliers",
      (graft.ops.RelationalQueries.robustOutliers _),
      graft.ops.RelationalQueries.robustOutliersSql),
    // round-8: equi-depth decile binning from exact bracket percentiles
    ("q98_equidepth_bins",
      (graft.ops.RelationalQueries.equiDepthBins _),
      graft.ops.RelationalQueries.equiDepthBinsSql),
    // round-8: grouped Pearson corr / covariance co-moments
    ("q99_comoment_stats",
      (graft.ops.RelationalQueries.comomentStats _),
      graft.ops.RelationalQueries.comomentStatsSql),
    // round-10: cohort retention (activation analytics over events)
    ("q131_cohort_retention",
      (graft.ops.RelationalQueries.cohortRetention _),
      graft.ops.RelationalQueries.cohortRetentionSql),
    // round-12: forward as-of (earliest strictly-later purchase + wait)
    ("q139_asof_forward",
      (graft.ops.RelationalQueries.asofForward _),
      graft.ops.RelationalQueries.asofForwardSql),
    // round-12: forward direction through the native AsOfJoin plan
    ("q140_asof_forward_native",
      (graft.ops.RelationalQueries.asofForwardNative _),
      graft.ops.RelationalQueries.asofForwardNativeSql),
    // round-12: per-event-type time-to-purchase quantiles (the funnel
    // deliverable q139 feeds)
    ("q141_conversion_latency",
      (graft.ops.RelationalQueries.conversionLatency _),
      graft.ops.RelationalQueries.conversionLatencySql),
    // round-12: session conversion rate by depth (q27's rollup)
    ("q142_session_conversion",
      (graft.ops.RelationalQueries.sessionConversion _),
      graft.ops.RelationalQueries.sessionConversionSql),
    // round-13: overlapping 2h/1h hopping windows (q33's sliding twin)
    ("q144_hopping_window",
      (graft.ops.RelationalQueries.hoppingWindow _),
      graft.ops.RelationalQueries.hoppingWindowSql),
    // round-13: general GROUPING SETS (the rollup/cube trio completed)
    ("q147_grouping_sets",
      (graft.ops.RelationalQueries.groupingSetsAgg _),
      graft.ops.RelationalQueries.groupingSetsAggSql),
    // round-13: UNPIVOT/melt — q35's reshape inverse
    ("q151_unpivot",
      (graft.ops.RelationalQueries.unpivotLangCounts _),
      graft.ops.RelationalQueries.unpivotLangCountsSql),
    // round-14: interval attribution join (view → purchase within 1 h);
    // batch twin of the native watermarked stream-stream join
    ("q155_interval_attribution",
      (graft.ops.RelationalQueries.intervalAttribution _),
      graft.ops.RelationalQueries.intervalAttributionSql),
    // round-14: q13's revenue join planned by the sketch-join advisor
    // (un-hinted dims broadcast from catalog sketches; same oracle)
    ("q157_sketch_join_revenue",
      (graft.ops.RelationalQueries.sketchJoinRevenue _),
      graft.ops.RelationalQueries.joinRevenueSql),
    // round-14: strict ordered funnel via cascaded running-min windows
    ("q158_funnel_steps",
      (graft.ops.RelationalQueries.funnelSteps _),
      graft.ops.RelationalQueries.funnelStepsSql),
    // round-14: trailing-7-day per-user activity (RANGE frame on µs)
    ("q159_rolling_activity",
      (graft.ops.RelationalQueries.rollingUserActivity _),
      graft.ops.RelationalQueries.rollingUserActivitySql),
    // round-14: first-order event-transition matrix (Markov counts)
    ("q160_event_transitions",
      (graft.ops.RelationalQueries.eventTransitions _),
      graft.ops.RelationalQueries.eventTransitionsSql),
    // round-14: exact p25/p50/p75 per group from ONE sorted buffer
    ("q162_quantile_bands",
      (graft.ops.RelationalQueries.quantileBands _),
      graft.ops.RelationalQueries.quantileBandsSql),
    // round-14: correlated-subquery decorrelation (above own-user mean)
    // in x100 integer fixed point
    ("q163_above_user_mean",
      (graft.ops.RelationalQueries.aboveUserMean _),
      graft.ops.RelationalQueries.aboveUserMeanSql),
    // round-15: daily time-spine densification with LOCF — the
    // spine JOIN rewritten as a bounded per-user map fold, 2 exchanges
    ("q176_daily_gap_fill",
      (graft.ops.RelationalQueries.dailyGapFill _),
      graft.ops.RelationalQueries.dailyGapFillSql),
    // round-16: first/last/linear multi-touch attribution, one table
    ("q232_attribution",
      (graft.ops.RelationalQueries.multiTouchAttribution _),
      graft.ops.RelationalQueries.multiTouchAttributionSql),
    // round-16: discrete survival table with censoring (churn hazard)
    ("q233_survival_table",
      (graft.ops.RelationalQueries.survivalTable _),
      graft.ops.RelationalQueries.survivalTableSql),
    // round-16: exact DAU/WAU/MAU stickiness table
    ("q237_active_users",
      (graft.ops.RelationalQueries.activeUserStickiness _),
      graft.ops.RelationalQueries.activeUserStickinessSql),
    // round-17: frequent contiguous event-type triples (+user support)
    ("q246_seq3_patterns",
      (graft.ops.RelationalQueries.seq3Patterns _),
      graft.ops.RelationalQueries.seq3PatternsSql),
    // round-17: RFM quintile segmentation (5=best on every axis)
    ("q259_rfm_segments",
      (graft.ops.RelationalQueries.rfmSegments _),
      graft.ops.RelationalQueries.rfmSegmentsSql),
    // round-17: growth accounting (new/retained/resurrected/churned)
    ("q270_growth_accounting",
      (graft.ops.RelationalQueries.growthAccounting _),
      graft.ops.RelationalQueries.growthAccountingSql),
  )
}
