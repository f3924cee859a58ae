package graft.fraud

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The four fraud rules (reference: scripts/run_pipeline.py:21-43) as one
  * declarative plan.
  *
  * Reference shape vs ours:
  *  - DuplicateAadhaar / MultiAadhaar: the reference collects flagged-key
  *    lists to the driver and replays them via `isin`
  *    (run_pipeline.py:24-31). We use window count-distincts — one
  *    shuffle per partition key, no driver state, no broadcast of an
  *    unbounded key list.
  *  - HighClaimAmount: strict `>` against exact p99 (run_pipeline.py:34-35,
  *    pandas linear-interpolation quantile — Spark `percentile` matches).
  *    At 100 TB pass `exactQuantile = false` for `approx_percentile`.
  *  - FrequentClaims: lag over (Aadhaar, Date) with `_row_id` tie-break
  *    replacing pandas' stable-sort file order (run_pipeline.py:38-41);
  *    null lag never fires, matching NaN `<= 7` == False.
  *
  * Tag string: fixed order `DuplicateAadhaar;MultiAadhaar;HighClaimAmount;
  * FrequentClaims`, each suffixed `;`, empty → `Normal`
  * (run_pipeline.py:26,31,35,41,43).
  */
object RuleEngine {
  /** Deterministic input-order row id; call once right after the scan. */
  def withRowId(df: DataFrame): DataFrame =
    if (df.columns.contains("_row_id")) df
    else df.withColumn("_row_id", monotonically_increasing_id())

  def p99Amount(df: DataFrame, exact: Boolean = true): Double = {
    val e = if (exact) "percentile(ClaimAmount, 0.99)"
            else "approx_percentile(ClaimAmount, 0.99, 10000)"
    df.agg(expr(e)).head().getDouble(0)
  }

  /** Adds `RuleFraud` (and keeps `_row_id`). */
  def withRuleTags(df0: DataFrame, exactQuantile: Boolean = true): DataFrame = {
    val df = withRowId(df0)
    val p99 = p99Amount(df, exactQuantile)
    val wAad  = Window.partitionBy("Aadhaar")
    val wName = Window.partitionBy("Name")
    val wLag  = Window.partitionBy("Aadhaar").orderBy("Date", "_row_id")
    val daysDiff = datediff(col("Date"), lag(col("Date"), 1).over(wLag))
    val tags = concat(
      when(size(collect_set(col("Name")).over(wAad)) > 1, "DuplicateAadhaar;").otherwise(""),
      when(size(collect_set(col("Aadhaar")).over(wName)) > 1, "MultiAadhaar;").otherwise(""),
      when(col("ClaimAmount") > lit(p99), "HighClaimAmount;").otherwise(""),
      when(daysDiff <= 7, "FrequentClaims;").otherwise(""))
    df.withColumn("RuleFraud", when(tags === "", "Normal").otherwise(tags))
  }
}
