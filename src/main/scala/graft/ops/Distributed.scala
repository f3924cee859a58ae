package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global-order primitives.
  *
  * A corpus-wide running total (`Window.orderBy(...)` with no
  * partition key) is the textbook single-task trap: Spark plans it as
  * ONE partition holding every row. The two-phase prefix sum keeps the
  * same semantics parallel end-to-end:
  *
  *  1. `repartitionByRange` on the order columns +
  *     `sortWithinPartitions` — range partitions are contiguous,
  *     ordered intervals of the total order, and
  *     `spark_partition_id()` is their rank;
  *  2. stamp the pid and `localCheckpoint` — the stamp is read twice
  *     (totals, then the windows), so it must be frozen or the two
  *     actions could re-plan the range bounds differently (on a
  *     cluster: reliable `checkpoint`);
  *  3. per-partition totals — ≤ one row per partition, a
  *     scalar-bounded driver collect like the q07/q10 thresholds —
  *     scanned into prefix OFFSETS and broadcast back;
  *  4. a window partitioned BY pid (parallel across partitions, one
  *     narrow exchange) adds each row's local running value to its
  *     partition's offset.
  *
  * Used by q167 (global token packing) and q170 (corpus-wide exact
  * rank/percentile); `PackingSpec` pins two-phase ≡ naive-global-window
  * equality and the no-unpartitioned-window plan shape. */
object Distributed {

  /** `df` plus `outCol` = running SUM of `valCol` over the global
    * `orderCols` order, INCLUSIVE of the current row. `orderCols`
    * must be a total order (include a tiebreak key); `valCol` must be
    * integral (the offsets collect as Long). NULLs in `valCol` count
    * as 0 toward the offsets (and are skipped by the SUM window, per
    * SQL semantics), so NULL-heavy inputs degrade instead of failing.
    * The input projection is localCheckpoint'd — callers reading the
    * result twice pay the scan once. */
  def globalCumSum(df: DataFrame, orderCols: Seq[String], valCol: String,
                   outCol: String): DataFrame = {
    val s = df.sparkSession
    val parts = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val totals = parts.groupBy("__pid")
      .agg(coalesce(sum(col(valCol)), lit(0L)).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxPid = if (totals.isEmpty) -1 else totals.keys.max
    val offsets = (0 to maxPid)
      .scanLeft(0L)((acc, p) => acc + totals.getOrElse(p, 0L))
      .zipWithIndex.map { case (off, p) => (p, off) }
    val offDf = broadcast(s.createDataFrame(offsets).toDF("__pid", "__poff"))
    parts.join(offDf, "__pid")
      .withColumn(outCol,
        col("__poff") + sum(col(valCol)).over(
          Window.partitionBy("__pid").orderBy(orderCols.map(col): _*)))
      .drop("__pid", "__poff")
  }

  /** `df` plus `outCol` = the 1-based global row number under
    * `orderCols` (which must be a total order). */
  def globalRowNumber(df: DataFrame, orderCols: Seq[String],
                      outCol: String): DataFrame =
    globalCumSum(df.withColumn("__one", lit(1L)), orderCols, "__one", outCol)
      .drop("__one")
}
