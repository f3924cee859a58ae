package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q176 gap-fill: the spine-join-free plan shape (2 exchanges, no
  * join, LOCF window reuses the fold's partitioning) and the
  * densification semantics (dense daily coverage, zero-fill vs LOCF). */
class GapFillSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.01"

  test("q176 plan: no join, exactly 2 exchanges, window adds none") {
    val spark = SparkSpec.spark
    val p = RelationalQueries.dailyGapFill(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "the spine must come from the fold, not a join\n" + p)
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 2,
      s"expected (user, day) + (user) exchanges only, got $exchanges\n$p")
    // the LOCF window is present but rides the fold's (user) partitioning
    assert(p.contains("Window"), p)
  }

  test("q176 semantics: dense span per user, zero-fill days carry the last active total") {
    val spark = SparkSpec.spark
    val out = RelationalQueries.dailyGapFill(spark, sfDir).cache()
    try {
      // per user: rows == span length, first/last days active
      val spans = out.groupBy("user_id").agg(
        count(lit(1)).as("rows"),
        (datediff(max("day"), min("day")) + 1).as("span"),
        sum(when(col("n_events") === 0, 1L).otherwise(0L)).as("gaps"))
      assert(spans.where(col("rows") =!= col("span")).count() === 0L,
        "daily grain must be dense over [first, last]")
      assert(spans.agg(sum("gaps")).head().getLong(0) > 0L,
        "corpus has no silent days — the gap-fill test is vacuous")
      // on a gap day: total 0 but carried equals the previous active total
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("day")
      val gapsOk = out
        .withColumn("prev_carried", lag("carried_value", 1).over(w))
        .where(col("n_events") === 0)
        .where(col("total_value") =!= 0.0 ||
          col("carried_value") =!= col("prev_carried"))
      assert(gapsOk.count() === 0L,
        "gap rows must be zero-filled and carry the previous LOCF value")
      // on an active day: carried equals that day's own total
      val active = out.where(col("n_events") > 0)
        .where(col("carried_value") =!= col("total_value"))
      assert(active.count() === 0L)
    } finally { out.unpersist(); () }
  }
}
