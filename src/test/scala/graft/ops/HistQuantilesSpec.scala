package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q274 histogram quantiles: the estimate must sit within one bin
  * width of the exact order statistic BY CONSTRUCTION (same covering
  * bin), match a driver-side replica of the whole sketch, and be
  * monotone across the percentile ladder. */
class HistQuantilesSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("abs_err <= one bin width, ladder monotone (sf0.001)") {
    val spark = SparkSpec.spark
    val rows = Sketches.histogramQuantiles(spark, sf)
      .orderBy("p_x100").collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(50, 95, 99))

    val mm = Tables.lineitem(spark, sf)
      .agg(min(col("l_extendedprice")).as("lo"), max(col("l_extendedprice")).as("hi"))
      .head()
    val binW = (mm.getDouble(1) - mm.getDouble(0)) / Sketches.HistBins
    rows.foreach { r =>
      assert(r.getDouble(3) <= binW + 1e-9,
        s"p${r.getInt(0)} err ${r.getDouble(3)} exceeds bin width $binW")
    }
    val ests = rows.map(_.getDouble(1))
    assert(ests(0) <= ests(1) && ests(1) <= ests(2))
  }

  test("matches an independent driver-side replica of the sketch") {
    val spark = SparkSpec.spark
    val xs = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice").cast("double")).collect().map(_.getDouble(0))
    val lo = xs.min; val hi = xs.max
    val b = Sketches.HistBins
    val w = (hi - lo) / b
    val counts = new Array[Long](b)
    xs.foreach { x => counts(math.min(((x - lo) / w).toInt, b - 1)) += 1 }
    def est(p: Double): Double = {
      val r = p * (xs.length - 1) + 1
      var cum = 0L; var bin = 0
      while (cum + counts(bin) < r) { cum += counts(bin); bin += 1 }
      lo + w * (bin + (r - cum) / counts(bin))
    }
    val got = Sketches.histogramQuantiles(spark, sf)
      .orderBy("p_x100").collect().map(_.getDouble(1))
    val want = Seq(0.50, 0.95, 0.99).map(p =>
      BigDecimal(est(p)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    got.zip(want).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9, s"replica mismatch: $g vs $e")
    }
  }
}
