package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q212 Benford audit: driver replay equality, all nine digit rows
  * present, and the ppm table is the real log10(1+1/d) grid. */
class BenfordSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("BenfordPpm is log10(1+1/d) to the ppm") {
    Quality.BenfordPpm.zipWithIndex.foreach { case (p, i) =>
      val d = i + 1
      val exact = math.log10(1.0 + 1.0 / d) * 1e6
      assert(math.abs(p - exact) < 1.0, s"digit $d")
    }
    assert(Quality.BenfordPpm.sum === 1000000L)
  }

  test("benfordAudit equals the driver replay; all 9 digits ship (sf0.01)") {
    val spark = SparkSpec.spark
    val amounts = Tables.orders(spark, dir)
      .select("o_totalprice").collect().map(_.getDouble(0)).filter(_ >= 1)
    val obs = amounts
      .map(a => math.floor(a).toLong.toString.head.asDigit)
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val n = amounts.length.toLong
    val got = Quality.benfordAudit(spark, dir).collect()
      .map(r => r.getAs[Int]("digit") ->
        ((r.getAs[Long]("o"), r.getAs[Long]("expected"),
          r.getAs[Double]("contrib6")))).toMap
    assert(got.keySet === (1 to 9).toSet)
    (1 to 9).foreach { d =>
      val o = obs.getOrElse(d, 0L)
      val ppm = Quality.BenfordPpm(d - 1)
      val diff = (o * 1000000L - n * ppm).toDouble
      val contrib = BigDecimal(diff * diff / (1e6 * n * ppm))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(d)._1 === o, s"digit $d observed")
      assert(got(d)._2 === n * ppm / 1000000L, s"digit $d expected")
      assert(math.abs(got(d)._3 - contrib) < 2e-6, s"digit $d contrib")
    }
    // counts reconcile
    assert(got.values.map(_._1).sum === n)
  }
}
