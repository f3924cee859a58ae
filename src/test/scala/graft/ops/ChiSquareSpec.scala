package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q210 chi-square: driver replay equality and the margin identities
  * (expected values reconstruct the margins; contributions finite). */
class ChiSquareSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("chiSquareLangSource equals the driver-side replay (sf0.01)") {
    val spark = SparkSpec.spark
    val docs = Tables.documents(spark, dir)
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val grid = docs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val rTot = grid.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
    val cTot = grid.groupBy(_._1._2).map { case (s, m) => s -> m.values.sum }
    val n = docs.length.toLong
    val truth = grid.map { case ((l, s), o) =>
      val (r, c) = (rTot(l), cTot(s))
      val diff = (o * n - r * c).toDouble
      (l, s) -> ((o, r * c * 1000000L / n,
        BigDecimal(diff * diff / (n.toDouble * r * c))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = Quality.chiSquareLangSource(spark, dir).collect().map { r =>
      (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        ((r.getAs[Long]("o"), r.getAs[Long]("expected_ppm"),
          r.getAs[Double]("contrib6")))
    }.toMap
    assert(got.keySet === truth.keySet)
    got.foreach { case (k, (o, e, ch)) =>
      val (to, te, tch) = truth(k)
      assert(o === to, s"$k observed")
      assert(e === te, s"$k expected")
      assert(math.abs(ch - tch) < 2e-6, s"$k contrib")
    }
    // margin identities on the OBSERVED cells: Σ_cells o = n per both axes
    assert(got.toSeq.groupBy(_._1._1).forall { case (l, cs) =>
      cs.map(_._2._1).sum == rTot(l) })
    assert(got.values.forall(_._3 >= 0.0))
  }
}
