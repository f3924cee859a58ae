package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q208 Spearman: driver-side tie-corrected replay equality, plus the
  * defining invariants the rank transform must deliver. */
class SpearmanSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  private val stop = Set("the", "a", "of", "and", "is", "to")

  private def rank2(vs: Seq[Long]): Seq[Double] = {
    val sorted = vs.sorted
    vs.map { v =>
      val less = sorted.count(_ < v)
      val eq = sorted.count(_ == v)
      2.0 * less + eq + 1
    }
  }

  private def spearman(xs: Seq[Long], ys: Seq[Long]): Double = {
    val (rx, ry) = (rank2(xs), rank2(ys))
    val n = xs.length.toDouble
    val (sx, sy) = (rx.sum, ry.sum)
    val sxx = rx.map(r => r * r).sum
    val syy = ry.map(r => r * r).sum
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
    (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
  }

  test("spearmanQuality equals the driver-side tie-corrected replay (sf0.01)") {
    val spark = SparkSpec.spark
    val docs = Tables.documents(spark, dir)
      .select("lang", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val byLang = docs.groupBy(_._1)
    val truth = byLang.map { case (lang, rows) =>
      val xs = rows.map(_._2).toSeq
      val ys = rows.map { case (_, _, t) =>
        val nStop = t.split(" ", -1).count(stop).toLong
        val nTok = "[a-z0-9]+".r.findAllIn(t).length.toLong
        nStop * 10000 / math.max(nTok, 1)
      }.toSeq
      lang -> ((rows.length.toLong,
        BigDecimal(spearman(xs, ys))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = Quality.spearmanQuality(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("rho6")))).toMap
    assert(got.keySet === truth.keySet)
    got.foreach { case (lang, (n, rho)) =>
      assert(n === truth(lang)._1, s"$lang n")
      assert(math.abs(rho - truth(lang)._2) < 2e-6, s"$lang rho")
      assert(rho >= -1.0 && rho <= 1.0, s"$lang range")
    }
  }

  test("Spearman invariants: monotone-transform invariance, perfect-rank = 1") {
    // outlier-proofness: squaring x (a monotone map that wrecks
    // Pearson's linearity) must not move Spearman at all
    val xs = Seq(1L, 5L, 2L, 40L, 3L, 11L, 7L)
    val ys = Seq(2L, 9L, 4L, 90L, 5L, 30L, 11L)
    val a = spearman(xs, ys)
    val b = spearman(xs.map(x => x * x), ys)
    assert(math.abs(a - b) < 1e-12)
    assert(math.abs(spearman(xs, xs.map(_ * 3 + 7)) - 1.0) < 1e-12)
    assert(math.abs(spearman(xs, xs.map(x => -x)) + 1.0) < 1e-12)
    // ties handled: constant blocks still yield a defined, bounded rho
    val t = spearman(Seq(1, 1, 2, 2, 3, 3), Seq(1, 2, 1, 2, 1, 2))
    assert(t >= -1.0 && t <= 1.0)
  }
}
