package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q215 Cohen's kappa: driver-side recount of both screens must
  * reproduce the 2×2 cells, and the shipped kappa must equal the
  * textbook formula over those integers. */
class KappaSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("kappaLabelers cells equal a driver-side recount and kappa the formula (sf0.01)") {
    val spark = SparkSpec.spark
    val docs = Tables.documents(spark, dir)
      .select("text", "n_chars").collect()
      .map(r => (r.getAs[String]("text"), r.getAs[Long]("n_chars")))

    val tokRe = "[a-z0-9]+".r
    val cells = docs.map { case (text, nChars) =>
      val words = text.split(" ", -1).toSet
      val stopTypes = Quality.KappaStops.count(words.contains)
      val pa = nChars >= Quality.KappaLenLo && nChars <= Quality.KappaLenHi
      val pb = stopTypes >= Quality.KappaMinStopTypes &&
        tokRe.findAllIn(text).size >= Quality.KappaMinTok
      (pa, pb)
    }
    val n11 = cells.count(c => c._1 && c._2).toLong
    val n10 = cells.count(c => c._1 && !c._2).toLong
    val n01 = cells.count(c => !c._1 && c._2).toLong
    val n00 = cells.count(c => !c._1 && !c._2).toLong
    val n = n11 + n10 + n01 + n00
    val peNum = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)

    val r = Quality.kappaLabelers(spark, dir).collect().head
    assert(r.getAs[Long]("n11") === n11)
    assert(r.getAs[Long]("n10") === n10)
    assert(r.getAs[Long]("n01") === n01)
    assert(r.getAs[Long]("n00") === n00)
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("po_ppm") === (n11 + n00) * 1000000L / n)
    assert(r.getAs[Long]("pe_ppm") === peNum * 1000000L / (n * n))
    val kappa = (n * (n11 + n00) - peNum).toDouble / (n * n - peNum).toDouble
    assert(math.abs(r.getAs[Double]("kappa6") - math.rint(kappa * 1e6) / 1e6) < 1e-9)
    // the corpus exercises all four cells — otherwise the audit is vacuous
    assert(Seq(n11, n10, n01, n00).forall(_ > 0))
    // kappa is bounded and, by construction of correlated screens, above chance
    assert(r.getAs[Double]("kappa6") >= -1.0 && r.getAs[Double]("kappa6") <= 1.0)
  }
}
