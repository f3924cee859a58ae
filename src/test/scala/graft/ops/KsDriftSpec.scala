package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q198 KS drift: driver-side brute-force two-sample KS per source
  * pair (exact integer arithmetic, same fixed point) must equal the
  * distributed plan bit-for-bit. */
class KsDriftSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("ksDrift equals brute-force integer KS on every source pair (sf0.01)") {
    val spark = SparkSpec.spark
    val docs = Tables.documents(spark, dir)
      .select("source", "n_chars").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_chars")))

    val bySrc = docs.groupBy(_._1).map { case (s, rows) =>
      s -> rows.map(_._2).sorted
    }
    val sources = bySrc.keys.toSeq.sorted
    val truth = (for {
      (a, ia) <- sources.zipWithIndex
      b <- sources.drop(ia + 1)
    } yield {
      val (xa, xb) = (bySrc(a), bySrc(b))
      val (na, nb) = (xa.length.toLong, xb.length.toLong)
      val vs = (xa ++ xb).distinct.sorted
      val ksNum = vs.map { v =>
        val ca = xa.count(_ <= v).toLong
        val cb = xb.count(_ <= v).toLong
        math.abs(ca * nb - cb * na)
      }.max
      (a, b) -> ((na, nb, ksNum, ksNum * Quality.KsScale / (na * nb)))
    }).toMap

    val got = Quality.ksDrift(spark, dir).collect().map { r =>
      (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("ks_num"), r.getAs[Long]("ks_ppm")))
    }.toMap

    assert(got.keySet === truth.keySet)
    assert(got === truth)
    // the statistic is a normalized sup-gap: 0 ≤ ks_num ≤ n_a·n_b
    assert(got.values.forall { case (na, nb, num, ppm) =>
      num >= 0 && num <= na * nb && ppm >= 0 && ppm <= Quality.KsScale
    })
    // all C(|S|,2) pairs present, and drift actually measured somewhere
    assert(got.size === sources.size * (sources.size - 1) / 2)
    assert(got.values.exists(_._4 > 0))
  }
}
