package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q216 Mann–Whitney U: driver-side brute-force rank-sum per source
  * pair (doubled-U integer arithmetic, tie-corrected z) must equal
  * the distributed plan bit-for-bit. */
class MwuSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("mannWhitneyDrift equals brute-force doubled-U on every source pair (sf0.01)") {
    val spark = SparkSpec.spark
    val docs = Tables.documents(spark, dir)
      .select("source", "n_chars").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_chars")))

    val bySrc = docs.groupBy(_._1).map { case (s, rows) => s -> rows.map(_._2) }
    val sources = bySrc.keys.toSeq.sorted
    val truth = (for {
      (a, ia) <- sources.zipWithIndex
      b <- sources.drop(ia + 1)
    } yield {
      val (xa, xb) = (bySrc(a), bySrc(b))
      val (na, nb) = (xa.length.toLong, xb.length.toLong)
      // doubled U of side a: pairwise wins count twice, ties once
      val u2 = xa.iterator.map { va =>
        2L * xb.count(_ < va) + xb.count(_ == va)
      }.sum
      val tieT = (xa ++ xb).groupBy(identity).values.map { g =>
        val t = g.size.toLong; t * t * t - t
      }.sum
      (a, b) -> ((na, nb, u2, tieT))
    }).toMap

    val got = Quality.mannWhitneyDrift(spark, dir).collect().map { r =>
      (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("u2_a"), r.getAs[Long]("tie_t"),
          r.getAs[Double]("z6")))
    }.toMap

    assert(got.keySet === truth.keySet)
    got.foreach { case (k, (na, nb, u2, t, z6)) =>
      assert((na, nb, u2, t) === truth(k), s"pair $k")
      // 0 ≤ 2U ≤ 2·n_a·n_b, and the z the integers imply matches
      assert(u2 >= 0 && u2 <= 2 * na * nb)
      val n = (na + nb).toDouble
      val sigma = math.sqrt(na.toDouble * nb.toDouble / 12.0 *
        ((n + 1.0) - t.toDouble / (n * (n - 1.0))))
      assert(math.abs(z6 - math.rint((u2 - na * nb) / (2.0 * sigma) * 1e6) / 1e6)
        < 1e-9, s"z mismatch for $k")
    }
    assert(got.size === sources.size * (sources.size - 1) / 2)
    // the two-sided family: u2 of side b is the complement
    got.foreach { case ((_, _), (na, nb, u2, _, _)) =>
      val u2b = 2 * na * nb - u2
      assert(u2b >= 0 && u2b <= 2 * na * nb)
    }
  }
}
