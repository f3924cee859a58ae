package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q224 length Gini: driver-side mean-absolute-difference Gini per
  * source must equal the rank-identity plan exactly. */
class GiniSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("lengthGini equals the pairwise |xi-xj| definition per source (sf0.01)") {
    val spark = SparkSpec.spark
    val bySrc = Tables.documents(spark, dir)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, rows) => s -> rows.map(_._2) }

    val truth = bySrc.map { case (src, xs) =>
      val n = xs.length.toLong
      val sum = xs.sum
      // Gini numerator from the definition: Σi Σj |xi − xj| / 2... the
      // rank identity equals Σ(2r−n−1)x over ascending sort — check
      // against the O(n²) pairwise form to pin the identity itself
      val mad = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum / 2
      // Σ(2r−n−1)x = 2·Σ r·x − (n+1)·Σx, and equals mad (both halves)
      src -> ((n, sum, mad, mad * 1000000L / (n * sum)))
    }

    val got = Quality.lengthGini(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getAs[Long]("n"), r.getAs[Long]("sum_chars"),
        r.getAs[Long]("gini_num"), r.getAs[Long]("gini_ppm")))
    }.toMap

    assert(got.keySet === truth.keySet)
    assert(got === truth)
    // Gini is bounded in [0, 1): ppm in [0, 1e6)
    assert(got.values.forall { case (_, _, num, ppm) =>
      num >= 0 && ppm >= 0 && ppm < 1000000L })
    // the audit must discriminate: not all sources identical
    assert(got.values.map(_._4).toSet.size > 1)
  }
}
