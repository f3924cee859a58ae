package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q282 JL-projection recall: the engine must equal a driver replay
  * that projects with the SAME sign matrix and the same sequential
  * left-fold order, and the projection must preserve some neighbor
  * signal even on the isotropic corpus. */
class JlSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("q282 equals the driver replay of project-then-rank") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions.col
    val vecs = graft.ops.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val signs = SimilarityQueries.jlSigns
    // sequential left fold per output dim — the engines' own order
    def project(x: Array[Double]): Array[Double] =
      Array.tabulate(SimilarityQueries.JlDims) { j =>
        var acc = 0.0; var i = 0
        while (i < 64) { acc += x(i) * signs(j)(i).toDouble; i += 1 }
        acc
      }
    val proj = vecs.map { case (id, e) => id -> project(e) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def topk(space: Array[(Long, Array[Double])], q: Long): Seq[Long] = {
      val qe = space.find(_._1 == q).get._2
      space.filter(_._1 != q)
        .map { case (id, e) => (id, r6(cos(qe, e))) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSeq
    }
    val queries = vecs.map(_._1).filter(_ % 100 == 0)
    val expect = queries.map { q =>
      val exact = topk(vecs, q).toSet
      val approx = topk(proj, q)
      val hits = approx.count(exact)
      val firstRank = approx.zipWithIndex
        .collectFirst { case (id, i) if exact(id) => i + 1 }
      q -> ((hits.toLong, firstRank))
    }.toMap
    val got = SimilarityQueries.jlRecall(spark, dir).collect()
      .map(r => r.getAs[Long]("qid") ->
        ((r.getAs[Long]("n_hits"),
          Option(r.getAs[java.lang.Integer]("first_hit_rank")).map(_.intValue)))).toMap
    assert(got === expect)
    // Rademacher 64→16 preserves SOME neighbor structure even here
    assert(got.values.map(_._1).sum > 0L)
  }

  test("sign matrix is balanced-ish and deterministic") {
    val signs = SimilarityQueries.jlSigns
    assert(signs.length === SimilarityQueries.JlDims)
    assert(signs.forall(_.length === 64))
    // md5 parity over 1024 draws: within 4 sigma of balance
    val plus = signs.flatten.count(_ == 1)
    assert(math.abs(plus - 512) < 4 * 16, s"sign balance off: $plus/1024 are +1")
  }
}
