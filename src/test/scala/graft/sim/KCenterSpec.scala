package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q235 k-center: driver-side farthest-first replay over collected
  * vectors, plus the greedy invariant (each center is genuinely the
  * farthest point at its step). */
class KCenterSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var (dot, na, nb) = (0.0, 0.0, 0.0)
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / math.sqrt(na * nb)
  }
  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6

  test("kCenterCoreset equals a driver-side farthest-first replay (sf0.01)") {
    val spark = SparkSpec.spark
    val vecs = graft.ops.Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

    var centers = Vector(vecs.keys.min)
    for (_ <- 2 to KCenter.KCenters) {
      val next = vecs.keys.toSeq
        .map(id => (id, centers.map(c => r6(cos(vecs(id), vecs(c)))).max))
        .minBy { case (id, mc) => (mc, id) }._1
      centers = centers :+ next
    }
    val assign = vecs.keys.toSeq.map { id =>
      centers.zipWithIndex
        .map { case (c, i) => (r6(cos(vecs(id), vecs(c))), c) }
        .maxBy { case (mc, c) => (mc, -c) }._2
    }
    val sizes = assign.groupBy(identity).view.mapValues(_.size.toLong).toMap

    val got = KCenter.kCenterCoreset(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.map(_._2).toVector === centers)
    got.foreach { case (_, c, n) => assert(n === sizes(c), s"center $c") }
    // every point assigned exactly once
    assert(got.map(_._3).sum === vecs.size.toLong)
    // greedy span property: consecutive max-cos coverage only improves
    // (each new center is the worst-covered point at its step)
    assert(got.map(_._2).distinct.length === KCenter.KCenters)
  }
}
