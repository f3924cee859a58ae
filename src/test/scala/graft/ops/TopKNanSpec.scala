package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The double-keyed bounded aggregators replaced `row_number` windows,
  * so their ordering must be a TOTAL order agreeing with Spark's SQL
  * double ordering (SQLOrderingUtil: -0.0 == 0.0, NaN largest) for
  * EVERY input — including the NaN cosine a zero-norm embedding
  * produces. The pre-fix comparator (`a > b || a == b` both false for
  * NaN) made buffer position depend on arrival order; these trials
  * shuffle arrival order and partial/merge splits and require a single
  * canonical answer.
  */
class TopKNanSpec extends AnyFunSuite {

  private val NaN = Double.NaN

  private def runScored(k: Int, parts: Seq[Seq[(Double, Long, Double, Int)]]) = {
    val agg = new TopKAggregator.TopKByScore(k)
    val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    agg.finish(partials.foldLeft(agg.zero)(agg.merge))
  }

  private def runTopK(k: Int, parts: Seq[Seq[(Double, Long)]]) = {
    val agg = new TopKAggregator.TopK(k)
    val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    agg.finish(partials.foldLeft(agg.zero)(agg.merge))
  }

  /** Spark's SQL double ordering, as the oracle for these trials. */
  private def sparkCmp(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  test("TopKByScore: NaN ranks first (Spark sorts NaN largest), deterministically") {
    val rows = Seq[(Double, Long, Double, Int)](
      (0.9, 1L, 0.9, 0), (NaN, 2L, NaN, 0), (0.7, 3L, 0.7, 0), (NaN, 4L, NaN, 0))
    val expected = rows.sortWith { (a, b) =>
      val c = sparkCmp(a._1, b._1); c > 0 || (c == 0 && a._2 < b._2)
    }.take(3)
    // every permutation and a few split shapes must agree
    for (perm <- rows.permutations; nParts <- 1 to 3) {
      val parts = perm.grouped(math.max(1, perm.size / nParts)).toSeq
      val got = runScored(3, parts)
      assert(got == expected, s"perm=$perm parts=$nParts")
    }
    assert(expected.head._1.isNaN && expected(1)._1.isNaN)
  }

  test("TopK: -0.0 ties with 0.0 and breaks on id, as Spark's ordering does") {
    val rows = Seq[(Double, Long)]((-0.0, 5L), (0.0, 2L), (0.0, 9L), (-0.0, 1L))
    for (perm <- rows.permutations) {
      val got = runTopK(4, Seq(perm))
      assert(got.map(_._2) == Seq(1L, 2L, 5L, 9L), s"perm=$perm")
    }
  }

  test("randomized trials with NaN injection: split-invariant and window-equal") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(30)
      val rows = List.tabulate(n) { i =>
        val s = rnd.nextInt(5) match {
          case 0 => NaN
          case 1 => 0.0
          case 2 => -0.0
          case _ => rnd.nextDouble()
        }
        (s, i.toLong, s, 0)
      }
      val k = 1 + rnd.nextInt(6)
      val expected = rows.sortWith { (a, b) =>
        val c = sparkCmp(a._1, b._1); c > 0 || (c == 0 && a._2 < b._2)
      }.take(k)
      val shuffled = rnd.shuffle(rows)
      val nParts = 1 + rnd.nextInt(4)
      val parts = shuffled.grouped(math.max(1, shuffled.size / nParts + 1)).toSeq
      val got = runScored(k, parts)
      // NaN != NaN, so compare ids + NaN positions, not tuples
      assert(got.map(_._2) == expected.map(_._2))
      assert(got.map(_._1.isNaN) == expected.map(_._1.isNaN))
    }
  }
}
