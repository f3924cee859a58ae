package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The bounded posting-list accumulator (q59) must agree with the
  * unbounded reference semantics — sort-distinct-take(k) — under any
  * partial/merge split Spark's aggregation might choose. Seeded random
  * trials (the offline cache has no scalatest↔scalacheck bridge). */
class MinKSpec extends AnyFunSuite {

  private def run(k: Int, parts: Seq[Seq[Long]]): Seq[Long] = {
    val agg = new TopKAggregator.MinK(k)
    val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    agg.finish(partials.foldLeft(agg.zero)(agg.merge))
  }

  test("minK(partitioned input) == distinct-sorted take k, any split") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val ids = List.fill(rnd.nextInt(60))(rnd.nextLong(50L))
      val k = 1 + rnd.nextInt(8)
      // model the plan's contract: inputs are pre-deduplicated
      val distinct = rnd.shuffle(ids.distinct)
      val nParts = 1 + rnd.nextInt(5)
      val parts = distinct.grouped(math.max(1, distinct.size / nParts + 1)).toSeq
      assert(run(k, parts) == distinct.sorted.take(k))
    }
  }

  test("buffer never exceeds k during reduce or merge") {
    val agg = new TopKAggregator.MinK(3)
    val b = (1L to 100L).foldLeft(agg.zero)(agg.reduce)
    assert(b.length == 3 && b == List(1L, 2L, 3L))
    val merged = agg.merge(b, List(0L, 10L, 20L))
    assert(merged.length == 3 && merged == List(0L, 1L, 2L))
  }
}
