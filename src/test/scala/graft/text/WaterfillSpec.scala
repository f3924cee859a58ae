package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q211 water-filling: the closed-form level must equal the naive
  * scan-all-levels optimum, and the allocation must satisfy the
  * max-min fairness contract. */
class WaterfillSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  private def bruteLevel(supplies: Seq[Long], b: Long): Long = {
    // largest integer L with Σ min(s, L) ≤ b (monotone → binary search)
    def mass(l: Long) = supplies.map(math.min(_, l)).sum
    if (mass(supplies.max) <= b) supplies.max
    else {
      var (lo, hi) = (0L, supplies.max)
      while (lo < hi) { // invariant: mass(lo) ≤ b < mass(hi+1)
        val mid = (lo + hi + 1) / 2
        if (mass(mid) <= b) lo = mid else hi = mid - 1
      }
      lo
    }
  }

  test("waterfillBudget level equals the brute-force optimum; contract holds (sf0.01)") {
    val spark = SparkSpec.spark
    val rows = CorpusOps.waterfillBudget(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        ((r.getAs[Long]("supply"), r.getAs[Long]("level"),
          r.getAs[Long]("alloc"), r.getAs[Long]("saturated")))).toMap
    val supplies = rows.values.map(_._1).toSeq
    val total = supplies.sum
    val b = total / CorpusOps.WaterFrac
    val level = rows.values.head._2
    assert(rows.values.forall(_._2 == level), "level is a global scalar")
    assert(level === bruteLevel(supplies, b))
    // feasibility and maximality of the integer level
    val allocs = rows.values.map(_._3)
    assert(allocs.sum <= b)
    assert(supplies.map(s => math.min(s, level + 1)).sum > b,
      "level + 1 would blow the budget")
    // max-min fairness: a = min(s, L); saturated ⟺ s ≤ L
    rows.values.foreach { case (s, l, a, sat) =>
      assert(a === math.min(s, l))
      assert(sat === (if (s <= l) 1L else 0L))
    }
    // the budget binds on this corpus: someone must be rationed
    assert(rows.values.exists(_._4 == 0L))
  }
}
