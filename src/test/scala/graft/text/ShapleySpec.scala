package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.Tables

/** q244 gate Shapley: the distributed grid computation must equal a
  * brute-force average over all 4! gate orders, satisfy the
  * efficiency axiom exactly (Σφ·24 = 24·total removed), and dominate
  * nothing it shouldn't (0 ≤ φ_g·24 ≤ 24·n_flagged(g)). */
class ShapleySpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("gateShapley equals brute-force over all gate orders and is efficient") {
    val spark = SparkSpec.spark
    val got = Scrub.gateShapley(spark, dir).collect()
      .map(r => r.getAs[String]("gate") ->
        ((r.getAs[Long]("n_flagged"), r.getAs[Long]("phi_x24"),
          r.getAs[Long]("phi_milli")))).toMap
    assert(got.keySet === Set("exact_dup", "benchmark_overlap",
      "low_quality", "contaminated"))

    // rebuild the 16-cell mask histogram from the op's own flag
    // definitions but via independent code paths (waterfall-free)
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val keepId = docs.groupBy { case (_, t) =>
      t.toLowerCase.replaceAll("[^a-z0-9]", "")
    }.values.map(g => g.keys.min -> g.keys.toSet).toMap
    val repOf = keepId.flatMap { case (m, ids) => ids.map(_ -> m) }
    val stop = Set("the", "a", "of", "and", "is", "to")
    val cont = Scrub.decontaminate(spark, dir).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val masks = docs.keys.toSeq.map { id =>
      val t = docs(id)
      val ntok = "[a-z0-9]+".r.findAllIn(t).length.toLong
      val nstop = t.split(" ", -1).count(stop.contains).toLong
      val good = ntok >= 20 && 5 * nstop < 3 * ntok
      (if (repOf(id) != id) 1 else 0) |
        (if (id % Scrub.BenchStride == Scrub.BenchOffset) 2 else 0) |
        (if (!good) 4 else 0) |
        (if (cont(id)) 8 else 0)
    }
    def v(coalition: Int): Long = masks.count(m => (m & coalition) != 0).toLong

    val gates = Seq(1, 2, 4, 8)
    val names = Map(1 -> "exact_dup", 2 -> "benchmark_overlap",
      4 -> "low_quality", 8 -> "contaminated")
    // brute force: marginal contribution averaged over all 24 orders
    val phi = scala.collection.mutable.Map(gates.map(_ -> 0L): _*)
    gates.permutations.foreach { order =>
      var acc = 0
      order.foreach { g =>
        phi(g) += v(acc | g) - v(acc)
        acc |= g
      }
    }
    gates.foreach { g =>
      val (nFlagged, phiX24, phiMilli) = got(names(g))
      assert(phiX24 === phi(g), s"gate ${names(g)}")
      assert(phiMilli === phiX24 * 1000 / 24)
      assert(nFlagged === v(g))
      assert(phiX24 >= 0 && phiX24 <= 24 * nFlagged)
    }
    // efficiency: Σφ = v(all gates), exactly
    assert(gates.map(g => got(names(g))._2).sum === 24 * v(15))
  }

  test("seq3/simpson sanity: triple mass equals window count; den > 0") {
    val spark = SparkSpec.spark
    val seq3 = graft.ops.RelationalQueries.seq3Patterns(spark, dir).collect()
    val totalTriples = seq3.map(_.getAs[Long]("n_occ")).sum
    val ev = Tables.events(spark, dir).select("user_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    // each user with n events contributes n-2 contiguous triples
    assert(totalTriples === ev.values.map(n => math.max(0, n - 2).toLong).sum)
    seq3.foreach(r => assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_occ")))

    val simpson = graft.ops.Quality.simpsonSlopes(spark, dir).collect()
    assert(simpson.length === 5)
    val pooled = simpson.map(_.getAs[Double]("pooled_slope6")).distinct
    assert(pooled.length === 1, "pooled slope identical on every row")
  }
}
