package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q250 isotonic recalibration: the minimax grid fit must be
  * monotone, n-weighted-mean-preserving in aggregate, and agree with
  * a reference driver-side PAVA (exact doubles) to ≤ 1 milli (the
  * integer-mean truncation bound). */
class IsotonicSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  /** Classic pool-adjacent-violators over (n, sum) blocks, exact
    * rational comparisons via cross-multiplication. */
  private def pava(ns: Array[Long], ls: Array[Long]): Array[Double] = {
    case class Block(var n: Long, var l: Long, var size: Int)
    val stack = scala.collection.mutable.ArrayBuffer[Block]()
    for (i <- ns.indices) {
      stack += Block(ns(i), ls(i), 1)
      while (stack.length >= 2 &&
        stack(stack.length - 2).l * stack.last.n >=
          stack.last.l * stack(stack.length - 2).n) {
        val top = stack.remove(stack.length - 1)
        stack.last.n += top.n; stack.last.l += top.l; stack.last.size += top.size
      }
    }
    stack.flatMap(b => Array.fill(b.size)(b.l.toDouble / b.n)).toArray
  }

  test("isotonicCalibration is monotone and matches exact PAVA within 1 milli") {
    val spark = SparkSpec.spark
    val rows = Quality.isotonicCalibration(spark, dir).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
        r.getAs[Long]("sum_label"), r.getAs[Long]("raw_milli"),
        r.getAs[Long]("iso_milli")))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // monotone non-decreasing fit
    assert(rows.sliding(2).forall(w => w.length < 2 || w(0)._5 <= w(1)._5))
    // raw milli is the truncated bin mean
    rows.foreach { case (_, n, l, raw, _) => assert(raw === l * 1000 / n) }
    // matches exact PAVA to the integer-mean truncation bound
    val ref = pava(rows.map(_._2), rows.map(_._3))
    rows.zip(ref).foreach { case ((bin, _, _, _, iso), r) =>
      assert(math.abs(iso - r * 1000.0) <= 1.0 + 1e-9, s"bin $bin: $iso vs $r")
    }
    // aggregate mass preserved within truncation: Σ n·iso ≈ 1000·Σ label
    val fitMass = rows.map { case (_, n, _, _, iso) => n * iso }.sum
    val labelMass = rows.map(_._3).sum * 1000
    assert(math.abs(fitMass - labelMass) <= rows.map(_._2).sum,
      "n-weighted fit mass within 1 milli per row of label mass")
  }

  test("rboEval matches a double-arithmetic reference per query") {
    val spark = SparkSpec.spark
    val a = graft.sim.ScalarQuantization.sqTopK(spark, dir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank")))
    val b = graft.sim.SimilarityQueries.cosineTopK(spark, dir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank")))
    val bRank = b.map(t => (t._1, t._2) -> t._3).toMap
    val ref = a.groupBy(_._1).map { case (qid, rowsA) =>
      var rbo = 0.0
      for (d <- 1 to 5) {
        val ov = rowsA.count { case (q, n, ra) =>
          ra <= d && bRank.get((q, n)).exists(_ <= d)
        }
        rbo += 0.1 * math.pow(0.9, d - 1) * ov / d
      }
      qid -> rbo
    }
    val got = graft.sim.RankFusion.rboEval(spark, dir).collect()
      .map(r => r.getAs[Long]("qid") ->
        ((r.getAs[Long]("n_overlap"), r.getAs[Long]("rbo_x1e8")))).toMap
    assert(got.keySet === ref.keySet)
    got.foreach { case (qid, (ov, rbo)) =>
      assert(ov <= 5)
      // exact fixed point vs double reference: within 1 ulp-ish and
      // never above the truncated-RBO ceiling 0.40951
      assert(math.abs(rbo - ref(qid) * 1e8) <= 1.0, s"qid $qid")
      assert(rbo <= 40951000L)
    }
  }
}
