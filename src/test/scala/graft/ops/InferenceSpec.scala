package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q242/q243: driver-side brute-force pooled two-proportion z per
  * source pair and a reference Benjamini–Hochberg step-up must equal
  * the distributed plans bit-for-bit; plus the BH structural
  * invariants (step-up contiguity, the k* witness satisfies the
  * threshold, k*+1 does not). */
class InferenceSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  private def goodCounts(): Map[String, (Long, Long)] = {
    val spark = SparkSpec.spark
    val stop = Set("the", "a", "of", "and", "is", "to")
    Tables.documents(spark, dir).select("source", "text").collect()
      .map { r =>
        val text = r.getAs[String]("text")
        val ntok = "[a-z0-9]+".r.findAllIn(text).length.toLong
        val nstop = text.split(" ", -1).count(stop.contains).toLong
        (r.getAs[String]("source"),
          if (ntok >= 20 && 5 * nstop < 3 * ntok) 1L else 0L)
      }
      .groupBy(_._1)
      .map { case (s, rows) => s -> (rows.length.toLong, rows.map(_._2).sum) }
  }

  private def refZ(xa: Long, na: Long, xb: Long, nb: Long): Option[Double] = {
    val x = xa + xb; val n = na + nb
    if (x == 0 || x == n) None
    else {
      val p = x.toDouble / n
      val z = (xa.toDouble / na - xb.toDouble / nb) /
        math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
      Some(BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("twoPropZ equals brute-force pooled z on every source pair (sf0.01)") {
    val spark = SparkSpec.spark
    val g = goodCounts()
    val sources = g.keys.toSeq.sorted
    val got = Inference.twoPropZ(spark, dir).collect().map { r =>
      (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("x_a"), r.getAs[Long]("x_b"),
          Option(r.getAs[java.lang.Double]("z6")).map(_.doubleValue)))
    }.toMap
    assert(got.size === sources.size * (sources.size - 1) / 2)
    for {
      (a, ia) <- sources.zipWithIndex
      b <- sources.drop(ia + 1)
    } {
      val (na, xa) = g(a); val (nb, xb) = g(b)
      val (gn_a, gn_b, gx_a, gx_b, gz) = got((a, b))
      assert((gn_a, gn_b, gx_a, gx_b) === ((na, nb, xa, xb)), s"pair ($a,$b)")
      (gz, refZ(xa, na, xb, nb)) match {
        case (Some(z), Some(rz)) => assert(math.abs(z - rz) < 1e-9, s"($a,$b)")
        case (None, None)        => ()
        case other               => fail(s"z nullability mismatch $other")
      }
    }
  }

  test("bhFdr step-up matches a reference BH and is contiguous (sf0.01)") {
    val spark = SparkSpec.spark
    val rows = Inference.bhFdr(spark, dir).collect().map { r =>
      (r.getAs[Long]("rank"), r.getAs[Long]("p_ppm"),
        r.getAs[Long]("k_star"), r.getAs[Long]("reject"),
        (r.getAs[String]("source_a"), r.getAs[String]("source_b")))
    }.sortBy(_._1)
    val m = rows.length.toLong
    // p monotone with rank; ranks are 1..m
    assert(rows.map(_._1).toSeq === (1L to m))
    assert(rows.sliding(2).forall(w => w.length < 2 || w(0)._2 <= w(1)._2))
    // reference BH over the same p values
    val ps = rows.map(_._2)
    val kRef = (1L to m).filter(k => ps(k.toInt - 1) * m <= k * Inference.AlphaPpm)
      .lastOption.getOrElse(0L)
    assert(rows.forall(_._3 == kRef), "k_star constant and correct")
    rows.foreach { case (rank, _, _, rej, pair) =>
      assert(rej === (if (rank <= kRef) 1L else 0L), s"reject flag at $pair")
    }
    // the witness inequality holds AT k* and fails at every k > k*
    if (kRef > 0) assert(ps(kRef.toInt - 1) * m <= kRef * Inference.AlphaPpm)
    ((kRef + 1) to m).foreach { k =>
      assert(ps(k.toInt - 1) * m > k * Inference.AlphaPpm)
    }
  }

  test("associationRules: confidence cut, direction expansion, lift parity with q164") {
    val spark = SparkSpec.spark
    val co = Affinity.itemCooccurrence(spark, dir).collect()
      .map(r => (r.getAs[Long]("item_a"), r.getAs[Long]("item_b")) ->
        r.getAs[Long]("lift_x10k")).toMap
    val rules = Affinity.associationRules(spark, dir).collect()
    assert(rules.nonEmpty)
    rules.foreach { r =>
      val ante = r.getAs[Long]("ante"); val cons = r.getAs[Long]("cons")
      val (nA, nAb, conf) = (r.getAs[Long]("n_ante"), r.getAs[Long]("n_ab"),
        r.getAs[Long]("conf_x10k"))
      assert(conf === nAb * 10000 / nA)
      assert(conf >= Affinity.MinConf)
      // symmetric lift must equal q164's on the undirected pair
      val key = (math.min(ante, cons), math.max(ante, cons))
      assert(co.contains(key) && co(key) === r.getAs[Long]("lift_x10k"))
    }
  }
}
