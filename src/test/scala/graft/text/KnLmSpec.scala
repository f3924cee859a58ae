package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q206 Kneser–Ney bigram LM: driver-side replay equality, and the KN
  * normalization identity — the smoothed conditional sums to exactly 1
  * over the full vocabulary for every context. */
class KnLmSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  private val D = 0.75

  private def bigrams(spark: org.apache.spark.sql.SparkSession) =
    graft.ops.Tables.documents(spark, dir).select("text").collect()
      .map(_.getString(0))
      .flatMap { t =>
        val toks = "[a-z0-9]+".r.findAllIn(t).toSeq
        toks.zip(toks.drop(1))
      }

  test("knBigramLm equals the driver-side KN replay on the top rows (sf0.01)") {
    val spark = SparkSpec.spark
    val bg = bigrams(spark)
    val c12 = bg.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c1tot = c12.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val n1fwd = c12.groupBy(_._1._1).map { case (w1, m) => w1 -> m.size.toLong }
    val n1bwd = c12.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val t = c12.size.toLong
    def pkn(w1: String, w2: String): Double = {
      val c = c12.getOrElse((w1, w2), 0L)
      math.max(c.toDouble - D, 0.0) / c1tot(w1) +
        ((D * n1fwd(w1)) / c1tot(w1)) * (n1bwd(w2).toDouble / t)
    }
    val truth = c12.toSeq
      .sortBy { case ((w1, w2), c) => (-c, w1, w2) }.take(TextQueries.KnTopN)
      .map { case ((w1, w2), c) =>
        (w1, w2) -> ((c, c1tot(w1), n1fwd(w1), n1bwd(w2),
          BigDecimal(pkn(w1, w2))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }.toMap
    val got = TextQueries.knBigramLm(spark, dir).collect().map { r =>
      (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
        ((r.getAs[Long]("c12"), r.getAs[Long]("c1tot"),
          r.getAs[Long]("n1fwd"), r.getAs[Long]("n1bwd"),
          r.getAs[Double]("kn_prob6")))
    }.toMap
    assert(got.keySet === truth.keySet)
    got.foreach { case (k, (c, ct, nf, nb, p)) =>
      val (tc, tct, tnf, tnb, tp) = truth(k)
      assert((c, ct, nf, nb) === ((tc, tct, tnf, tnb)), s"$k counts")
      assert(math.abs(p - tp) < 2e-6, s"$k prob: $p vs $tp")
    }
  }

  test("KN normalization: the conditional sums to 1 over the vocab per context") {
    val spark = SparkSpec.spark
    val bg = bigrams(spark)
    val c12 = bg.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c1tot = c12.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val n1fwd = c12.groupBy(_._1._1).map { case (w1, m) => w1 -> m.size.toLong }
    val n1bwd = c12.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val t = c12.size.toLong
    val vocab2 = n1bwd.keys.toSeq
    // the heaviest three contexts: Σ_w2 P_KN(w2|w1) must be exactly 1
    // (max(c−D,0) discounts D·n1fwd of observed mass; the backoff term
    // puts exactly that much back because Σ n1bwd = T)
    c1tot.toSeq.sortBy(-_._2).take(3).foreach { case (w1, ct) =>
      val s = vocab2.map { w2 =>
        val c = c12.getOrElse((w1, w2), 0L)
        math.max(c.toDouble - D, 0.0) / ct +
          ((D * n1fwd(w1)) / ct) * (n1bwd(w2).toDouble / t)
      }.sum
      assert(math.abs(s - 1.0) < 1e-9, s"context '$w1' sums to $s")
    }
  }
}
