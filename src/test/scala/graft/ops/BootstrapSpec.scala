package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q255/q256/q257 invariants: datacard parity with the standalone
  * audits; bootstrap CI brackets the true mean with sane width and a
  * driver-side replica replay matches bit-for-bit; Wilson bounds
  * bracket the rate and match a reference formula. */
class BootstrapSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("sourceDatacard agrees with the standalone per-source audits") {
    val spark = SparkSpec.spark
    val card = Quality.sourceDatacard(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // good rate must equal the q242 grid's proportion
    val good = Inference.goodRateCounts(
      Tables.documents(spark, dir)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    card.foreach { case (src, r) =>
      val (n, x) = good(src)
      assert(r.getAs[Long]("n_docs") === n)
      assert(r.getAs[Long]("good_x10k") === x * 10000 / n)
      val gini = r.getAs[Long]("lang_gini_x10k")
      assert(gini >= 0 && gini < 10000)
    }
    // corpus-wide dup mass must reconstruct q16's duplicate count
    val docs = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val exactDups = docs.length - docs.groupBy(_._2.toLowerCase
      .replaceAll("[^a-z0-9]", "")).size
    // dup_x10k is truncated per source; reconstructed mass within 10k/2·|sources|
    val approxDups = card.map { case (_, r) =>
      r.getAs[Long]("dup_x10k") * r.getAs[Long]("n_docs") / 10000.0
    }.sum
    assert(math.abs(approxDups - exactDups) <= card.size,
      s"dup mass $approxDups vs exact $exactDups (slack ${card.size})")
  }

  test("bootstrapCi: deterministic replicas, CI brackets the plain mean") {
    val spark = SparkSpec.spark
    val rows = Quality.bootstrapCi(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_reps"),
        r.getAs[Long]("lo_milli"), r.getAs[Long]("hi_milli"),
        r.getAs[Long]("boot_mean_milli")))
    assert(rows.length === 20)
    rows.foreach { case (src, nReps, lo, hi, bm) =>
      assert(nReps === Quality.BootR)
      assert(lo <= bm && bm <= hi, s"$src: $lo <= $bm <= $hi")
    }
    // determinism: a second run is bit-identical (hash-driven weights)
    val again = Quality.bootstrapCi(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("lo_milli"),
        r.getAs[Long]("hi_milli"))).toSet
    assert(again === rows.map(r => (r._1, r._3, r._4)).toSet)
    // the CI should usually bracket the true mean; assert it does for
    // at least 18 of 20 sources (90% CI, 25-doc sources are noisy)
    val trueMean = Tables.documents(spark, dir)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s2, xs) =>
        s2 -> xs.map(_._2).sum * 1000 / xs.length }
    val bracketed = rows.count { case (src, _, lo, hi, _) =>
      lo <= trueMean(src) && trueMean(src) <= hi }
    assert(bracketed >= 18, s"only $bracketed/20 CIs bracket the true mean")
  }

  test("wilsonBounds: lo ≤ rate ≤ hi, matches reference formula, never degenerate") {
    val spark = SparkSpec.spark
    val rows = Inference.wilsonBounds(spark, dir).collect()
    rows.foreach { r =>
      val (n, x) = (r.getAs[Long]("n"), r.getAs[Long]("x"))
      val (lo, hi) = (r.getAs[Double]("wilson_lo6"), r.getAs[Double]("wilson_hi6"))
      val p = x.toDouble / n
      assert(lo <= p + 1e-9 && p <= hi + 1e-9)
      assert(lo >= -1e-9 && hi <= 1.0 + 1e-9)
      val z2 = 3.8416
      def ref(sign: Int) = {
        val v = (p + z2 / (2 * n) + sign * 1.96 *
          math.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))) / (1 + z2 / n)
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      assert(math.abs(lo - ref(-1)) < 1e-9 && math.abs(hi - ref(1)) < 1e-9)
      // Wilson never collapses to a point even at x = 0 or x = n
      assert(hi - lo > 0)
    }
  }
}
