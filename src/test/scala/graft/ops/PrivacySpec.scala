package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q279: the threshold ladder must be a valid inverse CDF, the noise
  * distribution over a large synthetic key population must match the
  * two-sided geometric analytically, and the release must be the
  * clamped sum — deterministically. */
class PrivacySpec extends AnyFunSuite {

  test("threshold ladder is a monotone CDF reaching 2^53") {
    val ts = Privacy.thresholds
    assert(ts.map(_._1) === (-Privacy.DpTailBound to Privacy.DpTailBound))
    ts.sliding(2).foreach { case Seq((_, a), (_, b)) => assert(a <= b) }
    assert(ts.last._2 === (1L << 53), "CDF must exhaust the uniform's range")
  }

  test("noise over 20k synthetic keys matches the geometric analytically") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val keys = (1 to 20000).map(i => s"k$i").toDF("k")
    val noise = keys.select(Privacy.geometricNoise(col("k")).as("z"))
      .groupBy("z").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = 20000.0
    val p = math.exp(-Privacy.EpsX100 / 100.0)
    val c = (1.0 - p) / (1.0 + p)
    // P(0) = c, P(|1|) = c·p each; 3σ binomial tolerance
    def tol(q: Double) = 3.0 * math.sqrt(q * (1 - q) / n)
    assert(math.abs(noise.getOrElse(0L, 0L) / n - c) < tol(c))
    assert(math.abs(noise.getOrElse(1L, 0L) / n - c * p) < tol(c * p))
    assert(math.abs(noise.getOrElse(-1L, 0L) / n - c * p) < tol(c * p))
    val mean = noise.map { case (k, cnt) => k * cnt }.sum / n
    assert(math.abs(mean) < 0.1, s"noise mean $mean not ~ 0")
  }

  test("release is the clamped sum and the draw is deterministic") {
    val spark = SparkSpec.spark
    val a = Privacy.dpCounts(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .sortBy(_._1)
    a.foreach { case (_, nd, z, rel, eps) =>
      assert(rel === math.max(nd + z, 0L))
      assert(eps === Privacy.EpsX100)
    }
    val b = Privacy.dpCounts(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }
}
