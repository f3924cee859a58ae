package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Salting must change the shuffle layout, never the answer. */
class SkewSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  test("saltedSumCount equals the plain aggregation") {
    val spark = SparkSpec.spark
    val o = Tables.orders(spark, sfDir)
    val plain = o.groupBy(col("o_custkey").as("k"))
      .agg(sum("o_totalprice").as("total"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), (math.rint(r.getDouble(1) * 100), r.getLong(2)))).toMap
    val salted = Skew.saltedSumCount(
        o, col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), (math.rint(r.getDouble(1) * 100), r.getLong(2)))).toMap
    assert(salted === plain)
  }

  test("q135 keySkewProfile: top key's counts and fixed-point ratios match a driver recount") {
    val spark = SparkSpec.spark
    // independent recount: per-key counts via a collect of the raw
    // grouped counts (bounded: supplier-key cardinality), then the same
    // exact integer fixed-point math in BigInt (overflow-free witness)
    val counts = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val total = BigInt(counts.values.sum)
    val nKeys = BigInt(counts.size)
    val expTop = counts.toSeq.sortBy { case (k, c) => (-c, k) }.take(Skew.SkewTopN)
    val got = Skew.keySkewProfile(spark, sfDir).collect()
    assert(got.length == math.min(Skew.SkewTopN, counts.size))
    got.zip(expTop).foreach { case (r, (k, c)) =>
      assert(r.getAs[Long]("l_suppkey") == k)
      assert(r.getAs[Long]("cnt") == c)
      assert(BigInt(r.getAs[Long]("share_x10k")) == BigInt(c) * 10000 / total)
      assert(BigInt(r.getAs[Long]("skew_x10k")) == BigInt(c) * nKeys * 10000 / total)
    }
    // the profile's reason to exist: skew_x10k ≈ ratio-to-mean — the top
    // key must sit at or above the mean (10000 = perfectly uniform)
    assert(got.head.getAs[Long]("skew_x10k") >= 10000L)
  }

  test("saltedJoin equals the plain inner join") {
    val spark = SparkSpec.spark
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val plain = o.join(c, o("o_custkey") === c("c_custkey"))
      .select("o_orderkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(
        o, c, o("o_custkey"), c("c_custkey"), o("o_orderkey"), numSalts = 8)
      .select("o_orderkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted === plain)
    assert(salted.nonEmpty)
  }
}
