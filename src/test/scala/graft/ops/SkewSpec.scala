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
