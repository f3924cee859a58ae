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

  test("profiledJoin: the q135 profile drives the posture, every posture's rows are identical") {
    val spark = SparkSpec.spark
    import spark.implicits._
    // constructed fact tables with known key distributions over dim 0..9
    val dim = (0L until 10L).map(k => (k, s"name$k")).toDF("d_k", "d_name")
    def fact(rows: Seq[Long]) =
      rows.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("f_k", "f_id")
    // uniform: 100 rows over 10 keys → skew 1.0× → PlainShuffle
    val uniform = fact(Seq.tabulate(100)(i => (i % 10).toLong))
    // moderate: one key holds ~1/3 of 150 rows over 10 keys → ~3.3×…
    // keep under the 4× bound → PlainShuffle; at 10 keys a 50% key is 5× → AQE
    val moderate = fact(Seq.fill(90)(3L) ++ Seq.tabulate(90)(i => (i % 10).toLong))
    // severe: 95% of rows on one key over 10 keys → ~9.5× mean… need ≥16×:
    // use 20 keys, hot key 90% → skew ≈ 18× → Salted
    val dim20 = (0L until 20L).map(k => (k, s"name$k")).toDF("d_k", "d_name")
    val severe = fact(Seq.fill(360)(7L) ++ Seq.tabulate(40)(i => (i % 20).toLong))
    def run(f: org.apache.spark.sql.DataFrame, d: org.apache.spark.sql.DataFrame) = {
      val (posture, joined) = Skew.profiledJoin(f, d, f("f_k"), d("d_k"), f("f_id"))
      val plain = f.join(d, f("f_k") === d("d_k"))
        .select("f_id", "d_name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val got = joined.select("f_id", "d_name").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === plain)
      posture
    }
    assert(run(uniform, dim) === Skew.PlainShuffle)
    assert(run(moderate, dim) === Skew.AqeSkewSplit)
    val severePosture = run(severe, dim20)
    assert(severePosture.isInstanceOf[Skew.Salted])
    // salt count ≈ the measured skew factor (≈18×), the q135 doc's rule
    val n = severePosture.asInstanceOf[Skew.Salted].numSalts
    assert(n >= 16 && n <= Skew.MaxSalts, s"numSalts=$n")
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
