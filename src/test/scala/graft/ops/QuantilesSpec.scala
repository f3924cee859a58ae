package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The approx-bracket exact percentile (q05's scalar, q61) must be
  * BIT-identical to Spark's single-buffer exact `percentile` aggregate
  * — same order statistics, same interpolation arithmetic — across
  * edge percentiles, duplicate-heavy columns, and integer columns.
  * Also pins down the measured error of the raw approx sketch the
  * bracket is built from (the number PERF_NOTES cites). */
class QuantilesSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = SparkSpec.spark

  private def exactRef(c: String, table: String, p: Double): Double =
    Tables.table(spark, sfDir, table)
      .agg(expr(s"percentile(CAST($c AS DOUBLE), $p)")).head().getDouble(0)

  test("bracket percentile == exact percentile, bit-for-bit") {
    val cases = Seq(
      ("lineitem", "l_extendedprice"), // dense doubles
      ("lineitem", "l_quantity"),      // heavy duplicates (1..50)
      ("orders", "o_totalprice"),
      ("customer", "c_custkey"))       // integer column, exact ranks
    val ps = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 0.999, 1.0)
    for ((table, c) <- cases) {
      val df = Tables.table(spark, sfDir, table)
      val got = Quantiles.exactPercentiles(df, c, ps)
      for ((p, g) <- ps.zip(got)) {
        val want = exactRef(c, table, p)
        assert(java.lang.Double.compare(g, want) == 0,
          s"$table.$c p=$p: bracket=$g exact=$want")
      }
    }
  }

  test("raw approx_percentile error is within the sketch's rank contract") {
    val df = Tables.table(spark, sfDir, "lineitem")
    val n = df.count()
    val p = 0.99
    val approx = df.agg(expr(
      s"approx_percentile(l_extendedprice, $p, ${Quantiles.DefaultAccuracy})"))
      .head().getDouble(0)
    val exact = exactRef("l_extendedprice", "lineitem", p)
    // the sketch guarantees RANK error ≤ n/accuracy; convert the observed
    // VALUE error back to a rank distance and assert the contract holds
    val rankOfApprox = df.filter(col("l_extendedprice") <= approx).count()
    val rankError = math.abs(rankOfApprox - p * (n - 1))
    val bound = math.ceil(n.toDouble / Quantiles.DefaultAccuracy) + 1
    info(f"n=$n approx=$approx%.4f exact=$exact%.4f " +
      f"value_err=${math.abs(approx - exact)}%.4f rank_err=$rankError%.1f (bound $bound)")
    assert(rankError <= bound)
  }

  test("empty input yields NaN, not a crash") {
    val df = Tables.table(spark, sfDir, "lineitem").filter(lit(false))
    val got = Quantiles.exactPercentiles(df, "l_extendedprice", Seq(0.5))
    assert(got.head.isNaN)
  }

  test("grouped bracket percentiles == grouped exact percentile, bit-for-bit") {
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.95, 1.0)
    for ((table, g, c) <- Seq(
        ("lineitem", "l_returnflag", "l_extendedprice"),
        ("lineitem", "l_linestatus", "l_quantity"), // 2 groups, duplicate-heavy
        ("orders", "o_orderpriority", "o_totalprice"))) {
      val df = Tables.table(spark, sfDir, table)
      val got = Quantiles.exactGroupPercentiles(df, g, c, ps)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      val pts = ps.mkString("array(", ", ", ")")
      val want = df.groupBy(g)
        .agg(expr(s"percentile(CAST($c AS DOUBLE), $pts)").as("qv"))
        .collect().flatMap { r =>
          ps.zip(r.getSeq[Double](1)).map { case (p, v) => (r.getString(0), p) -> v }
        }.toMap
      assert(got.keySet === want.keySet)
      got.foreach { case (k, v) =>
        assert(java.lang.Double.compare(v, want(k)) == 0,
          s"$table.$c group=${k._1} p=${k._2}: bracket=$v exact=${want(k)}")
      }
    }
  }

  test("grouped bracket plan carries no single-buffer percentile aggregate") {
    val plan = RelationalQueries
      .groupQuantiles(spark, sfDir).queryExecution.executedPlan.toString
    assert("(?<!approx_)percentile\\(".r.findFirstIn(plan).isEmpty,
      "single-buffer percentile aggregate in q51's plan")
    assert(plan.contains("approx_percentile"))
  }
}
