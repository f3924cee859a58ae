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

  test("grouped kth-smallest == per-group sort, including edge ranks") {
    val df = Tables.table(spark, sfDir, "lineitem")
    val g = "l_returnflag"; val c = "l_quantity" // duplicate-heavy values
    val ns = df.groupBy(g).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // rank menu per group: first, middle, last — exercises bracket
    // clamping at both ends and the duplicate-run arithmetic
    for (pick <- Seq[Long => Long](_ => 1L, n => n / 2, n => n)) {
      val ks = ns.map { case (grp, n) => grp -> math.max(1L, pick(n)) }
      val got = Quantiles.exactGroupKthSmallest(df, g, c, ks)
      val want = ks.map { case (grp, k) =>
        grp -> df.filter(col(g) === grp)
          .select(col(c).cast("double")).sort(c)
          .limit(k.toInt).collect().last.getDouble(0)
      }
      assert(got.keySet === want.keySet)
      got.foreach { case (grp, v) =>
        assert(java.lang.Double.compare(v, want(grp)) == 0,
          s"group=$grp k=${ks(grp)}: grouped=$v exact=${want(grp)}")
      }
    }
  }

  test("grouped kth-smallest rejects out-of-range ranks loudly") {
    val df = Tables.table(spark, sfDir, "lineitem")
    val n = df.filter(col("l_returnflag") === "R").count()
    intercept[IllegalArgumentException] {
      Quantiles.exactGroupKthSmallest(df, "l_returnflag", "l_quantity",
        Map("R" -> (n + 1)))
    }
  }

  test("grouped percentiles keep the NULL group (null-safe bracket join)") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
                 (null.asInstanceOf[String], 10.0), (null.asInstanceOf[String], 20.0))
      .toDF("g", "v")
    val got = Quantiles.exactGroupPercentiles(df, "g", "v", Seq(0.5))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(2)).toMap
    assert(got === Map(Some("a") -> 2.0, None -> 15.0))
  }

  test("grouped bracket plan carries no single-buffer percentile aggregate") {
    val plan = RelationalQueries
      .groupQuantiles(spark, sfDir).queryExecution.executedPlan.toString
    assert("(?<!approx_)percentile\\(".r.findFirstIn(plan).isEmpty,
      "single-buffer percentile aggregate in q51's plan")
    assert(plan.contains("approx_percentile"))
  }

  test("q93 robust outliers equal driver-side median/MAD brute force (sf0.001)") {
    // interpolated median in the same WEIGHTED form the bracket plan uses
    def median(xs: Seq[Double]): Double = {
      val v = xs.sorted.toIndexedSeq
      val pos = 0.5 * (v.size - 1)
      val k = math.floor(pos)
      if (pos == k) v(k.toInt)
      else v(k.toInt) * (k + 1 - pos) + v(k.toInt + 1) * (pos - k)
    }
    val rows = Tables.events(spark, sfDir)
      .select("event_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val expect = rows.groupBy(_._2).flatMap { case (et, grp) =>
      val med = median(grp.map(_._3).toSeq)
      val devs = grp.map { case (_, _, v) => math.abs(v - med) }
      val mad = median(devs.toSeq)
      grp.toSeq.collect {
        case (id, _, v) if mad > 0 && math.abs(v - med) > 4.4478 * mad => id
      }
    }.toSet
    val got = RelationalQueries.robustOutliers(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(got === expect)
  }

  test("q162 quantile bands equal driver-side interpolated order statistics (sf0.001)") {
    // cent-integer inputs + dyadic interpolation fractions → every
    // arithmetic step is exact in doubles; compare WITHOUT tolerance
    def q(xs: IndexedSeq[Long], p: Double): Double = {
      val pos = p * (xs.size - 1)
      val k = math.floor(pos)
      if (pos == k) xs(k.toInt).toDouble
      else xs(k.toInt) * (k + 1 - pos) + xs(k.toInt + 1) * (pos - k)
    }
    val rows = Tables.events(spark, sfDir).select("event_type", "value")
      .collect().map(r => (r.getString(0), math.rint(r.getDouble(1) * 100).toLong))
    val expect = rows.groupBy(_._1).view.mapValues { grp =>
      val v = grp.map(_._2).sorted.toIndexedSeq
      (q(v, 0.25), q(v, 0.5), q(v, 0.75))
    }.toMap
    val got = RelationalQueries.quantileBands(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got === expect)
    got.values.foreach { case (p25, p50, p75) =>
      assert(p25 <= p50 && p50 <= p75)
      // quarter-cent granularity: 4× any emitted value is integral
      Seq(p25, p50, p75).foreach(v => assert(v * 4 == math.rint(v * 4)))
    }
  }

  test("q163 above-own-mean equals an exact integer fixed-point recount (sf0.001)") {
    val rows = Tables.events(spark, sfDir).select("event_id", "user_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byUser = rows.groupBy(_._2)
    val expect = byUser.valuesIterator.flatMap { grp =>
      val cs = grp.map(e => math.rint(e._3 * 100).toLong)
      val (s, n) = (cs.sum, cs.length.toLong)
      grp.zip(cs).collect { case ((id, _, _), c) if c * n > s => id }
    }.toSet
    val got = RelationalQueries.aboveUserMean(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(got.map(_._1).toSet === expect)
    // the emitted mean is the user's floor-divided fixed-point mean
    val means = byUser.view.mapValues { grp =>
      val cs = grp.map(e => math.rint(e._3 * 100).toLong)
      Math.floorDiv(cs.sum, cs.length.toLong)
    }.toMap
    val userOf = rows.map(e => e._1 -> e._2).toMap
    got.foreach { case (id, m) => assert(m === means(userOf(id))) }
  }
}
