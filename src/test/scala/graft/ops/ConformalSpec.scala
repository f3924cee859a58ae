package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q251/q252/q253 invariants: Theil–Sen median-of-slopes vs a brute
  * reference; conformal thresholds as exact order statistics with the
  * finite-sample coverage bound; repair bins all ≥ k and partitioning
  * each source. */
class ConformalSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("theilSenTrend: median pairwise slope matches brute force per type") {
    val spark = SparkSpec.spark
    val daily = Tables.events(spark, dir)
      .groupBy(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.expr("CAST(ts AS DATE)").as("day"))
      .count().collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay, r.getAs[Long]("count")))
    val d0 = daily.map(_._2).min
    val ref = daily.groupBy(_._1).map { case (et, rows) =>
      val pts = rows.map(r => ((r._2 - d0), r._3)).sortBy(_._1)
      val slopes = (for {
        (i, ia) <- pts.zipWithIndex
        j <- pts.drop(ia + 1)
      } yield {
        val s = (j._2.toDouble - i._2.toDouble) / (j._1.toDouble - i._1.toDouble)
        (BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          i._1, j._1)
      }).sortBy(t => (t._1, t._2, t._3))
      val lower = slopes((slopes.length + 1) / 2 - 1)._1
      et -> ((slopes.length.toLong, lower))
    }
    val got = Quality.theilSenTrend(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Double]("ts_slope6")))).toMap
    assert(got === ref)
  }

  test("conformalCoverage: thresholds are exact order statistics; coverage ≥ 90% − finite-sample slack") {
    val spark = SparkSpec.spark
    val rows = Quality.conformalCoverage(spark, dir).collect()
      .map(r => r.getAs[Long]("cls") ->
        ((r.getAs[Long]("n_cal"), r.getAs[Long]("thr"),
          r.getAs[Long]("n_eval"), r.getAs[Long]("n_covered"),
          r.getAs[Long]("coverage_ppm")))).toMap
    assert(rows.keySet === Set(0L, 1L))
    rows.foreach { case (cls, (nCal, thr, nEval, nCov, covPpm)) =>
      assert(nCal > 0 && nEval > 0 && thr >= 0 && thr <= 10000)
      assert(covPpm === nCov * 1000000 / nEval)
      // split conformal: coverage ≥ 1 − α in expectation; allow
      // binomial fluctuation ~3σ on this eval size
      val p = 0.9
      val slack = 3.0 * math.sqrt(p * (1 - p) / nEval)
      assert(covPpm >= ((p - slack) * 1e6).toLong,
        s"class $cls coverage $covPpm below guarantee band")
    }
  }

  test("kAnonymityRepair: every class ≥ k, classes partition each source, ranges ordered") {
    val spark = SparkSpec.spark
    val rows = Maintenance.kAnonymityRepair(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("bin"),
        r.getAs[Long]("n_class"), r.getAs[Long]("lo_chars"),
        r.getAs[Long]("hi_chars")))
    assert(rows.forall(_._3 >= Maintenance.KAnonK))
    val perSource = rows.groupBy(_._1)
    val docCounts = Tables.documents(spark, dir).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.foreach { case (src, cls) =>
      assert(cls.map(_._3).sum === docCounts(src), s"$src partitions")
      // bins ordered by range: lo of bin b+1 ≥ hi of bin b is NOT
      // required (equal lengths may straddle), but lo ≤ hi always and
      // bins are contiguous ids 0..n_bins-1
      assert(cls.forall(c => c._4 <= c._5))
      assert(cls.map(_._2).sorted.toSeq === (0L until cls.size.toLong))
    }
  }
}
