package graft.ops

import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q280: must recover a PLANTED level shift exactly, match a driver
  * replica of the integer binary-segmentation algorithm on the fixture
  * series, and partition the day range. */
class ChangepointSpec extends AnyFunSuite {

  private def day(i: Int) = Date.valueOf(f"2024-01-${i}%02d")

  test("recovers a planted two-shift series exactly") {
    val spark = SparkSpec.spark
    import spark.implicits._
    // three regimes: 10/day for days 1-10, 100/day for 11-20, 40/day for 21-30
    val grid = (1 to 30).map(i =>
      (day(i), if (i <= 10) 10L else if (i <= 20) 100L else 40L))
      .toDF("day", "c")
    val segs = Changepoint.segmentsFrom(grid).orderBy("seg_id").collect()
      .map(r => (r.getAs[Date]("day_start").toString,
        r.getAs[Date]("day_end").toString, r.getAs[Long]("mean_x100")))
    // depth-2 binseg on 3 clean regimes: first split at a regime edge,
    // second splits recover the remaining edge; one side stays whole
    assert(segs.length === 3)
    assert(segs(0) === (("2024-01-01", "2024-01-10", 1000L)))
    assert(segs(1) === (("2024-01-11", "2024-01-20", 10000L)))
    assert(segs(2) === (("2024-01-21", "2024-01-30", 4000L)))
  }

  test("matches a driver replica on the fixture series and partitions the range") {
    val spark = SparkSpec.spark
    val got = Changepoint.changepoints(spark, "/root/testdata/sf0.001")
      .orderBy("seg_id").collect()
      .map(r => (r.getLong(0), r.getAs[Date]("day_start").toString,
        r.getAs[Date]("day_end").toString, r.getLong(3), r.getLong(4), r.getLong(5)))

    // independent replica of the integer algorithm
    val grid = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")).as("day"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("c"))
      .collect().map(r => (r.getAs[Date](0).toString, r.getLong(1)))
      .sortBy(_._1)
    val cs = grid.map(_._2)
    val n = cs.length
    val cum = cs.scanLeft(0L)(_ + _).tail
    val sTot = cum.last
    val q = Changepoint.ScoreScale
    def best(lo: Int, hi: Int, base: Long): Option[Int] = {
      // split k in (lo, hi): left rows lo+1..k, right k+1..hi (1-based);
      // accepted only on strict gain over the unsplit segment (g0)
      val sSeg = cum(hi - 1) - base
      val g0 = sSeg * sSeg * q / (hi - lo)
      val cands = (lo + 1 until hi).map { k =>
        val sl = cum(k - 1) - base
        val sr = cum(hi - 1) - cum(k - 1)
        val gq = sl * sl * q / (k - lo) + sr * sr * q / (hi - k)
        (k, gq)
      }.filter(_._2 > g0)
      if (cands.isEmpty) None
      else Some(cands.maxBy { case (k, gq) => (gq, -k) }._1)
    }
    val _ = sTot
    val k1o = best(0, n, 0L)
    val k2a = k1o.flatMap(k1 => best(0, k1, 0L))
    val k2b = k1o.flatMap(k1 => best(k1, n, cum(k1 - 1)))
    val boundsR = (Seq(n) ++ k1o ++ k2a ++ k2b).distinct.sorted
    val want = boundsR.zip(0 +: boundsR.dropRight(1)).zipWithIndex.map {
      case ((hi, lo), idx) =>
        val seg = grid.slice(lo, hi)
        val sum = seg.map(_._2).sum
        (idx + 1L, seg.head._1, seg.last._1, (hi - lo).toLong, sum,
          (sum * 100 + (hi - lo) / 2) / (hi - lo))
    }
    assert(got.toSeq === want)
    // segments partition the full day range
    assert(got.head._2 === grid.head._1 && got.last._3 === grid.last._1)
  }

  test("q283 Mann-Kendall: planted monotone series flagged, constant series is no_trend, fixture matches replica") {
    val spark = SparkSpec.spark
    import spark.implicits._
    // rising, falling, flat planted series
    val grid = ((1 to 30).map(i => ("up", day(i), i.toLong * 3)) ++
      (1 to 30).map(i => ("down", day(i), 200L - i * 4)) ++
      (1 to 30).map(i => ("flat", day(i), 7L)))
      .toDF("event_type", "day", "x")
    val out = Changepoint.mannKendallFrom(grid).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(4), r.getString(5)))).toMap
    assert(out("up")._1 === 435L && out("up")._3 === "increasing")
    assert(out("down")._1 === -435L && out("down")._3 === "decreasing")
    assert(out("flat")._1 === 0L && out("flat")._2 === 0.0 && out("flat")._3 === "no_trend")

    // fixture replica: S, tie-corrected variance, z per type
    val fix = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("ts").cast("date").as("day"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getAs[java.sql.Date](1).toString, r.getLong(2)))
    val want = fix.groupBy(_._1).map { case (t, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      val n = xs.length.toLong
      val sStat = (for (i <- xs.indices; j <- i + 1 until xs.length)
        yield java.lang.Long.signum(xs(j) - xs(i)).toLong).sum
      val tie = xs.groupBy(identity).values
        .map(g => { val tt = g.length.toLong; tt * (tt - 1) * (2 * tt + 5) }).sum
      val varX18 = n * (n - 1) * (2 * n + 5) - tie
      val z = if (sStat == 0) 0.0 else {
        val raw = (sStat - math.signum(sStat.toDouble)) / math.sqrt(varX18.toDouble / 18.0)
        BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      t -> ((n, sStat, varX18, z))
    }
    val got2 = Changepoint.mannKendall(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got2 === want)
  }
}
