package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q217 CUSUM: the windowed prefix-extremum rewrite must equal the
  * textbook sequential reset-at-zero recurrence day for day, and the
  * alarm threshold must fire exactly where the recurrence says. */
class CusumSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("cusumDrift equals the sequential CUSUM recurrence (sf0.01)") {
    val spark = SparkSpec.spark
    val daily = Quality.dailyCounts(Tables.events(spark, dir))
      .collect()
      .map(r => (r.getAs[java.sql.Date]("day"), r.getAs[Long]("x")))
      .sortBy(_._1.getTime)

    val dd = daily.length.toLong
    val total = daily.map(_._2).sum
    // sequential scaled recurrence: s⁺ = max(0, s⁺ + D·x − total)
    var (sUp, sDn) = (0L, 0L)
    val truth = daily.map { case (day, x) =>
      sUp = math.max(0L, sUp + x * dd - total)
      sDn = math.max(0L, sDn + total - x * dd)
      day -> ((x, sUp, sDn, sUp > Quality.CusumH * total,
        sDn > Quality.CusumH * total))
    }.toMap

    val got = Quality.cusumDrift(spark, dir).collect().map { r =>
      r.getAs[java.sql.Date]("day") ->
        ((r.getAs[Long]("x"), r.getAs[Long]("up_num"), r.getAs[Long]("dn_num"),
          r.getAs[Boolean]("alarm_up"), r.getAs[Boolean]("alarm_dn")))
    }.toMap

    assert(got.keySet === truth.keySet)
    assert(got === truth)
    // both one-sided statistics are non-negative
    assert(got.values.forall { case (_, up, dn, _, _) => up >= 0 && dn >= 0 })
  }

  test("an injected mean shift raises each one-sided alarm exactly where the recurrence says") {
    val spark = SparkSpec.spark
    import spark.implicits._
    // 20 flat days at 100, then 10 at 160: global mean 120, so the low
    // period climbs S⁻ at 600/day (scaled) and the high period climbs
    // S⁺ at 1200/day; threshold H·total = 7200.
    val days = (1 to 30).map { i =>
      (java.sql.Date.valueOf(f"2024-01-$i%02d"), if (i <= 20) 100L else 160L)
    }
    val cus = Quality.cusumFromCounts(days.toDF("day", "x"))
      .collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        ((r.getAs[Boolean]("alarm_up"), r.getAs[Boolean]("alarm_dn"))))
      .toMap
    assert(!cus("2024-01-20")._1, "no upshift alarm before the shift")
    assert(!cus("2024-01-26")._1, "S⁺ = 6000 ≤ 7200 on day 26")
    assert(cus("2024-01-27")._1, "S⁺ = 7200·7/6 > 7200 from day 27")
    assert(cus("2024-01-30")._1, "upshift alarm still raised at the end")
    assert(!cus("2024-01-12")._2, "S⁻ = 7200 not yet > threshold on day 12")
    assert(cus("2024-01-13")._2, "downshift alarm from day 13 (below-mean run)")
    assert(cus("2024-01-23")._2 && !cus("2024-01-24")._2,
      "downshift alarm decays away during the high period")
  }
}
