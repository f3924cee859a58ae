package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q225 jackknife influence and q226 OLS trend: driver-side recounts
  * from raw rows, and the textbook-formula identities. */
class TrendSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("jackknifeSources equals a driver-side leave-one-out recount (sf0.01)") {
    val spark = SparkSpec.spark
    val per = Tables.documents(spark, dir)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, rows) =>
        s -> ((rows.length.toLong, rows.map(_._2).sum)) }
    val n = per.values.map(_._1).sum
    val chars = per.values.map(_._2).sum

    val got = Quality.jackknifeSources(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getAs[Long]("n_s"), r.getAs[Long]("chars_s"),
        r.getAs[Long]("loo_mean_milli"), r.getAs[Long]("influence_milli")))
    }.toMap

    assert(got.keySet === per.keySet)
    got.foreach { case (src, (ns, cs, loo, infl)) =>
      assert((ns, cs) === per(src))
      assert(loo === (chars - cs) * 1000L / (n - ns))
      assert(infl === loo - chars * 1000L / n)
    }
    // influences are displacements around the full mean: both signs occur
    assert(got.values.exists(_._4 > 0) && got.values.exists(_._4 < 0))
  }

  test("olsDailyTrend equals the closed-form least squares over the day grid (sf0.01)") {
    val spark = SparkSpec.spark
    val daily = Quality.dailyCounts(Tables.events(spark, dir)).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .sortBy(_._1.toEpochDay)
    val d0 = daily.head._1
    val ts = daily.map { case (day, x) =>
      (day.toEpochDay - d0.toEpochDay, x) }
    val n = ts.length.toLong
    val st = ts.map(_._1).sum
    val sx = ts.map(_._2).sum
    val stt = ts.map(t => t._1 * t._1).sum
    val stx = ts.map(t => t._1 * t._2).sum
    val num = n * stx - st * sx
    val den = n * stt - st * st

    val r = Quality.olsDailyTrend(spark, dir).collect().head
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("slope_num") === num)
    assert(r.getAs[Long]("slope_den") === den)
    val slope = num.toDouble / den.toDouble
    assert(math.abs(r.getAs[Double]("slope6") -
      math.rint(slope * 1e6) / 1e6) < 1e-9)
    val intercept = (sx.toDouble * den - num.toDouble * st) / (n.toDouble * den)
    assert(math.abs(r.getAs[Double]("intercept6") -
      math.rint(intercept * 1e6) / 1e6) < 1e-9)
    // the fitted line reproduces the mean: ȳ = slope·t̄ + intercept
    val fitted = slope * (st.toDouble / n) + intercept
    assert(math.abs(fitted - sx.toDouble / n) < 1e-6)
  }
}
