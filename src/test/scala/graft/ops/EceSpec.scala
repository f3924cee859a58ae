package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q219 ECE calibration: driver-side recount of every bin, plus the
  * integer contracts the reliability table promises. */
class EceSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("eceCalibration bins equal a driver-side recount (sf0.01)") {
    val spark = SparkSpec.spark
    val tokRe = "[a-z0-9]+".r
    val rows = Tables.documents(spark, dir).select("text").collect()
      .map(_.getString(0))
      .map { text =>
        val toks = text.split(" ", -1)
        val nstop = toks.count(Quality.KappaStops.contains).toLong
        val ntok = tokRe.findAllIn(text).size.toLong
        val types = Quality.KappaStops.count(toks.toSet.contains)
        val conf = math.min(nstop * 40000L / math.max(ntok, 1L), 10000L)
        val label = if (types >= Quality.KappaMinStopTypes &&
          ntok >= Quality.KappaMinTok) 1L else 0L
        (math.min(conf / 1000L, Quality.EceBins - 1), label, conf)
      }
    val truth = rows.groupBy(_._1).map { case (bin, rs) =>
      bin -> ((rs.length.toLong, rs.map(_._2).sum, rs.map(_._3).sum))
    }

    val got = Quality.eceCalibration(spark, dir).collect().map { r =>
      r.getAs[Long]("bin") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("sum_label"),
          r.getAs[Long]("sum_conf_b4"), r.getAs[Long]("acc_ppm"),
          r.getAs[Long]("conf_ppm"), r.getAs[Long]("gap_num")))
    }.toMap

    assert(got.keySet === truth.keySet)
    got.foreach { case (bin, (n, sl, sc, acc, conf, gap)) =>
      assert((n, sl, sc) === truth(bin), s"bin $bin")
      assert(acc === sl * 1000000L / n)
      assert(conf === sc * 100L / n)
      assert(gap === math.abs(sl * 10000L - sc))
      assert(sl <= n && sc <= n * 10000L)
    }
    // the table is a partition of the corpus, not a sample of it
    assert(got.values.map(_._1).sum === rows.length.toLong)
    // more than one bin occupied — otherwise the audit is vacuous
    assert(got.size > 1)
  }
}
