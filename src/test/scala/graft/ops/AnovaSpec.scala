package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q229 ANOVA and q230 trimmed mean: driver-side recounts and the
  * textbook identities over exact integers. */
class AnovaSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("anovaLength equals the driver-side sums-of-squares identity (sf0.01)") {
    val spark = SparkSpec.spark
    val bySrc = Tables.documents(spark, dir)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, rows) => s -> rows.map(_._2) }

    val k = bySrc.size.toLong
    val n = bySrc.values.map(_.length.toLong).sum
    val sAll = bySrc.values.map(_.sum).sum
    val sbPart = bySrc.values.map { xs =>
      val sg = xs.sum; sg * sg / xs.length }.sum
    val sswNum = bySrc.values.map { xs =>
      val sg = xs.sum
      xs.map(x => x * x).sum - sg * sg / xs.length }.sum
    val ssbNum = sbPart - sAll * sAll / n

    val r = Quality.anovaLength(spark, dir).collect().head
    assert(r.getAs[Long]("k") === k)
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("ssb_num") === ssbNum)
    assert(r.getAs[Long]("ssw_num") === sswNum)
    val f = (ssbNum.toDouble / (k - 1.0)) / (sswNum.toDouble / (n - k))
    assert(math.abs(r.getAs[Double]("f6") - math.rint(f * 1e6) / 1e6) < 1e-9)
    // partition identity: SSB + SSW equals total SS up to the documented
    // < k truncation from the per-group integer div
    val totSS = bySrc.values.flatten.map(x => x * x).sum - sAll * sAll / n
    assert(math.abs((ssbNum + sswNum) - totSS) <= k)
    assert(ssbNum >= 0 && sswNum > 0)
  }

  test("trimmedMeanLength equals a driver-side sorted trim (sf0.01)") {
    val spark = SparkSpec.spark
    val bySrc = Tables.documents(spark, dir)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)

    val truth = bySrc.map { case (src, rows) =>
      val sorted = rows.sortBy(t => (t._3, t._2)).map(_._3)
      val nn = sorted.length.toLong
      val lo = nn * Quality.TrimPct / 100
      val kept = sorted.slice(lo.toInt, (nn - lo).toInt)
      src -> ((nn, kept.length.toLong, sorted.sum * 1000L / nn,
        kept.sum * 1000L / kept.length))
    }

    val got = Quality.trimmedMeanLength(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getAs[Long]("n"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("mean_milli"), r.getAs[Long]("trimmed_mean_milli")))
    }.toMap

    assert(got.keySet === truth.keySet)
    assert(got === truth.toMap)
    // the trim removed exactly 2·lo rows, and the trimmed mean is a
    // center: between the source min and max
    got.foreach { case (src, (nn, kept, _, _)) =>
      assert(kept === nn - 2 * (nn * Quality.TrimPct / 100), src)
    }
  }
}
