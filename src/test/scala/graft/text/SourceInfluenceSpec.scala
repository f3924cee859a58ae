package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.Tables

/** q281: the LOO algebra must equal a driver replica built from raw
  * per-source sufficient statistics, and the sign of delta must point
  * the right way (removing a below-average source raises the mean). */
class SourceInfluenceSpec extends AnyFunSuite {

  test("matches the driver replica and deltas point the right way (sf0.001)") {
    val spark = SparkSpec.spark
    val sf = "/root/testdata/sf0.001"
    val raw = Tables.documents(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        r.getAs[String]("text").trim.split("\\s+").length.toLong)
    val per = raw.groupBy(_._1).map { case (src, xs) =>
      src -> ((xs.length.toLong, xs.map(_._2).sum))
    }
    val td = raw.length.toLong
    val tt = raw.map(_._2).sum
    def half(num: Long, den: Long) = (num * 100 + den / 2) / den

    val got = TextQueries.sourceInfluence(spark, sf).collect()
    assert(got.length === per.size)
    got.foreach { r =>
      val src = r.getString(0)
      val (nd, ts) = per(src)
      assert(r.getLong(1) === nd)
      assert(r.getLong(2) === ts)
      assert(r.getLong(3) === half(tt, td))
      assert(r.getLong(4) === half(tt - ts, math.max(td - nd, 1L)))
      assert(r.getLong(5) === r.getLong(4) - r.getLong(3))
      // direction: a source whose own mean is below the LOO-corpus mean
      // must have non-negative delta (±1 for the two quantizations)
      val srcMeanX100 = half(ts, nd)
      if (srcMeanX100 < r.getLong(3) - 1) assert(r.getLong(5) >= -1)
      if (srcMeanX100 > r.getLong(3) + 1) assert(r.getLong(5) <= 1)
    }
  }
}
