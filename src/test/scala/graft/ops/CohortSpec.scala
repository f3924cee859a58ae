package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q131 cohort retention: brute-force replica + shape invariants. */
class CohortSpec extends AnyFunSuite {

  test("q131 equals the driver-side cohort computation (sf0.001 + sf0.01)") {
    val spark = SparkSpec.spark
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val ev = Tables.events(spark, dir)
        .selectExpr("user_id", "CAST(day(ts) AS BIGINT) AS day", "event_type")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      val cohort = ev.filter(_._3 == "signup").groupBy(_._1)
        .map { case (u, rows) => u -> rows.map(_._2).min }
      val truth = ev.flatMap { case (u, day, _) =>
        cohort.get(u).filter(day >= _).map(cd => (cd, day - cd, u))
      }.distinct.groupBy(t => (t._1, t._2))
        .map { case (k, cells) => k -> cells.length.toLong }
      val got = RelationalQueries.cohortRetention(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === truth, s"dir=$dir")
      assert(got.nonEmpty)
      // retention never exceeds cohort size (the offset-0 cell)
      got.groupBy(_._1._1).foreach { case (cd, cells) =>
        val day0 = cells((cd, 0L))
        cells.values.foreach(n => assert(n <= day0, s"cohort $cd cell exceeds day-0 size"))
      }
    }
  }
}
