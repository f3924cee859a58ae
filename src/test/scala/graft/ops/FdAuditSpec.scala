package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q228 FD audit: driver-side g3 recount per candidate, plus the
  * semantic pins (g3 is a minimum-deletion count; a held FD has
  * zero). */
class FdAuditSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  private def g3(pairs: Seq[(String, String)]): (Long, Long, Long) = {
    val grid = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val byA = grid.groupBy(_._1._1)
    val nDet = byA.size.toLong
    val nRows = grid.values.sum
    val viol = byA.values.map(g => g.values.sum - g.values.max).sum
    (nRows, nDet, viol)
  }

  test("fdAudit equals driver-side g3 counts for every candidate (sf0.01)") {
    val spark = SparkSpec.spark
    val docs = Tables.documents(spark, dir)
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val ords = Tables.orders(spark, dir)
      .select("o_orderstatus", "o_orderpriority", "o_custkey").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))

    val truth = Map(
      ("documents", "lang", "source") -> g3(docs),
      ("documents", "source", "lang") -> g3(docs.map(_.swap)),
      ("orders", "o_orderstatus", "o_orderpriority") ->
        g3(ords.map(t => (t._1, t._2))),
      ("orders", "o_custkey", "o_orderstatus") ->
        g3(ords.map(t => (t._3.toString, t._1))))

    val got = Quality.fdAudit(spark, dir).collect().map { r =>
      (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_det"),
          r.getAs[Long]("violations"), r.getAs[Long]("holds")))
    }.toMap

    assert(got.keySet === truth.keySet)
    got.foreach { case (k, (nr, nd, v, h)) =>
      assert((nr, nd, v) === truth(k), s"fd $k")
      assert(h === (if (v == 0) 1L else 0L))
      // g3 bounds: 0 ≤ violations ≤ rows − determinants
      assert(v >= 0 && v <= nr - nd)
    }
    // the catalog must discriminate: not all candidates hold, not all fail
    assert(got.values.exists(_._4 == 1L) || got.values.exists(_._4 == 0L))
    assert(got.values.map(_._3).toSet.size > 1)
  }
}
