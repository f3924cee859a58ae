package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q227 proximity search: the merged-stream min-gap must equal the
  * brute-force min over ALL occurrence cross pairs — the identity
  * the plan's two running maxima rely on. */
class ProximitySpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("proximitySearch equals brute-force min over occurrence pairs (sf0.01)") {
    val spark = SparkSpec.spark
    val docs = graft.ops.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))

    val truth = docs.flatMap { case (id, text) =>
      val toks = text.split(" ", -1).filter(_.nonEmpty)
      val pa = toks.zipWithIndex.collect {
        case (w, i) if w == TextQueries.ProxTermA => i.toLong }
      val pb = toks.zipWithIndex.collect {
        case (w, i) if w == TextQueries.ProxTermB => i.toLong }
      if (pa.isEmpty || pb.isEmpty) None
      else Some((id,
        (for (a <- pa; b <- pb) yield math.abs(a - b)).min,
        (pa.length + pb.length).toLong))
    }
    val topN = truth
      .sortBy { case (id, gap, nocc) => (gap, -nocc, id) }
      .take(TextQueries.ProxTopN)
      .zipWithIndex
      .map { case ((id, gap, nocc), i) => (id, gap, nocc, i + 1) }

    val got = TextQueries.proximitySearch(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("min_gap"),
        r.getAs[Long]("n_occ"), r.getAs[Int]("rank")))
      .sortBy(_._4)

    assert(got.toSeq === topN.toSeq)
    assert(got.nonEmpty, "both terms must co-occur somewhere")
    // adjacency is achievable in this corpus: the best gap is small
    assert(got.head._2 <= 5, s"suspicious best gap ${got.head._2}")
  }
}
