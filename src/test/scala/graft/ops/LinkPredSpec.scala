package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q222 link prediction: driver-side brute-force wedge count and RA
  * index over the collected q164 edge set must reproduce the top-N. */
class LinkPredSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("linkPrediction equals brute-force over the collected co-graph (sf0.01)") {
    val spark = SparkSpec.spark
    val strengths = Affinity.itemCooccurrence(spark, dir)
      .select("item_a", "item_b", "n_ab").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // k-NN cut: each item's LinkPredDeg strongest partners, symmetrized
    val directed = strengths.flatMap { case (a, b, n) =>
      Seq((a, b, n), (b, a, n)) }
    val edges = directed.groupBy(_._1).toSeq.flatMap { case (u, vs) =>
      vs.sortBy { case (_, v, n) => (-n, v) }
        .take(Affinity.LinkPredDeg)
        .map { case (_, v, _) => (math.min(u, v), math.max(u, v)) }
    }.toSet
    val adj = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).toSet }
    val deg = adj.map { case (u, vs) => u -> vs.size.toLong }

    val items = adj.keys.toSeq.sorted
    val cand = (for {
      (a, ia) <- items.zipWithIndex
      b <- items.drop(ia + 1)
      if !edges.contains((a, b))
      common = adj(a).intersect(adj(b))
      if common.nonEmpty
    } yield (a, b, common.size.toLong,
        common.toSeq.map(m => 10000L / deg(m)).sum))
    val topN = cand
      .sortBy { case (a, b, cn, ra) => (-cn, -ra, a, b) }
      .take(Affinity.LinkPredTopN)
      .zipWithIndex
      .map { case ((a, b, cn, ra), i) => (i + 1, a, b, cn, ra) }

    val got = Affinity.linkPrediction(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)

    assert(got.toSeq === topN.toSeq)
    assert(got.nonEmpty, "the co-graph must yield candidate links")
    // predicted links are genuinely NON-edges with shared neighbors
    assert(got.forall { case (_, a, b, cn, _) =>
      !edges.contains((a, b)) && cn >= 1 })
  }
}
