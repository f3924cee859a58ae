package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q199 LPA communities: driver-side replay of the synchronous
  * plurality-update rounds must reproduce the distributed result; the
  * output must partition the node set. */
class LpaSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("lpaCommunities equals the driver-side synchronous replay (sf0.01)") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions.col
    val e = graft.ops.Tables.lineitem(spark, dir)
      .filter(col("l_quantity") <= DedupQueries.BfsMaxQty)
      .join(graft.ops.Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey") * 2, col("l_suppkey") * 2 + 1)
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    // both directions PLUS a self-loop per node (the self-vote that
    // breaks bipartite side-parity — see the q199 docstring)
    val both = e.map { case (c, s) => (c, s) } ++ e.map { case (c, s) => (s, c) }
    val und: Map[Long, Seq[Long]] =
      (both ++ both.map(_._1).distinct.map(n => (n, n)))
        .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSeq }

    var lab: Map[Long, Long] = und.keys.map(n => n -> n).toMap
    for (_ <- 1 to DedupQueries.LpaRounds) {
      lab = und.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(lab).map { case (l, xs) => (l, xs.size) }
        n -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    val truth = lab.groupBy(_._2).map { case (community, members) =>
      val nodes = members.keys.toSeq
      community -> ((nodes.size.toLong, nodes.count(_ % 2 == 0).toLong,
        nodes.count(_ % 2 == 1).toLong, nodes.min, nodes.max))
    }

    val got = DedupQueries.lpaCommunities(spark, dir).collect().map { r =>
      r.getAs[Long]("community") ->
        ((r.getAs[Long]("n_nodes"), r.getAs[Long]("n_cust"),
          r.getAs[Long]("n_supp"), r.getAs[Long]("min_node"),
          r.getAs[Long]("max_node")))
    }.toMap

    assert(got === truth)
    // communities partition the node set, and LPA actually merged:
    // fewer communities than nodes, at least one with both sides
    assert(got.values.map(_._1).sum === und.size.toLong)
    assert(got.size < und.size)
    assert(got.values.exists { case (_, nc, ns, _, _) => nc > 0 && ns > 0 })
  }
}
